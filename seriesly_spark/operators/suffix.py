"""Suffix-order duplicated-substring statistics: a distributed
generalized SUFFIX ARRAY over the corpus token stream via
Manber-Myers prefix doubling (SICOMP'93), giving ARBITRARY-LENGTH
longest-duplicated-span stats next to the fixed-n gram family
(``dup_span_stats`` / ``substring_dup_stats`` / ``dedup_spans``) —
the length-exact core of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL'22), which the fixed-n operators
approximate at one granularity.

Algorithm, re-expressed as DataFrame rounds:

1. Every (doc, pos) suffix starts with rank_0 = its first token's
   xxhash64 (ANY injective relabeling of the alphabet yields the same
   groups and a valid lexicographic base order, so no rank pass).
2. Round k (shift 2^k): each suffix's key becomes the pair
   (rank_k[pos], rank_k[pos + 2^k]) — the second component -1 when the
   shifted position runs off the document (a suffix never crosses a
   document boundary) — and rank_{k+1} is an ORDER-PRESERVING
   INJECTIVE relabeling of that pair (prefix doubling never needs the
   ranks dense/consecutive, only monotone and equality-preserving; the
   r15 job-count rewrite below exploits exactly that slack).
3. Suffixes sort by (rank_K, doc, pos); each ADJACENT pair's longest
   common prefix is recovered exactly from the retained per-round rank
   tables by greedy binary decomposition (the sparse-table argument):
   descending k, if both suffixes' rank_k at offset +lcp match, the
   prefixes agree for 2^k more tokens. max-LCP-with-anyone is a
   neighbor property in ANY injective-relabelled lexicographic order
   (equal-prefix suffixes are contiguous), so per-doc maxima match a
   true lexicographic suffix array's even though hash order differs.

Exactness contract: values are exact up to the cap 2^rounds - 1;
longer duplications report the cap (and order ties beyond 2^rounds
tokens are broken arbitrarily, which the cap makes value-invisible).
Token identity is xxhash64 (the ``minhash_dedup_auto`` hashed-shingle
caveat: a 64-bit collision can overstate a span; never understates by
more than a collision's reach).

Round-15 plan shape (the driver-latency rewrite): the old
implementation paid, per doubling round, a range-repartition SAMPLING
job, a per-partition-sizes ``collect``, a broadcast-offset join and a
self-join of the rank table against its shifted copy — ~135 Spark
jobs for the registry's rounds=7 invocation, every one serialized on
the driver. All of that machinery is replaced by three observations:

- Rank values need only be MONOTONE + INJECTIVE on the key pairs, so
  rank = (bucket << 40) | dense_rank-within-bucket, where ``bucket``
  is a DETERMINISTIC ascending range split of the key domain (high
  bits of the hash at level 0; the previous rank's own bucket bits —
  ``rank >> 40`` — afterwards, which inherits that level's balance).
  No sampling pass, no size collect, no offset join: one hash
  exchange on the bucket id + one local dense_rank window per round.
  Buckets outnumber shuffle partitions ~32x (power of two, derived
  from the session's parallelism — scale-adaptive, not a local
  constant), so the bucket->partition hash spreads evenly; equal keys
  share a bucket by construction, exactly the skew contract the
  sampled range partitioner gave.
- Keeping the per-round state as ONE ROW PER DOCUMENT (id, array of
  ranks by position) makes the shifted pairing an IN-ROW
  transform/get — the per-round self-join (two exchanges + the
  lineage doubling that forced per-round checkpoints) disappears, and
  lineage becomes single-reference, so the whole operator composes as
  ONE lazy plan: zero driver actions before the consumer's own
  (``rounds="auto"`` adds a single max-length aggregate).
- The LCP probe chain (2 joins per level against every rank table)
  collapses to TWO joins total: adjacent suffix pairs join the
  per-doc level arrays once per side, and the greedy descending-k
  probe runs as an in-row fold over the levels. Adjacency itself is a
  lead() window per bucket plus a <= n_buckets-row boundary frame
  (driver-bounded metadata, never data) instead of the dense order
  index + self-join.

Scale shape: every exchange carries narrow (id, pos, rank) rows or
the per-doc rank arrays (8 bytes/token/level — no token text survives
past level 0). Persisted state is the rounds+1 level arrays (the
operator's declared memory bill, unchanged). Hot buckets (a frequent
token at level 0) are the same equal-keys-colocate skew the sampled
range partitioner had; doubling splits them geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.operators.textstats import tokens
from seriesly_spark.operators.util import scoped_persist, spread

# Bits reserved for the within-bucket dense rank: 2^40 rows per bucket
# before overflow, with bucket ids capped far below 2^23 so the packed
# rank always fits a signed long.
_BLOCK = 40


def _n_buckets(spark) -> int:
    """Deterministic bucket count for the rank windows: the smallest
    power of two >= 32x the session's default parallelism (the guide's
    20-100x rule so the bucket->partition hash spreads evenly), capped
    so (bucket << _BLOCK) can never overflow a long. Derived from the
    session, not a local constant — at cluster scale this follows the
    configured parallelism."""
    p = max(1, spark.sparkContext.defaultParallelism) * 32
    b = 1
    while b < p:
        b <<= 1
    return min(b, 1 << 20)


def _bucket(col, level: int, nb: int):
    """Ascending deterministic bucket id in [0, nb) for a level-k rank
    value. Level 0 ranks are raw xxhash64 values — uniform over the
    full signed 64-bit range, so the top log2(nb) bits (shifted to
    non-negative) split it evenly. Later ranks are (bucket << _BLOCK)
    | dense_rank, so their own top bits ARE the bucket — the split
    inherits the previous level's balance. Both are monotone in the
    rank value and colocate equal ranks, the two properties the
    sampled range partitioner provided."""
    if level == 0:
        m = nb.bit_length() - 1  # nb = 2^m
        return (F.shiftright(col, 64 - m) + F.lit(nb // 2)).cast("int")
    return F.shiftright(col, _BLOCK).cast("int")


def suffix_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int | str = 7,
) -> DataFrame:
    """Per-document ARBITRARY-LENGTH longest-duplicated-span length:
    max_dup_len = the longest token span in the document that also
    occurs somewhere else in the corpus (any other position — other
    documents or elsewhere in the same one), exact up to the cap
    2^rounds - 1. Output: (id_col, n_tokens, max_dup_len); documents
    with NULL text report (0, 0).

    ``rounds`` is a fixed parameter (the unrolled-training convention):
    the plan is a pure function of (corpus, rounds) replayable by any
    engine; pick rounds so 2^rounds - 1 >= the longest duplication you
    care to measure (cap 127 at the default covers the driver corpus's
    100-token documents entirely, i.e. the stat is fully exact there).
    On a longer-doc corpus a fixed cap SATURATES silently (max_dup_len
    reports the cap), and on a short-doc corpus rounds are wasted —
    pass ``rounds="auto"`` to derive the smallest exact cap from one
    cheap aggregate over the already-persisted token-hash table:
    rounds = bit_length(max doc tokens), so 2^rounds - 1 >= every
    possible span length and the stat is exact on ANY corpus. "auto"
    is still a pure function of the corpus (the max is deterministic),
    so oracle replayability survives — and the independent suffix-sort
    oracle never needed the cap anyway.
    """
    toks = tokens(text_col)
    pre = scoped_persist(
        spread(docs).select(
            F.col(id_col).alias("id"),
            F.transform(toks, lambda x: F.xxhash64(x)).alias("__th"),
        ),
        "suffix.toks",
    )
    if rounds == "auto":
        mx = pre.agg(F.max(F.size("__th"))).collect()[0][0] or 0
        rounds = max(1, int(mx).bit_length())
    elif type(rounds) is not int:
        # bool is an int subclass: rounds=True would silently train
        # with 1 round instead of failing like other malformed values
        raise ValueError('rounds must be an int or "auto"')
    per_side = _suffix_lcp(pre, rounds)
    per_doc = per_side.groupBy("id").agg(F.max("lcp").alias("max_dup_len"))
    # The doc spine and token counts come from the persisted pre (size
    # of the 8-byte hash array) — NOT a second tokens() pass over the
    # raw text, which would re-scan and re-split the whole corpus.
    return (
        pre.select("id", F.size("__th").alias("__nt"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("__nt"), F.lit(0))
            .cast("bigint")
            .alias("n_tokens"),
            F.coalesce("max_dup_len", F.lit(0))
            .cast("bigint")
            .alias("max_dup_len"),
        )
    )


def _suffix_lcp(pre: DataFrame, rounds: int) -> DataFrame:
    """The shared suffix-array core: ``pre`` is a persisted frame
    carrying (id, __th token-hash array, ...). Returns (id, pos, lcp)
    with up to two rows per suffix position — its longest common
    prefix with each suffix-order neighbor, clamped to the suffix's
    remainder and the cap 2^rounds - 1. max(lcp) per (id, pos) is the
    position's longest-duplicated-prefix length (exact below the cap);
    consumers aggregate per position or per document as needed.

    Composes as ONE lazy plan (module docstring): no driver action,
    no checkpoint, no sampling run before the consumer's own action.
    The only persisted state besides ``pre`` is the adjacent-pair LCP
    table (read twice by the two-sided union); ``scoped_persist``
    bounds it at one live generation across invocations."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = pre.sparkSession
    nb = _n_buckets(spark)
    blk = F.lit(1 << _BLOCK).cast("long")
    cap = (1 << rounds) - 1

    # Level 0 "ranks" are the token hashes themselves. -1 keeps the
    # past-the-end sentinel — a real hash colliding with it is a
    # 2^-64-per-position event, the same class as the token-hash
    # collision caveat already accepted at every level.
    rk = pre.select("id", F.posexplode("__th").alias("pos", "r"))
    wid = Window.partitionBy("id").orderBy("pos")
    keyed = None
    for k in range(rounds):
        shift = 1 << k
        # Shifted pairing via lead() within the document — a window
        # over (id, pos), not a self-join: suffixes never cross a
        # document boundary, and the narrow (id, pos, rank) rows stay
        # the only thing exchanged.
        keyed = rk.select(
            "id",
            "pos",
            F.col("r").alias("k1"),
            F.coalesce(F.lead("r", shift).over(wid), F.lit(-1)).alias(
                "k2"
            ),
        ).withColumn("__b", _bucket(F.col("k1"), k, nb))
        if k == rounds - 1:
            break
        # Order-preserving injective relabeling of the pair: bucket
        # high bits + local dense rank. ONE exchange (hash on __b).
        w = Window.partitionBy("__b").orderBy("k1", "k2")
        rk = keyed.select(
            "id",
            "pos",
            (
                F.col("__b").cast("long") * blk + F.dense_rank().over(w)
            ).alias("r"),
        )

    # Suffix order: the final pairing already groups equal-(first
    # 2^rounds)-prefix suffixes, and ordering by (k1, k2, id, pos) is
    # order-identical to ranking it first (dense rank is monotone).
    # Adjacent pairs come from a lead() window per bucket; the
    # bucket-boundary pairs from a <= nb-row first/last frame (bucket
    # count is a config-derived constant — metadata, never data). The
    # boundary aggregate groups the ALREADY __b-partitioned window
    # output, so the exchange below the window is the only one and is
    # shared by both consumers.
    wadj = Window.partitionBy("__b").orderBy("k1", "k2", "id", "pos")
    adj = keyed.withColumn(
        "__n", F.lead(F.struct("id", "pos")).over(wadj)
    )
    within = adj.where(F.col("__n").isNotNull()).select(
        F.col("id").alias("d1"),
        F.col("pos").alias("p1"),
        F.col("__n.id").alias("d2"),
        F.col("__n.pos").alias("p2"),
    )
    ends = adj.groupBy("__b").agg(
        F.min_by(
            F.struct("id", "pos"), F.struct("k1", "k2", "id", "pos")
        ).alias("__first"),
        F.max_by(
            F.struct("id", "pos"), F.struct("k1", "k2", "id", "pos")
        ).alias("__last"),
    )
    wb = Window.orderBy("__b")
    boundary = (
        ends.select(
            F.col("__last").alias("__a"),
            F.lead("__first").over(wb).alias("__z"),
        )
        .where(F.col("__z").isNotNull())
        .select(
            F.col("__a.id").alias("d1"),
            F.col("__a.pos").alias("p1"),
            F.col("__z.id").alias("d2"),
            F.col("__z.pos").alias("p2"),
        )
    )
    pairs = within.union(boundary)

    # Each adjacent pair's LCP is the first mismatch of the two
    # suffixes' token-hash slices, pre-clamped to the cap: rank
    # equality IS hash equality level by level, so comparing the
    # hashes directly is the same computation as the greedy rank
    # probes (same 2^-64 collision class), in TWO joins total instead
    # of two per level — and the slice bound keeps the joined rows at
    # most cap tokens wide per side, so the bytes exchanged stay
    # proportional to pairs x cap, the same bill the per-level probe
    # chain paid across its exchanges. A slice never runs past its
    # document (slice stops at the array end), so the first-mismatch
    # result is inherently clamped to the suffix remainders: equal
    # slices of unequal length mismatch at the shorter one's padding,
    # and fully equal slices report their own (cap- or
    # remainder-bounded) length.
    t1 = pre.select(F.col("id").alias("d1"), F.col("__th").alias("__t1"))
    t2 = pre.select(F.col("id").alias("d2"), F.col("__th").alias("__t2"))
    j = (
        pairs.join(t1, "d1")
        .select(
            "d1",
            "p1",
            "d2",
            "p2",
            F.slice("__t1", F.col("p1") + 1, cap).alias("__s1"),
        )
        .join(t2, "d2")
        .select(
            "d1",
            "p1",
            "d2",
            "p2",
            "__s1",
            F.slice("__t2", F.col("p2") + 1, cap).alias("__s2"),
        )
    )
    z = F.zip_with(
        F.col("__s1"), F.col("__s2"), lambda x, y: x.eqNullSafe(y)
    )
    mism = F.array_position(z, False)
    lcp_pairs = scoped_persist(
        j.select(
            "d1",
            "p1",
            "d2",
            "p2",
            F.when(mism > 0, mism - 1)
            .otherwise(F.size("__s1"))
            .cast("int")
            .alias("lcp"),
        ),
        "suffix.lcp_pairs",
    )
    return lcp_pairs.select(
        F.col("d1").alias("id"), F.col("p1").alias("pos"), "lcp"
    ).union(
        lcp_pairs.select(
            F.col("d2").alias("id"), F.col("p2").alias("pos"), "lcp"
        )
    )


def dedup_spans_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
) -> DataFrame:
    """ARBITRARY-LENGTH duplicated-span removal — the length-exact
    form of Lee et al.'s ExactSubstr rewrite that :func:`dedup_spans`
    approximates at one fixed n-gram width: excise every token covered
    by a maximal duplicated span of AT LEAST ``min_len`` tokens (a
    span occurring anywhere else in the corpus — another document or
    another position of the same one). Unlike ``dedup_spans`` there is
    no first-carrier exemption: recurring text of that length is
    treated as boilerplate and removed from EVERY occurrence (the
    conservative variant — the paper's keep-one bookkeeping needs an
    earliest-occurrence tie-break the caller can layer on top via
    ``suffix_dup_stats``-style inspection when provenance matters).

    EXACTNESS with a small cap: a suffix of a duplicated span is
    itself duplicated (it occurs inside the other copy), so every
    position of a qualifying span — up to its last ``min_len`` - 1
    tokens — starts its own duplicated run of >= min_len, and the
    union of FIXED-width [p, p + min_len) windows over qualifying
    positions covers qualifying spans of EVERY length exactly. The
    suffix array therefore only needs cap >= min_len (rounds =
    ceil(log2(min_len + 1))), and the excision tail is the island
    machinery :func:`dedup_spans` already runs. Output:
    (id_col, n_tokens, n_removed, text_clean).
    """
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    from seriesly_spark.operators.dedup import (
        _excise_stale_spans,
        _span_tokens,
    )

    rounds = min_len.bit_length()  # smallest with 2^rounds - 1 >= min_len
    pre = scoped_persist(
        _span_tokens(docs, text_col, id_col), "suffix.exact_toks"
    )
    per_side = _suffix_lcp(pre, rounds)
    stale = (
        per_side.where(F.col("lcp") >= min_len)
        .groupBy("id")
        .agg(F.collect_set("pos").alias("__starts"))
    )
    return _excise_stale_spans(pre, stale, min_len, id_col)
