"""Suffix-order duplicated-substring statistics: a distributed
generalized SUFFIX ARRAY over the corpus token stream, giving
ARBITRARY-LENGTH longest-duplicated-span stats next to the fixed-n
gram family (``dup_span_stats`` / ``substring_dup_stats`` /
``dedup_spans``) — the length-exact core of Lee et al.,
"Deduplicating Training Data Makes Language Models Better" (ACL'22),
which the fixed-n operators approximate at one granularity.

The r13 implementation was full Manber-Myers prefix doubling
(SICOMP'93) as DataFrame rounds: per round a sampled range
repartition, a partition-sizes collect, a broadcast offset join and a
self-join of the rank table against its shifted copy, then a greedy
2-joins-per-level LCP probe chain — ~135 serialized Spark jobs for
the registry's rounds=7 invocation, all driver latency. The r15
rewrite uses the cap to collapse the whole thing into ONE sort:

1. The stat is only needed exact up to cap = 2^rounds - 1 tokens, so
   each suffix is REPRESENTED by its cap-bounded token-hash slice.
   Ordering suffixes by (slice, doc, pos) is a true lexicographic
   suffix order through the cap (any injective relabeling of the
   alphabet — here xxhash64 — yields the same equal-prefix groups),
   so equal-prefix classes of every length <= cap are contiguous and
   max-LCP-with-anyone is a neighbor property.
2. One skew-spreading 8-prefix rank level (Manber-Myers reduced to a
   single round): each suffix's first-8-token slice gets
   rank = (bucket << 40) | dense_rank-within-bucket, where bucket is
   a deterministic high-bits split of the first token's hash — an
   order-preserving injective relabeling with NO sampling pass, NO
   size collect, NO offset join. The rank's upper bits (bucket plus
   the dense rank's high bits, ``>> _SUBSPLIT``) form the final
   sort's partitioning key: suffixes only colocate when they share
   their first token AND fall in the same ~2^_SUBSPLIT-wide band of
   8-prefix classes, so a hot head token spreads over many partitions
   instead of one.
3. The final sort by (rank, slice, id, pos) computes each adjacent
   pair's LCP INLINE — the first mismatch of the two slices via
   lead() — and emits both sides' (id, pos, lcp) rows in one explode.
   No probe chain, no rank-table lookups, no order-index self-join.
4. Partition-boundary adjacency needs only two tiny follow-ups:
   suffixes in different sub-buckets of the same head-token bucket
   share at most their first 8 tokens (their 8-prefix ranks differ),
   so a per-sub-bucket first/last frame (two rows per populated
   sub-bucket, 8-token slices riding) linked by a lead() window per
   head bucket recovers those LCPs; and suffixes in DIFFERENT head
   buckets differ in their first token's high bits, i.e. share no
   prefix at all — those pairs have LCP 0 and are simply omitted.

Exactness contract: values are exact up to the cap 2^rounds - 1;
longer duplications report the cap (and order ties beyond the cap are
broken arbitrarily, which the cap makes value-invisible). Token
identity is xxhash64 (the ``minhash_dedup_auto`` hashed-shingle
caveat: a 64-bit collision can overstate a span; never understates by
more than a collision's reach).

Scale shape: the plan is ONE lazy composition — no driver action, no
checkpoint, no mid-build job. The cap-bounded slices are the only
payload-weight column and cross exactly one exchange (the final
sort); everything else exchanges narrow (id, pos, rank) rows or
per-doc rank arrays. The byte bill is O(corpus tokens x cap x 8B)
through that one exchange — the probe-chain design moved the same
order of bytes, spread over 2 x rounds exchanges with a driver
barrier between each. Residual skew: suffixes sharing one entire
8-token prefix class band colocate (the same equal-keys-colocate
contract every rank round of the doubling design had); dense_rank
sub-banding spreads everything coarser than that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.operators.textstats import tokens
from seriesly_spark.operators.util import scoped_persist, spread

# Bits reserved for the within-bucket dense rank: 2^40 distinct
# 8-prefix classes per head bucket before overflow, with bucket ids
# capped far below 2^23 so the packed rank always fits a signed long.
_BLOCK = 40
# The final sort partitions by rank >> _SUBSPLIT: bands of 2^12
# consecutive 8-prefix classes share a partition key, anything coarser
# spreads. Head-token buckets split into up to 2^(40-12) bands.
_SUBSPLIT = 12
# Rank tuple width: the one rank level covers an 8-token prefix.
_PREF = 8


def _n_buckets(spark) -> int:
    """Deterministic head-bucket count: the smallest power of two >=
    32x the session's default parallelism (the guide's 20-100x rule so
    the bucket->partition hash spreads evenly), capped so
    (bucket << _BLOCK) can never overflow a long. Derived from the
    session, not a local constant — at cluster scale this follows the
    configured parallelism."""
    p = max(1, spark.sparkContext.defaultParallelism) * 32
    b = 1
    while b < p:
        b <<= 1
    return min(b, 1 << 20)


def _head_bucket(col, nb: int):
    """Ascending deterministic bucket id in [0, nb) for a raw xxhash64
    token hash — uniform over the full signed 64-bit range, so the top
    log2(nb) bits (shifted to non-negative) split it evenly. Monotone
    in the hash and colocates equal hashes, the two properties the
    sampled range partitioner used to provide."""
    m = nb.bit_length() - 1  # nb = 2^m
    return (F.shiftright(col, 64 - m) + F.lit(nb // 2)).cast("long")


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
    reports the cap), and on a short-doc corpus a large cap widens the
    suffix slices for nothing — pass ``rounds="auto"`` to derive the
    smallest exact cap from one cheap aggregate over the already-
    persisted token-hash table: rounds = bit_length(max doc tokens),
    so 2^rounds - 1 >= every possible span length and the stat is
    exact on ANY corpus. "auto" is still a pure function of the corpus
    (the max is deterministic), so oracle replayability survives — and
    the independent suffix-sort oracle never needed the cap anyway.
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


def _first_mismatch_lcp(s1, s2):
    """First mismatch index of two hash slices = their LCP. zip_with
    pads the shorter side with NULL and eqNullSafe turns the padding
    into a mismatch, so equal slices of unequal length report the
    shorter length and fully equal slices their own (cap- or
    remainder-bounded) length — inherently clamped, no separate
    remainder/cap arithmetic."""
    z = F.zip_with(s1, s2, lambda x, y: x.eqNullSafe(y))
    mism = F.array_position(z, False)
    return F.when(mism > 0, mism - 1).otherwise(F.size(s1)).cast("int")


def _pair_rows(s1, s2, id1, p1, id2, p2):
    """Both sides' (id, pos, lcp) rows for one adjacent suffix pair,
    emitted through a single explode so the pair table is read once."""
    lcp = _first_mismatch_lcp(s1, s2)
    return F.explode(
        F.array(
            F.struct(id1.alias("id"), p1.alias("pos"), lcp.alias("lcp")),
            F.struct(id2.alias("id"), p2.alias("pos"), lcp.alias("lcp")),
        )
    )


def _suffix_lcp(pre: DataFrame, rounds: int) -> DataFrame:
    """The shared suffix-array core: ``pre`` is a persisted frame
    carrying (id, __th token-hash array, ...). Returns (id, pos, lcp)
    with up to two rows per suffix position — its longest common
    prefix with each suffix-order neighbor, clamped to the suffix's
    remainder and the cap 2^rounds - 1 (neighbors whose LCP is
    provably 0 — different head-bucket — are omitted; consumers treat
    missing positions as 0). max(lcp) per (id, pos) is the position's
    longest-duplicated-prefix length (exact below the cap); consumers
    aggregate per position or per document as needed.

    Composes as ONE lazy plan (module docstring): no driver action,
    no checkpoint, no sampling run, no persisted state besides
    ``pre`` itself."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    spark = pre.sparkSession
    nb = _n_buckets(spark)
    blk = F.lit(1 << _BLOCK).cast("long")
    cap = (1 << rounds) - 1

    # Stage A — the single Manber-Myers rank level: each suffix keyed
    # by its first-8-token hash slice (in-row build, no window/join),
    # dense-ranked within its deterministic head bucket and packed as
    # (bucket << 40) | dense_rank: monotone + injective on the
    # 8-prefix, i.e. an order-preserving relabeling with no sampling
    # pass, no size collect, no offset join. ONE narrow exchange.
    rows = (
        pre.select(
            "id", "__th", F.posexplode("__th").alias("pos", "__t0")
        )
        .select(
            "id",
            "pos",
            F.slice("__th", F.col("pos") + 1, _PREF).alias("__s8"),
            _head_bucket(F.col("__t0"), nb).alias("__b0"),
        )
    )
    # Hot-head skew bound (ADVICE r15): this window partitions by the
    # HEAD-TOKEN bucket alone, so every suffix starting with one
    # Zipfian head token lands in a single window partition and one
    # task sorts all of its 8-token slices — the later __sb
    # sub-banding spreads only the final sort, not this rank pass.
    # Acceptable while max per-token frequency x 8 x 8 B fits one
    # task's sort budget (a ~1%-frequency token over 10^12 corpus
    # tokens is ~640 GB — salt this window with a second-token-derived
    # subkey and re-merge ranks before going there).
    wrank = Window.partitionBy("__b0").orderBy("__s8")
    ranked = rows.select(
        "id",
        "pos",
        (F.col("__b0") * blk + F.dense_rank().over(wrank)).alias("r"),
    )

    # Stage B — re-attach the per-position rank to the document (one
    # id-keyed regroup + one id-keyed join against the persisted token
    # table) and build the suffix rows (id, pos, r, s) with s the
    # cap-bounded token-hash slice: the only payload-weight column,
    # crossing exactly one exchange (the final sort below). The
    # sub-bucket key __sb = r >> _SUBSPLIT spreads hot head tokens
    # over bands of 2^_SUBSPLIT consecutive 8-prefix classes.
    ra = ranked.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "r"))),
            lambda e: e["r"],
        ).alias("__ra")
    )
    suf = (
        pre.join(ra, "id")
        .select(
            "id",
            "__th",
            "__ra",
            F.posexplode("__th").alias("pos", "__t"),
        )
        .select(
            "id",
            "pos",
            F.get("__ra", F.col("pos")).alias("r"),
            F.slice("__th", F.col("pos") + 1, cap).alias("s"),
        )
        .withColumn("__sb", F.shiftright("r", _SUBSPLIT))
    )

    # Stage C — ONE sort by (r, s, id, pos) per sub-bucket, which is
    # the full lexicographic suffix order through the cap: r orders by
    # the 8-prefix, s refines beyond it (both compare the same hashes,
    # so the composite order groups every equal-prefix class of length
    # <= cap contiguously; max-LCP-with-anyone is therefore a neighbor
    # property). Each suffix's LCP with its in-partition neighbor is
    # the first mismatch of the two slices, computed INLINE from
    # lead() — no probe joins, no rank-table lookups.
    wadj = Window.partitionBy("__sb").orderBy("r", "s", "id", "pos")
    adj = suf.withColumn(
        "__n", F.lead(F.struct("id", "pos", "s")).over(wadj)
    )
    within = (
        adj.where(F.col("__n").isNotNull())
        .select(
            _pair_rows(
                F.col("s"),
                F.col("__n.s"),
                F.col("id"),
                F.col("pos"),
                F.col("__n.id"),
                F.col("__n.pos"),
            ).alias("__e")
        )
        .select("__e.id", "__e.pos", "__e.lcp")
    )

    # Sub-bucket boundary pairs: the last suffix of a band is adjacent
    # to the next band's first. Different bands of the SAME head
    # bucket have different 8-prefix ranks, so those pairs share at
    # most their first 8 tokens — an 8-slice ride on the tiny two-
    # rows-per-band first/last frame suffices. Different HEAD buckets
    # differ in the first token's high bits — LCP 0, omitted outright
    # (consumers coalesce missing to 0).
    skey = F.struct("r", "s", "id", "pos")
    v8 = F.struct(
        "id", "pos", F.slice("s", 1, _PREF).alias("s8"), "r"
    )
    ends = suf.groupBy("__sb").agg(
        F.min_by(v8, skey).alias("__first"),
        F.max_by(v8, skey).alias("__last"),
    )
    wb = Window.partitionBy(
        F.shiftright(F.col("__sb"), _BLOCK - _SUBSPLIT)
    ).orderBy("__sb")
    boundary = (
        ends.select(
            "__sb",
            F.col("__last").alias("__a"),
            F.lead("__first").over(wb).alias("__z"),
        )
        .where(F.col("__z").isNotNull())
        .select(
            _pair_rows(
                F.col("__a.s8"),
                F.col("__z.s8"),
                F.col("__a.id"),
                F.col("__a.pos"),
                F.col("__z.id"),
                F.col("__z.pos"),
            ).alias("__e")
        )
        .select("__e.id", "__e.pos", "__e.lcp")
    )
    return within.union(boundary)


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
