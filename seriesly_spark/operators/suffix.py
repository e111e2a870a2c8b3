"""Suffix-order duplicated-substring statistics: a distributed
generalized SUFFIX ARRAY over the corpus token stream via
Manber-Myers prefix doubling (SICOMP'93), giving ARBITRARY-LENGTH
longest-duplicated-span stats next to the fixed-n gram family
(``dup_span_stats`` / ``substring_dup_stats`` / ``dedup_spans``) —
the length-exact core of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL'22), which the fixed-n operators
approximate at one granularity.

Algorithm, re-expressed as DataFrame rounds:

1. Every (doc, pos) suffix starts with rank_0 = a dense rank of its
   first token's xxhash64.
2. Round k (shift 2^k): each suffix's key becomes the pair
   (rank_k[pos], rank_k[pos + 2^k]) — the second component -1 when the
   shifted position runs off the document (a suffix never crosses a
   document boundary) — and rank_{k+1} is the dense rank of that pair.
   After K rounds ranks order suffixes by their first 2^K tokens.
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

Scale shape: every round is sort/rank/join machinery over narrow
(doc, pos, rank) rows — no token text survives past rank_0. The dense
rank is the two-phase distributed pattern (range repartition, local
row_number per partition, driver-side prefix offsets over the <=P
partition totals — P rows on the driver, never data). Per-round state
is one persisted rank table (kept through the LCP phase: rounds + 1
tables of 12-byte rows, the operator's declared memory bill) and
lineage is CheckpointRotator-bounded. The LCP phase is 2 equi-joins
per round on the adjacent-pair table. Everything shuffles on ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.operators.textstats import tokens
from seriesly_spark.operators.util import (
    CheckpointRotator,
    scoped_persist,
    spread,
)


def _dense_rank_distinct(
    df: DataFrame, cols: list[str], out_col: str = "r"
) -> DataFrame:
    """Dense rank (1-based, ties impossible — input is made distinct)
    of ``cols`` tuples in ascending order, WITHOUT a global
    single-partition window: range-repartition the distinct keys, rank
    locally per partition, then offset each partition by the total of
    its predecessors (RangePartitioner assigns ascending key ranges to
    ascending partition ids). The partition sizes collect to the
    driver — at most spark.sql.shuffle.partitions rows, never data.
    The distinct frame is persisted around the two consumers (sizes +
    ranks) because range boundaries are SAMPLED: a recompute could
    repartition differently and de-sync offsets from local ranks.
    Returns (cols..., r). Caller must unpersist via the handle in
    ``df._drd_handle`` after its downstream consumer materializes.
    """
    d = (
        df.select(*cols)
        .distinct()
        .repartitionByRange(*[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    sizes = sorted(
        d.groupBy("__pid").count().collect(), key=lambda r: r["__pid"]
    )
    off, offsets = 0, []
    for row in sizes:
        offsets.append((row["__pid"], off))
        off += row["count"]
    spark = df.sparkSession
    odf = F.broadcast(
        spark.createDataFrame(
            spark.sparkContext.parallelize(offsets or [(0, 0)], 1),
            "__pid int, __off long",
        )
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    out = (
        d.withColumn("__lr", F.row_number().over(w))
        .join(odf, "__pid")
        .select(*cols, (F.col("__off") + F.col("__lr")).alias(out_col))
    )
    out._drd_handle = d  # type: ignore[attr-defined]
    out._drd_total = off  # type: ignore[attr-defined]
    return out


def _dense_rank_direct(
    keyed: DataFrame,
    cols: list[str],
    out_col: str = "r",
    unique: bool = False,
) -> DataFrame:
    """Dense rank of ``cols`` over (id, pos, cols...) rows WITHOUT the
    distinct pass or the join-back ``_dense_rank_distinct`` pays:
    range-repartition the FULL table on ``cols`` (a RangePartitioner
    places equal keys in one partition), rank locally via a
    lag-changed flag prefix sum, and offset each partition by the
    cumulative per-partition DISTINCT-key counts (<= P driver rows).
    One shuffle + one driver action per level, vs three shuffles
    (distinct, range, join-back) + the same action — the suffix
    family's per-round cost cut. Rank VALUES are identical: same
    ascending dense rank over the same key tuples.

    The repartitioned table persists (range boundaries are SAMPLED —
    a recompute could repartition differently and de-sync offsets from
    local ranks); the returned frame is a narrow two-Window projection
    over it, so downstream re-references re-run a local sort over
    cached partitions instead of a shuffle. ``unique=True`` asserts
    the tuples are already unique (row_number local rank, sizes =
    partition counts). Returns (id, pos, out_col) plus the
    ``_drd_handle`` / ``_drd_total`` attrs of the distinct variant."""
    d = (
        keyed.repartitionByRange(*[F.col(c) for c in cols])
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    wo = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in cols])
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    if unique:
        ranked = d.withColumn("__lr", F.row_number().over(wo))
        per = F.count(F.lit(1))
    else:
        same = F.lit(True)
        for c in cols:
            same = same & (F.lag(c).over(wo) == F.col(c))
        # new key run <=> NOT every col equals the previous row's;
        # first row of a partition: lag is NULL -> same NULL ->
        # coalesce opens a new run
        flag = F.coalesce((~same).cast("int"), F.lit(1))
        # nested window functions are illegal in one expression: the
        # flag projects first, the running sum reads the column
        ranked = d.withColumn("__flag", flag).withColumn(
            "__lr", F.sum("__flag").over(wrun)
        )
        per = F.countDistinct(*cols)
    sizes = sorted(
        d.groupBy("__pid").agg(per.alias("c")).collect(),
        key=lambda r: r["__pid"],
    )
    off, offsets = 0, []
    for row in sizes:
        offsets.append((row["__pid"], off))
        off += row["c"]
    spark = keyed.sparkSession
    odf = F.broadcast(
        spark.createDataFrame(
            spark.sparkContext.parallelize(offsets or [(0, 0)], 1),
            "__pid int, __off long",
        )
    )
    out = ranked.join(odf, "__pid").select(
        "id", "pos", (F.col("__off") + F.col("__lr")).alias(out_col)
    )
    out._drd_handle = d  # type: ignore[attr-defined]
    out._drd_total = off  # type: ignore[attr-defined]
    return out


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
    reports the cap), and on a short-doc corpus rounds are wasted
    (each is ~3 jobs) — pass ``rounds="auto"`` to derive the smallest
    exact cap from one cheap aggregate over the already-persisted
    token-hash table: rounds = bit_length(max doc tokens), so
    2^rounds - 1 >= every possible span length and the stat is exact
    on ANY corpus. "auto" is still a pure function of the corpus (the
    max is deterministic), so oracle replayability survives — and the
    independent suffix-sort oracle never needed the cap anyway.
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
    consumers aggregate per position or per document as needed."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    rot = CheckpointRotator()
    rank_tables: list[DataFrame] = []
    handles: list[DataFrame] = []

    totals: list[int] = []

    def _ranked(keyed: DataFrame, cols: list[str], scope: str) -> DataFrame:
        """(doc,pos,keys) -> (doc,pos,r) via the direct dense rank —
        ONE shuffle + one driver action per level (no distinct pass,
        no join-back; see _dense_rank_direct). The returned frame is
        a projection over the level's persisted range-partitioned
        table; its handle is freed after the probe chain
        materializes (probes re-reference every level's table)."""
        rk = _dense_rank_direct(keyed, cols)
        handles.append(rk._drd_handle)  # type: ignore[attr-defined]
        totals.append(rk._drd_total)  # type: ignore[attr-defined]
        return rk

    # Level-0 "ranks" are the token hashes themselves: ANY injective
    # relabeling of the alphabet yields the same groups and a valid
    # lexicographic base order, so the first dense-rank pass (and its
    # join-back) is skipped outright. -1 keeps the existing
    # past-the-end sentinel — a real hash colliding with it is a
    # 2^-64-per-position event, the same class as the token-hash
    # collision caveat already accepted at every level.
    ranks = scoped_persist(
        pre.select("id", F.posexplode("__th").alias("pos", "r")),
        "suffix.rank_0",
        eager=True,
    )
    rank_tables.append(ranks)
    totals.append(-1)
    keyed = None
    k_sat = rounds
    for k in range(rounds):
        shift = 1 << k
        shifted = ranks.select(
            "id", (F.col("pos") - shift).alias("pos"), F.col("r").alias("k2")
        )
        # The checkpoint both materializes keyed for its two consumers
        # (the distinct-key ranking and the join-back) and TRUNCATES
        # lineage: keyed references ranks twice, so without truncation
        # the logical plan doubles per round (the connected_components
        # lesson — planning itself OOMs).
        # eager=False: the very next driver job (the ranking's
        # distinct-key sizes collect, or the final order index's for
        # the last round) materializes this checkpoint as its input —
        # a dedicated materialization job per round bought nothing but
        # the ~0.8 s local scheduling floor (rotator contract holds:
        # that job always runs before the next checkpoint call).
        keyed = rot.checkpoint(
            ranks.withColumnRenamed("r", "k1")
            .join(shifted, ["id", "pos"], "left")
            .select(
                "id", "pos", "k1", F.coalesce("k2", F.lit(-1)).alias("k2")
            ),
            eager=False,
        )
        if k == rounds - 1:
            break  # the last pairing feeds only the order index below
        ranks = _ranked(keyed, ["k1", "k2"], f"suffix.rank_{k + 1}")
        rank_tables.append(ranks)
        # Early exit on STAGNATION: a doubling round that splits no
        # group never will again (the partition is shift-closed), so
        # from here equal-rank <=> identical suffixes. All remaining
        # levels' equality probes collapse onto this table, and their
        # greedy adds collapse into one (the final clamp caps exactly).
        if totals[-1] == totals[-2]:
            k_sat = len(rank_tables) - 1
            keyed = None
            break

    # Suffix order: the final pairing already groups equal-(first
    # 2^rounds)-prefix suffixes, and ordering by the rank PAIR is
    # order-identical to ranking it first (dense rank is monotone);
    # (id, pos) breaks the remaining ties deterministically. Under
    # stagnation the last built table carries the identical partition.
    idx = _dense_rank_direct(
        keyed if keyed is not None else rank_tables[-1],
        ["k1", "k2", "id", "pos"] if keyed is not None else ["r", "id", "pos"],
        out_col="__sidx",
        unique=True,
    )
    # eager=False: the finished probe chain's checkpoint below runs
    # the whole thing in ONE job; a separate materialization here only
    # re-paid the scheduling floor. idx's sampled distinct frame must
    # stay persisted until that job runs (rank/offset coherence).
    pairs = rot.checkpoint(
        idx.select(
            F.col("__sidx").alias("__i"),
            F.col("id").alias("d1"),
            F.col("pos").alias("p1"),
        ).join(
            idx.select(
                (F.col("__sidx") - 1).alias("__i"),
                F.col("id").alias("d2"),
                F.col("pos").alias("p2"),
            ),
            "__i",
        ).select("d1", "p1", "d2", "p2", F.lit(0).alias("lcp")),
        eager=False,
    )
    # Probe sequence: (rank-table index, tokens granted on a match).
    # Levels >= k_sat share the saturated table and collapse into one
    # probe granting all their tokens at once.
    if k_sat <= rounds - 1:
        probes = [(k_sat, (1 << rounds) - (1 << k_sat))]
        probes += [(k, 1 << k) for k in range(k_sat - 1, -1, -1)]
    else:
        probes = [(k, 1 << k) for k in range(rounds - 1, -1, -1)]
    # No per-probe checkpoints: unlike the doubling loop, each probe
    # references the previous pairs frame ONCE, so the plan grows
    # LINEARLY (2 joins per level against cached rank tables) — the
    # whole greedy chain plans fine and executes as one action in the
    # consumer, saving a full materialization pass per level.
    for k, grant in probes:
        rk = rank_tables[k]
        a = rk.select(
            F.col("id").alias("d1"),
            F.col("pos").alias("__q1"),
            F.col("r").alias("__r1"),
        )
        b = rk.select(
            F.col("id").alias("d2"),
            F.col("pos").alias("__q2"),
            F.col("r").alias("__r2"),
        )
        pairs = (
            pairs.withColumn("__q1", F.col("p1") + F.col("lcp"))
            .withColumn("__q2", F.col("p2") + F.col("lcp"))
            .join(a, ["d1", "__q1"], "left")
            .join(b, ["d2", "__q2"], "left")
            .select(
                "d1",
                "p1",
                "d2",
                "p2",
                (
                    F.col("lcp")
                    + F.when(
                        F.col("__r1").isNotNull()
                        & (F.col("__r1") == F.col("__r2")),
                        F.lit(grant),
                    ).otherwise(F.lit(0))
                ).alias("lcp"),
            )
        )
    # The consumer union below references pairs TWICE (one leg per
    # side), so the finished chain materializes ONCE here — without
    # this the entire 2-joins-per-level chain executes twice.
    pairs = rot.checkpoint(pairs)
    # the chain is materialized: every level's range-partitioned rank
    # table (probes re-ran their Window projections over these) and
    # the order index's can go
    idx._drd_handle.unpersist(blocking=False)  # type: ignore[attr-defined]
    for h in handles:
        h.unpersist(blocking=False)
    # rank_k can match because BOTH suffixes END before 2^k tokens
    # (truncated keys carry identical -1 sentinel patterns) — that
    # forces the remaining contents AND lengths equal, so clamping the
    # greedy sum to the suffix's own remaining length is exact: in the
    # truncation case both remainders agree and equal the true LCP, in
    # the non-truncated case the clamp never binds. The cap clamp
    # handles the collapsed probe's deliberate over-grant on long
    # identical suffixes (low-level probes can still match past it).
    cap = (1 << rounds) - 1
    lens = pre.select("id", F.size("__th").alias("__n"))
    return (
        pairs.select(F.col("d1").alias("id"), F.col("p1").alias("pos"), "lcp")
        .union(
            pairs.select(
                F.col("d2").alias("id"), F.col("p2").alias("pos"), "lcp"
            )
        )
        .join(lens, "id")
        .select(
            "id",
            "pos",
            F.least(
                "lcp", F.col("__n") - F.col("pos"), F.lit(cap)
            ).alias("lcp"),
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
