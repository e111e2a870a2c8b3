"""Mergeable-sketch operators — the 100 TB scale path for distinct
cardinality and percentiles.

The exact gate queries (`distinct_users_daily`, `percentiles`) hash-match
a SQL oracle, but at cluster scale a per-bucket exact distinct or exact
percentile re-scans the fact table for every grain. Sketches fix the
shape: build a fixed-size mergeable summary per bucket ONCE, then answer
every coarser grain by merging summaries — never rescanning events.

  * HLL (Apache DataSketches, built into Spark as ``hll_sketch_agg`` /
    ``hll_union_agg``): per-bucket distinct sketches union into rollup
    estimates. Relative error ~1.6% at the default lgConfigK=12, and the
    sketch is exact in sparse mode at small cardinalities.
  * ``percentile_approx`` (Greenwald-Khanna style): rank error bounded by
    1/accuracy; the partial aggregate merges map-side like any other agg.

Estimates are engine-specific, so driver gate queries cannot hash-compare
them against DuckDB — instead the entry queries certify them in-engine:
exact values computed alongside, plus booleans asserting the estimate
lands inside the sketch's published error envelope.

No analogue in the reference (its reducer set is exact-only,
query.go:408-447); this extends SURVEY §2.3's gap list.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.util import scoped_persist


def hll_bucket_rollup(
    df: DataFrame, key_col: str, bucket_col: str
) -> DataFrame:
    """Per-bucket HLL distinct estimates plus the merged all-buckets
    estimate (``bucket_col`` NULL), from ONE scan of ``df``: the rollup
    row is a union of the per-bucket sketches, not a rescan. Returns
    ``(bucket_col, est_distinct)``.
    """
    # read twice: per-bucket estimates and the union rollup (scoped for
    # the one-live-copy lifecycle)
    buckets = scoped_persist(
        df.groupBy(bucket_col).agg(F.hll_sketch_agg(key_col).alias("sk")),
        "sketches.hll_buckets",
    )
    per_bucket = buckets.select(
        bucket_col, F.hll_sketch_estimate("sk").alias("est_distinct")
    )
    total = buckets.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_distinct")
    ).select(
        F.lit(None).cast(dict(df.dtypes)[bucket_col]).alias(bucket_col),
        "est_distinct",
    )
    return per_bucket.unionByName(total)


def approx_quantile_ranks(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: Sequence[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Empirical rank of each ``percentile_approx`` answer: for every
    group and target quantile q, the fraction of values <= the approximate
    quantile. ``percentile_approx`` guarantees rank error <= 1/accuracy,
    so ``rank_i`` lands within ``q ± (1/accuracy + 1/n)`` — a
    falsifiable in-engine certificate that needs no second engine.
    Returns ``(group_col, n, rank_0..rank_{len(qs)-1})``; the sketch
    aggregate is mergeable (map-side partials), the tiny per-group answer
    table is broadcast back for the rank pass.
    """
    ap = df.groupBy(group_col).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(float(q)) for q in qs]), F.lit(accuracy)
        ).alias("ap")
    )
    joined = df.join(F.broadcast(ap), group_col)
    ranks = [
        F.avg((F.col(value_col) <= F.col("ap")[i]).cast("double")).alias(
            f"rank_{i}"
        )
        for i in range(len(qs))
    ]
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"), *ranks
    )


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int,
) -> DataFrame:
    """Exact frequency-above-n/k items (heavy hitters) WITHOUT a
    vocabulary-sized shuffle — the "which domains/tokens dominate the
    corpus" screen where the vocabulary itself is too large to groupBy
    (raw URLs, shingles). Two passes:

    1. Per-partition Misra-Gries summaries (k counters each, classic
       streaming bound): any item with GLOBAL frequency > n/k must
       exceed n_p/k in at least one partition (otherwise summing the
       per-partition bounds gives total <= n/k), and per-partition MG
       with k counters retains every item with local frequency >
       n_p/k — so the union of partition candidates is a SUPERSET of
       the true heavy hitters. At most k * partitions candidate keys
       leave the map side — independent of vocabulary size.
    2. Exact recount of the candidate set only (broadcast semi-join +
       hash aggregate over candidate rows) and the > n/k filter. The
       superset property makes the final answer EXACT and independent
       of partitioning — MG's order-dependent estimates never escape
       the map side.

    Output: (item, n, n_total, threshold) for items with n > n_total/k,
    deterministic, SQL-replayable (the oracle is a plain
    GROUP BY/HAVING).
    """
    from typing import Iterator as _It

    import pandas as _pd

    src = df.select(F.col(item_col).cast("string").alias("item")).where(
        F.col(item_col).isNotNull()
    )

    def mg(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        # Mergeable Misra-Gries (Agarwal et al., PODS'12): per Arrow
        # batch take exact counts (C-speed value_counts), SUM into the
        # running summary, then if over k counters subtract the
        # (k+1)-th largest count from all and drop the non-positive —
        # the merge preserves MG's error bound (<= n_p/(k+1)), so the
        # retained set still covers every locally-heavy item. No
        # per-row Python.
        summary = _pd.Series(dtype="int64")
        for pdf in batches:
            summary = summary.add(pdf["item"].value_counts(), fill_value=0)
            if len(summary) > k:
                cut = summary.nlargest(k + 1).iloc[-1]
                summary = summary[summary > cut] - cut
        yield _pd.DataFrame({"item": summary.index.astype(str)})

    cand = src.mapInPandas(mg, "item string").distinct()
    tot = src.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        src.join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(tot))
        .withColumn("threshold", (F.col("n_total") / F.lit(k)))
        .where(F.col("n") > F.col("threshold"))
        .select("item", "n", "n_total", F.round("threshold", 6).alias("threshold"))
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 128,
) -> DataFrame:
    """Pairwise distinct-set overlap between groups from K-minimum-values
    sketches (Bar-Yossef et al., RANDOM'02; Beyer et al., SIGMOD'07) —
    the "audience overlap" question HLL cannot answer: HLL unions but
    never intersects, while a KMV sketch is a uniform bottom-k SAMPLE of
    the group's distinct-key hash space, so two sketches estimate their
    sets' Jaccard (shared fraction of the merged bottom-k) and from it
    the intersection size. Everything is a pure function of md5, so a
    second engine replays the numbers bit-for-bit — unlike HLL, this
    sketch needs no error-envelope certificate, it IS deterministic.

    Output, one row per unordered group pair (g_a < g_b):
    ``(g_a, g_b, est_a, est_b, est_union, jaccard, est_intersect)``.
    Groups with fewer than k distinct keys carry their sketch EXACTLY, so
    pairs of unsaturated groups report exact values; saturated pairs use
    the classic estimators ``D = (K-1)/v_K`` and ``J = |shared ∩ top-K|/K``
    on the merged bottom-K.

    Scale shape (the 100 TB path): ONE distinct on (group, key), then the
    rank filter compiles to WindowGroupLimit — each map task forwards at
    most k rows per group, so the exchange carries O(k · groups ·
    partitions) hashes regardless of corpus size; the pairwise stage runs
    on |groups| sketch rows (driver-tiny, broadcast nested-loop on the
    a < b inequality — the sanctioned tiny-side shape).
    """
    from pyspark.sql import Window

    two48 = float(1 << 48)

    def hexval(c):  # first 12 hex chars -> 48-bit int (exact in double)
        return F.conv(F.substring(c, 1, 12), 16, 10).cast("bigint")

    pairs = df.select(
        F.col(group_col).alias("g"),
        F.md5(F.col(key_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    sk = pairs.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k)
    gs = sk.groupBy("g").agg(
        F.count(F.lit(1)).alias("m"),
        F.array_sort(F.collect_list("h")).alias("hs"),
    )

    def est_one(m, hs):  # per-group distinct estimate (exact when m < k)
        vk = hexval(F.element_at(hs, m.cast("int"))) / F.lit(two48)
        return F.when(m < k, m.cast("double")).otherwise((m - 1) / vk)

    a = gs.select(
        F.col("g").alias("g_a"), F.col("m").alias("m_a"), F.col("hs").alias("hs_a")
    )
    b = gs.select(
        F.col("g").alias("g_b"), F.col("m").alias("m_b"), F.col("hs").alias("hs_b")
    )
    j = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))
    u = F.array_sort(F.array_union("hs_a", "hs_b"))
    j = j.withColumn("u", u).withColumn(
        "kk", F.least(F.lit(k), F.size("u"))
    ).withColumn("hk", F.element_at("u", F.col("kk")))
    inter_full = F.array_intersect("hs_a", "hs_b")
    shared_topk = F.size(F.filter(inter_full, lambda x: x <= F.col("hk")))
    both_exact = (F.col("m_a") < k) & (F.col("m_b") < k)
    vk = hexval(F.col("hk")) / F.lit(two48)
    est_union = F.when(both_exact, F.size("u").cast("double")).otherwise(
        (F.col("kk") - 1) / vk
    )
    jac = F.when(
        both_exact, F.size(inter_full) / F.size("u")
    ).otherwise(shared_topk / F.col("kk"))
    return j.select(
        "g_a",
        "g_b",
        F.round(est_one(F.col("m_a"), F.col("hs_a")), 6).alias("est_a"),
        F.round(est_one(F.col("m_b"), F.col("hs_b")), 6).alias("est_b"),
        F.round(est_union, 6).alias("est_union"),
        F.round(jac, 6).alias("jaccard"),
        F.round(jac * est_union, 6).alias("est_intersect"),
    ).orderBy("g_a", "g_b")


def kmv_rollup(
    df: DataFrame,
    bucket_col: str,
    key_col: str,
    k: int = 128,
) -> DataFrame:
    """Per-bucket distinct estimates plus the merged all-buckets
    estimate from ONE scan — ``hll_bucket_rollup``'s shape with KMV
    sketches, which buys exact engine replayability: the bottom-k of
    the UNION of per-bucket bottom-k sets IS the bottom-k of the full
    distinct set (any globally-small hash is small within its own
    bucket), so the rollup row is a pure merge of the per-bucket
    sketches — never a rescan — and every number is a deterministic
    function of md5. Output (bucket, est_distinct), rollup row has
    bucket NULL; estimates are exact for buckets with < k distinct
    keys.

    Scale shape: the per-bucket rank filter compiles to
    WindowGroupLimit (<= k hashes per bucket per map task); the merge
    is a global ordered limit over <= k * buckets rows, which compiles
    to TakeOrderedAndProject (per-partition top-k, no single-partition
    window)."""
    from pyspark.sql import Window

    two48 = float(1 << 48)

    def hexval(c):
        return F.conv(F.substring(c, 1, 12), 16, 10).cast("bigint")

    def est(m, hk):
        return F.round(
            F.when(m < k, m.cast("double")).otherwise(
                (m - 1) / (hexval(hk) / F.lit(two48))
            ),
            6,
        )

    pairs = df.select(
        F.col(bucket_col).alias("bucket"),
        F.md5(F.col(key_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("bucket").orderBy("h")
    sk = scoped_persist(
        pairs.withColumn("r", F.row_number().over(w)).where(F.col("r") <= k),
        "sketches.kmv_rollup",
    )
    per_bucket = sk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("m"), F.max("h").alias("hk")
    ).select("bucket", est(F.col("m"), F.col("hk")).alias("est_distinct"))
    merged = (
        sk.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.count(F.lit(1)).alias("m"), F.max("h").alias("hk"))
        .select(
            F.lit(None).cast(dict(df.dtypes)[bucket_col]).alias("bucket"),
            est(F.col("m"), F.col("hk")).alias("est_distinct"),
        )
    )
    return per_bucket.unionByName(merged)
