"""Event-analytics operators over bucketed series: cohort retention,
ordered funnels, outlier flagging, and exponential smoothing.

None of these exist in the reference — its query model is one tumbling
bucket at a time (`reference query.go:228-275`), so anything relating a
user's buckets to each other (retention), ordering events across types
(funnel), or weighting a trailing window (EWMA) is out of reach there.
Each is expressed as a composition of hash aggregates / window frames
that shuffles on its natural key exactly once per stage.

Cross-engine determinism rules (see SKILL.md / PLANS.md): sums accumulate
as DECIMAL(38,18), float outputs round to 6, integer math stays integer
(`idiv`, integer EWMA weights) so the DuckDB oracle can reproduce every
bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.functions.bucketing import idiv


def cohort_retention(
    df: DataFrame,
    user_col: str,
    bucket_col: str,
    step_ms: int,
) -> DataFrame:
    """Classic retention triangle: users are cohorted by their first
    active bucket; each (cohort, offset) cell counts the cohort's users
    still active ``offset`` buckets later.

    Plan: ONE shuffle on the user key — ``collect_set(bucket)`` dedups
    map-side, so what moves is each user's distinct-bucket set (bounded
    by the date range, not event volume). The cohort minimum and offsets
    derive from the set narrowly; the final (cohort, offset) aggregate
    shuffles only cohort-cell partials.

    Output: (cohort_bucket, bucket_offset, n_users).
    """
    days = (
        df.select(F.col(user_col).alias("u"), F.col(bucket_col).alias("b"))
        .groupBy("u")
        .agg(F.collect_set("b").alias("bs"))
        .select(F.array_min("bs").alias("cohort_bucket"), F.explode("bs").alias("b"))
    )
    return (
        days.select(
            "cohort_bucket",
            idiv(F.col("b") - F.col("cohort_bucket"), step_ms).alias("bucket_offset"),
        )
        .groupBy("cohort_bucket", "bucket_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Strictly-ordered funnel totals: one row per step,
    (step_idx, step, n_users) — how many users completed steps 1..i in
    order. Derived from :func:`funnel_users` with a single global
    count-non-null aggregate unpivoted via ``stack`` — no driver-side
    actions, one plan."""
    fu = funnel_users(df, user_col, ts_col, type_col, steps)
    counts = fu.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    )
    stack_args = ", ".join(
        f"{i}, '{s}', n{i}" for i, s in enumerate(steps, start=1)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step_idx, step, n_users)"
    )


def funnel_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-user funnel detail: one row per user who entered the funnel,
    with each step's completion timestamp (null once the funnel stalls).
    Same staged co-partitioned plan as :func:`funnel_counts`, but keeps
    the per-step times and outer-joins the stages, so the caller gets the
    full conversion table instead of counts. Output columns:
    (user, t1..tk)."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    stage = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = stage
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            df.where(F.col(type_col) == s)
            .join(
                stage.select(user_col, F.col(f"t{i-1}").alias("__prev")),
                user_col,
            )
            .where(F.col(ts_col) > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
        stage = nxt
    return out


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    threshold: float = 2.5,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group z-score outlier flags: |value - mean| / stddev >=
    ``threshold``. Population moments accumulate as DECIMAL(38,18) (sum
    and sum-of-squares in one partial aggregate), so mean/variance — and
    therefore every z — are bit-identical across engines; z rounds to 6.

    Plan: one hash aggregate over the group key (tiny result), broadcast
    back onto the scan — the data path is a narrow filter, no shuffle of
    the events themselves. Output: id/group/value columns + z.
    """
    id_cols = id_cols or []
    v = F.col(value_col)
    # v*v is ONE correctly-rounded IEEE multiply (identical across
    # engines); the decimal cast then makes the summation
    # order-independent. decimal*decimal instead would hit Spark's
    # precision-loss scale clamping, which DuckDB doesn't mirror.
    stats = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v.cast("decimal(38,18)")).cast("double").alias("__s"),
        F.sum((v * v).cast("decimal(38,18)")).cast("double").alias("__s2"),
    )
    mean = F.col("__s") / F.col("__n")
    # Clamp: rounding can drive a mathematically-zero variance a hair
    # negative, and sqrt(neg) is NaN.
    var = F.greatest(
        F.col("__s2") / F.col("__n") - mean * mean, F.lit(0.0)
    )
    stats = stats.select(
        *group_cols, mean.alias("__mean"), F.sqrt(var).alias("__sd")
    )
    z = (F.col(value_col) - F.col("__mean")) / F.col("__sd")
    return (
        df.join(F.broadcast(stats), group_cols)
        # sd == 0 (constant group): z is ±Inf/NaN and NaN compares
        # greater-than-everything in Spark/DuckDB, which would flag the
        # whole group; a constant group has no outliers by definition.
        .where(F.col("__sd") > 0)
        .withColumn("z", F.round(z, 6))
        .where(F.abs(F.col("z")) >= threshold)
        .select(*id_cols, *group_cols, value_col, "z")
    )


def ewma(
    bucketed: DataFrame,
    series_cols: list[str],
    bucket_col: str,
    value_col: str,
    k: int = 6,
    out_col: str = "ewma",
) -> DataFrame:
    """Truncated exponentially-weighted moving average over the trailing
    ``k`` buckets with integer halving weights 2^(k-1) ... 1 (decay 0.5
    per bucket), renormalized over the lags that exist near the series
    head. Weights are powers of two, so value x weight is an EXACT
    double op (exponent shift, no rounding); each product then casts to
    DECIMAL(38,18) so the sum is order-independent — the final division
    is the only inexact op, bit-stable across engines (a float decay
    like 0.9^j would not be: pow() is not correctly rounded). One
    shuffle on the series key; the k lag() reads share one window sort.
    """
    if not 1 <= k <= 32:
        raise ValueError("k must be in [1, 32]")
    w = Window.partitionBy(*series_cols).orderBy(bucket_col)
    num = None
    den = None
    for j in range(k):
        weight = 1 << (k - 1 - j)
        lagged = F.lag(value_col, j).over(w) if j else F.col(value_col)
        term = F.coalesce(
            (lagged * F.lit(float(weight))).cast("decimal(38,18)"),
            F.lit(0).cast("decimal(38,18)"),
        )
        wterm = F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return bucketed.withColumn(
        out_col, F.round(num.cast("double") / den, 6)
    )


def histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Equi-width histogram per group: ``bins`` buckets over [lo, hi),
    out-of-range values clamped into the edge bins (so every row lands
    somewhere — the feature-analysis convention, not SQL width_bucket's
    overflow buckets). Bin index = floor((v - lo) / width), clamped to
    [0, bins-1]; bin edges are computed from the SAME IEEE ops on both
    engines, so assignment is bit-deterministic.

    Bounds are caller-supplied constants, NOT a data-dependent min/max —
    one pass, one hash aggregate on (group, bin) with map-side partials;
    the shuffle carries at most |groups| x bins rows per task. Scale-safe
    at any row count.
    """
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError("hi must be > lo")
    width = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    # Clamp on the LONG floor result first, cast to int after: casting
    # before the clamp would let a |v| huge enough to overflow int32 wrap
    # under the non-ANSI cast (possibly negative -> clamped to bin 0
    # instead of bins-1), diverging from engines that widen or error.
    bin_ = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(bins - 1).cast("bigint"),
            F.floor((v - F.lit(float(lo))) / F.lit(float(width))),
        ),
    ).cast("int")
    return (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "bin_lo", F.round(F.lit(float(lo)) + F.col("bin") * F.lit(float(width)), 6)
        )
    )


def pivot_counts(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """Wide rollup: one row per ``row_col``, one count column per value of
    ``pivot_col`` (explicit ``values`` list — no distinct-values pre-job,
    which on an unbounded key would both cost a pass and produce an
    unbounded schema). Empty cells are 0, not NULL.

    Plan: Spark's pivot with explicit values compiles to ONE hash
    aggregate with |values| conditional counts — identical shuffle shape
    to a narrow groupBy, just wider partials. Scale-safe as long as
    ``values`` is a small fixed vocabulary (event types, languages, ...).
    """
    if not values:
        raise ValueError("values must be non-empty")
    out = df.groupBy(row_col).pivot(pivot_col, values).count()
    # count() leaves NULL where a (row, value) cell saw no rows.
    return out.select(
        row_col,
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(v) for v in values],
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    threshold: float = 3.5,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Robust per-group outliers via median absolute deviation: flag rows
    where |0.6745 * (v - median) / MAD| >= ``threshold`` (the classic
    modified z-score; 0.6745 rescales MAD to sigma-equivalents under
    normality). Unlike mean/stddev z-scores, a few extreme values cannot
    mask themselves by inflating the spread estimate.

    Medians are EXACT (Spark ``percentile``, DuckDB ``quantile_cont`` —
    both linear-interpolated, same IEEE arithmetic), computed in two
    group aggregates: median of v, then median of |v - median|. Both
    aggregate results are tiny (one row per group) and broadcast back
    onto the scan, so the data path is a narrow filter — the events
    themselves never shuffle. Zero-MAD (majority-constant) groups
    produce no outliers, mirroring zscore_outliers' zero-sd guard.

    Exact percentile holds all group values per partial — at extreme
    per-group cardinality swap in approx_percentile (sketch-mergeable,
    see operators/sketches.py) and re-certify with its error envelope.
    """
    id_cols = id_cols or []
    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    dev = (
        df.join(F.broadcast(med), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad"),
            F.first("__med").alias("__med"),
        )
    )
    z = F.lit(0.6745) * (v - F.col("__med")) / F.col("__mad")
    return (
        df.join(F.broadcast(dev), group_cols)
        .where(F.col("__mad") > 0)
        .withColumn("mz", F.round(z, 6))
        .where(F.abs(F.col("mz")) >= threshold)
        .select(*id_cols, *group_cols, value_col, "mz")
    )


def quantile_transform(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    id_cols: list[str] | None = None,
    out_col: str = "pct_rank",
) -> DataFrame:
    """Per-group quantile (percent-rank) normalization of a feature:
    each value maps to (rank - 1) / (n - 1) within its group — the
    distribution-free rescaling used to make skewed features comparable
    across groups (scikit-learn's QuantileTransformer shape, exact).
    Ties share a rank (standard percent_rank), identically in Spark and
    DuckDB; the single-row group edge case yields 0.0. Rounds to 6.

    One shuffle: the rank window sorts each group once. Per-group data
    must fit a partition's sort budget — at extreme group cardinality
    swap in approx_percentile bin edges (operators/sketches.py) and
    grade values against the sketch instead.
    """
    id_cols = id_cols or []
    # NULLS LAST to match DuckDB/ANSI default ordering (Spark's ASC
    # default is NULLS FIRST, which would shift every in-group rank if
    # the column ever carries NULLs).
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc_nulls_last()
    )
    return df.select(
        *id_cols,
        *group_cols,
        value_col,
        F.round(F.percent_rank().over(w), 6).alias(out_col),
    )
