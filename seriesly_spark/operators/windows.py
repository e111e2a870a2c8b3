"""Windowed relational operators beyond the reference's surface: top-k per
group and sessionization — both classic shapes the reference lacks
entirely (SURVEY §2.3 gap list) expressed as window functions that shuffle
once on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` desc (deterministic tie-break).
    One shuffle on the group key; rank + filter stay in the same stage."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col)
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def hopping_window_agg(
    df: DataFrame,
    ts_col: str,
    length_ms: int,
    slide_ms: int,
    value_col: str,
) -> DataFrame:
    """Hopping (sliding) window aggregation — the windowed shape the
    reference lacks entirely (its only grouping is the tumbling bucket,
    SURVEY §2.3 gap list). Each row lands in length/slide windows;
    ``F.window`` expands them inline (narrow), then one shuffle on the
    window start. Sums accumulate as DECIMAL(38,18) for engine-exact
    results. Output: (bucket_ms, cnt, sum_value)."""
    w = F.window(F.col(ts_col), f"{length_ms} milliseconds", f"{slide_ms} milliseconds")
    dec_sum = F.sum(F.col(value_col).cast("decimal(38,18)")).cast("double")
    return (
        df.groupBy(w.alias("w"))
        .agg(F.count("*").alias("cnt"), F.round(dec_sum, 6).alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("bucket_ms"), "cnt", "sum_value"
        )
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_us_col: str,
    gap_us: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per-user session counts: a new session starts when the gap from the
    previous event exceeds ``gap_us``. lag + conditional sum — one shuffle
    on the user key. Returns (user, n_events, n_sessions)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_us_col), F.col(tiebreak_col))
    new_sess = (
        F.coalesce(
            (F.col(ts_us_col) - F.lag(ts_us_col).over(w)) > gap_us, F.lit(True)
        )
    ).cast("int")
    return (
        df.withColumn("__new", new_sess)
        .groupBy(user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("__new").alias("n_sessions"),
        )
    )


def fill_gaps(
    bucketed: DataFrame,
    series_cols: list[str],
    bucket_col: str,
    value_col: str,
    step_ms: int,
    how: str = "zero",
) -> DataFrame:
    """Densify a bucketed series: the reference (and seriesly queries here)
    emit only buckets that contain documents; dashboards need the dense
    time axis. Generates the full bucket spine per series between its min
    and max bucket, left-joins the observed values, marks holes with a
    ``filled`` flag, and fills them with 0.0 (``zero``), the last
    observed value (``ffill``), or the straight line between neighboring
    observations (``linear`` — head/tail holes use the nearest
    observation).

    Scale: the spine derives from a tiny per-series min/max aggregate and
    explodes to range/step rows per series (narrow); the join shuffles on
    (series, bucket) — the same key the upstream bucket agg already hashed
    on — and AQE broadcasts the spine when it is small. ``ffill`` adds one
    window pass partitioned by series (streaming frame, no extra sort at
    scale beyond the shuffle's)."""
    # persist(): the bucketed series feeds BOTH the spine min/max aggregate
    # and the join's observed side — without it the (possibly expensive)
    # upstream aggregation runs twice. The cached set is only series x
    # buckets rows, tiny at any scale.
    bucketed = bucketed.persist()
    spine = (
        bucketed.groupBy(*series_cols)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            *series_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_ms))
            ).alias(bucket_col),
        )
    )
    joined = spine.join(bucketed, [*series_cols, bucket_col], "left").withColumn(
        "filled", F.col(value_col).isNull()
    )
    if how == "zero":
        return joined.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0.0)))
    if how == "ffill":
        w = (
            Window.partitionBy(*series_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return joined.withColumn(
            value_col, F.last(value_col, ignorenulls=True).over(w)
        )
    if how == "linear":
        # Two frames over the same sort: last observed (value, bucket)
        # looking back, first observed looking forward. Interpolation is
        # pure IEEE arithmetic in a fixed order (identical in the DuckDB
        # oracle); only interpolated cells are rounded — observed values
        # pass through untouched.
        wb = (
            Window.partitionBy(*series_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*series_cols)
            .orderBy(bucket_col)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        obs_b = F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
        pv = F.last(value_col, ignorenulls=True).over(wb)
        pb = F.last(obs_b, ignorenulls=True).over(wb)
        nv = F.first(value_col, ignorenulls=True).over(wf)
        nb = F.first(obs_b, ignorenulls=True).over(wf)
        interp = F.round(
            pv
            + (nv - pv)
            * (F.col(bucket_col) - pb)
            / (nb - pb),
            6,
        )
        return joined.withColumn(
            value_col,
            F.when(~F.col("filled"), F.col(value_col))
            .when(pv.isNull(), nv)
            .when(nv.isNull(), pv)
            .otherwise(interp),
        )
    raise ValueError(f"unknown fill mode: {how!r}")


def moving_avg(
    bucketed: DataFrame,
    series_cols: list[str],
    bucket_col: str,
    value_col: str,
    n: int,
    out_col: str = "mavg",
) -> DataFrame:
    """Trailing n-bucket moving average per series (dashboard smoothing —
    the cross-bucket window shape the reference cannot express). One
    shuffle on the series key; the frame is evaluated streaming within the
    sorted partition. The frame sum accumulates as DECIMAL(38,18) so the
    result is independent of evaluation order (sliding-window aggregates
    differ in FP summation order across engines)."""
    w = (
        Window.partitionBy(*series_cols)
        .orderBy(bucket_col)
        .rowsBetween(-(n - 1), 0)
    )
    dec_sum = F.sum(F.col(value_col).cast("decimal(38,18)")).over(w)
    return bucketed.withColumn(
        out_col,
        F.round(dec_sum.cast("double") / F.count(F.lit(1)).over(w), 6),
    )
