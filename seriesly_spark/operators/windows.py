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
