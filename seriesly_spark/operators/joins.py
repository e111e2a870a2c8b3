"""Temporal joins — the cross-series operations the reference pushes to the
client (SURVEY §2.3: "cross-series math is done client-side", the cubism.js
adapter issues one query per metric). First-class here.

as-of join: for every left row, the most recent right row at or before its
timestamp, per key — the canonical "align metric B to metric A's sample
points" operation. Spark-first expression: tag both sides, union, one
window over (key, ts) carrying the last-seen right payload forward, keep
left rows. One shuffle on the key columns — same cost as a regular
co-partitioned join; no range-join explosion, no per-row lookups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    max_dt: int,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Interval join: all (l, r) pairs with the same key and
    ``|l.on - r.on| <= max_dt`` — "events within Δt of each other".

    Naive SQL (`l.t BETWEEN r.t - Δ AND r.t + Δ`) plans as a key-equi join
    with a range *filter*, which degenerates to per-key cross products.
    Here both sides are bucketized to width ``max_dt`` and the left side
    expands to its bucket ± 1 (any qualifying pair is at most one bucket
    apart) — the join becomes a plain equi-join on (key, bucket), shuffled
    and co-partitioned, with the exact |dt| predicate applied after. 3x row
    expansion on one side buys co-location; skew follows key+bucket, which
    AQE splits. Output: left columns + right payload (suffixed) + dt.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    lb = left.withColumn(
        "__b",
        F.explode(
            F.array(
                (F.col(on) / max_dt).cast("long") - 1,
                (F.col(on) / max_dt).cast("long"),
                (F.col(on) / max_dt).cast("long") + 1,
            )
        ),
    )
    rb = right.select(
        *[F.col(c).alias(f"__by_{c}") for c in by],
        (F.col(on) / max_dt).cast("long").alias("__b"),
        F.col(on).alias("__rt"),
        *[F.col(c).alias(c + suffix) for c in right_cols],
    )
    cond = [lb[c] == rb[f"__by_{c}"] for c in by] + [lb["__b"] == rb["__b"]]
    dt = F.col(on) - F.col("__rt")
    return (
        lb.join(rb, cond)
        .where(F.abs(dt) <= max_dt)
        .drop("__b", *[f"__by_{c}" for c in by])
        .withColumn("dt", dt)
        .drop("__rt")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join (l.on >= r.on, latest r wins), left-outer.

    ``on``: ordering column name present in both inputs (numeric or
    timestamp). ``by``: equality key columns. ``right_cols``: right payload
    columns to attach (default: all non-key, non-ts columns), each renamed
    with ``suffix``.

    Determinism: if the right side can hold several rows at the same
    (key, ts), deduplicate it first (e.g. sources.tables.latest_by_key) —
    ties inside one timestamp have no defined winner in any engine's as-of.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*by, on)]
    lcols = left.columns

    tagged_l = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__src"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    tagged_r = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__src"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*right_cols).alias("__r"),
    )
    u = tagged_l.unionByName(tagged_r)
    # Right rows sort before left rows at equal ts (__src 0 < 1), so a left
    # row matches a right row with the exact same timestamp (l.ts >= r.ts).
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last("__r", ignorenulls=True).over(w)
    out = (
        u.withColumn("__m", carried)
        .where(F.col("__src") == 1)
        .select(
            "__l.*",
            *[F.col(f"__m.{c}").alias(c + suffix) for c in right_cols],
        )
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: when the join key is low-cardinality or has
    hot keys, a plain shuffle join serializes each hot key onto one
    reducer. Salting splits every key into ``n_salts`` sub-partitions:
    left rows get a deterministic salt from ``xxhash64(salt_from)`` (any
    roughly-unique left column), the right side is replicated once per
    salt with a ``sequence`` explode, and the join runs on
    ``on + [salt]`` — parallelism becomes keys x salts and no reducer
    sees a whole hot key.

    Each left row carries exactly one salt, so inner/left results equal
    the unsalted join row-for-row. Right/full-outer would surface each
    unmatched right replica ``n_salts`` times — rejected.

    This is the manual fallback for when AQE's skew-join splitting cannot
    apply (e.g. the skew is in a broadcast-ineligible dimension or a
    non-sort-merge plan); it composes with any downstream aggregate.
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "leftsemi"):
        raise ValueError("salted_join preserves semantics for inner/left joins only")
    salt = F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).cast("int")
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lhs.join(rhs, [*on, "__salt"], how).drop("__salt")
