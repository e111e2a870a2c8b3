"""Tumbling time-bucket math (reference query.go:280-285).

Bucket key = floor(ts_ns / (group_ms * 1e6)) * group_ms, exposed in
milliseconds — exactly the reference's emitted key (``po.key/1e6``,
reference handlers.go:190). Pure integer Column arithmetic; codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def idiv(c: Column, n: int) -> Column:
    """Exact floor-division of a LONG column by a positive int.

    ``F.floor(c / n)`` promotes to double — at ns-epoch magnitude (~1.8e18)
    doubles carry only 53 mantissa bits (~256 ns granularity). Decimal
    division alone is no better: Spark caps the result scale at 6, so a
    value within 0.5e-6·n of a boundary rounds UP before floor() sees it
    (e.g. ts 5 µs below a 10 s bucket edge landed in the next bucket).
    Subtracting pmod first makes the quotient an exact integer — division
    (decimal, to avoid the double path) then cannot round at any epoch.
    """
    exact = c - F.pmod(c, F.lit(n))
    return (exact.cast(T.DecimalType(38, 0)) / F.lit(n)).cast(T.LongType())


def bucket_ms_col(ts_ns: Column, group_ms: int) -> Column:
    if group_ms <= 0:
        raise ValueError("group level cannot be zero")  # reference query.go:245-248
    group_ns = group_ms * 1_000_000
    return (idiv(ts_ns, group_ns) * F.lit(group_ms)).cast(T.LongType())
