"""Unit tests for operator utilities: SQL-semantics rounding and the
scoped persist lifecycle."""
import pytest

from seriesly_spark.operators.util import (
    _SCOPED_CACHE,
    round_half_up,
    scoped_persist,
)


def test_round_half_up_matches_sql_on_ties():
    # Python round() is banker's rounding: round(0.5) == 0. SQL rounds
    # half away from zero. Exercise ties at the 6th decimal.
    assert round_half_up(0.0000025, 6) == 0.000003
    assert round_half_up(0.0000015, 6) == 0.000002
    assert round_half_up(1.5, 0) == 2.0
    assert round_half_up(2.5, 0) == 3.0
    # The divergence being fixed: built-in round() is half-to-even on
    # exact binary ties (0.125 == 1/8 exactly; 2.5 exactly).
    assert round(2.5) == 2 and round(0.125, 2) == 0.12
    assert round_half_up(0.125, 2) == 0.13
    # Non-tie values are unchanged vs plain rounding.
    assert round_half_up(0.1234564, 6) == 0.123456
    assert round_half_up(0.1234566, 6) == 0.123457
    assert round_half_up(123.0, 6) == 123.0


def test_round_half_up_matches_spark_round(spark):
    # Cross-check against F.round on values including decimal ties.
    vals = [0.0000025, 0.0000015, 0.1234565, 2.0000005, 0.5181575,
            1.0 / 3.0, 0.1 + 0.2]
    rows = spark.sql(
        "SELECT "
        + ", ".join(f"round(CAST({v!r} AS DOUBLE), 6)" for v in vals)
    ).first()
    for v, sql_rounded in zip(vals, rows):
        assert round_half_up(v, 6) == sql_rounded, v


def test_scoped_persist_evicts_previous_invocation(spark):
    df1 = spark.range(10)
    p1 = scoped_persist(df1, "test.scope")
    assert p1.storageLevel.useMemory
    p2 = scoped_persist(spark.range(20), "test.scope", eager=True)
    # The previous invocation's frame is no longer cached...
    assert not p1.storageLevel.useMemory
    # ...the new one is, and is correct.
    assert p2.storageLevel.useMemory
    assert p2.count() == 20
    assert _SCOPED_CACHE["test.scope"] is p2
    # Distinct scopes do not evict each other.
    other = scoped_persist(spark.range(5), "test.scope2")
    assert p2.storageLevel.useMemory
    other.unpersist()
    p2.unpersist()
    _SCOPED_CACHE.clear()
