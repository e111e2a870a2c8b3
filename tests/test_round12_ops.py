"""Round-12 operator tests: the KMV bottom-k distinct sketch family
(pairwise overlap estimation — the set-intersection question HLL
cannot answer)."""

import pyspark.sql.functions as F
import pytest


def _kmv(spark, rows, k):
    from seriesly_spark.operators.sketches import kmv_overlap

    df = spark.createDataFrame(rows, "g string, key long")
    return {
        (r.g_a, r.g_b): r for r in kmv_overlap(df, "g", "key", k=k).collect()
    }


class TestKmvOverlapExact:
    """Pairs of unsaturated groups (fewer than k distinct keys each)
    must report EXACT distinct counts, union, Jaccard, intersection —
    the sketch holds the whole hash set."""

    def test_exact_values(self, spark):
        rows = (
            [("a", i) for i in range(30)]
            + [("b", i) for i in range(10, 50)]
            + [("c", i) for i in range(100, 120)]
        )
        out = _kmv(spark, rows, k=128)
        ab = out[("a", "b")]
        assert (ab.est_a, ab.est_b) == (30.0, 40.0)
        assert ab.est_union == 50.0
        assert ab.jaccard == pytest.approx(20 / 50)
        assert ab.est_intersect == pytest.approx(20.0)
        ac = out[("a", "c")]
        assert (ac.jaccard, ac.est_intersect) == (0.0, 0.0)

    def test_duplicates_ignored(self, spark):
        # sketch is over DISTINCT keys: repeating rows changes nothing
        base = [("a", i) for i in range(20)] + [("b", i) for i in range(5, 25)]
        out1 = _kmv(spark, base, k=64)
        out2 = _kmv(spark, base * 3, k=64)
        r1, r2 = out1[("a", "b")], out2[("a", "b")]
        assert r1.asDict() == r2.asDict()

    def test_identical_groups(self, spark):
        rows = [("a", i) for i in range(40)] + [("b", i) for i in range(40)]
        r = _kmv(spark, rows, k=128)[("a", "b")]
        assert r.jaccard == 1.0
        assert r.est_intersect == 40.0
        assert r.est_union == 40.0


class TestKmvOverlapEstimates:
    """Saturated groups use the (K-1)/v_K estimator; with k=256 the
    standard error is ~1/sqrt(k) ≈ 6.3%, so a 4-sigma envelope (25%)
    is a deterministic, non-flaky gate (the md5 hash sequence is
    fixed)."""

    def test_envelope(self, spark):
        rows = [("x", i) for i in range(10_000)] + [
            ("y", i) for i in range(5_000, 15_000)
        ]
        r = _kmv(spark, rows, k=256)[("x", "y")]
        assert r.est_a == pytest.approx(10_000, rel=0.25)
        assert r.est_b == pytest.approx(10_000, rel=0.25)
        assert r.est_union == pytest.approx(15_000, rel=0.25)
        assert r.jaccard == pytest.approx(1 / 3, rel=0.35)
        assert r.est_intersect == pytest.approx(5_000, rel=0.35)

    def test_deterministic_across_partitionings(self, spark):
        rows = [("x", i) for i in range(3_000)] + [
            ("y", i) for i in range(1_000, 4_000)
        ]
        from seriesly_spark.operators.sketches import kmv_overlap

        df1 = spark.createDataFrame(rows, "g string, key long").coalesce(1)
        df2 = spark.createDataFrame(rows, "g string, key long").repartition(16)
        a = kmv_overlap(df1, "g", "key", k=128).collect()
        b = kmv_overlap(df2, "g", "key", k=128).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))

    def test_plan_uses_window_group_limit(self, spark):
        # the bottom-k rank filter must compile to WindowGroupLimit so
        # each map task forwards at most k rows per group pre-exchange
        from seriesly_spark.operators.sketches import kmv_overlap

        df = spark.createDataFrame(
            [("a", i) for i in range(10)], "g string, key long"
        )
        plan = (
            kmv_overlap(df, "g", "key", k=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
