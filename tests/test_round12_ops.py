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


class TestPagerank:
    def test_matches_power_iteration(self, spark):
        # 1->2, 1->3, 2->3, 3->1, node 4 dangling: closed-loop replay
        from seriesly_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "node long")
        got = {
            r.node: r.rank
            for r in pagerank(edges, nodes, iterations=20).collect()
        }
        r = [0.25] * 4
        adj, deg = {1: [2, 3], 2: [3], 3: [1]}, {1: 2, 2: 1, 3: 1}
        for _ in range(20):
            c = [0.0] * 4
            for u, vs in adj.items():
                for v in vs:
                    c[v - 1] += r[u - 1] / deg[u]
            m = r[3]
            r = [0.15 / 4 + 0.85 * (ci + m / 4) for ci in c]
        for i in range(4):
            assert got[i + 1] == round(r[i], 9)

    def test_mass_conserved(self, spark):
        from seriesly_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23],
            "src long, dst long",
        )
        out = pagerank(edges, iterations=8).collect()
        assert sum(r.rank for r in out) == pytest.approx(1.0, abs=1e-6)

    def test_all_dangling(self, spark):
        # no edges at all: every node keeps exactly 1/n forever
        from seriesly_spark.operators.graph import pagerank

        edges = spark.createDataFrame([], "src long, dst long")
        nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
        out = pagerank(edges, nodes, iterations=3).collect()
        assert {r.rank for r in out} == {0.2}

    def test_partitioning_invariant(self, spark):
        from seriesly_spark.operators.graph import pagerank

        rows = [(i, (i * 3) % 40) for i in range(40) if i != (i * 3) % 40]
        e1 = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
        e2 = spark.createDataFrame(rows, "src long, dst long").repartition(16)
        a = sorted(map(str, pagerank(e1, iterations=5).collect()))
        b = sorted(map(str, pagerank(e2, iterations=5).collect()))
        assert a == b


class TestDerivationEdges:
    def test_first_carrier_edges(self, spark):
        from seriesly_spark.operators.graph import derivation_edges

        docs = spark.createDataFrame(
            [
                (1, "a b c d"),    # introduces "a b c", "b c d"
                (2, "a b c d"),    # copies both -> edges 2->1 (distinct)
                (3, "x y z"),      # novel: no out-edge
                (4, "b c d q r"),  # shares "b c d" -> edge 4->1
            ],
            "doc_id long, text string",
        )
        got = {(r.src, r.dst) for r in derivation_edges(docs, n=3).collect()}
        assert got == {(2, 1), (4, 1)}
