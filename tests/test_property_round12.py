"""Hypothesis property tests for the round-12 operators: kmv_overlap
in the unsaturated regime against an exact pure-Python set replay, and
pagerank against a dense numpy power iteration on random small graphs
(the decimal-accumulated sums must land on the SAME doubles as plain
left-to-right python arithmetic when every per-destination sum has
at most a few terms in a canonical order — so the property uses the
rounded-9 outputs with a 1-ulp-tolerant comparison)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

group_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 60)),
    min_size=1,
    max_size=80,
)


class TestKmvExactProperty:
    @SET
    @given(rows=group_rows)
    def test_unsaturated_matches_set_algebra(self, spark, rows):
        # k=128 > any set here -> the sketch IS the set: every output
        # must equal exact set algebra
        from seriesly_spark.operators.sketches import kmv_overlap

        df = spark.createDataFrame(rows, "g string, key long")
        out = {
            (r.g_a, r.g_b): r
            for r in kmv_overlap(df, "g", "key", k=128).collect()
        }
        sets = {}
        for g, k in rows:
            sets.setdefault(g, set()).add(k)
        if len(sets) < 2:
            assert out == {}
            return
        a, b = sets["a"], sets["b"]
        r = out[("a", "b")]
        assert r.est_a == float(len(a))
        assert r.est_b == float(len(b))
        assert r.est_union == float(len(a | b))
        # the operator's contract is round(x, 6): its quantization
        # error (<= 5e-7) exceeds pytest.approx's default rel=1e-6
        # band for values < 1 (found by hypothesis on J = 1/6)
        assert r.jaccard == pytest.approx(
            len(a & b) / len(a | b), abs=5.1e-7
        )
        assert r.est_intersect == pytest.approx(
            len(a & b) / len(a | b) * len(a | b), abs=1.1e-6
        )


edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=0,
    max_size=25,
)


class TestPagerankProperty:
    @SET
    @given(edges=edge_lists, iters=st.integers(1, 6))
    def test_matches_dense_power_iteration(self, spark, edges, iters):
        from seriesly_spark.operators.graph import pagerank

        n = 10
        edf = spark.createDataFrame(
            edges or [], "src long, dst long"
        )
        ndf = spark.createDataFrame([(i,) for i in range(n)], "node long")
        got = {
            r.node: r.rank
            for r in pagerank(edf, ndf, iterations=iters).collect()
        }
        adj = {}
        for s, d in set(edges):
            adj.setdefault(s, set()).add(d)
        deg = {u: len(vs) for u, vs in adj.items()}
        r = [1.0 / n] * n
        for _ in range(iters):
            c = [0.0] * n
            for u, vs in sorted(adj.items()):
                for v in sorted(vs):
                    c[v] += r[u] / deg[u]
            m = sum(r[u] for u in range(n) if u not in deg)
            # (1.0 - 0.85), not the literal 0.15 — they are different
            # doubles, and the operator computes the subtraction
            r = [(1.0 - 0.85) / n + 0.85 * (c[i] + m / n) for i in range(n)]
        for i in range(n):
            # decimal accumulation vs python float sum can differ by an
            # ulp once sums have many terms; rounded-9 outputs on ranks
            # <= 1 keep that inside 2e-9
            assert got[i] == pytest.approx(round(r[i], 9), abs=2e-9)
