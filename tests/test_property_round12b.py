"""Hypothesis property tests for the round-12b operators:
jaccard_prefix_pairs must equal the naive shingle equi-join on random
corpora at random thresholds (the equivalence IS the operator's whole
contract); budget_select must equal a pure-Python greedy replay; hits
must equal a numpy power iteration on random small graphs."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small-vocabulary corpora maximize accidental shingle collisions —
# the regime where a broken prefix bound would actually lose pairs
word = st.sampled_from(["a", "b", "c", "d", "e"])
doc_texts = st.lists(
    st.lists(word, min_size=0, max_size=9).map(" ".join),
    min_size=1,
    max_size=10,
)


class TestJaccardPrefixProperty:
    @SET
    @given(texts=doc_texts, t=st.sampled_from([0.25, 0.4, 0.5, 0.75, 0.9]))
    def test_equals_naive(self, spark, texts, t):
        from seriesly_spark.operators.dedup import (
            jaccard_prefix_pairs,
            ngram_jaccard_pairs,
        )

        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        naive = sorted(
            map(tuple, ngram_jaccard_pairs(docs, threshold=t).collect())
        )
        fast = sorted(
            map(tuple, jaccard_prefix_pairs(docs, threshold=t).collect())
        )
        assert fast == naive


class TestBudgetSelectProperty:
    @SET
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["s1", "s2", "s3"]), st.integers(1, 30)),
            min_size=1,
            max_size=25,
        ),
        budget=st.integers(10, 400),
    )
    def test_equals_greedy_replay(self, spark, rows, budget):
        """budget_select == pure-Python replay: sqrt-weight allocation
        (round-half-up at 0 decimals like both engines), then
        longest-first cumsum <= allocation per source."""
        from seriesly_spark.operators.sampling import budget_select

        df = spark.createDataFrame(
            [(i, s, "w " * n) for i, (s, n) in enumerate(rows)],
            "doc_id long, source string, text string",
        )
        got = {
            r.doc_id: (r.source, r.n_tokens, r.cum_tokens)
            for r in budget_select(df, "source", budget).collect()
        }
        # replay
        tok = {s: 0 for s, _ in rows}
        for s, n in rows:
            tok[s] += n
        pw = {s: math.sqrt(v) for s, v in tok.items()}
        tot = sum(pw.values())
        alloc = {
            s: int(
                float(
                    __import__("decimal").Decimal(budget * v / tot).quantize(
                        0, rounding="ROUND_HALF_UP"
                    )
                )
            )
            for s, v in pw.items()
        }
        want = {}
        for s in tok:
            docs_s = sorted(
                (
                    (i, n)
                    for i, (src, n) in enumerate(rows)
                    if src == s
                ),
                key=lambda x: (-x[1], x[0]),
            )
            run = 0
            for i, n in docs_s:
                run += n
                if run <= alloc[s]:
                    want[i] = (s, n, run)
                else:
                    break
        assert got == want


edge_lists = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=20,
)


class TestHitsProperty:
    @SET
    @given(edges=edge_lists)
    def test_equals_numpy_power_iteration(self, spark, edges):
        import numpy as np

        from seriesly_spark.operators.graph import hits

        df = spark.createDataFrame(
            list(set(edges)), "src long, dst long"
        )
        out = {
            r.node: (r.hub, r.authority)
            for r in hits(df, iterations=3).collect()
        }
        nodes = sorted({v for e in set(edges) for v in e})
        idx = {v: i for i, v in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for s, d in set(edges):
            A[idx[s], idx[d]] = 1.0
        h = np.ones(len(nodes))
        a = np.zeros(len(nodes))
        for _ in range(3):
            a = A.T @ h
            na = math.sqrt(float((a * a).sum()))
            a = a / na if na > 0 else a * 0.0
            h = A @ a
            nh = math.sqrt(float((h * h).sum()))
            h = h / nh if nh > 0 else h * 0.0
        for v in nodes:
            assert out[v][0] == pytest.approx(h[idx[v]], abs=2e-9)
            assert out[v][1] == pytest.approx(a[idx[v]], abs=2e-9)
