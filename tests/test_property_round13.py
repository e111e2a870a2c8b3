"""Hypothesis property tests for the round-13 operators: the
suffix-array stats and the length-exact span removal must equal naive
Python suffix comparisons on random small-vocabulary corpora (the
regime that maximizes accidental overlaps, partial spans, truncation
ties, and stagnation early-exits); dedup_spans_cross must equal a
brute-force benchmark-gram coverage replay."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary -> dense accidental suffix overlaps, the hard regime
word = st.sampled_from(["a", "b", "c"])
doc_texts = st.lists(
    st.lists(word, min_size=1, max_size=10).map(" ".join),
    min_size=1,
    max_size=8,
)


def _lcp(s1, s2):
    n = 0
    for x, y in zip(s1, s2):
        if x != y:
            break
        n += 1
    return n


class TestSuffixDupStatsProperty:
    @SET
    @given(texts=doc_texts, rounds=st.sampled_from([1, 2, 4]))
    def test_equals_naive(self, spark, texts, rounds):
        from seriesly_spark.operators.suffix import suffix_dup_stats

        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.max_dup_len)
            for r in suffix_dup_stats(docs, rounds=rounds).collect()
        }
        toks = {i: t.split() for i, t in rows}
        suf = [(d, p) for d, t in toks.items() for p in range(len(t))]
        cap = (1 << rounds) - 1
        want = {}
        for d, t in toks.items():
            m = 0
            for p in range(len(t)):
                for d2, p2 in suf:
                    if (d2, p2) != (d, p):
                        m = max(m, _lcp(t[p:], toks[d2][p2:]))
            want[d] = (len(t), min(m, cap))
        assert got == want


class TestDedupSpansExactProperty:
    @SET
    @given(texts=doc_texts, min_len=st.sampled_from([2, 3, 5]))
    def test_equals_naive_coverage(self, spark, texts, min_len):
        """A token survives iff NO duplicated span of >= min_len covers
        it — replayed naively as: position j is excised iff some start
        s <= j < s + L (L = that suffix's max dup-prefix, any length)
        with L >= min_len."""
        from seriesly_spark.operators.suffix import dedup_spans_exact

        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
            for r in dedup_spans_exact(docs, min_len=min_len).collect()
        }
        toks = {i: t.split() for i, t in rows}
        suf = [(d, p) for d, t in toks.items() for p in range(len(t))]
        want = {}
        for d, t in toks.items():
            dup_len = {}
            for p in range(len(t)):
                m = 0
                for d2, p2 in suf:
                    if (d2, p2) != (d, p):
                        m = max(m, _lcp(t[p:], toks[d2][p2:]))
                dup_len[p] = m
            removed = set()
            for p, m in dup_len.items():
                if m >= min_len:
                    removed.update(range(p, p + m))
            kept = [tok for j, tok in enumerate(t) if j not in removed]
            want[d] = (len(t), len(t) - len(kept), " ".join(kept))
        assert got == want


class TestDedupSpansCrossProperty:
    @SET
    @given(
        corpus_texts=doc_texts,
        bench_texts=doc_texts,
        n=st.sampled_from([2, 3]),
    )
    def test_equals_naive_coverage(self, spark, corpus_texts, bench_texts, n):
        from seriesly_spark.operators.dedup import dedup_spans_cross

        crows = list(enumerate(corpus_texts))
        brows = [(i + 1000, t) for i, t in enumerate(bench_texts)]
        corpus = spark.createDataFrame(crows, "doc_id long, text string")
        bench = spark.createDataFrame(brows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.text_clean)
            for r in dedup_spans_cross(corpus, bench, n=n).collect()
        }
        bgrams = {
            tuple(t.split()[s : s + n])
            for _, t in brows
            for s in range(len(t.split()) - n + 1)
        }
        want = {}
        for d, t in crows:
            toks = t.split()
            removed = set()
            for s in range(len(toks) - n + 1):
                if tuple(toks[s : s + n]) in bgrams:
                    removed.update(range(s, s + n))
            kept = [tok for j, tok in enumerate(toks) if j not in removed]
            want[d] = (len(toks), len(toks) - len(kept), " ".join(kept))
        assert got == want
