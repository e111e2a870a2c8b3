"""Hypothesis property tests for the round-8b operators: the span
merge checked against an independent pure-Python interval replay, the
snapshot diff against a dict-based replay, and mixture-plan mass
conservation."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny alphabet so duplicated windows actually occur at these sizes.
doc_texts = st.lists(
    st.text(alphabet=st.sampled_from("ab "), min_size=0, max_size=24),
    min_size=1,
    max_size=6,
)


def _brute_spans(docs: list[str], n: int):
    """Pure-Python replay of dup_span_stats semantics."""
    # match the engines: split of the trimmed text on \s+ (empty text
    # yields [''], one token)
    import re

    toks = [re.split(r"\s+", t.strip()) for t in docs]
    windows = {}
    for d, tk in enumerate(toks):
        for p in range(len(tk) - n + 1):
            key = tuple(tk[p : p + n])
            windows.setdefault(key, []).append((d, p))
    dup_pos = {}
    for key, occ in windows.items():
        if len(occ) > 1:
            for d, p in occ:
                dup_pos.setdefault(d, []).append(p)
    out = {}
    for d, tk in enumerate(toks):
        ps = sorted(dup_pos.get(d, []))
        spans = []
        for p in ps:
            if spans and p - spans[-1][1] <= n:
                spans[-1][1] = p
            else:
                spans.append([p, p])
        dup_tokens = sum(p2 - p1 + n for p1, p2 in spans)
        out[d] = (len(tk), len(spans), dup_tokens)
    return out


class TestDupSpanProperty:
    @SET
    @given(docs=doc_texts, n=st.integers(min_value=2, max_value=4))
    def test_matches_brute_force_interval_replay(self, spark, docs, n):
        from seriesly_spark.operators.dedup import dup_span_stats

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"])
            for r in dup_span_stats(df, n=n).collect()
        }
        assert got == _brute_spans(docs, n)

    @SET
    @given(docs=doc_texts)
    def test_coverage_bounded_and_consistent_with_window_stats(
        self, spark, docs
    ):
        from seriesly_spark.operators.dedup import (
            dup_span_stats,
            substring_dup_stats,
        )

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        spans = {
            r["doc_id"]: r.asDict()
            for r in dup_span_stats(df, n=3).collect()
        }
        wins = {
            r["doc_id"]: r.asDict()
            for r in substring_dup_stats(df, n=3).collect()
        }
        for d in spans:
            s, w = spans[d], wins[d]
            # dup spans exist iff dup windows exist
            assert (s["n_spans"] > 0) == (w["n_dup_windows"] > 0)
            # coverage never exceeds the doc and never undercounts a
            # single duplicated window's n tokens
            assert s["dup_tokens"] <= s["n_tokens"]
            if w["n_dup_windows"] > 0:
                assert s["dup_tokens"] >= 3


snapshots = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


class TestSnapshotDiffProperty:
    @SET
    @given(ref=snapshots, cur=snapshots)
    def test_matches_dict_replay(self, spark, ref, cur):
        from seriesly_spark.operators.evaluation import snapshot_diff

        schema = "doc_id long, text string"
        rdf = spark.createDataFrame(ref, schema)
        cdf = spark.createDataFrame(cur, schema)
        got = {
            r["status"]: r["n_docs"]
            for r in snapshot_diff(rdf, cdf).collect()
        }
        rd = {i: (t or "") for i, t in ref}
        cd = {i: (t or "") for i, t in cur}
        want = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
        for i in set(rd) | set(cd):
            if i not in rd:
                want["added"] += 1
            elif i not in cd:
                want["removed"] += 1
            elif rd[i] == cd[i]:
                want["unchanged"] += 1
            else:
                want["changed"] += 1
        assert got == want
        assert sum(got.values()) == len(set(rd) | set(cd))


class TestMixturePlanProperty:
    @SET
    @given(
        sizes=st.lists(
            st.integers(min_value=1, max_value=10**6),
            min_size=1,
            max_size=6,
        )
    )
    def test_mass_conservation_and_monotonicity(self, spark, sizes):
        from seriesly_spark.operators.sampling import mixture_plan

        rows = [(f"s{i}", n) for i, n in enumerate(sizes)]
        df = spark.createDataFrame(rows, "source string, n_tok long")
        out = mixture_plan(
            df, "source", budget_tokens=10**6, size_col="n_tok"
        ).collect()
        # weights and raw shares each sum to ~1 (round-6 granularity)
        assert abs(sum(r["weight"] for r in out) - 1) < 1e-4 * len(out)
        assert abs(sum(r["raw_share"] for r in out) - 1) < 1e-4 * len(out)
        # planned tokens sum to ~budget
        assert abs(sum(r["planned_tokens"] for r in out) - 10**6) <= len(out)
        # sqrt temperature preserves the size ORDER of weights but
        # compresses ratios toward 1
        by_size = sorted(out, key=lambda r: r["n_tokens"])
        for a, b in zip(by_size, by_size[1:]):
            if a["n_tokens"] < b["n_tokens"]:
                assert a["weight"] <= b["weight"]
                assert a["raw_share"] <= b["raw_share"]
                # upweighting: the smaller source's weight/raw ratio
                # is at least the larger one's
                if a["raw_share"] > 0 and b["raw_share"] > 0:
                    assert (
                        a["weight"] / a["raw_share"]
                        >= b["weight"] / b["raw_share"] - 1e-6
                    )
