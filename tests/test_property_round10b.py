"""Hypothesis property tests for the round-10b agreement/threshold
operators: fleiss_kappa and krippendorff_alpha against pure-Python
replays over small random panels (ragged panels and degenerate
single-category cases arise naturally), and best_threshold against a
Fraction-exact sweep (the returned operating point must be internally
consistent AND undominated).

Float-compare discipline: expected values are computed UNROUNDED and
the operator's round-6 output asserted within 5.1e-7 — immune to the
HALF_UP (engine) vs half-even (python round()) boundary difference.
"""

from collections import Counter, defaultdict
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seriesly_spark.operators.evaluation import (
    best_threshold,
    fleiss_kappa,
    krippendorff_alpha,
)

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

panels = st.dictionaries(
    keys=st.integers(0, 5),
    values=st.lists(
        st.sampled_from(["A", "B", "C", None]), min_size=1, max_size=4
    ),
    min_size=1,
    max_size=6,
)


def _rows(panel):
    return [(i, c) for i, cats in panel.items() for c in cats]


def _cells(rows):
    cells = defaultdict(Counter)
    for item, cat in rows:
        if cat is not None:
            cells[item][cat] += 1
    return {i: c for i, c in cells.items() if c}


class TestFleissProperty:
    @SET
    @given(panel=panels)
    def test_matches_python_replay(self, spark, panel):
        rows = _rows(panel)
        r = 3
        cells = _cells(rows)
        kept = {i: c for i, c in cells.items() if sum(c.values()) == r}
        excl = sum(1 for c in cells.values() if sum(c.values()) != r)
        df = spark.createDataFrame(rows, "item long, cat string")
        got = fleiss_kappa(df, "item", "cat", raters=r).collect()[0]
        assert got.n_items == len(kept) and got.n_excluded == excl
        if not kept:
            assert got.p_bar is None and got.kappa is None
            return
        n = len(kept)
        s2 = sum(v * v for c in kept.values() for v in c.values())
        marg = Counter()
        for c in kept.values():
            marg.update(c)
        cross = sum(v * v for v in marg.values())
        p_bar = (s2 - n * r) / (n * r * (r - 1))
        p_e = cross / (float(n * r) * float(n * r))
        assert got.p_bar == pytest.approx(p_bar, abs=5.1e-7)
        assert got.p_e == pytest.approx(p_e, abs=5.1e-7)
        if p_e < 1.0:
            kappa = (p_bar - p_e) / (1.0 - p_e)
            assert got.kappa == pytest.approx(kappa, abs=1.1e-6)
        else:
            assert got.kappa is None


class TestKrippendorffProperty:
    @SET
    @given(panel=panels)
    def test_matches_python_replay(self, spark, panel):
        rows = _rows(panel)
        cells = _cells(rows)
        pairable = {
            i: c for i, c in cells.items() if sum(c.values()) >= 2
        }
        unp = sum(1 for c in cells.values() if sum(c.values()) < 2)
        df = spark.createDataFrame(rows, "item long, cat string")
        got = krippendorff_alpha(df, "item", "cat").collect()[0]
        assert got.n_items == len(pairable) and got.n_unpairable == unp
        n = sum(sum(c.values()) for c in pairable.values())
        assert got.n_ratings == n
        if n < 2:
            assert got.d_o is None and got.alpha is None
            return
        by_r = Counter()
        for c in pairable.values():
            ri = sum(c.values())
            by_r[ri] += ri * ri - sum(v * v for v in c.values())
        # panel sizes here are <= 4: S_r/(r-1) has denominator 1..3,
        # whose decimal expansions never sit on a round-6 boundary.
        u = sum(round(sr / (ri - 1), 6) for ri, sr in by_r.items())
        marg = Counter()
        for c in pairable.values():
            marg.update(c)
        m2 = sum(v * v for v in marg.values())
        e_mass = n * n - m2
        assert got.d_o == pytest.approx(u / n, abs=5.1e-7)
        d_e = float(e_mass) / (float(n) * float(n - 1))
        assert got.d_e == pytest.approx(d_e, abs=5.1e-7)
        if e_mass > 0:
            alpha = 1.0 - u * float(n - 1) / float(e_mass)
            assert got.alpha == pytest.approx(alpha, abs=1.1e-6)
        else:
            assert got.alpha is None


scored_rows = st.lists(
    st.tuples(
        st.sampled_from([0.0, 0.2, 0.4, 0.6, 0.8, 1.0]),
        st.booleans(),
    ),
    min_size=1,
    max_size=30,
)


class TestBestThresholdProperty:
    @SET
    @given(rows=scored_rows)
    def test_selected_point_is_consistent_and_undominated(
        self, spark, rows
    ):
        df = spark.createDataFrame(rows, "score double, label boolean")
        out = {r.criterion: r for r in best_threshold(df).collect()}
        pos = sum(1 for _, y in rows if y)
        neg = len(rows) - pos
        if pos == 0:
            assert out == {}
            return
        assert "f1" in out
        assert ("youden" in out) == (neg > 0)
        # Fraction-exact sweep for the optimum values.
        thresholds = sorted({s for s, _ in rows}, reverse=True)
        best_f1, best_j = Fraction(-1), Fraction(-10)
        for t in thresholds:
            tp = sum(1 for s, y in rows if y and s >= t)
            pp = sum(1 for s, _ in rows if s >= t)
            f1 = Fraction(2 * tp, pos + pp)
            best_f1 = max(best_f1, f1)
            if neg > 0:
                j = Fraction(tp, pos) - Fraction(pp - tp, neg)
                best_j = max(best_j, j)
        r = out["f1"]
        # internal consistency: reported f1 recomputes from (tp, pp)
        assert r.f1 == pytest.approx(
            2 * r.tp / (pos + r.pp), abs=5.1e-7
        )
        # undominated: no threshold beats the selected one
        assert r.f1 == pytest.approx(float(best_f1), abs=1.1e-6)
        if neg > 0:
            rj = out["youden"]
            assert rj.youden == pytest.approx(float(best_j), abs=1.1e-6)
