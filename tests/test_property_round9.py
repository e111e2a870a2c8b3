"""Hypothesis property tests for the round-9 evaluation operators:
ks_statistic and lift_table checked against independent pure-Python
replays over small score grids (coarse grids force heavy ties — the
exact regime where the threshold/boundary arithmetic must not drift).
"""

from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# coarse score grid (quarters) => many exact ties; labels free
scored_rows = st.lists(
    st.tuples(
        st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]),
        st.booleans(),
    ),
    min_size=1,
    max_size=40,
)


def _brute_ks(rows):
    pos = sorted(s for s, y in rows if y)
    neg = sorted(s for s, y in rows if not y)
    if not pos or not neg:
        return None, None
    best, at = Fraction(-1), None
    for t in sorted({s for s, _ in rows}):
        cp = Fraction(sum(1 for s in pos if s <= t), len(pos))
        cn = Fraction(sum(1 for s in neg if s <= t), len(neg))
        term = abs(cp - cn)
        # engine rounds each term to 6 BEFORE the max
        term = Fraction(round(float(term), 6)).limit_denominator(10**7)
        if term > best or (term == best and (at is None or t < at)):
            if term > best:
                best, at = term, t
            elif t < at:
                at = t
    return float(best), at


def _brute_lift(rows, b):
    rows = sorted(rows, key=lambda r: -r[0])
    n = len(rows)
    npos = sum(1 for _, y in rows if y)
    # group by score descending
    groups = []
    for s, y in rows:
        if groups and groups[-1][0] == s:
            groups[-1][1] += 1
            groups[-1][2] += int(y)
        else:
            groups.append([s, 1, int(y)])
    out = {}
    cum_n = cum_p = 0
    for s, nr, np_ in groups:
        prev = cum_n
        cum_n += nr
        cum_p += np_
        d_min = (prev * b) // n + 1
        d_max = (cum_n * b) // n
        for d in range(d_min, d_max + 1):
            out[d] = (
                s,
                cum_n,
                cum_p,
                round(cum_n / n, 6),
                round(cum_p / npos, 6) if npos else None,
                round((cum_p / cum_n) / (npos / n), 6) if npos else None,
            )
    return out


class TestKsProperty:
    @SET
    @given(rows=scored_rows)
    def test_matches_fraction_replay(self, spark, rows):
        from seriesly_spark.operators.evaluation import ks_statistic

        df = spark.createDataFrame(rows, "score double, label boolean")
        r = ks_statistic(df).collect()[0]
        ks, at = _brute_ks(rows)
        assert r.n_pos == sum(1 for _, y in rows if y)
        assert r.n_neg == sum(1 for _, y in rows if not y)
        if ks is None:
            assert r.ks is None and r.ks_score is None
        else:
            assert r.ks == pytest.approx(ks, abs=2e-6)
            assert r.ks_score == at


class TestLiftProperty:
    @SET
    @given(rows=scored_rows, b=st.sampled_from([2, 3, 5, 10]))
    def test_matches_integer_boundary_replay(self, spark, rows, b):
        from seriesly_spark.operators.evaluation import lift_table

        df = spark.createDataFrame(rows, "score double, label boolean")
        got = {
            r.decile: (
                r.threshold, r.cum_n, r.cum_pos, r.cum_share, r.gain, r.lift
            )
            for r in lift_table(df, n_buckets=b).collect()
        }
        want = _brute_lift(rows, b)
        assert set(got) == set(want) == set(range(1, b + 1))
        for d in want:
            g, w = got[d], want[d]
            assert g[:4] == w[:4], (d, g, w)
            for gi, wi in zip(g[4:], w[4:]):
                if wi is None:
                    assert gi is None
                else:
                    assert gi == pytest.approx(wi, abs=2e-6)
