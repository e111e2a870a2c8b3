"""Property tests for the round-4 statistics operators: invariants a
brute-force Python reference can check on randomized micro-inputs
(bounds, conservation, symmetry) — the failure modes hand-picked
examples miss."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from seriesly_spark.operators.analytics import (
    chisq_independence,
    concentration_stats,
    cooccurrence,
    welch_ttest,
    winsorize_stats,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vals_st = st.lists(
    st.floats(-100, 100, allow_nan=False, allow_infinity=False).map(
        lambda x: round(x, 3)
    ),
    min_size=3,
    max_size=25,
)


@given(vals=vals_st)
@settings(**_SETTINGS)
def test_winsorize_mean_bounded_by_caps_and_conserves_n(spark, vals):
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v double"
    )
    row = winsorize_stats(df, "v", ["g"], 0.1, 0.9).first()
    assert row["n"] == len(vals)
    assert row["lo_cap"] <= row["hi_cap"]
    # winsorized mean lies within the caps (allow round-6 slop)
    assert row["lo_cap"] - 1e-6 <= row["mean_winsorized"]
    assert row["mean_winsorized"] <= row["hi_cap"] + 1e-6
    # clip counts never exceed n and never everything from one side
    assert 0 <= row["n_clip_lo"] <= len(vals)
    assert 0 <= row["n_clip_hi"] <= len(vals)


@given(a=vals_st, b=vals_st)
@settings(**_SETTINGS)
def test_welch_antisymmetric_and_brute_checked(spark, a, b):
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b],
        "g string, v double",
    )
    rows = welch_ttest(df, "v", "g").collect()
    ma = sum(a) / len(a)
    mb = sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    se2 = va / len(a) + vb / len(b)
    if se2 <= 0:
        assert rows == []
        return
    (r,) = rows
    t = (ma - mb) / math.sqrt(se2)
    assert abs(r["t_stat"] - t) < 1e-4
    assert abs(r["mean_diff"] - (ma - mb)) < 1e-4
    # Welch-Satterthwaite dof is bounded by min-1 .. n_a+n_b-2
    assert min(len(a), len(b)) - 1 - 1e-6 <= r["dof"]
    assert r["dof"] <= len(a) + len(b) - 2 + 1e-6


@given(
    rows=st.lists(
        st.tuples(st.sampled_from("xyz"), st.integers(0, 2)),
        min_size=4,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_chisq_nonnegative_with_correct_grid(spark, rows):
    df = spark.createDataFrame(rows, "a string, b long")
    out = chisq_independence(df, "a", "b").first()
    na = len({r[0] for r in rows})
    nb = len({r[1] for r in rows})
    assert out["chi2_stat"] >= 0.0
    assert out["dof"] == (na - 1) * (nb - 1)
    assert out["n_cells"] == na * nb
    assert out["n"] == len(rows)
    # chi2 is bounded by n * (min(|A|,|B|) - 1) for any table
    assert out["chi2_stat"] <= len(rows) * (min(na, nb) - 1) + 1e-6


@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=20)
)
@settings(**_SETTINGS)
def test_concentration_bounds(spark, counts):
    rows = [(k,) for k, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "u long")
    row = concentration_stats(df, "u").first()
    nk = len(counts)
    assert row["n_keys"] == nk
    assert row["n_total"] == sum(counts)
    # entropy in [0, ln n_keys]; normalized form in [0, 1]
    assert -1e-6 <= row["entropy"] <= math.log(max(nk, 2)) + 1e-6
    assert -1e-6 <= row["entropy_norm"] <= 1.0 + 1e-6
    # Gini in [0, 1 - 1/n); 0 exactly when all counts equal
    assert -1e-6 <= row["gini"] < 1.0
    if len(set(counts)) == 1:
        assert row["gini"] == 0.0
        if nk > 1:
            assert row["entropy_norm"] == 1.0


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("pqrs")),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_cooccurrence_matches_brute_force(spark, rows):
    df = spark.createDataFrame(rows, "u long, i string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence(df, "u", "i").collect()
    }
    sets = {}
    for u, i in rows:
        sets.setdefault(i, set()).add(u)
    items = sorted(sets)
    expected = {}
    for x in items:
        for y in items:
            if x < y and sets[x] & sets[y]:
                expected[(x, y)] = (
                    len(sets[x]), len(sets[y]), len(sets[x] & sets[y])
                )
    assert set(out) == set(expected)
    for k, (na, nb, both) in expected.items():
        r = out[k]
        assert (r["n_a"], r["n_b"], r["n_both"]) == (na, nb, both)
        assert r["jaccard"] == round(both / (na + nb - both), 6)
