"""Property tests for the round-5 operators: invariants a brute-force
Python reference can check on randomized micro-inputs — URL
normalization idempotence, containment/jaccard ordering, heavy-hitter
exactness, reservoir uniform-rank structure."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# URLs assembled from structured parts so they are always parseable
# (the operator's contract) while covering case/port/params/fragment.
url_st = st.builds(
    lambda scheme, host, port, path, params, frag: (
        scheme
        + "://"
        + host
        + port
        + path
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
    st.sampled_from(["Example.COM", "a.b.c", "WWW.x.Org"]),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/A/b", "/A/b/", "/p"]),
    st.lists(
        st.sampled_from(
            ["a=1", "B=2", "utm_source=x", "gclid=9", "z=", "k=v%20w"]
        ),
        max_size=4,
    ),
    st.sampled_from(["", "#f", "#Sec2"]),
)


@given(urls=st.lists(url_st, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_normalize_url_idempotent(spark, urls):
    """normalize(normalize(u)) == normalize(u) — the canonical form is
    a fixed point, or repeated pipeline passes would keep rewriting."""
    from seriesly_spark.operators.urls import normalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(normalize_url(F.col("url")).alias("n"))
    twice = once.select(
        F.col("n"), normalize_url(F.col("n")).alias("n2")
    ).collect()
    for r in twice:
        assert r.n2 == r.n, (r.n, r.n2)


doc_st = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        min_size=3,
        max_size=12,
    ).map(" ".join),
    min_size=2,
    max_size=6,
)


@given(texts=doc_st)
@settings(**_SETTINGS)
def test_containment_dominates_jaccard_and_is_bounded(spark, texts):
    from seriesly_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    cont = {
        (r.a, r.b): r.containment
        for r in containment_pairs(df, threshold=0.0).collect()
    }
    jac = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
    }
    assert set(jac) == set(cont)  # same candidate pairs (shared spine)
    for pair, c in cont.items():
        assert 0.0 < c <= 1.0
        assert c >= jac[pair] - 1e-9  # min-divisor >= union-divisor


items_st = st.lists(
    st.sampled_from(["x", "y", "z", "w", "v", "u", "t"]),
    min_size=5,
    max_size=60,
)


@given(items=items_st, k=st.integers(2, 6), parts=st.integers(1, 5))
@settings(**_SETTINGS)
def test_heavy_hitters_equals_exact_filter(spark, items, k, parts):
    """The sketch path's answer must equal the brute-force GROUP BY /
    HAVING under every partitioning."""
    from seriesly_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(i,) for i in items], "item string"
    ).repartition(parts)
    got = {(r.item, r.n) for r in heavy_hitters(df, "item", k).collect()}
    cnt = Counter(items)
    want = {(i, c) for i, c in cnt.items() if c > len(items) / k}
    assert got == want


@given(
    n=st.integers(3, 40),
    groups=st.integers(1, 3),
    k=st.integers(1, 6),
)
@settings(**_SETTINGS)
def test_reservoir_rank_structure(spark, n, groups, k):
    from seriesly_spark.operators.sampling import reservoir_per_group

    df = spark.createDataFrame(
        [(i, "g%d" % (i % groups)) for i in range(n)], "id long, g string"
    )
    rows = reservoir_per_group(df, ["g"], "id", k).collect()
    per_g = {}
    for r in rows:
        per_g.setdefault(r.g, []).append(r.sample_rank)
    for g, ranks in per_g.items():
        size = sum(1 for i in range(n) if "g%d" % (i % groups) == g)
        assert sorted(ranks) == list(range(1, min(k, size) + 1))


@given(
    labels=st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=30,
    ),
    thr=st.integers(1, 10),
)
@settings(**_SETTINGS)
def test_rare_label_collapse_conserves_rows_and_mass(spark, labels, thr):
    from seriesly_spark.operators.sampling import rare_label_collapse

    df = spark.createDataFrame(
        list(enumerate(labels)), "id long, lab string"
    )
    rows = rare_label_collapse(df, "lab", thr).collect()
    assert len(rows) == len(labels)  # no row lost/duplicated by the join
    cnt = Counter(x for x in labels if x is not None)
    for r in rows:
        orig = labels[r.id]
        if orig is not None and cnt[orig] >= thr:
            assert (r.label_final, r.label_n) == (orig, cnt[orig])
        else:
            assert (r.label_final, r.label_n) == ("__other__", 0)
