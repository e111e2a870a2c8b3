"""kmeans_lloyd semantics on constructed clusters: assignments must
migrate to the true groups even when both seeds start inside one group."""

import pytest

from seriesly_spark.operators.clustering import kmeans_lloyd


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_two_separated_clusters(spark):
    # seeds are ids 0 and 1 — one in each true cluster
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]),
            (2, [0.5, 0.0]), (3, [0.0, 0.5]),
            (4, [10.5, 10.0]), (5, [10.0, 10.5])]
    out = kmeans_lloyd(_vecs(spark, rows), k=2, iterations=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, {})[r.dim] = (r.centroid, r.n_members)
    assert set(by_cluster) == {0, 1}
    c0 = by_cluster[0]
    c1 = by_cluster[1]
    assert c0[0][1] == 3 and c1[0][1] == 3
    # centroids are the exact means of each group
    assert c0[0][0] == pytest.approx(0.166667, abs=1e-6)
    assert c1[0][0] == pytest.approx(10.166667, abs=1e-6)


def test_second_iteration_reassigns(spark):
    # both seeds (ids 0, 1) sit in the left group; the right group drags
    # seed-1's mean rightward in round 1, so round 2 captures it fully.
    rows = [(0, [0.0]), (1, [1.0]),
            (2, [0.2]), (3, [0.4]),
            (4, [9.0]), (5, [9.2]), (6, [9.4])]
    one = kmeans_lloyd(_vecs(spark, rows), k=2, iterations=1).collect()
    two = kmeans_lloyd(_vecs(spark, rows), k=2, iterations=2).collect()
    n1 = {r.cluster: r.n_members for r in one}
    n2 = {r.cluster: r.n_members for r in two}
    assert n1 != n2  # membership provably moved between rounds
    # after round 2 cluster 1 holds exactly the right-hand group
    assert n2[1] == 3
    c1 = next(r.centroid for r in two if r.cluster == 1 and r.dim == 0)
    assert c1 == pytest.approx(9.2, abs=1e-6)


def test_validates_params(spark):
    with pytest.raises(ValueError):
        kmeans_lloyd(_vecs(spark, [(0, [1.0])]), k=0)
