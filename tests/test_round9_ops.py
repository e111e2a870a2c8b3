"""Round-9 operators: the kmeans-trained IVF codebook path.

The first-N-vectors codebook convention is deterministic but blind to
structure; on a CLUSTERED corpus a trained codebook routes each cluster
to its own cell, so an nprobe=1 probe scans exactly one cluster with
perfect recall. These tests build well-separated clusters where Lloyd
provably converges (seeds spread in one cluster still separate within
three rounds — the far clusters capture their own means in round 1)
and pin both the happy path and the first-N contrast.
"""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.similarity import (
    ann_ivf_recall,
    ivf_assign,
    train_ivf_codebook,
)


def _clustered(spark):
    """3 clusters x 11 vectors; ids 0-10 around (1,0), 11-21 around
    (10,10), 22-32 around (-10,10). Ids 0,1,2 are ALL in the first
    cluster, so the first-N codebook is maximally unlucky."""
    rows = []
    for i in range(11):
        rows.append((i, [1.0 + 0.01 * i, 0.001 * i]))
    for i in range(11):
        rows.append((11 + i, [10.0 + 0.01 * i, 10.0 - 0.01 * i]))
    for i in range(11):
        rows.append((22 + i, [-10.0 - 0.01 * i, 10.0 + 0.01 * i]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


class TestTrainIvfCodebook:
    def test_codebook_shape_and_rounding(self, spark):
        cb = train_ivf_codebook(_clustered(spark), n_centroids=3,
                                iterations=3)
        rows = cb.collect()
        assert len(rows) == 3
        assert set(cb.columns) == {"centroid_id", "embedding"}
        for r in rows:
            assert len(r["embedding"]) == 2
            for x in r["embedding"]:
                assert x == round(x, 6)  # round-6 trained means

    def test_trained_cells_recover_clusters(self, spark):
        df = _clustered(spark)
        cb = train_ivf_codebook(df, n_centroids=3, iterations=3)
        a = ivf_assign(df, cb).select("vec_id", "centroid_id").collect()
        cells = {}
        for r in a:
            cells.setdefault(r["centroid_id"], set()).add(r["vec_id"])
        assert sorted(
            tuple(sorted(v)) for v in cells.values()
        ) == [
            tuple(range(11)),
            tuple(range(11, 22)),
            tuple(range(22, 33)),
        ]

    def test_trained_beats_first_n_on_clustered_data(self, spark):
        df = _clustered(spark)
        queries = [5, 15, 26]
        cb = train_ivf_codebook(df, n_centroids=3, iterations=3)
        trained = {
            r["query_id"]: r
            for r in ann_ivf_recall(
                df, queries, k=5, nprobe=1, codebook=cb
            ).collect()
        }
        # Trained cells == true clusters: every query scans exactly its
        # 10 cluster-mates and recalls all 5 exact neighbours.
        for q in queries:
            assert trained[q]["n_cand"] == 10
            assert trained[q]["recall"] == 1.0
        # First-N codebook = ids 0,1,2 — three near-parallel directions
        # inside ONE cluster; cells cannot equal the true clusters, so at
        # least one query pays (worse recall or a bigger scan) for the
        # same nprobe.
        firstn = {
            r["query_id"]: r
            for r in ann_ivf_recall(
                df, queries, k=5, nprobe=1, n_centroids=3
            ).collect()
        }
        assert any(
            firstn[q]["recall"] < 1.0 or firstn[q]["n_cand"] > 10
            for q in queries
        )

    def test_semantic_dedup_still_green_after_refactor(self, spark):
        # semantic_dedup now trains via train_ivf_codebook — the cluster
        # structure must be unchanged: in-cluster near-identical pairs
        # flag the greater id.
        from seriesly_spark.operators.dedup import semantic_dedup

        df = _clustered(spark)
        out = {
            r["vec_id"]: r
            for r in semantic_dedup(
                df, k=3, iterations=3, tau=0.999999
            ).collect()
        }
        assert len(out) == 33
        # cluster 2 (ids 11-21) vectors are near-parallel (cos ~1): the
        # smallest id survives, all others flagged.
        flagged = [i for i in range(11, 22) if out[i]["is_dup"]]
        assert 11 not in flagged and len(flagged) >= 1


class TestHashInit:
    def _blocked(self, spark):
        """3 clusters, BLOCK-ordered ids (0-10 cluster A, 11-21 B,
        22-32 C) — the source-ordered layout where smallest-ids seeding
        starts all seeds inside cluster A."""
        rows = []
        for i in range(11):
            rows.append((i, [1.0 + 0.01 * i, 0.001 * i]))
        for i in range(11):
            rows.append((11 + i, [10.0 + 0.01 * i, 10.0 - 0.01 * i]))
        for i in range(11):
            rows.append((22 + i, [-10.0 - 0.01 * i, 10.0 + 0.01 * i]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_hash_init_is_deterministic(self, spark):
        df = self._blocked(spark)
        a = train_ivf_codebook(df, n_centroids=3, iterations=2,
                               init="hash").collect()
        b = train_ivf_codebook(df, n_centroids=3, iterations=2,
                               init="hash").collect()
        key = lambda r: r["centroid_id"]  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_hash_init_recovers_blocked_clusters(self, spark):
        df = self._blocked(spark)
        cb = train_ivf_codebook(df, n_centroids=3, iterations=3,
                                init="hash")
        a = ivf_assign(df, cb).select("vec_id", "centroid_id").collect()
        cells = {}
        for r in a:
            cells.setdefault(r["centroid_id"], set()).add(r["vec_id"])
        assert sorted(
            tuple(sorted(v)) for v in cells.values()
        ) == [
            tuple(range(11)),
            tuple(range(11, 22)),
            tuple(range(22, 33)),
        ]

    def test_bad_init_rejected(self, spark):
        from seriesly_spark.operators.clustering import kmeans_lloyd

        with pytest.raises(ValueError, match="init"):
            kmeans_lloyd(self._blocked(spark), k=3, init="random")


class TestIvfPartitionPruning:
    def test_probe_reads_only_its_cell(self, spark, tmp_path):
        """The production IVF layout: assignment written partitioned by
        centroid_id, probe = partition-pruned scan of ONE cell. Pinned
        at the plan level (PartitionFilters on centroid_id) and at the
        file level (only the probed cell's files are read)."""
        from seriesly_spark.operators.similarity import ivf_probe

        df = _clustered(spark)
        cb = train_ivf_codebook(df, n_centroids=3, iterations=3)
        assigned = ivf_assign(df, cb)
        path = str(tmp_path / "ivf_cells")
        assigned.write.partitionBy("centroid_id").parquet(path)
        stored = spark.read.parquet(path)

        cell = {
            r["vec_id"]: r["centroid_id"]
            for r in assigned.select("vec_id", "centroid_id").collect()
        }[5]
        qrow = df.where(F.col("vec_id") == 5).select("embedding")
        out = ivf_probe(stored, qrow, query_centroid=cell, k=3)

        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        assert re.search(
            r"PartitionFilters: \[[^\]]*centroid_id[^\]]*=", plan
        ), plan
        # file-level proof: input_file_name() over the EXECUTED filtered
        # read touches only the probed cell's directory (inputFiles()
        # would list all cells — it predates pruning)
        touched = {
            r[0]
            for r in stored.where(F.col("centroid_id") == cell)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        assert touched and all(
            f"centroid_id={cell}" in f for f in touched
        )
        # and the probe's answer is the right one: top-3 all from vec
        # 5's own cluster, the query among them (ivf_probe ranks the
        # raw cell; near-parallel neighbours tie with it at round-6
        # cosine 1.0 and the id tie-break orders the tie)
        got = [r["vec_id"] for r in out.collect()]
        assert len(got) == 3 and 5 in got
        assert all(0 <= v <= 10 for v in got)


class TestWriteIvfIndex:
    def test_layout_one_file_per_cell_and_roundtrip(self, spark, tmp_path):
        import os

        from seriesly_spark.operators.similarity import (
            ivf_probe,
            load_ivf_index,
            write_ivf_index,
        )

        df = _clustered(spark).repartition(8)  # many upstream partitions
        cb = train_ivf_codebook(df, n_centroids=3, iterations=3)
        assigned = ivf_assign(df, cb)
        path = str(tmp_path / "index")
        write_ivf_index(assigned, path)
        # one file per cell despite the 8-partition input (no spray)
        cells = [d for d in os.listdir(path) if d.startswith("centroid_id=")]
        assert len(cells) == 3
        for c in cells:
            files = [
                f for f in os.listdir(os.path.join(path, c))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (c, files)
        stored = load_ivf_index(spark, path)
        assert stored.count() == 33
        # probe over the loaded layout still prunes and answers
        cell5 = {
            r["vec_id"]: r["centroid_id"] for r in assigned.collect()
        }[5]
        out = ivf_probe(
            stored,
            df.where(F.col("vec_id") == 5).select("embedding"),
            query_centroid=cell5,
            k=3,
        )
        got = [r["vec_id"] for r in out.collect()]
        assert len(got) == 3 and all(0 <= v <= 10 for v in got)
