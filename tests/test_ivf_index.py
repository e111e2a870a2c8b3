"""IvfIndex — the persistent incremental vector index. Lifecycle
equivalence (update/probe/compact/reopen must be value-invisible),
brute-force probe parity inside the probed cells, the frozen-codebook
contract, partition pruning on the probe plan, and crash recovery of
the compaction swap (the shared protocol, exercised through THIS
class's compact())."""

import os

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.vector_index import IvfIndex


def _vecs(spark, n=120, d=6):
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {d - 1}), j -> "
        "cast(1 + (id * 7 + j * 13) % 17 as double)) AS embedding",
    )


def _codebook(spark, vecs, k=4):
    return vecs.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )


class _InjectedCrash(RuntimeError):
    pass


def _crash_rename_from(monkeypatch, src):
    import seriesly_spark.operators.dedup_index as m

    real = os.rename

    def wrapper(s, d):
        if os.path.abspath(str(s)) == os.path.abspath(src):
            raise _InjectedCrash(s)
        return real(s, d)

    monkeypatch.setattr(m.os, "rename", wrapper)


class TestIvfIndex:
    def _build(self, spark, tmp_path, n=120):
        vecs = _vecs(spark, n)
        idx = IvfIndex(
            spark, str(tmp_path / "idx"), codebook=_codebook(spark, vecs)
        )
        idx.update(vecs.where(F.col("vec_id") % 2 == 0))
        idx.update(vecs.where(F.col("vec_id") % 2 == 1))
        return idx, vecs

    def _q(self, vecs, vid=0):
        return [
            float(x)
            for x in vecs.where(F.col("vec_id") == vid)
            .collect()[0]
            .embedding
        ]

    def test_update_report_counts_cover_batch(self, spark, tmp_path):
        vecs = _vecs(spark, 80)
        idx = IvfIndex(
            spark, str(tmp_path / "idx"), codebook=_codebook(spark, vecs)
        )
        rep = idx.update(vecs).collect()
        assert sum(r.n for r in rep) == 80
        assert all(r.n > 0 for r in rep)

    def test_probe_stable_across_compact_and_reopen(
        self, spark, tmp_path
    ):
        idx, vecs = self._build(spark, tmp_path)
        qv = self._q(vecs)
        pre = idx.topk(qv, k=7, nprobe=2, exclude_id=0).collect()
        stats = idx.compact()
        assert stats["files_before"] > 0
        post = idx.topk(qv, k=7, nprobe=2, exclude_id=0).collect()
        assert pre == post
        reopened = IvfIndex(spark, str(tmp_path / "idx"))
        assert reopened.topk(qv, k=7, nprobe=2, exclude_id=0).collect() == post

    def test_probe_matches_brute_force_within_cells(
        self, spark, tmp_path
    ):
        # exact parity with a hand-rolled scan over the probed cells
        from seriesly_spark.operators.similarity import cosine, ivf_assign

        idx, vecs = self._build(spark, tmp_path)
        qv = self._q(vecs, vid=5)
        cells = idx.probe_cells(qv, nprobe=2)
        assigned = ivf_assign(vecs, _codebook(spark, vecs))
        q = spark.createDataFrame([(qv,)], "qe array<double>")
        brute = (
            assigned.where(F.col("centroid_id").isin(cells))
            .where(F.col("vec_id") != 5)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                F.round(
                    cosine(F.col("embedding"), F.col("qe")), 6
                ).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), "vec_id")
            .limit(7)
            .collect()
        )
        got = idx.topk(qv, k=7, nprobe=2, exclude_id=5).collect()
        assert got == brute

    def test_codebook_is_frozen(self, spark, tmp_path):
        vecs = _vecs(spark, 40)
        cb = _codebook(spark, vecs)
        IvfIndex(spark, str(tmp_path / "idx"), codebook=cb)
        with pytest.raises(ValueError, match="frozen codebook"):
            IvfIndex(spark, str(tmp_path / "idx"), codebook=cb)
        with pytest.raises(ValueError, match="needs a codebook"):
            IvfIndex(spark, str(tmp_path / "fresh"))

    def test_probe_plan_is_partition_pruned(self, spark, tmp_path):
        idx, vecs = self._build(spark, tmp_path)
        idx.compact()
        qv = self._q(vecs)
        cells = set(idx.probe_cells(qv, nprobe=2))
        df = idx.topk(qv, k=5, nprobe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        live = plan.split("== Initial Plan ==")[0]
        assert "PartitionFilters" in live
        # every file actually read comes from a probed cell directory
        files = (
            idx._cells_df()
            .where(F.col("centroid_id").isin(list(cells)))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        )
        for r in files:
            assert any(f"centroid_id={c}" in r.f for c in cells) or (
                "/delta/" in r.f
            )

    def test_compact_crash_rolls_back_then_recovers(
        self, spark, tmp_path, monkeypatch
    ):
        idx, vecs = self._build(spark, tmp_path)
        qv = self._q(vecs)
        want = idx.topk(qv, k=7, nprobe=2, exclude_id=0).collect()
        # crash the swap at the tmp -> data rename (after base moved
        # aside): recovery must roll FORWARD (tmp is _SUCCESS-complete)
        _crash_rename_from(monkeypatch, idx._data + ".compact-tmp")
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        recovered = IvfIndex(spark, str(tmp_path / "idx"))
        assert (
            recovered.topk(qv, k=7, nprobe=2, exclude_id=0).collect()
            == want
        )
        # and the repaired index keeps working end to end
        more = _vecs(spark, 140).where(F.col("vec_id") >= 120)
        rep = recovered.update(more).collect()
        assert sum(r.n for r in rep) == 20


class TestIvfIndexTopkMulti:
    def test_equals_per_query_probes(self, spark, tmp_path):
        from pyspark.sql import functions as F

        vecs = _vecs(spark, 100)
        idx = IvfIndex(
            spark, str(tmp_path / "idx"), codebook=_codebook(spark, vecs)
        )
        idx.update(vecs)
        idx.compact()
        queries = vecs.where(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        multi = idx.topk_multi(
            queries, k=4, nprobe=2, exclude_self=True
        ).collect()
        for qid in range(6):
            qv = [
                float(x)
                for x in vecs.where(F.col("vec_id") == qid)
                .collect()[0]
                .embedding
            ]
            single = idx.topk(qv, k=4, nprobe=2, exclude_id=qid).collect()
            got = [
                (r.vec_id, r.cos_sim) for r in multi if r.query_id == qid
            ]
            assert got == [(r.vec_id, r.cos_sim) for r in single], qid

    def test_routing_uses_windowgrouplimit(self, spark, tmp_path):
        from pyspark.sql import functions as F

        vecs = _vecs(spark, 60)
        idx = IvfIndex(
            spark, str(tmp_path / "idx"), codebook=_codebook(spark, vecs)
        )
        idx.update(vecs)
        queries = vecs.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        df = idx.topk_multi(queries, k=3, nprobe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        live = plan.split("== Initial Plan ==")[0]
        assert "WindowGroupLimit" in live
        assert "CartesianProduct" not in live


class TestIvfIndexCompactCrashRollback:
    def test_crash_before_any_rename_rolls_back(
        self, spark, tmp_path, monkeypatch
    ):
        # crash at the data -> data.compact-old rename: tmp is complete
        # but NO swap happened — recovery must DROP the tmp (roll back)
        # and leave base+delta exactly as they were; a later compact()
        # then succeeds.
        vecs = _vecs(spark, 90)
        idx = IvfIndex(
            spark, str(tmp_path / "idx"), codebook=_codebook(spark, vecs)
        )
        # first compact establishes a base (without one, the swap's
        # data -> old step is a makedirs, not a rename)
        idx.update(vecs.where(F.col("vec_id") < 50))
        idx.compact()
        idx.update(vecs.where(F.col("vec_id") >= 50))
        qv = [
            float(x)
            for x in vecs.where(F.col("vec_id") == 3)
            .collect()[0]
            .embedding
        ]
        want = idx.topk(qv, k=6, nprobe=2, exclude_id=3).collect()
        _crash_rename_from(monkeypatch, idx._data)
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        recovered = IvfIndex(spark, str(tmp_path / "idx"))
        assert not os.path.isdir(idx._data + ".compact-tmp")
        assert os.path.isdir(idx._delta)  # delta untouched by rollback
        assert (
            recovered.topk(qv, k=6, nprobe=2, exclude_id=3).collect()
            == want
        )
        stats = recovered.compact()
        assert stats["files_after"] > 0
        assert (
            recovered.topk(qv, k=6, nprobe=2, exclude_id=3).collect()
            == want
        )
