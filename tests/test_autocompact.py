"""Auto-compaction policy for the incremental dedup indexes (opt-in):
``update`` ends by checking delta file count / delta-to-base byte ratio
against thresholds and compacting when crossed — the reference's
``maxOpQueue``-triggered flush (main.go:28-29) re-expressed for the
LSM-split index layout."""

import os

from pyspark.sql import functions as F

from seriesly_spark.operators.dedup_index import (
    DedupIndex,
    MinhashIndex,
    _auto_compact_reason,
    index_update_report,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _delta_files(idx):
    if not os.path.isdir(idx._delta):
        return 0
    return sum(1 for f in os.listdir(idx._delta) if f.endswith(".parquet"))


class TestReasonHelper:
    def test_disabled_by_default(self, tmp_path):
        assert _auto_compact_reason(str(tmp_path), str(tmp_path), None, None) is None

    def test_file_count_trigger(self, tmp_path):
        delta = tmp_path / "delta"
        delta.mkdir()
        for i in range(3):
            (delta / f"{i}.parquet").write_bytes(b"x")
        assert _auto_compact_reason("nodata", str(delta), 3, None)
        assert _auto_compact_reason("nodata", str(delta), 4, None) is None

    def test_ratio_needs_a_base(self, tmp_path):
        """A fresh index (no base) has ratio infinity forever — the
        ratio trigger must stay silent and leave bootstrap to the
        file-count trigger."""
        delta = tmp_path / "delta"
        delta.mkdir()
        (delta / "0.parquet").write_bytes(b"x" * 100)
        assert _auto_compact_reason(str(tmp_path / "data"), str(delta), None, 0.5) is None

    def test_ratio_trigger_against_base(self, tmp_path):
        data = tmp_path / "data"
        delta = tmp_path / "delta"
        data.mkdir()
        delta.mkdir()
        (data / "base.parquet").write_bytes(b"x" * 1000)
        (delta / "d.parquet").write_bytes(b"x" * 400)
        assert _auto_compact_reason(str(data), str(delta), None, 0.5) is None
        (delta / "d2.parquet").write_bytes(b"x" * 200)
        assert _auto_compact_reason(str(data), str(delta), None, 0.5)


class TestDedupIndexAutoCompact:
    def test_off_by_default(self, spark, tmp_path):
        idx = DedupIndex(spark, str(tmp_path / "idx"), n_buckets=4)
        for i in range(3):
            idx.update(_batch(spark, [(i, f"doc {i}")]))
        assert _delta_files(idx) == 3
        assert not os.path.isdir(idx._data)

    def test_file_count_threshold_folds_delta(self, spark, tmp_path):
        idx = DedupIndex(
            spark, str(tmp_path / "idx"), n_buckets=4, auto_compact_files=3
        )
        idx.update(_batch(spark, [(1, "a"), (2, "b")]))
        idx.update(_batch(spark, [(3, "c")]))
        assert _delta_files(idx) == 2  # below threshold: untouched
        idx.update(_batch(spark, [(4, "d")]))  # 3rd file -> auto-compact
        assert _delta_files(idx) == 0
        assert os.path.isdir(idx._data)
        assert idx.size() == 4

    def test_classification_exact_across_auto_compact(self, spark, tmp_path):
        """The update whose append crosses the threshold still returns
        its own classification (staged before the compact), and the
        next probe sees the folded index exactly once per digest."""
        idx = DedupIndex(
            spark, str(tmp_path / "idx"), n_buckets=4, auto_compact_files=2
        )
        idx.update(_batch(spark, [(1, "a"), (2, "b")]))
        r = index_update_report(
            idx.update(_batch(spark, [(3, "a"), (4, "zz")]))
        ).collect()[0]
        assert (r.n_in, r.n_dup_vs_index, r.n_new) == (2, 1, 1)
        assert _delta_files(idx) == 0  # that update auto-compacted
        r2 = index_update_report(
            idx.update(_batch(spark, [(5, "zz"), (6, "b"), (7, "new")]))
        ).collect()[0]
        assert (r2.n_in, r2.n_dup_vs_index, r2.n_new) == (3, 2, 1)

    def test_ratio_threshold(self, spark, tmp_path):
        idx = DedupIndex(
            spark,
            str(tmp_path / "idx"),
            n_buckets=4,
            auto_compact_ratio=0.05,
        )
        idx.update(_batch(spark, [(i, f"seed {i}") for i in range(50)]))
        # No base yet: ratio trigger silent regardless of delta size.
        assert _delta_files(idx) == 1
        idx.compact()
        # Any real append now dwarfs 5% of the small base.
        idx.update(_batch(spark, [(100 + i, f"new {i}") for i in range(50)]))
        assert _delta_files(idx) == 0
        assert idx.size() == 100


class TestMinhashIndexAutoCompact:
    def test_file_count_threshold(self, spark, tmp_path):
        idx = MinhashIndex(
            spark,
            str(tmp_path / "mh"),
            n=2,
            bands=4,
            auto_compact_files=2,
        )
        idx.update(_batch(spark, [(1, "the quick brown fox jumps")]))
        assert _delta_files(idx) == 1
        out = idx.update(_batch(spark, [(2, "a lazy dog sleeps soundly")]))
        out.write.format("noop").mode("overwrite").save()
        assert _delta_files(idx) == 0
        assert os.path.isdir(idx._data)
        # Post-fold probe: near-exact repeat of doc 1 hits all bands.
        got = idx.update(
            _batch(spark, [(10, "the quick brown fox jumps")])
        ).collect()[0]
        assert got.n_band_hits == 4 and got.near_dup_candidate
