"""Round-11 operator tests: the ADVICE hardening batch (markerless
SimhashIndex adoption, never-index-NULL fingerprints, bounded
checkpoint lifecycle, exact seq->timestamp conversion), then the
rows_per_band minhash banding and the BPE encode/fast-train pair."""

import glob
import os

import pytest
from pyspark.sql import functions as F


class TestSimhashIndexMarkerAdoption:
    """A markerless index that already holds fingerprint rows predates
    the TABLES marker and is pigeonhole4 BY CONSTRUCTION — reopening it
    must not stamp whatever split the caller asked for (20-band probes
    against 4-band rows silently classify every historical near-dup as
    novel)."""

    def _mk(self, spark, path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        idx = SimhashIndex(spark, path)
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        idx.update(docs)
        return idx

    def test_markerless_with_data_adopts_pigeonhole4(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        p = str(tmp_path / "ix")
        self._mk(spark, p)
        os.remove(os.path.join(p, "TABLES"))
        with pytest.raises(ValueError, match="pigeonhole4"):
            SimhashIndex(spark, p, tables="manku20")
        # and the failed open must NOT have stamped manku20
        assert not os.path.exists(os.path.join(p, "TABLES"))
        idx = SimhashIndex(spark, p)  # default reopen adopts + restamps
        assert idx.tables == "pigeonhole4"
        with open(os.path.join(p, "TABLES")) as f:
            assert f.read().strip() == "pigeonhole4"

    def test_markerless_empty_dir_still_free_to_choose(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        p = str(tmp_path / "fresh")
        os.makedirs(p)
        idx = SimhashIndex(spark, p, tables="manku20")
        assert idx.tables == "manku20"


class TestSimhashIndexNeverIndexNull:
    def test_null_text_docs_not_appended(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import SimhashIndex

        p = str(tmp_path / "nx")
        idx = SimhashIndex(spark, p)
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta"),
                (2, None),
            ],
            "doc_id long, text string",
        )
        out = {r.id: r.near_dup for r in idx.update(docs).collect()}
        # the NULL doc still gets its classification row (novel) ...
        assert out == {1: False, 2: False}
        # ... but no junk NULL fingerprint rows land in the delta
        delta = spark.read.parquet(os.path.join(p, "delta"))
        assert delta.where(
            F.col("hi").isNull() | F.col("lo").isNull() | F.col("bval").isNull()
        ).count() == 0
        assert delta.count() == 4  # doc 1's pigeonhole rows only


class TestCheckpointRotator:
    def test_one_live_copy_and_correct_results(self, spark):
        from seriesly_spark.operators.util import CheckpointRotator

        sc = spark.sparkContext
        rot = CheckpointRotator()
        before = CheckpointRotator._persistent_ids(sc)
        df = spark.range(100).withColumn("x", F.col("id") * 2)
        cur = rot.checkpoint(df)
        for i in range(4):
            cur = rot.checkpoint(cur.withColumn("x", F.col("x") + 1))
            live = CheckpointRotator._persistent_ids(sc) - before
            # one live checkpoint copy, never i+2 accumulated rounds
            assert live == rot._ids and len(live) >= 1
        assert cur.agg(F.sum("x")).collect()[0][0] == 100 * 99 + 4 * 100
        rot.close(sc)
        assert CheckpointRotator._persistent_ids(sc) - before == set()

    def test_bpe_train_does_not_accumulate_checkpoints(self, spark):
        from seriesly_spark.operators.bpe import bpe_train
        from seriesly_spark.operators.util import CheckpointRotator

        sc = spark.sparkContext
        before = CheckpointRotator._persistent_ids(sc)
        docs = spark.createDataFrame(
            [("low lower lowest low low newer new",)], "text string"
        )
        out = bpe_train(docs, merges=6).collect()
        assert len(out) == 6
        assert CheckpointRotator._persistent_ids(sc) - before == set()


def test_seq_div_conversion_is_exact(spark):
    """The changes-stream dedup_within key uses integer `div`, not
    float `/`: a nanosecond seq near 2^60 loses ~hundreds of ns through
    a double's 53-bit mantissa."""
    seq = (1 << 60) + 999  # float path rounds this up a full microsecond
    row = (
        spark.range(1)
        .select(F.lit(seq).cast("long").alias("seq"))
        .select(
            F.expr("seq div 1000").alias("exact"),
            (F.col("seq") / 1000).cast("long").alias("lossy"),
        )
        .collect()[0]
    )
    assert row.exact == seq // 1000
    assert row.lossy != row.exact  # the trap the fix closes
