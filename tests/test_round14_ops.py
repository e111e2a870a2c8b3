"""Round-14 operator tests: the r13 ADVICE fixes first (sparse weight
table rejection, cross-miner independent id spaces), then the round's
new operators as they land."""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.dedup import minhash_lsh_pairs_cross
from seriesly_spark.operators.quality import (
    score_quality_lr,
    train_quality_lr,
)


class TestScoreQualityLrDensity:
    def test_sparse_weight_table_raises(self, spark):
        """A weight table with zero-weight rows pruned (a natural
        sparse-storage step) must raise, not silently shrink the
        derived hash width and misalign every feature."""
        docs = spark.createDataFrame(
            [(1, "the cat sat", 1.0), (2, "le chat noir", 0.0)],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, buckets=16, rounds=1)
        sparse = w.where(F.col("weight") != 0.0)
        assert sparse.count() < w.count()  # pruning really drops rows
        with pytest.raises(ValueError, match="not dense"):
            score_quality_lr(docs, sparse).collect()

    def test_dense_table_still_scores(self, spark):
        docs = spark.createDataFrame(
            [(1, "the cat sat", 1.0), (2, "le chat noir", 0.0)],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, buckets=16, rounds=1)
        out = score_quality_lr(docs, w).collect()
        assert len(out) == 2 and all(r.score is not None for r in out)


class TestCrossMinerIdSpaces:
    DOCS = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one two three four five six seven"),
    ]

    def test_shared_space_suppresses_self_pair(self, spark):
        corpus = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        probe = spark.createDataFrame(
            [self.DOCS[0]], "doc_id long, text string"
        )
        pairs = minhash_lsh_pairs_cross(corpus, probe, n=2).collect()
        assert pairs == []  # same id = same doc: never reports itself

    def test_independent_spaces_keep_colliding_true_pair(self, spark):
        """Two 0-based id spaces: probe doc 0 IS corpus doc 0's text
        but a different document. shared_id_space=False must surface
        the pair the default silently suppressed."""
        corpus = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        probe = spark.createDataFrame(
            [(0, self.DOCS[0][1])], "doc_id long, text string"
        )
        pairs = minhash_lsh_pairs_cross(
            corpus, probe, n=2, shared_id_space=False
        ).collect()
        assert (0, 0) in {(r.corpus_id, r.probe_id) for r in pairs}
