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
from seriesly_spark.operators.suffix import suffix_dup_stats


class TestSuffixRoundsAuto:
    def test_fixed_rounds_saturate_at_cap(self, spark):
        """A duplicated span longer than 2^rounds - 1 reports the cap
        (the documented saturation), not the true length."""
        span = " ".join(f"t{i}" for i in range(10))  # 10 tokens > cap 7
        docs = spark.createDataFrame(
            [(1, span), (2, span + " unique tail here")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds=3).collect()
        }
        assert rows == {1: 7, 2: 7}  # cap 2^3 - 1 binds on a 10-dup

    def test_auto_derives_exact_cap(self, spark):
        """rounds='auto' sizes the cap from max(doc tokens): the same
        >cap-127-style corpus is exact, and a short corpus is too."""
        span = " ".join(f"t{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(1, span), (2, span + " unique tail here")],
            "doc_id long, text string",
        )
        rows = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds="auto").collect()
        }
        assert rows == {1: 10, 2: 10}

    def test_auto_on_long_duplicated_doc(self, spark):
        """The verdict's exact ask: a >127-token duplicated doc. auto
        must report the true length where the default-7 cap saturates
        at 127."""
        span = " ".join(f"w{i}" for i in range(150))
        docs = spark.createDataFrame(
            [(1, span), (2, span)], "doc_id long, text string"
        )
        fixed = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds=7).collect()
        }
        auto = {
            r.doc_id: r.max_dup_len
            for r in suffix_dup_stats(docs, rounds="auto").collect()
        }
        assert fixed == {1: 127, 2: 127}
        assert auto == {1: 150, 2: 150}

    def test_auto_all_null_text(self, spark):
        docs = spark.createDataFrame(
            [(1, None)], "doc_id long, text string"
        )
        rows = suffix_dup_stats(docs, rounds="auto").collect()
        assert [(r.doc_id, r.n_tokens, r.max_dup_len) for r in rows] == [
            (1, 0, 0)
        ]

    def test_bad_rounds_type(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="int or"):
            suffix_dup_stats(docs, rounds="fast")


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
