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


class TestRowsPerBandMiner:
    """minhash_lsh_pairs(rows_per_band=r): banded signatures folded
    from the SAME shared minhash vector lsh_autotune scores — r is the
    precision knob (a band collides only when all r member hashes
    agree)."""

    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "alpha beta gamma delta epsilon zeta eta theta"),
                (3, "alpha beta gamma delta epsilon zeta eta iota"),
                (4, "one two three four five six seven eight"),
                (5, "one two three nine five six seven eight"),
                (6, "totally different text goes here now ok yes"),
            ],
            "doc_id long, text string",
        )

    def test_exact_dups_always_collide(self, spark):
        from seriesly_spark.operators.dedup import minhash_lsh_pairs

        docs = self._docs(spark)
        for bands, r in ((16, 1), (8, 2), (4, 4)):
            pairs = {
                tuple(p)
                for p in minhash_lsh_pairs(
                    docs, bands=bands, rows_per_band=r
                ).collect()
            }
            assert (1, 2) in pairs, (bands, r)

    def test_higher_r_never_adds_candidates(self, spark):
        """With the band count halved and r doubled over the same
        16-hash vector, a band collision at r=2 implies both member
        hashes collide — each r=2 candidate pair is also an r=1
        candidate (subset, typically strict)."""
        from seriesly_spark.operators.dedup import minhash_lsh_pairs

        docs = self._docs(spark)
        p1 = {
            tuple(p)
            for p in minhash_lsh_pairs(docs, bands=16).collect()
        }
        p2 = {
            tuple(p)
            for p in minhash_lsh_pairs(
                docs, bands=8, rows_per_band=2
            ).collect()
        }
        assert p2 <= p1

    def test_r1_unchanged_by_default(self, spark):
        from seriesly_spark.operators.dedup import minhash_lsh_pairs

        docs = self._docs(spark)
        default = {
            tuple(p) for p in minhash_lsh_pairs(docs, bands=16).collect()
        }
        explicit = {
            tuple(p)
            for p in minhash_lsh_pairs(
                docs, bands=16, rows_per_band=1
            ).collect()
        }
        assert default == explicit

    def test_bad_r_rejected(self, spark):
        from seriesly_spark.operators.dedup import minhash_lsh_pairs

        with pytest.raises(ValueError, match="rows_per_band"):
            minhash_lsh_pairs(self._docs(spark), rows_per_band=0).collect()


class TestMinhashIndexRowsPerBand:
    def _shards(self, spark):
        a = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "one two three four five six seven eight"),
            ],
            "doc_id long, text string",
        )
        b = spark.createDataFrame(
            [
                (10, "alpha beta gamma delta epsilon zeta eta theta"),
                (11, "never seen words in any earlier shard at all"),
            ],
            "doc_id long, text string",
        )
        return a, b

    def test_r2_probe_matches_history(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex

        a, b = self._shards(spark)
        idx = MinhashIndex(
            spark, str(tmp_path / "r2"), bands=8, rows_per_band=2
        )
        idx.update(a)
        out = {r.id: r.near_dup_candidate for r in idx.update(b).collect()}
        assert out == {10: True, 11: False}
        # compact preserves the banding and the probe result
        idx.compact()
        c = spark.createDataFrame(
            [(20, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        assert idx.update(c).collect()[0].near_dup_candidate

    def test_banding_frozen(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex

        p = str(tmp_path / "fz")
        MinhashIndex(spark, p, bands=8, rows_per_band=2)
        with pytest.raises(ValueError, match="rebuild at a fresh path"):
            MinhashIndex(spark, p, bands=8, rows_per_band=1)
        with pytest.raises(ValueError, match="rebuild at a fresh path"):
            MinhashIndex(spark, p, bands=16, rows_per_band=2)
        MinhashIndex(spark, p, bands=8, rows_per_band=2)  # same: fine

    def test_markerless_with_data_adopts_r1(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex

        a, _ = self._shards(spark)
        p = str(tmp_path / "legacy")
        MinhashIndex(spark, p).update(a)
        os.remove(os.path.join(p, "BANDING"))
        with pytest.raises(ValueError, match="rows_per_band=1"):
            MinhashIndex(spark, p, bands=16, rows_per_band=2)
        idx = MinhashIndex(spark, p)  # adopts r=1, restamps
        assert idx.rows_per_band == 1
        with open(os.path.join(p, "BANDING")) as f:
            assert f.read().strip() == "n=3,bands=16,rows_per_band=1"


class TestBpeEncode:
    def test_textbook_encode(self, spark):
        from seriesly_spark.operators.bpe import bpe_encode, bpe_train

        docs = spark.createDataFrame(
            [(1, "low low low lower lowest"), (2, "newer new")],
            "doc_id long, text string",
        )
        mt = bpe_train(docs, merges=2)  # learns (l,o) then (lo,w)
        out = {r.id: r for r in bpe_encode(docs, mt).collect()}
        assert [(r.lhs, r.rhs) for r in mt.collect()] == [
            ("l", "o"), ("lo", "w"),
        ]
        assert out[1].encoded == "low low low low e r low e s t"
        assert out[1].n_words == 5 and out[1].n_tokens == 10
        assert out[2].encoded == "n e w e r n e w"

    def test_merge_order_matters(self, spark):
        """Merges apply in RANK order: (a,b) before (ab,c) — feeding
        them reversed must not fuse 'abc' into one token."""
        from seriesly_spark.operators.bpe import bpe_encode

        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        fwd = bpe_encode(docs, [("a", "b"), ("ab", "c")]).collect()[0]
        rev = bpe_encode(docs, [("ab", "c"), ("a", "b")]).collect()[0]
        assert fwd.encoded == "abc" and fwd.n_tokens == 1
        assert rev.encoded == "ab c" and rev.n_tokens == 2

    def test_wordless_docs_get_zero_rows(self, spark):
        from seriesly_spark.operators.bpe import bpe_encode

        docs = spark.createDataFrame(
            [(1, "ok then"), (2, None), (3, "   ")],
            "doc_id long, text string",
        )
        out = {r.id: r for r in bpe_encode(docs, [("o", "k")]).collect()}
        assert (out[2].n_words, out[2].n_tokens, out[2].encoded) == (0, 0, "")
        assert (out[3].n_words, out[3].n_tokens, out[3].encoded) == (0, 0, "")
        assert out[1].encoded == "ok t h e n"

    def test_chunked_fold_matches_single_chunk(self, spark):
        from seriesly_spark.operators.bpe import bpe_encode, bpe_train

        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps over the lazy dog " * 2)
             for i in range(4)],
            "doc_id long, text string",
        )
        mt = [(r.lhs, r.rhs) for r in bpe_train(docs, merges=7).collect()]
        a = {tuple(r) for r in bpe_encode(docs, mt, chunk=2).collect()}
        b = {tuple(r) for r in bpe_encode(docs, mt, chunk=16).collect()}
        assert a == b


class TestBpeTrainFast:
    def test_equivalent_to_naive(self, spark):
        from seriesly_spark.operators.bpe import bpe_train, bpe_train_fast

        docs = spark.createDataFrame(
            [(1, "low lower lowest low low newer new wider wide"),
             (2, "low low lowest newer new new wide wide"),
             (3, "entirely other words appear here too")],
            "doc_id long, text string",
        )
        a = [tuple(r) for r in bpe_train(docs, merges=12).collect()]
        b = [tuple(r) for r in bpe_train_fast(docs, merges=12).collect()]
        assert a == b

    def test_equivalent_with_quote_symbols(self, spark):
        """Winning symbols containing quotes/backslashes must survive
        the expr() predicate escaping."""
        from seriesly_spark.operators.bpe import bpe_train, bpe_train_fast

        docs = spark.createDataFrame(
            [(1, r"it's it's it's o'='o o'='o can\'t can\'t")],
            "doc_id long, text string",
        )
        a = [tuple(r) for r in bpe_train(docs, merges=6).collect()]
        b = [tuple(r) for r in bpe_train_fast(docs, merges=6).collect()]
        assert a == b

    def test_runs_out_of_pairs(self, spark):
        from seriesly_spark.operators.bpe import bpe_train_fast

        docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
        out = bpe_train_fast(docs, merges=10).collect()
        # one merge (a,b) exhausts the vocabulary's repeated pairs
        assert [(r.lhs, r.rhs) for r in out] == [("a", "b")]

    def test_partition_count_stays_bounded(self, spark):
        from seriesly_spark.operators.bpe import bpe_train_fast

        docs = spark.createDataFrame(
            [(1, "low lower lowest low low newer new wider wide " * 3)],
            "doc_id long, text string",
        )
        # 10 rounds would hit 4 * 2^10 partitions without the coalesce;
        # success within the session's tiny parallelism is the gate
        out = bpe_train_fast(docs, merges=10).collect()
        assert len(out) >= 5


class TestDedupSafeSplit:
    def test_duplicates_colocate(self, spark):
        from seriesly_spark.operators.sampling import dedup_safe_split

        docs = spark.createDataFrame(
            [(i, f"unique text {i}") for i in range(20)]
            + [(100 + i, f"unique text {i}") for i in range(20)],
            "doc_id long, text string",
        )
        out = dedup_safe_split(docs).collect()
        assert len(out) == 40
        by_id = {r.doc_id: r for r in out}
        for i in range(20):
            # the twin inherits the original's representative AND split
            assert by_id[100 + i].rep_id == i == by_id[i].rep_id
            assert by_id[100 + i].split == by_id[i].split

    def test_matches_hash_split_of_rep(self, spark):
        from seriesly_spark.operators.sampling import (
            dedup_safe_split,
            hash_split,
        )

        docs = spark.createDataFrame(
            [(i, f"t {i % 7}") for i in range(50)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.split for r in dedup_safe_split(docs).collect()
        }
        # rep of cluster k (text "t k") is its smallest id = k
        reps = spark.createDataFrame(
            [(i, i % 7) for i in range(50)], "doc_id long, rep long"
        )
        want = {
            r.doc_id: r.split
            for r in hash_split(reps, "rep").collect()
        }
        assert got == want

    def test_custom_weights_and_salt(self, spark):
        from seriesly_spark.operators.sampling import dedup_safe_split

        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in range(200)], "doc_id long, text string"
        )
        out = dedup_safe_split(
            docs, weights={"a": 50, "b": 50}, salt="s1"
        ).collect()
        labels = {r.split for r in out}
        assert labels == {"a", "b"}

    def test_null_text_rows_keep_a_label(self, spark):
        # r11 ADVICE: md5(NULL) is NULL and an equi-join drops NULL keys,
        # so null-text rows used to vanish from the split entirely. They
        # must come back as ONE cluster (rep = min id among nulls), each
        # with a real split label.
        from seriesly_spark.operators.sampling import dedup_safe_split

        docs = spark.createDataFrame(
            [(1, "alpha"), (2, None), (3, "alpha"), (4, None)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_safe_split(docs).collect()}
        assert set(out) == {1, 2, 3, 4}
        assert out[2].rep_id == 2 == out[4].rep_id
        assert out[2].split == out[4].split
        assert out[1].rep_id == 1 == out[3].rep_id


class TestNgramNovelty:
    def test_first_doc_fully_novel(self, spark):
        from seriesly_spark.operators.sampling import ngram_novelty

        docs = spark.createDataFrame(
            [
                (1, "a b c d"),          # grams: "a b c", "b c d"
                (2, "a b c d"),          # exact repeat: zero novel
                (3, "a b c x"),          # "a b c" seen, "b c x" novel
                (4, "zz"),               # < n tokens: no row
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in ngram_novelty(docs, n=3).collect()}
        assert set(out) == {1, 2, 3}
        assert (out[1].n_shingles, out[1].n_novel) == (2, 2)
        assert out[1].novelty == 1.0
        assert (out[2].n_novel, out[2].novelty) == (0, 0.0)
        assert (out[3].n_shingles, out[3].n_novel) == (2, 1)
        assert out[3].novelty == 0.5

    def test_distinct_grams_counted_once(self, spark):
        from seriesly_spark.operators.sampling import ngram_novelty

        # "a b a b a b": grams {"a b a", "b a b"} (distinct), both novel
        docs = spark.createDataFrame(
            [(7, "a b a b a b")], "doc_id long, text string"
        )
        (row,) = ngram_novelty(docs, n=3).collect()
        assert (row.n_shingles, row.n_novel, row.novelty) == (2, 2, 1.0)


class TestTunerToMinerLoop:
    """The round-11 point of rows_per_band: whatever config
    lsh_autotune picks must RUN verbatim in the production miner."""

    def test_picked_config_runs_and_recalls(self, spark):
        from seriesly_spark.operators.dedup import (
            lsh_autotune,
            minhash_lsh_pairs,
        )

        docs = spark.createDataFrame(
            [(i, f"planted near dup pair body w{i % 3} common tail "
                 "alpha beta gamma delta epsilon") for i in range(6)]
            + [(100 + i, f"unrelated filler u{100 + i} " * 8)
               for i in range(20)],
            "doc_id long, text string",
        )
        tuned = lsh_autotune(docs, n_hashes=16,
                             configs=((16, 1), (8, 2), (4, 4)))
        (pick,) = [r for r in tuned.collect() if r.picked]
        pairs = minhash_lsh_pairs(
            docs, bands=pick.bands, rows_per_band=pick.rows_per_band
        ).collect()
        got = {(r.a, r.b) for r in pairs}
        # the three planted same-w cluster pairs must collide under the
        # PICKED banding (it met target_recall on exact-Jaccard truth)
        assert {(0, 3), (1, 4), (2, 5)} <= got


class TestNoveltyConservation:
    def test_novel_counts_sum_to_distinct_corpus_grams(self, spark):
        from seriesly_spark.operators.sampling import ngram_novelty

        texts = [
            "the quick brown fox jumps",
            "the quick brown cat sleeps",
            "a wholly different sentence here now",
            "the quick brown fox jumps",   # exact dup of doc 0
        ]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        out = ngram_novelty(docs, n=3).collect()
        # every distinct corpus gram is introduced exactly once
        grams = set()
        for t in texts:
            w = t.split()
            grams |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        assert sum(r.n_novel for r in out) == len(grams)
