"""Round-15 operator tests: the r14 ADVICE fixes first (bool rounds
rejection, streaming-decontam gram dedup is covered by the streaming
gates), then the round's large-vocabulary broadcast fallbacks for the
trained families — the impl="literal"/"join" equivalence gates and
the >= 10^5-bucket/piece runs the literal paths cannot carry."""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.quality import (
    LITERAL_MAX_BUCKETS,
    score_quality_lr,
    train_quality_lr,
)
from seriesly_spark.operators.suffix import suffix_dup_stats
from seriesly_spark.operators.unigram import (
    LITERAL_MAX_PIECES,
    _segment_words,
    unigram_encode,
    unigram_train,
)

SF_DIR = "/root/testdata/sf0.001"


def _labeled_docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang")
        .withColumn(
            "label",
            F.when(F.col("lang") == "en", F.lit(1.0)).otherwise(
                F.lit(0.0)
            ),
        )
    )


class TestSuffixRoundsBool:
    def test_bool_rounds_rejected(self, spark):
        """rounds=True is an int subclass and used to silently train
        with 1 round; it must raise like other malformed values."""
        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="rounds"):
            suffix_dup_stats(docs, rounds=True)


class TestQualityLrJoinImpl:
    """The broadcast-join weight path vs the literal-array path —
    bit-identical by the shared round-6 decimal fold discipline."""

    def test_train_join_equals_literal(self, spark):
        docs = _labeled_docs(spark)
        lit = train_quality_lr(
            docs, rounds=3, lr=8.0, buckets=64, impl="literal"
        ).collect()
        join = train_quality_lr(
            docs, rounds=3, lr=8.0, buckets=64, impl="join"
        ).collect()
        assert [tuple(r) for r in lit] == [tuple(r) for r in join]

    def test_score_join_equals_literal(self, spark):
        docs = _labeled_docs(spark)
        w = train_quality_lr(docs, rounds=2, lr=8.0, buckets=64)
        lit = {
            r.doc_id: r.score
            for r in score_quality_lr(docs, w, impl="literal").collect()
        }
        join = {
            r.doc_id: r.score
            for r in score_quality_lr(docs, w, impl="join").collect()
        }
        assert lit == join
        assert any(v is not None for v in lit.values())

    def test_auto_picks_by_width(self):
        from seriesly_spark.operators.quality import _resolve_impl

        assert _resolve_impl("auto", LITERAL_MAX_BUCKETS) == "literal"
        assert _resolve_impl("auto", LITERAL_MAX_BUCKETS + 1) == "join"
        with pytest.raises(ValueError, match="impl"):
            _resolve_impl("vector", 10)

    def test_train_and_score_above_literal_ceiling(self, spark):
        """The verdict's gate: a hash width the literal path cannot
        carry as a plan array (120k buckets) trains and scores through
        the join path — dense output over the full width, real scores."""
        docs = _labeled_docs(spark).limit(60)
        buckets = 120_000
        w = train_quality_lr(
            docs, rounds=1, lr=8.0, buckets=buckets, impl="auto"
        )
        assert w.count() == buckets + 1
        nonzero = w.where(F.col("weight") != 0.0).count()
        assert nonzero > 0
        scored = score_quality_lr(docs, w, impl="auto")
        got = {r.doc_id: r.score for r in scored.collect()}
        assert len(got) == 60
        assert any(v is not None for v in got.values())

    def test_sparse_table_still_rejected(self, spark):
        """The aggregate-based density check keeps the r13 contract:
        a pruned weight table raises instead of misaligning."""
        docs = _labeled_docs(spark).limit(10)
        w = train_quality_lr(docs, rounds=1, buckets=16)
        pruned = w.where(F.col("bucket") != 3)
        with pytest.raises(ValueError, match="dense"):
            score_quality_lr(docs, pruned)
        with pytest.raises(ValueError, match="dense"):
            score_quality_lr(docs, w.limit(0))


class TestUnigramBroadcastVocab:
    def test_expr_rejects_oversized_literal_map(self, spark):
        words = spark.createDataFrame(
            [("abc", 1)], "w string, freq long"
        )
        vocab = {f"p{i}": -1.0 for i in range(LITERAL_MAX_PIECES + 1)}
        with pytest.raises(ValueError, match="literal"):
            _segment_words(words, vocab, 4, impl="expr")

    def test_pandas_broadcast_runs_at_1e5_pieces(self, spark):
        """The >= 10^5-piece gate the literal map cannot run: the
        broadcast-backed Arrow path segments correctly with a 100k+1
        piece table (the planted long piece must win over singles)."""
        vocab = {f"zz{i:05d}": -3.0 for i in range(100_000)}
        vocab.update({c: -4.0 for c in "abcdef"})
        vocab["abcd"] = -1.0
        words = spark.createDataFrame(
            [("abcdef", 2), ("fee", 1)], "w string, freq long"
        )
        rows = {
            r.w: (r.freq, r.ps)
            for r in _segment_words(words, vocab, 4).collect()
        }
        assert rows["abcdef"] == (2, ["abcd", "e", "f"])
        assert rows["fee"][1] == ["f", "e", "e"]

    def test_pandas_expr_parity_unchanged(self, spark):
        """The broadcast refactor must not move the pandas path off
        the expr reference: same corpus, bit-equal segmentations."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(
            40
        )
        model = unigram_train(
            docs, vocab_size=32, max_piece_len=3, rounds=1
        )
        vocab = {r.piece: float(r.logp) for r in model.collect()}
        from seriesly_spark.operators.unigram import _word_counts

        words = _word_counts(docs, "text")
        a = {
            r.w: r.ps
            for r in _segment_words(words, vocab, 3, impl="pandas").collect()
        }
        b = {
            r.w: r.ps
            for r in _segment_words(words, vocab, 3, impl="expr").collect()
        }
        assert a == b

    def test_encode_roundtrip_still_green(self, spark):
        docs = spark.createDataFrame(
            [(1, "aab aab"), (2, None)], "doc_id long, text string"
        )
        model = unigram_train(docs, vocab_size=8, max_piece_len=2, rounds=1)
        enc = {
            r.doc_id: (r.n_pieces, r.encoded)
            for r in unigram_encode(docs, model).collect()
        }
        assert enc[2] == (0, "")
        assert enc[1][0] > 0


class TestNormalizedDecontam:
    """normalize= on the span-gram spine: re-cased/re-punctuated
    benchmark text is caught, clean text behaves exactly as raw mode."""

    def _frames(self, spark):
        bench = spark.createDataFrame(
            [(7, "alpha beta gamma delta")], "doc_id long, text string"
        )
        corpus = spark.createDataFrame(
            [
                # trivially evaded copy: re-cased, '!' attached
                (1, "ALPHA! BETA! GAMMA! DELTA!"),
                # clean doc sharing no benchmark 3-gram
                (2, "epsilon zeta eta theta iota"),
            ],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_raw_mode_misses_the_variant(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_cross

        corpus, bench = self._frames(spark)
        out = {
            r.doc_id: r.n_removed
            for r in dedup_spans_cross(corpus, bench, n=3).collect()
        }
        assert out == {1: 0, 2: 0}

    def test_normalized_mode_catches_it(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_cross

        corpus, bench = self._frames(spark)
        rows = {
            r.doc_id: r for r in dedup_spans_cross(
                corpus, bench, n=3, normalize=True
            ).collect()
        }
        # the full 4-token span is covered; the clean doc untouched
        assert rows[1].n_removed == 4 and rows[1].text_clean == ""
        assert rows[2].n_removed == 0
        assert rows[2].text_clean == "epsilon zeta eta theta iota"

    def test_index_pins_normalize_in_meta(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import DecontamIndex

        corpus, bench = self._frames(spark)
        p = str(tmp_path / "idx")
        idx = DecontamIndex(spark, p, n=3, normalize=True)
        idx.add_benchmark(bench)
        with pytest.raises(ValueError, match="normalize"):
            DecontamIndex(spark, p, n=3, normalize=False)
        out = {
            r.doc_id: r.n_removed
            for r in DecontamIndex(spark, p, n=3, normalize=True)
            .probe_clean(corpus)
            .collect()
        }
        assert out == {1: 4, 2: 0}

    def test_legacy_meta_means_raw(self, spark, tmp_path):
        """Indexes written before the flag existed hashed raw tokens —
        exactly normalize=False; reopening must accept that and refuse
        normalize=True."""
        import json

        from seriesly_spark.operators.dedup_index import DecontamIndex

        p = str(tmp_path / "old")
        DecontamIndex(spark, p, n=3)
        meta = json.load(open(f"{p}/meta.json"))
        del meta["normalize"]
        json.dump(meta, open(f"{p}/meta.json", "w"))
        DecontamIndex(spark, p, n=3)  # raw reopen fine
        with pytest.raises(ValueError, match="normalize"):
            DecontamIndex(spark, p, n=3, normalize=True)


class TestStreamingQualityScore:
    def test_stream_equals_batch_scorer(self, spark, tmp_path):
        """Stateless append-mode stream scoring == batch scorer,
        including the NULL-text -> NULL score contract."""
        from seriesly_spark.operators.quality import (
            score_quality_lr,
            train_quality_lr,
        )
        from seriesly_spark.streaming.ingest import streaming_quality_score

        docs = spark.createDataFrame(
            [
                (1, "the cat sat on the mat", 1.0),
                (2, "wholly unrelated terms here", 0.0),
                (3, None, 0.0),
                (4, "the cat sat on the hat", 1.0),
            ],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, rounds=2, lr=4.0, buckets=32)
        batch = {
            r.doc_id: r.score
            for r in score_quality_lr(docs, w).collect()
        }
        sd = str(tmp_path / "stream")
        docs.select("doc_id", "text").repartition(2).write.parquet(sd)
        stream = {
            r.doc_id: r.score
            for r in streaming_quality_score(
                spark, sd, w, query_name="t15_sqs"
            ).collect()
        }
        assert stream == batch
        assert stream[3] is None


class TestUnigramByteFallback:
    def test_reconstruction_on_untrained_chars(self, spark):
        """The verdict's invariant: encode is total on UTF-8 input
        with characters absent from training, and decode_pieces
        inverts every word exactly."""
        from seriesly_spark.operators.unigram import (
            _segment_words,
            byte_pieces,
            decode_pieces,
            unigram_train,
        )

        train = spark.createDataFrame(
            [(1, "abab abab baba")], "doc_id long, text string"
        )
        model = unigram_train(train, vocab_size=8, max_piece_len=2, rounds=1)
        vocab = {r.piece: float(r.logp) for r in model.collect()}
        # words with emoji, CJK, accents — none seen in training
        words = spark.createDataFrame(
            [("ab中ba", 1), ("café", 1), ("\U0001f600ab", 1)],
            "w string, freq long",
        )
        segs = {
            r.w: r.ps
            for r in _segment_words(
                words, vocab, 2, byte_fallback=True
            ).collect()
        }
        for w, ps in segs.items():
            assert decode_pieces(ps) == w
        # the CJK char expanded to 3 byte pieces, fully out of vocab
        assert byte_pieces("中") == ["<0xE4>", "<0xB8>", "<0xAD>"]
        assert all(p in vocab or p.startswith("<0x")
                   for w in segs for p in segs[w])

    def test_raw_mode_unchanged_and_encode_flag(self, spark):
        from seriesly_spark.operators.unigram import (
            _segment_words,
            unigram_encode,
            unigram_train,
        )

        train = spark.createDataFrame(
            [(1, "abab abab")], "doc_id long, text string"
        )
        model = unigram_train(train, vocab_size=8, max_piece_len=2, rounds=1)
        vocab = {r.piece: float(r.logp) for r in model.collect()}
        words = spark.createDataFrame([("abé", 1)], "w string, freq long")
        raw = _segment_words(words, vocab, 2).collect()[0].ps
        assert "é" in raw  # leaks the raw char without fallback
        docs = spark.createDataFrame(
            [(1, "abé ab")], "doc_id long, text string"
        )
        enc = unigram_encode(docs, model, byte_fallback=True).collect()[0]
        assert "<0xC3>" in enc.encoded and "<0xA9>" in enc.encoded

    def test_expr_rejects_byte_fallback(self, spark):
        from seriesly_spark.operators.unigram import _segment_words

        words = spark.createDataFrame([("ab", 1)], "w string, freq long")
        with pytest.raises(ValueError, match="byte_fallback"):
            _segment_words(words, {"a": -1.0}, 2, impl="expr",
                           byte_fallback=True)


class TestConnectedComponentsRewrite:
    """The optimization round rewrote the CC loop (self-loop edges fold
    the keep-own-label term into the neighbor-min aggregate; exact-
    decimal label-mass sum replaces the changed-rows count; edges
    pre-partitioned once). These pin the loop mechanics the tiny
    round-11 case and the oracle replays do not reach."""

    def test_long_chain_pointer_jumping(self, spark):
        # A 60-node chain exercises pointer jumping (O(log d) rounds)
        # AND the mass-convergence stop: every node must reach label 0.
        from seriesly_spark.operators.dedup import connected_components

        n = 60
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "a long, b long"
        )
        got = {
            r.id: r.cluster_id
            for r in connected_components(nodes, pairs).collect()
        }
        assert got == {i: 0 for i in range(n)}

    def test_empty_pairs_single_round(self, spark):
        # No edges: every node is its own cluster and the loop must
        # stop on the FIRST equal-mass round (initial mass == round-1
        # mass), exactly like the old changed==0 early exit.
        from seriesly_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame([(7,), (3,), (11,)], "id long")
        pairs = spark.createDataFrame([], "a long, b long")
        got = {
            r.id: r.cluster_id
            for r in connected_components(nodes, pairs).collect()
        }
        assert got == {7: 7, 3: 3, 11: 11}

    def test_isolated_nodes_kept_by_self_loops(self, spark):
        # Nodes absent from every pair must still appear in the output
        # (the self-loop union is what carries them through the
        # neighbor-min aggregate).
        from seriesly_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame(
            [(1,), (2,), (50,), (99,)], "id long"
        )
        pairs = spark.createDataFrame([(1, 2)], "a long, b long")
        got = {
            r.id: r.cluster_id
            for r in connected_components(nodes, pairs).collect()
        }
        assert got == {1: 1, 2: 1, 50: 50, 99: 99}

    def test_duplicate_and_reversed_pairs(self, spark):
        # The miner contract allows the same undirected pair to arrive
        # once per colliding band; duplicates/reversals must not change
        # the labeling.
        from seriesly_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
        pairs = spark.createDataFrame(
            [(2, 3), (3, 2), (2, 3), (0, 1)], "a long, b long"
        )
        got = {
            r.id: r.cluster_id
            for r in connected_components(nodes, pairs).collect()
        }
        assert got == {0: 0, 1: 0, 2: 2, 3: 2}

    def test_string_ids_use_changed_count_fallback(self, spark):
        # Non-numeric ids cast to NULL under the decimal mass sum; the
        # r16 guard must detect that statically and fall back to the
        # changed-rows comparison, so a multi-hop string-id chain still
        # converges to the lexicographic-min label instead of stopping
        # after round one (ADVICE r15, medium).
        from seriesly_spark.operators.dedup import connected_components

        names = [f"doc{i:02d}" for i in range(12)]
        nodes = spark.createDataFrame([(x,) for x in names], "id string")
        pairs = spark.createDataFrame(
            [(names[i], names[i + 1]) for i in range(len(names) - 1)],
            "a string, b string",
        )
        got = {
            r.id: r.cluster_id
            for r in connected_components(nodes, pairs).collect()
        }
        assert got == {x: "doc00" for x in names}


class TestEvalSinglePass:
    """lsh/simhash/winnow_eval now compute n_true/n_hit in one truth
    pass via a hit-flag left join; these pin the empty-corpus zero
    (sum-over-nothing would be NULL) for the two evals the round-5
    gate did not already cover."""

    def test_simhash_eval_empty_corpus(self, spark):
        from seriesly_spark.operators.dedup import simhash_eval

        df = spark.createDataFrame([], "doc_id long, text string")
        r = simhash_eval(df).collect()[0]
        assert (r.n_true, r.n_cand, r.n_hit) == (0, 0, 0)
        assert r.recall is None and r.precision is None

    def test_winnow_eval_empty_corpus(self, spark):
        from seriesly_spark.operators.dedup import winnow_eval

        df = spark.createDataFrame([], "doc_id long, text string")
        r = winnow_eval(df).collect()[0]
        assert (r.n_true, r.n_cand, r.n_hit) == (0, 0, 0)
        assert r.recall is None and r.precision is None
