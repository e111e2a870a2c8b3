"""Empty-input robustness: every batch operator must return an EMPTY
(or well-defined single-row) result on an empty input — never raise.
At 100 TB an empty partition-pruned subset is an everyday input shape
(a date filter matching nothing, a new tenant, a source with no docs),
and a pipeline that crashes on it fails in production, not in tests."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [],
        "event_id long, ts timestamp, ts_ns long, user_id long, "
        "event_type string, value double, props string",
    )


@pytest.fixture(scope="module")
def empty_vecs(spark):
    return spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )


class TestEmptyDocs:
    def test_doc_operators_empty_in_empty_out(self, spark, empty_docs):
        from seriesly_spark.operators.dedup import (
            boilerplate_ngrams,
            containment_pairs,
            dedup_exact,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            paragraph_dedup,
        )
        from seriesly_spark.operators.textstats import (
            bm25_topk,
            char_entropy,
            clean_text,
            compression_ratio,
            lang_id,
            repetition_stats,
            text_stats,
            type_token_ratio,
        )

        for op in (
            dedup_exact,
            ngram_jaccard_pairs,
            containment_pairs,
            minhash_lsh_pairs,
            boilerplate_ngrams,
            paragraph_dedup,
            text_stats,
            repetition_stats,
            clean_text,
            lang_id,
            char_entropy,
            type_token_ratio,
            compression_ratio,
        ):
            assert op(empty_docs).count() == 0, op.__name__

        assert bm25_topk(empty_docs, ["x"]).count() == 0

    def test_sampling_empty(self, spark, empty_docs):
        from seriesly_spark.operators.sampling import (
            epoch_shuffle,
            hash_sample,
            rare_label_collapse,
            reservoir_per_group,
        )

        assert hash_sample(empty_docs, "doc_id", 0.5).count() == 0
        assert reservoir_per_group(empty_docs, ["source"], "doc_id", 3).count() == 0
        assert rare_label_collapse(empty_docs, "lang", 2).count() == 0
        assert epoch_shuffle(empty_docs, "doc_id", 2, 4).count() == 0

    def test_heavy_hitters_empty(self, spark):
        from seriesly_spark.operators.sketches import heavy_hitters

        df = spark.createDataFrame([], "item string")
        assert heavy_hitters(df, "item", 5).count() == 0

    def test_urls_empty(self, spark):
        from seriesly_spark.operators.urls import url_dedup_stats

        df = spark.createDataFrame([], "url string")
        assert url_dedup_stats(df, "url").count() == 0


class TestEmptyEvents:
    def test_event_operators_empty(self, spark, empty_events):
        from seriesly_spark.operators.analytics import (
            chisq_independence,
            concentration_stats,
            rfm_scores,
            welch_ttest,
            winsorize_stats,
        )
        from seriesly_spark.operators.windows import (
            sliding_distinct,
            sliding_distinct_approx,
        )

        assert winsorize_stats(
            empty_events, "value", ["event_type"]
        ).count() == 0
        assert welch_ttest(empty_events, "value", "event_type").count() == 0
        assert sliding_distinct(
            empty_events, "ts", 3_600_000, 3_600_000, "user_id"
        ).count() == 0
        assert sliding_distinct_approx(
            empty_events, "ts", 3_600_000, 3_600_000, "user_id"
        ).count() == 0
        # one-row summaries on empty input: a row of zeros/nulls or no
        # row are both defensible; they must simply not raise
        chisq_independence(empty_events, "event_type", "user_id").collect()
        concentration_stats(empty_events, "event_type").collect()
        rfm_scores(empty_events, "user_id", "ts", "value").collect()


class TestEmptyVectors:
    def test_vector_operators_empty(self, spark, empty_vecs):
        from seriesly_spark.operators.clustering import pca_power_iteration
        from seriesly_spark.operators.similarity import (
            hard_negatives,
            l2_normalize,
        )

        assert l2_normalize(empty_vecs).count() == 0
        assert hard_negatives(empty_vecs, [0, 1], k=3).count() == 0
        r = pca_power_iteration(empty_vecs).collect()
        assert len(r) == 1 and r[0].n == 0  # explicit all-false row


class TestRound6EmptyInputs:
    def test_screens_empty(self, spark, empty_docs):
        from seriesly_spark.operators.textstats import (
            compression_screen,
            encoding_screen,
        )

        assert compression_screen(empty_docs).count() == 0
        assert encoding_screen(empty_docs).count() == 0

    def test_index_update_on_empty_batch(self, spark, empty_docs, tmp_path):
        """An empty shard (pruned subset, new tenant) must classify to
        an empty frame and grow the index by nothing."""
        from seriesly_spark.operators.dedup_index import (
            DedupIndex,
            MinhashIndex,
            index_update_report,
        )

        idx = DedupIndex(spark, str(tmp_path / "i"))
        out = idx.update(empty_docs)
        assert out.count() == 0
        assert idx.size() == 0
        r = index_update_report(out).collect()[0]
        assert (r.n_in, r.n_new) == (0, 0)
        mh = MinhashIndex(spark, str(tmp_path / "m"))
        assert mh.update(empty_docs).count() == 0
        # compact on an empty index is a no-op, not an error
        assert idx.compact()["files_after"] == 0


class TestRound12EmptyInputs:
    def test_kmv_empty(self, spark, empty_events):
        from seriesly_spark.operators.sketches import kmv_overlap, kmv_rollup

        ev = empty_events.select("event_type", "user_id")
        assert kmv_overlap(ev, "event_type", "user_id").count() == 0
        # rollup emits its merged row even on empty input: est 0 exact
        rows = kmv_rollup(
            empty_events.select(
                F.col("ts_ns").alias("bucket"), "user_id"
            ),
            "bucket",
            "user_id",
        ).collect()
        assert [(r.bucket, r.est_distinct) for r in rows] == [(None, 0.0)]

    def test_graph_empty(self, spark, empty_docs):
        from seriesly_spark.operators.graph import derivation_edges, pagerank

        assert derivation_edges(empty_docs).count() == 0
        edges = spark.createDataFrame([], "src long, dst long")
        assert pagerank(edges, iterations=3).count() == 0

    def test_multimodal_hash_empty(self, spark):
        from seriesly_spark.operators.multimodal import (
            audio_fingerprints,
            image_phash,
            phash_dedup,
            video_phash_dedup,
        )

        empty = spark.createDataFrame([], "doc_id long, payload binary")
        assert image_phash(empty).count() == 0
        assert phash_dedup(empty).count() == 0
        assert audio_fingerprints(empty).count() == 0
        assert video_phash_dedup(empty).count() == 0

    def test_cap_per_group_empty(self, spark, empty_docs):
        from seriesly_spark.operators.sampling import cap_per_group

        assert (
            cap_per_group(empty_docs, "source", "doc_id", cap=5).count() == 0
        )

    def test_round12b_empty(self, spark, empty_docs):
        from seriesly_spark.operators.dedup import jaccard_prefix_pairs
        from seriesly_spark.operators.sampling import (
            budget_select,
            dsir_scores,
        )

        assert jaccard_prefix_pairs(empty_docs).count() == 0
        assert budget_select(empty_docs, "source", 1000).count() == 0
        # empty raw pool: empty spine out
        one = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        assert dsir_scores(empty_docs, one).count() == 0
        # empty TARGET: every feature backs off to pure smoothing
        out = dsir_scores(one, empty_docs.select("doc_id", "text")).collect()
        assert len(out) == 1 and out[0].logratio is not None

    def test_hits_empty(self, spark, empty_docs):
        from seriesly_spark.operators.graph import derivation_edges, hits

        edges = derivation_edges(empty_docs)
        assert hits(edges, iterations=2).count() == 0
        nodes = spark.createDataFrame([(1,), (2,)], "node long")
        out = {r.node: (r.hub, r.authority)
               for r in hits(edges, nodes, iterations=2).collect()}
        assert out == {1: (0.0, 0.0), 2: (0.0, 0.0)}

    def test_multiprobe_empty(self, spark, empty_vecs):
        from seriesly_spark.operators.similarity import multiprobe_chunks

        assert multiprobe_chunks(empty_vecs, [0, 1], nprobe=3).count() == 0

    def test_multiprobe_nprobe_out_of_range_raises(self, empty_vecs):
        """Only width+1 distinct depth-1 probes exist per band; a
        larger nprobe raises instead of silently saturating."""
        import pytest

        from seriesly_spark.operators.similarity import multiprobe_chunks

        with pytest.raises(ValueError, match="nprobe"):
            multiprobe_chunks(empty_vecs, [0], planes=32, bands=4, nprobe=10)
        with pytest.raises(ValueError, match="nprobe"):
            multiprobe_chunks(empty_vecs, [0], nprobe=0)


class TestEmptyRound13:
    def test_round13_operators_empty_in_empty_out(self, spark, empty_docs):
        from seriesly_spark.operators.dedup import dedup_spans_cross
        from seriesly_spark.operators.html import html_extract
        from seriesly_spark.operators.quality import (
            score_quality_lr,
            train_quality_lr,
        )
        from seriesly_spark.operators.suffix import (
            dedup_spans_exact,
            suffix_dup_stats,
        )

        assert suffix_dup_stats(empty_docs, rounds=3).count() == 0
        assert dedup_spans_exact(empty_docs, min_len=3).count() == 0
        assert dedup_spans_cross(empty_docs, empty_docs, n=3).count() == 0
        pages = empty_docs.selectExpr("doc_id", "text AS html")
        assert html_extract(pages).count() == 0
        labeled = empty_docs.selectExpr(
            "doc_id", "text", "CAST(0.0 AS DOUBLE) AS label"
        )
        w = train_quality_lr(labeled, rounds=2, buckets=16)
        assert w.count() == 17  # zero-init weights, the no-update model
        assert score_quality_lr(labeled, w).count() == 0
