#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is executed to completion through the noop sink (full plan runs,
nothing collected to the driver — so column pruning can't fake the work).

Per-query numbers are the MEDIAN of $SPARK_GRAFT_BENCH_REPS (default 3)
timed runs after one untimed warm-up.  Rationale (round-3 verdict): a
single serial pass over 75+ queries in one JVM compounds GC/JIT pressure
— r03 showed five 3-13x single-run inflations (s04_upsert_lww 0.45s ->
6.10s) that isolated re-times did not reproduce and whose plans had not
changed.  Medians make one stall unable to brand a sound plan weak; the
per-query min is also reported ("queries_min") as the low-noise floor.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

import __spark_entry__ as entry_mod
from seriesly_spark.session import get_spark

BENCH_QUERIES = [
    "s01_range_read",
    "s09_db_info",
    "p03_eq_filter",
    "p05_bucket_agg",
    "r01_list_reducers",
    "r02_obj_keys",
    "r03_rate_family",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "dedup_exact",
    "text_stats",
    "text_fingerprint",
    "lang_id",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_topk_lsh",
    "ann_ivf",
    "dedup_cosine_pairs",
    "token_counts_bpe",
    "hopping_window",
    "s04_upsert_lww",
    "asof_join",
    "range_join",
    "sessionize_users",
    "percentiles",
    "value_histogram",
    "topk_events_per_type",
    "revenue_by_nation",
    "multimodal_meta",
    "hash_split",
    "vocab_topk",
    "contamination",
    "sample_hash",
    "rollup_daily",
    "setops_users",
    "rep_stats",
    "clean_text",
    "embedding_centroids",
    "gapfill_hourly",
    "moving_avg_6h",
    "distinct_users_daily",
    "quality_filter",
    "dedup_paragraphs",
    "hll_rollup_users",
    "approx_pct_certify",
    "mixture_sample",
    "tfidf_top_terms",
    "embedding_normalize",
    "embedding_quantize",
    "pipeline_e2e",
    "chunk_documents",
    "pack_sequences",
    "cohort_retention",
    "funnel_counts",
    "zscore_outliers",
    "gapfill_linear",
    "ewma_hourly",
    "kmeans_lloyd",
    "histogram_clamped",
    "daily_type_pivot",
    "mad_outliers",
    "char_entropy",
    "image_decode_stats",
    "collocation_pmi",
    "semantic_dedup",
    "time_weighted_avg",
    "series_gaps",
    "minmax_downsample",
    "quantile_transform",
    "audio_decode_stats",
    "compression_ratio",
    "png_decode_stats",
    "jpeg_decode_stats",
    "trend_slope",
    "autocorr_lag1",
    "corr_pairs_hourly",
    "iqr_outliers",
    "merge_intervals",
    "rollup_events",
    "unpivot_daily",
    "column_profile",
    "type_token_ratio",
    "levenshtein_pairs",
    "s17_change_log",
    "bigram_lm",
    "pii_screen",
    "substring_dup",
    "cusum_changepoint",
    "seasonal_residuals",
    "pct_change_series",
    "tpch_q4",
    "tpch_q12",
    "tpch_q14",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q13",
    "tpch_q15",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q22",
    "winsorize_means",
    "inter_event_stats",
    "welch_ttest",
    "chisq_type_hour",
    "activity_concentration",
    "sliding_distinct_users",
    "interval_coverage",
    "length_curriculum",
    "normalized_dedup",
    "type_cooccurrence",
    "source_profile",
    "weighted_sample",
    "rfm_scores",
    "tpch_q16",
    "tpch_q21",
    "tpch_q21_fast",
    "tpch_q18_fast",
    # round 5
    "sliding_distinct_approx",
    "containment_dup",
    "containment_dup_capped",
    "boilerplate_ngrams",
    "heavy_hitters_tokens",
    "reservoir_per_group",
    "rare_label_collapse",
    "hard_negatives",
    "pca_certify",
    "url_dedup",
    "bm25_topk",
    "vocab_coverage",
    "dedup_ladder_report",
    "markov_transitions",
    "epoch_shuffle",
    "lang_confusion",
    "lsh_eval",
    "dedup_index_incremental",
    "minhash_index_incremental",
    "lsh_autotune",
    "compression_screen",
    "encoding_screen",
    "dedup_index_bucketed_probe",
    "dedup_best",
    "minhash_bucketed_probe",
    "dedup_minhash_lsh_capped",
    # round 8
    "score_auc",
    "score_calibration",
    "score_auc_by_source",
    "score_pr_curve",
    "score_psi_shards",
    "dup_span",
    "snapshot_diff",
    "mixture_plan",
    "ann_multi_exact",
    "ann_lsh_recall",
    "ann_ivf_recall",
    "ivf_cell_purity",
    "ann_ivf_trained",
    "score_ks",
    "score_lift",
    "rank_eval",
    "agreement_kappa",
    "winnow_stats",
    "winnow_overlap",
    "classifier_report",
    "ann_rank_eval",
    "pii_redact",
    "score_brier",
    "winnow_eval",
    "simhash_index_incremental",
    "score_ece",
    "score_best_threshold",
    "fleiss_kappa",
    "kmeans_silhouette",
    "simhash_eval",
    "krippendorff_alpha",
    "embedding_dispersion",
    "bt_strength",
    "ivf_index_topk",
    "ivf_index_topk_multi",
    "bpe_train",
    "bpe_stats",
    "dedup_minhash_lsh_r2",
    "bpe_encode",
    "bpe_train_fast",
    "dedup_safe_split",
    "ngram_novelty",
    "dedup_minhash_auto",
    # round 12
    "kmv_overlap",
    "kmv_rollup",
    "pagerank_docs",
    "image_phash_dedup",
    "image_phash_near_pairs",
    "source_cap",
    "audio_fp_near_pairs",
    "video_phash_dedup",
    "jaccard_prefix",
    "dsir_scores",
    "budget_select",
    "ann_lsh_multiprobe",
    "hits_docs",
    "profile_diff",
    "dedup_minhash_cross",
    "json_quarantine",
    "dedup_spans",
    "html_extract",
    "train_quality_lr",
    "score_quality_lr",
    "quality_lr_auc",
    "dedup_spans_cross",
    "suffix_dup_stats",
    "dedup_spans_exact",
    "decontam_report",
    # round 14
    "dedup_spans_exact_keep1",
    "train_lang_lr",
    "score_lang_lr",
    "lang_lr_confusion",
    "unigram_train",
    "unigram_encode",
    "unigram_stats",
    "decontam_index_probe",
    "bpe_train_batch",
    # round 15 (ADDED entries — never remove/rename existing ones; the
    # raw total grows by their cost vs BENCH_r14, so round-over-round
    # comparisons must use the common subset, as BASELINE.md already
    # prescribes)
    "pipeline_full_ladder",
    "decontam_normalized",
]
# (streaming_distinct intentionally NOT benched: its cost is micro-batch
# harness setup, not query work — same policy as the other streaming gates)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("seriesly-spark-bench", cpus=cpus, shuffle_partitions=cpus)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    floors: dict[str, float] = {}
    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, file listing)
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)
        floors[name] = round(min(runs), 4)
        # Warm-run caches are fair game for the timed runs (CacheManager
        # matches analyzed plans), but they must not leak INTO the next
        # query's memory budget — clear between entries.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    # The driver preserves only the TAIL (~2000 chars) of this output —
    # 124 per-query medians cannot fit. Full per-query detail goes to a
    # committed file; stdout carries the headline total plus the top-20
    # slowest queries (the ones any round-over-round review reads first).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
        "w",
    ) as f:
        json.dump(
            {
                "metric": "seriesly_spark headline queries, warm, noop sink, "
                f"median of {reps}",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": floors,
                "sf": sf,
                "cpus": cpus,
            },
            f,
            indent=1,
        )
    top = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:20]
    )
    print(
        json.dumps(
            {
                "metric": "seriesly_spark headline queries, warm, noop sink, "
                f"median of {reps}",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": top,
                "detail_file": "BENCH_LOCAL.json",
                "sf": sf,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
