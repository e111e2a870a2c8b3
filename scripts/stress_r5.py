#!/usr/bin/env python
"""Round-5 operator stress at 20M events / 2M docs / 200k vectors: the
new pipeline operators (heavy hitters, boilerplate, reservoir, label
collapse, BM25, vocab coverage, markov transitions, hard negatives,
PCA sketch, URL dedup) against the same hash-generated inputs as
stress_r4.py (generator reused). Containment is run with a DF cap —
the uncapped all-pairs form is quadratic by definition at 2M docs and
the capped form is the scale path (same argument as ngram_jaccard's
max_df). Single runs, noop sink, markdown table for PLANS.md."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from seriesly_spark.session import get_spark  # noqa: E402
from stress_r4 import ROOT, N_DOCS, N_EVENTS, N_VECS, gen, noop, timed  # noqa: E402


def main():
    spark = get_spark("stress-r5", cpus=32, shuffle_partitions=64)
    os.makedirs(ROOT, exist_ok=True)
    print("generating inputs ...", flush=True)
    ev_path, doc_path, vec_path = gen(spark)
    ev = spark.read.parquet(ev_path)
    docs = spark.read.parquet(doc_path)
    vecs = spark.read.parquet(vec_path).select(
        F.col("vec_id"), F.col("embedding"),
        (F.col("vec_id") % 10).cast("int").alias("label"),
    )
    results = []

    from seriesly_spark.operators.clustering import pca_power_iteration
    from seriesly_spark.operators.dedup import (
        boilerplate_ngrams,
        containment_pairs,
    )
    from seriesly_spark.operators.sampling import (
        rare_label_collapse,
        reservoir_per_group,
    )
    from seriesly_spark.operators.similarity import hard_negatives
    from seriesly_spark.operators.sketches import heavy_hitters
    from seriesly_spark.operators.textstats import bm25_topk, vocab_coverage
    from seriesly_spark.operators.urls import url_dedup_stats

    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    timed("heavy_hitters (100M tokens, k=40)", lambda: noop(
        heavy_hitters(toks, "tok", 40)), spark, N_DOCS * 50, results)

    timed("boilerplate_ngrams (2M docs)", lambda: noop(
        boilerplate_ngrams(docs, min_df_frac=0.001)),
        spark, N_DOCS, results)

    timed("containment_pairs (2M docs, max_df=40)", lambda: noop(
        containment_pairs(docs, threshold=0.5, max_df=40)),
        spark, N_DOCS, results)

    d_src = docs.withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 100)
    )
    timed("reservoir_per_group (100 groups, k=100)", lambda: noop(
        reservoir_per_group(d_src, ["source"], "doc_id", 100)),
        spark, N_DOCS, results)

    lab = docs.withColumn(
        "lab", F.concat(F.lit("l"), F.abs(F.xxhash64("doc_id")) % 10_000)
    )
    timed("rare_label_collapse (10k labels)", lambda: noop(
        rare_label_collapse(lab, "lab", 250)), spark, N_DOCS, results)

    timed("bm25_topk (3-term query, 2M docs)", lambda: noop(
        bm25_topk(docs, ["w1", "w2", "w3"], k=10)), spark, N_DOCS, results)

    timed("vocab_coverage (top-1000 of 1000 types)", lambda: noop(
        vocab_coverage(docs, k=1000)), spark, N_DOCS, results)

    timed("markov_transitions (20 types, 100k users)", lambda: noop(
        _markov(ev)), spark, N_EVENTS, results)

    timed("hard_negatives (4 queries, 200k vecs)", lambda: noop(
        hard_negatives(vecs, [0, 1, 2, 3], k=10)), spark, N_VECS, results)

    timed("pca_certify (200k x 32 sketch scan)", lambda: noop(
        pca_power_iteration(vecs)), spark, N_VECS, results)

    urls = docs.select(
        F.concat(
            F.lit("HTTP://Example"), F.col("doc_id") % 1000,
            F.lit(".com:80/p/"), F.col("doc_id") % 50,
            F.lit("?utm_source=x&b="), F.col("doc_id") % 3,
        ).alias("url")
    )
    timed("url_dedup (2M planted urls)", lambda: noop(
        url_dedup_stats(urls, "url")), spark, N_DOCS, results)

    print("\n| Query | Wall | Throughput |", flush=True)
    print("|---|---|---|", flush=True)
    for name, wall, thr in results:
        print(f"| {name} | {wall:.1f} s | {thr/1e6:.1f}M rows/s |",
              flush=True)
    spark.stop()


def _markov(ev):
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("t_us", "event_id")
    steps = (
        ev.select(
            "user_id",
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = steps.groupBy("src").agg(F.sum("n").alias("__t"))
    return steps.join(F.broadcast(tot), "src").select(
        "src", "dst", "n", F.round(F.col("n") / F.col("__t"), 6).alias("p")
    )


if __name__ == "__main__":
    main()
