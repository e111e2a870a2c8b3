#!/usr/bin/env python
"""Round-4 stress rig: the round-3/4 operator families at ~20M events /
2M docs / 500k vectors (the same scale PLANS.md's earlier stress tables
use), single runs through the noop sink, results printed as a markdown
table for PLANS.md.

Synthetic data is hash-generated (xxhash64 of the row id — deterministic,
no RNG state) and written to parquet first so every measured query pays a
real scan. SemDeDup is swept over k to show the candidate volume
(sum of |cluster|^2) staying bounded as the codebook grows — the paper's
scale knob, measured.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.session import get_spark  # noqa: E402

ROOT = os.environ.get("STRESS_DIR", "/tmp/seriesly-stress-r4")
N_EVENTS = int(os.environ.get("STRESS_EVENTS", 20_000_000))
N_DOCS = int(os.environ.get("STRESS_DOCS", 2_000_000))
N_VECS = int(os.environ.get("STRESS_VECS", 200_000))
DAY_US = 86_400_000_000
ORIGIN_US = 1_704_067_200_000_000


def h(c, seed):
    return F.abs(F.xxhash64(c, F.lit(seed)))


def gen(spark):
    ev_path = os.path.join(ROOT, "events")
    doc_path = os.path.join(ROOT, "docs")
    vec_path = os.path.join(ROOT, "vecs")
    if not os.path.isdir(ev_path):
        ids = spark.range(N_EVENTS)
        (
            ids.select(
                F.col("id").alias("event_id"),
                (ORIGIN_US + h("id", 1) % (60 * DAY_US)).alias("t_us"),
                (h("id", 2) % 100_000).alias("user_id"),
                F.concat(F.lit("t"), (h("id", 3) % 20)).alias("event_type"),
                (h("id", 4) % 100_000 / 1000.0).alias("value"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(ev_path)
        )
    if not os.path.isdir(doc_path):
        ids = spark.range(N_DOCS)
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(49)),
            lambda i: F.concat(
                F.lit("w"), F.abs(F.xxhash64(F.col("id"), i)) % 1000
            ),
        )
        (
            ids.select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", toks).alias("text"),
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(doc_path)
        )
    if not os.path.isdir(vec_path):
        ids = spark.range(N_VECS)
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda j: F.abs(F.xxhash64(F.col("id"), j)) % 1000 / 500.0 - 1.0,
        )
        (
            ids.select(
                F.col("id").alias("vec_id"),
                vec.cast("array<float>").alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(vec_path)
        )
    return ev_path, doc_path, vec_path


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, spark, unit_rows, results):
    t0 = time.perf_counter()
    extra = fn()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    thr = unit_rows / wall if wall > 0 else 0
    results.append((name, wall, thr, extra))
    print(f"  {name}: {wall:.1f} s  ({thr/1e6:.2f}M rows/s)"
          + (f"  {extra}" if extra else ""), flush=True)


def main():
    spark = get_spark("stress-r4", cpus=32, shuffle_partitions=64)
    os.makedirs(ROOT, exist_ok=True)
    print("generating inputs ...", flush=True)
    ev_path, doc_path, vec_path = gen(spark)
    ev = spark.read.parquet(ev_path)
    docs = spark.read.parquet(doc_path)
    vecs = spark.read.parquet(vec_path)
    results = []

    from seriesly_spark.operators.analytics import (
        autocorr_lag,
        column_profile,
        corr_pairs,
        iqr_outliers,
        mad_outliers,
        rollup_counts,
        trend_slope,
        unpivot_metrics,
    )
    from seriesly_spark.operators.dedup import levenshtein_pairs, semantic_dedup
    from seriesly_spark.operators.textstats import (
        char_entropy,
        collocation_pmi,
        type_token_ratio,
    )
    from seriesly_spark.operators.windows import (
        merge_intervals,
        minmax_downsample,
        series_gaps,
        time_weighted_avg,
    )

    H_MS = 3_600_000

    print("events-family ...", flush=True)
    timed("time_weighted_avg (20 types, hourly)", lambda: noop(
        time_weighted_avg(ev, ["event_type"], "t_us", "value", H_MS,
                          tiebreak_col="event_id")), spark, N_EVENTS, results)
    timed("series_gaps (>30s holes)", lambda: noop(
        series_gaps(ev, ["event_type"], "t_us", 30_000_000)),
        spark, N_EVENTS, results)
    timed("minmax_downsample (hourly)", lambda: noop(
        minmax_downsample(ev, ["event_type"], "t_us", "value", H_MS)),
        spark, N_EVENTS, results)
    timed("mad_outliers (per type)", lambda: noop(
        mad_outliers(ev, "value", ["event_type"], id_cols=["event_id"])),
        spark, N_EVENTS, results)
    timed("trend_slope (per type)", lambda: noop(
        trend_slope(ev, "t_us", "value", ["event_type"], ORIGIN_US)),
        spark, N_EVENTS, results)
    timed("autocorr_lag1 (per type)", lambda: noop(
        autocorr_lag(ev, "t_us", "value", ["event_type"], ["event_id"])),
        spark, N_EVENTS, results)

    def _corr():
        dec = F.sum(F.col("value").cast("decimal(38,18)")).cast("double")
        hourly = (
            ev.withColumn("b", (F.col("t_us") / (H_MS * 1000)).cast("long"))
            .groupBy("event_type", "b")
            .agg((dec / F.count(F.lit(1))).alias("v"))
        )
        noop(corr_pairs(hourly, "event_type", "b", "v"))

    timed("corr_pairs (190 type pairs over hourly)", _corr,
          spark, N_EVENTS, results)
    timed("iqr_outliers (per type)", lambda: noop(
        iqr_outliers(ev, "value", ["event_type"], id_cols=["event_id"])),
        spark, N_EVENTS, results)

    def _merge():
        iv = ev.select(
            "user_id", F.col("t_us").alias("s"),
            (F.col("t_us") + 7_200_000_000).alias("e"), "event_id",
        )
        noop(merge_intervals(iv, ["user_id"], "s", "e", "event_id"))

    timed("merge_intervals (100k users, 2h windows)", _merge,
          spark, N_EVENTS, results)
    timed("rollup_counts (day x type)", lambda: noop(
        rollup_counts(
            ev.select(((F.col("t_us") / DAY_US).cast("long")).alias("d"),
                      "event_type", "value"),
            ["d", "event_type"], "value")), spark, N_EVENTS, results)
    timed("column_profile (5 columns)", lambda: noop(
        column_profile(ev, ["event_id", "user_id", "event_type", "value"])),
        spark, N_EVENTS, results)

    print("docs-family ...", flush=True)
    timed("char_entropy (2M docs)", lambda: noop(char_entropy(docs)),
          spark, N_DOCS, results)
    timed("collocation_pmi (100M bigrams)", lambda: noop(
        collocation_pmi(docs, k=10, min_count=2)), spark, N_DOCS * 50, results)
    timed("type_token_ratio (100M tokens)", lambda: noop(
        type_token_ratio(docs)), spark, N_DOCS * 50, results)
    timed("levenshtein_pairs (prefix-blocked)", lambda: noop(
        levenshtein_pairs(docs)), spark, N_DOCS, results)

    # k-sweep: sum|c|^2 ~ n^2/k must FALL as the codebook grows (the
    # paper's blast-radius knob) while assignment cost grows with k —
    # the measured trade-off.
    print("semdedup k-sweep ...", flush=True)
    for k in (64, 256, 1024):
        def _sem(k=k):
            out = semantic_dedup(vecs, k=k, iterations=2, tau=0.95)
            cand = (
                out.groupBy("cluster").agg(F.count(F.lit(1)).alias("c"))
                .agg(F.sum(F.col("c") * F.col("c")).alias("v"))
                .first().v
            )
            noop(out)
            return f"sum|c|^2={cand/1e9:.2f}B"
        timed(
            f"semantic_dedup k={k} ({N_VECS//1000}k x 32)",
            _sem, spark, N_VECS, results,
        )

    print("\n| Query | Wall | Throughput | Notes |", flush=True)
    print("|---|---|---|---|", flush=True)
    for name, wall, thr, extra in results:
        print(f"| {name} | {wall:.1f} s | {thr/1e6:.1f}M rows/s |"
              f" {extra or ''} |", flush=True)
    spark.stop()
    if os.environ.get("STRESS_KEEP") != "1":
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
