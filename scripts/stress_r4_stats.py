#!/usr/bin/env python
"""Round-4 statistics-family stress at 20M events / 2M docs: the
batch-3 operators (winsorize, inter-event, Welch, chi-square,
concentration, sliding distinct, co-occurrence, curriculum bins,
normalized dedup, weighted sample) against the same hash-generated
inputs as stress_r4.py (whose generator this reuses). Single runs,
noop sink, markdown table for PLANS.md."""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.dirname(os.path.abspath(__file__))
)

from seriesly_spark.session import get_spark  # noqa: E402
from stress_r4 import ROOT, N_DOCS, N_EVENTS, gen, noop, timed  # noqa: E402

H_MS = 3_600_000


def main():
    spark = get_spark("stress-r4-stats", cpus=32, shuffle_partitions=64)
    os.makedirs(ROOT, exist_ok=True)
    print("generating inputs ...", flush=True)
    ev_path, doc_path, _ = gen(spark)
    ev = spark.read.parquet(ev_path)
    docs = spark.read.parquet(doc_path)
    results = []

    from seriesly_spark.operators.analytics import (
        chisq_independence,
        concentration_stats,
        cooccurrence,
        inter_event_stats,
        welch_ttest,
        winsorize_stats,
    )
    from seriesly_spark.operators.sampling import weighted_sample
    from seriesly_spark.operators.textstats import (
        curriculum_bins,
        normalized_dedup,
    )
    from seriesly_spark.operators.windows import sliding_distinct

    timed("winsorize_stats (20 types)", lambda: noop(
        winsorize_stats(ev, "value", ["event_type"])),
        spark, N_EVENTS, results)
    timed("inter_event_stats (100k users)", lambda: noop(
        inter_event_stats(ev, ["user_id"], "t_us", "event_id")),
        spark, N_EVENTS, results)
    timed("welch_ttest (190 type pairs)", lambda: noop(
        welch_ttest(ev, "value", "event_type")), spark, N_EVENTS, results)
    timed("chisq (type x hour-of-day)", lambda: noop(
        chisq_independence(
            ev.withColumn("hod", F.expr("(t_us div 3600000000) % 24")),
            "event_type", "hod")), spark, N_EVENTS, results)
    timed("concentration (100k users)", lambda: noop(
        concentration_stats(ev, "user_id")), spark, N_EVENTS, results)
    timed("sliding_distinct (6h/1h windows)", lambda: noop(
        sliding_distinct(
            ev.withColumn("ts", F.timestamp_micros("t_us")),
            "ts", 6 * H_MS, H_MS, "user_id")), spark, N_EVENTS, results)
    timed("cooccurrence (100k users x 20 types)", lambda: noop(
        cooccurrence(ev, "user_id", "event_type")),
        spark, N_EVENTS, results)
    timed("curriculum_bins (2M docs)", lambda: noop(
        curriculum_bins(docs)), spark, N_DOCS, results)
    timed("normalized_dedup (2M docs)", lambda: noop(
        normalized_dedup(docs)), spark, N_DOCS, results)
    timed("weighted_sample (2M docs by length)", lambda: noop(
        weighted_sample(
            docs.withColumn("w", F.length("text")), "doc_id", "w")),
        spark, N_DOCS, results)

    print("\n| Query | Wall | Throughput |", flush=True)
    print("|---|---|---|", flush=True)
    for name, wall, thr, _ in results:
        print(f"| {name} | {wall:.1f} s | {thr/1e6:.1f}M rows/s |",
              flush=True)
    spark.stop()
    if os.environ.get("STRESS_KEEP") != "1":
        shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
