#!/usr/bin/env python
"""Structured-Streaming end-to-end latency/throughput measurement for the
three stateful streaming pipelines (bucket agg, exactly-once dedup,
stream-stream join) at sf0.1.

The sf0.1 events table is staged as 16 parquet chunks and streamed with
maxFilesPerTrigger=1, so each pipeline processes 16 real micro-batches
through its state store; per-batch wall times come from the streaming
query's own progress telemetry (batchDuration / numInputRows). Prints a
markdown table for PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.session import get_spark  # noqa: E402
from seriesly_spark.sources.tables import normalize_events  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHUNKS = int(os.environ.get("STREAM_CHUNKS", 16))


def stage_chunks(spark):
    d = tempfile.mkdtemp(prefix="seriesly-latency-")
    (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .repartition(N_CHUNKS)
        .write.mode("overwrite")
        .parquet(d)
    )
    return d


def source(spark, d):
    schema = spark.read.parquet(d).schema
    return normalize_events(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def drain(agg, name, mode, spark):
    q = (
        agg.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        batches = [(p["batchDuration"], p["numInputRows"]) for p in prog]
    finally:
        q.stop()
    total_rows = sum(r for _, r in batches)
    total_ms = sum(d_ for d_, _ in batches)
    med = statistics.median(d_ for d_, _ in batches) if batches else 0
    return {
        "batches": len(batches),
        "rows": total_rows,
        "median_batch_ms": med,
        "rows_per_s": total_rows / (total_ms / 1000) if total_ms else 0,
    }


def main():
    spark = get_spark("stream-latency", cpus=32, shuffle_partitions=32)
    d = stage_chunks(spark)
    results = {}
    try:
        # 1. watermarked hourly bucket agg (update mode)
        src = source(spark, d)
        agg = (
            src.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        results["streaming_bucket_agg"] = drain(
            agg, "lat_bucket", "update", spark
        )

        # 2. exactly-once dedup through the state store
        src = source(spark, d)
        dedup = (
            src.withColumn("ev_time", F.col("ts"))
            .withWatermark("ev_time", "2 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        results["streaming_dedup"] = drain(dedup, "lat_dedup", "complete", spark)

        # 3. stream-stream range join (attribution shape)
        src = source(spark, d)
        left = (
            src.where(F.col("event_type") == "view")
            .select("user_id", F.col("ts").alias("l_ts"),
                    F.col("event_id").alias("l_id"))
            .withWatermark("l_ts", "1 hour")
        )
        src2 = source(spark, d)
        right = (
            src2.where(F.col("event_type") == "click")
            .select(F.col("user_id").alias("r_user"),
                    F.col("ts").alias("r_ts"),
                    F.col("event_id").alias("r_id"))
            .withWatermark("r_ts", "1 hour")
        )
        joined = left.join(
            right,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("l_ts") <= F.col("r_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select("user_id", "l_id", "r_id")
        results["streaming_join"] = drain(joined, "lat_join", "append", spark)

        # 4. custom stateful sessionize (applyInPandasWithState) — the
        # REAL operator transformation, shared with the gate runner
        from seriesly_spark.streaming.ingest import sessionize_stream

        src = source(spark, d)
        sess = sessionize_stream(src, gap_us=1_800_000_000)
        results["streaming_sessionize"] = drain(
            sess, "lat_sessionize", "update", spark
        )

        # 5. windowed approximate-distinct users (one HLL++ sketch per
        # window of state — the unbounded-cardinality streaming shape)
        src = source(spark, d)
        dist = src.groupBy(
            F.window(F.col("ts"), "86400000 milliseconds")
        ).agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id", 0.02).alias("est_users"),
        )
        results["streaming_distinct"] = drain(
            dist, "lat_distinct", "complete", spark
        )

        # 6. windowed score-drift bin counts (the streaming half of
        # streaming_score_drift; the PSI fold is post-drain batch work)
        src = source(spark, d)
        bins = F.least(
            F.greatest(
                F.floor((F.col("value") + 5.0) / 10.0 * 10).cast("int"),
                F.lit(0),
            ),
            F.lit(9),
        )
        drift = (
            src.where(F.col("value").isNotNull())
            .withWatermark("ts", "1 day")
            .groupBy(
                F.window("ts", "86400000 milliseconds"),
                bins.alias("bin"),
            )
            .agg(F.count(F.lit(1)).alias("n_cur"))
        )
        results["streaming_score_drift"] = drain(
            drift, "lat_drift", "update", spark
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print("\n| Pipeline | Micro-batches | Rows | Median batch | Throughput |")
    print("|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['batches']} | {r['rows']:,} |"
            f" {r['median_batch_ms']} ms |"
            f" {r['rows_per_s']/1000:.0f}k rows/s |"
        )
    # Per-round artifact: the streaming family's micro-batch latency
    # medians, recorded alongside BENCH_LOCAL.json (the batch bench has
    # no visibility into micro-batch behavior).
    import json

    out = {
        "sf_dir": SF_DIR,
        "chunks": N_CHUNKS,
        "pipelines": results,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "STREAM_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote STREAM_BENCH.json")
    spark.stop()


if __name__ == "__main__":
    main()
