"""Structured Streaming — the analogue of the reference's ingest paths.

The reference batches writes in a per-DB goroutine (flush at >=1000 ops or
5 s, reference database.go:175-254) and optionally ingests over a
fire-and-forget memcached protocol (mcserver.go). In Spark terms both are a
micro-batched streaming pipeline: source -> windowed/stateful transform ->
sink, with `Trigger.ProcessingTime` ≙ flushDelay and
`maxFilesPerTrigger`/`maxOffsetsPerTrigger` ≙ maxOpQueue.

For local verification the parquet file source drives a windowed
aggregation to completion synchronously (processAllAvailable + memory
sink); on a cluster the same plan runs against Kafka/files with a real
trigger and a fault-tolerant sink (foreachBatch -> transactional table
append ≙ couchstore bulk commit).

The changes-feed the reference never implemented (S13, 501 at
handlers.go:455-457) is this same stream shape reading new files/offsets.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_bucket_counts(
    spark: SparkSession,
    events_path: str,
    group_ms: int = 86_400_000,
    query_name: str = "stream_bucket_counts",
) -> DataFrame:
    """Tumbling-window per-type counts computed *as a stream* over the
    events parquet, then returned as the final (complete-mode) result.

    Output: (bucket_ms LONG, event_type STRING, cnt LONG) — byte-identical
    to the equivalent batch aggregation, which is the oracle.
    """
    schema = spark.read.parquet(events_path).schema
    stream_dir = events_path
    if not os.path.isdir(events_path):
        # The file streaming source requires a directory; expose a single
        # parquet file through a symlinked staging dir (local-test path —
        # real deployments stream a directory/Kafka topic anyway).
        stream_dir = tempfile.mkdtemp(prefix="seriesly-stream-")
        os.symlink(
            events_path, os.path.join(stream_dir, os.path.basename(events_path))
        )
    src = spark.readStream.schema(schema).parquet(stream_dir)
    # ts arrives as LONG ns (nanosAsLong); window() needs a timestamp.
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    agg = (
        src.withColumn("__ts", ts)
        .groupBy(F.window("__ts", f"{group_ms} milliseconds"), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name).select(
        F.unix_millis(F.col("window.start")).alias("bucket_ms"),
        "event_type",
        "cnt",
    )
