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
import shutil
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from seriesly_spark.sources.tables import normalize_events


def _rm_staging(path: "str | None") -> None:
    """Remove a staging dir created by this module (symlinked copies —
    rmtree deletes the links, never the linked data). None is a no-op."""
    if path is not None:
        shutil.rmtree(path, ignore_errors=True)


def _stream_source(
    spark: SparkSession, events_path: str
) -> "tuple[DataFrame, str | None]":
    """Returns (stream df, staging dir to clean up or None). Callers
    remove the staging dir in a finally block once the query drains —
    the memory-sink result lives in driver memory, so post-drain reads
    never touch the staged files."""
    schema = spark.read.parquet(events_path).schema
    stream_dir = events_path
    staged = None
    if not os.path.isdir(events_path):
        # The file streaming source requires a directory; expose a single
        # parquet file through a symlinked staging dir (local-test path —
        # real deployments stream a directory/Kafka topic anyway).
        stream_dir = staged = tempfile.mkdtemp(prefix="seriesly-stream-")
        os.symlink(
            events_path, os.path.join(stream_dir, os.path.basename(events_path))
        )
    # normalize_events is a pure projection, so it composes with streaming
    # DataFrames: whatever physical ts form the files carry (LONG ns,
    # timestamp, timestamp_ntz), downstream operators see the canonical
    # (ts TIMESTAMP, ts_ns LONG) pair.
    return (
        normalize_events(spark.readStream.schema(schema).parquet(stream_dir)),
        staged,
    )


def _run_to_memory(agg, query_name: str, output_mode: str, spark: SparkSession):
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name)


def streaming_bucket_counts(
    spark: SparkSession,
    events_path: str,
    group_ms: int = 86_400_000,
    query_name: str = "stream_bucket_counts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window per-type counts computed *as a stream* over the
    events parquet, then returned as the final result.

    With ``watermark`` (e.g. "1 day") the aggregation runs in update mode
    with a late-data bound — the state store can evict windows older than
    max(event time) - watermark, which is what makes unbounded streams
    feasible; without it, complete mode keeps all windows. Either way the
    final table equals the batch aggregation (the oracle): the memory sink
    rows are reduced to the latest emission per (window, type).

    Output: (bucket_ms LONG, event_type STRING, cnt LONG).
    """
    src, staged = _stream_source(spark, events_path)
    # source is normalized: ts is a µs TIMESTAMP — window() takes it as-is.
    withts = src.withColumn("__ts", F.col("ts"))
    if watermark is not None:
        withts = withts.withWatermark("__ts", watermark)
    agg = withts.groupBy(
        F.window("__ts", f"{group_ms} milliseconds"), "event_type"
    ).agg(F.count("*").alias("cnt"))
    mode = "update" if watermark is not None else "complete"
    try:
        tbl = _run_to_memory(agg, query_name, mode, spark)
    finally:
        _rm_staging(staged)
    out = tbl.select(
        F.unix_millis(F.col("window.start")).alias("bucket_ms"),
        "event_type",
        "cnt",
    )
    if watermark is not None:
        # Update mode re-emits a row per batch it changed in; keep the last.
        out = (
            out.groupBy("bucket_ms", "event_type")
            .agg(F.max_by("cnt", "cnt").alias("cnt"))
        )
    return out


def streaming_distinct_users(
    spark: SparkSession,
    events_path: str,
    group_ms: int = 86_400_000,
    query_name: str = "stream_distinct_users",
) -> DataFrame:
    """Windowed APPROXIMATE distinct users computed as a stream — the
    streaming analogue of ``sliding_distinct_approx`` and the only
    viable shape for unbounded cardinality: per-window streaming state
    is ONE fixed-size HLL++ sketch (``approx_count_distinct``, rsd
    0.02) instead of the per-key set an exact streaming distinct would
    have to hold. Deterministic (hash-based sketch, no RNG), so the
    gate can pin the estimate inside an error envelope against the
    exact batch count.

    Output: (bucket_ms LONG, n_events LONG, est_users LONG).
    """
    src, staged = _stream_source(spark, events_path)
    agg = src.groupBy(
        F.window(F.col("ts"), f"{group_ms} milliseconds")
    ).agg(
        F.count("*").alias("n_events"),
        F.approx_count_distinct("user_id", 0.02).alias("est_users"),
    )
    try:
        tbl = _run_to_memory(agg, query_name, "complete", spark)
    finally:
        _rm_staging(staged)
    return tbl.select(
        F.unix_millis(F.col("window.start")).alias("bucket_ms"),
        "n_events",
        "est_users",
    )


_SESS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)
# State per user: (last_ts_us, last_event_id, n_events, n_sessions)
_SESS_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)


def sessionize_stream(raw: DataFrame, gap_us: int) -> DataFrame:
    """The sessionize transformation alone (streaming df in, update-mode
    stateful df out) — shared by the gate runner below and the latency
    harness (scripts/stream_latency.py), which drives it with its own
    chunked micro-batch source."""
    src = raw.select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_events, n_sessions = state.get
        else:
            last_ts, n_events, n_sessions = None, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        for ts_us in rows["ts_us"]:
            if last_ts is None or ts_us - last_ts > gap_us:
                n_sessions += 1
            n_events += 1
            last_ts = ts_us
        state.update((int(last_ts), int(n_events), int(n_sessions)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "n_sessions": [n_sessions],
            }
        )

    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_SESS_OUT,
        stateStructType=_SESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionize(
    spark: SparkSession,
    events_path: str,
    gap_us: int = 1_800_000_000,
    query_name: str = "stream_sessionize",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user session counting with an inactivity gap, state = (last event
    time, running counts) per user — the shape the reference could never
    express (its only state is the per-bucket reducer pipeline).

    Arrow-batched per group; state is three longs per user, so the state
    store stays tiny at any cardinality. Within a micro-batch events are
    sorted by (ts, event_id) — correct as long as batches arrive in time
    order per user (file/Kafka sources with event-time partitioning; a
    production pipeline would add a watermark + buffer for disorder).

    Output: (user_id, n_events, n_sessions), equal to the batch
    sessionization on the same data (the oracle).
    """
    raw, staged = _stream_source(spark, events_path)
    agg = sessionize_stream(raw, gap_us)
    try:
        tbl = _run_to_memory(agg, query_name, "update", spark)
    finally:
        _rm_staging(staged)
    # Latest emission per user (update mode re-emits per batch).
    return tbl.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("n_sessions").alias("n_sessions"),
    )


def _staging_split_ts(
    batch: DataFrame, left_type: str, right_type: str, horizon_ns: int
) -> int:
    """Pick the two-micro-batch split point for the stream-stream join
    harness: just below the in-horizon right event nearest the overall
    time midpoint, so at least one matched pair is GUARANTEED to span
    the batch boundary (a naive midpoint can land in a pair desert and
    make the cross-batch claim vacuous). Harness staging only — scalar
    aggregates, not an operator data path. Falls back to the midpoint if
    the file has no qualifying pair at all. All math in ns on the
    normalized ``ts_ns`` column."""
    lo, hi = batch.agg(F.min("ts_ns"), F.max("ts_ns")).first()
    overall_mid = (int(lo) + int(hi)) // 2
    v = batch.where(F.col("event_type") == left_type).select(
        "user_id", F.col("ts_ns").alias("vt")
    )
    c = batch.where(F.col("event_type") == right_type).select(
        "user_id", F.col("ts_ns").alias("ct")
    )
    pick = (
        v.join(c, "user_id")
        .where((F.col("ct") > F.col("vt")) & (F.col("ct") <= F.col("vt") + horizon_ns))
        .select("ct", F.abs(F.col("ct") - overall_mid).alias("d"))
        .orderBy("d", "ct")
        .first()
    )
    return int(pick.ct) - 1 if pick is not None else overall_mid


def streaming_join_pairs(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "click",
    horizon_ms: int = 3_600_000,
    watermark: str = "1 hour",
    query_name: str = "stream_join",
    stage_two_batches: bool = True,
) -> DataFrame:
    """Stream-stream inner join with an event-time range condition: every
    ``right_type`` event is matched to the same user's ``left_type``
    events in the preceding ``horizon_ms``. This is attribution — the
    join shape the reference cannot express at all (one DB, one bucket
    pipeline) and the canonical Structured Streaming stateful join:
    watermarks on BOTH inputs plus the time-range predicate let the
    engine evict left rows older than max(event time) - horizon - slack,
    so state stays bounded on an unbounded stream.

    Append mode: each matched pair is emitted exactly once. Output
    (user_id, view_id, click_id, dt_us) equals the batch range-join on
    the same file (the oracle).

    ``stage_two_batches`` (default) splits the input at the midpoint of
    its time range into two files processed as SEPARATE micro-batches
    (maxFilesPerTrigger=1, mtime-ordered): every view within the horizon
    of the boundary must be matched to clicks that arrive one batch
    later, so the pairs provably cross the state store — a single-batch
    in-memory join cannot pass. The watermark math guarantees no false
    eviction: after batch 1 the left-side keep threshold is
    (batch-1 max event time) - watermark - horizon, strictly older than
    any view still needed by batch 2's clicks.
    """
    staged_dirs: "list[str]" = []
    if stage_two_batches:
        batch = normalize_events(spark.read.parquet(events_path))
        mid = _staging_split_ts(
            batch, left_type, right_type, horizon_ms * 1_000_000
        )
        stage_dir = tempfile.mkdtemp(prefix="seriesly-sjoin-")
        staged_dirs.append(stage_dir)
        for i, pred in enumerate([F.col("ts_ns") <= mid, F.col("ts_ns") > mid]):
            half_dir = os.path.join(stage_dir, f"half{i}")
            batch.where(pred).coalesce(1).write.parquet(half_dir)
            for f in os.listdir(half_dir):
                if f.endswith(".parquet"):
                    dst = os.path.join(stage_dir, f"{i}.parquet")
                    os.rename(os.path.join(half_dir, f), dst)
                    # FileStreamSource orders by (mtime, path); pin the
                    # halves a file-system tick apart so batch order is
                    # deterministic.
                    os.utime(dst, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
        schema = batch.schema

        def _src() -> DataFrame:
            # staged halves were written post-normalization, so
            # normalize_events is an idempotent no-op here; keep it so
            # both branches yield the identical canonical schema.
            return normalize_events(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(stage_dir)
            )

    else:

        def _src() -> DataFrame:
            df, st = _stream_source(spark, events_path)
            if st is not None:
                staged_dirs.append(st)
            return df

    lhs = (
        _src()
        .where(F.col("event_type") == left_type)
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    rhs = (
        _src()
        .where(F.col("event_type") == right_type)
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    joined = lhs.join(
        rhs,
        [
            lhs["user_id"] == rhs["user_id"],
            rhs["r_ts"] > lhs["l_ts"],
            rhs["r_ts"] <= lhs["l_ts"] + F.expr(f"INTERVAL {horizon_ms} MILLISECONDS"),
        ],
    ).select(
        lhs["user_id"],
        "view_id",
        "click_id",
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("dt_us"),
    )
    try:
        return _run_to_memory(joined, query_name, "append", spark)
    finally:
        for d in staged_dirs:
            _rm_staging(d)


def streaming_dedup_counts(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 days",
    query_name: str = "stream_dedup",
) -> DataFrame:
    """Streaming ingest dedup: exactly-once-per-key results over an
    at-least-once transport. The source replays the events file TWICE (two
    staged copies, one micro-batch each via maxFilesPerTrigger=1), so every
    event arrives in two different micro-batches;
    ``dropDuplicatesWithinWatermark`` on event_id must reconcile them
    across batches through the state store — an in-batch distinct cannot
    pass this test.

    State is one entry per key within the watermark horizon and is evicted
    as event time advances — bounded state on an unbounded stream, which is
    the property batch ``distinct`` does not have. Output: per-type counts
    of the deduplicated stream; equals the batch counts of the file read
    once (the oracle).
    """
    stream_dir = tempfile.mkdtemp(prefix="seriesly-dedup-")
    for i in range(2):
        os.symlink(events_path, os.path.join(stream_dir, f"replay{i}.parquet"))
    schema = spark.read.parquet(events_path).schema
    src = normalize_events(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    deduped = (
        src.withColumn("ev_time", F.col("ts"))
        .withWatermark("ev_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    try:
        return _run_to_memory(agg, query_name, "complete", spark)
    finally:
        _rm_staging(stream_dir)


def streaming_score_drift(
    spark: SparkSession,
    events_path: str,
    group_ms: int = 86_400_000,
    n_bins: int = 10,
    lo: float = -5.0,
    hi: float = 5.0,
    eps: float = 1e-6,
    query_name: str = "stream_score_drift",
    watermark: str | None = None,
) -> DataFrame:
    """Windowed PSI drift of the event-value distribution against the
    corpus-wide reference, computed AS A STREAM — the streaming member
    of the scorer-evaluation family: the monitor a pipeline runs on the
    live scored feed so a scorer's thresholds stop being trusted the
    day the distribution moves, not at the next batch audit.

    The STREAMING stage is only the windowed bin-count aggregate
    (map-side-combined; state is (window x n_bins) counters — bounded,
    watermark-evictable); everything after the drain is an
    n_bins-per-window batch fold: dense bin grid per window (groupBy
    DROPS empty bins and an empty bin IS the drift signal — the
    psi_report rule), round-6 proportions, the exact psi_report term
    formula ((p - q) * ln(p / q) on eps-clamped round-6 proportions),
    and a per-window decimal fold of the round-6 terms (order-
    independent — a float sum over bins is the cross-engine trap).
    The final table equals the batch windowed-PSI computation, which
    is what the DuckDB oracle replays. Output: (bucket_ms, n, psi)
    ordered; psi NULL only when the reference side is empty.
    """
    span = hi - lo

    def binned(col):
        return F.least(
            F.greatest(
                F.floor((col - F.lit(lo)) / F.lit(span) * n_bins).cast(
                    "int"
                ),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )

    src, staged = _stream_source(spark, events_path)
    withts = src.where(F.col("value").isNotNull()).withColumn(
        "__ts", F.col("ts")
    )
    if watermark is not None:
        withts = withts.withWatermark("__ts", watermark)
    agg = withts.groupBy(
        F.window("__ts", f"{group_ms} milliseconds"),
        binned(F.col("value")).alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n_cur"))
    mode = "update" if watermark is not None else "complete"
    try:
        tbl = _run_to_memory(agg, query_name, mode, spark)
    finally:
        _rm_staging(staged)
    counts = tbl.select(
        F.unix_millis(F.col("window.start")).alias("bucket_ms"),
        "bin",
        "n_cur",
    )
    if watermark is not None:
        # update mode re-emits changed rows; counts grow monotonically,
        # so the latest emission is the max.
        counts = counts.groupBy("bucket_ms", "bin").agg(
            F.max("n_cur").alias("n_cur")
        )
    # Frozen reference: the whole corpus profile, computed batch-side
    # over the same normalized source (n_bins rows; dense).
    ref = (
        normalize_events(spark.read.parquet(events_path))
        .where(F.col("value").isNotNull())
        .groupBy(binned(F.col("value")).alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_ref"))
    )
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    refd = bins.join(ref, "bin", "left").select(
        "bin", F.coalesce("n_ref", F.lit(0)).alias("n_ref")
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    refp = refd.select(
        "bin",
        F.when(
            F.sum("n_ref").over(tot) > 0,
            F.round(F.col("n_ref") / F.sum("n_ref").over(tot), 6),
        ).alias("p_ref"),
    )
    wins = counts.select("bucket_ms").distinct()
    grid = wins.crossJoin(F.broadcast(bins))
    j = (
        grid.join(counts, ["bucket_ms", "bin"], "left")
        .select(
            "bucket_ms",
            "bin",
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .join(F.broadcast(refp), "bin")
    )
    wtot = Window.partitionBy("bucket_ms")
    withp = j.select(
        "bucket_ms",
        "n_cur",
        "p_ref",
        F.when(
            F.sum("n_cur").over(wtot) > 0,
            F.round(F.col("n_cur") / F.sum("n_cur").over(wtot), 6),
        ).alias("p_cur"),
    )
    p = F.greatest(F.col("p_cur"), F.lit(eps))
    q = F.greatest(F.col("p_ref"), F.lit(eps))
    term = F.when(
        F.col("p_ref").isNotNull() & F.col("p_cur").isNotNull(),
        F.round((p - q) * F.log(p / q), 6),
    )
    return (
        withp.withColumn("__t", term)
        .groupBy("bucket_ms")
        .agg(
            F.sum("n_cur").cast("bigint").alias("n"),
            F.round(
                F.sum(F.col("__t").cast("decimal(18,6)")).cast("double"), 6
            ).alias("psi"),
        )
        .orderBy("bucket_ms")
    )


def streaming_phash_dedup(
    spark: SparkSession,
    docs_path: str,
    query_name: str = "stream_phash_dedup",
) -> DataFrame:
    """Streaming PERCEPTUAL image dedup: an image stream (each document
    manufactures its dense-spectrum 32x32 image AND a +30-brightness
    re-grade of it — two arrivals per doc; the whole file then replays
    a second time, so four arrivals per doc across micro-batches) is
    pHashed inside a streaming mapInPandas stage and deduplicated on
    the hash through the state store. Brightness twins and replays all
    collide on the pHash, so the kept set is exactly ONE image per
    distinct pattern — the streaming analogue of phash_dedup, and a
    composition batch distinct cannot express across micro-batches.

    State is one row per DISTINCT IMAGE (content diversity, not stream
    length); for corpora where that is unbounded, compose with a
    watermarked key like streaming_dedup_counts. Output: one row,
    n_unique — equals the batch count of distinct patterns (the
    oracle)."""
    import os as _os
    import tempfile as _tf

    stream_dir = _tf.mkdtemp(prefix="seriesly-sphash-")
    for i in range(2):
        _os.symlink(docs_path, _os.path.join(stream_dir, f"replay{i}.parquet"))
    schema = spark.read.parquet(docs_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .select("doc_id")
    )

    def hash_images(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        from seriesly_spark.operators.multimodal import (
            _dct_matrix,
            decode_ppm,
            encode_ppm,
            phash64,
        )

        m = _dct_matrix(32)
        cache: dict = {}

        def base_img(res: int):
            if res not in cache:
                g = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        if (u, v) == (0, 0):
                            continue
                        b = hashlib.md5(f"{res}|{u}|{v}".encode()).digest()[0]
                        g[u, v] = (2.0 + b % 16) * (1.0 if b >= 128 else -1.0)
                ideal = m[:8, :].T @ g @ m[:8, :]
                img = 128 + ideal * (90.0 / np.abs(ideal).max())
                cache[res] = np.round(
                    np.stack([img + 5 * c for c in range(3)], axis=2)
                ).clip(0, 255).astype(np.uint8)
            return cache[res]

        for pdf in batches:
            ids, hashes = [], []
            for doc_id in pdf["doc_id"]:
                res = int(doc_id) % 40
                arr = base_img(res)
                bright = (arr.astype(np.int64) + 30).clip(0, 255).astype(
                    np.uint8
                )
                for img in (arr, bright):  # two arrivals per doc
                    # byte-honest: encode to PPM, decode back, hash
                    ids.append(doc_id)
                    hashes.append(phash64(decode_ppm(encode_ppm(img))))
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    hashed = src.mapInPandas(hash_images, "doc_id long, phash long")
    agg = hashed.dropDuplicates(["phash"]).agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    try:
        return _run_to_memory(agg, query_name, "complete", spark)
    finally:
        _rm_staging(stream_dir)


def streaming_decontam(
    spark: SparkSession,
    stream_dir: str,
    grams: DataFrame,
    n: int = 3,
    query_name: str = "stream_decontam",
) -> DataFrame:
    """Streaming DECONTAMINATION verdicts: a document stream (a daily
    crawl arriving in micro-batches — ``stream_dir`` holds the chunked
    parquet files, one micro-batch each) is probed against a FROZEN
    benchmark gram-hash set (``grams``: (g bigint) — typically
    ``DecontamIndex._index_df()`` or any static frame of window
    hashes — rows are de-duplicated here before the join, so a
    duplicate-bearing frame cannot fan the join out and double-count
    hits) and every document gets a contamination
    verdict as it arrives. The streaming member of the decontamination family: the
    one-shot operators (``dedup_spans_cross`` / ``decontam_report``)
    audit a corpus at rest; the index (``DecontamIndex``) makes the
    benchmark side incremental; this closes the loop for the ARRIVING
    side, the shape a live intake pipeline actually runs.

    Dataflow: per micro-batch, each document's positional n-gram
    window hashes are computed in-row (the ``_window_hash_expr``
    identity the whole span family joins on) and stream-static LEFT
    joined against ``grams`` — no state beyond the per-doc counters
    (each doc arrives once; the aggregate is keyed by doc_id, the
    streaming_bucket_counts state class). Post-drain, the staged doc
    spine rejoins so gram-less documents (short/NULL text) report
    (0, 0) instead of vanishing. The final table equals the batch
    positional-gram containment, which is what the DuckDB oracle
    replays (window TEXT identity — independent of xxhash64, the
    dedup_spans_cross oracle convention). Output: (doc_id, n_grams,
    n_hits, gram_containment round-6 or NULL when gram-less,
    contaminated = n_hits > 0), ordered by doc_id.
    """
    from seriesly_spark.operators.dedup import _window_hash_expr
    from seriesly_spark.operators.textstats import tokens

    schema = spark.read.parquet(stream_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    # _span_tokens' projection, minus its spread(): .rdd-based
    # partition introspection is illegal on a streaming frame (and a
    # micro-batch is already partitioned by the file source)
    toks = tokens("text")
    pre = src.select(
        F.col("doc_id").alias("id"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("__th"),
        F.size(toks).alias("__nt"),
    )
    exploded = pre.select(
        "id", F.explode(_window_hash_expr(n)).alias("g")
    )
    # grams is static, so enforcing the distinct-rows precondition
    # costs one agg up front; a duplicate-bearing frame would fan the
    # stream-static join out and double-count n_hits silently.
    marked = exploded.join(
        grams.select("g").distinct().withColumn("__hit", F.lit(1)),
        "g",
        "left",
    )
    agg = marked.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
    )
    tbl = _run_to_memory(agg, query_name, "complete", spark)
    spine = spark.read.parquet(stream_dir).select(
        F.col("doc_id").alias("id")
    )
    out = spine.join(tbl, "id", "left").select(
        F.col("id").alias("doc_id"),
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
    )
    return out.select(
        "doc_id",
        "n_grams",
        "n_hits",
        F.when(
            F.col("n_grams") > 0,
            F.round(F.col("n_hits") / F.col("n_grams"), 6),
        ).alias("gram_containment"),
        (F.col("n_hits") > 0).alias("contaminated"),
    ).orderBy("doc_id")


def streaming_quality_score(
    spark: SparkSession,
    stream_dir: str,
    weights: DataFrame,
    query_name: str = "stream_qscore",
) -> DataFrame:
    """Score an ARRIVING document stream with a FROZEN trained
    quality-LR weight table (``train_quality_lr``'s (bucket, weight)
    shape) — the last batch-only gap in the trained family closed:
    train offline, score the live intake. The ``streaming_decontam``
    shape taken one step further: the model is literal weights in the
    plan (frozen = collected once, driver metadata), scoring is a
    PER-ROW projection, so the stream runs STATELESS in append mode —
    no aggregation state at all, each micro-batch scores and emits.

    Bit-parity with the batch scorer: the per-doc feature vector is
    built IN-ROW (distinct hashed buckets of the same uni+bigram set,
    x = occurrences / total — the identical IEEE division), folded by
    the same round-6 decimal ``_logit`` against the same literal
    weight vector, so the drained table EQUALS
    ``score_quality_lr(docs, weights)`` and the DuckDB oracle is that
    operator's SQL verbatim (the decontam_index_probe convention).
    Featureless docs (NULL text) score NULL. Output: (doc_id, score),
    ordered by doc_id.
    """
    from seriesly_spark.operators.quality import (
        BIAS_BUCKET,
        _logit,
        _md5_bucket,
        _sigmoid6,
        _weight_vec,
    )
    from seriesly_spark.operators.textstats import tokens

    wrows = weights.select("bucket", "weight").collect()
    trained = max(int(r.bucket) for r in wrows) + 1 if wrows else 0
    got = sorted(int(r.bucket) for r in wrows)
    if got != list(range(BIAS_BUCKET, trained)):
        raise ValueError(
            "weight table is not dense over buckets "
            f"{BIAS_BUCKET}..{trained - 1} (got {len(got)} rows) — "
            "re-materialize zero-weight rows before scoring"
        )
    buckets = trained
    w = [0.0] * (buckets + 1)
    for r in wrows:
        w[int(r.bucket) - BIAS_BUCKET] = float(r.weight)
    wvec = _weight_vec(w)

    schema = spark.read.parquet(stream_dir).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    t = tokens("text")
    pre = src.select(F.col("doc_id"), t.alias("__t"))
    uni = F.col("__t")
    bi = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.slice("__t", 1, F.size("__t") - 1),
            lambda x, i: F.concat_ws(" ", x, F.col("__t")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    gs = F.transform(F.concat(uni, bi), lambda f: _md5_bucket(f, buckets))
    nf = F.size(gs)
    # distinct-bucket (b, x) pairs built in-row: same value set as the
    # batch path's groupBy counts, and the decimal logit fold is
    # order-independent, so array order vs aggregation order is moot
    fs = F.when(
        nf > 0,
        F.concat(
            F.transform(
                F.array_distinct(gs),
                lambda b: F.struct(
                    b.alias("b"),
                    (
                        F.size(F.filter(gs, lambda g: g == b)) / nf
                    ).alias("x"),
                ),
            ),
            F.array(
                F.struct(
                    F.lit(BIAS_BUCKET).alias("b"), F.lit(1.0).alias("x")
                )
            ),
        ),
    )
    scored = pre.select(
        "doc_id", _sigmoid6(_logit(fs, wvec)).alias("score")
    )
    return _run_to_memory(scored, query_name, "append", spark).orderBy(
        "doc_id"
    )
