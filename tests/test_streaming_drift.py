"""streaming_score_drift: the streaming PSI monitor must (a) equal the
batch windowed-PSI computation on the real events source (the oracle
covers engines; this pins stream-vs-batch INSIDE Spark), and (b) react
— a planted distribution shift in one window must score a higher PSI
than an unshifted window."""

from pyspark.sql import functions as F

from seriesly_spark.operators.evaluation import psi_report
from seriesly_spark.sources.tables import normalize_events
from seriesly_spark.streaming.ingest import streaming_score_drift

EVENTS = "/root/testdata/sf0.001/events.parquet"
DAY_MS = 86_400_000


def test_stream_equals_batch_psi(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    got = streaming_score_drift(
        spark, EVENTS, group_ms=DAY_MS, query_name="drift_unit"
    ).collect()
    assert len(got) > 1
    # batch replica: per-window psi via the certified psi_report,
    # reference = the whole corpus
    ev = normalize_events(spark.read.parquet(EVENTS)).where(
        F.col("value").isNotNull()
    )
    ref = ev
    for row in got[:3]:
        lo_ns = row.bucket_ms * 1_000_000
        cur = ev.where(
            (F.col("ts_ns") >= lo_ns)
            & (F.col("ts_ns") < lo_ns + DAY_MS * 1_000_000)
        )
        rep = psi_report(
            ref, cur, value_col="value", n_bins=10, lo=-5.0, hi=5.0
        )
        terms = [r.psi_term for r in rep.collect()]
        want = round(sum(t for t in terms if t is not None), 6)
        assert row.psi == want, (row.bucket_ms, row.psi, want)
        assert row.n == cur.count()


def test_planted_shift_scores_higher(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # day 0 dominates the corpus (1800 rows near 0) so the frozen
    # reference ~= day 0's distribution; day 1 (200 rows near +4) is
    # the planted shift and must score the larger PSI.
    base = spark.range(2000).select(
        "id",
        F.lit(1).alias("event_id"),
        F.lit("t").alias("event_type"),
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(
            F.lit(86400 * 100) + (F.col("id") % 1000)
        ).alias("ts"),
        F.when(F.col("id") < 1800, (F.col("id") % 21 - 10) / 10.0)
        .otherwise(4.0 + (F.col("id") % 21 - 10) / 100.0)
        .alias("value"),
    )
    shifted = base.withColumn(
        "ts",
        F.when(
            F.col("id") >= 1800,
            F.timestamp_seconds(
                F.lit(86400 * 101) + (F.col("id") % 1000)
            ),
        ).otherwise(F.col("ts")),
    ).drop("id")
    path = str(tmp_path / "events")
    shifted.write.mode("overwrite").parquet(path)
    out = {
        r.bucket_ms: r.psi
        for r in streaming_score_drift(
            spark, path, group_ms=DAY_MS, query_name="drift_plant"
        ).collect()
    }
    day0 = 86400 * 100 * 1000 // DAY_MS * DAY_MS
    day1 = 86400 * 101 * 1000 // DAY_MS * DAY_MS
    assert out[day1] > out[day0] > 0.0
