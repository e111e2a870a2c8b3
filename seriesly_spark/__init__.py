"""seriesly_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dustin/seriesly, re-designed Spark-first.

The reference (read-only at /root/reference) is an HTTP server storing
schemaless JSON documents keyed by timestamp and answering one analytical
query shape: time-range scan -> tumbling time-bucket grouping -> JSON-Pointer
field extraction -> per-field reducer. This package re-expresses that surface
(and a beyond-parity layer: joins, windows, dedup, similarity search, text
analysis, streaming ingest) as declarative DataFrame plans that Catalyst can
optimize: predicate pushdown into the parquet scan, partial aggregation,
broadcast joins, AQE.

Layout:
  functions/  scalar expression builders (JSON-Pointer->JSONPath, timestamp
              parsing, numeric coercion, canonical key rendering)
  operators/  reducer registry, rate-family window dataflow, dedup,
              similarity, text stats, multimodal plumbing
  plans/      the seriesly query compiler (params -> one DataFrame) + emitters
  sources/    loaders for the driver testdata tables + LWW view helper
  streaming/  Structured Streaming ingest (the write-loop analogue)
  db.py       SerieslyDB — the operational surface (DDL, keyed-upsert
              ingest, range reads/dump, bulk delete, compaction, changes
              feed) over a date-partitioned parquet warehouse
"""

from seriesly_spark.db import SerieslyDB
from seriesly_spark.plans.query import SerieslyQuery, seriesly_query

__all__ = ["SerieslyDB", "SerieslyQuery", "seriesly_query"]
__version__ = "0.1.0"
