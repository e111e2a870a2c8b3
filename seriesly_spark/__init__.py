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
  sources/    database catalog over a parquet warehouse (DDL, ingest, reads)
  streaming/  Structured Streaming ingest (the write-loop analogue)
"""

from seriesly_spark.plans.query import SerieslyQuery, seriesly_query

__all__ = ["SerieslyQuery", "seriesly_query"]
__version__ = "0.1.0"
