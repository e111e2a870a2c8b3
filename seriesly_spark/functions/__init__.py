from seriesly_spark.functions.jsonptr import ptr_to_jsonpath, extract_ptr
from seriesly_spark.functions.coerce import to_num, is_structural, go_fmt_scalar
from seriesly_spark.functions.timeparse import (
    parse_any_ts_ns,
    canonical_key,
    ts_ns_from_timestamp,
)

__all__ = [
    "ptr_to_jsonpath",
    "extract_ptr",
    "to_num",
    "is_structural",
    "go_fmt_scalar",
    "parse_any_ts_ns",
    "canonical_key",
    "ts_ns_from_timestamp",
]
