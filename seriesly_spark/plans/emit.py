"""Result emission: DataFrame -> the reference's JSON-object wire shape.

The reference streams ``{"<bucket-start-ms>": [one reduced value per ptr],
...}`` (reference handlers.go:177-221, key = ns/1e6 at handlers.go:190).
Here the result DataFrame is iterated with ``toLocalIterator`` (one
partition at a time — no full collect on the driver) and rendered to the
same shape; buckets arrive in deterministic bucket order instead of the
reference's completion order (JSON objects are unordered, so this is
observationally equivalent and reproducible).
"""

from __future__ import annotations

import json
import math
from typing import Any, Iterator

from pyspark.sql import DataFrame


def _jsonable(v: Any) -> Any:
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None  # NaN/Inf -> null (reference query.go:197-204)
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def iter_seriesly_rows(df: DataFrame, aliases: list[str]) -> Iterator[tuple[str, list]]:
    for row in df.toLocalIterator():
        yield str(row["bucket_ms"]), [_jsonable(row[a]) for a in aliases]


def to_seriesly_json(df: DataFrame, aliases: list[str]) -> str:
    """Render the full result object (small/medium results; for huge results
    stream ``iter_seriesly_rows`` to a chunked writer instead)."""
    return json.dumps(dict(iter_seriesly_rows(df, aliases)))
