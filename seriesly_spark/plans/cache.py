"""Query-result memoization (C1) — the reference's memcached bucket cache,
re-expressed storage-side.

The reference keys cached per-bucket results on
``db # bucket # fnv64(doc-ids + ptrs + reducers + filters)`` (reference
cache.go:157-172) — i.e. the cache entry is valid exactly while the bucket's
document set is unchanged. Here the whole result is memoized keyed on
(query spec, database version), where the database version is the max write
sequence + live-file fingerprint: any append, delete or compaction changes
the version and naturally invalidates every cached result, which is the
same correctness contract without per-bucket bookkeeping. Hits skip the
Spark job entirely (read one tiny parquet); misses compute and store
through. Cache entries are parquet, so the cache itself scales to any
result size and any shared filesystem.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame

from seriesly_spark.db import SerieslyDB
from seriesly_spark.plans.query import SerieslyQuery


def _query_fingerprint(name: str, q: SerieslyQuery, version: str) -> str:
    parts = [
        name,
        version,
        str(q.group_ms),
        repr(sorted(q.fields)),
        repr(sorted(q.filters)),
        repr(q.from_ts),
        repr(q.to_ts),
        repr(q.aliases),
    ]
    return hashlib.sha256("\x01".join(parts).encode()).hexdigest()[:32]


def db_version(dbs: SerieslyDB, name: str) -> str:
    """Cheap change detector: sorted list of live parquet files + sizes
    (appends add files; delete/compact remove or replace them)."""
    h = hashlib.sha256()
    root = dbs._path(name)
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                h.update(p.encode())
                h.update(str(os.path.getsize(p)).encode())
    return h.hexdigest()[:16]


class QueryCache:
    def __init__(self, dbs: SerieslyDB, cache_dir: str):
        self.dbs = dbs
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self.hits = 0
        self.misses = 0

    def query(self, name: str, q: SerieslyQuery, exact_sums: bool = False) -> DataFrame:
        """Memoized ``SerieslyDB.query``: identical query + unchanged
        database -> served from the cache parquet (no scan of the data);
        any write/delete/compact -> recompute (miss falls through to
        compute-and-store, like the reference's GET-miss path,
        cache.go:54-155)."""
        key = _query_fingerprint(name, q, db_version(self.dbs, name))
        path = os.path.join(self.cache_dir, key)
        spark = self.dbs.spark
        if os.path.isdir(path):
            try:
                out = spark.read.parquet(path)
                self.hits += 1
                return out
            except Exception:
                pass  # corrupt/partial entry: recompute
        self.misses += 1
        res = self.dbs.query(name, q, exact_sums=exact_sums)
        res.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
