#!/usr/bin/env python
"""Count Spark jobs per query (host-independent plan/barrier metric used
for round-16 before/after claims; wall-clock on this box is noisy, job
count is not).

Usage: python scripts/count_jobs.py <query> [query ...]
Prints one JSON line: {"query": n_jobs, ...} (measured on the run AFTER
a warm-up, so one-time listing/persist warm jobs are excluded exactly as
the bench's timed region excludes them).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402
from seriesly_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("count-jobs", cpus=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext
    qs = entry_mod.queries()
    out = {}
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        tracker = sc.statusTracker()
        before = set(tracker.getJobIdsForGroup(None))
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        after = set(tracker.getJobIdsForGroup(None))
        out[name] = len(after - before)
        spark.catalog.clearCache()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
