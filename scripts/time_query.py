#!/usr/bin/env python
"""Isolated per-query timer for A/Bs (fresh JVM per invocation, same
methodology as bench.py: one untimed warm-up, then median/min of
$SPARK_GRAFT_BENCH_REPS (default 3) noop-sink runs, clearCache between
queries).  Used for the round-16 alternating fresh-JVM A/Bs prescribed by
the standing host-noise protocol (BASELINE.md r13 addendum).

Usage: python scripts/time_query.py <query> [query ...]
Prints one JSON line: {"query": {"med": s, "min": s, "runs": [...]}, ...}
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402
from seriesly_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark("time-query", cpus=cpus, shuffle_partitions=cpus)
    qs = entry_mod.queries()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time_query warm: {name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"time_query run{i}: {name}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        out[name] = {
            "med": round(statistics.median(runs), 4),
            "min": round(min(runs), 4),
            "runs": runs,
        }
        spark.catalog.clearCache()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
