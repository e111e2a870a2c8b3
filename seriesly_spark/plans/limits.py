"""Query timeout / load shedding (P8).

The reference bounds worst-case query cost with a deadline checked in the
scan and per-bucket workers (maxQueryTime, default 5 min; reference
query.go:17,219-227,301-311, main.go:31-32). Spark has no per-query
deadline, but it has job groups with interruptible cancellation — the same
effect: a timer fires, every job the query started is cancelled, executors
interrupt their tasks, and the caller gets a QueryTimeout.

Usage:
    rows = run_with_timeout(spark, lambda: df.collect(), timeout_s=300)
"""

from __future__ import annotations

import threading
import uuid
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")


class QueryTimeout(Exception):
    """Raised when a query exceeds its deadline (reference: the handler
    writes a 500 with 'query timed out', handlers.go:213-218)."""


def run_with_timeout(spark: SparkSession, action: Callable[[], T], timeout_s: float) -> T:
    """Run ``action`` (any driver-side action: collect/count/save) with a
    hard deadline. All Spark jobs the action spawns are tagged with one job
    group; on timeout the group is cancelled (interruptOnCancel=True, so
    running tasks get a thread interrupt, not just queue removal)."""
    group = f"seriesly-deadline-{uuid.uuid4().hex}"
    sc = spark.sparkContext
    timed_out = threading.Event()
    done = threading.Event()

    def cancel() -> None:
        # Keep cancelling until the action returns: a single cancel can race
        # a job that has not registered under the group yet (cancelJobGroup
        # only affects *active* jobs), and one action may launch several
        # jobs back-to-back.
        timed_out.set()
        while not done.wait(0.25):
            sc.cancelJobGroup(group)

    timer = threading.Timer(timeout_s, cancel)
    sc.setJobGroup(group, f"seriesly query (deadline {timeout_s}s)", True)
    timer.start()
    try:
        return action()
    except Exception as e:  # Spark raises a cancellation error on cancel
        if timed_out.is_set():
            raise QueryTimeout(f"query timed out after {timeout_s}s") from e
        raise
    finally:
        done.set()
        timer.cancel()
        sc.setJobGroup("", "")
