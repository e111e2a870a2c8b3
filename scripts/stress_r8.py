#!/usr/bin/env python
"""Round-8 stress: crash recovery at production shape (VERDICT r07
items 6+7). Builds the 20M-digest DedupIndex, kills ``compact()``
mid-swap at two different points, and measures what the next open pays
for ``_recover_compact`` plus whether the probe is still exactly right
afterwards; then certifies the exported bucketed probe is Exchange-free
on the history side AT SCALE (the sf0.1 gate pins the same boolean at
toy size).

Crash points (the two that differ in recovery work):
  * ROLL-FORWARD — die on ``os.rename(tmp, data)``: base is aside,
    completed tmp not yet installed. Recovery must install the tmp and
    finish the removals.
  * FINISH-CLEANUP — die on ``shutil.rmtree(delta)``: compacted base is
    installed but every delta digest still exists twice (data+delta).
    Without recovery, ``update``'s no-distinct probe join fans out —
    the exact failure the ``data.compact-old`` marker exists to repair.

Shard maths makes correctness exact, not statistical: shard ids with
``id % 10 == 0`` replay history doc ``(id*7919) % N_HIST`` (7919 is
coprime to N_HIST, so replays never collide in-batch); the rest are
globally-unique novel texts. Every probe must therefore report
``n_in == N_SHARD`` (any fan-out inflates this), ``n_dup_in_batch ==
0``, ``n_dup_vs_index == N_SHARD/10``, ``n_new == 0.9*N_SHARD``.

Sizes env-overridable (STRESS_HIST / STRESS_SHARD) for smoke runs.
Output: markdown table for PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import seriesly_spark.operators.dedup_index as di  # noqa: E402
from seriesly_spark.operators.dedup_index import (  # noqa: E402
    DedupIndex,
    index_update_report,
    probe_bucketed_history,
)
from seriesly_spark.session import get_spark  # noqa: E402

ROOT = os.environ.get("STRESS_DIR", "/tmp/seriesly-stress-r8")
N_HIST = int(os.environ.get("STRESS_HIST", 20_000_000))
N_SHARD = int(os.environ.get("STRESS_SHARD", 1_000_000))


class _InjectedCrash(RuntimeError):
    pass


def timed(name, fn, results):
    t0 = time.perf_counter()
    extra = fn()
    wall = time.perf_counter() - t0
    results.append((name, wall, extra))
    print(f"  {name}: {wall:.2f} s" + (f"  {extra}" if extra else ""),
          flush=True)
    return wall


def hist_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("history doc "), F.col("id")).alias("text"),
    )


def shard_docs(spark, n, offset, n_hist, replay_frac=10):
    return spark.range(n).select(
        (F.col("id") + F.lit(offset)).alias("doc_id"),
        F.when(
            F.col("id") % replay_frac == 0,
            F.concat(
                F.lit("history doc "), (F.col("id") * 7919) % F.lit(n_hist)
            ),
        )
        .otherwise(F.concat(F.lit("shard doc "), F.col("id") + F.lit(offset)))
        .alias("text"),
    )


def crash_compact(idx, *, on, step, results, label):
    """Run idx.compact() but make one filesystem step (``step`` =
    "rename" or "rmtree") raise when it touches path ``on``. Patching
    exactly one syscall matters: compact() defensively pre-cleans the
    tmp dir with rmtree, so a crash-on-any-touch would fire before any
    real work."""
    real_rename, real_rmtree = os.rename, shutil.rmtree

    def bad_rename(s, d):
        if os.path.abspath(str(s)) == os.path.abspath(on):
            raise _InjectedCrash(s)
        return real_rename(s, d)

    def bad_rmtree(p, *a, **kw):
        if os.path.abspath(str(p)) == os.path.abspath(on):
            raise _InjectedCrash(p)
        return real_rmtree(p, *a, **kw)

    if step == "rename":
        di.os.rename = bad_rename
    else:
        di.shutil.rmtree = bad_rmtree
    t0 = time.perf_counter()
    try:
        idx.compact()
        raise AssertionError("injected crash did not fire")
    except _InjectedCrash:
        pass
    finally:
        di.os.rename, di.shutil.rmtree = real_rename, real_rmtree
    wall = time.perf_counter() - t0
    results.append((label, wall, "crashed as injected"))
    print(f"  {label}: {wall:.2f} s  (crashed as injected)", flush=True)


def assert_probe_exact(report_row, n_shard, where):
    r = report_row.asDict()
    exp = {
        "n_in": n_shard,
        "n_dup_in_batch": 0,
        "n_dup_vs_index": n_shard // 10,
        "n_new": n_shard - n_shard // 10,
    }
    got = {k: r[k] for k in exp}
    assert got == exp, f"{where}: probe report {got} != expected {exp}"
    return str(got)


def main():
    spark = get_spark("stress-r8", cpus=32, shuffle_partitions=64)
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    results = []
    path = os.path.join(ROOT, "idx")

    idx = DedupIndex(spark, path)
    timed(
        f"seed ({N_HIST/1e6:.0f}M digests) + first compact",
        lambda: (
            idx.update(hist_docs(spark, N_HIST)).count(),
            idx.compact(),
        )
        and None,
        results,
    )
    # Delta exists again before each crash (compact needs work to do).
    off = N_HIST

    # --- Crash 1: roll-forward (die installing the completed tmp) ---
    sh = shard_docs(spark, N_SHARD, off, N_HIST)
    idx.update(sh).write.format("noop").mode("overwrite").save()
    off += N_SHARD
    crash_compact(
        idx,
        on=idx._data + ".compact-tmp",
        step="rename",
        results=results,
        label="compact killed at os.rename(tmp, data)",
    )
    t0 = time.perf_counter()
    idx = DedupIndex(spark, path)  # recovery happens here
    results.append(
        ("reopen: _recover_compact ROLL-FORWARD", time.perf_counter() - t0,
         "driver-side renames only")
    )
    print(f"  reopen roll-forward: {results[-1][1]:.3f} s", flush=True)
    assert not os.path.isdir(idx._delta)
    sh = shard_docs(spark, N_SHARD, off, N_HIST)
    off += N_SHARD
    timed(
        "probe after roll-forward (exact classification)",
        lambda: assert_probe_exact(
            index_update_report(idx.update(sh)).collect()[0],
            N_SHARD,
            "post-roll-forward",
        ),
        results,
    )

    # --- Crash 2: finish-cleanup (die removing delta; data+delta dup) ---
    crash_compact(
        idx,
        on=idx._delta,
        step="rmtree",
        results=results,
        label="compact killed at shutil.rmtree(delta)",
    )
    assert os.path.isdir(idx._data) and os.path.isdir(idx._delta)
    t0 = time.perf_counter()
    idx = DedupIndex(spark, path)
    results.append(
        ("reopen: _recover_compact FINISH-CLEANUP", time.perf_counter() - t0,
         "removes dup delta + marker")
    )
    print(f"  reopen finish-cleanup: {results[-1][1]:.3f} s", flush=True)
    assert not os.path.isdir(idx._delta)
    sh = shard_docs(spark, N_SHARD, off, N_HIST)
    off += N_SHARD
    timed(
        "probe after finish-cleanup (no fan-out)",
        lambda: assert_probe_exact(
            index_update_report(idx.update(sh)).collect()[0],
            N_SHARD,
            "post-finish-cleanup",
        ),
        results,
    )

    # --- Exchange-free certification of the exported probe AT SCALE ---
    idx.compact()
    table = "stress_r8_hist"
    timed(
        f"export bucketed history ({N_HIST/1e6:.0f}M+ digests)",
        lambda: idx.to_bucketed_table(
            table, path=os.path.join(ROOT, "hist_tbl")
        ),
        results,
    )
    sh = shard_docs(spark, N_SHARD, off, N_HIST)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    probe = probe_bucketed_history(spark, table, sh)
    timed(
        "bucketed probe at scale",
        lambda: str(
            probe.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("dup_vs_index").cast("long")).alias("dup"),
            )
            .collect()[0]
            .asDict()
        ),
        results,
    )
    # Same boolean the sf0.1 gate pins (tests/test_round6_ops.py), now
    # asserted at production size: the bare probe join's FINAL plan has
    # exactly ONE Exchange — the shard's 16-byte digests moving to the
    # history's recorded bucket distribution; zero on the history side.
    probe.write.format("noop").mode("overwrite").save()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    n_ex = final.count("Exchange")
    bucket_scan = "SelectedBucketsCount" in plan
    ok = bucket_scan and n_ex == 1
    results.append(
        (
            "history-side Exchange-free @ scale",
            0.0,
            f"probe-join final-plan Exchanges={n_ex} (shard side only), "
            f"SelectedBucketsCount={bucket_scan}, certified={ok}",
        )
    )
    assert ok, plan
    spark.sql(f"DROP TABLE IF EXISTS {table}")

    print("\n| stage | wall (s) | detail |")
    print("|---|---|---|")
    for name, wall, extra in results:
        print(f"| {name} | {wall:.2f} | {extra or ''} |")
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
