#!/usr/bin/env python
"""Round-6 stress: the persistent incremental dedup indexes at
production shape — a 20M-digest DedupIndex probed by 1M-doc shards
(10% history replays), compacted, and probed again; a 2M-signature
MinhashIndex probed by a 200k shard. Measures the crawl-pipeline
steady state the operators exist for: probe cost vs a history ~20x the
shard, append-file accumulation, and compaction's effect on the probe.
Single runs, wall-clock, markdown table for PLANS.md."""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.operators.dedup_index import (  # noqa: E402
    DedupIndex,
    MinhashIndex,
    index_update_report,
)
from seriesly_spark.session import get_spark  # noqa: E402

ROOT = os.environ.get("STRESS_DIR", "/tmp/seriesly-stress-r6")
N_HIST = int(os.environ.get("STRESS_HIST", 20_000_000))
N_SHARD = int(os.environ.get("STRESS_SHARD", 1_000_000))
N_MH_HIST = int(os.environ.get("STRESS_MH_HIST", 2_000_000))
N_MH_SHARD = int(os.environ.get("STRESS_MH_SHARD", 200_000))


def timed(name, fn, results):
    t0 = time.perf_counter()
    extra = fn()
    wall = time.perf_counter() - t0
    results.append((name, wall, extra))
    print(f"  {name}: {wall:.1f} s" + (f"  {extra}" if extra else ""),
          flush=True)


def hist_docs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("history doc "), F.col("id")).alias("text"),
    )


def shard_docs(spark, n, offset, n_hist, replay_frac=10):
    """1/replay_frac of the shard replays a pseudo-random history doc;
    the rest is novel."""
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


def main():
    spark = get_spark("stress-r6", cpus=32, shuffle_partitions=64)
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    results = []

    # --- DedupIndex: 20M history ---
    idx = DedupIndex(spark, os.path.join(ROOT, "idx"))
    timed(
        f"DedupIndex seed ({N_HIST/1e6:.0f}M digests, 1 batch)",
        lambda: idx.update(hist_docs(spark, N_HIST)).count() and None,
        results,
    )
    sh1 = shard_docs(spark, N_SHARD, N_HIST, N_HIST)
    timed(
        f"probe shard 1 ({N_SHARD/1e6:.1f}M vs {N_HIST/1e6:.0f}M)",
        lambda: str(
            index_update_report(idx.update(sh1)).collect()[0].asDict()
        ),
        results,
    )
    sh2 = shard_docs(spark, N_SHARD, N_HIST + N_SHARD, N_HIST)
    timed(
        "probe shard 2 (index now has appended files)",
        lambda: str(
            index_update_report(idx.update(sh2)).collect()[0].asDict()
        ),
        results,
    )
    timed("compact (fold buckets + prune staging)",
          lambda: str(idx.compact()), results)
    sh3 = shard_docs(spark, N_SHARD, N_HIST + 2 * N_SHARD, N_HIST)
    timed(
        "probe shard 3 (post-compact)",
        lambda: str(
            index_update_report(idx.update(sh3)).collect()[0].asDict()
        ),
        results,
    )

    # The cluster probe shape: history as a digest-bucketed catalog
    # table — no Exchange on the history side (read-only snapshot).
    from seriesly_spark.operators.dedup_index import probe_bucketed_history

    timed(
        "export bucketed history table",
        lambda: idx.to_bucketed_table(
            "stress_hist", path=os.path.join(ROOT, "hist_tbl")
        ),
        results,
    )
    sh4 = shard_docs(spark, N_SHARD, N_HIST + 3 * N_SHARD, N_HIST)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    for tag in ("cold", "warm"):
        timed(
            f"bucketed probe ({tag}, history unshuffled)",
            lambda: str(
                probe_bucketed_history(spark, "stress_hist", sh4)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("dup_vs_index").cast("long")).alias("dup"),
                )
                .collect()[0]
                .asDict()
            ),
            results,
        )
    spark.sql("DROP TABLE IF EXISTS stress_hist")

    # --- MinhashIndex: 2M-doc history of 8-token docs ---
    def mh_docs(n, offset=0, tag="h"):
        return spark.range(n).select(
            (F.col("id") + F.lit(offset)).alias("doc_id"),
            F.concat(
                F.lit("alpha beta gamma "), F.lit(tag),
                (F.col("id") % 50000),
                F.lit(" delta epsilon zeta "), F.col("id") + F.lit(offset),
            ).alias("text"),
        )

    mh = MinhashIndex(spark, os.path.join(ROOT, "mh"), bands=16)
    timed(
        f"MinhashIndex seed ({N_MH_HIST/1e6:.0f}M docs x 16 bands)",
        lambda: mh.update(mh_docs(N_MH_HIST)).count() and None,
        results,
    )
    timed(
        f"minhash probe ({N_MH_SHARD/1e3:.0f}k shard vs history)",
        lambda: str(
            mh.update(mh_docs(N_MH_SHARD, N_MH_HIST, tag="h"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("near_dup_candidate").cast("long")).alias("cand"),
            )
            .collect()[0]
            .asDict()
        ),
        results,
    )
    timed("minhash compact", lambda: str(mh.compact()), results)

    print("\n| stage | wall (s) | detail |")
    print("|---|---|---|")
    for name, wall, extra in results:
        print(f"| {name} | {wall:.1f} | {extra or ''} |")
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
