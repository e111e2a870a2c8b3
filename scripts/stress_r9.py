#!/usr/bin/env python
"""Round-9 stress, two measurements the r08 verdict asked for:

1. TRAINED IVF CODEBOOK vs the first-N convention on CLUSTERED
   vectors (VERDICT r08 item 3). The r08 isotropic result (nprobe=2
   -> 0.9-1.0 recall) is the easy case: with no structure, any cell
   split is as good as any other. A real pipeline's embeddings are
   clustered, and there the first-N codebook degrades (its centroids
   are wherever the first N vectors happened to land) while a trained
   codebook routes each cluster to its own cell. We plant G isotropic
   Gaussian clusters, train with clustering.kmeans_lloyd through
   similarity.train_ivf_codebook, and record (recall@k, mean n_cand)
   per (codebook, nprobe) — n_cand IS the per-query scan cost once
   cells are partition-pruned files.

2. EVALUATION FAMILY AT ITS CARDINALITY BOUND (VERDICT r08 item 6).
   roc_auc / pr_curve argue their single-partition cumulative windows
   are safe because the grouped-by-score table is bounded at ~1e6 rows
   by the 6-decimal rounding. Measure the bound instead of arguing it:
   N_EVAL corpus rows with exactly 1e6 distinct 6-decimal scores, so
   the window stage runs at its worst legal size while the corpus
   aggregate upstream does the real work. Reported: end-to-end time
   plus the grouped-table row count the window actually saw.

Sizes env-overridable for smoke runs: STRESS_VECS (default 200k),
STRESS_DIM (32), STRESS_CLUSTERS (16), STRESS_EVAL_ROWS (100M).
Output: markdown tables for PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.operators.evaluation import pr_curve, roc_auc  # noqa: E402
from seriesly_spark.operators.similarity import (  # noqa: E402
    ann_ivf_recall,
    train_ivf_codebook,
)
from seriesly_spark.session import get_spark  # noqa: E402

N_VECS = int(os.environ.get("STRESS_VECS", 200_000))
DIM = int(os.environ.get("STRESS_DIM", 32))
G = int(os.environ.get("STRESS_CLUSTERS", 16))
N_EVAL = int(os.environ.get("STRESS_EVAL_ROWS", 100_000_000))
N_QUERIES = 32
K = 10
WORK = os.environ.get("STRESS_DIR", "/tmp/seriesly-stress-r9")


def clustered_vectors(spark):
    """G well-separated Gaussian-ish clusters on deterministic hashes.

    Cluster centers sit at 8 * one-hot-ish directions (center g points
    along dims (g, g+1) of the DIM-cube); members jitter each dim with
    a +-1 hash noise. Ids are BLOCK-ordered (ids [g*N/G, (g+1)*N/G)
    all in cluster g) — the source-ordered ingestion every real corpus
    has, and the layout that exposes both id-prefix conventions: the
    first-N codebook AND kmeans' smallest-ids seeding draw everything
    from cluster 0. (A round-robin id layout was measured first and is
    the trivial case: first-N lands one seed per cluster and already
    probes at recall 1.0.)
    """
    ids = spark.range(N_VECS).select(F.col("id").alias("vec_id"))
    g = (F.col("vec_id") / (N_VECS // G)).cast("int")
    dims = []
    for d in range(DIM):
        center = (
            F.when((g % DIM) == d, F.lit(8.0))
            .when(((g + 1) % DIM) == d, F.lit(6.0))
            .otherwise(F.lit(0.0))
        )
        # Spark's % is signed; (h % m + m) % m maps to [0, m) so the
        # jitter is the documented symmetric ±1 range.
        noise = (
            ((F.xxhash64(F.col("vec_id"), F.lit(d)) % 2001 + 2001) % 2001)
            / 1000.0
            - 1.0
        )
        dims.append((center + noise).cast("float"))
    return ids.select("vec_id", F.array(*dims).alias("embedding"))


def bench_ivf(spark, results):
    vecs = clustered_vectors(spark)
    path = os.path.join(WORK, "vecs.parquet")
    vecs.write.mode("overwrite").parquet(path)
    vecs = spark.read.parquet(path)
    # two probe queries per cluster (block-ordered ids: a plain
    # range(N_QUERIES) would sample ONLY cluster 0)
    stride = N_VECS // G
    queries = [g * stride + off for g in range(G)
               for off in (7, stride // 2)]

    codebooks: dict[str, object] = {"first-N": None}
    for init in ("ids", "hash"):
        t0 = time.perf_counter()
        cb = train_ivf_codebook(
            vecs, n_centroids=G, iterations=3, init=init
        )
        n_cells = cb.count()
        results.append((
            f"train_ivf_codebook (G={G}, 3 rounds, init={init})",
            time.perf_counter() - t0,
            f"cells_surviving={n_cells}/{G}",
        ))
        codebooks[f"trained-{init}"] = cb
    for label, cb in codebooks.items():
        for nprobe in (1, 2, 4):
            t0 = time.perf_counter()
            rows = ann_ivf_recall(
                vecs,
                queries,
                n_centroids=G,
                k=K,
                nprobe=nprobe,
                codebook=cb,
            ).collect()
            dt = time.perf_counter() - t0
            rec = sum(r["recall"] for r in rows) / len(rows)
            cand = sum(r["n_cand"] for r in rows) / len(rows)
            results.append((
                f"ivf {label} nprobe={nprobe}",
                dt,
                f"recall={rec:.3f} mean_n_cand={cand:,.0f} "
                f"({100.0 * cand / N_VECS:.1f}% of corpus)",
            ))


def bench_eval_bound(spark, results):
    # exactly 1e6 distinct 6-decimal scores in [0, 1); labels ~40% pos,
    # fully deterministic. The grouped table the window sees is 1e6
    # rows NO MATTER the corpus size — the documented bound.
    n_distinct = 1_000_000
    scored = spark.range(N_EVAL).select(
        (F.round((F.xxhash64("id") % n_distinct + n_distinct)
                 % n_distinct / n_distinct, 6)).alias("score"),
        ((F.xxhash64("id", F.lit(1)) % 5 + 5) % 5 < 2).alias("label"),
    )
    t0 = time.perf_counter()
    row = roc_auc(scored).collect()[0]
    dt = time.perf_counter() - t0
    results.append((
        f"roc_auc @ {N_EVAL:,} rows x 1e6 distinct scores",
        dt,
        f"n_pos={row['n_pos']:,} n_neg={row['n_neg']:,} auc={row['auc']}",
    ))
    t0 = time.perf_counter()
    n_thresholds = pr_curve(scored).count()
    dt = time.perf_counter() - t0
    results.append((
        f"pr_curve @ {N_EVAL:,} rows",
        dt,
        f"threshold_rows={n_thresholds:,} (the bounded window input)",
    ))


def main():
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("stress-r9", cpus=32, shuffle_partitions=64)
    results: list[tuple[str, float, str]] = []
    bench_ivf(spark, results)
    bench_eval_bound(spark, results)
    print("\n| step | sec | detail |")
    print("|---|---|---|")
    for name, dt, detail in results:
        print(f"| {name} | {dt:.1f} | {detail} |")


if __name__ == "__main__":
    main()
