"""Round-12 production-shape stress: KMV overlap at 50M rows, PageRank
at 1M+1 nodes with an EXACT closed form, perceptual-hash dedup at 500k
images, cap_per_group under a 20M-row mega-group.

Run: python scripts/stress_r12.py   (local[32], ~128 GiB heap).
Records go to PLANS.md by hand — this script prints one line per gate.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from seriesly_spark.session import get_spark  # noqa: E402


def gate_kmv(spark) -> None:
    """8 event types x 6.25M distinct users with constructed overlaps:
    type t owns users [t*5M, t*5M + 6.25M) — adjacent types overlap by
    1.25M (J = 1.25/11.25 = 0.111...), non-adjacent are disjoint.
    50M (group, key) rows; k=1024 -> 5-sigma envelope 15.6%."""
    from seriesly_spark.operators.sketches import kmv_overlap

    t0 = time.time()
    n, span = 6_250_000, 5_000_000
    df = (
        spark.range(8 * n)
        .select(
            (F.col("id") / n).cast("int").alias("t"),
            (F.col("id") % n).alias("off"),
        )
        .select(
            F.concat(F.lit("type_"), F.col("t")).alias("g"),
            (F.col("t") * span + F.col("off")).alias("key"),
        )
    )
    out = {
        (r.g_a, r.g_b): r
        for r in kmv_overlap(df, "g", "key", k=1024).collect()
    }
    assert len(out) == 28
    bad = []
    for (ga, gb), r in out.items():
        ta, tb = int(ga[-1]), int(gb[-1])
        true_int = 1_250_000 if abs(ta - tb) == 1 else 0
        true_union = 2 * n - true_int
        if not abs(r.est_a - n) <= 0.156 * n:
            bad.append((ga, gb, "est_a", r.est_a))
        if not abs(r.est_union - true_union) <= 0.156 * true_union:
            bad.append((ga, gb, "union", r.est_union))
        if true_int == 0 and r.est_intersect > 0.03 * n:
            bad.append((ga, gb, "phantom-int", r.est_intersect))
        if true_int > 0 and not abs(r.est_intersect - true_int) <= 0.35 * true_int:
            bad.append((ga, gb, "int", r.est_intersect))
    assert not bad, bad
    print(
        f"kmv_overlap: 50M rows / 8 groups / k=1024 -> 28 pairs all in "
        f"envelope, {time.time() - t0:.1f} s"
    )


def gate_pagerank(spark) -> None:
    """Star graph, 1M leaves -> one hub (hub dangling): the 2-state
    recurrence (hub, leaf) is exact in closed form, so the distributed
    result at 1,000,001 nodes must match it to all 9 rounded digits."""
    from seriesly_spark.operators.graph import pagerank

    t0 = time.time()
    n_leaves = 1_000_000
    n = n_leaves + 1
    edges = spark.range(1, n).select(
        F.col("id").alias("src"), F.lit(0).alias("dst")
    )
    nodes = spark.range(n).select(F.col("id").alias("node"))
    out = pagerank(edges, nodes, iterations=5)
    hub = out.where(F.col("node") == 0).collect()[0].rank
    leaves = (
        out.where(F.col("node") != 0)
        .groupBy("rank")
        .count()
        .collect()
    )
    # python replay (same damping/base arithmetic; decimal sums are
    # exact so plain fp replay of the 2-state system matches)
    d = 0.85
    rh = rl = 1.0 / n
    for _ in range(5):
        contrib = n_leaves * (rl / 1)  # all leaves point at the hub
        m = rh  # the hub dangles
        rh_new = (1.0 - d) / n + d * (contrib + m / n)
        rl_new = (1.0 - d) / n + d * (0.0 + m / n)
        rh, rl = rh_new, rl_new
    assert hub == round(rh, 9), (hub, rh)
    assert len(leaves) == 1 and leaves[0]["count"] == n_leaves
    assert leaves[0]["rank"] == round(rl, 9), (leaves[0]["rank"], rl)
    print(
        f"pagerank: star 1M+1 nodes, 5 iters -> EXACT closed-form match "
        f"(hub={hub}, leaf={leaves[0]['rank']}), {time.time() - t0:.1f} s"
    )


def gate_phash(spark) -> None:
    """500k manufactured 32x32 images over 1000 planted classes (the
    dense-spectrum construction, classes keyed id % 1000): the full
    decode -> DCT -> hash -> cluster path must recover exactly 1000
    clusters of exactly 500."""
    import hashlib

    import numpy as np
    import pandas as pd

    from seriesly_spark.operators.multimodal import (
        _dct_matrix,
        encode_ppm,
        phash_dedup,
    )

    t0 = time.time()
    n, classes = 500_000, 1000

    def make(batches):
        m = _dct_matrix(32)
        cache = {}

        def img(res):
            if res not in cache:
                g = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        if (u, v) == (0, 0):
                            continue
                        b = hashlib.md5(f"s12|{res}|{u}|{v}".encode()).digest()[0]
                        g[u, v] = (2.0 + b % 16) * (1.0 if b >= 128 else -1.0)
                ideal = m[:8, :].T @ g @ m[:8, :]
                base = 128 + ideal * (90.0 / np.abs(ideal).max())
                cache[res] = np.round(
                    np.stack([base + 5 * c for c in range(3)], axis=2)
                ).clip(0, 255).astype(np.uint8)
            return cache[res]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["id"],
                    "payload": [
                        encode_ppm(img(int(d) % classes)) for d in pdf["id"]
                    ],
                }
            )

    imgs = spark.range(n).repartition(64).mapInPandas(
        make, "doc_id long, payload binary"
    )
    got = (
        phash_dedup(imgs)
        .groupBy("rep_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy("sz")
        .count()
        .collect()
    )
    assert len(got) == 1 and got[0]["sz"] == n // classes, got
    assert got[0]["count"] == classes, got
    print(
        f"phash_dedup: 500k images -> EXACT {classes} clusters x "
        f"{n // classes}, {time.time() - t0:.1f} s "
        f"({n / (time.time() - t0):,.0f} img/s end-to-end)"
    )


def gate_cap(spark) -> None:
    """One 20M-row mega-group + 1000 groups of 1000: cap=100 must emit
    exactly 100 + 1000*100 rows, and the mega-group must NOT dominate
    the wall (WindowGroupLimit truncates it map-side)."""
    from seriesly_spark.operators.sampling import cap_per_group

    t0 = time.time()
    mega = spark.range(20_000_000).select(
        F.lit("mega").alias("g"), F.col("id").alias("key")
    )
    small = spark.range(1_000_000).select(
        F.concat(F.lit("g"), (F.col("id") % 1000)).alias("g"),
        (F.col("id") + 30_000_000).alias("key"),
    )
    out = cap_per_group(
        mega.unionByName(small).repartition(64), "g", "key", cap=100
    )
    n = out.count()
    assert n == 100 + 1000 * 100, n
    print(
        f"cap_per_group: 21M rows (20M in one group) cap=100 -> "
        f"{n} rows, {time.time() - t0:.1f} s"
    )


def main() -> None:
    spark = get_spark("stress-r12", cpus=32, shuffle_partitions=64)
    try:
        gate_pagerank(spark)
        gate_cap(spark)
        gate_phash(spark)
        gate_kmv(spark)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
