#!/usr/bin/env python
"""Round-8b stress: the corpus-maintenance batch at production shape —
2M documents / 200k vectors (stress_r4 generator reused).

Correctness at scale is EXACT, not statistical, via planting:

* dup_span — every doc with ``doc_id % 100 == 0`` carries a SHARED
  10-token block at token position 20 inside otherwise doc-unique
  hash-derived text (vocab is per-doc, so nothing else repeats across
  docs). With n=5 the block contributes dup windows at positions
  20..25 which must merge into EXACTLY one span of 10 tokens; every
  other doc must report zero spans. Asserted over the full output.
* snapshot_diff — cur = docs minus every 17th id, every 13th text
  rewritten, every 19th re-added under a shifted id; expected counts
  are closed-form from the id range. Asserted exactly.
* ann pair — 16 query vectors; exact side must return 16*k ranked
  rows (asserted); the LSH side's recall per query is in [0,1] by
  construction and reported for the table.

Sizes env-overridable (STRESS_DOCS / STRESS_VECS) for smoke runs.
Output: markdown table rows for PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from seriesly_spark.session import get_spark  # noqa: E402
from stress_r4 import N_DOCS, N_VECS, ROOT, gen, noop  # noqa: E402


def timed(fn):
    """Run fn() to a noop sink, return (wall_seconds, None)."""
    t0 = time.perf_counter()
    noop(fn())
    return time.perf_counter() - t0, None

from seriesly_spark.operators.dedup import dup_span_stats  # noqa: E402
from seriesly_spark.operators.evaluation import snapshot_diff  # noqa: E402
from seriesly_spark.operators.sampling import mixture_plan  # noqa: E402
from seriesly_spark.operators.similarity import (  # noqa: E402
    ann_lsh_recall,
    ann_topk_multi,
)


def main():
    spark = get_spark("stress-r8b", cpus=32, shuffle_partitions=64)
    os.makedirs(ROOT, exist_ok=True)
    print("generating inputs ...", flush=True)
    _, doc_path, vec_path = gen(spark)
    docs = spark.read.parquet(doc_path)
    vecs = spark.read.parquet(vec_path)
    rows = []

    # ---- dup_span with a planted shared block ---------------------------
    # 20 doc-unique tokens | 10 SHARED tokens (every 100th doc) | 20 more
    # doc-unique tokens. Uniqueness: per-doc tokens hash (doc_id, i) over
    # a huge space, so cross-doc repeats outside the plant are absent.
    uniq = lambda lo, hi: F.transform(
        F.sequence(F.lit(lo), F.lit(hi)),
        lambda i: F.concat(F.lit("u"), F.abs(F.xxhash64(F.col("doc_id"), i))),
    )
    shared = F.array(*[F.lit(f"shared{j}") for j in range(10)])
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.flatten(
                F.array(
                    uniq(0, 19),
                    F.when(F.col("doc_id") % 100 == 0, shared).otherwise(
                        uniq(100, 109)
                    ),
                    uniq(20, 39),
                )
            ),
        ).alias("text"),
    )
    t, _ = timed(lambda: dup_span_stats(planted, n=5))
    rows.append((f"dup_span ({N_DOCS/1e6:g}M docs, 50 tok, planted block)", t))
    agg = (
        dup_span_stats(planted, n=5)
        .groupBy((F.col("doc_id") % 100 == 0).alias("isplant"))
        .agg(
            F.sum("n_spans").alias("spans"),
            F.sum("dup_tokens").alias("dtok"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    byp = {r["isplant"]: r for r in agg}
    n_plant = (N_DOCS + 99) // 100
    assert byp[True]["n"] == n_plant and byp[True]["spans"] == n_plant, byp
    assert byp[True]["dtok"] == 10 * n_plant, byp
    assert byp[False]["spans"] == 0 and byp[False]["dtok"] == 0, byp
    print("dup_span plant check: EXACT", flush=True)

    # ---- snapshot_diff with closed-form expectations --------------------
    cur = docs.where(F.col("doc_id") % 17 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 13 == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    added = docs.where(F.col("doc_id") % 19 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    )
    t, _ = timed(lambda: snapshot_diff(docs, cur.unionByName(added)))
    rows.append((f"snapshot_diff ({N_DOCS/1e6:g}M vs {N_DOCS/1e6:g}M ids)", t))
    got = {
        r["status"]: r["n_docs"]
        for r in snapshot_diff(docs, cur.unionByName(added)).collect()
    }
    ids = range(N_DOCS)
    removed = sum(1 for i in ids if i % 17 == 0)
    # upper() only changes docs whose text has letters — generator text
    # is 'w<digits>' tokens, so upper('w...') != 'w...' always
    changed = sum(1 for i in ids if i % 17 != 0 and i % 13 == 0)
    addedn = sum(1 for i in ids if i % 19 == 0)
    want = {
        "added": addedn,
        "removed": removed,
        "changed": changed,
        "unchanged": N_DOCS - removed - changed,
    }
    assert got == want, (got, want)
    print("snapshot_diff closed-form check: EXACT", flush=True)

    # ---- mixture_plan (trivial agg at any size, but pin the cost) -------
    src = docs.withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 100)
    )
    t, _ = timed(lambda: mixture_plan(src, "source", budget_tokens=10**9))
    rows.append((f"mixture_plan ({N_DOCS/1e6:g}M docs, 100 sources)", t))

    # ---- ann pair at 200k x 32 ------------------------------------------
    qids = list(range(16))
    t, _ = timed(lambda: ann_topk_multi(vecs, qids, k=10))
    rows.append((f"ann_multi_exact ({N_VECS/1e3:g}k x 32, 16 queries)", t))
    n_exact = ann_topk_multi(vecs, qids, k=10).count()
    assert n_exact == 16 * 10, n_exact
    t, _ = timed(
        lambda: ann_lsh_recall(vecs, qids, k=10, planes=32, bands=4, dim=32)
    )
    rows.append((f"ann_lsh_recall ({N_VECS/1e3:g}k x 32, 16 queries)", t))
    rec = ann_lsh_recall(
        vecs, qids, k=10, planes=32, bands=4, dim=32
    ).collect()
    assert len(rec) == 16 and all(0 <= r["recall"] <= 1 for r in rec)
    mean_rec = sum(r["recall"] for r in rec) / len(rec)
    print(f"ann_lsh_recall mean recall@10 = {mean_rec:.3f}", flush=True)

    print("\n| op | seconds |")
    print("|---|---|")
    for name, sec in rows:
        print(f"| {name} | {sec:.1f} |")


if __name__ == "__main__":
    main()
