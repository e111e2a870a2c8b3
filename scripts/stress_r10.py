#!/usr/bin/env python
"""Round-10 stress: the ranking-eval / kappa / winnowing family at
production shape — 2M documents for the winnowing miner, 100M rows for
the evaluators.

Correctness at scale is EXACT, not statistical, via planting /
closed form:

* winnow_overlap — docs are hash-unique EXCEPT planted clone pairs:
  every ``doc_id % 1000 in (0, 1)`` doc derives its 60 tokens from
  ``doc_id // 1000``, so (1000k, 1000k+1) are verbatim clones. With
  min_shared=2 the output must be EXACTLY those pairs, each with
  containment 1.0: random 32-bit fingerprint collisions produce
  ~|fps|^2/2^32 single-fp matches (hundreds of thousands at 2M docs)
  but a second independent collision on the SAME pair has ~1e-7 odds
  — min_shared=2 is the designed noise floor, and the assertion
  proves it holds at production cardinality.
* winnow_stats — same corpus; mean kept-fingerprint density must sit
  near the paper's 2/(w+1) expectation for random text (asserted in
  [0.3, 0.55] for w=4).
* rank_metrics — 1M queries x 100 candidates (100M rows); per-query
  candidate counts and the GLOBAL relevant-doc mass are closed-form
  from the id grid (rel > 0 iff id % 7 == 0): asserted exactly.
* agreement_kappa — raters a = id % 5, b = (id+1) % 5 when
  id % 3 == 0 else a: the contingency table is a closed-form function
  of id % 15, so po/pe/kappa are computed exactly in Python and
  asserted to the operator's 6-decimal rounding.

Sizes env-overridable (STRESS_DOCS / STRESS_EVAL_ROWS) for smoke runs.
Output: markdown table rows for PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.session import get_spark  # noqa: E402
from seriesly_spark.operators.dedup import (  # noqa: E402
    winnow_overlap_pairs,
    winnow_stats,
)
from seriesly_spark.operators.evaluation import (  # noqa: E402
    agreement_kappa,
    rank_metrics,
)

N_DOCS = int(os.environ.get("STRESS_DOCS", 2_000_000))
N_EVAL = int(os.environ.get("STRESS_EVAL_ROWS", 100_000_000))
ROOT = os.environ.get("STRESS_DIR", "/tmp/seriesly-stress-r10")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    noop(fn())
    return time.perf_counter() - t0


def main():
    spark = get_spark("stress-r10", cpus=32, shuffle_partitions=64)
    os.makedirs(ROOT, exist_ok=True)
    rows = []

    # ---- winnowing corpus: unique text + planted clone pairs ------------
    # 60 tokens per doc. Clone members key their tokens off doc_id//1000;
    # everyone else off doc_id — per-doc vocab is hash-huge, so nothing
    # repeats across docs outside the plant.
    print("generating winnow corpus ...", flush=True)
    is_clone = (F.col("id") % 1000) < 2
    seed = F.when(is_clone, (F.col("id") / 1000).cast("long")).otherwise(
        F.col("id") + F.lit(10_000_000_000)
    )
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(59)),
            lambda i: F.concat(F.lit("t"), F.abs(F.xxhash64(seed, i))),
        ),
    )
    doc_path = os.path.join(ROOT, f"docs-{N_DOCS}")
    if not os.path.exists(os.path.join(doc_path, "_SUCCESS")):
        spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"), text.alias("text")
        ).write.mode("overwrite").parquet(doc_path)
    docs = spark.read.parquet(doc_path)

    t = timed(lambda: winnow_stats(docs))
    rows.append((f"winnow_stats ({N_DOCS/1e6:g}M docs, 60 tok)", t))
    dens = winnow_stats(docs).agg(
        F.avg("fp_density").alias("d"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert dens["n"] == N_DOCS
    assert 0.3 <= dens["d"] <= 0.55, dens
    print(f"winnow_stats density check: {dens['d']:.4f} (~2/(w+1)=0.4)",
          flush=True)

    t = timed(lambda: winnow_overlap_pairs(docs, min_shared=2))
    rows.append((f"winnow_overlap ({N_DOCS/1e6:g}M docs, planted clones)", t))
    got = winnow_overlap_pairs(docs, min_shared=2).collect()
    n_pairs = (N_DOCS + 999) // 1000
    want = {(1000 * k, 1000 * k + 1) for k in range((N_DOCS + 999) // 1000)
            if 1000 * k + 1 < N_DOCS}
    assert {(r.a, r.b) for r in got} == want, (
        len(got), len(want),
        sorted({(r.a, r.b) for r in got} - want)[:5],
    )
    assert all(r.containment == 1.0 for r in got)
    print(f"winnow_overlap plant check: EXACT ({len(got)} clone pairs, "
          "no noise pairs survived min_shared=2)", flush=True)

    # ---- rank_metrics at 100M rows --------------------------------------
    n_q = N_EVAL // 100
    runs = spark.range(N_EVAL).select(
        (F.col("id") / 100).cast("long").alias("query_id"),
        F.col("id").alias("doc_id"),
        (F.xxhash64("id") % 1_000_000).alias("score"),
        F.when(F.col("id") % 7 == 0, (F.col("id") % 3 + 1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("rel"),
    )
    t = timed(lambda: rank_metrics(runs, k=10))
    rows.append((f"rank_metrics ({N_EVAL/1e6:g}M rows, {n_q/1e6:g}M queries)",
                 t))
    chk = rank_metrics(runs, k=10).agg(
        F.count(F.lit(1)).alias("nq"),
        F.min("n_docs").alias("lo"),
        F.max("n_docs").alias("hi"),
        F.sum("n_rel").alias("rel_mass"),
    ).collect()[0]
    assert chk["nq"] == n_q and chk["lo"] == 100 and chk["hi"] == 100, chk
    want_rel = (N_EVAL + 6) // 7
    assert chk["rel_mass"] == want_rel, (chk["rel_mass"], want_rel)
    print("rank_metrics grid check: EXACT", flush=True)

    # ---- agreement_kappa at 100M rows -----------------------------------
    rated = spark.range(N_EVAL).select(
        (F.col("id") % 5).cast("string").alias("a"),
        F.when(F.col("id") % 3 == 0, (F.col("id") + 1) % 5)
        .otherwise(F.col("id") % 5)
        .cast("string")
        .alias("b"),
    )
    t = timed(lambda: agreement_kappa(rated, "a", "b"))
    rows.append((f"agreement_kappa ({N_EVAL/1e6:g}M rows)", t))
    got_k = agreement_kappa(rated, "a", "b").collect()[0]
    # Closed form over the id % 15 grid.
    from collections import Counter
    cells = Counter()
    base, rem = divmod(N_EVAL, 15)
    for r in range(15):
        n_r = base + (1 if r < rem else 0)
        a = r % 5
        b = (r + 1) % 5 if r % 3 == 0 else a
        cells[(a, b)] += n_r
    n = sum(cells.values())
    agree = sum(c for (a, b), c in cells.items() if a == b)
    ca = Counter()
    cb = Counter()
    for (a, b), c in cells.items():
        ca[a] += c
        cb[b] += c
    cross = sum(ca[k] * cb[k] for k in set(ca) & set(cb))
    po = agree / n
    pe = cross / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    assert got_k["n"] == n
    assert got_k["po"] == round(po, 6), (got_k["po"], po)
    assert got_k["pe"] == round(pe, 6), (got_k["pe"], pe)
    assert got_k["kappa"] == round(kappa, 6), (got_k["kappa"], kappa)
    print("agreement_kappa closed-form check: EXACT "
          f"(kappa={got_k['kappa']})", flush=True)

    print("\n| op | wall |", flush=True)
    print("|---|---|", flush=True)
    for name, tt in rows:
        print(f"| {name} | {tt:.1f} s |", flush=True)


if __name__ == "__main__":
    main()
