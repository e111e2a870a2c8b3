#!/usr/bin/env python
"""Round-10b stress: Fleiss' kappa, best-threshold selection, ECE, and
the simplified-silhouette gate at production shape — 100M rating/score
rows for the evaluators, 2M vectors for the silhouette.

Correctness at scale is EXACT, not statistical, via closed form over
the generators' residue grids:

* fleiss_kappa — 3 raters derived from id residues (a = id%5;
  b = (id+1)%5 when id%3==0 else a; c = NULL when id%11==0 else a):
  the (item-config) distribution is a closed-form function of id%165,
  so n_items / n_excluded / p_bar / p_e / kappa are computed exactly
  in Python (pure integers until two divisions) and asserted to the
  operator's 6-decimal rounding.
* best_threshold — 100M rows, EXACTLY 1e6 distinct scores
  (score = round((id%1e6)/1e6, 6), label = id%7==0; 1e6 = 1 mod 7
  makes per-score positive counts closed-form): the full descending
  sweep is replayed in numpy with the same BIGINT masses and round-6
  metrics, argmax + smallest-threshold tie-break asserted equal. This
  also measures the op at the r09 eval-family cardinality bound.
* score ECE — same scored table; per-bin decimal score sums replayed
  with exact integer arithmetic (sum of k over the bin / 1e6), the
  weighted decimal fold replayed term-by-term.
* silhouette_report — 2M planted vectors, d=16: v = e_c + delta *
  e_((c+1)%4) with c = id%4 and delta = ((id*2003)%201 - 100)/1000
  (gcd(2003,201)=1 so the joint (c, delta) grid has period 804). The
  per-id silhouette depends only on the grid cell; the Python replica
  mirrors the operator's EXACT numeric path (per-product double ->
  decimal(38,18) HALF_UP quantize -> exact sum -> double, round-6 via
  shortest-repr HALF_UP) so per-cluster means are asserted to all 6
  decimals.

Sizes env-overridable (STRESS_EVAL_ROWS / STRESS_VECS) for smoke runs.
Output: markdown table rows for PLANS.md.
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.session import get_spark  # noqa: E402
from seriesly_spark.operators.clustering import silhouette_report  # noqa: E402
from seriesly_spark.operators.evaluation import (  # noqa: E402
    best_threshold,
    expected_calibration_error,
    fleiss_kappa,
)

N_EVAL = int(os.environ.get("STRESS_EVAL_ROWS", 100_000_000))
N_VECS = int(os.environ.get("STRESS_VECS", 2_000_000))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    noop(fn())
    return time.perf_counter() - t0


def round6(x: float) -> float:
    """Spark F.round mirror: shortest-repr decimal, HALF_UP at 1e-6."""
    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def main():
    spark = get_spark("stress-r10b", cpus=32, shuffle_partitions=64)
    rows = []

    # ---- fleiss_kappa at 100M ratings ------------------------------------
    n_items = N_EVAL // 3
    rid = F.col("id")
    rater_a = (rid % 5).cast("string")
    rater_b = F.when(rid % 3 == 0, ((rid + 1) % 5)).otherwise(rid % 5).cast(
        "string"
    )
    rater_c = F.when(rid % 11 == 0, F.lit(None).cast("string")).otherwise(
        (rid % 5).cast("string")
    )
    rated = spark.range(n_items).select(
        rid.alias("item"),
        F.explode(F.array(rater_a, rater_b, rater_c)).alias("cat"),
    )
    t = timed(lambda: fleiss_kappa(rated, "item", "cat", raters=3))
    rows.append((f"fleiss_kappa ({3 * n_items / 1e6:g}M ratings, "
                 f"{n_items / 1e6:g}M items)", t))
    got = fleiss_kappa(rated, "item", "cat", raters=3).collect()[0]
    # Closed form over the id % 165 grid (lcm(5, 3, 11)).
    base, rem = divmod(n_items, 165)
    s2 = 0
    kept = 0
    excl = 0
    marg = Counter()
    for r in range(165):
        n_r = base + (1 if r < rem else 0)
        if n_r == 0:
            continue
        a = r % 5
        b = (r + 1) % 5 if r % 3 == 0 else a
        c = None if r % 11 == 0 else a
        cats = [x for x in (a, b, c) if x is not None]
        if len(cats) != 3:
            excl += n_r
            continue
        kept += n_r
        cell = Counter(cats)
        s2 += sum(v * v for v in cell.values()) * n_r
        for k, v in cell.items():
            marg[k] += v * n_r
    cross = sum(v * v for v in marg.values())
    p_bar = (s2 - kept * 3) / (kept * 3 * 2)
    p_e = cross / (float(kept * 3) * float(kept * 3))
    kappa = (p_bar - p_e) / (1.0 - p_e)
    assert got["n_items"] == kept and got["n_excluded"] == excl, got
    assert got["p_bar"] == round6(p_bar), (got["p_bar"], p_bar)
    assert got["p_e"] == round6(p_e), (got["p_e"], p_e)
    assert got["kappa"] == round6(kappa), (got["kappa"], kappa)
    print(f"fleiss_kappa closed-form check: EXACT (kappa={got['kappa']}, "
          f"{excl} ragged items excluded)", flush=True)

    # ---- best_threshold / ECE at 100M rows, 1e6 distinct scores ----------
    M = 1_000_000
    scored = spark.range(N_EVAL).select(
        F.round((F.col("id") % M) / M, 6).alias("score"),
        (F.col("id") % 7 == 0).alias("label"),
    )
    t = timed(lambda: best_threshold(scored))
    rows.append((f"best_threshold ({N_EVAL / 1e6:g}M rows, "
                 f"1e6 distinct scores)", t))
    got_bt = {r.criterion: r for r in best_threshold(scored).collect()}

    t = timed(lambda: expected_calibration_error(scored))
    rows.append((f"score ECE ({N_EVAL / 1e6:g}M rows)", t))
    got_ece = expected_calibration_error(scored).collect()[0]

    # numpy replay: per-score masses are closed-form (1e6 ≡ 1 mod 7, so
    # ids ≡ k mod 1e6 are positive iff (k + j) % 7 == 0 over copies j).
    import numpy as np

    k = np.arange(M, dtype=np.int64)
    c_k = np.full(M, N_EVAL // M, dtype=np.int64)
    c_k[: N_EVAL % M] += 1
    # positives: #{j in [0, c_k) : j ≡ -k (mod 7)}
    r0 = (-k) % 7
    p_k = (c_k - r0 + 6) // 7
    p_k = np.where(r0 < c_k, p_k, 0)
    assert int(p_k.sum()) == (N_EVAL + 6) // 7
    scores = np.round(k / M, 6)
    # descending sweep
    tp = np.cumsum(p_k[::-1])[::-1]
    pp = np.cumsum(c_k[::-1])[::-1]
    pos, n = int(p_k.sum()), int(c_k.sum())
    f1 = np.array([round6(v) for v in (2 * tp).astype(float) / (pos + pp)])
    youden = np.array(
        [
            round6(v)
            for v in tp.astype(float) / pos
            - (pp - tp).astype(float) / (n - pos)
        ]
    )
    def argbest(metric):
        best = metric.max()
        at = np.nonzero(metric == best)[0]
        return float(best), float(scores[at.min()])  # smallest threshold

    bf1, atf1 = argbest(f1)
    bj, atj = argbest(youden)
    assert got_bt["f1"].f1 == bf1 and got_bt["f1"].threshold == atf1, (
        got_bt["f1"], bf1, atf1)
    assert (got_bt["youden"].youden == bj
            and got_bt["youden"].threshold == atj), (got_bt["youden"], bj, atj)
    print(f"best_threshold replay check: EXACT (f1={bf1} @ {atf1}, "
          f"J={bj} @ {atj})", flush=True)

    # ECE replay: bins on floor(score*10) clamped; exact integer score
    # sums (sum of k) divided once, per-bin gaps -> decimal fold.
    bins = np.clip(np.floor(scores * 10).astype(np.int64), 0, 9)
    ece_num = Decimal(0)
    n_tot = 0
    mce = None
    worst = None
    for b in range(10):
        m = bins == b
        nb = int(c_k[m].sum())
        if nb == 0:
            continue
        n_tot += nb
        ksum = int((k[m] * c_k[m]).sum())  # decimal(28,6) sum = ksum/1e6
        mean_score = round6(float(ksum / M) / nb)
        pos_rate = round6(int(p_k[m].sum()) / nb)
        gap = round6(abs(mean_score - pos_rate))
        ece_num += Decimal(nb) * Decimal(repr(gap)).quantize(
            Decimal("0.000001")
        )
        if mce is None or gap > mce:
            mce, worst = gap, b
    ece = round6(float(ece_num) / n_tot)
    assert got_ece["n"] == n_tot and got_ece["n_bins_used"] == 10, got_ece
    assert got_ece["ece"] == ece, (got_ece["ece"], ece)
    assert got_ece["mce"] == mce and got_ece["worst_bin"] == worst, got_ece
    print(f"score ECE replay check: EXACT (ece={ece}, mce={mce} "
          f"@ bin {worst})", flush=True)

    # ---- silhouette_report at 2M planted vectors -------------------------
    D = 16
    c = (F.col("id") % 4).cast("int")
    delta = ((F.col("id") * 2003) % 201 - 100) / 1000
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(D - 1)),
        lambda j: F.when(j == c, F.lit(1.0))
        .when(j == (c + 1) % 4, delta)
        .otherwise(F.lit(0.0)),
    )
    vecs = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )
    cents = spark.createDataFrame(
        [(i, [1.0 if j == i else 0.0 for j in range(D)]) for i in range(4)],
        "centroid_id long, embedding array<double>",
    )
    t = timed(lambda: silhouette_report(vecs, cents))
    rows.append((f"silhouette_report ({N_VECS / 1e6:g}M vecs, d={D}, k=4)",
                 t))
    got_sil = {r.cluster: r for r in silhouette_report(vecs, cents).collect()}

    # Exact replica of the operator's numeric path over the period-804
    # (c, delta) grid.
    def dec18(x: float) -> Decimal:
        return Decimal(x).quantize(
            Decimal("1e-18"), rounding=ROUND_HALF_UP
        )

    def sim6(dot_terms, n2v_terms, n2c: float) -> float:
        dot_d = float(sum((dec18(p) for p in dot_terms), Decimal(0)))
        n2v = float(sum((dec18(p) for p in n2v_terms), Decimal(0)))
        return round6(dot_d / (math.sqrt(n2v) * math.sqrt(n2c)))

    cell_s = {}
    for rid_ in range(804):
        cc = rid_ % 4
        dd = ((rid_ * 2003) % 201 - 100) / 1000
        n2v_terms = [1.0 * 1.0, dd * dd]
        sims = []
        for cid in range(4):
            if cid == cc:
                sims.append(sim6([1.0 * 1.0], n2v_terms, 1.0))
            elif cid == (cc + 1) % 4:
                sims.append(sim6([dd * 1.0], n2v_terms, 1.0))
            else:
                sims.append(sim6([], n2v_terms, 1.0))
        ss = sorted(sims, reverse=True)
        a = 1.0 - ss[0]
        b = 1.0 - ss[1]
        s = round6((b - a) / b) if b > 0 else 0.0
        own = max(range(4), key=lambda i: (sims[i], -i))
        cell_s[rid_] = (own, s)

    sums = defaultdict(lambda: Decimal(0))
    counts = defaultdict(int)
    base, rem = divmod(N_VECS, 804)
    for rid_, (own, s) in cell_s.items():
        n_r = base + (1 if rid_ < rem else 0)
        sums[own] += Decimal(repr(s)).quantize(Decimal("0.000001")) * n_r
        counts[own] += n_r
    g_sum = sum(sums.values(), Decimal(0))
    g_n = sum(counts.values())
    for cl in range(4):
        want = round6(float(sums[cl]) / counts[cl])
        assert got_sil[cl].n == counts[cl], (cl, got_sil[cl], counts[cl])
        assert got_sil[cl].mean_sil == want, (cl, got_sil[cl].mean_sil, want)
    want_g = round6(float(g_sum) / g_n)
    assert got_sil[-1].n == g_n and got_sil[-1].mean_sil == want_g, (
        got_sil[-1], want_g)
    print(f"silhouette replay check: EXACT (global mean_sil={want_g}, "
          f"per-cluster means match to 6 decimals)", flush=True)

    print("\n| op | wall |", flush=True)
    print("|---|---|", flush=True)
    for name, tt in rows:
        print(f"| {name} | {tt:.1f} s |", flush=True)


if __name__ == "__main__":
    main()
