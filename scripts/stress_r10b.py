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
    bt_strength,
    expected_calibration_error,
    fleiss_kappa,
    krippendorff_alpha,
)
from seriesly_spark.operators.similarity import (  # noqa: E402
    embedding_dispersion,
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

    # ---- krippendorff_alpha at 100M ratings (ragged panel) ---------------
    # Same 3-rater rule as the fleiss stress; alpha INCLUDES the
    # id%11 cohort (r=2). Closed form over the id%165 grid.
    t = timed(lambda: krippendorff_alpha(rated, "item", "cat"))
    rows.append((f"krippendorff_alpha ({3 * n_items / 1e6:g}M ratings, "
                 "ragged panel)", t))
    got_a = krippendorff_alpha(rated, "item", "cat").collect()[0]
    base, rem = divmod(n_items, 165)
    by_r = defaultdict(int)
    n_pair = 0
    n_unp = 0
    n_rat = 0
    marg = Counter()
    for r in range(165):
        n_r = base + (1 if r < rem else 0)
        if n_r == 0:
            continue
        a = r % 5
        b = (r + 1) % 5 if r % 3 == 0 else a
        c = None if r % 11 == 0 else a
        cats = [x for x in (a, b, c) if x is not None]
        ri = len(cats)
        if ri < 2:
            n_unp += n_r
            continue
        n_pair += n_r
        n_rat += ri * n_r
        cell = Counter(cats)
        by_r[ri] += (ri * ri - sum(v * v for v in cell.values())) * n_r
        for kk, v in cell.items():
            marg[kk] += v * n_r
    u = float(
        sum(
            (
                Decimal(repr(round6(sr / (ri - 1)))).quantize(
                    Decimal("0.000001")
                )
                for ri, sr in by_r.items()
            ),
            Decimal(0),
        )
    )
    m2 = sum(v * v for v in marg.values())
    e_mass = n_rat * n_rat - m2
    d_o = round6(u / n_rat)
    d_e = round6(float(e_mass) / (float(n_rat) * float(n_rat - 1)))
    alpha = round6(1.0 - u * float(n_rat - 1) / float(e_mass))
    assert got_a["n_items"] == n_pair and got_a["n_unpairable"] == n_unp
    assert got_a["n_ratings"] == n_rat, (got_a["n_ratings"], n_rat)
    assert got_a["d_o"] == d_o, (got_a["d_o"], d_o)
    assert got_a["d_e"] == d_e, (got_a["d_e"], d_e)
    assert got_a["alpha"] == alpha, (got_a["alpha"], alpha)
    print(f"krippendorff closed-form check: EXACT (alpha={alpha}; the "
          f"ragged r=2 cohort participates, {n_unp} unpairable)",
          flush=True)

    # ---- bt_strength at 100M comparisons ---------------------------------
    # 8 players; winner = max(a, b) unless id%5 == 0 (upsets) — the
    # (a, b, upset) triple is a function of id % 280, so the win matrix
    # is closed-form; the MM rounds are replayed exactly in Python.
    n_cmp = N_EVAL
    aa = F.col("id") % 8
    bb = (F.col("id") * 7 + 3) % 8
    up_ = F.col("id") % 5 == 0
    matches = spark.range(n_cmp).where(aa != bb).select(
        F.when(up_, F.least(aa, bb)).otherwise(F.greatest(aa, bb)).alias(
            "winner"
        ),
        F.when(up_, F.greatest(aa, bb)).otherwise(F.least(aa, bb)).alias(
            "loser"
        ),
    )
    t = timed(lambda: bt_strength(matches, iterations=3))
    rows.append((f"bt_strength ({n_cmp / 1e6:g}M comparisons, 8 players)",
                 t))
    got_bt2 = {r.item: r for r in bt_strength(matches, iterations=3).collect()}
    # closed-form win cells over id % 40 (lcm of 8-cycle in (a,b) and 5)
    wl = Counter()
    period = 40
    base, rem = divmod(n_cmp, period)
    for r in range(period):
        n_r = base + (1 if r < rem else 0)
        if n_r == 0:
            continue
        a = r % 8
        b = (r * 7 + 3) % 8
        if a == b:
            continue
        w, l = (min(a, b), max(a, b)) if r % 5 == 0 else (max(a, b),
                                                          min(a, b))
        wl[(w, l)] += n_r
    g2 = Counter()
    wn2 = Counter()
    for (w, l), n_ in wl.items():
        g2[(w, l)] += n_
        g2[(l, w)] += n_
        wn2[w] += n_
    items = sorted({i for i, _ in g2})
    p_py = {i: 1.0 for i in items}
    for _ in range(3):
        newp = {}
        for i in items:
            dsum = sum(
                (
                    Decimal(repr(round6(g2[(i, j)] / (p_py[i] + p_py[j])))
                            ).quantize(Decimal("0.000001"))
                    for j in items
                    if (i, j) in g2
                ),
                Decimal(0),
            )
            d_ = float(dsum)
            if wn2.get(i) and d_ > 0:
                newp[i] = max(round6(wn2[i] / d_), 1e-6)
            else:
                newp[i] = 0.0
        p_py = newp
    s_ = float(
        sum(
            (Decimal(repr(v)).quantize(Decimal("0.000001"))
             for v in p_py.values()),
            Decimal(0),
        )
    )
    k_ = len(items)
    for i in items:
        want = round6(p_py[i] * k_ / s_) if s_ > 0 else 0.0
        assert got_bt2[i].strength == want, (i, got_bt2[i].strength, want)
        assert got_bt2[i].wins == wn2.get(i, 0)
    print("bt_strength MM replay check: EXACT (3 rounds, 8 players, "
          f"top strength={max(r.strength for r in got_bt2.values())})",
          flush=True)

    # ---- embedding_dispersion at 2M vectors -------------------------------
    # Reuses the planted silhouette corpus: per-dim sums are closed-form
    # from the (c, delta) grid.
    t = timed(lambda: embedding_dispersion(vecs))
    rows.append((f"embedding_dispersion ({N_VECS / 1e6:g}M vecs, d={D})", t))
    got_disp = embedding_dispersion(vecs).collect()[0]
    # closed form: per-dim decimal sums over the period-804 grid
    sdim = defaultdict(lambda: Decimal(0))
    s2dim = defaultdict(lambda: Decimal(0))
    base, rem = divmod(N_VECS, 804)
    for rid_ in range(804):
        n_r = base + (1 if rid_ < rem else 0)
        cc = rid_ % 4
        dd = ((rid_ * 2003) % 201 - 100) / 1000
        for dim_, val in ((cc, 1.0), ((cc + 1) % 4, dd)):
            if dim_ == cc and cc == (cc + 1) % 4:
                continue
            sdim[dim_] += dec18(val) * n_r
            s2dim[dim_] += dec18(val * val) * n_r
    # dims 4..15 are all-zero but still emit per-dim rows
    m2_d = float(sum(s2dim.values(), Decimal(0)))
    q_d = float(
        sum(
            (
                Decimal(repr(round6(float(sdim[dim_]) * float(sdim[dim_]))
                             )).quantize(Decimal("0.000001"))
                for dim_ in range(D)
            ),
            Decimal(0),
        )
    )
    n_ = N_VECS
    want_mn = round6(m2_d / n_)
    want_tr = round6(m2_d / n_ - q_d / (float(n_) * float(n_)))
    want_msd = round6(2.0 * (n_ * m2_d - q_d) / (float(n_) * float(n_ - 1)))
    assert got_disp["n"] == n_ and got_disp["dim"] == D, got_disp
    assert got_disp["mean_norm2"] == want_mn, (got_disp["mean_norm2"],
                                               want_mn)
    assert got_disp["trace_cov"] == want_tr, (got_disp["trace_cov"],
                                              want_tr)
    assert got_disp["mean_sq_dist"] == want_msd, (got_disp["mean_sq_dist"],
                                                  want_msd)
    print(f"embedding_dispersion closed-form check: EXACT "
          f"(mean_sq_dist={want_msd})", flush=True)

    # ---- IvfIndex at 2M vectors -------------------------------------------
    # Same planted corpus as the silhouette: the probe answer is
    # closed-form. Query = e_0: probe cells (nprobe=2) are [0, 1]
    # (cos 1.0 to cell 0; 0.0 three-way tie -> smallest cid), and the
    # top-k are the cell-0 members with delta = 0 (sim exactly 1.0),
    # smallest vec_id tie-break — enumerable from the period-804 grid.
    import tempfile as _tf

    from seriesly_spark.operators.vector_index import IvfIndex

    root = _tf.mkdtemp(prefix="stress-ivfidx-")
    cents_d = [
        (i, [1.0 if j == i else 0.0 for j in range(D)]) for i in range(4)
    ]
    cb = spark.createDataFrame(
        cents_d, "centroid_id long, embedding array<double>"
    )
    idx = IvfIndex(spark, f"{root}/idx", codebook=cb)
    t0 = time.perf_counter()
    idx.update(vecs.where(F.col("vec_id") % 2 == 0))
    idx.update(vecs.where(F.col("vec_id") % 2 == 1))
    t_upd = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx.compact()
    t_cmp = time.perf_counter() - t0
    qv = [1.0 if j == 0 else 0.0 for j in range(D)]
    t0 = time.perf_counter()
    got_idx = idx.topk(qv, k=10, nprobe=2).collect()
    t_probe = time.perf_counter() - t0
    rows.append((f"IvfIndex updates ({N_VECS / 1e6:g}M vecs, 2 batches)",
                 t_upd))
    rows.append(("IvfIndex compact (fold into 4 cells)", t_cmp))
    rows.append(("IvfIndex probe (nprobe=2, k=10)", t_probe))
    assert set(idx.probe_cells(qv, nprobe=2)) == {0, 1}
    # expectation via the exact sim6 replica over the period-804 grid:
    # per grid cell the sim to e_0 depends only on (rid%4, delta);
    # rank (sim desc, vec_id) over ids < N_VECS in probed cells.
    grid_sim = {}
    for rid_ in range(804):
        cc = rid_ % 4
        if cc not in (0, 1):
            continue
        dd = ((rid_ * 2003) % 201 - 100) / 1000
        n2v_terms = [1.0 * 1.0, dd * dd]
        dot_terms = [1.0 * 1.0] if cc == 0 else [dd * 1.0]
        grid_sim[rid_] = sim6(dot_terms, n2v_terms, 1.0)
    cand = []
    floor_sim = sorted({s for s in grid_sim.values()}, reverse=True)
    cut = floor_sim[min(10, len(floor_sim)) - 1]
    for rid_, s_ in grid_sim.items():
        if s_ >= cut:
            cand.extend((-s_, i) for i in range(rid_, N_VECS, 804))
    cand.sort()
    want = [(i, -ns) for ns, i in cand[:10]]
    got_pairs = [(r.vec_id, r.cos_sim) for r in got_idx]
    assert got_pairs == want, (got_pairs[:4], want[:4])
    print(f"IvfIndex probe check: EXACT (top-10 replayed from the grid; "
          f"head: {got_pairs[:3]})", flush=True)

    # batched probe: the 4 centroid directions as a query frame — each
    # query's top-10 must equal the single-probe replay for its axis
    # (the grid is symmetric under cluster rotation, so the same
    # per-cell ranking applies with rid%4 == c).
    qdf = spark.createDataFrame(
        [(c, [1.0 if j == c else 0.0 for j in range(D)]) for c in range(4)],
        "query_id long, embedding array<double>",
    )
    t0 = time.perf_counter()
    got_multi = idx.topk_multi(qdf, k=10, nprobe=2).collect()
    t_multi = time.perf_counter() - t0
    rows.append(("IvfIndex topk_multi (4 queries, nprobe=2, k=10)", t_multi))
    by_q = {}
    for r in got_multi:
        by_q.setdefault(r.query_id, []).append((r.vec_id, r.cos_sim))
    for c in range(4):
        # per-axis replica (cheap: 804 cells): for query e_c the probed
        # candidates with nonzero sim are own-cell members (rid%4 == c,
        # dot = 1) and — when probed — the (c-1)%4 cell (dot = delta);
        # every other probed vector sims to exactly 0.0 and can't reach
        # the top-10 against ~N/4 own-cell members.
        gs = {}
        for rid_ in range(804):
            cc = rid_ % 4
            dd = ((rid_ * 2003) % 201 - 100) / 1000
            n2v_terms = [1.0, dd * dd]
            if cc == c:
                gs[rid_] = sim6([1.0], n2v_terms, 1.0)
            elif (cc + 1) % 4 == c:
                gs[rid_] = sim6([dd], n2v_terms, 1.0)
        # probed cells for query e_c: cell c (cos 1) + smallest other
        probe2 = {c, min(x for x in range(4) if x != c)}
        cand_c = []
        fl = sorted({s for rid_, s in gs.items() if rid_ % 4 in probe2},
                    reverse=True)
        cut_c = fl[min(10, len(fl)) - 1]
        for rid_, s_ in gs.items():
            if rid_ % 4 in probe2 and s_ >= cut_c:
                cand_c.extend((-s_, i) for i in range(rid_, N_VECS, 804))
        cand_c.sort()
        want_c = [(i, -ns) for ns, i in cand_c[:10]]
        assert by_q[c] == want_c, (c, by_q[c][:3], want_c[:3])
    print("IvfIndex topk_multi check: EXACT (all 4 query axes replayed)",
          flush=True)

    print("\n| op | wall |", flush=True)
    print("|---|---|", flush=True)
    for name, tt in rows:
        print(f"| {name} | {tt:.1f} s |", flush=True)


if __name__ == "__main__":
    main()
