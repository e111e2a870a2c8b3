"""Fixed-iteration Lloyd k-means over an embedding column — the
clustering primitive behind semantic dedup / corpus curation and the
trainer for the IVF codebook (operators/similarity.ivf_assign consumes
exactly this output shape).

Iteration count is a fixed parameter, not a convergence loop: the plan
unrolls deterministically (oracle-reproducible, no data-dependent control
flow), which is also how production pipelines run it (a few Lloyd rounds
on a sample, then freeze the codebook).

Numeric discipline (cross-engine bit-stability): squared-euclidean
distances accumulate per-element double products as DECIMAL(38,18)
(order-independent, same as the cosine family); per-(cluster, dim) means
divide a decimal-exact sum by the member count — intermediates are never
rounded, only the final centroid output is (round 6); argmin ties break
on the lowest centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.util import scoped_persist

from seriesly_spark.operators.similarity import _DEC, _dec_sum


def _sqdist(a, b) -> "F.Column":
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (
            (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ).cast(_DEC),
    )
    return _dec_sum(diffs)


def kmeans_lloyd(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "ids",
) -> DataFrame:
    """Run ``iterations`` Lloyd rounds with deterministic init (the
    vectors with the ``k`` smallest ids seed the codebook, cluster id =
    seed id — ``orderBy(id).limit(k)``, so sparse / non-zero-based id
    spaces still yield exactly k seeds). Returns the trained codebook
    with membership: (cluster, dim, centroid, n_members).

    A cluster that loses every member drops out of later rounds (its
    mean is undefined); the codebook may therefore end with fewer than
    ``k`` clusters. That matches textbook Lloyd — re-seeding empties is
    a policy choice left to the caller.

    ``init="hash"`` seeds with the k smallest ``xxhash64(id)`` values
    instead (ids tie-break) — still fully deterministic, but robust to
    id ORDER: on a source-ordered corpus the k smallest ids all come
    from the first source's cluster and Lloyd can take many rounds to
    escape (or drop clusters entirely); hashing spreads the seeds
    uniformly over the corpus regardless of layout, the deterministic
    stand-in for random init (measured in scripts/stress_r9.py: on a
    16-cluster block-ordered corpus, 3 rounds with id-seeds leave the
    codebook degenerate while hash-seeds recover every cluster).

    Plan per round: the k-row centroid table broadcasts onto ONE corpus
    scan (|corpus| x k candidate rows never shuffle — the argmin
    ``min_by`` collapses them map-side in the per-vector aggregate);
    the mean recompute posexplodes to (cluster, dim, value) but partial
    aggregation reduces each task's output to k x dim rows before its
    shuffle. The corpus projection is persisted once and re-read per
    round — at 100 TB this is the standard cache-the-sample pattern
    (train on a sample; the full-corpus pass is the final assignment).
    The tiny per-round centroid table is eagerly ``localCheckpoint``-ed,
    so round N's plan starts from materialized k x dim rows instead of
    embedding rounds 1..N-1 — cost is linear in ``iterations`` and the
    unrolled plan stays flat.
    """
    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    if init not in ("ids", "hash"):
        raise ValueError(f"init must be 'ids' or 'hash', got {init!r}")
    v = scoped_persist(
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        "clustering.kmeans_v",
    )
    seed_order = (
        v.orderBy(F.xxhash64(F.col("id")), "id")
        if init == "hash"
        else v.orderBy("id")
    )
    centroids = seed_order.limit(k).select(
        F.col("id").alias("cid"),
        F.transform("v", lambda x: x.cast("double")).alias("cv"),
    )
    assigned = None
    means = None
    for it in range(iterations):
        scored = v.crossJoin(F.broadcast(centroids)).select(
            "id", "v", "cid", _sqdist(F.col("v"), F.col("cv")).alias("__d")
        )
        assigned = scored.groupBy("id").agg(
            F.min_by(
                F.struct(F.col("v").alias("v"), F.col("cid").alias("cid")),
                F.struct(F.col("__d").alias("d"), F.col("cid").alias("c")),
            ).alias("__b")
        ).select("id", F.col("__b.v").alias("v"), F.col("__b.cid").alias("cid"))
        # (The final assignment feeds both the mean recompute and the
        # membership counts, but the identical aggregate subplans share
        # one physical exchange via ReusedExchange — measured: an
        # explicit persist+count here is a net LOSS of ~0.3 s.)
        ex = assigned.select("cid", F.posexplode("v").alias("dim", "val"))
        means = ex.groupBy("cid", "dim").agg(
            (
                F.sum(F.col("val").cast("double").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("mean")
        )
        centroids = means.groupBy("cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "mean"))),
                lambda s: s.getField("mean"),
            ).alias("cv")
        )
        if it < iterations - 1:  # last round's codebook is never re-joined
            # Truncate lineage: round N starts from materialized k x dim
            # rows, not the unrolled plan of rounds 1..N-1.
            centroids = centroids.localCheckpoint(eager=True)
    counts = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        means.join(counts, "cid")
        .select(
            F.col("cid").alias("cluster"),
            "dim",
            F.round("mean", 6).alias("centroid"),
            "n_members",
        )
    )


def pca_power_iteration(
    vectors: DataFrame,
    iterations: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top principal component of an embedding corpus, certified — the
    "is one direction dominating the representation space" screen (a
    collapsed embedding model concentrates variance in one eigenvalue)
    and the first step of PCA whitening.

    Scale shape: ALL corpus-sized work is ONE scan. An Arrow-batched
    ``mapInPandas`` computes per-partition Gram partials X^T X + column
    sums with numpy (C-speed dgemm — the JVM expression equivalent is a
    d^2-per-row explode, measured 10x slower), emitting d rows of d
    doubles per partition; a second (decimal-exact, SQL-replayable)
    aggregate produces the per-axis moments. The d x d covariance
    sketch — ~4 KB at d=64, O(d^2) NOT O(corpus), the same
    sketch-to-driver boundary as rate.py's O(partitions) stitch — is
    collected and power-iterated in numpy (iterations are free there:
    no per-round corpus scans, no per-round Spark jobs; the matrix-free
    per-round-scan variant only wins when d is too large to
    materialize d^2, ~d > 10^4).

    Returns one row: (n, dim, total_var, lambda_ratio_ok, resid_ok,
    lambda_le_total). total_var = Σ_d Var_pop(axis d) is decimal-
    accumulated in Spark (exactly SQL-replayable); the booleans certify
    the eigenpair in-engine: Rayleigh quotient λ within
    [0.95 × max-axis-variance, trace × (1+1e-9)] (λ1 dominates every
    diagonal entry; λ1 ≤ trace) and residual ‖Av − λv‖ ≤ 5% of λ
    (measured ≤0.5% at 100 rounds on the near-degenerate synthetic
    spectra, 10x margin).
    """
    from typing import Iterator as _It

    import numpy as _np
    import pandas as _pd

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # persisted: the Gram scan and the decimal moments aggregate both
    # consume the cast projection — without this each pays its own
    # parquet scan + per-element double cast (measured 27.5 -> ~17 s
    # at 200k x 32, scripts/stress_r5.py)
    x = scoped_persist(
        vectors.select(
            F.transform(F.col(vec_col), lambda c: c.cast("double")).alias("x")
        ),
        "clustering.pca_x",
        eager=True,
    )

    def gram(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        S = None
        s1 = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _np.array(list(pdf["x"]), dtype=_np.float64)
            S = X.T @ X if S is None else S + X.T @ X
            s1 = X.sum(0) if s1 is None else s1 + X.sum(0)
            n += len(X)
        if S is None:
            return
        yield _pd.DataFrame(
            {
                "i": range(S.shape[0]),
                "row": list(S),
                "sx": s1,
                "cnt": n,
            }
        )

    parts = x.mapInPandas(
        gram, "i long, row array<double>, sx double, cnt long"
    ).collect()
    # decimal-exact per-axis moments (SQL parity for n/dim/total_var)
    ex = x.select(F.posexplode("x").alias("dim", "val"))
    mom = (
        ex.groupBy("dim")
        .agg(
            F.sum(F.col("val").cast(_DEC)).alias("s1"),
            F.sum((F.col("val") * F.col("val")).cast(_DEC)).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            (
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double")
                    * F.col("s1").cast("double")
                    / F.col("n")
                )
                / F.col("n")
            ).alias("var")
        )
        .agg(
            F.round(
                F.sum(F.col("var").cast(_DEC)).cast("double"), 6
            ).alias("total_var"),
            F.max("var").alias("max_axis_var"),
        )
        .collect()[0]
    )
    spark = vectors.sparkSession
    # n = Σ over distinct partition blocks; each block repeats cnt on
    # every of its d rows, so sum cnt over rows where i == 0.
    n = int(sum(p["cnt"] for p in parts if p["i"] == 0))
    d = int(max(p["i"] for p in parts) + 1) if parts else 0
    if n == 0 or d == 0:
        return spark.createDataFrame(
            [(0, 0, 0.0, False, False, False)],
            "n long, dim long, total_var double, lambda_ratio_ok boolean, "
            "resid_ok boolean, lambda_le_total boolean",
        )
    S = _np.zeros((d, d))
    s1 = _np.zeros(d)
    for p in parts:
        S[p["i"]] += _np.asarray(p["row"])
    # sx repeats the partition's full per-axis sum vector element i at
    # row i — accumulate one element per row.
    for p in parts:
        s1[p["i"]] += p["sx"]
    mu = s1 / n
    A = S / n - _np.outer(mu, mu)
    v = _np.ones(d) / _np.sqrt(d)
    for _ in range(iterations):
        av = A @ v
        nrm = _np.linalg.norm(av)
        if nrm == 0.0:
            break
        v = av / nrm
    av = A @ v
    lam = float(v @ av)
    resid = float(_np.linalg.norm(av - lam * v))
    total_var = float(mom["total_var"])
    max_axis_var = float(mom["max_axis_var"])
    return spark.createDataFrame(
        [
            (
                n,
                d,
                total_var,
                bool(lam >= 0.95 * max_axis_var),
                bool(resid <= 0.05 * lam),
                bool(lam <= total_var * (1.0 + 1e-9) + 1e-9),
            )
        ],
        "n long, dim long, total_var double, lambda_ratio_ok boolean, "
        "resid_ok boolean, lambda_le_total boolean",
    )


def silhouette_report(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Simplified silhouette score per cluster — the clustering-quality
    gate for a trained codebook (semantic dedup blast radius, IVF cell
    geometry): for each vector, a = cosine distance to its OWN (best)
    centroid, b = distance to the nearest OTHER centroid, and
    s = (b - a) / max(a, b) in [0, 1] here since a <= b by
    construction. The full silhouette's per-point pairwise means are
    corpus-quadratic; the simplified form (centroid distances only) is
    the textbook O(n*k) surrogate and the only one that survives 100 TB.

    Shape: the ivf_assign pattern — broadcast k-row codebook, per-row
    round-6 cosines (decimal-accumulated dot/norms), ONE hash aggregate
    per vector id collecting the k sims (k is codebook-sized, bounded),
    own cluster via max_by(struct(sim, -cid)) (ivf_assign's exact
    tie-break). Both distances derive from the sorted sim list's top
    two entries, so ties in the argmax cannot change the VALUE of s.
    Per-vector s is rounded to 6 then decimal-summed per cluster (the
    rank_metrics DCG pattern: a float mean over corpus-many terms is
    order-dependent; the decimal fold is not).

    Output: one row per cluster (cluster, n, mean_sil) plus a global
    row with cluster = -1, ordered by cluster. Requires k >= 2
    centroids. Empty clusters (centroids no vector chose) emit no row
    — ivf_cell_purity is the dense-grid view.
    """
    from seriesly_spark.operators.similarity import dot, norm2
    from seriesly_spark.operators.util import spread

    if centroids.limit(2).count() < 2:  # k-row frame: a metadata action
        raise ValueError(
            "silhouette_report needs >= 2 centroids: with one cell "
            "there is no 'nearest other' distance and s is undefined"
        )
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("__cid"),
            F.col(vec_col).alias("__cv"),
            norm2(F.col(vec_col)).alias("__cn2"),
        )
    )
    scored = (
        spread(vectors)
        .withColumn("__n2", norm2(F.col(vec_col)))
        .crossJoin(c)
        .select(
            F.col(id_col).alias("__id"),
            "__cid",
            F.round(
                dot(F.col(vec_col), F.col("__cv"))
                / (F.sqrt(F.col("__n2")) * F.sqrt(F.col("__cn2"))),
                6,
            ).alias("__sim"),
        )
    )
    per = scored.groupBy("__id").agg(
        F.max_by(
            "__cid",
            F.struct(F.col("__sim").alias("s"), (-F.col("__cid")).alias("nc")),
        ).alias("cluster"),
        F.sort_array(F.collect_list("__sim"), asc=False).alias("__ss"),
    )
    # a/b as literal 1.0-minus terms; the oracle mirrors this exact
    # float expression (NOT the algebraic s1 - s2, which can differ in
    # the last ulp and flip a round-6 boundary).
    per = per.select(
        F.col("cluster").cast("bigint").alias("cluster"),
        (F.lit(1.0) - F.element_at("__ss", 1)).alias("__a"),
        (F.lit(1.0) - F.element_at("__ss", 2)).alias("__b"),
    )
    per = scoped_persist(
        per.select(
            "cluster",
            F.when(
                F.col("__b") > 0,
                F.round(
                    (F.col("__b") - F.col("__a")) / F.col("__b"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("__s"),
        ),
        "clustering.silhouette_per_vec",
        eager=True,
    )
    sdec = F.col("__s").cast("decimal(18,6)")
    n = F.count(F.lit(1)).cast("bigint")
    byc = per.groupBy("cluster").agg(
        n.alias("n"),
        F.round(F.sum(sdec).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_sil"
        ),
    )
    allr = per.agg(
        F.lit(-1).cast("bigint").alias("cluster"),
        n.alias("n"),
        F.round(F.sum(sdec).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_sil"
        ),
    )
    return byc.unionByName(allr).orderBy("cluster")
