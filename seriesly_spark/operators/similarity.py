"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exactness baseline: a broadcast of the
query vector against a single scan of the corpus — at 100 TB this is one
pass, no shuffle, and the top-k reduction is a per-partition heap + driver
merge (Spark's sort+limit with partial take).

The scale path is IVF: assign every vector to its nearest centroid once
(broadcast the centroid set), partition/cluster the corpus by
``centroid_id``, and probe only the query's cell(s) — turning top-k into a
partition-pruned scan of ~1/n_cells of the data.

Numeric convention: elementwise products are computed in double (IEEE-
identical everywhere) and accumulated as DECIMAL(38,18) so the reduction is
order-independent — results are bit-stable and oracle-comparable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.util import scoped_persist, spread

_DEC = "decimal(38,18)"


def _dec_sum(arr: Column) -> Column:
    # The merge re-casts to (38,18): Spark widens decimal '+' to (38,17),
    # which would break the accumulator type. The per-step rounding at
    # 1e-18 is far below the engine-comparison rounding (1e-6).
    zero = F.lit(0).cast(_DEC)
    return F.aggregate(arr, zero, lambda acc, x: (acc + x).cast(_DEC)).cast(
        "double"
    )


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    return _dec_sum(prods)


def norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC))
    return F.sqrt(_dec_sum(sq))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def norm2(a: Column) -> Column:
    """Squared L2 norm, decimal-accumulated (cosine denominators hoist this
    out of per-pair work: compute once per vector, join it along)."""
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(_DEC))
    return _dec_sum(sq)


def _with_norm2(
    vectors: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    return vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm2(F.col(vec_col)).alias("n2"),
    )


def ann_topk_cosine(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one corpus vector.

    Plan: broadcast the single query row WITH its norm precomputed
    (inline cosine() would re-derive the query norm once per corpus
    row), one narrow pass computing ``cos_sim``, then global top-k
    (sort+limit → per-partition partial top-k, no full shuffle).
    Deterministic tie-break on (sim desc, id asc).
    """
    q = vectors.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), norm(F.col(vec_col)).alias("__qn")
    )
    sims = (
        vectors.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(
                dot(F.col(vec_col), F.col("__qv"))
                / (norm(F.col(vec_col)) * F.col("__qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def rademacher_weights(planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix (sign-random-projection LSH).

    Entry (p, d) is +1 iff the first hex nibble of md5("p,d") >= 8 — an
    unbiased Rademacher variable that any engine can reproduce, so LSH
    bucket assignments are oracle-comparable. Computed driver-side once
    (planes × dim ints) and shipped as literals: zero runtime hashing.
    """
    return [
        [
            1
            if int(hashlib.md5(f"{p},{d}".encode()).hexdigest()[0], 16) >= 8
            else -1
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def lsh_signature(
    vectors: DataFrame,
    planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "pandas",
) -> DataFrame:
    """Sign-LSH signature: bit p = (w_p · x >= 0), packed into a LONG.

    The signature is the cheap proxy key that replaces O(n²) cosine
    comparisons with equi-joins. The reference semantics (what the DuckDB
    oracle computes) is: per-term cast to DECIMAL(38,18), exact sum, sign.

    ``impl="pandas"`` (default): Arrow-batched numpy — projections are one
    X @ Wᵀ matrix multiply per batch (~1000x less interpreter overhead than
    the expression tree). float64 BLAS can only disagree with the exact
    decimal sign when |projection| is within summation error (~1e-10); any
    entry with |p| < 1e-6 is recomputed with Python Decimal quantized
    exactly like the engines' decimal cast, so signatures stay
    bit-identical across implementations and engines. This is the "drop to
    a vectorized Pandas UDF only where built-ins can't express it
    efficiently" case: Spark's higher-order array functions are interpreted
    per element, and 32 planes x 64 dims of BigDecimal per row dominated
    whole queries.

    ``impl="expr"``: the pure-expression JVM path (no Python workers) —
    used to cross-check the pandas path and wherever Python workers are
    undesirable.
    """
    w = rademacher_weights(planes, dim)
    vectors = spread(vectors)
    if impl == "pandas":
        return _lsh_signature_pandas(vectors, w, planes, id_col, vec_col)
    # The weight matrix rides as broadcast DATA (one row), not as plan
    # literals: 32 planes x 64 literals plus per-plane lambda trees made
    # Catalyst analysis itself a multi-second cost per query. One small
    # expression over w[p] keeps the plan tiny; the cross join is a 1-row
    # broadcast.
    wdf = vectors.sparkSession.createDataFrame(
        [([[float(x) for x in row] for row in w],)], "__w array<array<double>>"
    )
    sig = F.expr(
        f"""aggregate(sequence(0, {planes - 1}), cast(0 as bigint),
          (acc, p) -> acc + IF(
            cast(aggregate(
              zip_with({vec_col}, __w[p],
                       (x, s) -> cast(cast(x as double) * s as {_DEC})),
              cast(0 as {_DEC}),
              (a, b) -> cast(a + b as {_DEC})) as double) >= 0,
            shiftleft(cast(1 as bigint), p), cast(0 as bigint)))"""
    )
    return (
        vectors.crossJoin(F.broadcast(wdf))
        .select(F.col(id_col), sig.alias("lsh_sig"))
    )


def _lsh_signature_pandas(
    vectors: DataFrame,
    w: list[list[int]],
    planes: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    import numpy as np
    import pandas as pd
    from typing import Iterator

    wt = [list(col) for col in zip(*w)]  # dim x planes, plain lists (picklable)

    def compute(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from decimal import ROUND_HALF_UP, Decimal

        W = np.asarray(wt, dtype=np.float64)  # dim x planes
        q18 = Decimal(1).scaleb(-18)

        def exact_bit(vec: np.ndarray, plane: int) -> bool:
            # Mirror the engines exactly: term = double product (exact for
            # w = ±1), cast to DECIMAL(38,18) (HALF_UP), exact sum, >= 0.
            s = Decimal(0)
            for x, wv in zip(vec, W[:, plane]):
                s += Decimal(float(x) * float(wv)).quantize(q18, ROUND_HALF_UP)
            return s >= 0

        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            P = X @ W  # n x planes
            bits = P >= 0
            ni, npl = np.nonzero(np.abs(P) < 1e-6)
            for i, p in zip(ni, npl):
                bits[i, p] = exact_bit(X[i], p)
            sig = (bits.astype(np.int64) << np.arange(planes, dtype=np.int64)).sum(
                axis=1
            )
            yield pd.DataFrame({id_col: pdf[id_col], "lsh_sig": sig})

    src = vectors.select(id_col, vec_col)
    return src.mapInPandas(compute, f"{id_col} long, lsh_sig long")


def _band_chunks(planes: int, bands: int, sig_col: str = "lsh_sig") -> list[Column]:
    width = planes // bands
    mask = (1 << width) - 1
    return [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col(sig_col), i * width)
            .bitwiseAND(F.lit(mask))
            .alias("chunk"),
        )
        for i in range(bands)
    ]


def cosine_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    planes: int = 32,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the 100 TB path).

    Candidates = pairs agreeing on at least one LSH band (equi-join on
    (band, chunk) — never a cross product); survivors = exact cosine >=
    threshold. Near-identical vectors disagree on a plane with prob θ/π,
    so banding keeps recall high; 8-bit bands keep *random* collisions at
    ~n²/512 instead of n²/32 (4-bit) — band width, not band count, is the
    candidate-volume knob. Norms are computed once per vector and joined
    along, so per-candidate work is one dot product.
    Output: a, b, round(cos_sim, 6) with a < b.
    """
    vectors = spread(vectors)
    sig = lsh_signature(vectors, planes, dim, id_col, vec_col)
    v = scoped_persist(
        _with_norm2(vectors, id_col, vec_col), "similarity.cosine_norms"
    )
    # The plane-projection is the expensive subtree; the self-join reads
    # it twice — persist one (id, band, chunk) copy (three longs per
    # row). LAZY by the measured A/B (PLANS.md): eager's two count
    # passes cost more than the warm-cache hit CacheManager already
    # provides; scoped_persist (vs the old bare persist) adds the
    # one-live-copy lifecycle so the blocks stop leaking across a long
    # gate run.
    banded = scoped_persist(
        sig.select(
            F.col(id_col).alias("id"),
            F.explode(F.array(*_band_chunks(planes, bands))).alias("bc"),
        ).select("id", "bc.band", "bc.chunk"),
        "similarity.cosine_banded",
    )
    cand = (
        banded.select(F.col("id").alias("a"), "band", "chunk")
        .join(banded.select(F.col("id").alias("b"), "band", "chunk"), ["band", "chunk"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb"))
        / (F.sqrt(F.col("n2a")) * F.sqrt(F.col("n2b"))),
        6,
    )
    scored = (
        cand.join(
            v.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n2").alias("n2a")),
            "a",
        )
        .join(
            v.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n2").alias("n2b")),
            "b",
        )
        .select("a", "b", cos.alias("cos_sim"))
    )
    return scored.where(F.col("cos_sim") >= F.lit(threshold))


def ann_topk_lsh(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    planes: int = 32,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors sharing >= 1 LSH band with the
    query (bucket probe ≙ partition-pruned scan at scale), exact cosine on
    the candidates. Returns (vec_id, cos_sim) — approximate by design; the
    oracle replicates the identical bucketing so results still compare
    exactly."""
    sig = lsh_signature(vectors, planes, dim, id_col, vec_col)
    # Probe side and corpus side both read the signatures — persist so the
    # plane projections run once (see cosine_near_dup_pairs; scoped for
    # the one-live-copy lifecycle).
    banded = scoped_persist(
        sig.select(
            F.col(id_col).alias("id"),
            F.explode(F.array(*_band_chunks(planes, bands))).alias("bc"),
        ).select("id", "bc.band", "bc.chunk"),
        "similarity.lsh_banded",
    )
    qb = F.broadcast(
        banded.where(F.col("id") == query_id).select("band", "chunk")
    )
    cand = (
        banded.where(F.col("id") != query_id)
        .join(qb, ["band", "chunk"])
        .select("id")
        .distinct()
    )
    q = F.broadcast(
        vectors.where(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("__qv")
        )
    )
    sims = (
        cand.join(vectors, cand["id"] == vectors[id_col])
        .crossJoin(q)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
        )
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_topk(
    vectors: DataFrame,
    n_centroids: int = 8,
    query_id: int = 0,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end IVF probe: the first ``n_centroids`` corpus vectors act as
    the (deterministic) coarse codebook, every vector is assigned to its
    max-cosine centroid, and the query scans only its own cell. Output:
    (vec_id, cos_sim) top-k within the query's cell, query excluded."""
    centroids = vectors.where(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    )
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    qrow = assigned.where(F.col(id_col) == query_id)
    q = F.broadcast(
        qrow.select(
            F.col(vec_col).alias("__qv"), F.col("centroid_id").alias("__qc")
        )
    )
    cell = assigned.crossJoin(q).where(
        (F.col("centroid_id") == F.col("__qc")) & (F.col(id_col) != query_id)
    )
    sims = cell.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (broadcast join +
    per-row argmax; tie-break lowest centroid id). At scale, write the
    result partitioned by ``centroid_id`` — probes become partition-pruned
    scans."""
    # Norms hoisted out of the |vectors| × |centroids| pair loop: corpus
    # norms once per row (same narrow stage), centroid norms once total
    # (inside the broadcast build).
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("__cid"),
            F.col(vec_col).alias("__cv"),
            norm2(F.col(vec_col)).alias("__cn2"),
        )
    )
    scored = (
        spread(vectors).withColumn("__n2", norm2(F.col(vec_col)))
        .crossJoin(c)
        .select(
            id_col,
            vec_col,
            "__cid",
            F.round(
                dot(F.col(vec_col), F.col("__cv"))
                / (F.sqrt(F.col("__n2")) * F.sqrt(F.col("__cn2"))),
                6,
            ).alias("__sim"),
        )
    )
    # Single-shuffle argmax: max_by over (sim, -cid) ≡ sim desc, cid asc —
    # carries the vector along, so no distinct + re-join second shuffle.
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col(vec_col).alias("v"), F.col("__cid").alias("cid")),
            F.struct(F.col("__sim").alias("s"), (-F.col("__cid")).alias("nc")),
        ).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.v").alias(vec_col),
        F.col("__best.cid").alias(centroid_id_col),
    )


def train_ivf_codebook(
    vectors: DataFrame,
    n_centroids: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "ids",
) -> DataFrame:
    """Train the IVF coarse codebook with ``clustering.kmeans_lloyd``
    and reshape the (cluster, dim, centroid) rows to one
    (centroid_id, vector) row per cell — the production codebook the
    first-``n_centroids``-vectors convention stands in for in the
    deterministic gates. Centroid values are the round-6 trained means
    (kmeans_lloyd's output contract), so a DuckDB oracle can replay
    the training and land on bit-identical cell boundaries.

    ``init`` passes through to ``kmeans_lloyd``: ``"ids"`` (default,
    the SQL-replayable convention) or ``"hash"`` (order-robust seeds —
    the right choice on source-ordered corpora; see the kmeans_lloyd
    docstring and scripts/stress_r9.py's measured contrast).

    The k-row result is eagerly ``localCheckpoint``-ed: every consumer
    broadcasts it (assignment, probe-cell ranking), and without
    materialization the whole multi-round training plan re-executes
    per consumer — the semantic_dedup lesson (25 s -> ~4 s at sf0.1).

    At 100 TB the training input is a sample (cache-the-sample: Lloyd
    rounds scan only the cached projection) and this codebook is the
    table you write once and broadcast everywhere — assignment stays
    ONE corpus scan regardless of k or iterations.
    """
    from seriesly_spark.operators.clustering import kmeans_lloyd

    km = kmeans_lloyd(
        vectors,
        k=n_centroids,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
        init=init,
    )
    return (
        km.groupBy("cluster")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "centroid"))),
                lambda s: s.getField("centroid"),
            ).alias(vec_col)
        )
        .select(F.col("cluster").alias("centroid_id"), vec_col)
        .localCheckpoint(eager=True)
    )


def ivf_probe(
    assigned: DataFrame,
    query_vec_row: DataFrame,
    query_centroid: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Search only the query's IVF cell (the 100 TB path: partition-pruned
    scan of one cell instead of the full corpus)."""
    cell = assigned.where(F.col(centroid_id_col) == query_centroid)
    q = query_vec_row.select(F.col(vec_col).alias("__qv"))
    sims = cell.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
    )
    return sims.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def write_ivf_index(
    assigned: DataFrame,
    path: str,
    centroid_id_col: str = "centroid_id",
    one_file_per_cell: bool = True,
) -> None:
    """Materialize an IVF assignment as the PRODUCTION layout: parquet
    partitioned by cell, so every subsequent probe is a partition-pruned
    scan of its nprobe cells instead of a corpus pass (the layout
    `ivf_probe`'s docstring promises; tests/test_round9_ops.py pins the
    PartitionFilters + touched-files behavior).

    ``one_file_per_cell`` repartitions on the cell id first, so each
    cell's rows arrive at ONE writer task and the layout gets one file
    per cell, written in parallel across cells — without it an
    m-partition assignment frame sprays up to m × |cells| small files
    (the partitioned-append trap measured on the incremental indexes).
    At 100 TB switch it off and pre-repartition on (cell, salt) so a
    mega-cell splits across writers; the layout contract (directory
    per centroid_id) is what the probes prune on either way.
    """
    out = (
        assigned.repartition(F.col(centroid_id_col))
        if one_file_per_cell
        else assigned
    )
    out.write.mode("overwrite").partitionBy(centroid_id_col).parquet(path)


def load_ivf_index(spark, path: str) -> DataFrame:
    """Read a :func:`write_ivf_index` layout back. Filters on
    ``centroid_id`` prune at the directory level (PartitionFilters in
    the scan) — pair with `ivf_probe` / the `ann_ivf_recall` probe-set
    join for the scan-only-nprobe-cells read path."""
    return spark.read.parquet(path)


def embedding_centroids(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label, per-dimension centroid of an embedding corpus — the
    reduction at the heart of k-means / IVF training. posexplode fans each
    vector into (label, dim, value) rows, but the hash aggregate's partial
    (map-side) phase collapses them to labels x dims rows per task before
    the shuffle, so shuffle volume is independent of corpus size. Sums are
    decimal-accumulated (order-independent) then rounded for cross-engine
    stability."""
    ex = emb.select(
        F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "v")
    )
    dec_sum = F.sum(F.col("v").cast("double").cast("decimal(38,18)"))
    return ex.groupBy("label", "dim").agg(
        F.round(dec_sum.cast("double") / F.count(F.lit(1)), 6).alias("centroid")
    )


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Unit-normalize embeddings so cosine similarity degrades to a plain
    dot product (the usual prep before ANN indexing / quantization). One
    narrow pass, zero shuffle; the norm is decimal-accumulated
    (order-independent, engine-portable) and hoisted to a column so it is
    computed once per vector, not once per element. Zero vectors stay
    zero."""
    nm = norm(F.col(vec_col))
    return (
        df.withColumn("__nm", nm)
        .withColumn(
            out_col,
            F.transform(
                F.col(vec_col),
                lambda x: F.when(
                    F.col("__nm") > 0, x.cast("double") / F.col("__nm")
                ).otherwise(F.lit(0.0)),
            ),
        )
        .drop("__nm")
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — 4x storage / bandwidth
    compression for the 100 TB embedding store: ``scale = max|x| / 127``,
    ``q_i = clamp(round(x_i / scale), ±127)`` with explicit half-up
    rounding (``floor(v + 0.5)``) because engines disagree on banker's
    rounding. Reconstruction error is bounded by scale/2 per element.
    Narrow, zero shuffle; zero vectors quantize to zeros with scale 0."""
    absmax = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    out = df.withColumn(scale_col, absmax / F.lit(127.0))
    s = F.col(scale_col)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            s > 0,
            F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x.cast("double") / s + F.lit(0.5)),
                ),
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    return out.withColumn(q_col, q)


def ann_topk_quantized(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    expand: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Int8-quantized ANN with exact re-rank — the bandwidth-lean scale
    path. The corpus pass scores 4x-compressed codes with an INTEGER dot
    product (unit-normalize first, so the quantized dot approximates
    cosine directly: ``sum(qa*qb) * scale_a * scale_b``); only the
    ``k * expand`` integer-dot survivors touch full-precision vectors for
    the exact cosine re-rank. At 100 TB the quantized codes are what you
    materialize (quantize_int8 output) — the full-precision store is only
    read for the candidate pool. Candidate selection and re-rank are both
    partial top-k (TakeOrderedAndProject), never a global sort shuffle.

    With expand=4 the re-ranked top-10 matches the exact scan's order on
    the test corpora (recall 1.0); expand is the recall/bandwidth knob.
    """
    u = l2_normalize(vectors, vec_col=vec_col, out_col="unit")
    qd = quantize_int8(u, vec_col="unit")
    qrow = qd.where(F.col(id_col) == query_id).select(
        F.col("q").alias("__qq"), F.col("scale").alias("__qs")
    )
    int_dot = F.aggregate(
        F.zip_with("q", "__qq", lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cand = (
        qd.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qrow))
        .select(
            id_col,
            (int_dot.cast("double") * F.col("scale") * F.col("__qs")).alias(
                "__approx"
            ),
        )
        .orderBy(F.col("__approx").desc(), F.col(id_col))
        .limit(k * expand)
        .select(id_col)
    )
    pool_ids = cand.union(
        vectors.where(F.col(id_col) == query_id).select(id_col)
    )
    pool = vectors.join(pool_ids, id_col)
    return ann_topk_cosine(pool, query_id, k, id_col=id_col, vec_col=vec_col)


def hard_negatives(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the k most-similar corpus vectors with a DIFFERENT label —
    the negatives that actually move a contrastive loss (random
    negatives are trivially separable; the hard ones live at the
    decision boundary).

    Plan: the bounded query set broadcasts (BroadcastNestedLoopJoin
    with a |Q|-row side — the different-label predicate is a residual,
    not a cross product risk); cosine scores stay JVM-side; the top-k
    per query is a rank-filter over a window, which Catalyst's
    InferWindowGroupLimit rewrites into a PER-PARTITION partial top-k
    (WindowGroupLimit before the exchange) — so the shuffle carries at
    most k * partitions rows per query, not the scored corpus.
    Similarities round to 6 BEFORE ranking so last-ulp engine
    differences cannot flip ranks; ties break on vec_id.

    Output: (query_id, vec_id, cos_sim, rnk) with rnk 1..k.
    """
    from pyspark.sql import Window

    # Norms are HOISTED to one column per side before the join: inline
    # cosine() would recompute the corpus row's norm once per query and
    # the query norm once per corpus row — ~3x the arithmetic at |Q|=4
    # (measured 21.7 -> 8 s at 200k x 32, scripts/stress_r5.py).
    q = F.broadcast(
        vectors.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col(label_col).alias("__ql"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    corpus = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        norm(F.col(vec_col)).alias("__vn"),
    )
    scored = (
        corpus.join(
            q,
            (F.col(label_col) != F.col("__ql"))
            & (F.col(id_col) != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                dot(F.col(vec_col), F.col("__qv"))
                / (F.col("__vn") * F.col("__qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def ann_topk_multi(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for a BATCH of query vectors — the
    shape a retrieval pipeline actually runs (one query at a time never
    amortizes the corpus scan). Self-matches are excluded per query.

    Plan: the bounded query set broadcasts with norms precomputed (one
    norm per query row, one per corpus row — inline cosine() would
    redo the query norm once per corpus row); similarity rounds to 6
    BEFORE ranking so last-ulp engine differences cannot flip ranks
    (ties break on the neighbor id); the per-query top-k is a
    rank-filter over a window, which Catalyst's InferWindowGroupLimit
    rewrites into a PER-PARTITION partial top-k (WindowGroupLimit
    before the exchange) — the shuffle carries at most
    k * partitions rows per query, not the |Q|·N scored corpus, and
    the few-distinct-keys skew of a plain per-query window never
    materializes. Same certified shape as ``hard_negatives``.

    Output: (query_id, vec_id, cos_sim, rnk) with rnk 1..k.
    """
    from pyspark.sql import Window

    q = F.broadcast(
        vectors.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    corpus = spread(vectors).select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__vn"),
    )
    scored = corpus.join(
        q, F.col(id_col) != F.col("query_id")
    ).select(
        "query_id",
        F.col(id_col),
        F.round(
            dot(F.col(vec_col), F.col("__qv"))
            / (F.col("__vn") * F.col("__qn")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def ann_lsh_recall(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = 32,
    bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the sign-LSH bucket probe against exact brute force,
    per query — the accuracy gate a pipeline runs BEFORE trusting the
    approximate path at scale (``lsh_eval`` plays this role for the
    MinHash text miners; this is its embedding-side twin).

    Both sides rank on round(cos, 6) with a vec_id tie-break, so the
    two engines (and the two paths) agree on rank boundaries exactly.
    The LSH side probes only candidates sharing >= 1 band chunk with
    the query (the equi-join that replaces the O(|Q|·N) scan at
    scale); the exact side is ``ann_topk_multi``. Recall denominator
    is the EXACT list's size (== k whenever the corpus has k
    non-self rows), so a sparse corpus cannot inflate recall.

    Scale shape: signatures computed ONCE over the corpus (Arrow
    batched matrix multiply), band chunks explode to bands·N rows of
    (band, chunk, id) longs, the |Q|·bands query chunks broadcast, and
    the candidate set dedupes BEFORE any vector is touched — cosine
    runs on candidates only. The final recall join moves |Q|·k rows.

    Output: (query_id, n_exact, n_hit, recall) ordered by query_id.
    """
    from pyspark.sql import Window

    exact = ann_topk_multi(
        vectors, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )
    sig = lsh_signature(
        vectors, planes=planes, dim=dim, id_col=id_col, vec_col=vec_col
    )
    # Persist the banded signatures: the bucket join consumes this
    # frame on BOTH sides (corpus chunks + the broadcast query chunks)
    # inside one action — without it the Arrow signature pass runs
    # twice (observed ArrowEval=2 in the executed plan). EAGER for the
    # same single-action reason as the minhash miners.
    chunks = scoped_persist(
        sig.select(
            F.col(id_col),
            F.explode(F.array(*_band_chunks(planes, bands))).alias("bc"),
        ).select(id_col, "bc.band", "bc.chunk"),
        "similarity.lsh_recall_chunks",
        eager=True,
    )
    qchunks = F.broadcast(
        chunks.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), "band", "chunk"
        )
    )
    cand = (
        chunks.join(qchunks, ["band", "chunk"])
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
        .distinct()
    )
    q = F.broadcast(
        vectors.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    scored = (
        cand.join(vectors.select(id_col, vec_col), id_col)
        .join(q, "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                dot(F.col(vec_col), F.col("__qv"))
                / (norm(F.col(vec_col)) * F.col("__qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    approx = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    hit = approx.select(
        "query_id", F.col(id_col).alias("__hit_id")
    )
    joined = exact.join(
        hit,
        (exact["query_id"] == hit["query_id"])
        & (exact[id_col] == hit["__hit_id"]),
        "left",
    ).select(exact["query_id"], exact[id_col], "__hit_id")
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit_id").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
        )
        .orderBy("query_id")
    )


def ann_ivf_recall(
    vectors: DataFrame,
    query_ids: list[int],
    n_centroids: int = 8,
    k: int = 10,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Recall@k AND probe cost of the IVF cell probe against exact
    brute force, per query — ``ann_lsh_recall``'s twin for the coarse
    quantizer, exposing the knob that actually tunes IVF: ``nprobe``,
    how many nearest cells each query scans. The owner reads the
    (recall, n_cand) pair and raises nprobe until recall clears the
    bar, seeing exactly how much corpus each step re-buys — n_cand IS
    the per-query scan cost once cells are partition-pruned files.

    Codebook = ``codebook`` when given — one (centroid_id, vector) row
    per cell, e.g. ``train_ivf_codebook``'s kmeans-trained cells (the
    production path: a trained codebook on clustered data buys more
    recall per scanned candidate than any first-N convention) —
    otherwise the first ``n_centroids`` corpus vectors (the same
    deterministic convention as ``ivf_topk``). Every ranking — corpus
    assignment, the query's probe cells, both top-k lists — orders on
    round(cos, 6) with an id tie-break, so engines agree on every
    boundary. Recall denominator is the exact list's size.

    Scale shape: one ``ivf_assign`` pass (broadcast argmax, map-side
    collapsed exchange), probe-cell selection on the |Q|×cells
    broadcast-sized grid, candidates via ONE equi-join of the
    assignment against the broadcast (query, cell) probe set — at
    production scale this join is a partition-pruned read of nprobe
    cells per query — cosine touches candidates only, the top-k is
    the WindowGroupLimit rank-filter, and the recall join moves
    |Q|·k rows. The candidate set persists because both the ranker
    and the cost counter consume it inside one action.

    Output: (query_id, n_cand, n_exact, n_hit, recall) by query_id.
    """
    from pyspark.sql import Window

    exact = ann_topk_multi(
        vectors, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )
    centroids = (
        codebook.select("centroid_id", F.col(vec_col))
        if codebook is not None
        else vectors.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col)
        )
    )
    assigned = ivf_assign(
        vectors, centroids, id_col=id_col, vec_col=vec_col
    ).select(id_col, "centroid_id")
    q = F.broadcast(
        vectors.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    cb = F.broadcast(
        centroids.select(
            F.col("centroid_id").alias("__ccid"),
            F.col(vec_col).alias("__cv"),
            norm(F.col(vec_col)).alias("__cn"),
        )
    )
    qc_scored = q.crossJoin(cb).select(
        "query_id",
        "__ccid",
        F.round(
            dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("__sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.col("__ccid")
    )
    probe = F.broadcast(
        qc_scored.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select("query_id", F.col("__ccid").alias("centroid_id"))
    )
    cand = scoped_persist(
        assigned.join(probe, "centroid_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col),
        "similarity.ivf_recall_cand",
        eager=True,
    )
    scored = (
        cand.join(vectors.select(id_col, vec_col), id_col)
        .join(q, "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                dot(F.col(vec_col), F.col("__qv"))
                / (norm(F.col(vec_col)) * F.col("__qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    approx = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    hit = approx.select("query_id", F.col(id_col).alias("__hit_id"))
    joined = exact.join(
        hit,
        (exact["query_id"] == hit["query_id"])
        & (exact[id_col] == hit["__hit_id"]),
        "left",
    ).select(exact["query_id"], exact[id_col], "__hit_id")
    base = joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count("__hit_id").alias("n_hit"),
    )
    ncand = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_cand")
    )
    return (
        base.join(ncand, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_cand", F.lit(0)).alias("n_cand"),
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
        )
        .orderBy("query_id")
    )


def ivf_cell_purity(
    vectors: DataFrame,
    centroids: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Label purity of each IVF cell — the clustering-quality eval a
    pipeline runs before trusting a coarse quantizer to route similar
    documents together (cells that mix labels will also mix semantic
    neighborhoods, and the ANN probe's recall degrades exactly there).
    The embedding-side analogue of `textstats.lang_confusion`'s
    classifier-vs-labels matrix.

    Per cell: size, distinct labels, the majority label (ties break on
    the SMALLEST label so both engines agree), its count, and purity =
    top_n / n. Cells no vector landed in still get a row (n=0, NULL
    purity) — an empty cell is a routing signal the report must not
    drop, the same dense-grid rule as the chi-square contingency.

    Scale shape: `ivf_assign`'s broadcast-scored argmax with the label
    carried through as a group key and the VECTOR DROPPED before the
    shuffle — the argmax exchange moves (id, label, cid, sim) scalars
    instead of the embedding (map-side partial max_by collapses the
    |codebook| scored rows per vector to one before the exchange, so
    the shuffle is corpus-ROW-count, tiny-byte), and grouping on
    (id, label) makes the id-keyed label re-join unnecessary. Same
    math as `ivf_assign`: round(cos,6), ties to the SMALLEST cid. A
    shuffle-FREE per-row fold over a one-row broadcast codebook
    (`F.aggregate` / `transform`+`array_max`) was built and measured
    3.5-5x SLOWER at sf0.1: higher-order-function lambdas skip
    whole-stage codegen, so the decimal-accumulated dot products run
    interpreted — the codegen'd crossJoin argmax wins even paying its
    scalar shuffle (PLANS.md). The later (cell,label) count aggregate
    map-side combines to ≤cells×labels rows; everything after runs on
    that table.
    """
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("__ccid"),
            F.col(vec_col).alias("__cv"),
            norm2(F.col(vec_col)).alias("__cn2"),
        )
    )
    scored = (
        spread(vectors.select(id_col, label_col, vec_col))
        .withColumn("__n2", norm2(F.col(vec_col)))
        .crossJoin(c)
        .select(
            id_col,
            label_col,
            "__ccid",
            F.round(
                dot(F.col(vec_col), F.col("__cv"))
                / (F.sqrt(F.col("__n2")) * F.sqrt(F.col("__cn2"))),
                6,
            ).alias("__sim"),
        )
    )
    best = scored.groupBy(id_col, label_col).agg(
        F.max_by(
            F.col("__ccid"),
            F.struct(
                F.col("__sim").alias("s"), (-F.col("__ccid")).alias("nc")
            ),
        ).alias("__cid")
    )
    cl = best.groupBy("__cid", label_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    per_cell = cl.groupBy("__cid").agg(
        F.sum("__n").alias("n_vectors"),
        F.count(F.lit(1)).alias("n_labels"),
        # min over (-count, label): majority label, ties to the SMALLEST
        # label by the column's NATURAL ordering — no numeric cast, so
        # string labels keep the documented determinism (a long cast
        # would NULL out and degrade to an arbitrary pick).
        F.min_by(
            F.col(label_col),
            F.struct(
                (-F.col("__n")).alias("negc"),
                F.col(label_col).alias("l"),
            ),
        ).alias("top_label"),
        F.max("__n").alias("top_n"),
    )
    grid = centroids.select(F.col(centroid_id_col))
    return (
        grid.join(
            per_cell,
            grid[centroid_id_col] == per_cell["__cid"],
            "left",
        )
        .select(
            centroid_id_col,
            F.coalesce("n_vectors", F.lit(0)).alias("n_vectors"),
            F.coalesce("n_labels", F.lit(0)).alias("n_labels"),
            "top_label",
            F.coalesce("top_n", F.lit(0)).alias("top_n"),
            F.round(
                F.col("top_n")
                / F.when(F.col("n_vectors") > 0, F.col("n_vectors")),
                6,
            ).alias("purity"),
        )
        .orderBy(centroid_id_col)
    )


def ann_rank_eval(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    k_eval: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Grade the exact ANN layer's rankings with retrieval metrics:
    run :func:`ann_topk_multi` (top-``k`` candidates per query), mark a
    retrieved neighbor RELEVANT when its label matches the query's
    label, and score the per-query ranking with
    :func:`~seriesly_spark.operators.evaluation.rank_metrics`
    (MRR / NDCG@k_eval / P@k_eval / R@k_eval over the retrieved set).
    The recall/ndcg base is the RETRIEVED candidate set — this grades
    the RANKING the retrieval layer hands downstream, the companion of
    `ann_lsh_recall`/`ann_ivf_recall` which grade candidate COVERAGE
    against exact truth.

    Scale: the run table is |Q| x k rows — it BROADCASTS against the
    corpus-sized label projection (bodies/vectors never join), and
    rank_metrics' windows partition on the query key. Ranks agree
    across engines because ann_topk_multi rounds cosine to 6 before
    ranking with an id tie-break, and rank_metrics re-ranks with the
    same (score DESC, id) order.
    """
    from seriesly_spark.operators.evaluation import rank_metrics

    run = ann_topk_multi(
        vectors, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )
    labels = vectors.select(F.col(id_col), F.col(label_col))
    qlab = labels.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__ql")
    )
    graded = (
        labels.join(F.broadcast(run), id_col)
        .join(F.broadcast(qlab), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.col("cos_sim"),
            (F.col(label_col) == F.col("__ql")).cast("int").alias("rel"),
        )
    )
    return rank_metrics(
        graded,
        query_col="query_id",
        doc_col=id_col,
        score_col="cos_sim",
        rel_col="rel",
        k=k_eval,
    )


def embedding_dispersion(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Corpus-diversity report for an embedding column — the ONE-PASS
    identity a curation pipeline runs before and after dedup/mixing to
    see whether it collapsed the embedding space:

        sum_{i<j} ||x_i - x_j||^2 = n * sum_i ||x_i||^2 - ||sum_i x_i||^2

    so the mean pairwise squared distance (and the covariance trace,
    its /2-per-point view) needs only per-dimension sums — never a
    pairwise anything. Output one row: (n, dim, mean_norm2, trace_cov,
    mean_sq_dist) rounded to 6; mean_sq_dist NULL when n < 2.

    Shape: posexplode to (dim, val) with a map-side-combined hash
    aggregate to d rows (d = embedding width, bounded), then a d-row
    fold. Per-dim sums accumulate as decimal(38,18) (order-independent
    in any engine/partitioning — the similarity-family discipline);
    the d squared-sum terms are rounded to 6 and decimal-folded (the
    DCG pattern) so the final three divisions see identical inputs in
    both engines. At 100 TB this is one scan emitting d rows per
    partition; the mapInPandas Gram trick (pca_power_iteration) is the
    escalation when d^2 moments are needed — for first moments the
    JVM-side explode stays in whole-stage codegen.
    """
    v = F.col("val").cast("double")
    ex = vectors.select(F.posexplode(F.col(vec_col)).alias("dim", "val"))
    per = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v.cast(_DEC)).alias("s"),
        F.sum((v * v).cast(_DEC)).alias("s2"),
    )
    folded = per.agg(
        F.max("cnt").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("dim"),
        F.sum("s2").cast("double").alias("m2"),
        F.sum(
            F.round(
                F.col("s").cast("double") * F.col("s").cast("double"), 6
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("q"),
    )
    n_d = F.col("n").cast("double")
    trace = F.col("m2") / n_d - F.col("q") / (n_d * n_d)
    msd = (
        F.lit(2.0)
        * (n_d * F.col("m2") - F.col("q"))
        / (n_d * (F.col("n") - 1).cast("double"))
    )
    return folded.select(
        "n",
        "dim",
        F.round(F.col("m2") / n_d, 6).alias("mean_norm2"),
        F.round(trace, 6).alias("trace_cov"),
        F.when(F.col("n") >= 2, F.round(msd, 6)).alias("mean_sq_dist"),
    )


def _query_projections(
    vectors: DataFrame,
    query_ids: list[int],
    planes: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Per-plane projection VALUES for the query rows only — (query_id,
    p, pr) with the exact decimal-fold semantics of
    :func:`lsh_signature` (term = double product cast decimal(38,18),
    exact sum, cast double), so signs AND magnitudes replay bit-for-bit
    in any engine. |Q| x planes rows — driver-scale."""
    w = rademacher_weights(planes, dim)
    wdf = vectors.sparkSession.createDataFrame(
        [([[float(x) for x in row] for row in w],)],
        "__w array<array<double>>",
    )
    pr = F.expr(
        f"""transform(sequence(0, {planes - 1}), p ->
          cast(aggregate(
            zip_with({vec_col}, __w[p],
                     (x, s) -> cast(cast(x as double) * s as {_DEC})),
            cast(0 as {_DEC}), (a, b) -> cast(a + b as {_DEC}))
            as double))"""
    )
    return (
        vectors.where(F.col(id_col).isin(query_ids))
        .crossJoin(F.broadcast(wdf))
        .select(
            F.col(id_col).alias("query_id"), F.posexplode(pr).alias("p", "pr")
        )
    )


def multiprobe_chunks(
    vectors: DataFrame,
    query_ids: list[int],
    planes: int = 32,
    bands: int = 4,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH probe set (Lv et al., VLDB'07): for each query
    band, probe the query's own chunk PLUS the ``nprobe - 1`` chunks
    reached by flipping the band's lowest-|margin| sign bits — the
    planes where the query sits closest to the hyperplane, i.e. where
    a true near neighbor most plausibly landed on the other side. The
    classic recall-vs-hash-budget trade: more probes beat more tables
    because they reuse the SAME corpus signatures (no extra storage,
    no extra signature pass).

    Margin ranking ties break by plane index; flips are single-bit
    (perturbation depth 1 — the regime where multi-probe wins most per
    probe). Output: (query_id, band, chunk), distinct — |Q| x bands x
    nprobe rows, broadcast-scale.

    A band of ``width = planes // bands`` bits has exactly ``width``
    single-bit neighbors, so at depth 1 only ``width + 1`` distinct
    probes exist per band — a larger ``nprobe`` cannot be honored and
    raises rather than silently saturating.
    """
    from pyspark.sql import Window

    width = planes // bands
    if not 1 <= nprobe <= width + 1:
        raise ValueError(
            f"nprobe must be in [1, planes // bands + 1] = [1, {width + 1}] "
            f"(a {width}-bit band has only {width} single-bit flips); "
            f"got {nprobe}"
        )
    qp = _query_projections(
        vectors, query_ids, planes, dim, id_col, vec_col
    ).withColumn("band", (F.col("p") / width).cast("int"))
    bit = F.expr(f"shiftleft(cast(1 as bigint), p % {width})")
    base = qp.groupBy("query_id", "band").agg(
        F.sum(
            F.when(F.col("pr") >= 0, bit).otherwise(F.lit(0).cast("long"))
        ).alias("chunk")
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id", "band").orderBy(
            F.abs(F.col("pr")), F.col("p")
        )
    )
    flips = (
        qp.withColumn("__rn", rn)
        .where(F.col("__rn") <= nprobe - 1)
        .join(base, ["query_id", "band"])
        .select(
            "query_id",
            "band",
            F.col("chunk").bitwiseXOR(bit).alias("chunk"),
        )
    )
    return base.select("query_id", "band", "chunk").unionByName(flips).distinct()


def ann_lsh_multiprobe_recall(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 10,
    planes: int = 32,
    bands: int = 4,
    nprobe: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the MULTI-PROBE sign-LSH probe vs exact brute force
    — :func:`ann_lsh_recall` with ``nprobe - 1`` extra probes per band
    at the same (planes, bands) hash budget. Reports the probe's cost
    alongside its accuracy: ``n_cand`` is the number of distinct
    candidates whose vectors were actually scored, so the gate reads
    "recall X at a Y-row scan" and the nprobe knob is tunable on
    evidence (measured sf0.1 curve in PLANS.md).

    Scale shape: corpus signatures ONE Arrow pass (persisted banded
    table, same as ann_lsh_recall); the probe set is |Q| x bands x
    nprobe rows built from the |Q|-row projection table and broadcast;
    candidates dedupe before any vector is touched.

    Output: (query_id, n_exact, n_cand, n_hit, recall) by query_id.
    """
    from pyspark.sql import Window

    exact = ann_topk_multi(
        vectors, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )
    sig = lsh_signature(
        vectors, planes=planes, dim=dim, id_col=id_col, vec_col=vec_col
    )
    chunks = scoped_persist(
        sig.select(
            F.col(id_col),
            F.explode(F.array(*_band_chunks(planes, bands))).alias("bc"),
        ).select(id_col, "bc.band", "bc.chunk"),
        "similarity.lsh_multiprobe_chunks",
        eager=True,
    )
    probes = F.broadcast(
        multiprobe_chunks(
            vectors, query_ids, planes, bands, nprobe, dim, id_col, vec_col
        )
    )
    cand = (
        chunks.join(probes, ["band", "chunk"])
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
        .distinct()
    )
    q = F.broadcast(
        vectors.where(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            norm(F.col(vec_col)).alias("__qn"),
        )
    )
    scored = (
        cand.join(vectors.select(id_col, vec_col), id_col)
        .join(q, "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(
                dot(F.col(vec_col), F.col("__qv"))
                / (norm(F.col(vec_col)) * F.col("__qn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col(id_col)
    )
    approx = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    ncand = cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_cand"))
    hit = approx.select("query_id", F.col(id_col).alias("__hit_id"))
    joined = exact.join(
        hit,
        (exact["query_id"] == hit["query_id"])
        & (exact[id_col] == hit["__hit_id"]),
        "left",
    ).select(exact["query_id"], exact[id_col], "__hit_id")
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("__hit_id").alias("n_hit"),
        )
        .join(ncand, "query_id", "left")  # a probe can miss entirely
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_cand").cast("long"), F.lit(0)).alias(
                "n_cand"
            ),
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
        )
        .orderBy("query_id")
    )
