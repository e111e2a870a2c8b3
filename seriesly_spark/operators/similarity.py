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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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


def ann_topk_cosine(
    vectors: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of one corpus vector.

    Plan: broadcast the single query row, one narrow pass computing
    ``cos_sim``, then global top-k (sort+limit → per-partition partial
    top-k, no full shuffle). Deterministic tie-break on (sim desc, id asc).
    """
    q = vectors.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv")
    )
    sims = (
        vectors.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), F.col("__qv")), 6).alias("cos_sim"),
        )
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
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias("__cid"), F.col(vec_col).alias("__cv")
        )
    )
    scored = vectors.crossJoin(c).select(
        id_col,
        vec_col,
        "__cid",
        F.round(cosine(F.col(vec_col), F.col("__cv")), 6).alias("__sim"),
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct((-F.col("__sim")).alias("ns"), F.col("__cid").alias("cid")))
        .alias("__best")
    )
    return (
        scored.select(id_col, vec_col).distinct()
        .join(best, id_col)
        .select(id_col, vec_col, F.col("__best.cid").alias(centroid_id_col))
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
