"""Persistent incremental IVF vector index — the retrieval member of
the incremental-index family (exact digests -> DedupIndex, MinHash
candidates -> MinhashIndex, SimHash matches -> SimhashIndex, vector
top-k -> this).

A FROZEN coarse codebook (trained once — `similarity.train_ivf_codebook`
— and stored WITH the index) routes every vector to its max-cosine
cell. The read-optimized base is cell-partitioned parquet, so a probe
is a partition-pruned scan of ``nprobe`` directories (the r09-pinned
PartitionFilters behavior of the one-shot `write_ivf_index` layout);
new batches append to a flat write-optimized delta, because a
partitionBy append of a small batch sprays ``m x cells`` files (the
measured ~5x regression the LSM split exists to avoid — see
dedup_index.py); ``compact()`` folds the delta into the bucketed base
behind the shared crash-atomic swap protocol (`_recover_compact` /
`_swap_in_compacted` — every stranded crash prefix is repaired on the
next open, fault-injection tested on the siblings).

Freezing the codebook is what makes incrementality sound: cell
boundaries never move, so history never reassigns and the probe's
pruning stays valid forever. Retraining the codebook is a REBUILD (new
index path), exactly as in production IVF systems.
"""

from __future__ import annotations

import logging
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seriesly_spark.operators.dedup_index import (
    DedupIndex,
    _has_parquet,
    _dir_bytes,
    _next_epoch,
    _legacy_files,
    _recover_compact,
    _swap_in_compacted,
)
from seriesly_spark.operators.similarity import cosine, ivf_assign

logger = logging.getLogger(__name__)


class IvfIndex:
    """Incremental IVF index over an embedding column.

    Layout::

        path/codebook/*.parquet          (centroid_id, embedding) — frozen
        path/data/centroid_id=N/*.parquet  read-optimized cells
        path/delta/*.parquet               flat append log
        path/staging/<epoch>/in/           durable batch staging

    ``update(vectors)`` assigns a batch with the broadcast codebook,
    stages it durably, appends it flat, and returns the per-cell batch
    report. ``topk(query_vec, k, nprobe)`` searches only the query's
    ``nprobe`` best cells — base reads carry PartitionFilters on
    ``centroid_id``; the delta (small by the compaction contract) takes
    the same filter. ``compact()`` folds delta into the cell layout,
    one file per cell (repartition-by-cell before partitionBy — no
    m x cells spray). Probe determinism: round-6 cosines everywhere,
    (cos desc, id) ordering — identical before/after compaction and
    engine-portable for the DuckDB oracle.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        codebook: DataFrame | None = None,
        auto_compact_files: int | None = None,
        auto_compact_ratio: float | None = None,
    ):
        self.spark = spark
        self.path = path
        self.auto_compact_files = auto_compact_files
        self.auto_compact_ratio = auto_compact_ratio
        self._data = os.path.join(path, "data")
        self._delta = os.path.join(path, "delta")
        self._staging = os.path.join(path, "staging")
        self._cbdir = os.path.join(path, "codebook")
        recovered = _recover_compact(self._data, self._delta)
        if recovered:
            logger.warning(
                "IvfIndex at %s: repaired interrupted compact (%s)",
                path, recovered,
            )
        if _legacy_files(path):
            raise ValueError(
                f"unrecognized IvfIndex layout at {path}: parquet files "
                "directly under the index root; rebuild from the source "
                "corpus or point at a fresh path."
            )
        if _has_parquet(self._cbdir):
            if codebook is not None:
                raise ValueError(
                    "IvfIndex already has a frozen codebook at "
                    f"{self._cbdir}; retraining requires a rebuild at a "
                    "fresh path (cell boundaries must never move under "
                    "an existing history)."
                )
        else:
            if codebook is None:
                raise ValueError(
                    "a new IvfIndex needs a codebook DataFrame "
                    "(centroid_id, embedding) — e.g. "
                    "similarity.train_ivf_codebook(...)"
                )
            codebook.select(
                F.col("centroid_id").cast("long").alias("centroid_id"),
                F.col("embedding"),
            ).coalesce(1).write.mode("overwrite").parquet(self._cbdir)

    def _codebook(self) -> DataFrame:
        return self.spark.read.parquet(self._cbdir)

    def _cells_df(self) -> DataFrame:
        """base + delta as one (centroid_id, vec_id, embedding) frame."""
        parts = []
        if _has_parquet(self._data):
            parts.append(
                self.spark.read.option("basePath", self._data)
                .parquet(self._data)
                .select(
                    F.col("centroid_id").cast("long").alias("centroid_id"),
                    "vec_id",
                    "embedding",
                )
            )
        if _has_parquet(self._delta):
            parts.append(
                self.spark.read.parquet(self._delta).select(
                    F.col("centroid_id").cast("long").alias("centroid_id"),
                    "vec_id",
                    "embedding",
                )
            )
        if not parts:
            cb = self._codebook()
            empty = cb.where(F.lit(False)).select(
                F.col("centroid_id").cast("long").alias("centroid_id"),
                F.lit(0).cast("long").alias("vec_id"),
                F.col("embedding"),
            )
            return empty
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def update(
        self,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Assign a batch to cells (broadcast codebook, round-6 argmax,
        lowest-cid tie-break — `similarity.ivf_assign`), stage it
        durably, append it FLAT to the delta, and return the per-cell
        batch report (centroid_id, n) ordered by cell. One corpus pass;
        nothing in history is read or reshuffled."""
        epoch = _next_epoch(self._staging)
        in_dir = os.path.join(self._staging, str(epoch), "in")
        assigned = ivf_assign(
            vectors, self._codebook(), id_col=id_col, vec_col=vec_col
        ).select(
            F.col("centroid_id").cast("long").alias("centroid_id"),
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        )
        assigned.write.mode("overwrite").parquet(in_dir)
        staged = self.spark.read.parquet(in_dir)
        to_append = staged
        if _dir_bytes(in_dir) < 32 << 20:
            to_append = to_append.coalesce(1)
        to_append.write.mode("append").parquet(self._delta)
        self._maybe_auto_compact("IvfIndex")
        return (
            staged.groupBy("centroid_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("centroid_id")
        )

    _maybe_auto_compact = DedupIndex._maybe_auto_compact

    def probe_cells(self, query_vec: list, nprobe: int = 1) -> list[int]:
        """The query's ``nprobe`` max-cosine cells (round-6, cid
        tie-break), computed through the engine on the k-row codebook
        and collected — an O(k) driver boundary, same class as the
        partition-boundary collects in rate.py."""
        q = self.spark.createDataFrame(
            [(list(map(float, query_vec)),)], "qe array<double>"
        )
        ranked = (
            self._codebook()
            .crossJoin(F.broadcast(q))
            .select(
                "centroid_id",
                F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias(
                    "__s"
                ),
            )
            .orderBy(F.col("__s").desc(), "centroid_id")
            .limit(int(nprobe))
        )
        return [int(r.centroid_id) for r in ranked.collect()]

    def topk(
        self,
        query_vec: list,
        k: int = 5,
        nprobe: int = 1,
        exclude_id: int | None = None,
    ) -> DataFrame:
        """Exact top-k within the probed cells: a partition-pruned scan
        of ``nprobe`` base directories plus the (compaction-bounded)
        delta under the same cell filter, round-6 cosine, (cos desc,
        vec_id) order — TakeOrderedAndProject, never a global sort.
        ``exclude_id`` drops the query's own row when it lives in the
        index."""
        cells = self.probe_cells(query_vec, nprobe)
        q = self.spark.createDataFrame(
            [(list(map(float, query_vec)),)], "qe array<double>"
        )
        scan = self._cells_df().where(F.col("centroid_id").isin(cells))
        if exclude_id is not None:
            scan = scan.where(F.col("vec_id") != exclude_id)
        sims = scan.crossJoin(F.broadcast(q)).select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qe")), 6).alias(
                "cos_sim"
            ),
        )
        return sims.orderBy(F.col("cos_sim").desc(), "vec_id").limit(int(k))

    def topk_multi(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 1,
        id_col: str = "query_id",
        vec_col: str = "embedding",
        exclude_self: bool = False,
    ) -> DataFrame:
        """Batched exact-within-probed-cells top-k for a query FRAME —
        the production probe shape (a retrieval batch never loops the
        driver over single-query probes): per-query cell routing over
        the broadcast codebook (row_number <= nprobe compiles to
        WindowGroupLimit — partial top-k before the exchange), static
        partition pruning from the O(|Q| x nprobe) distinct
        probed-cell set (a driver boundary in the rate.py class), ONE
        scan of the union of probed cells joined against the broadcast
        routing table, and a per-query rank filter for the final
        top-k. Round-6 cosines, (cos desc, vec_id) tie-break —
        identical results to per-query :meth:`topk` calls, in one
        pass. ``exclude_self`` drops rows where vec_id == query_id
        (queries drawn from the indexed corpus). Output: (query_id,
        vec_id, cos_sim) ordered."""
        from pyspark.sql import Window

        cb = F.broadcast(
            self._codebook().select(
                F.col("centroid_id").alias("__cid"),
                F.col("embedding").alias("__cv"),
            )
        )
        q = queries.select(
            F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qe")
        )
        routed = (
            q.crossJoin(cb)
            .select(
                "__qid",
                "__qe",
                "__cid",
                F.round(cosine(F.col("__qe"), F.col("__cv")), 6).alias(
                    "__s"
                ),
            )
            .withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("__qid").orderBy(
                        F.col("__s").desc(), F.col("__cid")
                    )
                ),
            )
            .where(F.col("__rn") <= int(nprobe))
            .select("__qid", "__qe", F.col("__cid").alias("centroid_id"))
        )
        cells = [
            int(r.centroid_id)
            for r in routed.select("centroid_id").distinct().collect()
        ]
        scan = self._cells_df().where(F.col("centroid_id").isin(cells))
        cand = scan.join(F.broadcast(routed), "centroid_id").select(
            F.col("__qid").alias("query_id"),
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("__qe")), 6).alias(
                "cos_sim"
            ),
        )
        if exclude_self:
            cand = cand.where(F.col("vec_id") != F.col("query_id"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id")
        )
        return (
            cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(k))
            .select("query_id", "vec_id", "cos_sim")
            .orderBy("query_id", F.col("cos_sim").desc(), "vec_id")
        )

    def compact(self, keep_staging: int = 2) -> dict:
        """Fold the delta into the cell-partitioned base — one file per
        cell (repartition by cell BEFORE partitionBy), distinct rows —
        behind the shared crash-atomic swap; prune old staging epochs."""

        def _nfiles(d: str) -> int:
            return sum(
                sum(1 for f in files if f.endswith(".parquet"))
                for _r, _d, files in os.walk(d)
            )

        before = _nfiles(self._data) + _nfiles(self._delta)
        if before:
            tmp = self._data + ".compact-tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            (
                self._cells_df()
                .distinct()
                .repartition("centroid_id")
                .sortWithinPartitions("vec_id")
                .write.mode("overwrite")
                .partitionBy("centroid_id")
                .parquet(tmp)
            )
            _swap_in_compacted(self._data, self._delta)
        removed = 0
        if os.path.isdir(self._staging):
            epochs = sorted(
                (int(d) for d in os.listdir(self._staging) if d.isdigit())
            )
            for e in epochs[: max(0, len(epochs) - keep_staging)]:
                shutil.rmtree(
                    os.path.join(self._staging, str(e)), ignore_errors=True
                )
                removed += 1
        return {
            "files_before": before,
            "files_after": _nfiles(self._data),
            "staging_removed": removed,
        }

