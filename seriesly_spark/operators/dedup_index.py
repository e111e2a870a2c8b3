"""Persistent incremental dedup index — the PRODUCTION dedup shape.

Batch dedup operators (dedup_exact, the miners) answer "what is
duplicated inside THIS corpus". A crawl pipeline asks a different
question every day: "which of today's shard is new relative to
everything we have ever kept?" Re-running corpus-wide dedup per shard
is O(history) per day; the standard answer is a persistent index of
content hashes that each incoming batch probes and then extends.

Design for 100 TB of history:
  * the index stores ONLY 16-byte md5 digests (never text) in parquet —
    ~1/1000th of the corpus; the probe is a hash-keyed left join of the
    batch's digests against it (AQE-planned; at real scale lay the
    index out bucketed by digest so the probe co-locates, and compact
    its append files periodically — same maintenance story as
    db.compact);
  * updates append ONLY the batch's novel digests — the index grows by
    new content, not by traffic;
  * in-batch and vs-index duplication are reported separately (a shard
    repeating itself is a different signal from a shard repeating
    history).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


class DedupIndex:
    """Exact-content dedup index at ``path`` (a parquet directory of
    ``h`` digests). ``update`` classifies a batch and extends the
    index; ``size`` reports distinct indexed hashes."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _index_df(self) -> DataFrame:
        if os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return self.spark.read.schema("h string").parquet(self.path)
        return self.spark.createDataFrame([], "h string")

    def size(self) -> int:
        return self._index_df().distinct().count()

    def update(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Classify every batch row against (a) earlier rows of the
        SAME batch and (b) the index as of BEFORE this batch, then
        append the batch's novel digests to the index.

        Returns the batch annotated per row: (id, h, dup_in_batch —
        an earlier batch row (lower id) has the same digest,
        dup_vs_index — the digest was already indexed). The returned
        frame is computed BEFORE the append and cached through it, so
        its classification is stable no matter when it is consumed.
        """
        h = F.md5(F.col(text_col).cast("binary"))
        batch = docs.select(F.col(id_col).alias("id"), h.alias("h"))
        w = Window.partitionBy("h").orderBy("id")
        ranked = batch.withColumn(
            "dup_in_batch", F.row_number().over(w) > 1
        )
        idx = self._index_df().distinct().withColumn(
            "__in_idx", F.lit(True)
        )
        out = (
            ranked.join(idx, "h", "left")
            .withColumn(
                "dup_vs_index", F.coalesce(F.col("__in_idx"), F.lit(False))
            )
            .drop("__in_idx")
        )
        # Materialize the classification BEFORE mutating the index —
        # a lazily-consumed result re-reading the index after append
        # would classify the batch against itself.
        out = out.localCheckpoint(eager=True)
        novel = out.where(
            ~F.col("dup_in_batch") & ~F.col("dup_vs_index")
        ).select("h")
        novel.write.mode("append").parquet(self.path)
        return out


def index_update_report(updated: DataFrame) -> DataFrame:
    """One-row shard report from an ``update`` result: rows in, rows
    duplicating earlier rows of the same batch, rows duplicating
    indexed history, and the novel-hash count appended."""
    return updated.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.col("dup_in_batch").cast("long")).alias("n_dup_in_batch"),
        F.sum(F.col("dup_vs_index").cast("long")).alias("n_dup_vs_index"),
        F.sum(
            (~F.col("dup_in_batch") & ~F.col("dup_vs_index")).cast("long")
        ).alias("n_new"),
    )


class MinhashIndex:
    """Near-duplicate sibling of :class:`DedupIndex`: a persistent
    index of per-band minhash signatures (``band``, ``sig``) that each
    incoming shard probes for HISTORY near-dup candidates before its
    own signatures are appended. Same scale story — signatures are
    bands x 32-hex-char rows per document (constant per doc, no text),
    the probe is a (band, sig)-keyed join, and at real scale the index
    is bucketed by (band, sig) and compacted periodically. Probing
    yields CANDIDATES (pairs that agree on >= 1 band); a pipeline
    verifies them with the exact miners, exactly as in batch LSH.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        n: int = 3,
        bands: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.n = n
        self.bands = bands

    def _index_df(self) -> DataFrame:
        if os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return self.spark.read.schema("band int, sig string").parquet(
                self.path
            )
        return self.spark.createDataFrame([], "band int, sig string")

    def _signatures(
        self, docs: DataFrame, text_col: str, id_col: str
    ) -> DataFrame:
        from seriesly_spark.operators.dedup import word_shingles

        sh = docs.select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, self.n).alias("grams"),
        ).where(F.size("grams") > 0)
        return sh.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(self.bands - 1)),
                    lambda i: F.struct(
                        i.cast("int").alias("band"),
                        F.array_min(
                            F.transform(
                                F.col("grams"),
                                lambda g: F.md5(
                                    F.concat(
                                        i.cast("string"), F.lit("|"), g
                                    ).cast("binary")
                                ),
                            )
                        ).alias("sig"),
                    ),
                )
            ).alias("bs"),
        ).select("id", "bs.band", "bs.sig")

    def update(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Probe the shard against history, then append its signatures.
        Returns one row per input doc (with >= n shingles):
        (id, n_band_hits — bands whose signature already exists in the
        index, near_dup_candidate — >= 1 hit). Classification is
        checkpointed BEFORE the append (a doc must not match its own
        signatures)."""
        sig = self._signatures(docs, text_col, id_col).localCheckpoint(
            eager=True
        )
        idx = self._index_df().distinct()
        hits = (
            sig.join(idx, ["band", "sig"], "left_semi")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_band_hits"))
        )
        out = (
            sig.select("id")
            .distinct()
            .join(hits, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("n_band_hits"), F.lit(0)).alias(
                    "n_band_hits"
                ),
                (F.coalesce(F.col("n_band_hits"), F.lit(0)) > 0).alias(
                    "near_dup_candidate"
                ),
            )
            .localCheckpoint(eager=True)
        )
        sig.select("band", "sig").write.mode("append").parquet(self.path)
        return out
