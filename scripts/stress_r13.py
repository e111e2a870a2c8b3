"""Round-13 production-shape stress gates (local[32]): the suffix-array
duplicated-substring stats and the cross-corpus span rewrite at the
1.05M-doc corpus shape of scripts/stress_r12b.py, both checked EXACTLY
against closed forms.

Run: python scripts/stress_r13.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from seriesly_spark.session import get_spark


def _corpus(spark, n=1_000_000, twins=50_000):
    """10 unique tokens per doc + a shared 4-token sentence; the first
    ``twins`` docs get a byte-identical twin (the r12b geometry)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"u{j}_"), F.col("id").cast("string"))
                for j in range(10)
            ],
            F.lit("the shared common sentence"),
        ).alias("text"),
    )
    twin = base.where(F.col("doc_id") < twins).select(
        (F.col("doc_id") + n).alias("doc_id"), "text"
    )
    return base.unionByName(twin)


def gate_suffix(spark) -> None:
    """Closed form at rounds=4 (cap 15 >= the 14-token docs, fully
    exact): twinned docs (and their twins) are wholly duplicated ->
    max_dup_len = 14; every other doc's longest repeated span is the
    4-token shared sentence -> 4."""
    from seriesly_spark.operators.suffix import suffix_dup_stats

    n, twins = 1_000_000, 50_000
    docs = _corpus(spark, n, twins)
    t0 = time.time()
    got = (
        suffix_dup_stats(docs, rounds=4)
        .groupBy("max_dup_len")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    wall = time.time() - t0
    by = {r.max_dup_len: r.c for r in got}
    assert by == {14: 2 * twins, 4: n - twins}, by
    print(
        f"suffix_dup_stats: 1.05M docs (14.7M suffixes) in {wall:.1f} s; "
        f"histogram exactly {{14:{2 * twins}, 4:{n - twins}}}"
    )


def gate_spans_cross(spark) -> None:
    """Corpus = the 1M base docs; benchmark = the 50k twins. Closed
    form: corpus docs < 50k are verbatim in the benchmark -> fully
    excised (14); every other doc loses exactly the 4 shared-sentence
    tokens (the benchmark carries the two corpus-wide 3-grams)."""
    from seriesly_spark.operators.dedup import dedup_spans_cross

    n, twins = 1_000_000, 50_000
    all_docs = _corpus(spark, n, twins)
    corpus = all_docs.where(F.col("doc_id") < n)
    bench = all_docs.where(F.col("doc_id") >= n)
    t0 = time.time()
    got = (
        dedup_spans_cross(corpus, bench)
        .groupBy("n_removed")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    wall = time.time() - t0
    by = {r.n_removed: r.c for r in got}
    assert by == {14: twins, 4: n - twins}, by
    print(
        f"dedup_spans_cross: 1M-doc corpus x 50k-doc benchmark in "
        f"{wall:.1f} s; removal histogram exactly "
        f"{{14:{twins}, 4:{n - twins}}}"
    )


def gate_spans_exact(spark) -> None:
    """min_len=4 on the same corpus: the shared 4-token sentence
    qualifies and is excised from EVERY doc (no first-carrier
    exemption); twinned docs are wholly duplicated -> fully excised."""
    from seriesly_spark.operators.suffix import dedup_spans_exact

    n, twins = 1_000_000, 50_000
    docs = _corpus(spark, n, twins)
    t0 = time.time()
    got = (
        dedup_spans_exact(docs, min_len=4)
        .groupBy("n_removed")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    wall = time.time() - t0
    by = {r.n_removed: r.c for r in got}
    assert by == {14: 2 * twins, 4: n - twins}, by
    print(
        f"dedup_spans_exact: 1.05M docs length-exact span-cleaned in "
        f"{wall:.1f} s; removal histogram exactly "
        f"{{14:{2 * twins}, 4:{n - twins}}}"
    )


if __name__ == "__main__":
    spark = get_spark("stress-r13", cpus=32, shuffle_partitions=64)
    gate_suffix(spark)
    gate_spans_cross(spark)
    gate_spans_exact(spark)
