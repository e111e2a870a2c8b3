"""Round-12b production-shape stress: the prefix-filtered exact
similarity join under corpus-wide shingle skew (the shape that makes
the naive gram equi-join quadratic), DSIR at 10M docs, budget_select
under a mega-source.

Run: python scripts/stress_r12b.py   (local[32], ~128 GiB heap).
Records go to PLANS.md by hand — this script prints one line per gate.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from seriesly_spark.session import get_spark  # noqa: E402


def gate_prefix_join(spark) -> None:
    """1M docs that ALL share one 4-token sentence (two corpus-wide
    3-grams, df = 1M each) + 10 doc-unique tokens; 50k planted
    byte-identical twins. The naive gram equi-join would push the two
    mega-buckets through the shuffle — 2 * C(1M, 2) ~ 1e12 candidate
    rows, infeasible at any cluster size without the lossy max_df cap.
    The prefix filter provably excludes both (df-sorted last, never
    inside any doc's |d|-ceil(t|d|)+1 prefix), so the join input is
    the df<=2 unique grams and the output is EXACTLY the planted
    twins at jaccard 1.0."""
    from seriesly_spark.operators.dedup import jaccard_prefix_pairs

    n, twins = 1_000_000, 50_000
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
    docs = base.unionByName(twin)

    t0 = time.time()
    out = jaccard_prefix_pairs(docs, threshold=0.5)
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("jaccard").alias("jmin"),
        F.max("jaccard").alias("jmax"),
        F.sum(
            F.when(
                (F.col("b") - F.col("a") == n) & (F.col("a") < twins), 1
            ).otherwise(0)
        ).alias("planted"),
    ).collect()[0]
    wall = time.time() - t0
    assert got.n == twins, got
    assert got.planted == twins, got
    assert got.jmin == 1.0 and got.jmax == 1.0, got
    # what the naive join would have shuffled: sum_g C(df_g, 2)
    from seriesly_spark.operators.dedup import _shingle_sets

    naive = (
        _shingle_sets(docs, "text", "doc_id", 3, "stress.naive")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum(
                (F.col("df").cast("decimal(38,0)") * (F.col("df") - 1)) / 2
            ).alias("pairs")
        )
        .collect()[0]
        .pairs
    )
    print(
        f"prefix_join: 1.05M docs (50k twins, 2 corpus-wide grams) "
        f"EXACT {got.n} pairs in {wall:.1f} s; naive join bucket total "
        f"= {float(naive):.3g} candidate rows (infeasible)"
    )


def gate_dsir(spark) -> None:
    """10M docs x 8 tokens scored against a 1M-doc target slice.
    Check: EXACT spine (10M rows, no nulls) and the sign structure —
    docs whose tokens are drawn from the target residue class must
    outscore docs from the disjoint class on average."""
    from seriesly_spark.operators.sampling import dsir_scores

    n = 10_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit(f"w{j}_"),
                    ((F.col("id") + j) % 1000 + (F.col("id") % 2) * 1000)
                    .cast("string"),
                )
                for j in range(8)
            ],
        ).alias("text"),
    )
    target = docs.where(F.col("doc_id") % 2 == 0).limit(1_000_000)
    t0 = time.time()
    out = dsir_scores(docs, target)
    agg = (
        out.join(
            docs.select("doc_id", (F.col("doc_id") % 2 == 0).alias("tgt")),
            "doc_id",
        )
        .groupBy("tgt")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("logratio").alias("lr"))
        .collect()
    )
    wall = time.time() - t0
    by = {r.tgt: r for r in agg}
    assert by[True].n + by[False].n == n
    assert by[True].lr > by[False].lr, by
    print(
        f"dsir: 10M docs vs 1M-doc target scored in {wall:.1f} s; "
        f"avg logratio target-class {by[True].lr:.3f} vs "
        f"off-class {by[False].lr:.3f}"
    )


def gate_budget(spark) -> None:
    """100M docs, one mega-source (90M docs) + 1000 small sources;
    1B-token budget. Checks the selection is exact per the greedy
    definition: per source, selected token total <= allocation and
    adding the next-ranked doc would overflow (maximality)."""
    from seriesly_spark.operators.sampling import budget_select

    n_small, per_small = 1000, 10_000
    mega = 90_000_000
    docs = (
        spark.range(mega + n_small * per_small)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < mega, F.lit("mega"))
            .otherwise(
                F.concat(
                    F.lit("s"), ((F.col("id") - mega) / per_small).cast("int")
                )
            )
            .alias("source"),
            (F.col("id") % 100 + 1).cast("long").alias("n_tok"),
        )
    )
    t0 = time.time()
    sel = budget_select(
        docs.withColumn("text", F.lit("")),
        "source",
        budget_tokens=1_000_000_000,
        size_col="n_tok",
    )
    per_src = sel.groupBy("source").agg(
        F.sum("n_tokens").alias("used"),
        F.count(F.lit(1)).alias("n"),
        F.min("n_tokens").alias("cut"),
    )
    from seriesly_spark.operators.sampling import mixture_plan

    plan = mixture_plan(
        docs.withColumn("text", F.lit("")),
        "source",
        budget_tokens=1_000_000_000,
        size_col="n_tok",
    ).select("source", "planned_tokens")
    chk = (
        per_src.join(plan, "source")
        .agg(
            F.sum(
                F.when(F.col("used") > F.col("planned_tokens"), 1).otherwise(0)
            ).alias("over"),
            F.sum(
                F.when(
                    F.col("used") + F.col("cut") <= F.col("planned_tokens"), 1
                ).otherwise(0)
            ).alias("lazy"),
            F.count(F.lit(1)).alias("srcs"),
        )
        .collect()[0]
    )
    wall = time.time() - t0
    assert chk.over == 0, chk
    # maximality: used + its own smallest pick <= planned can happen
    # only when the NEXT unselected doc is larger than the smallest
    # selected one — impossible under longest-first ranking unless the
    # source is exhausted; allow exhausted sources.
    exhausted = (
        per_src.join(
            docs.groupBy("source").agg(F.count(F.lit(1)).alias("tot")),
            "source",
        )
        .where(F.col("n") == F.col("tot"))
        .count()
    )
    assert chk.lazy <= exhausted, (chk, exhausted)
    print(
        f"budget_select: 100M docs / 1001 sources (90M-doc mega-source) "
        f"selected in {wall:.1f} s; 0/{chk.srcs} sources over-allocation, "
        f"greedy-maximal on all non-exhausted sources"
    )



def gate_hits(spark) -> None:
    """5M hub nodes, each with ONE out-edge into one of 1000 authority
    groups whose sizes grow linearly (group i gets ~i-proportional
    in-degree). Closed form: a_k(i) ∝ d_i^k after k rounds (each round
    multiplies a(i) by d_i before normalization), h_k(v) ∝ a_k(g(v)).
    Checked to 1e-9 relative against the exact python replay."""
    import math

    from seriesly_spark.operators.graph import hits

    n_auth, n_hub = 1000, 5_000_000
    # hub v -> authority floor(sqrt(v * n_auth^2 / n_hub)) gives a
    # linearly growing in-degree profile d_i ~ (2i+1) * n_hub / n_auth^2
    edges = spark.range(n_hub).select(
        (F.col("id") + n_auth).alias("src"),
        F.sqrt(F.col("id").cast("double") * n_auth * n_auth / n_hub)
        .cast("long")
        .alias("dst"),
    )
    t0 = time.time()
    out = hits(edges, iterations=3)
    # authorities: a(i) proportional to d_i^3
    arows = {
        r.node: r.authority
        for r in out.where(F.col("node") < n_auth).collect()
    }
    deg = (
        edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d")).collect()
    )
    d = {r.dst: r.d for r in deg}
    wall = time.time() - t0
    # replay: a_k ∝ d^k, L2-normalized
    ak = {i: float(v) ** 3 for i, v in d.items()}
    nrm = math.sqrt(sum(v * v for v in ak.values()))
    bad = 0
    for i, v in ak.items():
        want = v / nrm
        got = arows.get(i, 0.0)
        if abs(got - want) > 1e-9 * max(1.0, abs(want)) + 1e-12:
            bad += 1
    assert bad == 0, f"{bad} authorities off closed form"
    print(
        f"hits: 5M-edge / 5.001M-node graph, 3 rounds in {wall:.1f} s; "
        f"all {len(ak)} authorities equal the d^3 closed form to 1e-9"
    )


def gate_profile_diff(spark) -> None:
    """Two 50M-row snapshots with constructed drift: snapshot B nulls
    every 4th value and collapses the categorical to 10% of A's
    distinct values. Exact closed-form expectations."""
    from seriesly_spark.operators.analytics import profile_diff

    n = 50_000_000
    a = spark.range(n).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 1000)).alias("event_type"),
        F.col("id").cast("double").alias("value"),
    )
    b = spark.range(n).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 100)).alias("event_type"),
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("id").cast("double"))
        .alias("value"),
    )
    t0 = time.time()
    out = {
        r.column: r
        for r in profile_diff(
            a, b, ["user_id", "event_type", "value"]
        ).collect()
    }
    wall = time.time() - t0
    assert out["event_type"].distinct_a == 1000
    assert out["event_type"].distinct_b == 100
    assert out["event_type"].distinct_ratio == 0.1
    assert out["value"].null_rate_b == 0.25
    assert out["value"].null_rate_delta == 0.25
    assert out["user_id"].n_a == n and out["user_id"].n_b == n
    print(
        f"profile_diff: two 50M-row snapshots profiled+diffed in "
        f"{wall:.1f} s; drift values exact (0.1 distinct ratio, "
        f"0.25 null-rate jump)"
    )


def gate_dedup_spans(spark) -> None:
    """Same 1.05M-doc corpus as the prefix-join gate (10 unique tokens
    + a shared 4-token sentence per doc; 50k byte-identical twins).
    Closed form: doc 0 is first carrier of everything it holds (0
    removed); every other base doc loses exactly the 4 common-sentence
    tokens (the two corpus-wide 3-grams cover positions T-4..T-1);
    every twin is fully excised (14 tokens)."""
    from seriesly_spark.operators.dedup import dedup_spans

    n, twins = 1_000_000, 50_000
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
    docs = base.unionByName(twin)
    t0 = time.time()
    got = (
        dedup_spans(docs)
        .groupBy("n_removed")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    wall = time.time() - t0
    by = {r.n_removed: r.c for r in got}
    assert by == {0: 1, 4: n - 1, 14: twins}, by
    print(
        f"dedup_spans: 1.05M docs span-cleaned in {wall:.1f} s; "
        f"removal histogram exactly {{0:1, 4:{n - 1}, 14:{twins}}}"
    )

if __name__ == "__main__":
    spark = get_spark("stress-r12b", cpus=32, shuffle_partitions=64)
    gate_prefix_join(spark)
    gate_dsir(spark)
    gate_budget(spark)
    gate_hits(spark)
    gate_profile_diff(spark)
    gate_dedup_spans(spark)
    print("ALL GATES PASS")
