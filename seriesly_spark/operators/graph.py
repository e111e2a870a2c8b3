"""Iterative graph operators — PageRank over corpus-derived graphs.

The reference engine has no graph surface at all (its reducers are
per-bucket folds, query.go:408-447); this module extends the
beyond-reference LLM-pipeline layer with the second iterative-graph
primitive after ``dedup.connected_components``: power-iteration
PageRank (Page, Brin, Motwani, Winograd — "The PageRank Citation
Ranking", Stanford InfoLab 1999), the standard importance score for
crawl-frontier prioritization and duplicate-cluster representative
selection.

Scale shape: each iteration is ONE equi-join of the edge list with the
current rank vector plus a key-shuffled aggregate on the destination —
the same shuffle class as one round of label propagation. Rank mass
sums are decimal-accumulated (order-independent), so results are exact
replays across engines and partitionings; iteration state is bounded
to one live copy via ``CheckpointRotator``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.dedup import word_shingles
from seriesly_spark.operators.util import (
    CheckpointRotator,
    scoped_persist,
    spread,
)


def derivation_edges(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Provenance edges of the corpus: one edge ``src -> dst`` whenever
    document ``src`` carries a distinct word n-gram whose FIRST carrier
    (minimum id — ingest order) is document ``dst != src``. The result
    is the "derives from" graph a curriculum or crawl scheduler ranks:
    heavily-pointed-to documents originate the corpus's phrasing
    (boilerplate sources, canonical texts), novel documents point
    almost nowhere.

    Plan: explode distinct grams once (persisted: the first-carrier
    aggregate and the join probe share the scan), min-id per gram
    (map-side combine), equi-join back on the gram, distinct (src, dst)
    pairs. The only wide exchanges are keyed on the gram and on the
    edge pair — ``ngram_novelty``'s scale class.
    """
    ex = spread(docs).select(
        F.col(id_col).alias("src"),
        F.explode(word_shingles(text_col, n)).alias("g"),
    )
    ex = scoped_persist(ex, "graph.derivation_shingles")
    first = ex.groupBy("g").agg(F.min("src").alias("dst"))
    return (
        ex.join(first, "g")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Power-iteration PageRank with uniform dangling-mass
    redistribution:

        r'(v) = (1-d)/n  +  d * ( sum_{u->v} r(u)/deg(u)  +  m/n )

    where ``m`` is the total rank held by dangling nodes (no out-edges)
    and ``deg`` is the out-degree. A fixed ``iterations`` count (not a
    convergence test) keeps the computation a pure function of the
    graph — replayable on any engine by unrolling the same number of
    rounds.

    ``edges``: (src, dst), deduplicated here. ``nodes``: one-column
    frame of the node universe (defaults to the union of edge
    endpoints); isolated nodes receive base + dangling-share rank.
    Output: (node, rank) with rank rounded to 9 decimals; ranks sum
    to ~1.

    Determinism: per-destination contributions and the dangling mass
    are decimal(38,18)-accumulated (exact, order-independent), so the
    double arithmetic sequence is identical on every engine and
    partitioning. Scale: the edge list and out-degrees are persisted
    once; each round shuffles (node, rank) pairs keyed on the node —
    never the graph payload; the 1-row n / dangling-mass aggregates
    broadcast (the sanctioned tiny crossJoin).
    """
    # Pre-partition the loop invariants on their join keys so each
    # round's joins reuse the cached partitioning instead of
    # re-exchanging the graph 5x: edges on src (the contribution join),
    # the node-degree table on node (the rank rebuild join probes it
    # with the per-round contrib table, which is the side that should
    # shuffle — it is aggregate-sized, the graph is not).
    edges = scoped_persist(
        edges.select("src", "dst").distinct().repartition("src"),
        "graph.pagerank_edges",
    )
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        (c,) = nodes.columns
        nodes = nodes.select(F.col(c).alias("node"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes_deg = scoped_persist(
        nodes.repartition("node").join(
            deg, nodes["node"] == deg["src"], "left"
        ).select("node", "deg"),
        "graph.pagerank_nodes",
    )
    # Loop-invariant hoist: n is constant across rounds, but as an
    # in-plan 1-row aggregate it re-ran (and re-broadcast) inside EVERY
    # round's checkpoint action — iterations+1 cached-table passes per
    # call, a full node-table scan each at cluster scale. One count()
    # here replaces them all and doubles as the eager materialization
    # of the persisted node table (previously lazy, materialized inside
    # round 1's job). n <= row count < 2^53, so the double is exact and
    # every division stays in-plan — bit-identical arithmetic. n == 0
    # (empty node universe) short-circuits: every downstream frame is
    # empty anyway, and under ANSI mode ConstantFolding would evaluate
    # the now-constant 1/n at PLAN time and throw DIVIDE_BY_ZERO where
    # the old runtime n column simply never evaluated on zero rows.
    n = nodes_deg.count()
    if n == 0:
        return nodes_deg.select("node", F.lit(0.0).alias("rank"))
    n_lit = F.lit(float(n))

    def dsum(c):
        return F.sum(c.cast("decimal(38,18)")).cast("double")

    # The rank table carries each node's static out-degree, so a round
    # needs NO degree join (contributions divide in place) and NO
    # anti-join for the dangling mass (a null-degree filter on the
    # checkpointed table).
    rot = CheckpointRotator()
    # The uniform init vector is a cheap projection over the cached
    # node table — referenced twice by round 1's contribution and
    # dangling-mass legs, both trivial recomputes; not worth its own
    # checkpoint execution (r15).
    ranks = nodes_deg.select(
        "node", "deg", (F.lit(1.0) / n_lit).alias("r")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(
                ranks.select(F.col("node").alias("src"), "r", "deg"), "src"
            )
            .groupBy("dst")
            .agg(dsum(F.col("r") / F.col("deg")).alias("c"))
        )
        m_row = ranks.where(F.col("deg").isNull()).agg(
            F.coalesce(dsum(F.col("r")), F.lit(0.0)).alias("m")
        )
        ranks = rot.checkpoint(
            nodes_deg.crossJoin(F.broadcast(m_row))
            .join(contrib, nodes_deg["node"] == contrib["dst"], "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(1.0 - damping) / n_lit
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("m") / n_lit
                    )
                ).alias("r"),
            )
        )
    return ranks.select("node", F.round("r", 9).alias("rank"))


def hits(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iterations: int = 4,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg, JACM'99 "Authoritative
    sources in a hyperlinked environment") — the second stationary
    importance score next to :func:`pagerank`, separating pages that
    POINT AT the good stuff (hubs: aggregator/index documents) from
    the pages being pointed at (authorities: canonical texts). On the
    corpus derivation graph the distinction is exactly the curation
    question: authorities originate phrasing, hubs recombine it.

    Power iteration with L2 normalization each half-step:

        a'(v) = sum_{u->v} h(u) / ||.||_2
        h'(v) = sum_{v->w} a'(w) / ||.||_2

    Fixed ``iterations`` (not a convergence test) keeps the result a
    pure function of the graph, replayable by unrolling the same
    rounds in any engine. Determinism: contribution sums and the
    squared-norm fold are decimal(38,18)-accumulated; sqrt and the
    divisions are correctly-rounded doubles, so every engine produces
    bit-identical vectors. Zero-norm (edgeless graph) coalesces to 0.

    Scale shape: identical to pagerank's round — the persisted,
    src-partitioned edge list joins the current (node, score) vector
    and aggregates on the other endpoint; the two norm rows broadcast;
    ``CheckpointRotator`` bounds state to one live copy. Output:
    (node, hub, authority) rounded to 9.
    """
    if iterations < 1:
        raise ValueError("hits requires iterations >= 1")
    edges = scoped_persist(
        edges.select("src", "dst").distinct().repartition("src"),
        "graph.hits_edges",
    )
    # Second persisted copy, pre-partitioned on dst, for the authority
    # half-step: the hub join reuses the src layout, but joining the
    # SAME cache on dst would re-exchange the full edge list every
    # round. ~1x extra edge memory buys zero per-round edge movement
    # (A/B at the 5M-edge stress shape: see PLANS.md round 13).
    edges_dst = scoped_persist(
        edges.repartition("dst"), "graph.hits_edges_dst"
    )
    if nodes is None:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
    else:
        (c,) = nodes.columns
        nodes = nodes.select(F.col(c).alias("node"))

    def dsum(c):
        return F.sum(c.cast("decimal(38,18)")).cast("double")

    # Iterate over EDGE ENDPOINTS only: a node with no out-edges has
    # hub 0 in every round and contributes nothing to any authority
    # (and vice versa), so the loop never needs the full node spine —
    # hub state lives on the src universe, authority state on the dst
    # universe, and the spine joins ONCE at the end (measured 11.8 ->
    # ~7 s at sf0.1; the per-round spine rebuild was 2 joins/round of
    # pure zeros). TWO rotators: both vectors are live at the final
    # join, so each gets its own one-copy lifecycle. (r15 note: a
    # one-checkpoint-per-round variant with the authority half-step
    # left lazy was A/B'd and REVERTED — the un-materialized a_raw /
    # h_raw subtrees are each referenced twice (norm + normalize), so
    # the join work re-executed 4x per round: 5.4 -> 8-12 s at sf0.1.)
    rot_h = CheckpointRotator()
    rot_a = CheckpointRotator()
    hv = rot_h.checkpoint(
        edges.select(F.col("src").alias("node")).distinct()
        .select("node", F.lit(1.0).alias("h"))
    )
    av = None
    for _ in range(iterations):
        a_raw = (
            edges.join(hv.select(F.col("node").alias("src"), "h"), "src")
            .groupBy("dst")
            .agg(dsum(F.col("h")).alias("a"))
        )
        na = a_raw.agg(
            F.sqrt(F.coalesce(dsum(F.col("a") * F.col("a")), F.lit(0.0))).alias(
                "na"
            )
        )
        av = rot_a.checkpoint(
            a_raw.crossJoin(F.broadcast(na)).select(
                F.col("dst").alias("node"),
                F.when(F.col("na") > 0.0, F.col("a") / F.col("na"))
                .otherwise(F.lit(0.0))
                .alias("a"),
            )
        )
        h_raw = (
            edges_dst.join(av.select(F.col("node").alias("dst"), "a"), "dst")
            .groupBy("src")
            .agg(dsum(F.col("a")).alias("h"))
        )
        nh = h_raw.agg(
            F.sqrt(F.coalesce(dsum(F.col("h") * F.col("h")), F.lit(0.0))).alias(
                "nh"
            )
        )
        hv = rot_h.checkpoint(
            h_raw.crossJoin(F.broadcast(nh)).select(
                F.col("src").alias("node"),
                F.when(F.col("nh") > 0.0, F.col("h") / F.col("nh"))
                .otherwise(F.lit(0.0))
                .alias("h"),
            )
        )
    return (
        nodes.join(hv.select(F.col("node").alias("__h_n"), "h"),
                   nodes["node"] == F.col("__h_n"), "left")
        .join(av.select(F.col("node").alias("__a_n"), "a"),
              nodes["node"] == F.col("__a_n"), "left")
        .select(
            "node",
            F.round(F.coalesce("h", F.lit(0.0)), 9).alias("hub"),
            F.round(F.coalesce("a", F.lit(0.0)), 9).alias("authority"),
        )
    )
