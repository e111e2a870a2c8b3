"""Scorer evaluation for training-data pipelines: ROC-AUC and
calibration-reliability bins.

A pipeline that SCORES documents (quality gates, fluency LMs, language
ID — `textstats.quality_filter`, `bigram_lm`) needs an operator that
EVALUATES a scorer against labels at corpus scale before the scorer is
trusted to route 100 TB: "does this score rank positives above
negatives" (AUC) and "does a 0.8 mean 80%" (calibration). Both reduce
to one corpus-sized aggregate; neither ships rows to the driver.

Scale design:
  * AUC uses the Mann-Whitney rank-sum identity computed over the
    GROUPED-BY-SCORE table, not per-row ranks: one hash aggregate on
    the score key (map-side partials; only (score, n_pos, n_neg)
    triples shuffle), then a cumulative window over the distinct-score
    table. Scores are rounded to 6 decimals by the caller's scorer, so
    that table is bounded at ~1e6 rows no matter the corpus size — the
    single-partition window is metadata-sized by construction (the
    same bounded-key argument as the bucket-boundary union in rate.py).
  * All mass terms stay in EXACT integer arithmetic until one final
    division: U2 = sum(n_pos_g * (2*cum_neg_below + n_neg_g)) is a
    BIGINT (order-independent across engines and partitionings);
    AUC = U2 / (2 * n_pos * n_neg) is a single deterministic IEEE
    division. No float accumulations that could flip a 6-decimal
    round between engines.
  * Calibration bins accumulate the score sum as decimal(28,6)
    (exact — scores carry <= 6 decimals), count positives as BIGINT,
    and divide once per bin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.operators.util import scoped_persist


def roc_auc(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    by: list[str] | None = None,
) -> DataFrame:
    """ROC-AUC of a score against a boolean label via the rank-sum
    identity with midrank tie handling:

        AUC = [ sum over positives of (#neg scored below
                + 0.5 * #neg tied) ] / (n_pos * n_neg)

    evaluated group-wise per distinct score (see module docstring for
    why that is the scalable shape). Rows with a NULL score or label
    are excluded (and counted in ``n_skipped``). Output: one row
    (n_pos, n_neg, n_skipped, auc) with auc rounded to 6; auc is NULL
    when either class is empty.

    ``by`` evaluates the AUC per group (one output row per ``by``
    tuple) — the scorer-drift report: a score that ranks well globally
    can be broken inside one domain. The cumulative window then
    partitions on the group keys, so even the bounded-table argument
    is unnecessary — no global ordering anywhere.
    """
    keys = list(by) if by else []
    s = scored.select(
        *keys, F.col(score_col).alias("__s"), F.col(label_col).alias("__y")
    )
    valid = F.col("__s").isNotNull() & F.col("__y").isNotNull()
    g = (
        s.withColumn("__ok", valid)
        .groupBy(*keys, F.when(F.col("__ok"), F.col("__s")).alias("__s"))
        .agg(
            F.sum((F.col("__ok") & F.col("__y")).cast("long")).alias("np"),
            F.sum((F.col("__ok") & ~F.col("__y")).cast("long")).alias("nn"),
            F.sum((~F.col("__ok")).cast("long")).alias("nskip"),
        )
    )
    # The NULL group key carries the skipped mass with np = nn = 0, so
    # it flows through the window (nulls sort first; contributes zero
    # to every cum_neg and a zero U2 term) and the report needs ONE
    # chain: corpus aggregate -> bounded window -> final fold. A
    # separate skipped-count branch would re-scan the corpus (measured:
    # 8 HashAggregates vs 4 in this shape).
    w = (
        Window.partitionBy(*keys)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn("cum_neg", F.coalesce(F.sum("nn").over(w), F.lit(0)))
    folded = c.groupBy(*keys).agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum("nskip").alias("n_skipped"),
        F.sum(
            F.col("np") * (F.lit(2) * F.col("cum_neg") + F.col("nn"))
        ).alias("u2"),
    )
    out = folded.select(
        *keys,
        "n_pos",
        "n_neg",
        "n_skipped",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("u2") / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )
    return out.orderBy(*keys) if keys else out


def ks_statistic(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Kolmogorov–Smirnov separation of a score's positive vs negative
    class distributions — the third leg of the scorer-evaluation
    family: AUC asks "does it rank", calibration asks "does the value
    mean what it says", KS asks "is there ONE threshold that cleanly
    splits the classes" (max over thresholds of |CDF_pos − CDF_neg|,
    the classic credit-scoring cut-point statistic).

    Same scale shape as :func:`roc_auc`: one corpus hash aggregate to
    the grouped-by-score table (bounded at ~1e6 rows by the caller's
    6-decimal scorer), cumulative windows over that bounded table,
    exact BIGINT class masses with one rounded division per term. NULL
    score/label rows ride the NULL group key (zero mass, counted in
    ``n_skipped``) so no second corpus scan is paid — the roc_auc
    shape. Output one row: (n_pos, n_neg, n_skipped, ks, ks_score)
    where ``ks_score`` is the SMALLEST score achieving the max (both
    engines agree on the boundary by round-6 + the min tie-break);
    ks/ks_score are NULL when either class is empty.
    """
    s = scored.select(
        F.col(score_col).alias("__s"), F.col(label_col).alias("__y")
    )
    valid = F.col("__s").isNotNull() & F.col("__y").isNotNull()
    g = (
        s.withColumn("__ok", valid)
        .groupBy(F.when(F.col("__ok"), F.col("__s")).alias("__s"))
        .agg(
            F.sum((F.col("__ok") & F.col("__y")).cast("long")).alias("np"),
            F.sum((F.col("__ok") & ~F.col("__y")).cast("long")).alias("nn"),
            F.sum((~F.col("__ok")).cast("long")).alias("nskip"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "__s",
        "nskip",
        F.sum("np").over(w).alias("cp"),
        F.sum("nn").over(w).alias("cn"),
        F.sum("np").over(tot).alias("tp"),
        F.sum("nn").over(tot).alias("tn"),
    )
    # Per-threshold term only on real score rows with both classes
    # populated; the NULL (skipped-mass) row carries term NULL and the
    # coalesce(-1) below keeps it out of the argmax.
    terms = c.withColumn(
        "term",
        F.when(
            F.col("__s").isNotNull()
            & (F.col("tp") > 0)
            & (F.col("tn") > 0),
            F.round(
                F.abs(
                    F.col("cp") / F.col("tp") - F.col("cn") / F.col("tn")
                ),
                6,
            ),
        ),
    )
    folded = terms.agg(
        F.max("tp").alias("n_pos"),
        F.max("tn").alias("n_neg"),
        F.sum("nskip").alias("n_skipped"),
        F.max("term").alias("ks"),
        # max over (term, -score) == max term, then SMALLEST score
        F.max_by(
            F.col("__s"),
            F.struct(
                F.coalesce("term", F.lit(-1.0)).alias("t"),
                (-F.col("__s")).alias("ns"),
            ),
        ).alias("__at"),
    )
    return folded.select(
        "n_pos",
        "n_neg",
        "n_skipped",
        "ks",
        F.when(F.col("ks").isNotNull(), F.col("__at")).alias("ks_score"),
    )


def lift_table(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift at each population decile of the score
    (descending) — "if I only keep the top-d/10 of the corpus by this
    score, what fraction of the positives do I capture, and how much
    better than random is that slice": the budget-allocation view of a
    scorer (mixture planning reads exactly this to decide how deep to
    cut each source).

    Tie handling is THRESHOLD-based and therefore exact and
    deterministic: decile d's row is the first score group (descending)
    whose cumulative population covers d/n_buckets of the corpus —
    `cum_n * n_buckets >= d * N` in pure BIGINT arithmetic, no
    row-splitting of tied groups, no ntile nondeterminism. The reported
    `cum_n` is the ACTUAL population at that threshold (>= the exact
    decile size when ties straddle the boundary — honest, and identical
    in both engines). A group emits every decile whose boundary it
    crosses, so deciles buried inside one mega-tie all report that
    group's threshold.

    Scale shape: the roc_auc spine — one corpus hash aggregate to the
    bounded grouped-by-score table, one descending cumulative window
    there, then a per-group `sequence()` explode that yields exactly
    ``n_buckets`` rows in total. NULL score/label rows are excluded
    (same rule as pr_curve). Output per decile: (decile, threshold,
    cum_n, cum_pos, cum_share, gain, lift); gain/lift NULL when the
    corpus has no positives.
    """
    s = scored.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    g = s.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(F.col(label_col).cast("long")).alias("np"),
        F.count(F.lit(1)).alias("nr"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "threshold",
        F.sum("nr").over(w).alias("cum_n"),
        F.sum("np").over(w).alias("cum_pos"),
        F.sum("nr").over(tot).alias("n"),
        F.sum("np").over(tot).alias("pos"),
    )
    c = c.withColumn(
        "__prev",
        F.lag("cum_n", 1, 0).over(Window.orderBy(F.col("threshold").desc())),
    )
    # decile d belongs to this group iff prev*b < d*N <= cum_n*b:
    # d_min = (prev*b) div N + 1, d_max = (cum_n*b) div N — INTEGER
    # division (a double `/` + floor can flip on exact boundaries).
    nb = int(n_buckets)
    d_min = F.expr(f"(__prev * {nb}) div n + 1")
    d_max = F.expr(f"(cum_n * {nb}) div n")
    rows = c.select(
        F.explode(
            F.when(
                d_max >= d_min, F.sequence(d_min, d_max)
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("decile"),
        "threshold",
        "cum_n",
        "cum_pos",
        "n",
        "pos",
    )
    return rows.select(
        F.col("decile").cast("int").alias("decile"),
        "threshold",
        "cum_n",
        "cum_pos",
        F.round(F.col("cum_n") / F.col("n"), 6).alias("cum_share"),
        F.when(
            F.col("pos") > 0, F.round(F.col("cum_pos") / F.col("pos"), 6)
        ).alias("gain"),
        F.when(
            F.col("pos") > 0,
            F.round(
                (F.col("cum_pos") / F.col("cum_n"))
                / (F.col("pos") / F.col("n")),
                6,
            ),
        ).alias("lift"),
    ).orderBy("decile")


def pr_curve(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """Precision/recall at every distinct score threshold (predict
    positive when ``score >= t``), from the same grouped-by-score
    table as :func:`roc_auc` — the corpus aggregates once, then two
    descending cumulative sums over the bounded distinct-score table
    give tp/fp per threshold. All counts exact BIGINT; the two ratios
    are single divisions rounded to 6. Output per threshold:
    (threshold, tp, fp, precision, recall) ordered by threshold
    descending (the natural sweep direction). NULL score or label rows
    are dropped."""
    s = scored.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    g = s.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(F.col(label_col).cast("long")).alias("np"),
        F.sum((~F.col(label_col)).cast("long")).alias("nn"),
    )
    w = (
        Window.orderBy(F.col("threshold").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        g.select(
            "threshold",
            F.sum("np").over(w).alias("tp"),
            F.sum("nn").over(w).alias("fp"),
            F.sum("np").over(tot).alias("__npos"),
        )
        .select(
            "threshold",
            "tp",
            "fp",
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")), 6).alias(
                "precision"
            ),
            F.when(
                F.col("__npos") > 0,
                F.round(F.col("tp") / F.col("__npos"), 6),
            ).alias("recall"),
        )
        .orderBy(F.col("threshold").desc())
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a [0, 1] score: equal-width bins, each
    reporting its mass, exact mean score, empirical positive rate, and
    the |mean - rate| gap (the per-bin term of expected calibration
    error). One hash aggregate on the bin key; decimal-exact score
    sums so both engines round identically. Output: (bin, n,
    mean_score, pos_rate, gap) ordered by bin; scores outside [0, 1]
    are clamped into the edge bins (floor/least), NULL score or label
    rows are dropped."""
    s = scored.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    b = F.least(
        F.greatest(
            F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(0)
        ),
        F.lit(n_bins - 1),
    )
    out = (
        s.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col(score_col).cast("decimal(28,6)")
            ).alias("__ssum"),
            F.sum(F.col(label_col).cast("long")).alias("__pos"),
        )
        .select(
            "bin",
            "n",
            F.round(
                F.col("__ssum").cast("double") / F.col("n"), 6
            ).alias("mean_score"),
            F.round(F.col("__pos") / F.col("n"), 6).alias("pos_rate"),
        )
        .withColumn(
            "gap", F.round(F.abs(F.col("mean_score") - F.col("pos_rate")), 6)
        )
        .orderBy("bin")
    )
    return out


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "score",
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    eps: float = 1e-6,
) -> DataFrame:
    """Population stability index between a reference and a current
    sample of a bounded value — the distribution-drift monitor a
    pipeline runs between corpus snapshots or daily shards before a
    scorer's thresholds are trusted to still mean what they meant.

    Equal-width bins over [lo, hi] (edges clamp; NULLs drop). Per bin:
    PSI term = (p_cur - p_ref) * ln(p_cur / p_ref), proportions
    rounded to 6 then clamped to ``eps`` so empty cells contribute a
    large-but-finite term instead of infinity (standard practice).
    Total PSI = sum of the term column (rule of thumb: < 0.1 stable,
    > 0.25 shifted).

    Scale shape: one count aggregate per side (only (bin, n) pairs
    shuffle), the n_bins-row grid rebuilt densely — groupBy DROPS
    empty bins, and an empty bin is exactly the drift signal PSI must
    not lose (same full-grid rule as the chi-square contingency). All
    arithmetic after the counts runs on the n_bins-row table. Output:
    (bin, n_ref, n_cur, p_ref, p_cur, psi_term) ordered by bin; the
    proportions are NULL (term NULL) when a side is entirely empty.
    """
    span = hi - lo

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.greatest(
                F.floor(
                    (F.col(value_col) - F.lit(lo)) / F.lit(span) * n_bins
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
        return (
            df.where(F.col(value_col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    grid = ref.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    j = (
        grid.join(binned(ref, "n_ref"), "bin", "left")
        .join(binned(cur, "n_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    withp = j.select(
        "bin",
        "n_ref",
        "n_cur",
        F.when(
            F.sum("n_ref").over(tot) > 0,
            F.round(F.col("n_ref") / F.sum("n_ref").over(tot), 6),
        ).alias("p_ref"),
        F.when(
            F.sum("n_cur").over(tot) > 0,
            F.round(F.col("n_cur") / F.sum("n_cur").over(tot), 6),
        ).alias("p_cur"),
    )
    p = F.greatest(F.col("p_cur"), F.lit(eps))
    q = F.greatest(F.col("p_ref"), F.lit(eps))
    # Explicit NULL guard: greatest() SKIPS nulls, so without it an
    # entirely-empty side would silently eps-fill and produce a
    # number; PSI against nothing is meaningless and must say so.
    term = F.when(
        F.col("p_ref").isNotNull() & F.col("p_cur").isNotNull(),
        F.round((p - q) * F.log(p / q), 6),
    )
    return withp.withColumn("psi_term", term).orderBy("bin")


def stopword_lang_scored(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    positive_lang: str = "en",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The evaluation-gate scorer: English-stopword ratio as a score
    for "is this document English", labeled by the corpus's own lang
    column — a real (score, label) pair both engines can compute
    independently from the same rule, so the oracle checks the scorer
    AND the evaluator. Skips empty-token docs (division by zero) and
    NULL langs (no label). Narrow single-pass projection."""
    from seriesly_spark.operators.textstats import STOPWORDS, tokens

    t = tokens(text_col)
    n = F.size(t)
    score = F.round(
        F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / n, 6
    )
    return docs.where(F.col(lang_col).isNotNull()).select(
        F.col(id_col),
        *extra_cols,
        F.when(n > 0, score).alias("score"),
        (F.col(lang_col) == positive_lang).alias("label"),
    )


def snapshot_diff(
    ref: DataFrame,
    cur: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Corpus snapshot delta: classify every document id across two
    snapshots as added / removed / changed / unchanged, counted per
    group — the refresh audit a pipeline runs between crawl snapshots
    before re-running the expensive downstream ladder (a 2% changed +
    1% added delta means incremental reprocessing; a 60% churn means
    the upstream source moved under you; `psi_report` monitors the
    same transition's SCORE distribution, this monitors its identity).

    Semantics: membership by ``id_col``; sameness by md5 of
    ``content_col`` (16-byte digest — content bodies never shuffle,
    the same digest discipline as ``DedupIndex``). A NULL content on
    either side compares as the empty digest (documented, determinate).

    Scale shape: two narrow projections to (id, digest[, group]), one
    full outer hash join on the id key, then a counting aggregate —
    the join is the only corpus-sized shuffle and it carries 24-byte
    rows. Group attribution prefers the CURRENT side (what the corpus
    is becoming), falling back to ref for removed ids.

    Output: (status, group?, n_docs) with a dense status set — all
    four statuses always present (zero-filled), because "added: 0" is
    exactly the signal a refresh audit must not silently drop — ordered
    by (status, group).
    """
    dig = lambda c: F.md5(F.coalesce(F.col(c).cast("string"), F.lit("")))
    gcols_r = [F.col(group_col).alias("__gr")] if group_col else []
    gcols_c = [F.col(group_col).alias("__gc")] if group_col else []
    r = ref.select(
        F.col(id_col).alias("__id"), dig(content_col).alias("__dr"), *gcols_r
    )
    c = cur.select(
        F.col(id_col).alias("__id"), dig(content_col).alias("__dc"), *gcols_c
    )
    j = r.join(c, "__id", "full_outer")
    status = (
        F.when(F.col("__dr").isNull(), F.lit("added"))
        .when(F.col("__dc").isNull(), F.lit("removed"))
        .when(F.col("__dr") == F.col("__dc"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    spark = ref.sparkSession
    statuses = spark.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)],
        "status string",
    )
    if group_col:
        grp = F.coalesce(F.col("__gc"), F.col("__gr")).alias(group_col)
        counts = j.select(status.alias("status"), grp).groupBy(
            "status", group_col
        ).agg(F.count(F.lit(1)).alias("n_docs"))
        grid = counts.select(group_col).distinct().crossJoin(
            F.broadcast(statuses)
        )
        out = grid.join(counts, ["status", group_col], "left").select(
            "status",
            group_col,
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
        return out.orderBy("status", group_col)
    counts = j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        statuses.join(counts, "status", "left")
        .select("status", F.coalesce("n_docs", F.lit(0)).alias("n_docs"))
        .orderBy("status")
    )


def rank_metrics(
    runs: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval-ranking metrics over a run table
    (query, candidate doc, ranking score, graded relevance): reciprocal
    rank of the first relevant hit, NDCG@k, precision@k and recall@k.
    The ranking-eval counterpart of :func:`roc_auc` — a retrieval or
    ANN layer (``similarity.ann_*``) is trusted to route queries only
    after its rankings are graded against relevance labels.

    Ranking order is (score DESC, doc ASC) — the doc tie-break makes
    the metric deterministic under score ties, so two engines agree.

    Scale design: every window partitions on the QUERY key (one hash
    shuffle of (query, doc, score, rel) rows; run tables are bounded
    per query by construction — a retrieval layer returns candidates,
    not the corpus), and the per-query reduction is a single hash
    aggregate. Nothing is globally ordered. Float determinism: each
    DCG term round(gain/log2(rank+1), 6) is cast to decimal(18,6) and
    summed EXACTLY, so cross-engine sums cannot drift with addition
    order; the final ndcg division is one IEEE op on identical inputs.

    Output: one row per query —
    (query, n_docs, n_rel, rr, ndcg_at_k, p_at_k, r_at_k), floats
    rounded to 6. ``rr`` is 0.0 when no relevant doc is retrieved;
    ``ndcg_at_k``/``r_at_k`` are NULL when the run has no relevant
    docs (no ideal ranking / empty recall base).
    """
    q, d, s, r = query_col, doc_col, score_col, rel_col
    by_score = Window.partitionBy(q).orderBy(F.col(s).desc(), F.col(d))
    by_ideal = Window.partitionBy(q).orderBy(F.col(r).desc(), F.col(d))
    gain = F.pow(F.lit(2.0), F.col(r).cast("double")) - F.lit(1.0)

    def dcg_term(rank_col):
        return (
            F.round(
                gain / F.log2(rank_col.cast("double") + F.lit(1.0)), 6
            )
            .cast("decimal(18,6)")
        )

    ranked = runs.select(
        F.col(q).alias("query"),
        F.col(d).alias("doc"),
        F.col(r).cast("int").alias("rel"),
        F.row_number().over(by_score).alias("rnk"),
        F.row_number().over(by_ideal).alias("irnk"),
    )
    zero6 = F.lit(0).cast("decimal(18,6)")
    agg = ranked.groupBy("query").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("first_rel"),
        F.coalesce(
            F.sum(
                F.when(F.col("rnk") <= k, dcg_term(F.col("rnk")))
            ),
            zero6,
        ).alias("dcg"),
        F.coalesce(
            F.sum(
                F.when(F.col("irnk") <= k, dcg_term(F.col("irnk")))
            ),
            zero6,
        ).alias("idcg"),
        F.sum(
            F.when((F.col("rel") > 0) & (F.col("rnk") <= k), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("rel_at_k"),
    )
    return agg.select(
        "query",
        "n_docs",
        "n_rel",
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("first_rel").cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("rr"),
        F.when(
            F.col("idcg") > 0,
            F.round(
                F.col("dcg").cast("double") / F.col("idcg").cast("double"),
                6,
            ),
        ).alias("ndcg_at_k"),
        F.round(F.col("rel_at_k").cast("double") / F.lit(float(k)), 6)
        .alias("p_at_k"),
        F.when(
            F.col("n_rel") > 0,
            F.round(
                F.col("rel_at_k").cast("double")
                / F.col("n_rel").cast("double"),
                6,
            ),
        ).alias("r_at_k"),
    ).orderBy("query")


def agreement_kappa(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Cohen's kappa between two categorical raters (chance-corrected
    agreement): kappa = (p_o - p_e) / (1 - p_e), with observed
    agreement p_o = #(a = b) / n and chance agreement
    p_e = sum_c (n_a(c)/n) * (n_b(c)/n). The labeled-data QC gate: two
    annotation pipelines (a model scorer vs a heuristic, two LM
    judges) agreeing 90% of the time means little if one label
    dominates — kappa discounts exactly that.

    Rows where either rater is NULL are excluded and counted in
    ``n_skipped``. Output: one row
    (n, n_skipped, po, pe, kappa) rounded to 6; kappa is NULL when
    p_e = 1 (degenerate single-category raters).

    Scale: ONE corpus aggregate — the (a, b) contingency table (map-side
    partial combine; |A| x |B| rows shuffle, never documents) — from
    which totals, agreement, and both marginals all derive as
    metadata-sized reductions. All mass terms are BIGINT-exact until
    the final divisions.
    """
    a, b = F.col(a_col), F.col(b_col)
    # Three consumers (totals + both marginals) race one action over
    # the tiny contingency table — eager persist so the corpus scan
    # behind it runs exactly once.
    cells = scoped_persist(
        df.groupBy(a.alias("__a"), b.alias("__b")).agg(
            F.count(F.lit(1)).alias("__c")
        ),
        "evaluation.kappa_cells",
        eager=True,
    )
    both = F.col("__a").isNotNull() & F.col("__b").isNotNull()
    totals = cells.agg(
        F.coalesce(F.sum(F.when(both, F.col("__c"))), F.lit(0))
        .cast("bigint")
        .alias("n"),
        F.coalesce(F.sum(F.when(~both, F.col("__c"))), F.lit(0))
        .cast("bigint")
        .alias("n_skipped"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("agree"),
    )
    ok = cells.where(both)
    ca = ok.groupBy(F.col("__a").alias("cat")).agg(
        F.sum("__c").alias("na")
    )
    cb = ok.groupBy(F.col("__b").alias("cat")).agg(
        F.sum("__c").alias("nb")
    )
    # Inner join: a category one rater never uses contributes 0 mass.
    cross = ca.join(cb, "cat").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
        .cast("bigint")
        .alias("cross_mass")
    )
    po = F.col("agree").cast("double") / F.col("n").cast("double")
    pe = F.col("cross_mass").cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    return totals.crossJoin(cross).select(
        "n",
        "n_skipped",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6))
        .alias("kappa"),
    )


def classifier_report(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class precision / recall / F1 for a multiclass classifier,
    plus ``__macro__`` (unweighted class average) and ``__micro__``
    (pooled = accuracy) summary rows — the companion of the confusion
    matrix (`textstats.lang_confusion` shows WHERE mass leaks; this
    scores each class). Rows with a NULL label or prediction are
    excluded.

    Conventions (deterministic, engine-portable):
      * per-class F1 = 2*tp / (n_true + n_pred) — algebraically
        2PR/(P+R) but defined whenever the class appears at all;
      * precision is NULL when the class is never predicted, recall
        NULL when it never occurs in labels;
      * ``__macro__`` averages the UNROUNDED per-class metrics over
        classes WITH n_true > 0, treating a NULL precision as 0 (the
        zero-division=0 convention), then rounds once. Averaging the
        rounded terms instead MANUFACTURES exact decimal halves
        (sum-of-6-decimal values / 2) where Spark's shortest-repr
        HALF_UP and DuckDB's float rounding disagree; organic IEEE
        quotients have 17-digit shortest representations and never sit
        on a rounding boundary;
      * ``__micro__`` has precision = recall = f1 = accuracy (every
        row has exactly one label and one prediction).

    Scale: ONE corpus aggregate (the (label, pred) contingency table,
    map-side combined; |L| x |P| rows shuffle) — marginals, diagonal,
    and both summary rows all derive from the eager-persisted cells.
    """
    lab, prd = F.col(label_col), F.col(pred_col)
    cells = scoped_persist(
        df.where(lab.isNotNull() & prd.isNotNull())
        .groupBy(lab.alias("__l"), prd.alias("__p"))
        .agg(F.count(F.lit(1)).alias("__c")),
        "evaluation.classifier_cells",
        eager=True,
    )
    lm = cells.groupBy(F.col("__l").alias("class")).agg(
        F.sum("__c").alias("n_true")
    )
    pm = cells.groupBy(F.col("__p").alias("class")).agg(
        F.sum("__c").alias("n_pred")
    )
    diag = cells.where(F.col("__l") == F.col("__p")).select(
        F.col("__l").alias("class"), F.col("__c").alias("tp")
    )
    per = (
        lm.join(pm, "class", "full_outer")
        .join(diag, "class", "left")
        .select(
            "class",
            F.coalesce("n_true", F.lit(0)).cast("bigint").alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).cast("bigint").alias("n_pred"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
    )
    per = per.select(
        "class",
        "n_true",
        "n_pred",
        "tp",
        F.round(
            F.col("tp") / F.when(F.col("n_pred") > 0, F.col("n_pred")), 6
        ).alias("precision"),
        F.round(
            F.col("tp") / F.when(F.col("n_true") > 0, F.col("n_true")), 6
        ).alias("recall"),
        F.round(
            F.lit(2) * F.col("tp") / (F.col("n_true") + F.col("n_pred")),
            6,
        ).alias("f1"),
    )
    # Macro over the UNROUNDED quotients (see docstring for why not
    # the rounded terms).
    occupied = per.where(F.col("n_true") > 0)
    macro = occupied.agg(
        F.lit("__macro__").alias("class"),
        F.sum("n_true").cast("bigint").alias("n_true"),
        F.sum("n_pred").cast("bigint").alias("n_pred"),
        F.sum("tp").cast("bigint").alias("tp"),
        F.round(
            F.avg(
                F.coalesce(
                    F.col("tp")
                    / F.when(F.col("n_pred") > 0, F.col("n_pred")),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("precision"),
        F.round(F.avg(F.col("tp") / F.col("n_true")), 6).alias("recall"),
        F.round(
            F.avg(
                F.lit(2) * F.col("tp") / (F.col("n_true") + F.col("n_pred"))
            ),
            6,
        ).alias("f1"),
    )
    acc = F.round(
        F.sum("tp") / F.when(F.sum("n_true") > 0, F.sum("n_true")), 6
    )
    micro = per.agg(
        F.lit("__micro__").alias("class"),
        F.sum("n_true").cast("bigint").alias("n_true"),
        F.sum("n_pred").cast("bigint").alias("n_pred"),
        F.sum("tp").cast("bigint").alias("tp"),
        acc.alias("precision"),
        acc.alias("recall"),
        acc.alias("f1"),
    )
    return per.unionByName(macro).unionByName(micro).orderBy("class")


def brier_score(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Brier score of a probabilistic [0, 1] scorer — mean squared
    error against the binary label — the single-number companion of
    the :func:`calibration_bins` reliability table (a scorer can bin
    well yet be uniformly overconfident; Brier charges both
    calibration and refinement). Rows with a NULL score or label are
    excluded and counted.

    Exactness: the caller's scorer emits <= 6 decimals, so
    (score - label) is an exact decimal(18,6), its square an exact
    decimal at scale 12, and the corpus sum decimal-exact in any
    engine and partitioning — one IEEE division at the end. One hash
    aggregate, no shuffle beyond the 1-row combine.

    Output: one row (n, n_skipped, brier) with brier rounded to 6
    (NULL on an empty corpus).
    """
    s, y = F.col(score_col), F.col(label_col)
    ok = s.isNotNull() & y.isNotNull()
    d = s.cast("decimal(18,6)") - y.cast("int").cast("decimal(18,6)")
    sq = F.when(ok, d * d)
    return scored.agg(
        F.count(F.when(ok, 1)).alias("n"),
        F.count(F.when(~ok, 1)).alias("n_skipped"),
        F.round(
            F.sum(sq).cast("double")
            / F.when(F.count(F.when(ok, 1)) > 0, F.count(F.when(ok, 1))),
            6,
        ).alias("brier"),
    )


def expected_calibration_error(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Expected calibration error — the single-number fold of the
    :func:`calibration_bins` reliability table: ECE = sum over bins of
    (n_b / N) * |mean_score_b - pos_rate_b|, plus MCE (the worst bin's
    gap) and which bin that is — the go/no-go gate a pipeline reads
    before trusting a scorer's VALUES (AUC only certifies its ORDER).

    Determinism: each bin's gap is the round-6 double both engines
    already agree on (calibration_bins' contract); the weighted fold
    multiplies it as an EXACT decimal(18,6) by the BIGINT bin mass and
    decimal-sums across the <= ``n_bins`` rows — order-independent in
    any engine/partitioning — with ONE IEEE division at the end (the
    brier_score pattern). A float sum of n_bins weighted terms could
    differ in the last ulp between engines and flip a round-6 boundary;
    the decimal fold cannot. ``worst_bin`` tie-breaks to the SMALLEST
    bin via max_by(struct(gap, -bin)).

    Scale: one corpus hash aggregate (inside calibration_bins) + an
    ``n_bins``-row fold. Output one row:
    (n, n_bins_used, ece, mce, worst_bin); ece/mce NULL on an empty
    corpus.
    """
    bins = calibration_bins(
        scored, score_col=score_col, label_col=label_col, n_bins=n_bins
    )
    gdec = F.col("gap").cast("decimal(18,6)")
    return bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins_used"),
        F.round(
            F.sum(F.col("n") * gdec).cast("double") / F.sum("n"), 6
        ).alias("ece"),
        F.max("gap").alias("mce"),
        F.when(
            F.max("gap").isNotNull(),
            F.max_by(
                F.col("bin"),
                F.struct(
                    F.col("gap").alias("g"), (-F.col("bin")).alias("nb")
                ),
            ),
        ).alias("worst_bin"),
    )


def best_threshold(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Operating-point selection for a scorer: sweep every distinct
    observed score as the "predict positive when score >= t" threshold
    and report the one maximizing F1 and the one maximizing Youden's J
    (tpr - fpr, the balanced-accuracy cut) — the decision
    :func:`pr_curve` and :func:`ks_statistic` leave to the reader,
    folded to two rows a pipeline config can consume directly.

    Same scale shape as roc_auc/pr_curve: ONE corpus hash aggregate to
    the grouped-by-score table (bounded ~1e6 rows by the caller's
    6-decimal scorer), one descending cumulative window there, then a
    two-row argmax fold. All masses BIGINT-exact; each metric is one
    deterministic IEEE division (then round-6), so both engines land
    on identical doubles and the argmax tie-breaks to the SMALLEST
    threshold via max_by(struct(metric, -threshold)).

    Output (one row per criterion, ordered): (criterion in
    {'f1','youden'}, threshold, tp, pp, precision, recall, f1,
    youden). The f1 row needs n_pos > 0; the youden row needs both
    classes; with neither, zero rows. NULL score/label rows are
    excluded.
    """
    s = scored.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    )
    g = s.groupBy(F.col(score_col).alias("threshold")).agg(
        F.sum(F.col(label_col).cast("long")).alias("np"),
        F.count(F.lit(1)).alias("nr"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        "threshold",
        F.sum("np").over(w).alias("tp"),
        F.sum("nr").over(w).alias("pp"),
        F.sum("np").over(tot).alias("pos"),
        F.sum("nr").over(tot).alias("n"),
    )
    terms = c.select(
        "threshold",
        "tp",
        "pp",
        F.round(F.col("tp") / F.col("pp"), 6).alias("precision"),
        F.when(
            F.col("pos") > 0, F.round(F.col("tp") / F.col("pos"), 6)
        ).alias("recall"),
        F.when(
            F.col("pos") > 0,
            F.round(
                (F.lit(2) * F.col("tp")).cast("double")
                / (F.col("pos") + F.col("pp")),
                6,
            ),
        ).alias("f1"),
        F.when(
            (F.col("pos") > 0) & (F.col("n") - F.col("pos") > 0),
            F.round(
                F.col("tp") / F.col("pos")
                - (F.col("pp") - F.col("tp")) / (F.col("n") - F.col("pos")),
                6,
            ),
        ).alias("youden"),
    )
    at = F.struct(
        "threshold", "tp", "pp", "precision", "recall", "f1", "youden"
    )
    folded = terms.agg(
        F.max("f1").alias("__bf1"),
        F.max_by(
            at,
            F.struct(
                F.coalesce("f1", F.lit(-1.0)).alias("m"),
                (-F.col("threshold")).alias("nt"),
            ),
        ).alias("__atf1"),
        F.max("youden").alias("__bj"),
        F.max_by(
            at,
            F.struct(
                F.coalesce("youden", F.lit(-2.0)).alias("m"),
                (-F.col("threshold")).alias("nt"),
            ),
        ).alias("__atj"),
    )
    rows = folded.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("f1").alias("criterion"),
                    F.col("__bf1").alias("best"),
                    F.col("__atf1").alias("at"),
                ),
                F.struct(
                    F.lit("youden").alias("criterion"),
                    F.col("__bj").alias("best"),
                    F.col("__atj").alias("at"),
                ),
            )
        ).alias("r")
    )
    return (
        rows.where(F.col("r.best").isNotNull())
        .select(
            F.col("r.criterion").alias("criterion"),
            F.col("r.at.threshold").alias("threshold"),
            F.col("r.at.tp").alias("tp"),
            F.col("r.at.pp").alias("pp"),
            F.col("r.at.precision").alias("precision"),
            F.col("r.at.recall").alias("recall"),
            F.col("r.at.f1").alias("f1"),
            F.col("r.at.youden").alias("youden"),
        )
        .orderBy("criterion")
    )


def fleiss_kappa(
    df: DataFrame, item_col: str, cat_col: str, raters: int
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement among a FIXED number
    of raters per item (Fleiss 1971), the multi-rater generalization of
    :func:`agreement_kappa`: three LM judges, N annotators per example,
    k redundant labeling pipelines. Input is LONG format — one row per
    (item, assigned category); ``raters`` declares the required count.

        P_i   = (sum_j n_ij^2 - r) / (r (r - 1))     per-item agreement
        P_bar = mean over items;  P_e = sum_j p_j^2;  p_j = mass_j / (N r)
        kappa = (P_bar - P_e) / (1 - P_e)

    Items whose non-NULL rating count differs from ``raters`` are
    EXCLUDED whole (counted in ``n_excluded``) — classic Fleiss is
    undefined for ragged panels, and exclusion keeps every mass term
    BIGINT-exact: with constant r, P_bar = (S - N r) / (N r (r - 1))
    where S = sum over kept items of sum_j n_ij^2 is a pure integer
    sum — no order-dependent float mean over items (the trap a direct
    mean-of-P_i implementation walks into at corpus scale). NULL
    categories are dropped before counting.

    Scale: one corpus aggregate to the (item, category) cells (map-side
    combine), one item-keyed fold, category marginals from an item-keyed
    join back to the cells — cells and per-item tables both eager-persisted
    (two consumers each), everything after is metadata-sized. Output one
    row: (n_items, n_excluded, p_bar, p_e, kappa) rounded to 6; kappa
    NULL when P_e = 1 or no item qualifies.
    """
    r = int(raters)
    if r < 2:
        raise ValueError("fleiss_kappa requires raters >= 2")
    cells = scoped_persist(
        df.where(F.col(cat_col).isNotNull())
        .groupBy(
            F.col(item_col).alias("__i"), F.col(cat_col).alias("__c")
        )
        .agg(F.count(F.lit(1)).alias("__n")),
        "evaluation.fleiss_cells",
        eager=True,
    )
    per_item = scoped_persist(
        cells.groupBy("__i").agg(
            F.sum("__n").alias("__r"),
            F.sum(F.col("__n") * F.col("__n")).alias("__s2"),
        ),
        "evaluation.fleiss_per_item",
        eager=True,
    )
    tot = per_item.agg(
        F.count(F.when(F.col("__r") == r, 1)).cast("bigint").alias(
            "n_items"
        ),
        F.count(F.when(F.col("__r") != r, 1)).cast("bigint").alias(
            "n_excluded"
        ),
        F.coalesce(
            F.sum(F.when(F.col("__r") == r, F.col("__s2"))), F.lit(0)
        )
        .cast("bigint")
        .alias("s2"),
    )
    kept = per_item.where(F.col("__r") == r).select("__i")
    cm = (
        cells.join(kept, "__i")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__m"))
        .agg(
            F.coalesce(F.sum(F.col("__m") * F.col("__m")), F.lit(0))
            .cast("bigint")
            .alias("cross_mass")
        )
    )
    p_bar = (F.col("s2") - F.col("n_items") * r).cast("double") / (
        F.col("n_items") * r * (r - 1)
    )
    p_e = F.col("cross_mass").cast("double") / (
        (F.col("n_items") * r).cast("double")
        * (F.col("n_items") * r).cast("double")
    )
    return tot.crossJoin(cm).select(
        "n_items",
        "n_excluded",
        F.when(F.col("n_items") > 0, F.round(p_bar, 6)).alias("p_bar"),
        F.when(F.col("n_items") > 0, F.round(p_e, 6)).alias("p_e"),
        F.when(
            (F.col("n_items") > 0) & (p_e < 1.0),
            F.round((p_bar - p_e) / (F.lit(1.0) - p_e), 6),
        ).alias("kappa"),
    )


def krippendorff_alpha(
    df: DataFrame, item_col: str, cat_col: str
) -> DataFrame:
    """Krippendorff's alpha for nominal data — the chance-corrected
    agreement estimator for RAGGED panels (Krippendorff 2004):
    :func:`fleiss_kappa` excludes items whose rating count differs from
    the declared panel size; alpha is what you run when missing
    ratings are by design (crowdsourced labels, partial re-annotation).
    Input is the same LONG format (one row per (item, category)).

        D_o = (1/n) * sum_i sum_c n_ic (r_i - n_ic) / (r_i - 1)
        D_e = sum_c m_c (n - m_c) / (n (n - 1))
        alpha = 1 - D_o / D_e = 1 - U (n - 1) / E

    over items with r_i >= 2 non-NULL ratings (pairable); items with
    exactly one rating are counted in ``n_unpairable`` (items with
    zero ratings never appear). n = total pairable ratings, m_c the
    category marginals over pairable items.

    Exactness: per-item disagreement d_i = r_i^2 - sum_c n_ic^2 is
    BIGINT; grouping by the PANEL SIZE r_i collapses the corpus to
    <= |distinct panel sizes| rows, each term S_r / (r - 1) rounded to
    6 then decimal-summed (the DCG pattern — identical terms in both
    engines, order-independent fold; a float mean over corpus-many
    per-item quotients would be the cross-engine hash-breaker). E =
    sum m_c (n - m_c) is BIGINT (exact for n up to ~3e9 ratings);
    alpha = 1 - U (n-1) / E is two IEEE ops.

    Scale: the fleiss_kappa shape — one corpus aggregate to (item,
    category) cells, an item-keyed fold, marginals via an item-keyed
    join back to the cells; everything after is metadata-sized.
    Output one row: (n_items, n_unpairable, n_ratings, d_o, d_e,
    alpha) rounded to 6; alpha NULL when D_e = 0 (a single observed
    category).
    """
    cells = scoped_persist(
        df.where(F.col(cat_col).isNotNull())
        .groupBy(
            F.col(item_col).alias("__i"), F.col(cat_col).alias("__c")
        )
        .agg(F.count(F.lit(1)).alias("__n")),
        "evaluation.kripp_cells",
        eager=True,
    )
    per_item = scoped_persist(
        cells.groupBy("__i").agg(
            F.sum("__n").alias("__r"),
            F.sum(F.col("__n") * F.col("__n")).alias("__s2"),
        ),
        "evaluation.kripp_per_item",
        eager=True,
    )
    pairable = F.col("__r") >= 2
    # U = sum over distinct panel sizes of round6(S_r / (r - 1)),
    # decimal-folded: <= |panel sizes| exact terms.
    by_r = (
        per_item.where(pairable)
        .groupBy("__r")
        .agg(
            F.sum(F.col("__r") * F.col("__r") - F.col("__s2")).alias("__sr")
        )
        .agg(
            F.sum(
                F.round(
                    F.col("__sr").cast("double") / (F.col("__r") - 1), 6
                ).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("u")
        )
    )
    tot = per_item.agg(
        F.count(F.when(pairable, 1)).cast("bigint").alias("n_items"),
        F.count(F.when(~pairable, 1)).cast("bigint").alias("n_unpairable"),
        F.coalesce(F.sum(F.when(pairable, F.col("__r"))), F.lit(0))
        .cast("bigint")
        .alias("n_ratings"),
    )
    kept = per_item.where(pairable).select("__i")
    marg = (
        cells.join(kept, "__i")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__m"))
    )
    # E needs n; fold marginals to sum(m) (= n) and sum(m^2):
    # E = sum m (n - m) = n * sum(m) - sum(m^2) = n^2 - sum(m^2).
    e_parts = marg.agg(
        F.coalesce(F.sum(F.col("__m") * F.col("__m")), F.lit(0))
        .cast("bigint")
        .alias("m2")
    )
    n = F.col("n_ratings")
    e = n * n - F.col("m2")
    d_o = F.col("u") / n
    d_e = e.cast("double") / (n.cast("double") * (n - 1).cast("double"))
    alpha = F.lit(1.0) - F.col("u") * (n - 1).cast("double") / e.cast(
        "double"
    )
    return tot.crossJoin(by_r).crossJoin(e_parts).select(
        "n_items",
        "n_unpairable",
        "n_ratings",
        F.when(n >= 2, F.round(d_o, 6)).alias("d_o"),
        F.when(n >= 2, F.round(d_e, 6)).alias("d_e"),
        F.when((n >= 2) & (e > 0), F.round(alpha, 6)).alias("alpha"),
    )


def bt_strength(
    df: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 3,
) -> DataFrame:
    """Bradley-Terry strength scores from pairwise preference outcomes
    (Hunter 2004 MM updates, fixed iteration count) — the QC gate for a
    preference/RLHF corpus: which policies/annotators/model variants
    does the comparison data actually rank, and how separated are they.
    Input is one row per comparison (winner, loser).

        p_i <- W_i / sum_j n_ij / (p_i + p_j)     (one MM round)

    with W_i = total wins, n_ij = games between i and j. Iterations
    are a FIXED parameter (the kmeans_lloyd convention): the plan
    unrolls deterministically and a DuckDB oracle can replay every
    round. Per-round discipline: the n_ij/(p_i+p_j) terms are rounded
    to 6 then decimal-summed (order-independent fold over an item's
    opponents), p is re-rounded to 6 each round and clamped to 1e-6
    for winners (a winner whose score rounds to 0 against a 0-win
    opponent would otherwise produce a 0/0 in the next round);
    zero-win items hold strength 0 (their MLE). Output strengths are
    normalized once at the end to mean 1 (decimal-exact total of
    6-decimal scores).

    Scale: ONE corpus aggregate to the directed (winner, loser, n)
    cells — the only corpus-sized stage; everything after operates on
    the |items|^2-bounded games table (items are models/policies —
    metadata-sized by construction) with a per-round eager
    localCheckpoint keeping the unrolled plan flat. Output: (item,
    wins, games, strength) ordered by strength desc, item; rows with a
    NULL side or winner == loser are ignored.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    w_c, l_c = F.col(winner_col), F.col(loser_col)
    wl = scoped_persist(
        df.where(w_c.isNotNull() & l_c.isNotNull() & (w_c != l_c))
        .groupBy(w_c.alias("__w"), l_c.alias("__l"))
        .agg(F.count(F.lit(1)).alias("__n")),
        "evaluation.bt_cells",
        eager=True,
    )
    games = scoped_persist(
        wl.select(F.col("__w").alias("i"), F.col("__l").alias("j"), "__n")
        .unionByName(
            wl.select(F.col("__l").alias("i"), F.col("__w").alias("j"), "__n")
        )
        .groupBy("i", "j")
        .agg(F.sum("__n").alias("n")),
        "evaluation.bt_games",
        eager=True,
    )
    # Loop-invariant hoist: wins never changes across rounds, but as a
    # plain subtree it re-aggregated from the cells cache inside EVERY
    # round's checkpoint action plus the final select (iterations+1
    # re-runs). One eager checkpoint of the items-sized table replaces
    # them; values identical (same aggregate, materialized once).
    wins = (
        wl.groupBy(F.col("__w").alias("i"))
        .agg(F.sum("__n").cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    p = (
        games.select("i")
        .distinct()
        .select("i", F.lit(1.0).alias("p"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("pj"))
        d = (
            games.join(p, "i")
            .join(pj, "j")
            .select(
                "i",
                F.round(F.col("n") / (F.col("p") + F.col("pj")), 6)
                .cast("decimal(28,6)")
                .alias("t"),
            )
            .groupBy("i")
            .agg(F.sum("t").cast("double").alias("d"))
        )
        p = (
            d.join(wins, "i", "left")
            .select(
                "i",
                F.when(
                    F.col("w").isNotNull() & (F.col("d") > 0),
                    F.greatest(
                        F.round(F.col("w") / F.col("d"), 6), F.lit(1e-6)
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    tot = p.agg(
        F.sum(F.col("p").cast("decimal(18,6)")).cast("double").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    tgames = games.groupBy("i").agg(F.sum("n").cast("bigint").alias("games"))
    return (
        p.crossJoin(F.broadcast(tot))
        .join(wins, "i", "left")
        .join(tgames, "i")
        .select(
            F.col("i").alias("item"),
            F.coalesce(F.col("w"), F.lit(0)).cast("bigint").alias("wins"),
            "games",
            F.when(
                F.col("s") > 0,
                F.round(F.col("p") * F.col("k") / F.col("s"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("strength"),
        )
        .orderBy(F.col("strength").desc(), "item")
    )
