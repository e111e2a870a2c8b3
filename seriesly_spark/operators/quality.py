"""Trainable text-quality scorer: hashed bag-of-ngrams logistic
regression trained by FULL-BATCH gradient descent with a fixed,
unrolled number of rounds — closing the train -> score -> evaluate
loop that the heuristic scorers (stopword ratio, Gopher rules, bigram
LM perplexity) leave open. The fastText/CCNet-style quality classifier
reduced to its distributable core: a linear model over hashed n-gram
frequencies.

Determinism contract (the kmeans_lloyd / bt_strength convention):
``rounds`` is a fixed parameter so the plan unrolls deterministically
and a DuckDB oracle replays every round. Per-round discipline: every
cross-row sum (the per-doc logit fold and the per-bucket gradient
fold) rounds its terms to 6 decimals, accumulates in decimal(28,6)
(order-independent), and re-rounds the weights to 6 after the update —
libm ulp drift in exp() is absorbed at each round boundary instead of
compounding through the training trajectory.

Scale shape: the corpus collapses ONCE to one row per document
carrying its (bucket, frequency) array — the only exchanged rows are
(id, bucket:int) with map-side-combined counts; text never shuffles —
and the persisted table is the only corpus-sized state. Each round is a
single narrow pass: the logit is an in-row array fold against the
weight vector embedded as a LITERAL array (O(1) element_at per term —
no join, no per-doc shuffle), and the gradient explode partial-
aggregates to <= buckets+1 rows per partition before a tiny exchange.
Weights live on the driver between rounds (<= buckets+1 doubles — the
kmeans/BPE round-state boundary), so per round the cluster does
exactly ONE scan of the persisted features.

The literal-vector path assumes buckets is hash-scale (<=
LITERAL_MAX_BUCKETS = 10^4); beyond that the plan itself carries the
weight vector and planning blows up before any data moves. Both
trainer and scorer therefore take ``impl``: "literal" (above),
"join" — the weight table stays a DataFrame and rides every round as
a BROADCAST hash join against the exploded features, which are
persisted pre-partitioned by doc id ONCE so the per-doc logit fold
and the error join both reuse that partitioning (no per-round
exchange of corpus-sized rows; the only per-round shuffle is the
<= buckets+1-row gradient) — or "auto" (default), which picks by
``buckets``. The two paths are BIT-IDENTICAL by construction: every
cross-row sum is the same round-6 decimal fold, order-independent,
so join-order vs array-order cannot diverge (equivalence-gated in
tests, the impl="pandas"/"expr" convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.textstats import tokens
from seriesly_spark.operators.util import scoped_persist, spread

_DEC6 = "decimal(28,6)"
BIAS_BUCKET = -1
# Widest hash space the literal-array logit may carry in the plan;
# beyond this, impl="auto" switches to the broadcast-join path.
LITERAL_MAX_BUCKETS = 10_000


def _md5_bucket(f: Column, buckets: int) -> Column:
    """sampling._md5_u16 ('qlr' salt) % buckets, written as ONE md5
    call: the first-4-hex-nibbles fold IS base-16 of the first 4 hex
    chars, so conv(substr(md5, 1, 4), 16, 10) computes the identical
    value (oracles keep the nibble formula; same arithmetic). Lambda
    bodies evaluate interpreted — no codegen subexpression
    elimination — so the 4-nibble form would run md5 four times per
    feature (measured ~3x slower on the feature build)."""
    h = F.md5(F.concat(F.lit("qlr"), f.cast("string")).cast("binary"))
    return (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % buckets
    ).cast("int")


def _lr_doc_features(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str | None,
    buckets: int,
    label_type: str = "double",
    keep_null_labels: bool = False,
) -> DataFrame:
    """One row per featured document: (id, y, fs) with fs an array of
    (b, x) — unigram+bigram counts (the dsir_scores feature set)
    md5-folded into ``buckets`` (salt 'qlr', engine-portable),
    normalized by the doc's total feature count, bias term appended as
    (b = -1, x = 1). Docs with NULL text yield no features and are
    absent (excluded from training; scored NULL). When labels are in
    play (training), NULL-label docs are excluded too — a NULL label
    is no supervision, and left in it would both poison the decimal
    gradient folds (NULL-propagating sums) and inflate the batch
    size. ``keep_null_labels=True`` keeps them (y rides as NULL) so
    ONE feature build can serve both a trainer (which re-applies the
    NULL filter — feature rows are per-doc independent, so filtering
    before or after the build yields identical rows) and a scorer
    (which ignores y): the train->score compositions in the registry
    pay the text+hash pass once instead of twice."""
    t = tokens(text_col)
    y = (
        F.col(label_col).cast(label_type)
        if label_col is not None
        else F.lit(0.0)
    )
    pre = spread(docs).select(
        F.col(id_col).alias("id"), y.alias("y"), t.alias("__t")
    )
    if label_col is not None and not keep_null_labels:
        pre = pre.where(F.col("y").isNotNull())
    uni = F.col("__t")
    bi = F.when(
        F.size("__t") >= 2,
        F.transform(
            F.slice("__t", 1, F.size("__t") - 1),
            lambda x, i: F.concat_ws(" ", x, F.col("__t")[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Feature strings are bucketed to an INT in the same narrow select
    # as the explode, so the only shuffled rows are (id, y, b:int) with
    # the (id, b) occurrence counts partially aggregated map-side —
    # text-scale data never reaches an exchange. (An in-row
    # sort+run-length build avoids the two keyed aggs entirely but
    # measured ~1.9x SLOWER: higher-order-function lambdas evaluate
    # interpreted, outside codegen, and lose to the tiny int shuffle.)
    cnt = (
        pre.select(
            "id",
            "y",
            F.explode(F.concat(uni, bi)).alias("__f"),
        )
        .select("id", "y", _md5_bucket(F.col("__f"), buckets).alias("b"))
        .groupBy("id", "y", "b")
        .agg(F.count("*").alias("m"))
    )
    fs = F.concat(
        F.transform(
            F.col("__bm"),
            lambda e: F.struct(
                e["b"].alias("b"), (e["m"] / F.col("__nf")).alias("x")
            ),
        ),
        F.array(
            F.struct(F.lit(BIAS_BUCKET).alias("b"), F.lit(1.0).alias("x"))
        ),
    )
    return (
        cnt.groupBy("id", "y")
        .agg(
            F.sum("m").alias("__nf"),
            F.collect_list(F.struct("b", "m")).alias("__bm"),
        )
        .select("id", "y", fs.alias("fs"))
    )


def _weight_vec(w: list[float]) -> Column:
    """The weight vector as a literal array column, indexed by
    bucket + 2 (1-based element_at; bucket -1 = bias sits first)."""
    return F.array(*[F.lit(float(v)) for v in w])


def _logit(fs: Column, wvec: Column) -> Column:
    """In-row logit: round-6 terms, decimal(28,6) fold, double out —
    the same fold the DuckDB oracle replays as a grouped sum."""
    return F.aggregate(
        fs,
        F.lit(0).cast(_DEC6),
        lambda acc, e: (
            acc
            + F.round(
                F.element_at(wvec, e["b"] + F.lit(2)) * e["x"], 6
            ).cast(_DEC6)
        ).cast(_DEC6),
    ).cast("double")


def _sigmoid6(z) -> Column:
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def _resolve_impl(impl: str, buckets: int) -> str:
    if impl == "auto":
        return "literal" if buckets <= LITERAL_MAX_BUCKETS else "join"
    if impl not in ("literal", "join"):
        raise ValueError('impl must be "auto", "literal" or "join"')
    return impl


def _weight_df(spark, w: list[float]) -> DataFrame:
    """(b, w) weight table for the join path, built as ONE partition
    (driver-sized rows; createDataFrame(list) would spray 32 tasks)."""
    rows = [(i + BIAS_BUCKET, float(w[i])) for i in range(len(w))]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "b int, w double"
    )


def _exploded_features(feats: DataFrame, scope: str) -> DataFrame:
    """(id, y, b, x) exploded feature rows persisted PRE-PARTITIONED
    by doc id — paid once, so every join-path round's per-doc logit
    aggregate and error join reuse the partitioning instead of
    exchanging corpus-sized rows per round."""
    ex = feats.select("id", "y", F.explode("fs").alias("f")).select(
        "id", "y", F.col("f.b").alias("b"), F.col("f.x").alias("x")
    )
    return scoped_persist(ex.repartition("id"), scope, eager=True)


def _join_z(ex: DataFrame, wdf: DataFrame) -> Column:
    """(id, y, z): the per-doc logit via a BROADCAST join against the
    weight table — the same round-6 terms folded in decimal(28,6) as
    :func:`_logit`'s in-row array fold, order-independent, so the two
    paths are bit-identical."""
    return (
        ex.join(F.broadcast(wdf), "b")
        .groupBy("id", "y")
        .agg(
            F.sum(F.round(F.col("w") * F.col("x"), 6).cast(_DEC6))
            .cast("double")
            .alias("z")
        )
    )


def train_quality_lr(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    rounds: int = 3,
    lr: float = 2.0,
    impl: str = "auto",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Train the hashed-ngram logistic regression on binary labels.

    ``feats``: optional precomputed feature table from
    ``_lr_doc_features(..., keep_null_labels=True)`` at the SAME
    ``buckets`` width and label column (the caller's contract) —
    train->score compositions pass one persisted build so the
    text+hash pass is paid once; the trainer re-applies the
    NULL-label filter, which commutes with the per-doc-independent
    feature build.

    Per round (full batch, N = number of featured docs):

        z_d = sum_b w_b x_db          p_d = sigmoid(z_d)
        g_b = sum_d (p_d - y_d) x_db  w_b <- round(w_b - lr g_b / N, 6)

    Output: (bucket, weight) — ``buckets`` hashed features plus the
    bias row at bucket -1, ordered by bucket. Weights start at 0 (the
    symmetric init is exact, not a seed).

    ``impl``: "literal" rides the weights as an in-plan literal array
    (hash-scale buckets), "join" as a broadcast-joined weight table
    over id-prepartitioned exploded features (the > 10^4-bucket scale
    path; bit-identical — module docstring), "auto" picks by
    ``buckets`` vs LITERAL_MAX_BUCKETS.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    mode = _resolve_impl(impl, buckets)
    spark = docs.sparkSession
    if feats is None:
        feats = scoped_persist(
            _lr_doc_features(docs, text_col, id_col, label_col, buckets),
            "quality.lr_feats",
            eager=True,
        )
    else:
        feats = feats.where(F.col("y").isNotNull())
    n = feats.count()
    ex = (
        _exploded_features(feats, "quality.lr_feats_ex")
        if mode == "join" and n > 0
        else None
    )
    w = [0.0] * (buckets + 1)
    # No featured docs (empty input / all-NULL text or labels): GD
    # with an empty batch makes no update, so the symmetric init IS
    # the trained model — return it rather than raising (the
    # empty-input convention: an empty pruned subset is an everyday
    # production shape, and every round would otherwise divide by 0).
    training_rounds = range(rounds) if n > 0 else ()
    for _ in training_rounds:
        if mode == "literal":
            wvec = _weight_vec(w)
            err = (
                _sigmoid6(_logit(F.col("fs"), wvec)) - F.col("y")
            ).alias("e")
            # e is computed in its OWN projection below the Generate —
            # put in the same select as the explode, CollapseProject
            # inlines the whole logit fold into the generator's
            # project list and re-evaluates it per exploded element
            # (measured ~6x here; the substring_dup projection-
            # boundary lesson)
            grad = (
                feats.select("fs", err)
                .select("e", F.explode("fs").alias("f"))
                .select(
                    F.col("f.b").alias("b"),
                    F.round(F.col("e") * F.col("f.x"), 6)
                    .cast(_DEC6)
                    .alias("t"),
                )
                .groupBy("b")
                .agg(F.sum("t").cast("double").alias("g"))
                .collect()
            )
        else:
            errf = _join_z(ex, _weight_df(spark, w)).select(
                "id", (_sigmoid6(F.col("z")) - F.col("y")).alias("e")
            )
            grad = (
                ex.join(errf, "id")
                .select(
                    "b",
                    F.round(F.col("e") * F.col("x"), 6)
                    .cast(_DEC6)
                    .alias("t"),
                )
                .groupBy("b")
                .agg(F.sum("t").cast("double").alias("g"))
                .collect()
            )
        g = {r.b: r.g for r in grad}
        w = [
            round(w[i] - lr * g.get(i + BIAS_BUCKET, 0.0) / n, 6)
            for i in range(buckets + 1)
        ]
    rows = [(i + BIAS_BUCKET, w[i]) for i in range(buckets + 1)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "bucket int, weight double"
    ).orderBy("bucket")


def score_quality_lr(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int | None = None,
    impl: str = "auto",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Score every document with a trained weight table ((bucket,
    weight) — ``train_quality_lr``'s output shape): score =
    round(sigmoid(sum_b w_b x_db), 6), the same per-term round-6
    decimal fold as training so any engine replays it. On the
    "literal" path the weight table collects to the driver (<=
    buckets+1 rows — metadata) and scores as an in-row literal-array
    fold: no join, no shuffle, one narrow pass. On the "join" path
    (``impl`` — "auto" picks by trained width vs LITERAL_MAX_BUCKETS)
    the weight table NEVER touches the driver: exploded features
    broadcast-join it and fold per doc — the > 10^4-bucket scale
    path, bit-identical (module docstring). Docs with no features
    (NULL text) score NULL. Output: (id_col, score).

    ``buckets`` must equal the training-time hash width — scoring in a
    different space silently misaligns every feature — so by default
    it is DERIVED from the weight table itself (max bucket + 1); pass
    it only as an assertion, where a mismatch raises. The derivation
    is only sound on a DENSE table (``train_quality_lr`` emits one row
    per bucket from -1..buckets-1, zero-weight rows included), so
    density is VALIDATED — as one aggregate, not a collect, so the
    check itself scales: a sparse table — e.g. zero-weight rows
    pruned by a storage step — would silently shrink the derived width
    and misalign every feature, so it raises instead."""
    stat = weights.agg(
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("bucket").alias("nd"),
    ).collect()[0]
    n_rows = int(stat.n)
    trained = int(stat.hi) + 1 if n_rows else 0
    # dense over -1..trained-1 <=> min is the bias bucket, every value
    # distinct, and the count fills the range exactly
    if (
        n_rows == 0
        or int(stat.lo) != BIAS_BUCKET
        or int(stat.nd) != n_rows
        or n_rows != trained + 1
    ):
        raise ValueError(
            "weight table is not dense over buckets "
            f"{BIAS_BUCKET}..{trained - 1} (got {n_rows} rows); "
            "a pruned/sparse table misaligns the hash space — "
            "re-materialize zero-weight rows before scoring"
        )
    if buckets is None:
        buckets = trained
    elif buckets != trained:
        raise ValueError(
            f"buckets={buckets} does not match the weight table's "
            f"trained hash width {trained}"
        )
    mode = _resolve_impl(impl, buckets)
    if feats is None:
        feats = _lr_doc_features(docs, text_col, id_col, None, buckets)
    if mode == "literal":
        w = [0.0] * (buckets + 1)
        for r in weights.select("bucket", "weight").collect():
            w[int(r.bucket) - BIAS_BUCKET] = float(r.weight)
        scores = feats.select(
            "id",
            _sigmoid6(_logit(F.col("fs"), _weight_vec(w))).alias("score"),
        )
    else:
        ex = feats.select("id", "y", F.explode("fs").alias("f")).select(
            "id", "y", F.col("f.b").alias("b"), F.col("f.x").alias("x")
        )
        wdf = weights.select(
            F.col("bucket").alias("b"), F.col("weight").alias("w")
        )
        scores = _join_z(ex, wdf).select(
            "id", _sigmoid6(F.col("z")).alias("score")
        )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scores, "id", "left")
        .select(F.col("id").alias(id_col), "score")
    )


def train_lang_lr(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    rounds: int = 3,
    lr: float = 2.0,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Multi-class TRAINED language ID: softmax (multinomial) logistic
    regression over the same hashed uni+bigram features as
    :func:`train_quality_lr`, full-batch GD with a fixed unrolled
    round count — upgrading the intake ladder's weakest stage (the
    ``textstats.lang_id`` stopword heuristic) to a trained model the
    existing ``lang_confusion`` machinery can grade.

    Classes are the sorted distinct non-NULL labels (collected once —
    metadata, <= #languages rows). Per round, with K classes and
    N featured docs:

        z_dc  = sum_b w_cb x_db                       (decimal fold)
        ez_dc = round(exp(z_dc - max_c' z_dc'), 6)    (max-stabilized)
        p_dc  = round(ez_dc / sum_c' ez_dc', 6)
        g_cb  = sum_d (p_dc - [y_d = c]) x_db         (decimal fold)
        w_cb <- round(w_cb - lr g_cb / N, 6)

    Softmax parity discipline: the per-doc max logit is subtracted
    before exp (the largest term is exactly 1.0, so the decimal cast
    can never overflow to NULL and the denominator can never round to
    0 — without it a z > ~51 would silently drop the doc from the
    gradient), each exp term is rounded to 6 BEFORE the denominator
    fold, and the denominator accumulates in decimal(28,6) — so it is
    order-independent and any engine replays p_dc exactly (a double
    sum of raw exp() terms would depend on class addition order). Weights re-round to 6 per update, the
    ``train_quality_lr`` trajectory convention. Driver boundary per
    round: one K x (buckets+1) gradient collect (the kmeans/BPE round
    state). Scale shape is the binary trainer's: text collapses once
    to the persisted per-doc feature arrays; each round is ONE narrow
    scan (K in-row logit folds against literal weight vectors, then a
    features x K explode partially aggregated map-side).

    Output: (lang, bucket, weight) — dense over bucket -1..buckets-1
    per class, ordered by (lang, bucket).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if feats is None:
        feats = scoped_persist(
            _lr_doc_features(
                docs,
                text_col,
                id_col,
                label_col,
                buckets,
                label_type="string",
            ),
            "quality.lang_feats",
            eager=True,
        )
    else:
        # shared unfiltered build (keep_null_labels=True): re-apply
        # the no-supervision filter; commutes with the per-doc-
        # independent feature build (``feats`` docstring contract
        # in :func:`train_quality_lr`).
        feats = feats.where(F.col("y").isNotNull())
    n = feats.count()
    classes = sorted(
        r[0] for r in feats.select("y").distinct().collect()
    )
    w = {c: [0.0] * (buckets + 1) for c in classes}
    training_rounds = range(rounds) if n > 0 and classes else ()
    for _ in training_rounds:
        # The K logit folds land in their OWN projection as named
        # columns: zmax and every ez reference each z column twice+,
        # and duplicated non-cheap expressions must not re-inline
        # (the train_quality_lr CollapseProject lesson, squared —
        # K x K fold copies otherwise).
        zcols = feats.select(
            "y",
            "fs",
            *[
                _logit(F.col("fs"), _weight_vec(w[c])).alias(f"__z{i}")
                for i, c in enumerate(classes)
            ],
        )
        zrefs = [F.col(f"__z{i}") for i in range(len(classes))]
        # Max-stabilized softmax: exp(z - zmax) keeps the largest term
        # at exactly 1.0, so the denominator can neither overflow the
        # decimal cast (exp(z) > 1e22 would cast to NULL and silently
        # DROP the doc from the gradient while n still counts it) nor
        # round to 0 (den >= 1 always). zmax is an exact double max of
        # identical values on every engine, so parity survives.
        zmax = F.greatest(*zrefs) if len(zrefs) > 1 else zrefs[0]
        ezs = [F.round(F.exp(z - zmax), 6) for z in zrefs]
        den = F.aggregate(
            F.array(*ezs),
            F.lit(0).cast(_DEC6),
            lambda acc, e: (acc + e.cast(_DEC6)).cast(_DEC6),
        ).cast("double")
        errs = F.array(
            *[
                F.round(ez / den, 6)
                - F.when(F.col("y") == c, F.lit(1.0)).otherwise(F.lit(0.0))
                for c, ez in zip(classes, ezs)
            ]
        )
        # errs is computed in its OWN projection below the Generate:
        # inlined into a generator's project list, the softmax would
        # re-evaluate per exploded element. The per-class gradients
        # fold as K decimal SUM COLUMNS over the single feature
        # explode — one exploded row per (doc, feature) instead of the
        # K x that a second posexplode over the error array would
        # multiply it to; same round-6 terms, same order-independent
        # decimal folds, K x fewer generated rows.
        grad = (
            zcols.select("fs", errs.alias("es"))
            .select("es", F.explode("fs").alias("f"))
            .select(
                F.col("f.b").alias("b"),
                F.col("f.x").alias("x"),
                "es",
            )
            .groupBy("b")
            .agg(
                *[
                    F.sum(
                        F.round(F.col("es")[i] * F.col("x"), 6).cast(
                            _DEC6
                        )
                    )
                    .cast("double")
                    .alias(f"g{i}")
                    for i in range(len(classes))
                ]
            )
            .collect()
        )
        g = {
            (c, r.b): r[f"g{i}"]
            for r in grad
            for i, c in enumerate(classes)
        }
        w = {
            c: [
                round(
                    w[c][i] - lr * g.get((c, i + BIAS_BUCKET), 0.0) / n, 6
                )
                for i in range(buckets + 1)
            ]
            for c in classes
        }
    spark = docs.sparkSession
    rows = [
        (c, i + BIAS_BUCKET, w[c][i])
        for c in classes
        for i in range(buckets + 1)
    ]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows or [("", -2, 0.0)], 1),
        "lang string, bucket int, weight double",
    ).where(F.col("bucket") >= BIAS_BUCKET).orderBy("lang", "bucket")


def score_lang_lr(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    feats: DataFrame | None = None,
) -> DataFrame:
    """Predict each document's language with a trained softmax weight
    table (``train_lang_lr``'s (lang, bucket, weight) shape): argmax
    over the per-class decimal logit folds — softmax is monotone in z,
    so scoring needs NO exp() at all and the argmax compares exact
    decimal-fold doubles (deterministic cross-engine; ties break to
    the smallest language code). The weight table collects to the
    driver (K x (buckets+1) rows — metadata; density per class
    validated like ``score_quality_lr``) and scores as K in-row
    literal-vector folds: no join, no shuffle, one narrow pass. Docs
    with no features (NULL text) predict NULL.
    Output: (id_col, lang_pred).
    """
    wrows = weights.select("lang", "bucket", "weight").collect()
    classes = sorted({r.lang for r in wrows})
    if not classes:
        raise ValueError("empty weight table")
    trained = max(int(r.bucket) for r in wrows) + 1
    by_class: dict[str, list[float]] = {
        c: [0.0] * (trained + 1) for c in classes
    }
    seen: dict[str, list[int]] = {c: [] for c in classes}
    for r in wrows:
        by_class[r.lang][int(r.bucket) - BIAS_BUCKET] = float(r.weight)
        seen[r.lang].append(int(r.bucket))
    for c in classes:
        if sorted(seen[c]) != list(range(BIAS_BUCKET, trained)):
            raise ValueError(
                f"weight table is not dense for class {c!r} over "
                f"buckets {BIAS_BUCKET}..{trained - 1}; a pruned/sparse "
                "table misaligns the hash space"
            )
    if feats is None:
        feats = _lr_doc_features(docs, text_col, id_col, None, trained)
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (-_logit(F.col("fs"), _weight_vec(by_class[c]))).alias(
                        "nz"
                    ),
                    F.lit(c).alias("lang"),
                )
                for c in classes
            ]
        )
    )
    scores = feats.select("id", best["lang"].alias("lang_pred"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scores, "id", "left")
        .select(F.col("id").alias(id_col), "lang_pred")
    )
