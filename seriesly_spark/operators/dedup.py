"""Deduplication operators for large-scale document pipelines.

These go beyond the reference's surface (it has no joins or dedup at all —
SURVEY §2.3 "what the reference does NOT have") and are designed for the
100 TB case:

  * exact dedup: hash the content to a fixed-width digest *before* the
    shuffle, so the groupBy moves 16-byte keys instead of document bodies,
    and partial aggregation combines map-side.
  * minhash-LSH: shingle -> per-band min-hash signature -> self-join on
    (band, signature). Signatures are md5 hex strings (portable across
    engines); the join key space is tiny relative to the corpus so AQE can
    handle skew. Candidate pairs then get an exact Jaccard verification.
  * n-gram Jaccard: shingle explode -> self-join on shingle -> per-pair
    intersection counts vs precomputed set sizes. The explode blow-up is
    bounded by shingle count per doc; the join is an equi-join on the
    shingle hash (shuffle co-location, no cross product).
  * SimHash: per-token hashes folded into a fixed-width bit-majority
    fingerprint; near-dups = fingerprints within a Hamming radius, found by
    banding the fingerprint (pigeonhole) instead of pairwise comparison.

Everything is built-in Column expressions (no Python UDFs): md5 / xxhash64,
explode, groupBy — all whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.textstats import tokens
from seriesly_spark.operators.util import scoped_persist, spread


def content_hash(c) -> "F.Column":
    return F.md5(c.cast("binary"))


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Survivor ids: the minimum id per exact content hash."""
    return (
        docs.groupBy(content_hash(F.col(text_col)).alias("h"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def dedup_best(
    docs: DataFrame,
    score_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivor ids per exact content hash, keeping the BEST duplicate
    instead of the arbitrary lowest id — the survivorship policy a real
    curation run wants (among byte-identical scrapes keep the one with
    the richest metadata / longest cleaned form / highest quality
    score). Ties break on the smaller id, so the pick is deterministic
    and engine-portable.

    Same scale shape as :func:`dedup_exact`: md5 before the shuffle
    (16-byte keys move, bodies don't), ONE hash aggregate — ``max_by``
    over (score, -id) collapses map-side, no window, no second pass.
    NULL scores lose to any non-NULL score (struct comparison); an
    all-NULL group falls back to the id tiebreak.
    """
    pick = F.max_by(
        F.col(id_col),
        F.struct(
            F.col(score_col).alias("s"), (-F.col(id_col)).alias("t")
        ),
    )
    return (
        docs.groupBy(content_hash(F.col(text_col)).alias("h"))
        .agg(pick.alias(id_col))
        .select(id_col)
    )


def word_shingles(text_col: str, n: int = 3) -> "F.Column":
    """Distinct word n-grams of the whitespace-tokenized text (JVM-side)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.when(k > 0, grams).otherwise(F.array()))


def _window_hash_expr(n: int, otherwise: "F.Column | None" = None):
    """Window-identity hashes over the materialized token-hash array:
    the shared inner expression of every positional-gram operator
    (``_shingle_sets``, ``substring_dup_stats``, ``dup_span_stats``,
    ``dedup_spans``). Expects the frame to carry ``__th`` (per-token
    xxhash64 array — hash each token ONCE; hashing window TEXT
    re-touches every character n times, measured 2.5x slower) and
    ``__nt`` (token count). CaseWhen evaluates only the matched
    branch, so ``sequence()`` never sees a negative upper bound on
    short documents; ``otherwise`` overrides the short-doc sentinel
    (default: empty array — explode drops the doc)."""
    w = F.when(
        F.col("__nt") >= n,
        F.transform(
            F.sequence(F.lit(0), F.col("__nt") - n),
            lambda i: F.xxhash64(
                *[
                    F.element_at(F.col("__th"), i + F.lit(j + 1))
                    for j in range(n)
                ]
            ),
        ),
    )
    return w.otherwise(
        F.array().cast("array<bigint>") if otherwise is None else otherwise
    )


def _shingle_sets(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    scope: str,
    eager: bool = False,
) -> DataFrame:
    """Exploded distinct word-n-gram shingle table ``(id, sz, g)`` —
    the shared front half of every set-similarity miner (jaccard,
    containment). Shingle identity is xxhash64 over the window's TOKEN
    HASHES: each token is hashed once into a materialized array,
    windows combine n fixed-width longs, and distinctness/join keys
    live entirely in long-space — no window text is ever built (the
    concat-then-hash shape re-touched every character n times; measured
    3.7 s -> 0.64 s for this subtree at sf0.1). The key never leaves
    Spark (oracles brute-force on raw shingle sets) so engine
    portability doesn't apply; 64-bit collisions perturb counts at
    ~n²/2⁶⁵ odds — the same contract the join key already had. ONE
    select around the explode (size + explode of the same expression):
    a second select invites the CollapseProject re-inline pitfall (see
    substring_dup_stats), measured at 20 s for this identical subtree.
    persist(): lazy by the measured A/B in PLANS.md (cheap-but-large
    explode)."""
    toks = tokens(text_col)
    pre = spread(docs).select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("__th"),
        F.size(toks).alias("__nt"),
    )
    win = _window_hash_expr(n)
    gh = F.array_distinct(win)
    return scoped_persist(
        pre.select(
            "id", F.size(gh).alias("sz"), F.explode(gh).alias("g")
        ),
        scope,
        eager=eager,
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with word-n-gram Jaccard >= threshold.

    Plan shape: explode distinct shingles -> equi-join on the shingle hash
    (co-partitioned shuffle, no cross product) -> per-pair intersection
    count -> |A∪B| = |A|+|B|-|A∩B|. Output: a, b, round(jaccard, 6).

    ``max_df``: at corpus scale, ultra-frequent shingles ("of the the")
    appear in a large fraction of documents and make their join buckets
    quadratic — the standard mitigation is to drop shingles with document
    frequency above a cap before the join (they carry no dedup signal).
    This prunes the skewed buckets at the cost of slightly *underestimating*
    jaccard (set sizes still count the dropped shingles); leave None for
    the exact oracle-checked definition.
    """
    # capped path has THREE consumers (df agg + both join sides) racing
    # one action -> eager; the exact 2-consumer path stays lazy per the
    # measured sf0.1 A/B in PLANS.md
    exploded = _shingle_sets(
        docs, text_col, id_col, n, "dedup.ngram_exploded",
        eager=max_df is not None,
    )
    if max_df is not None:
        keep = (
            exploded.groupBy("g")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("g")
        )
        exploded = exploded.join(keep, "g")
    a = exploded.select(
        F.col("id").alias("a"), F.col("sz").alias("sza"), "g"
    )
    b = exploded.select(
        F.col("id").alias("b"), F.col("sz").alias("szb"), "g"
    )
    inter = (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "sza", "szb")
        .agg(F.count("*").alias("i"))
    )
    jac = F.col("i") / (F.col("sza") + F.col("szb") - F.col("i"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by shingle-set CONTAINMENT —
    ``C = |A∩B| / min(|A|, |B|)`` — the screen Jaccard misses: a short
    document fully embedded in a long one (quote farms, page-plus-
    boilerplate wrappers, partial scrapes) has tiny Jaccard (union is
    dominated by the long doc) but containment ~1. Broder's resemblance
    vs containment distinction; the dedup ladder runs BOTH.

    Identical scale shape to :func:`ngram_jaccard_pairs` — the shared
    exploded shingle table (token-hash identity, long-space keys),
    equi-join on the shingle hash, per-pair intersection count — only
    the final score divides by min(|A|,|B|) instead of the union.
    Output: (a, b, containment rounded to 6) for pairs a < b with
    containment >= threshold. ``max_df`` prunes ultra-frequent shingles
    before the join exactly as in ngram_jaccard_pairs (quadratic-bucket
    mitigation; slightly underestimates containment — the exact form is
    the oracle-checked default).
    """
    exploded = _shingle_sets(
        docs, text_col, id_col, n, "dedup.containment_exploded",
        eager=max_df is not None,
    )
    if max_df is not None:
        keep = (
            exploded.groupBy("g")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("g")
        )
        exploded = exploded.join(keep, "g")
    a = exploded.select(
        F.col("id").alias("a"), F.col("sz").alias("sza"), "g"
    )
    b = exploded.select(
        F.col("id").alias("b"), F.col("sz").alias("szb"), "g"
    )
    inter = (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "sza", "szb")
        .agg(F.count("*").alias("i"))
    )
    cont = F.col("i") / F.least(F.col("sza"), F.col("szb"))
    return (
        inter.withColumn("containment", F.round(cont, 6))
        .where(F.col("containment") >= F.lit(threshold))
        .select("a", "b", "containment")
    )


def minhash_chunk_signatures(grams_col, bands: int):
    """Array of ``bands`` per-band minhash signatures. Band k's
    signature is defined PER BAND as

        min over grams of substr(md5((k div 4) || '|' || gram),
                                 (k mod 4)*8 + 1, 8)

    — each md5 yields FOUR independent 8-hex-char (32-bit) minhash
    chunks, so ``bands`` bands cost ceil(bands/4) md5 evaluations per
    gram, and the whole vector is computed as ONE fold over the gram
    array (per-gram chunk vector, elementwise least into a running
    minimum) instead of ``bands`` separate array_min traversals.
    Measured 2.2x on the signature subtree at sf0.1 (the naive
    per-band form re-walks and re-allocates the gram array per band;
    md5 count was not the bottleneck). 32-bit chunks are standard for
    minhash permutations; oracles replay the per-band definition
    directly (md5 + substr exist in every engine)."""
    n_md5 = -(-bands // 4)
    chunks = F.transform(
        grams_col,
        lambda g: F.slice(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_md5 - 1)),
                    lambda j: F.transform(
                        F.sequence(F.lit(0), F.lit(3)),
                        lambda c: F.substring(
                            F.md5(
                                F.concat(
                                    j.cast("string"), F.lit("|"), g
                                ).cast("binary")
                            ),
                            c * 8 + 1,
                            8,
                        ),
                    ),
                )
            ),
            1,
            bands,
        ),
    )
    init = F.array_repeat(F.lit("zzzzzzzz"), bands)
    return F.aggregate(
        chunks,
        init,
        lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
    )


def minhash_doc_vectors(
    sh: DataFrame, n_hashes: int, id_col: str = "id"
) -> DataFrame:
    """(id, mh) per document, mh the ``n_hashes``-chunk minhash vector
    with the exact :func:`minhash_chunk_signatures` values — computed
    on EXPLODED gram rows so the md5/substring chunk columns run under
    whole-stage codegen and the per-hash minima fold as ``n_hashes``
    MIN aggregates in one hash aggregate, instead of the in-row
    higher-order fold (interpreted, one 32-element array allocation
    per gram — measured ~2.5x slower on the signature pass at sf0.1).
    Each md5 lands in its own projection so the four substring chunks
    reuse ONE evaluation (CollapseProject keeps non-cheap duplicated
    expressions un-inlined). The added map-side-combined exchange
    carries one (id, n_hashes x 8 chars) row per document — metadata
    next to the gram explosion feeding it. Input ``sh``: (id_col,
    grams) with non-empty grams; docs keep their one-row-per-doc
    contract."""
    n_md5 = -(-n_hashes // 4)
    g = F.col("__g")
    rows = sh.select(id_col, F.explode("grams").alias("__g")).select(
        id_col,
        *[
            F.md5(
                F.concat(F.lit(str(j)), F.lit("|"), g).cast("binary")
            ).alias(f"__m{j}")
            for j in range(n_md5)
        ],
    )
    # The MINs run over the chunks' NUMERIC value, not the hex string:
    # min(string) has an immutable agg-buffer type, which forces
    # SortAggregate (full sort of the exploded gram rows by id, no
    # map-side partial aggregation). Fixed-width lowercase hex orders
    # identically to its numeric value ('0'-'9' < 'a'-'f' tracks
    # 0-15), so min over conv(chunk, 16, 10) longs is the SAME minimum
    # — re-hexed per doc row afterwards (lpad 8 restores the fixed
    # width) for a bit-identical vector. Longs hash-aggregate with
    # map-side combine AND halve the per-chunk shuffle width (8-byte
    # long vs 16-byte padded UnsafeRow string).
    chunks = [
        F.conv(
            F.substring(F.col(f"__m{i // 4}"), (i % 4) * 8 + 1, 8), 16, 10
        )
        .cast("long")
        .alias(f"__h{i}")
        for i in range(n_hashes)
    ]
    return (
        rows.select(id_col, *chunks)
        .groupBy(id_col)
        .agg(*[F.min(f"__h{i}").alias(f"__h{i}") for i in range(n_hashes)])
        .select(
            id_col,
            F.array(
                *[
                    F.lpad(F.lower(F.hex(F.col(f"__h{i}"))), 8, "0")
                    for i in range(n_hashes)
                ]
            ).alias("mh"),
        )
    )


def _band_vectors(
    mh: DataFrame, bands: int, rows_per_band: int, id_col: str = "id"
) -> DataFrame:
    """(id, band, sig) banding of a precomputed (id, mh) vector frame
    (:func:`minhash_doc_vectors` layout): r = 1 explodes the chunk
    vector directly; r > 1 folds each band's r consecutive chunks into
    one md5 in-row (a 32-element array — cheap even interpreted)
    before exploding. Banding is cheap slicing over the vectors, so a
    persisted vector table can be re-banded per consumer instead of
    materializing |docs| x bands signature rows."""
    if rows_per_band < 1:
        raise ValueError("rows_per_band must be >= 1")
    if rows_per_band == 1:
        sigs = F.col("mh")
    else:
        r = rows_per_band
        sigs = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda k: F.md5(
                F.concat_ws("", F.slice(F.col("mh"), k * r + 1, r)).cast(
                    "binary"
                )
            ),
        )
    return mh.select(id_col, F.posexplode(sigs).alias("band", "sig"))


def minhash_banded_rows(
    sh: DataFrame,
    bands: int,
    rows_per_band: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """(id, band, sig) rows — :func:`minhash_band_sigs` semantics over
    the codegen vector path of :func:`minhash_doc_vectors`, banded by
    :func:`_band_vectors`."""
    if rows_per_band < 1:
        raise ValueError("rows_per_band must be >= 1")
    mh = minhash_doc_vectors(sh, bands * rows_per_band, id_col)
    return _band_vectors(mh, bands, rows_per_band, id_col)


def minhash_band_sigs(grams_col, bands: int, rows_per_band: int = 1):
    """Array of ``bands`` banded LSH signatures over a SHARED
    ``bands * rows_per_band``-hash minhash vector — the exact banding
    convention :func:`lsh_autotune` scores, so a tuner-picked
    (bands, rows_per_band) config runs verbatim in the production
    miner/index. ``rows_per_band == 1`` keeps the historical raw-chunk
    signatures (oracle-pinned since round 4); ``r > 1`` folds each
    band's r consecutive chunks into one md5 — a band collides only
    when ALL r member minhashes agree, the precision knob that stops
    r=1's quadratic candidate over-generation as the corpus grows (any
    Jaccard >~ 0.25 pair collides SOMEWHERE among 16 single-hash
    bands; at r=2 the per-band collision probability is s^2)."""
    if rows_per_band < 1:
        raise ValueError("rows_per_band must be >= 1")
    mh = minhash_chunk_signatures(grams_col, bands * rows_per_band)
    if rows_per_band == 1:
        return mh
    r = rows_per_band
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda k: F.md5(
            F.concat_ws("", F.slice(mh, k * r + 1, r)).cast("binary")
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 16,
    max_bucket: int | None = None,
    rows_per_band: int = 1,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via minhash banding.

    Per band i, the signature is min over shingles of md5(i || shingle) —
    a valid minhash under the uniform ordering of the hex strings, and
    portable (md5 exists in Spark, DuckDB, everywhere). Two docs are
    candidates when any band signature collides. Expected to catch pairs
    with Jaccard >= ~1 - (1 - s^r)^bands; follow with ngram_jaccard_pairs
    on the candidates for exactness at scale.

    ``rows_per_band``: hashes folded per band (see
    :func:`minhash_band_sigs`) — run the config :func:`lsh_autotune`
    picked; total minhashes computed = ``bands * rows_per_band``.

    ``max_bucket``: the minhash analogue of ``max_df`` — a corpus-wide
    boilerplate shingle ("tail edit token" page chrome) becomes the
    band-minimum for ~1/|grams| of EVERY document carrying it, putting
    O(corpus/|grams|) docs into ONE (band, sig) bucket and the self-join
    into that bucket's quadratic pair count (measured: two 100k-df
    trigrams at 200k docs -> 300M+ candidate pairs, job killed). Buckets
    above the cap are dropped before the join: a signature shared by
    thousands of documents carries no near-dup signal, exactly like an
    ultra-frequent shingle. Recall loss is bounded to pairs whose ONLY
    collisions are mega-buckets — strip boilerplate first
    (boilerplate_ngrams) when that matters. None = exact
    oracle-checked semantics.

    ``vectors``: optional precomputed (id, mh) minhash-vector frame —
    exactly ``minhash_doc_vectors(sh, bands * rows_per_band)`` over the
    same corpus, persisted by the caller. Skips the shingle + signature
    pass entirely; banding is cheap slicing re-derived per join side
    (the tuner→miner composition computes corpus vectors once,
    concurrent with tuning — every banding of one shared vector).
    """
    if vectors is not None:
        banded = _band_vectors(vectors, bands, rows_per_band)
    else:
        sh = spread(docs).select(
            F.col(id_col).alias("id"), word_shingles(text_col, n).alias("grams")
        ).where(F.size("grams") > 0)
        banded = minhash_banded_rows(sh, bands, rows_per_band)
        # One signature row per (doc, band) — computing the md5 minhashes
        # is the expensive part, the self-join must not run it twice (see
        # hamming_pairs).
        banded = scoped_persist(banded, "dedup.minhash_banded", eager=True)
    if max_bucket is not None:
        keep = (
            banded.groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("__bk"))
            .where(F.col("__bk") <= max_bucket)
            .select("band", "sig")
        )
        banded = banded.join(keep, ["band", "sig"])
    left = banded.select(F.col("id").alias("a"), "band", "sig")
    right = banded.select(F.col("id").alias("b"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster assignment over near-dup candidate pairs: every node gets
    the minimum node id reachable through the pair graph (the survivor of
    its duplicate cluster). Iterative min-label propagation — the classic
    large-graph connected-components loop, expressed as joins:

        label <- min(label, min over neighbors' labels)

    Each iteration is one equi-join + aggregate (shuffle on node id); the
    driver only ever sees a single convergence count per round, never the
    data. Converges in O(diameter) rounds — near-dup clusters are shallow
    (pairs come from banding), so 2-4 rounds in practice; ``max_iter``
    bounds adversarial chains. Input ``nodes``: one column ``id_col``;
    ``pairs``: columns (a, b) whose endpoints should be a subset of
    ``nodes`` (endpoints absent from ``nodes`` flow in through the edge
    union and appear in the output). Output: (id, cluster_id).
    """
    nodes_u = nodes.select(F.col(id_col).alias("u"))
    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
        # Self-loops fold the "keep own label" term into the SAME
        # neighbor-min aggregate: one join + one aggregate per round
        # instead of join + aggregate + a second labels left-join (and
        # no null-handling — every node's group always has its own
        # label). Pre-partitioned on the probe key and persisted ONCE:
        # every round's label join then shuffles only the (u, label)
        # side — the edge list crosses the network once for the whole
        # loop, not once per iteration (loop-invariant layout).
        .union(nodes_u.select("u", F.col("u").alias("v")))
        .repartition(F.col("v"))
        .persist()
    )
    labels = nodes_u.select(
        "u", F.col("u").alias("label")
    ).localCheckpoint(eager=True)
    # Convergence by label mass: labels only ever DECREASE, so the sum
    # (exact decimal — no long overflow, no float loss) is strictly
    # decreasing until the fixpoint; equal sums <=> no label changed.
    # This replaces the per-round filter-count with a sum that rides the
    # same materializing action, and drops the carried "old" column.
    # The mass signal is only sound for exact integral ids: a fractional
    # or non-numeric id_col would cast to NULL (sum None every round,
    # None == None after round one — silent mis-clustering), so those
    # fall back to the pre-r15 changed-rows count (one extra comparison
    # join per round, never hit by in-repo callers, all long ids).
    from pyspark.sql import types as _T

    _id_type = labels.schema["label"].dataType
    use_mass = isinstance(
        _id_type,
        (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType, _T.DecimalType),
    ) and not (isinstance(_id_type, _T.DecimalType) and _id_type.scale > 0)
    _mass = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    prev = None
    if use_mass:
        prev = _mass(labels)
        if prev is None:
            # Empty node set or NULL ids: the mass is blind — fall back.
            use_mass = False
    for _ in range(max_iter):
        # (1) neighbor-min over N(u) ∪ {u}: the smallest label one hop
        # away, own label included via the self-loop.
        mid_tbl = (
            edges.join(labels.withColumnRenamed("u", "v2"), edges["v"] == F.col("v2"))
            .groupBy("u")
            .agg(F.min("label").alias("mid"))
            .persist()
        )
        # (2) pointer jumping: label <- label's label. Labels are node ids
        # and only ever decrease, so following one level of indirection
        # compresses chains — convergence in O(log diameter) rounds instead
        # of O(diameter) (a 490-node chain converges in ~9 rounds, not 490).
        # mid is always a live node id (labels start as node ids and only
        # ever copy other labels), so the self-join is INNER — no nulls.
        l2 = mid_tbl.select(F.col("u").alias("lu"), F.col("mid").alias("lmid"))
        # localCheckpoint materializes the round AND truncates the lineage
        # — without it the logical plan nests once per iteration until
        # planning itself blows up (observed: OOM building the AQE explain
        # string around round 10). LAZY + the convergence mass as the one
        # materializing action: one driver barrier per round instead of
        # two (checkpoint job + count job).
        new_labels = (
            mid_tbl.join(l2, mid_tbl["mid"] == l2["lu"])
            .select("u", F.least("mid", "lmid").alias("label"))
            .localCheckpoint(eager=False)
        )
        if use_mass:
            cur = _mass(new_labels)
            converged = cur == prev
            prev = cur
        else:
            converged = (
                new_labels.join(
                    labels.select("u", F.col("label").alias("__old")), "u"
                )
                .where(F.col("label") != F.col("__old"))
                .limit(1)
                .count()
                == 0
            )
        mid_tbl.unpersist()
        labels = new_labels
        if converged:
            break
    edges.unpersist()
    return labels.select(F.col("u").alias(id_col), F.col("label").alias("cluster_id"))


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash of the token set: per-token xxhash64 (fast JVM hash),
    strict-majority vote per bit. Spark-only hash — use ``simhash32_md5``
    when cross-engine comparability matters. Output: (id, simhash)."""
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    df = spread(docs).select(F.col(id_col), hashes.alias("hs64"))
    fp = F.expr(
        "aggregate(transform(sequence(0, 63), j -> "
        "CASE WHEN 2 * size(filter(hs64, h -> shiftright(h, j) & 1 = 1)) > size(hs64) "
        "THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )
    return df.select(id_col, fp.alias("simhash"))


def simhash32_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Portable 32-bit SimHash: bit j is the majority vote (strict) of the
    top bit of hex nibble j of each distinct token's md5. md5 hex is
    identical in every engine, so the fingerprint is oracle-comparable
    (unlike xxhash64, which only Spark implements). Output: (id, simhash).

    Plan note: the per-bit vote is a single aggregate pass over the token
    hashes — each 32-char hash is parsed once into four 32-bit words (conv)
    and the 32 top-of-nibble bits come out of integer shifts, instead of 32
    separate filter() scans doing per-bit substring compares (~6x less
    expression work per document; same fingerprint bit-for-bit).
    """
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    hx = F.transform(toks, lambda t: F.md5(t.cast("binary")))
    df = spread(docs).select(F.col(id_col), hx.alias("hs"))
    # words: per token, md5 hex -> [w0..w3] 32-bit big-endian words; nibble
    # j's top bit = bit (31 - 4*(j%8)) of word j div 8.
    words = (
        "transform(hs, h -> array("
        + ", ".join(
            f"cast(conv(substr(h, {1 + 8 * c}, 8), 16, 10) as bigint)"
            for c in range(4)
        )
        + "))"
    )
    counts = (
        f"aggregate({words}, "
        "transform(sequence(0, 31), j -> cast(0 as int)), "
        "(acc, v) -> zip_with(acc, "
        "transform(sequence(0, 31), j -> cast("
        "shiftright(v[cast(j div 8 as int)], 31 - 4 * cast(j % 8 as int)) & 1 "
        "as int)), (a, b) -> a + b))"
    )
    fp = F.expr(
        f"cast(aggregate(zip_with({counts}, sequence(0, 31), "
        "(c, j) -> IF(2 * c > size(hs), shiftleft(cast(1 as bigint), j), "
        "cast(0 as bigint))), cast(0 as bigint), (acc, x) -> acc + x) as bigint)"
    )
    return df.select(id_col, fp.alias("simhash"))


def hamming_pairs(
    fingerprints: DataFrame,
    nbits: int,
    max_hamming: int,
    bands: int,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
) -> DataFrame:
    """Pairs with Hamming distance <= max_hamming, by pigeonhole banding:
    split the fingerprint into ``bands`` chunks — any pair within the
    radius must agree on at least one full chunk (bands > max_hamming) —
    so candidates come from an equi-join on (band, chunk), never a
    pairwise scan. Output: a, b, hamming."""
    assert bands > max_hamming, "pigeonhole requires bands > max_hamming"
    width = nbits // bands
    # Materialize the (id, fingerprint) pairs: the self-join would otherwise
    # recompute the whole fingerprint subtree on both sides. This is the
    # Spark-native analogue of the reference's memoization layer (C1,
    # cache.go:54-155) — tiny state (two longs per doc), spillable.
    sh = scoped_persist(
        fingerprints.select(F.col(id_col).alias("id"), F.col(fp_col).alias("f")),
        "dedup.simhash_fp",
        eager=True,
    )
    mask = (1 << width) - 1
    chunks = sh.select(
        "id",
        "f",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("f"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "f", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    a = chunks.select(F.col("id").alias("a"), F.col("f").alias("fa"), "band", "chunk")
    b = chunks.select(F.col("id").alias("b"), F.col("f").alias("fb"), "band", "chunk")
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        a.join(b, ["band", "chunk"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs on the fast 64-bit xxhash SimHash (Spark-only hash;
    use simhash32_md5 + hamming_pairs when oracle portability matters)."""
    fp = simhash64(docs, text_col, id_col).withColumnRenamed(id_col, "doc_id")
    return hamming_pairs(fp, 64, max_hamming, bands)


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup — the line/paragraph pass of
    CCNet / RefinedWeb-style training-data pipelines. A paragraph survives
    only at its first occurrence across the whole corpus (lowest
    ``(id, position)``); every document is rebuilt from its surviving
    paragraphs in original order.

    Scale shape: paragraphs are keyed by a 16-byte md5 digest, so the
    winner aggregate shuffles digests + ``(id, pos)`` — never paragraph
    text — and combines map-side. The rebuild moves each paragraph's text
    through exactly one digest-partitioned equi-join plus one
    ``groupBy(id)``; no window over the full corpus, no driver-side data.

    Returns ``(id_col, n_paras, n_kept, text_col)`` with the rebuilt text
    (empty paragraphs dedup like any other value; a document whose every
    paragraph is a repeat rebuilds to the empty string).
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep, -1)).alias("pos", "para"),
    ).withColumn("h", content_hash(F.col("para")))
    # Both the winner aggregate and the rebuild join read the exploded
    # paragraphs — persist so the scan + explode + digest runs once.
    paras = scoped_persist(paras, "dedup.paragraphs")
    winners = (
        paras.select("h", id_col, "pos")
        .groupBy("h")
        .agg(F.min(F.struct(id_col, "pos")).alias("w"))
    )
    kept = paras.join(winners, "h").withColumn(
        "keep",
        (F.col(f"w.{id_col}") == F.col(id_col)) & (F.col("w.pos") == F.col("pos")),
    )
    return kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("keep"), F.struct("pos", "para")))
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias(text_col),
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int = 4,
    iterations: int = 2,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): train a k-means codebook, assign every embedding
    to its max-cosine centroid, and ONLY WITHIN each cluster flag pairs
    with cosine >= ``tau``; a vector is a duplicate if it is the greater
    id of any flagged pair (deterministic keep-lowest-id policy — chains
    can over-remove relative to connected-components-keep-min, which is
    the documented SemDeDup trade: cheap, local, deterministic).

    THE scale property: pairwise comparison is bounded per cluster
    (sum of |cluster|^2), never corpus-quadratic — the codebook is the
    knob that caps the blast radius, exactly as in the paper (they run
    100k clusters over 5B embeddings). Composition of proven operators:
    clustering.kmeans_lloyd (broadcast codebook rounds) +
    similarity.ivf_assign (broadcast argmax) + one equi-join on the
    cluster id. Output: (id, cluster, is_dup) for every input vector.
    """
    from seriesly_spark.operators.similarity import ivf_assign, train_ivf_codebook

    # Eagerly-checkpointed k-row codebook (train_ivf_codebook): it feeds
    # a broadcast AND sits under both sides of the pairwise self-join —
    # without materialization the whole kmeans training plan re-executes
    # per consumer (measured 25 s -> ~4 s at the sf0.1 gate).
    codebook = train_ivf_codebook(
        vectors,
        n_centroids=k,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
    )
    # Materialize the assignment table before fan-out: it feeds BOTH
    # sides of the pairwise self-join plus the final output — a lazy
    # persist leaves all three consumers computing it concurrently
    # inside one action (none sees the others' cache). persist + count
    # populates the cache once; the pairwise stage then reads memory.
    # (SemDeDup materializes cluster assignments by design; at cluster
    # scale this is the "write assignments partitioned by cluster" step.)
    assigned = scoped_persist(
        ivf_assign(vectors, codebook, id_col=id_col, vec_col=vec_col),
        "dedup.semantic_assigned",
        eager=True,
    )
    # Norms hoisted out of the pairwise loop: |cluster| sqrt-of-decimal
    # computations instead of 2 x |pairs| (same decimal formula, same
    # values — the oracle's per-pair norm is numerically identical).
    from seriesly_spark.operators.similarity import dot, norm2  # noqa: E402

    withn = assigned.withColumn("__n", F.sqrt(norm2(F.col(vec_col))))
    a = withn.select(
        F.col("centroid_id").alias("__cid"),
        F.col(id_col).alias("__a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = withn.select(
        F.col("centroid_id").alias("__cid"),
        F.col(id_col).alias("__b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    losers = (
        a.join(b, "__cid")
        .where(F.col("__a") < F.col("__b"))
        .where(
            F.round(
                dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            )
            >= tau
        )
        .select(F.col("__b").alias(id_col))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return (
        assigned.join(losers, id_col, "left")
        .select(
            id_col,
            F.col("centroid_id").alias("cluster"),
            F.coalesce(F.col("__dup"), F.lit(False)).alias("is_dup"),
        )
    )


def levenshtein_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 8,
    window_len: int = 48,
    max_dist: int = 8,
) -> DataFrame:
    """Edit-distance near-duplicate candidates: pairs of documents whose
    leading ``window_len`` characters are within ``max_dist`` Levenshtein
    edits, blocked on the exact first ``prefix_len`` characters — the
    fuzzy-match complement to the token-set miners (shingle Jaccard /
    MinHash see reordered text as similar; edit distance catches the
    char-level typo/OCR variants they miss).

    Never all-pairs: candidates form ONLY inside equal-prefix blocks (an
    equi-join on an 8-byte hash-sized key — the same banding discipline
    as minhash_lsh_pairs), and the quadratic Levenshtein kernel runs on
    fixed ``window_len`` slices, so per-pair cost is a constant
    O(window²) regardless of document length. Block sizes bound the
    join's blast radius exactly like LSH buckets; a pathological prefix
    (e.g. every doc starting "The") is capped the same way
    ngram_jaccard's max_df screens hot shingles — count blocks first
    and raise prefix_len if any block exceeds the budget. Both engines
    implement classic unweighted Levenshtein (insert/delete/substitute
    = 1), so distances are exact integers — oracle-comparable with no
    rounding. Output: (a, b, dist), a < b.
    """
    head = F.substring(F.trim(F.col(text_col)), 1, window_len)
    pref = F.substring(F.trim(F.col(text_col)), 1, prefix_len)
    sides = docs.select(
        F.col(id_col).alias("id"), pref.alias("__blk"), head.alias("__head")
    )
    a = sides.select(
        F.col("id").alias("a"), "__blk", F.col("__head").alias("__ha")
    )
    b = sides.select(
        F.col("id").alias("b"), "__blk", F.col("__head").alias("__hb")
    )
    return (
        a.join(b, "__blk")
        .where(F.col("a") < F.col("b"))
        .withColumn("dist", F.levenshtein("__ha", "__hb").cast("long"))
        .where(F.col("dist") <= max_dist)
        .select("a", "b", "dist")
    )


def substring_dup_stats(
    docs: DataFrame,
    n: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-substring duplication screen: what fraction of each
    document's n-token windows recur ANYWHERE in the corpus (including
    elsewhere in the same document). The filtering-side counterpart of
    the suffix-array exact-substring dedup in "Deduplicating Training
    Data Makes Language Models Better" (arXiv:2107.06499): that work
    removes 50-token repeats; at the document level the recurring-window
    RATIO is the triage signal — near-1 means the document is
    assembled from text that exists elsewhere (mirrors, boilerplate,
    templated spam) even when no single whole paragraph matches
    (``paragraph_dedup``'s unit) and no global near-dup fires
    (``ngram_jaccard``'s unit). Output: (doc_id, n_windows,
    n_dup_windows, dup_ratio), one row per document, dup_ratio NULL when
    the document is shorter than n tokens.

    Dataflow: rolling windows form narrowly inside each document
    (``transform`` over token indices — no explosion until the hash
    projection); each window immediately collapses to an 8-byte
    xxhash64 before anything shuffles, so the corpus-count aggregate
    and the count-join move (hash, count) rows only, never window text
    — the same hash-before-shuffle discipline as ``ngram_jaccard_pairs``.
    A 64-bit hash stands in for window identity (collision odds ~n²/2⁶⁵
    — negligible and deterministic). At 100 TB the count table is
    bounded by distinct-window volume and its hot keys (ubiquitous
    boilerplate windows) land on a map-side-combining aggregate, not on
    a join explosion: the per-doc rollup joins each window OCCURRENCE
    to one count row.
    """
    t = tokens(text_col)
    # Hash each token ONCE into a materialized array column, then form
    # window identities by hashing n fixed-width longs — hashing the
    # window TEXT instead (slice+concat per window) re-touches every
    # character n times (measured 2.5x slower on the explode stage at
    # sf0.1). The projection boundary matters: inlining the token-hash
    # transform into the window lambda re-evaluates it per window.
    th = F.transform(t, lambda x: F.xxhash64(x))
    pre = spread(docs).select(
        F.col(id_col), th.alias("__th"), F.size(t).alias("__nt")
    )
    # CaseWhen evaluates only the matched branch, so the sequence()
    # never sees a negative upper bound on short documents.
    win = _window_hash_expr(n)
    # ONE select around the explode: aliasing the window array as a
    # column and exploding it by name in a second select invites
    # CollapseProject to substitute the token-hash transform INTO the
    # generator, where it re-evaluates per element_at — measured 19.5 s
    # vs 1.0 s for this exact subtree at sf0.1. EAGER persist: both
    # consumers (the corpus count and the count join) run inside one
    # action — a lazy persist gives zero hits there and the explode
    # subtree executes twice (the semantic_dedup lesson).
    occ = scoped_persist(
        pre.select(F.col(id_col), F.explode(win).alias("__h")),
        "dedup.substr_occ",
        eager=True,
    )
    counts = occ.groupBy("__h").agg(F.count(F.lit(1)).alias("__c"))
    per_doc = (
        occ.join(counts, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("__c") > 1).cast("long")).alias("n_dup_windows"),
        )
    )
    spine = docs.select(id_col)
    return spine.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.round(
            F.col("n_dup_windows") / F.col("n_windows"), 6
        ).alias("dup_ratio"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df_frac: float = 0.01,
) -> DataFrame:
    """Per-document boilerplate contamination by corpus n-gram document
    frequency — the CCNet/RefinedWeb-style screen for template text:
    an n-gram appearing in >= ``min_df_frac`` of all documents is
    boilerplate (navigation chrome, cookie banners, license footers),
    and a document whose distinct-gram set is dominated by such grams
    is template, not content.

    Same scale spine as the set-similarity miners: the shared exploded
    shingle table (token-hash identity — no gram text ever moves), ONE
    (gram)-keyed document-frequency aggregate, the heavy-gram set
    joined back g-keyed (co-partitioned with the exploded table — no
    extra shuffle pattern), then a per-doc rollup. Distinct grams per
    doc (a doc repeating its own banner 50x counts it once — DF is
    about cross-document spread). Documents with fewer than ``n``
    tokens have no grams and emit no row (mirrors the jaccard family).

    Output: (doc_id, n_grams, n_boiler, boiler_ratio rounded to 6).
    """
    # EAGER: three consumers (DF agg, semi-join probe, per-doc rollup).
    # Measured at 2M docs (96M grams): eager == lazy (71 s both) — the
    # cost is the corpus-wide gram document-frequency aggregate itself,
    # not persist duplication; eager kept so the explode provably runs
    # once regardless of subtree scheduling.
    ex = _shingle_sets(
        docs, text_col, id_col, n, "dedup.boiler_shingles", eager=True
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("__nd"))
    heavy = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") >= F.lit(min_df_frac) * F.col("__nd"))
        .select("g")
    )
    hits = (
        ex.join(heavy, "g", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    base = ex.groupBy("id").agg(
        F.first("sz").cast("long").alias("n_grams")
    )
    return (
        base.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
            F.round(
                F.coalesce(F.col("n_boiler"), F.lit(0))
                / F.col("n_grams").cast("double"),
                6,
            ).alias("boiler_ratio"),
        )
    )


def lsh_eval(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Quality report for the minhash-LSH candidate generator: recall
    and precision of its candidate pairs against the EXACT Jaccard
    truth at ``threshold`` — the measurement that turns "bands=16" from
    folklore into a dial (raise bands for recall, widen bands for
    precision; the r=1 collision curve is 1-(1-s)^bands).

    Composes the two certified miners: candidates from
    :func:`minhash_lsh_pairs`, truth from :func:`ngram_jaccard_pairs`
    at the given ``threshold`` (exact, not sampled: the shared-shingle
    equi-join enumerates every pair with >= 1 common shingle, and any
    pair with Jaccard > 0 — in particular >= threshold — shares one,
    so passing the threshold straight through loses nothing and skips
    scoring the sub-threshold tail);
    both subtrees are self-joins over persisted signature /
    shingle tables, and the final report joins two pair-id sets —
    nothing here is heavier than the miners themselves. Output: one
    row (n_true, n_cand, n_hit, recall, precision) with ratios rounded
    to 6 (NULL when the denominator is 0).
    """
    # All three counts ride ONE full-outer join of the two (unique-pair)
    # sets: n_true = truth marker sum, n_cand = candidate marker sum,
    # n_hit = both-markers sum. Each miner subtree is then consumed by
    # exactly one operator, so nothing needs a persist (the r15 eager
    # persist of the candidate list serialized candidate stages before
    # any truth stage could start — the driver measured that barrier at
    # 0.81x; with a single consumer per subtree both miners' stages now
    # schedule concurrently inside the one final action).
    cand = minhash_lsh_pairs(docs, text_col, id_col, n, bands).withColumn(
        "__c", F.lit(1)
    )
    truth = (
        ngram_jaccard_pairs(docs, text_col, id_col, n, threshold)
        .select("a", "b")
        .withColumn("__t", F.lit(1))
    )
    both = truth.join(cand, ["a", "b"], "full_outer")
    stats = both.agg(
        # coalesce AFTER the sums: over an empty union sum() is NULL
        # where a count() would be 0.
        F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum(F.col("__t") * F.col("__c")), F.lit(0))
        .cast("long")
        .alias("n_hit"),
    )
    return (
        stats.select(
            "n_true",
            "n_cand",
            "n_hit",
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("n_hit") / F.col("n_true").cast("double"),
                ),
                6,
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("n_cand") > 0,
                    F.col("n_hit") / F.col("n_cand").cast("double"),
                ),
                6,
            ).alias("precision"),
        )
    )


def _autotune_banded(
    mh: DataFrame, configs: tuple, max_bucket: int | None
) -> DataFrame:
    """Per-config banding of one shared signature vector (lsh_autotune
    helper). NOT persisted: it derives from the persisted mh by cheap
    fixed-width slicing+md5, so recomputing it per join side is cheaper
    than materializing |docs| x 60 signature rows (measured)."""
    banded = None
    for b, r in configs:
        part = mh.select(
            "id",
            F.lit(b).alias("bands"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(b - 1)),
                    lambda k: F.struct(
                        k.cast("int").alias("band"),
                        F.md5(
                            F.concat_ws(
                                "", F.slice(F.col("mh"), k * r + 1, r)
                            ).cast("binary")
                        ).alias("sig"),
                    ),
                )
            ).alias("bs"),
        ).select("id", "bands", "bs.band", "bs.sig")
        banded = part if banded is None else banded.unionByName(part)
    if max_bucket is not None:
        # same mega-bucket guard as minhash_lsh_pairs, keyed per config
        keep = (
            banded.groupBy("bands", "band", "sig")
            .agg(F.count(F.lit(1)).alias("__bk"))
            .where(F.col("__bk") <= max_bucket)
            .select("bands", "band", "sig")
        )
        banded = banded.join(keep, ["bands", "band", "sig"])
    return banded


def lsh_autotune(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 32,
    configs: tuple = ((32, 1), (16, 2), (8, 4), (4, 8)),
    threshold: float = 0.5,
    target_recall: float = 0.9,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH parameter auto-tuner: score every (bands, rows-per-band)
    banding of ONE shared minhash signature against exact Jaccard truth
    and pick the cheapest configuration meeting ``target_recall`` — the
    operator a pipeline owner actually calls (the round-5 evaluator
    measured one configuration; this turns the measurement into a
    decision).

    The classic banding trade-off: with ``n_hashes`` minhashes split
    into b bands of r rows (b*r = n_hashes), a pair with Jaccard s
    collides on >= 1 band with probability 1-(1-s^r)^b — more bands =
    recall, more rows per band = precision. Crucially every
    configuration is a REGROUPING of the same signature vector, so the
    expensive part (|docs| x n_hashes md5 minhashes over the shingle
    sets) is computed ONCE, persisted, and re-banded per config by
    slicing — evaluating 4 configs costs one signature pass plus 4
    keyed self-joins, not 4 signature passes.

    Scale shape: signature table is |docs| x n_hashes strings (no
    text); each config's candidate generation is a (bands, band,
    sig)-keyed self-join — never all-pairs; truth is the exact miner
    (shared-shingle equi-join, complete above any threshold > 0). At
    100 TB you run the tuner on a uniform hash-sample of the corpus
    (sample_hash) and apply the picked config corpus-wide.

    Output: one row per config, bands DESC — (bands, rows_per_band,
    n_true, n_cand, n_hit, recall, precision, meets_target, picked)
    with ratios rounded to 6 (NULL when the denominator is 0).
    ``picked`` marks exactly one row: the fewest-candidates config
    among those meeting target recall, falling back to (fewest
    candidates, fewest bands) when none does; ties break on bands ASC
    — deterministic, engine-portable.
    """
    from pyspark.sql import Window

    for b, r in configs:
        if b * r != n_hashes:
            raise ValueError(f"config ({b},{r}) != n_hashes={n_hashes}")
    spark = docs.sparkSession
    if n_hashes % 4 != 0:
        raise ValueError("n_hashes must be a multiple of 4 (md5 chunking)")
    sh = spread(docs).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("grams")
    ).where(F.size("grams") > 0)
    # Minhash i is defined PER-HASH as
    #   min over grams of substr(md5((i div 4) || '|' || gram), (i%4)*8+1, 8)
    # — each md5 yields FOUR independent 32-bit (8-hex-char) minhash
    # chunks, so n_hashes hashes cost n_hashes/4 md5 evaluations per
    # gram (the oracle replays the per-i definition directly). Computed
    # as ONE in-row fold over the gram array: the tuner's input is a
    # SAMPLE by contract (docstring), so its signature CPU is
    # sample-sized and the fold's zero-exchange shape beats
    # minhash_doc_vectors' explode+agg here (A/B at sf0.1: the agg
    # path's extra exchange + stages cost ~1 s against a ~0.2 s CPU
    # win; the corpus-wide miners show the opposite trade and use the
    # agg path).
    mh = sh.select(
        "id",
        minhash_chunk_signatures(F.col("grams"), n_hashes).alias("mh"),
    )
    # The exact-Jaccard truth miner shares NOTHING with the signature/
    # candidate chain below — overlap its materialization from a driver
    # thread (guide §2.6) so truth stages back-fill the idle capacity
    # of the signature pass's tail and vice versa.
    from concurrent.futures import ThreadPoolExecutor

    _truth_pool = ThreadPoolExecutor(max_workers=1)
    truth_fut = _truth_pool.submit(
        scoped_persist,
        ngram_jaccard_pairs(
            docs, text_col, id_col, n, threshold, max_df=max_df
        ).select("a", "b"),
        "dedup.autotune_truth",
        True,
    )
    # ONE signature pass feeds every config's banding + self-join: the
    # md5 minhash computation dominates, so it must not re-run per
    # config (4 configs x 2 join sides = 8 consumers in one action).
    # Everything from the submit onward sits inside the try so that ANY
    # exception path joins the background truth job and shuts the pool
    # down — no background job outlives this call.
    try:
        mh = scoped_persist(mh, "dedup.autotune_mh", eager=True)
        banded = _autotune_banded(mh, configs, max_bucket)
        left = banded.select(F.col("id").alias("a"), "bands", "band", "sig")
        right = banded.select(F.col("id").alias("b"), "bands", "band", "sig")
        cand = (
            left.join(right, ["bands", "band", "sig"])
            .where(F.col("a") < F.col("b"))
            .select("bands", "a", "b")
            .distinct()
        )
        cand = scoped_persist(cand, "dedup.autotune_cand", eager=True)
    finally:
        # max_df note: at sample sizes beyond ~10^5 docs the truth
        # miner's shared-shingle join hits Zipfian corpus-wide shingles
        # ("alpha beta gamma" frame phrases) whose buckets go quadratic;
        # cap their document frequency exactly as ngram_jaccard_pairs
        # documents (slight jaccard underestimate on truth — the tuner's
        # recall becomes marginally conservative, the safe direction).
        try:
            truth = truth_fut.result()
        finally:
            _truth_pool.shutdown(wait=True)
    cfg = spark.createDataFrame(
        list(configs), "bands int, rows_per_band int"
    )
    n_cand = cand.groupBy("bands").agg(F.count(F.lit(1)).alias("n_cand"))
    n_hit = (
        cand.join(truth, ["a", "b"])
        .groupBy("bands")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_true = truth.agg(F.count(F.lit(1)).alias("n_true"))
    recall = F.round(
        F.when(
            F.col("n_true") > 0, F.col("n_hit") / F.col("n_true").cast("double")
        ),
        6,
    )
    scored = (
        cfg.join(n_cand, "bands", "left")
        .join(n_hit, "bands", "left")
        .crossJoin(F.broadcast(n_true))
        .withColumn("n_cand", F.coalesce("n_cand", F.lit(0)))
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)))
        .withColumn("recall", recall)
        .withColumn(
            "precision",
            F.round(
                F.when(
                    F.col("n_cand") > 0,
                    F.col("n_hit") / F.col("n_cand").cast("double"),
                ),
                6,
            ),
        )
        .withColumn(
            "meets_target",
            F.coalesce(
                F.col("recall") >= F.lit(target_recall), F.lit(False)
            ),
        )
    )
    # 4-row decision table: the bare-orderBy window is over |configs|
    # rows, never data-sized.
    w = Window.orderBy(
        F.col("meets_target").desc(), F.col("n_cand").asc(), F.col("bands").asc()
    )
    return (
        scored.withColumn("picked", F.row_number().over(w) == 1)
        .select(
            "bands", "rows_per_band", "n_true", "n_cand", "n_hit",
            "recall", "precision", "meets_target", "picked",
        )
        .orderBy(F.col("bands").desc())
    )


def minhash_dedup_auto(
    docs: DataFrame,
    tune_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 32,
    configs: tuple = ((32, 1), (16, 2), (8, 4), (4, 8)),
    threshold: float = 0.5,
    target_recall: float = 0.9,
    max_df: int | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """One-call TUNED near-dup mining — the closed tuner→miner loop:
    :func:`lsh_autotune` scores every banding of one shared
    ``n_hashes``-minhash vector on ``tune_docs`` (pass a deterministic
    sample — ``hash_sample`` / a modulo predicate — exactly how the
    tuner runs at corpus scale; defaults to ``docs``), the single
    picked row crosses the driver (a 1-row boundary, the sanctioned
    kind), and :func:`minhash_lsh_pairs` mines ``docs`` corpus-wide
    with the picked (bands, rows_per_band). Output: candidate pairs
    (a, b), a < b.

    Determinism: the pick is a pure function of the tuning corpus
    (exact-Jaccard truth, integer candidate counts, total tie-break
    order), so the whole composition is engine-replayable — the DuckDB
    oracle recomputes the pick in a CTE and mines with it.

    Caveat (inherited from :func:`lsh_autotune`): the tuner's "exact"
    Jaccard truth hashes shingles to 64 bits (``ngram_jaccard_pairs``
    over xxhash64 grams), so a single shingle collision on a pair
    sitting exactly at ``threshold`` could flip a truth row and with it
    the picked (bands, rows_per_band) — and the blast radius of a
    flipped pick is the ENTIRE corpus-wide pair output, not one row.
    At 64 bits the per-pair collision odds are ~|grams|²/2⁶⁵; if that
    is a concern, tune on raw gram strings via a custom truth set.
    """
    def _tune(sample: DataFrame):
        return [
            r
            for r in lsh_autotune(
                sample,
                text_col,
                id_col,
                n=n,
                n_hashes=n_hashes,
                configs=configs,
                threshold=threshold,
                target_recall=target_recall,
                max_df=max_df,
                max_bucket=max_bucket,
            ).collect()
            if r["picked"]
        ]

    if tune_docs is None:
        # Tuning corpus IS the mining corpus — no distinct signature
        # work to overlap; keep the sequential path.
        (pick,) = _tune(docs)
        return minhash_lsh_pairs(
            docs,
            text_col,
            id_col,
            n=n,
            bands=int(pick["bands"]),
            max_bucket=max_bucket,
            rows_per_band=int(pick["rows_per_band"]),
        )
    # The corpus-wide minhash VECTOR is banding-independent: every
    # config (b, r) with b*r == n_hashes regroups the same n_hashes
    # chunks (enforced by lsh_autotune's validation). So the expensive
    # full-corpus signature pass does not depend on the pick — compute
    # and persist it CONCURRENTLY with the sample-sized tuner from a
    # driver thread (guide-§2.6 overlap: tuner stages and signature
    # stages back-fill each other's idle capacity), then re-band the
    # persisted vectors with the picked (bands, rows_per_band).
    from concurrent.futures import ThreadPoolExecutor

    sh_full = spread(docs).select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("grams")
    ).where(F.size("grams") > 0)
    vectors = minhash_doc_vectors(sh_full, n_hashes, "id")
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(
            scoped_persist, vectors, "dedup.auto_vectors", True
        )
        picks = _tune(tune_docs)
        vectors = fut.result()
    (pick,) = picks
    return minhash_lsh_pairs(
        docs,
        text_col,
        id_col,
        n=n,
        bands=int(pick["bands"]),
        max_bucket=max_bucket,
        rows_per_band=int(pick["rows_per_band"]),
        vectors=vectors,
    )


def dup_span_stats(
    docs: DataFrame,
    n: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Merged duplicated-SPAN coverage per document — what the
    exact-substring dedup of "Deduplicating Training Data Makes
    Language Models Better" (arXiv:2107.06499) would actually CUT.
    ``substring_dup_stats`` counts duplicated n-token windows; two
    overlapping duplicated windows are one contiguous repeated span,
    and the removal/triage decision runs on spans: how many maximal
    repeated regions a document has and what fraction of its TOKENS
    they cover (a doc can have 40% duplicated windows that merge into
    one 45%-of-tokens block — very different from 40 scattered
    repeats).

    Span semantics: window at token position p (0-based) covers tokens
    [p, p+n-1]; a window is duplicated when its identity recurs
    anywhere in the corpus (same corpus-count criterion as
    ``substring_dup_stats``); duplicated windows whose token intervals
    overlap or touch merge — break exactly when the position gap
    exceeds n. Merged span [p1..p2] covers p2-p1+n tokens.

    Scale shape: same hash-before-shuffle spine as
    ``substring_dup_stats`` (windows collapse to 8-byte xxhash64
    before anything moves; the corpus count aggregate map-side
    combines its hot boilerplate keys), then the island merge is a
    PER-DOCUMENT window function — partitioned by doc_id, thousands of
    rows max per doc, no global ordering anywhere. Output:
    (doc_id, n_tokens, n_spans, dup_tokens, dup_token_ratio) — one row
    per document, zeros when nothing recurs, ratio NULL only for empty
    documents.
    """
    from pyspark.sql import Window

    t = tokens(text_col)
    th = F.transform(t, lambda x: F.xxhash64(x))
    pre = spread(docs).select(
        F.col(id_col), th.alias("__th"), F.size(t).alias("__nt")
    )
    # Sentinel one-NULL-window array for short docs (__nt < n):
    # posexplode would DROP an empty array and lose the document, but
    # the doc-spine below is derived from this same persisted frame
    # (carrying __nt avoids re-tokenizing the corpus for the spine
    # join — a whole second scan). NULL window hashes never match an
    # inner join key and are filtered out of the corpus count, so they
    # exist only to keep the doc's (id, __nt) row.
    win = _window_hash_expr(n, otherwise=F.array(F.lit(None).cast("bigint")))
    # ONE select around the posexplode, for the same CollapseProject
    # reason as substring_dup_stats (the token-hash transform must not
    # be substituted into the generator). EAGER persist: the corpus
    # count, the dup-position join, and the doc spine all consume this
    # inside one action — the ONLY corpus scan in the plan.
    occ = scoped_persist(
        pre.select(
            F.col(id_col),
            F.col("__nt"),
            F.posexplode(win).alias("__p", "__h"),
        ),
        "dedup.span_occ",
        eager=True,
    )
    # Explicit NULL filter: correctness would hold without it (NULL
    # keys never satisfy an equi-join), but at scale the short-doc
    # sentinels would otherwise pile into one mega-group in the count
    # aggregate — a manufactured skew key.
    counts = (
        occ.where(F.col("__h").isNotNull())
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    dup = (
        occ.join(counts.where(F.col("__c") > 1), "__h")
        .select(id_col, "__p")
    )
    ordw = Window.partitionBy(id_col).orderBy("__p")
    islands = dup.select(
        F.col(id_col),
        F.col("__p"),
        F.sum(
            F.when(
                F.col("__p") - F.lag("__p").over(ordw) > n, 1
            ).otherwise(0)
        )
        .over(ordw.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__isl"),
    )
    spans = islands.groupBy(id_col, "__isl").agg(
        F.min("__p").alias("__p1"), F.max("__p").alias("__p2")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("__p2") - F.col("__p1") + n).alias("dup_tokens"),
    )
    # Doc spine from the persisted occ frame — every document has at
    # least one row there (real windows or the short-doc sentinel), so
    # first(__nt) per id reproduces exactly what re-tokenizing would
    # (same expression, same scan) without the second corpus pass. The
    # partial aggregate collapses a doc's co-located window rows
    # map-side, so the exchange is ~|docs| rows of 12 bytes.
    spine = occ.groupBy(id_col).agg(F.first("__nt").alias("n_tokens"))
    return spine.join(per_doc, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.when(F.col("n_tokens") > 0, F.col("n_tokens")),
            6,
        ).alias("dup_token_ratio"),
    )


def _winnow_frame(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    w: int,
) -> DataFrame:
    """Shared winnowing front half: ``(id, __n, fps)`` with ``__n`` the
    token count and ``fps`` the distinct window-min fingerprint set.

    TWO projections on purpose: the gram-hash array ``__gh`` is
    materialized as a column in the first, and the window-min lambda in
    the second reads it as an ATTRIBUTE. Folding both into one
    expression re-evaluates the whole gram-hash array INSIDE the
    window lambda — higher-order functions are interpreted, nothing
    hoists the invariant subtree — turning n-token docs into O(n^2)
    md5 calls (measured: sf0.1 winnow_stats went from >9 min to
    seconds with the split). CollapseProject keeps the boundary
    because ``__gh`` is non-cheap and referenced twice (size + lambda).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    gh = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))), 1, 8
        ),
    )
    step1 = docs.select(
        F.col(id_col).alias("id"),
        n.alias("__n"),
        F.when(n >= k + w - 1, gh).alias("__gh"),
    )
    wmins = F.transform(
        F.sequence(F.lit(0), F.size("__gh") - w),
        lambda s: F.array_min(F.slice(F.col("__gh"), s + 1, w)),
    )
    return step1.select(
        "id",
        "__n",
        F.coalesce(
            F.when(F.col("__gh").isNotNull(), F.array_distinct(wmins)),
            F.array().cast("array<string>"),
        ).alias("fps"),
    )


def winnow_fingerprint_col(
    text_col: str, k: int = 3, w: int = 4
) -> "F.Column":
    """Winnowing fingerprint set of a document (Schleimer, Wilkerson &
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003): hash every word ``k``-gram, slide a window of ``w``
    consecutive gram hashes, keep each window's MINIMUM hash, distinct
    the kept hashes. Guarantee: any shared token run of length
    >= k + w - 1 contributes at least one shared fingerprint, while
    only ~2/(w+1) of the gram hashes are kept — the standard
    sublinear-fingerprint substring-matching sketch (MOSS).

    Built entirely ARRAY-SIDE (transform over sequence) — per-document
    compute with ZERO shuffle; selection never needs cross-row state.
    The gram hash is the first 8 hex chars of md5 over the gram text,
    compared AS A STRING (lowercase hex orders like the integer it
    encodes) — the same engine-portable convention as the chunked
    minhash signatures, so a SQL oracle replays selection exactly.
    Documents shorter than k + w - 1 tokens have no full window and
    yield an empty set.

    SEMANTIC REFERENCE ONLY — this single-expression form re-evaluates
    the gram-hash subtree inside the window lambda (O(n^2) md5 calls
    per doc; HOFs are interpreted with no invariant hoisting). The
    corpus operators go through :func:`_winnow_frame`, which
    materializes the gram hashes behind a projection boundary; a test
    pins the two equal.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    gh = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))), 1, 8
        ),
    )
    wmins = F.transform(
        F.sequence(F.lit(0), F.size(gh) - w),
        lambda s: F.array_min(F.slice(gh, s + 1, w)),
    )
    return F.when(
        n >= k + w - 1, F.array_distinct(wmins)
    ).otherwise(F.array().cast("array<string>"))


def winnow_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing summary: gram/window/fingerprint counts
    and the achieved density (kept fingerprints per window — expected
    ~2/(w+1) on random text; a sharply higher density flags repetitive
    low-entropy documents the way `compression_ratio` does, a lower
    one near-constant content). One narrow projection, no shuffle.
    """
    # spread: the fingerprint pipeline is heavy per-row compute (md5
    # per gram + window mins), and a compact input (one parquet file)
    # would otherwise run it on one task — the same rationale as
    # winnow_overlap_pairs' spread (measured 4.4 s -> sub-second at
    # sf0.1, 32 cores).
    wf = _winnow_frame(spread(docs), text_col, id_col, k, w)
    n_grams = F.greatest(F.col("__n") - F.lit(k - 1), F.lit(0))
    n_windows = F.greatest(n_grams - F.lit(w - 1), F.lit(0))
    return wf.select(
        F.col("id").alias(id_col),
        n_grams.cast("long").alias("n_grams"),
        n_windows.cast("long").alias("n_windows"),
        F.size("fps").cast("long").alias("n_fps"),
        F.round(
            F.size("fps") / F.when(n_windows > 0, n_windows), 6
        ).alias("fp_density"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs (a < b) sharing >= ``min_shared`` winnowing
    fingerprints, with the containment score
    n_shared / min(|fps(a)|, |fps(b)|) — the fingerprint-sketch
    substring-overlap miner: unlike `ngram_jaccard_pairs` it compares
    ~2/(w+1)-sized sketches instead of full shingle sets, and unlike
    `dup_span_stats` it yields cross-document PAIRS, which is what a
    clone-cluster or license-contamination pass consumes.

    Plan shape mirrors the other set miners: fingerprint array-side
    (no shuffle), explode the distinct sketch, equi-join on the
    fingerprint key (co-partitioned shuffle of (id, 8-hex) rows —
    bodies never move), one hash aggregate per pair. ``max_df`` drops
    fingerprints appearing in more than that many documents before the
    join — the boilerplate guard that keeps join buckets from going
    quadratic at corpus scale (underestimates overlap slightly, like
    the capped jaccard miner).
    """
    wf = _winnow_frame(spread(docs), text_col, id_col, k, w)
    # explode_outer, NOT explode: for an inner explode Catalyst's
    # InferFiltersFromGenerate adds `size(fps) > 0` and predicate
    # pushdown SUBSTITUTES the whole fingerprint expression (md5 gram
    # pipeline included) into a Filter below the projections — every
    # row then pays the pipeline ~4x extra (measured 60 s vs 4 s on a
    # 20k-doc stress corpus). The outer generate infers no filter; the
    # null rows from empty sketches are dropped by the CHEAP attribute
    # filter above the Generate (and would fall out of the equi-join
    # anyway).
    exploded = scoped_persist(
        wf.select(
            "id",
            F.size("fps").alias("sz"),
            F.explode_outer("fps").alias("fp"),
        ).where(F.col("fp").isNotNull()),
        "winnow_overlap",
        # Always eager: unlike the cheap-but-large shingle explode
        # (lazy by its A/B), the winnowed sketch is EXPENSIVE to
        # compute (md5 gram pipeline) and small (~2/(w+1) of grams) —
        # lazy persist recomputes it per join side (measured 6.5 s
        # cold vs 1.3 s eager on the 20k-doc stress corpus).
        eager=True,
    )
    side = exploded
    if max_df is not None:
        keep = (
            exploded.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") <= max_df)
            .select("fp")
        )
        side = exploded.join(keep, "fp")
    a = side.select(
        F.col("id").alias("a"), F.col("sz").alias("sza"), "fp"
    )
    b = side.select(
        F.col("id").alias("b"), F.col("sz").alias("szb"), "fp"
    )
    pairs = (
        a.join(b, "fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.first("sza").alias("__sza"),
            F.first("szb").alias("__szb"),
        )
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs.select(
        "a",
        "b",
        "n_shared",
        F.round(
            F.col("n_shared")
            / F.least(F.col("__sza"), F.col("__szb")),
            6,
        ).alias("containment"),
    )


def winnow_eval(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    min_shared_grams: int = 8,
) -> DataFrame:
    """Quality report for the winnowing candidate miner: recall and
    precision of :func:`winnow_overlap_pairs` (>= ``min_shared``
    shared fingerprints) against the EXACT shared-k-gram truth (pairs
    sharing >= ``min_shared_grams`` distinct word k-grams) — the dial
    that sizes (w, min_shared): the paper guarantees a shared
    fingerprint for CONTIGUOUS runs >= k + w - 1 tokens, but scattered
    shared grams are only caught probabilistically (~2/(w+1) of grams
    are kept), and this measures that gap on the actual corpus — the
    same composes-two-certified-miners shape as :func:`lsh_eval`.

    The truth side reuses the hash-keyed shingle front half
    (:func:`_shingle_sets`: distinct grams collapse to longs before
    the shuffle, bodies never move); the candidate side is the
    fingerprint join. Output: one row (n_true, n_cand, n_hit, recall,
    precision), ratios rounded to 6 (NULL when the denominator is 0).
    """
    # Same single-pass shape as lsh_eval/simhash_eval: all three counts
    # ride ONE full-outer join of the two unique pair sets (both are
    # groupBy(a, b) outputs, hence distinct), so each miner subtree has
    # exactly one consumer and the r15 eager candidate persist (a
    # barrier serializing candidate stages before any truth stage) is
    # gone.
    cand = winnow_overlap_pairs(
        docs, text_col, id_col, k=k, w=w, min_shared=min_shared
    ).select("a", "b").withColumn("__c", F.lit(1))
    ex = _shingle_sets(docs, text_col, id_col, k, "winnow_eval_truth")
    ga = ex.select(F.col("id").alias("a"), "g")
    gb = ex.select(F.col("id").alias("b"), "g")
    truth = (
        ga.join(gb, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= min_shared_grams)
        .select("a", "b")
        .withColumn("__t", F.lit(1))
    )
    both = truth.join(cand, ["a", "b"], "full_outer")
    stats = both.agg(
        F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum(F.col("__t") * F.col("__c")), F.lit(0))
        .cast("long")
        .alias("n_hit"),
    )
    return (
        stats.select(
            "n_true",
            "n_cand",
            "n_hit",
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("n_hit") / F.col("n_true").cast("double"),
                ),
                6,
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("n_cand") > 0,
                    F.col("n_hit") / F.col("n_cand").cast("double"),
                ),
                6,
            ).alias("precision"),
        )
    )


def simhash64_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Portable 64-bit SimHash as TWO non-negative 32-bit halves
    ``(sig_hi, sig_lo)``: bit j of ``sig_lo`` is the strict-majority
    vote of md5-nibble j's top bit (bit 3 — exactly
    :func:`simhash32_md5`'s fingerprint), bit j of ``sig_hi`` the vote
    of nibble j's bit 2. Two halves, not one 64-bit long, so neither
    engine ever shifts/multiplies into sign-bit overflow (DuckDB
    raises on BIGINT overflow; Spark silently wraps — both are wrong
    answers). md5 hex is identical everywhere, so the fingerprint is
    oracle-comparable. Output: (id, sig_hi, sig_lo).

    Same one-aggregate-pass shape as simhash32_md5 (each 32-char hash
    parsed once into four 32-bit words; 64 bit-votes from integer
    shifts), with the vote fold producing BOTH halves in a single
    struct accumulator so the 64-count array is evaluated once per row
    (the HOF per-element re-evaluation trap — see _winnow_frame).
    """
    toks = F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
    hx = F.transform(toks, lambda t: F.md5(t.cast("binary")))
    df = spread(docs).select(F.col(id_col), hx.alias("hs"))
    words = (
        "transform(hs, h -> array("
        + ", ".join(
            f"cast(conv(substr(h, {1 + 8 * c}, 8), 16, 10) as bigint)"
            for c in range(4)
        )
        + "))"
    )
    # counts[j], j in 0..63: votes for nibble (j % 32)'s bit 3 (j < 32)
    # or bit 2 (j >= 32): bit (31|30) - 4*(j%8) of word (j%32) div 8.
    counts = (
        f"aggregate({words}, "
        "transform(sequence(0, 63), j -> cast(0 as int)), "
        "(acc, v) -> zip_with(acc, "
        "transform(sequence(0, 63), j -> cast("
        "shiftright(v[cast((j % 32) div 8 as int)], "
        "IF(j < 32, 31, 30) - 4 * cast(j % 8 as int)) & 1 as int)), "
        "(a, b) -> a + b))"
    )
    pair = (
        f"aggregate(zip_with({counts}, sequence(0, 63), "
        "(c, j) -> struct(c as c, j as j)), "
        "struct(cast(0 as bigint) as lo, cast(0 as bigint) as hi), "
        "(acc, x) -> struct("
        "acc.lo + IF(x.j < 32 AND 2 * x.c > size(hs), "
        "shiftleft(cast(1 as bigint), x.j), cast(0 as bigint)), "
        "acc.hi + IF(x.j >= 32 AND 2 * x.c > size(hs), "
        "shiftleft(cast(1 as bigint), x.j - 32), cast(0 as bigint))))"
    )
    fp = F.expr(pair)
    return df.select(
        id_col, fp["hi"].alias("sig_hi"), fp["lo"].alias("sig_lo")
    )


def simhash_eval(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_hamming: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Quality report for SimHash as a SIMILARITY PROXY: recall and
    precision of the Hamming-<= ``max_hamming`` pairs (32-bit md5
    SimHash, pigeonhole-banded) against the EXACT n-gram Jaccard truth
    at ``threshold`` — the gate that sizes the Hamming radius the same
    way :func:`lsh_eval` sizes the MinHash bands. The banded candidate
    stage itself is lossless by pigeonhole (bands > max_hamming
    guarantees recall 1.0 OF THE RADIUS); what this measures is the
    semantic gap — how well bit-vote distance tracks shingle overlap
    on the actual corpus, the number SimhashIndex consumers need
    before trusting the radius knob.

    Composes two certified miners (:func:`simhash32_md5` +
    :func:`hamming_pairs` for candidates, :func:`ngram_jaccard_pairs`
    for truth); the report joins two pair-id sets. Output: one row
    (n_true, n_cand, n_hit, recall, precision), ratios rounded to 6
    (NULL when the denominator is 0).
    """
    fps = simhash32_md5(docs, text_col, id_col)
    # Same shape as lsh_eval: all three counts ride ONE full-outer join
    # of the two unique-pair sets (hamming_pairs ends in .distinct()),
    # so each miner subtree has exactly one consumer and the r15 eager
    # candidate persist (a barrier serializing candidate stages before
    # any truth stage) is gone.
    cand = hamming_pairs(
        fps, 32, max_hamming, bands, id_col=id_col, fp_col="simhash"
    ).select("a", "b").withColumn("__c", F.lit(1))
    truth = (
        ngram_jaccard_pairs(docs, text_col, id_col, n, threshold)
        .select("a", "b")
        .withColumn("__t", F.lit(1))
    )
    both = truth.join(cand, ["a", "b"], "full_outer")
    stats = both.agg(
        F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_true"),
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("n_cand"),
        F.coalesce(F.sum(F.col("__t") * F.col("__c")), F.lit(0))
        .cast("long")
        .alias("n_hit"),
    )
    return (
        stats.select(
            "n_true",
            "n_cand",
            "n_hit",
            F.round(
                F.when(
                    F.col("n_true") > 0,
                    F.col("n_hit") / F.col("n_true").cast("double"),
                ),
                6,
            ).alias("recall"),
            F.round(
                F.when(
                    F.col("n_cand") > 0,
                    F.col("n_hit") / F.col("n_cand").cast("double"),
                ),
                6,
            ).alias("precision"),
        )
    )


def jaccard_prefix_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard >= threshold pairs via prefix filtering — the
    AllPairs/PPJoin candidate generation (Bayardo et al. WWW'07; Xiao
    et al. WWW'08; Vernica et al. SIGMOD'10 for the distributed
    shape). Same output as :func:`ngram_jaccard_pairs` (equivalence-
    gated in tests), but the self-join runs over each document's
    PREFIX only, not all of its shingles.

    Why it is safe: order all shingles by one global total order
    (ascending document frequency, ties by shingle value — rarest
    first). If J(A,B) >= t then |A∩B| >= ceil(t*|A|): were every
    shared shingle outside A's first |A| - ceil(t*|A|) + 1, the
    suffix's ceil(t*|A|) - 1 slots could not hold them. The SMALLEST-
    ordered shared shingle therefore sits inside BOTH prefixes, so the
    prefix-only equi-join finds every qualifying pair. Candidates then
    pass a length filter (J <= min/max, so min(|A|,|B|) >=
    t*max(|A|,|B|) is necessary) and an exact verification over the
    full shingle arrays (array_intersect — JVM-side, no Python).

    Why it scales: the join input shrinks from sum(|d|) rows to
    sum(|d| - ceil(t*|d|) + 1) (~(1-t) of the explode), and — the real
    win — the prefix keeps each document's RAREST shingles, so the
    quadratic join buckets that ultra-frequent shingles create in the
    naive equi-join mostly vanish without the lossy ``max_df`` cap
    (measured candidate-count A/B in PLANS.md). Verification joins
    move full gram arrays only for surviving candidates.

    Candidate generation runs at the RELAXED threshold
    t' = t - 1e-6: the accept predicate (shared with the naive join)
    is round(J, 6) >= t, which admits true J as low as t - 5e-7
    (HALF_UP), so the prefix length and the length filter must hold
    for every such pair — bounds derived from t alone could drop a
    pair the naive join emits when |A∪B| exceeds ~1e6 shingles. The
    relaxation (and the extra 1e-9 representation epsilon inside the
    ceil) only ever ADDS candidates; the exact verification still
    filters on round(J, 6) >= t.
    """
    from pyspark.sql import Window

    tg = threshold - 1e-6
    exploded = _shingle_sets(
        docs, text_col, id_col, n, "dedup.prefix_exploded", eager=True
    )
    dfreq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    plen = (
        F.col("sz")
        - F.ceil(F.lit(tg) * F.col("sz") - F.lit(1e-9))
        + F.lit(1)
    )
    rn = F.row_number().over(
        Window.partitionBy("id").orderBy(F.asc("df"), F.asc("g"))
    )
    # __rn is each gram's 1-based position in the doc's FULL (df, g)-
    # ordered gram list (computed before the prefix cut), kept as the
    # PPJoin positional-filter payload. The prefix table feeds BOTH
    # self-join sides, so it is persisted eagerly — unpersisted it
    # re-runs the dfreq aggregate + the full-explode window sort once
    # per side (2 Exchanges + 2 Windows in the before-plan).
    prefix = scoped_persist(
        (
            exploded.join(dfreq, "g")
            .withColumn("__rn", rn)
            .where(F.col("__rn") <= plen)
            .select("id", "sz", "g", "__rn")
        ),
        "dedup.prefix_rows",
        eager=True,
    )
    a = prefix.select(
        F.col("id").alias("a"),
        F.col("sz").alias("sza"),
        "g",
        F.col("__rn").alias("pa"),
    )
    b = prefix.select(
        F.col("id").alias("b"),
        F.col("sz").alias("szb"),
        "g",
        F.col("__rn").alias("pb"),
    )
    # PPJoin positional filter (Xiao et al. WWW'08 §3.2): for a pair
    # that truly meets the threshold, the globally smallest-ordered
    # shared gram sits inside BOTH prefixes (the prefix theorem above),
    # so min(pa)/min(pb) over the matched prefix grams are its exact
    # positions and |A∩B| <= min(sza - pa, szb - pb) + 1. Requiring
    # that bound to reach the equivalent overlap threshold
    # alpha = ceil(tg/(1+tg) * (sza+szb)) never drops a qualifying
    # pair; non-qualifying candidates it drops would have failed the
    # exact verification anyway (measured at sf0.1: 444,557 -> 206,172
    # candidates reaching the array_intersect verification). The
    # groupBy replaces the old .distinct() — same dedup, same keys
    # modulo the functionally-dependent sza/szb, which ride along so
    # the verification join no longer re-fetches sizes from sets_.
    alpha = F.ceil(
        F.lit(tg / (1.0 + tg)) * (F.col("sza") + F.col("szb"))
        - F.lit(1e-9)
    )
    cand = (
        a.join(b, "g")
        .where(
            (F.col("a") < F.col("b"))
            & (
                F.least("sza", "szb").cast("double")
                >= F.lit(tg) * F.greatest("sza", "szb")
            )
        )
        .groupBy("a", "b", "sza", "szb")
        .agg(F.min("pa").alias("pa"), F.min("pb").alias("pb"))
        .where(
            F.least(
                F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")
            )
            + F.lit(1)
            >= alpha
        )
        .select("a", "b", "sza", "szb")
    )
    # One gram-array table serves both verification sides (was built
    # once per side: 2 ObjectHashAggregates + 2 Exchanges before).
    sets_ = scoped_persist(
        exploded.groupBy("id").agg(F.collect_list("g").alias("gs")),
        "dedup.prefix_sets",
        eager=True,
    )
    joined = cand.join(
        sets_.select(F.col("id").alias("a"), F.col("gs").alias("ga")),
        "a",
    ).join(
        sets_.select(F.col("id").alias("b"), F.col("gs").alias("gb")),
        "b",
    )
    i = F.size(F.array_intersect("ga", "gb"))
    jac = F.round(i / (F.col("sza") + F.col("szb") - i), 6)
    return (
        joined.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def minhash_lsh_pairs_cross(
    corpus: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 16,
    max_bucket: int | None = None,
    rows_per_band: int = 1,
    shared_id_space: bool = True,
) -> DataFrame:
    """CROSS-corpus minhash candidate pairs — near-dup decontamination
    of one corpus against another WITHOUT a persistent index: which
    probe documents (a fresh crawl, a candidate training shard) are
    near-duplicates of something in ``corpus`` (an eval benchmark, the
    already-trained set)? :func:`minhash_lsh_pairs` answers the
    within-corpus question; the indexes (``MinhashIndex``) answer it
    incrementally against history — this is the one-shot two-frame
    variant for when no index exists and none should (a single
    pre-training decontamination pass).

    Identical signature machinery and banding convention (shared
    ``bands * rows_per_band`` minhash vector, so tuner picks transfer
    verbatim); the join is corpus-side x probe-side only — no
    within-corpus or within-probe pairs, which is what makes the
    bucket join linear in each side instead of quadratic in their
    union. ``max_bucket`` caps (band, sig) buckets by their COMBINED
    occupancy, same skew rationale as the self-join miner. Output:
    (corpus_id, probe_id), distinct.

    ``shared_id_space`` declares whether equal ids mean the same
    document. True (default): a document carried by both frames never
    reports itself — self-pairs are filtered on the banded join. Pass
    False when the two frames use INDEPENDENT id spaces (e.g. both
    0-based sequential): the filter is skipped, so coincidental id
    collisions no longer silently suppress true pairs. Alternatively
    remap one side (offset or salt its ids) and keep the default.
    """

    def banded_side(df: DataFrame, out: str) -> DataFrame:
        sh = spread(df).select(
            F.col(id_col).alias(out),
            word_shingles(text_col, n).alias("grams"),
        ).where(F.size("grams") > 0)
        banded = minhash_banded_rows(sh, bands, rows_per_band, id_col=out)
        if max_bucket is None:
            # unlike the self-join miner each side has ONE consumer —
            # a persist would only add a memory copy
            return banded
        return scoped_persist(
            banded, f"dedup.minhash_cross_{out}", eager=True
        )

    left = banded_side(corpus, "corpus_id")
    right = banded_side(probe, "probe_id")
    if max_bucket is not None:
        occ = (
            left.select("band", "sig")
            .unionByName(right.select("band", "sig"))
            .groupBy("band", "sig")
            .agg(F.count(F.lit(1)).alias("__bk"))
            .where(F.col("__bk") <= max_bucket)
            .select("band", "sig")
        )
        left = left.join(occ, ["band", "sig"])
        right = right.join(occ, ["band", "sig"])
    out = left.join(right, ["band", "sig"])
    if shared_id_space:
        out = out.where(F.col("corpus_id") != F.col("probe_id"))
    return out.select("corpus_id", "probe_id").distinct()


def dedup_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """REMOVE cross-document duplicated spans from the text — the
    rewrite step of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (ACL'22), at word-n-gram granularity:
    a token is excised when some n-gram window covering it also occurs
    in an EARLIER document (smaller id — ingest order), i.e. the span
    is stale corpus text, not this document's contribution. The first
    carrier keeps its copy, so corpus-wide each span survives exactly
    once. Within-document repeats are NOT removed (the first carrier
    of a gram is the document itself) — this is the cross-doc variant;
    compose with ``paragraph_dedup`` for the intra-corpus line pass.

    Dataflow: one positional gram explode (same token-hash identity as
    ``_shingle_sets``), min-carrier per gram (map-side combined — the
    ``ngram_novelty`` aggregate), an equi-join back on the gram keeping
    only stale windows, and a per-doc fold of the stale START POSITIONS
    into an array. The starts are then merged into disjoint coverage
    ISLANDS before the token filter: every stale window has fixed
    length n, so after sorting, consecutive starts with gap <= n cover
    a contiguous run [first, last+n) — a maximal such run is one
    island, computed with two index-filter lambdas (island opens where
    the gap from the previous start exceeds n; closes where the gap to
    the next one does), O(S) per doc, no quadratic fold. Token j is
    kept iff no island [lo, hi) contains it — O(T x islands) instead
    of O(T x S): a fully-duplicated 100k-token document collapses to
    ONE island, the exact case where filtering against raw starts was
    O(T^2). No token-level shuffle anywhere: positions collapse to a
    per-doc array before they ever leave the gram join. Output:
    (id, n_tokens, n_removed, text_clean) — text_clean rejoins kept
    tokens with single spaces (whitespace is not preserved; token
    identity is).
    """
    pre = scoped_persist(
        _span_tokens(docs, text_col, id_col), "dedup.span_toks"
    )
    exploded = pre.select(
        "id", F.posexplode(_window_hash_expr(n)).alias("pos", "g")
    )
    first = exploded.groupBy("g").agg(F.min("id").alias("first_id"))
    stale = (
        exploded.join(first, "g")
        .where(F.col("first_id") < F.col("id"))
        .groupBy("id")
        .agg(F.collect_set("pos").alias("__starts"))
    )
    return _excise_stale_spans(pre, stale, n, id_col)


def _norm_token(c: "F.Column") -> "F.Column":
    """Casefold/punct-normalized token identity — the
    ``normalized_dedup`` convention at token granularity: lowercase,
    strip every non-alphanumeric character. Used only for gram JOIN
    identity; positions and the rewrite keep the ORIGINAL tokens, so
    'Hello,' matches 'hello' without the cleaned output mutating."""
    return F.regexp_replace(F.lower(c), "[^a-z0-9]", "")


def _span_tokens(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    normalize: bool = False,
) -> DataFrame:
    """The per-doc token projection every span excision starts from:
    (id, __t tokens, __th xxhash64 token hashes, __nt count).
    ``normalize=True`` hashes the casefold/punct-normalized token
    (:func:`_norm_token`) instead of the raw bytes — the
    trivial-evasion screen (re-cased / re-punctuated benchmark text
    still collides) — while ``__t`` stays raw so any excision rewrite
    emits the original corpus bytes."""
    toks = tokens(text_col)
    ident = (lambda x: F.xxhash64(_norm_token(x))) if normalize else (
        lambda x: F.xxhash64(x)
    )
    return spread(docs).select(
        F.col(id_col).alias("id"),
        toks.alias("__t"),
        F.transform(toks, ident).alias("__th"),
        F.size(toks).alias("__nt"),
    )


def _excise_stale_spans(
    pre: DataFrame, stale: DataFrame, n: int, id_col: str
) -> DataFrame:
    """Shared rewrite tail of :func:`dedup_spans` /
    :func:`dedup_spans_cross`: fold each doc's stale window START
    positions into disjoint coverage islands, excise covered tokens,
    emit (id, n_tokens, n_removed, text_clean). ``stale`` is
    (id, __starts array<int>); docs absent from it keep all tokens."""
    joined = pre.join(stale, "id", "left").withColumn(
        "__ss",
        F.array_sort(F.coalesce("__starts", F.array().cast("array<int>"))),
    )
    # Gap > n between sorted fixed-width starts <=> disjoint coverage:
    # los keeps each start that opens an island, his each that closes
    # one (shifted by +n to the exclusive end). when() guards the
    # 1-based element_at from index 0 / past-the-end probes.
    los = F.filter(
        F.col("__ss"),
        lambda s, i: F.when(i == 0, F.lit(True)).otherwise(
            s - F.element_at(F.col("__ss"), i) > F.lit(n)
        ),
    )
    his = F.transform(
        F.filter(
            F.col("__ss"),
            lambda s, i: F.when(
                i == F.size(F.col("__ss")) - 1, F.lit(True)
            ).otherwise(F.element_at(F.col("__ss"), i + 2) - s > F.lit(n)),
        ),
        lambda s: s + F.lit(n),
    )
    joined = joined.withColumn(
        "__isl", F.arrays_zip(los.alias("lo"), his.alias("hi"))
    )
    kept = F.filter(
        F.col("__t"),
        lambda x, j: ~F.exists(
            F.col("__isl"),
            lambda e: (e["lo"] <= j) & (j < e["hi"]),
        ),
    )
    return joined.select(
        F.col("id").alias(id_col),
        F.col("__nt").alias("n_tokens"),
        (F.col("__nt") - F.size(kept)).alias("n_removed"),
        # NULL-text docs keep NULL counts (matching the oracles' len()
        # arithmetic) but an EMPTY clean text — SQL string_agg over no
        # rows coalesces to '' on the oracle side, and array_join(NULL)
        # must not disagree.
        F.coalesce(F.array_join(kept, " "), F.lit("")).alias("text_clean"),
    )


def dedup_spans_cross(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    normalize: bool = False,
) -> DataFrame:
    """Decontamination REWRITE: excise from a training ``corpus`` every
    token covered by a word-n-gram window that occurs ANYWHERE in a
    held-out ``benchmark`` corpus — :func:`dedup_spans`' stale-window
    machinery composed with :func:`minhash_lsh_pairs_cross`'s two-frame
    shape, except exact (gram equi-join, no banding) and rewriting
    rather than flagging. Unlike the self variant there is no
    first-carrier exemption: the benchmark is not being trained on, so
    EVERY contaminated span is removed from every corpus document.
    Within-corpus duplication is untouched — run :func:`dedup_spans`
    for that pass.

    Dataflow is linear in each side (the cross-miner contract): the
    benchmark collapses to its DISTINCT gram hashes (map-side combined
    — benchmark text never shuffles, only 8-byte hashes), the corpus
    explodes positionally once, and a LEFT SEMI equi-join on the gram
    marks contaminated starts — duplicate-insensitive, so no benchmark
    dedup round-trip. Start positions fold per doc and the island
    excision is the shared O(T x islands) tail. Output: (id_col,
    n_tokens, n_removed, text_clean) — one row per corpus document,
    benchmark rows never appear.

    Gram identity is the xxhash64 token-window hash (the
    ``minhash_dedup_auto`` hashed-shingle caveat applies: a 64-bit
    collision could excise an innocent span; at corpus scale the
    expected collision count is negligible and the failure mode is
    over-removal, never leakage).

    Despite the fixed window width, the removal is LENGTH-EXACT for
    contaminated spans of ANY length >= n (the
    :func:`~seriesly_spark.operators.suffix.dedup_spans_exact`
    covering argument: every n-window inside a shared span is itself
    shared, so the window union covers the whole span); only spans
    shorter than n escape — ``n`` IS the minimum span length, not an
    approximation granularity.

    ``normalize=True`` switches BOTH sides' gram identity to the
    casefold/punct-normalized token (:func:`_norm_token`): benchmark
    text that was trivially re-cased or re-punctuated in the corpus
    still matches, while the excised output keeps the corpus's raw
    bytes. Token INSERTIONS still evade (they shift window
    positions) — that's the similarity miners' territory, not exact
    gram matching.
    """
    pre = scoped_persist(
        _span_tokens(corpus, text_col, id_col, normalize=normalize),
        "dedup.span_toks_cross",
    )
    bench_grams = (
        _span_tokens(benchmark, text_col, id_col, normalize=normalize)
        .select(F.explode(_window_hash_expr(n)).alias("g"))
        .distinct()
    )
    stale = (
        pre.select("id", F.posexplode(_window_hash_expr(n)).alias("pos", "g"))
        .join(bench_grams, "g", "left_semi")
        .groupBy("id")
        .agg(F.collect_set("pos").alias("__starts"))
    )
    return _excise_stale_spans(pre, stale, n, id_col)


def dedup_spans_exact_keep1(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 8,
) -> DataFrame:
    """KEEP-ONE length-exact duplicated-span removal — Lee et al.'s
    actual ExactSubstr bookkeeping (ACL'22): the corpus-global EARLIEST
    occurrence of each duplicated span keeps its copy; every later
    occurrence of a span >= ``min_len`` tokens is excised. The
    remove-all variant (:func:`~seriesly_spark.operators.suffix.
    dedup_spans_exact`) treats recurring text as boilerplate and keeps
    nothing; this one never loses corpus content.

    Semantics and why no suffix array is needed: in suffix order,
    the suffixes sharing a >= min_len common prefix form one
    contiguous RUN, and keep-one exempts the run's minimal (id, pos).
    But a run IS exactly the class of positions whose fixed min_len-
    token window has identical content — so the run minimum equals the
    per-window-class minimum, which the positional-gram machinery
    computes directly: one explode of hashed min_len-windows, a
    min(struct(id, pos)) per window class (map-side combined), and an
    equi-join back marking every NON-minimal occurrence stale. Length-
    exactness for spans >= min_len is the shared covering argument (a
    suffix of a duplicated span is itself duplicated, so the union of
    fixed windows over stale starts covers stale spans of EVERY length
    exactly) — same contract as ``dedup_spans_exact``, same
    ``_excise_stale_spans`` island tail. No sort rounds, no rank
    tables: strictly fewer shuffles than the suffix-array route for
    identical output.

    Granularity note: keep-one exempts each window CLASS's earliest
    occurrence, so a twin pair keeps exactly one intact copy; a span
    that is internally repetitive at min_len granularity keeps one
    copy of each distinct window (the periodic-text edge: "x x x x"
    collapses to its first unit), matching the window-level reading of
    ExactSubstr. Output: (id_col, n_tokens, n_removed, text_clean);
    ids must be orderable — "earliest" is min (id, pos).
    """
    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    pre = scoped_persist(
        _span_tokens(docs, text_col, id_col), "dedup.keep1_toks"
    )
    exploded = pre.select(
        "id", F.posexplode(_window_hash_expr(min_len)).alias("pos", "g")
    )
    keeper = exploded.groupBy("g").agg(
        F.min(F.struct("id", "pos")).alias("k")
    )
    stale = (
        exploded.join(keeper, "g")
        .where(
            (F.col("id") != F.col("k.id")) | (F.col("pos") != F.col("k.pos"))
        )
        .groupBy("id")
        .agg(F.collect_set("pos").alias("__starts"))
    )
    return _excise_stale_spans(pre, stale, min_len, id_col)


def decontam_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    verbatim: float = 0.8,
    partial: float = 0.2,
) -> DataFrame:
    """Per-benchmark-document contamination SEVERITY report — the
    analyst-facing composite over the cross-corpus family, answering
    the decontamination triage question per eval document: how much of
    it leaked into training, and how should the hit be classed?

    - ``gram_containment`` = fraction of the document's distinct word
      n-grams that occur ANYWHERE in the corpus (exact; the benchmark
      side keeps per-doc distinct grams, the corpus side collapses to
      ONE distinct gram set, and a hit-flag left join feeds a single
      per-doc aggregate — linear in each side, duplicate-insensitive,
      and the join key is the long-space hashed shingle identity from
      ``_shingle_sets``, never gram text).
    - ``near_dup_corpus_docs`` = how many corpus documents share a
      minhash band with it (:func:`minhash_lsh_pairs_cross`, same
      banding as the dedup ladder; its shared-id-space precondition
      applies here too).
    - ``severity``: 'verbatim' when containment >= ``verbatim``,
      else 'partial' when >= ``partial``, else 'near_dup' when any
      banded corpus doc exists, else 'clean' — thresholds are
      parameters because the right triage line is corpus-specific.

    Output: (id_col, n_grams, n_hits, gram_containment — round-6,
    NULL when the doc has no grams —, near_dup_corpus_docs, severity),
    one row per benchmark document. Compose with
    :func:`dedup_spans_cross` to REWRITE whatever this report flags.
    """
    if not (0.0 <= partial <= verbatim <= 1.0):
        raise ValueError(
            "decontam_report thresholds must satisfy "
            f"0 <= partial <= verbatim <= 1 (got partial={partial}, "
            f"verbatim={verbatim})"
        )
    bg = _shingle_sets(benchmark, text_col, id_col, n, "dedup.decontam_bg")
    cg = (
        _shingle_sets(corpus, text_col, id_col, n, "dedup.decontam_cg")
        .select("g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    stats = (
        bg.join(cg, "g", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
    )
    near = (
        minhash_lsh_pairs_cross(
            corpus, benchmark, text_col=text_col, id_col=id_col, n=n
        )
        .groupBy("probe_id")
        .agg(F.count(F.lit(1)).alias("near_dup_corpus_docs"))
    )
    base = (
        benchmark.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .join(near.withColumnRenamed("probe_id", "id"), "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce("near_dup_corpus_docs", F.lit(0))
            .cast("bigint")
            .alias("near_dup_corpus_docs"),
        )
    )
    cont = F.round(F.col("n_hits") / F.col("n_grams"), 6)
    return base.select(
        F.col("id").alias(id_col),
        "n_grams",
        "n_hits",
        F.when(F.col("n_grams") > 0, cont).alias("gram_containment"),
        "near_dup_corpus_docs",
        F.when(
            (F.col("n_grams") > 0) & (cont >= F.lit(verbatim)),
            F.lit("verbatim"),
        )
        .when(
            (F.col("n_grams") > 0) & (cont >= F.lit(partial)),
            F.lit("partial"),
        )
        .when(F.col("near_dup_corpus_docs") > 0, F.lit("near_dup"))
        .otherwise(F.lit("clean"))
        .alias("severity"),
    )
