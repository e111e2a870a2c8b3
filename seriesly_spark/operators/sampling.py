"""Dataset splitting and corpus-statistics operators for training-data
pipelines.

hash_split: the production answer to "reproducible train/val/test" — the
split is a pure function of the row's id (first 16 bits of md5, mod 100),
so it is stable across runs, engines, partitionings and re-ingests, needs
no stored split table, and co-assigns nothing by accident. Group-level
splits (all of a user's docs in one split) fall out of hashing the group
key instead of the row key. No RNG state, no sampleBy — engine-portable
by construction.

vocab_topk: global token frequencies (the vocabulary/BPE-training first
pass): explode -> count -> top-k. Map-side partial counts do the heavy
lifting; only (token, partial-count) pairs shuffle.

contamination_overlap: fraction of each probe document's shingles that
appear anywhere in the rest of the corpus — the decontamination check run
before training on scraped data (does this eval document leak into the
corpus?). Shingle equi-join against the distinct corpus shingle set; never
a pairwise comparison.

dedup_safe_split: hash_split where exact duplicates always co-locate —
the split hashes the duplicate cluster's REPRESENTATIVE (min id per
content hash), never the row, so a test document's byte-identical twins
cannot leak into train. The split-by-group rule hash_split documents,
made automatic for the one group every pipeline has: exact-dup clusters.

ngram_novelty: per document, the fraction of its distinct word n-grams
whose FIRST corpus occurrence (min doc id over all carriers) is that
document — the marginal-novelty signal data-curriculum and crawl-frontier
scoring use (a doc of entirely already-seen n-grams adds nothing). One
shuffle on the gram, an equi-join back, a per-doc fold; never pairwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.dedup import content_hash, word_shingles
from seriesly_spark.operators.util import scoped_persist, spread


def _md5_u16(key: Column, salt: str) -> Column:
    """First 4 hex nibbles of md5(salt || key) as an int in [0, 65536) —
    identical arithmetic is expressible in any engine with md5+substr."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))
    nib = lambda i: F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
    return ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)


def _md5_bucket(key: Column, salt: str, buckets: int = 100) -> Column:
    return _md5_u16(key, salt) % buckets


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the 16-bit md5 value
    of its key falls below fraction * 65536. Unlike df.sample(), the kept
    set is a pure function of the keys — stable across runs, engines and
    partitionings, and resolution-consistent (a 10% sample is a superset
    of a 5% sample with the same salt)."""
    return df.where(_md5_u16(F.col(key_col), salt) < int(round(fraction * 65536)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the hash-based analogue of
    df.sampleBy): each stratum keeps its own fraction; strata absent from
    the dict are dropped. One narrow filter — no shuffle, no RNG state."""
    v = _md5_u16(F.col(key_col), salt)
    thr = None
    for name, frac in fractions.items():
        cond = F.col(strata_col) == name
        t = F.lit(int(round(frac * 65536)))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    return df.where(v < thr)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign a deterministic split label per row: md5-bucket the key into
    [0, 100) and carve ranges by weight (percent, must sum to 100).
    Hash the GROUP key (user_id, source domain, ...) to keep groups intact.
    """
    weights = weights or {"train": 98, "val": 1, "test": 1}
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    b = _md5_bucket(F.col(key_col), salt)
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = b < lo + w
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def vocab_topk(
    docs: DataFrame, k: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-k corpus tokens by total occurrences (count desc, token asc)."""
    toks = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
    return (
        spread(docs).select(toks)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(k)
    )


def contamination_overlap(
    docs: DataFrame,
    probe_filter: Column,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per probe document: the fraction of its distinct word-n-gram
    shingles that occur in the NON-probe part of the corpus. Output:
    (doc_id, n_shingles, overlap) for probes with >= 1 shingle."""
    # persist(): both the probe and corpus branches read this subtree —
    # without it the shingle generation runs twice (spillable, array rows).
    sh = spread(docs).select(
        F.col(id_col),
        probe_filter.alias("__probe"),
        word_shingles(text_col, n).alias("grams"),
    )
    sh = scoped_persist(sh, "sampling.contamination_shingles")
    probe = (
        sh.where(F.col("__probe") & (F.size("grams") > 0))
        .select(id_col, F.size("grams").alias("n_shingles"), F.explode("grams").alias("g"))
    )
    corpus = (
        sh.where(~F.col("__probe"))
        .select(F.explode("grams").alias("g"))
        .distinct()
    )
    hit = corpus.withColumn("__hit", F.lit(1))
    return (
        probe.join(hit, "g", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.round(
                F.count("__hit") / F.first("n_shingles"), 6
            ).alias("overlap"),
        )
    )


def dedup_safe_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test split: every row gets
    :func:`hash_split`'s deterministic label, but computed from the
    exact-duplicate cluster REPRESENTATIVE (min ``id_col`` per content
    hash, ``dedup.dedup_exact``'s survivor) instead of the row id — so
    byte-identical copies of a test document can never land in train.
    Near-dup co-location composes the same way: feed the cluster id
    from ``connected_components`` to :func:`hash_split` directly.

    Output: (id, rep_id, split), one row per input row. Plan: one
    hash-agg shuffle on the content md5 (dedup_exact's shape) + one
    co-partitioned equi-join back on the same key — at 100 TB both
    stages shuffle (hash, id) pairs, never text.

    NULL text is a cluster of its own: the key is the md5 coalesced to
    a sentinel (md5 output is hex, so ``"null"`` cannot collide), so
    null-text rows get a split label like everyone else instead of
    silently vanishing through the equi-join's NULL-key drop.
    """
    h = F.coalesce(content_hash(F.col(text_col)), F.lit("null"))
    reps = (
        docs.groupBy(h.alias("__h"))
        .agg(F.min(id_col).alias("rep_id"))
    )
    rows = docs.select(F.col(id_col), h.alias("__h")).join(reps, "__h")
    return hash_split(rows, "rep_id", weights, salt).select(
        id_col, "rep_id", "split"
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: how many of its distinct word-n-gram shingles are
    FIRST INTRODUCED by it — i.e. no document with a smaller id carries
    the gram. Output (id, n_shingles, n_novel, novelty) for documents
    with >= 1 shingle; ``novelty`` = n_novel / n_shingles rounded to 6.

    The id order stands in for arrival order (crawl ingest ids are
    monotone), making this the marginal-contribution score a curriculum
    or frontier scheduler ranks by. Plan: explode distinct grams once
    (persisted — the first-carrier aggregate and the join probe both
    read it), min-id per gram (map-side combine does the heavy lifting),
    co-partitioned join back on the gram, per-doc fold. The only wide
    exchange is keyed on the gram — and the gram identity is the
    long-space hashed shingle of ``_shingle_sets`` (tokens are
    whitespace-free, so the old concat-ws string identity was injective
    over token windows — hash identity matches it exactly, modulo the
    same ~n²/2⁶⁵ xxhash64 collision contract every set-similarity
    miner already carries), so 8-byte longs cross the two gram-keyed
    exchanges instead of gram STRINGS — the same scale class as
    ``contamination_overlap`` / ``ngram_jaccard_pairs``.
    """
    from seriesly_spark.operators.dedup import _shingle_sets

    ex = _shingle_sets(docs, text_col, id_col, n, "sampling.novelty_shingles")
    first = ex.groupBy("g").agg(F.min("id").alias("__first"))
    return (
        ex.join(first, "g")
        .groupBy("id")
        .agg(
            F.first("sz").alias("n_shingles"),
            F.sum(
                (F.col("__first") == F.col("id")).cast("long")
            ).alias("n_novel"),
            F.round(
                F.sum((F.col("__first") == F.col("id")).cast("long"))
                / F.first("sz"),
                6,
            ).alias("novelty"),
        )
        .select(
            F.col("id").alias(id_col), "n_shingles", "n_novel", "novelty"
        )
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    target_parts: dict[str, int],
    salt: str = "",
) -> DataFrame:
    """Deterministic source-mixture resampling — the training-mix stage:
    keep as much data as possible while the kept set approaches a target
    mixture given as integer parts (e.g. ``{"web": 6, "books": 3,
    "code": 1}``). The limiting stratum m (smallest count/parts ratio)
    keeps everything; stratum s keeps ~``n_m * w_s / w_m`` rows.

    Per-stratum thresholds are pure integer arithmetic —
    ``floor(65536 * w_s * n_m / (w_m * n_s))`` applied to the 16-bit md5
    of the row key — so the kept set is a deterministic function of keys
    and observed counts, reproducible bit-for-bit in any engine (the
    argmin ratio compare is one IEEE division, which is correctly rounded
    and therefore engine-identical). Intermediate products stay in int64
    for corpora up to ~1.4e12 rows per stratum at 100 parts.

    Dataflow: one tiny count aggregate, a min_by over it, thresholds
    broadcast back onto the scan — no driver-side data, no RNG state,
    no shuffle of df itself. Strata absent from ``target_parts`` drop.
    """
    parts = {name: int(p) for name, p in target_parts.items()}
    if any(p <= 0 for p in parts.values()):
        raise ValueError("target parts must be positive integers")
    w = None
    for name, p in parts.items():
        cond = F.col(strata_col) == name
        w = F.when(cond, p) if w is None else w.when(cond, p)
    counts = (
        df.where(F.col(strata_col).isin(*parts))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", w.cast("long"))
    )
    lim = counts.agg(
        F.min_by(
            F.struct("n", "w"), F.col("n").cast("double") / F.col("w")
        ).alias("m")
    ).select(F.col("m.n").alias("n_m"), F.col("m.w").alias("w_m"))
    thr = counts.crossJoin(F.broadcast(lim)).select(
        strata_col,
        F.expr("(65536 * w * n_m) div (w_m * n)").alias("thr"),
    )
    return (
        df.join(F.broadcast(thr), strata_col)
        .where(_md5_u16(F.col(key_col), salt) < F.col("thr"))
        .drop("thr")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic importance sampling: keep a row with probability
    weight / max(weight) — the quality-weighted downsampling step of a
    curation pipeline (high-quality docs survive, low-quality ones
    thin out), reproducible across runs and engines because the coin
    is the row's own md5, not an RNG.

    Keep rule: md5_u16(salt || key) < 65536 * w / w_max. One tiny max
    aggregate broadcast back onto a narrow filter — the corpus never
    shuffles; the integer-vs-double compare is identical IEEE
    arithmetic in any engine. Weights must be non-negative; rows with
    NULL weight drop. Output: the surviving rows plus the u16 draw
    (for audit)."""
    wmax = df.agg(F.max(F.col(weight_col)).alias("__wmax"))
    u16 = _md5_u16(F.col(key_col), salt)
    return (
        df.crossJoin(F.broadcast(wmax))
        .withColumn("__u16", u16)
        .where(
            F.col("__u16")
            < F.lit(65536.0) * F.col(weight_col) / F.col("__wmax")
        )
        .drop("__wmax")
    )


def reservoir_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int,
    salt: str = "rpg",
) -> DataFrame:
    """Deterministic k-per-group uniform sample — the "inspect 100 docs
    per source", "cap any one domain's contribution at k" primitive of
    corpus curation. A classic reservoir is sequential state; the
    distributed equivalent is hash-ranking: md5(salt || key) is an
    i.i.d. uniform draw per row, so the k smallest hashes per group ARE
    a uniform k-subset — reproducible across runs, engines and
    partitionings (no RNG state, unlike ``rand()``-based sampling).

    Plan: ONE shuffle on the group key; ``row_number`` over (hash, key)
    inside each group then the ``<= k`` filter. Spark plans the window
    + filter as a running TopK per partition after AQE; the per-group
    state is k rows. Skewed groups: the window sort is (group) ×
    (hash) — a single hot group still sorts its partition, so at
    extreme skew pre-filter with an approximate per-group hash
    threshold first (same two-pass shape as mixture_sample).

    PRECONDITION — ``key_col`` must be unique within each group: the
    draw is a pure function of the key, so two rows sharing a key tie
    on BOTH window sort keys (hash, key) and their relative
    ``row_number`` falls to partition order — the reproducibility
    guarantee holds only over unique keys. With a non-unique natural
    key, pass a derived unique one (e.g. ``concat(key, '|', offset)``).

    Output: the surviving rows + ``sample_rank`` (1..k by hash order,
    audit/debug column).
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary"))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= k)
    )


def rare_label_collapse(
    df: DataFrame,
    label_col: str,
    min_support: int,
    other: str = "__other__",
) -> DataFrame:
    """Collapse long-tail categories below a support threshold into a
    single ``other`` bucket — the label-space cleanup run before
    stratified splits or per-class metrics (a class with 3 examples
    destabilizes both). NULL labels also collapse into ``other``.

    Plan: one count aggregate over the label column (tiny — label
    cardinality), broadcast back onto the fact as a left join + 
    conditional projection; the corpus itself never shuffles. At
    100 TB the label table is still label-cardinality-sized, so the
    broadcast holds; if labels are unbounded (raw domains), cap with
    vocab_topk first — same shape.

    Output: the input rows with ``label_final`` (original or
    ``other``) plus the original label's support count ``label_n``
    (0-filled for NULL labels, audit column).
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("label_n"))
    keep = counts.where(
        F.col(label_col).isNotNull() & (F.col("label_n") >= min_support)
    )
    return (
        df.join(F.broadcast(keep.select(label_col, "label_n")), [label_col], "left")
        .withColumn(
            "label_final",
            F.when(F.col("label_n").isNotNull(), F.col(label_col)).otherwise(
                F.lit(other)
            ),
        )
        .withColumn("label_n", F.coalesce(F.col("label_n"), F.lit(0)))
    )


def epoch_shuffle(
    df: DataFrame,
    key_col: str,
    epochs: int = 1,
    shards: int = 8,
    salt: str = "ep",
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle — the "global
    shuffle" stage of a training-data loader, reproducible across runs
    and engines (the order is a pure function of (epoch, key), no RNG
    state to checkpoint).

    A TOTAL order per epoch would need a global sort; no loader
    actually consumes one — they consume SHARDS, each internally
    ordered. So each row draws a shard (md5 bucket over epoch+key) and
    a position within that shard (rank of md5(epoch || salt || key)
    inside the shard): one window per (epoch, shard) partition — the
    shuffle is keyed on epochs x shards groups, each ~n/shards rows,
    and no global single-partition sort ever exists. Epochs explode
    from a literal sequence (narrow).

    PRECONDITION — ``key_col`` must be unique (it is the document id):
    duplicate keys tie on the within-shard rank hash and their relative
    ``pos`` falls to partition order, voiding cross-run reproducibility
    for exactly those rows. Dedup first, or derive a unique key.

    Output: input key + (epoch, shard, pos) with pos 1.. per shard —
    ORDER BY (epoch, shard, pos) reproduces the loader's read order.
    """
    from pyspark.sql import Window

    e = F.explode(
        F.sequence(F.lit(0), F.lit(int(epochs) - 1))
    ).alias("epoch")
    rows = df.select(F.col(key_col), e)
    h = F.md5(
        F.concat(
            F.lit(salt),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col(key_col).cast("string"),
        ).cast("binary")
    )
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % shards).alias(
        "shard"
    )
    w = Window.partitionBy("epoch", "shard").orderBy(h, F.col(key_col))
    return (
        rows.select(F.col(key_col), F.col("epoch"), shard, h.alias("__h"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def mixture_plan(
    df: DataFrame,
    group_col: str,
    budget_tokens: int,
    size_col: str | None = None,
    text_col: str = "text",
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-weighted mixture PLANNING: given per-source corpus
    sizes and a total token budget, compute each source's sampling
    weight w_s ∝ tokens_s^τ and the budget's allocation — the
    data-mixing worksheet (UnifiedQA / multilingual-LM style
    temperature sampling, τ<1 upweights small sources) a pipeline
    owner reads BEFORE launching a 100 TB pretraining mix.
    ``mixture_sample`` enforces a given mix; this DERIVES one.

    epochs > 1 on a source means the plan re-reads it (upsampling);
    the owner caps τ or the budget until epochs are acceptable.

    Determinism across engines: the default τ=0.5 computes weights via
    sqrt — CORRECTLY ROUNDED per IEEE-754, unlike pow whose last ulp
    is libm's choice — and every cross-group sum runs over
    decimal(38,18) casts of those doubles (exact, order-independent).
    Other temperatures use pow and are documented as
    last-ulp-best-effort. Token counts are whitespace tokens of
    ``text_col`` unless ``size_col`` provides precomputed sizes.

    Scale shape: ONE corpus aggregate (map-side combined count+sum per
    source — only (source, n, tokens) triples shuffle), then all
    arithmetic on the sources-sized table with the two totals joined
    as a broadcast 1-row frame. Output per source, ordered:
    (group, n_docs, n_tokens, raw_share, weight, planned_tokens,
    epochs).
    """
    from seriesly_spark.operators.textstats import tokens

    sz = (
        F.col(size_col).cast("long")
        if size_col
        else F.size(tokens(text_col)).cast("long")
    )
    g = (
        spread(df)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(sz).alias("n_tokens"),
        )
    )
    if temperature == 0.5:
        pw = F.sqrt(F.col("n_tokens").cast("double"))
    else:
        pw = F.pow(F.col("n_tokens").cast("double"), F.lit(temperature))
    g = g.withColumn("__pw", pw)
    tot = g.agg(
        F.sum("n_tokens").alias("__tot_tokens"),
        F.sum(F.col("__pw").cast("decimal(38,18)"))
        .cast("double")
        .alias("__tot_pw"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("__tot_tokens"), 6).alias(
                "raw_share"
            ),
            F.round(F.col("__pw") / F.col("__tot_pw"), 6).alias("weight"),
            F.round(
                F.lit(float(budget_tokens)) * F.col("__pw") / F.col("__tot_pw"),
                0,
            )
            .cast("long")
            .alias("planned_tokens"),
            F.round(
                F.lit(float(budget_tokens))
                * F.col("__pw")
                / F.col("__tot_pw")
                / F.col("n_tokens"),
                6,
            ).alias("epochs"),
        )
        .orderBy(group_col)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group row cap — the "at most N documents per
    domain" curation stage: within each group, rank rows by the md5 of
    their key (a uniform random-but-reproducible order; ``key_col``
    breaks the astronomically-unlikely hash tie) and keep the first
    ``cap``. The kept set is a pure function of (keys, salt): stable
    across runs, engines, partitionings, and monotone in ``cap`` (a
    cap-16 keep set contains the cap-8 one).

    Scale shape: the rank filter compiles to WindowGroupLimit, so every
    map task forwards at most ``cap`` rows per group BEFORE the
    exchange — a skewed mega-domain ships cap rows per input partition,
    never its full row count. Output: the input columns, capped.
    """
    from pyspark.sql import Window

    h = F.md5(
        F.concat(F.lit(salt), F.col(key_col).cast("string")).cast("binary")
    )
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= cap)
        .drop("__r")
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    k: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS'23): score
    every raw-pool document by how much more likely its hashed n-gram
    features are under a TARGET corpus (the distribution you want —
    curated text, a domain) than under the raw pool itself. The
    downstream resampler keeps raw docs with the highest weights —
    the principled version of "filter the crawl to look like the
    target".

    Features are the paper's: unigrams and bigrams, hashed into
    ``buckets`` counters (md5-based — the same engine-portable 16-bit
    fold as :func:`hash_split`, so any engine with md5+substr replays
    the bucketing bit-for-bit). Both corpora fit add-k-smoothed
    multinomials over the bucket space; a raw doc's weight is its
    feature multiset's log-likelihood ratio

        logratio(d) = sum_f m_f * (log2 p_target(f) - log2 p_raw(f))

    folded in decimal(38,18) (order-independent — the bigram_lm_score
    convention) and rounded to 6. Output: (doc_id, n_feats, logratio);
    higher = more target-like. logratio is NULL only for docs that
    yield NO features — NULL text (split of NULL drops at explode).
    Empty/whitespace-only text is NOT that case: whitespace-split of
    '' is [''], so such docs carry one empty-string unigram and score
    like any other single-token doc (the '' bucket is a real feature
    both corpora share).

    Scale shape: two hash aggregates collapse each corpus to at most
    ``buckets`` rows (map-side combine — Zipf skew lands on partial
    counts, not row movement); per-doc feature multisets shuffle as
    (doc, bucket, m) triples, never text; the two count tables and the
    two 1-row totals join as broadcasts. At 100 TB the only
    corpus-sized stages are the two feature explodes.
    """
    from seriesly_spark.operators.textstats import tokens

    def feats(df: DataFrame, with_id: bool) -> DataFrame:
        t = tokens(text_col)
        pre = spread(df).select(
            (F.col(id_col) if with_id else F.lit(0)).alias("id"),
            t.alias("__t"),
        )
        uni = F.col("__t")
        bi = F.when(
            F.size("__t") >= 2,
            F.transform(
                F.slice("__t", 1, F.size("__t") - 1),
                lambda x, i: F.concat_ws(" ", x, F.col("__t")[i + 1]),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return pre.select(
            "id",
            F.explode(F.concat(uni, bi)).alias("__f"),
        ).select(
            "id", (_md5_u16(F.col("__f"), "dsir") % buckets).alias("b")
        )

    # doc_feats has THREE consumers in the one action (the raw count
    # table, its total, and the scored join) and p_cnt two (join +
    # total) — persist both or the corpus-sized feature explodes run
    # once per consumer (plan audit: 20 Exchanges -> 8). Both persists
    # are eager for the single-action reason the minhash miners
    # document; p_cnt is bucket-sized (<= ``buckets`` rows).
    doc_feats = scoped_persist(
        feats(raw, with_id=True).groupBy("id", "b").agg(
            F.count(F.lit(1)).alias("m")
        ),
        "sampling.dsir_doc_feats",
        eager=True,
    )
    q_cnt = doc_feats.groupBy("b").agg(F.sum("m").alias("cq"))
    p_cnt = scoped_persist(
        feats(target, with_id=False).groupBy("b").agg(
            F.count(F.lit(1)).alias("cp")
        ),
        "sampling.dsir_target_counts",
        eager=True,
    )
    # coalesce: an EMPTY corpus sums to NULL; 0 backs the smoothed
    # model off to the uniform 1/B instead of propagating NULL scores
    tots = q_cnt.agg(
        F.coalesce(F.sum("cq"), F.lit(0)).alias("tq")
    ).crossJoin(
        F.broadcast(
            p_cnt.agg(F.coalesce(F.sum("cp"), F.lit(0)).alias("tp"))
        )
    )
    lr = F.log2(
        (F.coalesce(F.col("cp"), F.lit(0)) + F.lit(k))
        / (F.col("tp") + F.lit(float(k * buckets)))
    ) - F.log2(
        (F.col("cq") + F.lit(k)) / (F.col("tq") + F.lit(float(k * buckets)))
    )
    scored = (
        doc_feats.join(p_cnt, "b", "left")
        .join(q_cnt, "b")
        .crossJoin(F.broadcast(tots))
        .groupBy("id")
        .agg(
            F.sum("m").alias("n_feats"),
            F.sum((F.col("m") * lr).cast("decimal(38,18)")).alias("__s"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_feats",
            F.round(F.col("__s").cast("double"), 6).alias("logratio"),
        )
    )
    spine = raw.select(id_col)
    return spine.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        "logratio",
    )


def budget_select(
    df: DataFrame,
    group_col: str,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    temperature: float = 0.5,
    size_col: str | None = None,
    max_rows_per_group: int | None = None,
) -> DataFrame:
    """Execute a :func:`mixture_plan` at document granularity: give
    each source its temperature-planned token allocation, then fill it
    greedily with the source's token-richest documents (ties by id) —
    the selection pass that turns the mixing worksheet into an actual
    training set when the budget is a hard token count. A document is
    kept iff its source's running token total, taken longest-first,
    still fits the source's ``planned_tokens``.

    Deterministic and engine-replayable: the allocation is
    mixture_plan's (sqrt weights at the default τ=0.5, decimal
    cross-group sums), the ranking is (n_tokens DESC, id ASC) — a
    total order — and the running total is a plain window cumsum.
    Output: (doc_id, group, n_tokens, cum_tokens), the selected rows.

    Scale shape: ONE corpus pass reduces each doc to (id, group,
    n_tokens) before the exchange (text never shuffles); the cumsum
    sorts per source — bounded by the per-group partition sort budget,
    the same contract as every sessionizer here. Sources-sized
    allocation table joins as a broadcast.

    ``max_rows_per_group`` is the mega-source escape hatch, callable
    instead of composed: when set, each group is truncated to its
    ``max_rows_per_group`` highest-ranked rows in the SAME
    (n_tokens DESC, id ASC) order the cumsum consumes — a rank filter
    that compiles to WindowGroupLimit, so the mega-group shrinks
    map-side BEFORE the exchange and the single-partition sort is
    bounded by the cap. (Spark only rewrites rank filters whose limit
    is <= spark.sql.optimizer.windowGroupLimitThreshold, default 1000
    — raise that conf alongside a larger cap or the filter silently
    degrades to a full per-group sort; still correct, just unbounded
    again.) The selection is provably unchanged whenever
    the capped prefix still covers the group's allocation (the cumsum
    only ever keeps a prefix of that order) — size it at
    ~planned_tokens / min_doc_tokens. The allocation itself is always
    computed from the FULL group sizes, cap or no cap. Unset, the
    plan is untouched.
    """
    from pyspark.sql import Window

    from seriesly_spark.operators.textstats import tokens

    sz = (
        F.col(size_col).cast("long")
        if size_col
        else F.size(tokens(text_col)).cast("long")
    )
    # Reduce to (id, group, n_tokens) ONCE and feed both the planning
    # aggregate and the ranking from the cached projection — otherwise
    # the corpus tokenizes twice (mixture_plan re-derives sizes).
    ranked = scoped_persist(
        spread(df).select(
            F.col(id_col), F.col(group_col), sz.alias("n_tokens")
        ),
        "sampling.budget_ranked",
        eager=True,
    )
    plan = mixture_plan(
        ranked,
        group_col,
        budget_tokens,
        size_col="n_tokens",
        temperature=temperature,
    ).select(group_col, "planned_tokens")
    sel = ranked
    if max_rows_per_group is not None:
        if max_rows_per_group < 1:
            raise ValueError("max_rows_per_group must be >= 1")
        rw = Window.partitionBy(group_col).orderBy(
            F.desc("n_tokens"), F.asc(id_col)
        )
        sel = (
            ranked.withColumn("__rn", F.row_number().over(rw))
            .where(F.col("__rn") <= max_rows_per_group)
            .drop("__rn")
        )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("n_tokens"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sel.join(F.broadcast(plan), group_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= F.col("planned_tokens"))
        .select(id_col, group_col, "n_tokens", "cum_tokens")
    )
