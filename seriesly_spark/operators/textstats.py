"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID heuristic, document fingerprinting.

All built-in Column expressions over the tokenized text — integer/count
arithmetic stays exact, ratios are double divisions of identical integers,
so results are bit-stable across engines (oracle-comparable without
rounding fudge; ratios still rounded to 6 for belt-and-braces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from seriesly_spark.operators.util import round_half_up as _round_half_up
from seriesly_spark.operators.util import scoped_persist, spread

# A small, fixed stopword list (order matters for nothing; membership only).
STOPWORDS = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on",
    "with", "as", "at", "by",
)


def tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def text_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document stats: token count, distinct-token count, stopword
    ratio, mean token length, punctuation count, and a simple quality score
    (all components exact-integer or deterministic double)."""
    t = tokens(text_col)
    n = F.size(t)
    n_types = F.size(F.array_distinct(t))
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    char_len = F.length(F.col(text_col))
    punct = char_len - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    tok_chars = char_len - (n - F.lit(1))  # chars excluding single spaces
    stop_ratio = F.round(stop_hits / n, 6)
    mean_len = F.round(tok_chars / n, 6)
    ttr = F.round(n_types / n, 6)  # type-token ratio (lexical diversity)
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_types.alias("n_types"),
        stop_ratio.alias("stop_ratio"),
        mean_len.alias("mean_token_len"),
        punct.alias("n_punct"),
        ttr.alias("ttr"),
    )


# GPT-2-style pretokenizer shape: contraction suffixes, space-prefixed
# letter runs, space-prefixed digit runs, space-prefixed punctuation runs,
# residual whitespace. ASCII classes only so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte.
BPE_ISH_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_counts_bpe(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-ish token counting: segment with the GPT-2 pretokenizer regex and
    count total / alpha / numeric / punctuation tokens. One regex pass per
    document (vectorized JVM regexp_extract_all), integer outputs — exact
    across engines."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike(r"^ ?[A-Za-z]+$")))
    n_num = F.size(F.filter(toks, lambda x: x.rlike(r"^ ?[0-9]+$")))
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_bpe_tokens"),
        n_alpha.alias("n_alpha_tokens"),
        n_num.alias("n_num_tokens"),
        (F.size(toks) - n_alpha - n_num).alias("n_other_tokens"),
    )


def fingerprint(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical content fingerprint: md5 of the sorted distinct token set
    — invariant to token order and duplication (the classic "fingerprint"
    clustering key)."""
    fp = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text_col)))).cast(
            "binary"
        )
    )
    return docs.select(F.col(id_col), fp.alias("fingerprint"))


# Language-ID heuristic: score against tiny per-language marker lexicons.
# Real systems use char-n-gram models; the engine-relevant part is the plan
# shape (tokenize once, score K languages in one pass, argmax) — the
# lexicons are deliberately small and fixed.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "with"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
}


def lang_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Argmax marker-hit language with deterministic tie-break (score desc,
    then language code asc); 'und' when nothing matches. ``keep_cols``
    pass through unchanged so compositions (e.g. lang_confusion) stay a
    single scan instead of re-joining on the id."""
    t = tokens(text_col)
    scored = F.array(
        *[
            F.struct(
                (-F.size(F.filter(t, lambda x: x.isin(*marks)))).alias("neg"),
                F.lit(code).alias("lang"),
            )
            for code, marks in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_min(scored)  # struct compare: lowest neg = highest score
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
    )


def lang_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Confusion matrix of the language-ID heuristic against labeled
    data — the model-eval table every classifier-backed curation stage
    publishes (which languages leak into which buckets, and how much
    of each label survives a lang filter).

    ONE corpus scan (lang_id with the label passed through — no
    re-join on the id), one tiny (label x prediction) count aggregate,
    and a broadcast row-total join for per-label recall shares. NULL
    labels group as their own row (a real pipeline wants to see the
    unlabeled mass). Output: (lang, lang_pred, n, frac rounded to 6)
    where frac is the row-normalized share within the true label.
    """
    pred = lang_id(docs, text_col, id_col, keep_cols=(label_col,))
    cell = pred.groupBy(
        F.col(label_col).alias("lang"), "lang_pred"
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cell.groupBy("lang").agg(F.sum("n").alias("__t")).withColumnRenamed(
        "lang", "__lang"
    )
    # null-SAFE join: a plain equi-join would silently drop the NULL
    # label's rows — exactly the unlabeled mass the matrix must show
    return cell.join(
        F.broadcast(tot), cell["lang"].eqNullSafe(tot["__lang"])
    ).select(
        "lang",
        "lang_pred",
        "n",
        F.round(F.col("n") / F.col("__t"), 6).alias("frac"),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality metrics per document: the fraction
    of word-2-grams that are duplicates (1 - distinct/total; null when the
    doc has < 2 tokens) and the frequency share of the single most common
    token. Pure per-row array expressions — a narrow map stage with no
    shuffle, so it scales linearly with the corpus regardless of document
    count; the top-token count is a run-length scan over the sorted token
    array (O(n log n) per doc vs the naive O(types x tokens) rescan), and
    the 2-gram array comes from two slices + one zip_with instead of n
    per-element slice allocations (together ~3.5x on the bench entry)."""
    t = tokens(text_col)
    n = F.size(t)
    k = F.greatest(n - F.lit(1), F.lit(0))
    grams2 = F.zip_with(
        F.slice(t, 1, k),
        F.slice(t, 2, k),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    dup_ratio = F.when(k > 0, F.round(1 - F.size(F.array_distinct(grams2)) / k, 6))

    def _runs(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    top_cnt = F.aggregate(
        F.array_sort(t),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        _runs,
    )["best"]
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        k.alias("n_2grams"),
        dup_ratio.alias("dup_2gram_ratio"),
        F.round(top_cnt / n, 6).alias("top_token_ratio"),
    )


def clean_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalization pass of a training-data pipeline: lowercase, redact
    URLs/emails to fixed placeholders, collapse whitespace, drop stopword
    tokens. All vectorized JVM string/array expressions (two regex passes +
    one array filter per doc) — narrow, no shuffle, no Python."""
    s = F.lower(F.trim(F.col(text_col)))
    s = F.regexp_replace(s, r"https?://\S+", "<url>")
    s = F.regexp_replace(s, r"\S+@\S+\.\S+", "<email>")
    keep = F.filter(F.split(s, r"\s+"), lambda x: ~x.isin(*STOPWORDS))
    return docs.select(
        F.col(id_col),
        F.array_join(keep, " ").alias("text_clean"),
        F.size(keep).alias("n_tokens_clean"),
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 200,
    max_stop_ratio: float = 0.10,
    max_dup_2gram: float = 0.10,
    max_top_token: float = 0.12,
) -> DataFrame:
    """Composite Gopher-style quality gate: token-count band, stopword
    ratio, duplicate-2-gram ratio, top-token share — one boolean per rule
    plus the conjunction (``keep``). Computed in a SINGLE narrow pass over
    the text (the formulas are exactly text_stats' stop_ratio and
    repetition_stats' ratios, rounded identically) — deliberately NOT a
    join of the two stat operators, which would scan the corpus twice and
    shuffle on doc_id for row-local arithmetic."""
    t = tokens(text_col)
    n = F.size(t)
    stop_ratio = F.round(F.size(F.filter(t, lambda x: x.isin(*STOPWORDS))) / n, 6)
    k = F.greatest(n - F.lit(1), F.lit(0))
    grams2 = F.zip_with(
        F.slice(t, 1, k), F.slice(t, 2, k), lambda x, y: F.concat_ws(" ", x, y)
    )
    dup_ratio = F.when(k > 0, F.round(1 - F.size(F.array_distinct(grams2)) / k, 6))

    def _runs(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    top_cnt = F.aggregate(
        F.array_sort(t),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        _runs,
    )["best"]
    top_ratio = F.round(top_cnt / n, 6)

    tok_ok = (n >= min_tokens) & (n <= max_tokens)
    stop_ok = stop_ratio < max_stop_ratio
    dup_ok = F.coalesce(dup_ratio < max_dup_2gram, F.lit(False))
    top_ok = top_ratio < max_top_token
    return docs.select(
        F.col(id_col),
        tok_ok.alias("tok_ok"),
        stop_ok.alias("stop_ok"),
        dup_ok.alias("dup_ok"),
        top_ok.alias("top_ok"),
        (tok_ok & stop_ok & dup_ok & top_ok).alias("keep"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Most-distinctive terms per group by TF-IDF:
    ``score(term, group) = tf * ln(N_docs / doc_freq)`` with tf = total
    occurrences of the term in the group and doc_freq = number of
    documents (corpus-wide) containing it. The per-source profile pass of
    a corpus audit (what vocabulary distinguishes each source).

    Dataflow: one tokenize-explode subtree persisted (read by the tf and
    doc-freq branches), token-keyed aggregates/join (map-side partials —
    only (token, count) pairs shuffle, never text), 1-row N broadcast,
    and a per-group top-k window over the tiny (group x term) aggregate.
    Scores round to 6 decimals BEFORE ranking so ordering is stable
    across engines (ln is not correctly-rounded; 1-ulp differences must
    not flip ranks). Output: (group, token, tf, doc_freq, score, rank).
    """
    from pyspark.sql import Window

    toks = scoped_persist(
        spread(docs).select(
            F.col(id_col),
            F.col(group_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
        ),
        "textstats.tfidf_toks",
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    doc_freq = (
        toks.select(id_col, "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    tf = toks.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(doc_freq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            group_col,
            "token",
            "tf",
            "doc_freq",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
                6,
            ).alias("score"),
        )
    )
    win = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution (bits
    per char) — the classic gibberish / boilerplate screen: natural text
    sits around 4-4.5 bits, single-char spam near 0, uniform random bytes
    near 8. Output: (id, n_chars, n_distinct_chars, entropy).

    Plan: explode to (doc, char) and count — the per-(doc, char) hash
    aggregate collapses map-side to at most |alphabet| rows per document
    before its shuffle (NOT |text| rows: partial aggregation does the
    squashing), then a per-doc aggregate folds the counts via the
    count-space identity H = log2(n) - sum(c * log2 c) / n (one pass, no
    nested aggregate, no p=c/n intermediate). Each c*log2(c) term casts
    to DECIMAL(38,18) so the sum is order-independent; only log2 itself
    is engine-library float math, and the round-6 output absorbs its
    last-ulp wiggle.
    """
    ch = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), "")).alias("__ch"),
        )
        .where(F.col("__ch") != "")
        .groupBy(id_col, "__ch")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    c = F.col("__c").cast("double")
    agg = ch.groupBy(id_col).agg(
        F.sum("__c").alias("n_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum((c * F.log2(c)).cast("decimal(38,18)"))
        .cast("double")
        .alias("__clogc"),
    )
    n = F.col("n_chars").cast("double")
    return agg.select(
        id_col,
        "n_chars",
        "n_distinct_chars",
        F.round(F.log2(n) - F.col("__clogc") / n, 6).alias("entropy"),
    )


def collocation_pmi(
    docs: DataFrame,
    k: int = 10,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information:
    ``pmi(x, y) = log2(n_bigrams * c_xy / (c_x * c_y))`` over corpus-wide
    counts, with ``min_count`` pruning rare bigrams (raw PMI is maximized
    by hapax pairs — the standard Church & Hanks correction). The
    collocation pass of corpus analysis: which word pairs travel together
    far more than chance.

    Dataflow: bigram formation is a narrow array transform inside each
    document (no shuffle — ``transform`` over token indices); counts are
    two hash aggregates whose partials collapse map-side to vocabulary
    size, and the bigram->unigram joins move only (token, count) pairs.
    Unigram counts for x and y attach via two equi-joins on the bigram
    table (already collapsed to distinct bigrams, NOT the corpus). PMI
    rounds to 6 BEFORE the rank window so ordering cannot flip on log
    last-ulps; ties break lexicographically. Output:
    (x, y, c_xy, c_x, c_y, pmi, rank).
    """
    t = tokens(text_col)
    toks = scoped_persist(docs.select(t.alias("__t")), "textstats.pmi_toks")
    uni = (
        toks.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bi = (
        toks.select(
            F.explode(
                F.transform(
                    F.slice("__t", 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                    lambda x, i: F.struct(
                        x.alias("x"), F.col("__t")[i + 1].alias("y")
                    ),
                )
            ).alias("b")
        )
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    n_bi = toks.select(
        F.sum(F.greatest(F.size("__t") - 1, F.lit(0))).alias("n_bigrams")
    )
    from pyspark.sql import Window

    scored = (
        bi.join(uni.select(F.col("w").alias("x"), F.col("c_w").alias("c_x")), "x")
        .join(uni.select(F.col("w").alias("y"), F.col("c_w").alias("c_y")), "y")
        .crossJoin(F.broadcast(n_bi))
        .select(
            "x", "y", "c_xy", "c_x", "c_y",
            F.round(
                F.log2(
                    F.col("n_bigrams").cast("double") * F.col("c_xy")
                    / (F.col("c_x").cast("double") * F.col("c_y"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # Top-k FIRST via sort+limit (TakeOrderedAndProject: per-partition
    # partial top-k merged at the driver — no global sort of the scored
    # table), THEN rank the k survivors with a window that only ever
    # sees k rows. A bare row_number window here would single-partition
    # the whole vocabulary-squared candidate table.
    top = scored.orderBy(F.desc("pmi"), "x", "y").limit(k)
    w = Window.orderBy(F.desc("pmi"), "x", "y")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def compression_ratio(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """zlib-deflate compression ratio per document — the classic
    redundancy screen of web-scale curation (RefinedWeb/FineWeb drop
    documents that compress too well = boilerplate/repetition, or
    barely at all = gibberish/binary). Natural prose lands ~0.3-0.6;
    ``ratio = compressed_bytes / raw_bytes`` (1.0+ means incompressible).

    Arrow-batched ``mapInPandas`` over stdlib zlib (C-speed, no
    dependency); a narrow projection — no shuffle, linear scan, the
    same plan shape as the multimodal decode stages. Deterministic for
    a fixed zlib version and level, but NOT SQL-expressible — the
    driver's oracle records the rows-only check and the unit tests pin
    known ratios + ordering (repetitive < prose < gibberish).
    """
    import zlib
    from typing import Iterator as _It

    import pandas as _pd

    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def ratios(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            raw = pdf[text_col].fillna("").map(lambda t: t.encode("utf-8"))
            n = raw.map(len)
            c = raw.map(lambda b: len(zlib.compress(b, level)))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "n_compressed": c,
                    "ratio": [
                        _round_half_up(ci / ni, 6) if ni else None
                        for ci, ni in zip(c, n)
                    ],
                }
            )

    return src.mapInPandas(
        ratios, "doc_id long, n_bytes long, n_compressed long, ratio double"
    )


def compression_screen(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    lo: float = 0.05,
    hi: float = 1.1,
) -> DataFrame:
    """The PRODUCTION redundancy screen — what a curation run actually
    executes per shard: one zlib pass per document and a keep/drop
    decision (``lo < ratio < hi``; below = boilerplate/repetition,
    above = incompressible gibberish/binary). This is
    :func:`compression_ratio` plus the decision, WITHOUT the planted
    constant/random payloads of :func:`compression_certificate` (those
    triple the compress work and exist only to certify the codec path
    cross-engine — run the certificate as the gate, run this per
    shard).

    Oracle-checkable columns only: ``n_bytes`` is replayed exactly by
    SQL ``octet_length``; ``bound_ok`` (compressed <= zlib's worst-case
    raw + raw/1000 + 64) is provably true whenever the codec works, so
    a SQL oracle pins it as the constant TRUE; the keep decision itself
    rides along in unit tests (ratios are deflate-valued, not
    SQL-expressible). Plan shape: the operator's own single narrow
    ``mapInPandas`` projection — no shuffle, no join.
    """
    cr = compression_ratio(docs, text_col=text_col, id_col=id_col, level=level)
    return cr.select(
        "doc_id",
        "n_bytes",
        (
            F.col("n_compressed")
            <= F.col("n_bytes") + F.col("n_bytes") / F.lit(1000) + F.lit(64)
        ).alias("bound_ok"),
        (
            (F.col("ratio") > F.lit(lo)) & (F.col("ratio") < F.lit(hi))
        ).alias("keep"),
    )


def compression_certificate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Externally-checkable certificate for :func:`compression_ratio`.
    Deflate has no SQL mirror, so the ratio VALUES cannot be replayed by
    a SQL oracle — but three things about them can be: the raw UTF-8
    byte length (exactly: ``octet_length``), zlib's worst-case size
    bound (compressed <= raw + raw/1000 + 64, generous over the real
    5-bytes-per-16 KiB-block + 6 stored-mode envelope), and the planted
    payload ordering (an 800+-byte constant-block payload MUST compress
    below ~0.05 while an i.i.d. 7-bit payload of the same length CANNOT
    compress below ~0.85 — information-theoretic floor 7/8 = 0.875
    minus nothing, measured 0.92 across seeds).

    Per input doc: its corpus n_bytes (value-checked against SQL) and
    corpus-size bound, plus one constant and one md5-chain pseudo-random
    payload (length 800 + doc_id % 100, deterministic — no RNG state)
    compressed through the SAME zlib path, with the three envelope
    booleans. Every column is either exactly reproducible in SQL or a
    certificate boolean that is provably true when the operator works —
    the ``hll_bucket_rollup`` certification pattern.

    Same plan shape as the operator itself: two narrow ``mapInPandas``
    projections over the doc-id scan joined on doc_id; no data-sized
    shuffle (the join ships 4 numbers per doc).
    """
    import hashlib
    import zlib
    from typing import Iterator as _It

    import pandas as _pd

    cr = compression_ratio(docs, text_col=text_col, id_col=id_col, level=level)

    def planted(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            c_ratio, r_ratio = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 800 + d % 100
                const = b"x" * n
                h = bytearray()
                c = 0
                while len(h) < n:
                    h += hashlib.md5(f"{d}:{c}".encode()).digest()
                    c += 1
                rand = bytes(b & 0x7F for b in h[:n])
                c_ratio.append(len(zlib.compress(const, level)) / n)
                r_ratio.append(len(zlib.compress(rand, level)) / n)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "__cr_const": c_ratio,
                    "__cr_rand": r_ratio,
                }
            )

    pl = docs.select(F.col(id_col).alias("doc_id")).mapInPandas(
        planted, "doc_id long, __cr_const double, __cr_rand double"
    )
    return cr.join(pl, "doc_id").select(
        "doc_id",
        "n_bytes",
        (
            F.col("n_compressed")
            <= F.col("n_bytes") + F.col("n_bytes") / F.lit(1000) + F.lit(64)
        ).alias("bound_ok"),
        (F.col("__cr_const") <= F.lit(0.05)).alias("const_ok"),
        (F.col("__cr_rand") >= F.lit(0.85)).alias("rand_ok"),
        (F.col("__cr_const") < F.col("__cr_rand")).alias("order_ok"),
    )


def type_token_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Lexical-diversity screen per document: type-token ratio
    (distinct tokens / total tokens) and hapax ratio (tokens occurring
    exactly once / total) — low TTR flags boilerplate and keyword
    stuffing, abnormally high hapax flags OCR noise and gibberish; both
    are standard corpus-quality features next to repetition_stats.

    Dataflow: explode + ONE (doc, token) hash aggregate whose partials
    collapse map-side to per-document vocabulary size, then a per-doc
    rollup of (n_types, n_hapax, n_tokens) — only (doc, token, count)
    rows ever shuffle, never text. Ratios are double divisions of
    identical integers, rounded to 6 (bit-stable). Empty documents
    yield NULL ratios rather than 0/0. Output: (doc_id, n_tokens,
    n_types, ttr, hapax_ratio).
    """
    per_tok = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(text_col)).alias("__tok"),
        )
        .where(F.col("__tok") != "")
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = per_tok.groupBy(id_col).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("__c") == 1).cast("long")).alias("__hapax"),
    )
    n = F.col("n_tokens").cast("double")
    out = agg.select(
        id_col,
        "n_tokens",
        "n_types",
        F.round(F.col("n_types") / n, 6).alias("ttr"),
        F.round(F.col("__hapax") / n, 6).alias("hapax_ratio"),
    )
    # Documents that tokenized to nothing still get a row (outer join
    # against the id spine) with 0 counts and NULL ratios.
    spine = docs.select(id_col)
    return (
        spine.join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).alias("n_types"),
            "ttr",
            "hapax_ratio",
        )
    )


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Per-document fluency score under an add-k-smoothed bigram language
    model trained on the corpus itself — the CCNet/Gopher-style
    "perplexity filter" shape: documents whose token transitions are
    atypical for the corpus (gibberish, OCR noise, boilerplate in a
    different register) score low, and the filter drops the tails.
    ``P(y|x) = (c_xy + k) / (c_x + k*V)`` with c_x counted over bigram
    PREFIX positions (so the conditionals sum to 1 over the vocabulary)
    and V = corpus vocabulary size; the score is the mean log2-likelihood
    over the document's bigrams.

    Dataflow (the train-and-apply-in-one-pass plan): per-document
    bigram formation is the same narrow array transform as
    ``collocation_pmi``; corpus bigram/prefix counts are two hash
    aggregates that collapse map-side to vocabulary size; each
    document's DISTINCT bigrams (with multiplicity) join those count
    tables moving only (token, count) pairs, never text; the per-doc
    mean accumulates ``m * log2 P`` in decimal(38,18) so partial-agg
    order cannot wobble the double. V and the doc spine are the only
    other inputs. Output: (doc_id, n_bigrams, avg_logprob) with NULL
    score for documents shorter than 2 tokens.

    At 100 TB: vocabulary-sized side tables (well under broadcast
    threshold for natural-language vocabularies after the count
    collapse), one shuffle keyed by (doc, x, y) for multiplicities and
    one by doc for the rollup; token-frequency skew (Zipf) lands on the
    count aggregates whose partials already collapsed map-side, not on
    row explosion.
    """
    t = tokens(text_col)
    toks = scoped_persist(
        docs.select(F.col(id_col), t.alias("__t")), "textstats.lm_toks"
    )
    bi = toks.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.slice("__t", 1, F.greatest(F.size("__t") - 1, F.lit(0))),
                lambda x, i: F.struct(x.alias("x"), F.col("__t")[i + 1].alias("y")),
            )
        ).alias("b"),
    ).select(id_col, "b.x", "b.y")
    doc_bi = bi.groupBy(id_col, "x", "y").agg(F.count(F.lit(1)).alias("m"))
    c_xy = bi.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    c_x = bi.groupBy("x").agg(F.count(F.lit(1)).alias("c_x"))
    v = toks.select(F.explode("__t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    logp = F.log2(
        (F.col("c_xy") + F.lit(k))
        / (F.col("c_x") + F.lit(k) * F.col("v"))
    )
    scored = (
        doc_bi.join(c_xy, ["x", "y"])
        .join(c_x, "x")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.sum(
                (F.col("m") * logp).cast("decimal(38,18)")
            ).alias("__lsum"),
        )
        .select(
            id_col,
            "n_bigrams",
            # decimal -> double BEFORE the division: Spark clamps the
            # scale of decimal/bigint in ways DuckDB doesn't mirror
            F.round(
                F.col("__lsum").cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_logprob"),
        )
    )
    spine = docs.select(id_col)
    return spine.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_logprob",
    )


# PII patterns, ASCII-only so Java regex (Spark) and RE2 (DuckDB) agree:
# no lookaround, no backrefs, leftmost-non-overlapping semantics in both.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("id_number", r"\b[0-9]{9,}\b"),
)


def pii_screen(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection counts per document — the redaction-triage pass of a
    training-data pipeline (find documents carrying emails / IP
    addresses / SSN-shaped ids / long numeric identifiers, route them to
    scrubbing or drop). One vectorized JVM ``regexp_count`` per pattern,
    all in a single narrow projection: no shuffle, no Python, scales as
    a pure scan. Redaction itself is ``clean_text``'s job; this operator
    is the detector that decides what needs it. Output: per-pattern
    counts, total, and a has_pii flag.
    """
    cnts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(
            f"n_{name}"
        )
        for name, pat in PII_PATTERNS
    ]
    out = docs.select(F.col(id_col), *cnts)
    total = sum(F.col(f"n_{name}") for name, _ in PII_PATTERNS)
    return out.select(
        id_col,
        *[f"n_{name}" for name, _ in PII_PATTERNS],
        total.alias("n_pii"),
        (total > 0).alias("has_pii"),
    )


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Typed-placeholder PII redaction — the scrubbing half of the
    detector (`pii_screen` counts, this rewrites): each pattern in
    ``PII_PATTERNS`` is replaced with its ``<name>`` placeholder, in
    declaration order so an already-redacted email cannot re-match as
    a long id number. Per-pattern counts are measured on the
    PROGRESSIVELY redacted text (stage i counts what stage i actually
    replaced), so ``n_redacted`` equals the number of placeholder
    insertions exactly. One narrow vectorized projection (chained JVM
    regexp_replace/regexp_count) — no shuffle, no Python; scales as a
    pure scan. Output: (id, text_redacted, per-pattern counts,
    n_redacted).
    """
    s = F.col(text_col)
    cols = []
    total = None
    for name, pat in PII_PATTERNS:
        c = F.regexp_count(s, F.lit(pat)).cast("long")
        cols.append(c.alias(f"n_{name}"))
        total = c if total is None else total + c
        s = F.regexp_replace(s, pat, f"<{name}>")
    return docs.select(
        F.col(id_col),
        s.alias("text_redacted"),
        *cols,
        total.cast("long").alias("n_redacted"),
    )


def curriculum_bins(
    docs: DataFrame,
    n_bins: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Equal-frequency curriculum binning by document token count —
    the length schedule a curriculum-learning data loader consumes
    (short-to-long ordering, per-bin mixing weights). Unlike NTILE,
    ALL documents of the same length share a bin (a curriculum must
    not split identical lengths across phases), and unlike a global
    rank window it never single-partitions the corpus:

    one (length -> count) aggregate (the length domain is tiny — a
    few thousand distinct integers however large the corpus), a
    cumulative window over THAT table, and bin(L) = (docs_shorter *
    n_bins) div total — exact integer arithmetic, engine-stable. The
    assignment broadcasts back onto a narrow scan; corpus rows never
    shuffle.

    Output: (bin, n_docs, min_tokens, max_tokens, avg_chars rounded
    to 6). Bins with no mass (heavy length ties) simply don't appear —
    equal-frequency is best-effort under ties by design."""
    d = docs.select(
        F.col(id_col),
        F.size(tokens(text_col)).alias("__len"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
    )
    hist = d.groupBy("__len").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.orderBy("__len").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = hist.agg(F.sum("__c").alias("__tot"))
    bins = (
        hist.withColumn(
            "__before", F.coalesce(F.sum("__c").over(w), F.lit(0))
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "__len",
            F.expr(f"(__before * {n_bins}) div __tot")
            .cast("long")
            .alias("bin"),
        )
    )
    return (
        d.join(F.broadcast(bins), "__len")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("__len").cast("long").alias("min_tokens"),
            F.max("__len").cast("long").alias("max_tokens"),
            F.round(
                F.sum(F.col("__chars").cast("decimal(38,18)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_chars"),
        )
    )


def normalized_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Normalization-fingerprint exact dedup: case-folded,
    punctuation-stripped, whitespace-collapsed text hashed to a
    128-bit fingerprint; documents sharing a fingerprint form a dup
    group whose smallest id is the canonical survivor. Catches the
    re-encoded/re-punctuated exact copies that byte-level dedup
    misses and the similarity miners over-kill (the C4/CCNet
    normalize-then-hash step).

    Hash-before-shuffle: only (fingerprint, id) pairs move into the
    group aggregate; the winner map (fingerprint -> canonical id,
    group size) joins back on the fingerprint — two narrow shuffles on
    a 128-bit key, no text movement past the scan.
    Output: (doc_id, fingerprint, canonical_id, group_size, is_dup)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")
    )
    fp = docs.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
    groups = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        fp.join(groups, "fingerprint")
        .select(
            id_col,
            "fingerprint",
            "canonical_id",
            "group_size",
            (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
        )
    )


def source_profile(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source corpus profile: volume, size stats, and the language
    mix (count + entropy) — the per-provenance drill-down a curation
    team reads before re-weighting or dropping a source.

    Plan: one (source, lang) count aggregate (tiny — both categorical)
    and one per-source size aggregate off the same scan; the entropy
    derives from the tiny table via the exact c*ln(c) identity used by
    concentration_stats, decimal-accumulated. Output: (source, n_docs,
    avg_chars, avg_tokens, n_langs, lang_entropy), floats rounded
    to 6."""
    d = docs.select(
        F.col(source_col).alias("__s"),
        F.col(lang_col).alias("__l"),
        F.length(F.col(text_col)).cast("long").alias("__chars"),
        F.size(tokens(text_col)).cast("long").alias("__toks"),
    )
    sizes = d.groupBy("__s").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("__chars").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_chars"),
        F.round(
            F.sum(F.col("__toks").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_tokens"),
    )
    lc = d.groupBy("__s", "__l").agg(F.count(F.lit(1)).alias("__c"))
    tot = F.sum("__c")
    clnc = F.sum(
        (F.col("__c") * F.log(F.col("__c"))).cast("decimal(38,18)")
    ).cast("double")
    langs = lc.groupBy("__s").agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.round(
            F.log(tot.cast("double")) - clnc / tot, 6
        ).alias("lang_entropy"),
    )
    return (
        sizes.join(langs, "__s")
        .select(
            F.col("__s").alias(source_col),
            "n_docs", "avg_chars", "avg_tokens", "n_langs",
            "lang_entropy",
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k document retrieval for a bag-of-words query —
    the lexical-search baseline every corpus tool starts from (and the
    hard-negative source for retrieval training when paired with
    similarity.hard_negatives).

    score(d) = Σ_t idf_t · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    with the Robertson/Sparck-Jones idf ln(1 + (N − df + 0.5)/(df + 0.5)).

    Plan: ONE tokenize-explode; the query-term filter (an ``isin`` over
    a literal list — a broadcast in spirit, constant-folded in codegen)
    drops every non-query token BEFORE any aggregate, so the (doc,
    term) count table is |docs| × |query| at worst, not vocabulary-
    sized; doc lengths ride a separate narrow aggregate; idf is a
    |query|-row table broadcast back. Scores round to 6 BEFORE ranking
    (cross-engine rank stability); top-k is ``orderBy().limit()`` —
    TakeOrderedAndProject, per-partition partial top-k, no global sort.
    Ties break on doc_id. Documents matching no query term score 0 and
    do not appear.

    Output: (doc_id, score, rnk) with rnk 1..k.
    """
    from pyspark.sql import Window

    toks = tokens(text_col)
    base = scoped_persist(
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(toks).alias("tok"),
        ).where(F.col("tok") != ""),
        "textstats.bm25_tokens",
    )
    dl = base.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    n_stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qt = base.where(F.col("tok").isin(list(query_terms)))
    tf = qt.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_stats))
        .select(
            "tok",
            "avgdl",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    term_score = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "id")
        .select(
            "id",
            (
                F.col("idf")
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    scored = term_score.groupBy("id").agg(
        F.round(F.sum("s"), 6).alias("score")
    )
    top = scored.orderBy(F.desc("score"), F.col("id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.col("id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        F.col("id").alias(id_col), "score", "rnk"
    )


def vocab_coverage(
    docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-instance coverage of a size-k vocabulary — the tokenizer
    budgeting question ("what fraction of the corpus do the top-k
    types cover?") answered exactly: top-k tokens by (count desc,
    token), coverage = their summed counts / all token instances.

    ONE tokenize-explode feeding ONE vocabulary-sized count aggregate;
    the top-k is orderBy().limit() over the (already tiny) type table
    and the final ratio is a two-number division. Deterministic ties
    (count desc, token asc). Output: one row (n_tokens, n_types,
    k, covered, coverage rounded to 6).
    """
    counts = scoped_persist(
        docs.select(F.explode(tokens(text_col)).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c")),
        "textstats.vocab_counts",
    )
    tot = counts.agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("n_types")
    )
    topk = counts.orderBy(F.desc("c"), F.col("tok")).limit(k)
    cov = topk.agg(F.sum("c").alias("covered"))
    return (
        tot.crossJoin(F.broadcast(cov))
        .select(
            "n_tokens",
            "n_types",
            F.lit(k).cast("long").alias("k"),
            F.coalesce(F.col("covered"), F.lit(0)).alias("covered"),
            F.round(
                F.coalesce(F.col("covered"), F.lit(0))
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


def encoding_screen(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Byte-level encoding-health screen — the first gate of a web-crawl
    pipeline: documents that survived charset sniffing but carry U+FFFD
    replacement characters (decoder gave up), C0 control characters
    (binary leaked into "text"), or classic UTF-8-read-as-Latin-1
    mojibake sequences (a'&#x0303;' lead byte followed by a continuation
    artifact: "A-tilde + punctuation", "a-circumflex + Euro-sign" pairs)
    are broken upstream and poison tokenizers downstream.

    Pure narrow JVM projection (regexp_count + length arithmetic), no
    shuffle, and every column is SQL-replayable — the oracle runs the
    same counts in DuckDB. NULL text: counts NULL, enc_ok NULL (no
    evidence either way). Output: (doc_id, n_replacement, n_control,
    n_mojibake, enc_ok).
    """
    t = F.col(text_col)
    n_repl = F.length(t) - F.length(F.replace(t, F.lit("�"), F.lit("")))
    n_ctrl = F.regexp_count(t, F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f]"))
    n_moji = F.regexp_count(
        t, F.lit("Ã[©¨¼«»]|â€|Â[ °£©]")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_repl.cast("long").alias("n_replacement"),
        n_ctrl.cast("long").alias("n_control"),
        n_moji.cast("long").alias("n_mojibake"),
        (
            (n_repl == 0) & (n_ctrl == 0) & (n_moji == 0)
        ).alias("enc_ok"),
    )
