"""BPE tokenizer training on the cluster — learn the top-K byte-pair
merges from a corpus (Sennrich et al. 2016, the algorithm behind
GPT-2/RoBERTa vocabularies; `textstats.token_counts_bpe` APPLIES a
BPE-ish pretokenizer — this TRAINS the merge table itself).

The load-bearing scale property is the classic one: after ONE corpus
aggregate to the (word, count) vocabulary table, every training round
runs on the VOCABULARY, not the corpus — pair statistics are
sum-of-counts over distinct words (HF `tokenizers` trains exactly this
way). The corpus is touched once no matter how many merges are
learned; the per-round work is |vocab|-sized with map-side-combined
pair aggregates.

Determinism (oracle-replayable, the kmeans/bt_strength convention):
a FIXED number of rounds, each round's winning pair chosen by
(count DESC, left, right) — binary string order in both engines —
and merges applied by a LEFT-TO-RIGHT GREEDY fold (an 'aaa' corpus
with merge (a,a) fuses positions 1-2, leaving the third 'a' alone),
expressed as the same fold in Spark (`aggregate`) and DuckDB
(`list_reduce`). The winning pair is collected per round — one 1-row
driver boundary per merge, the rate.py class.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.util import CheckpointRotator

_LOG = logging.getLogger(__name__)


_PAIRS = (
    "CASE WHEN size(syms) >= 2 THEN "
    "transform(sequence(0, size(syms) - 2), "
    "i -> struct(syms[i] AS a, syms[i + 1] AS b)) "
    "ELSE cast(array() AS array<struct<a: string, b: string>>) END"
)


def _fuse(syms, a: str, b: str):
    """Greedy left-to-right application of merge (a, b): walking the
    symbol list, fuse when the accumulator's last symbol is ``a`` and
    the next is ``b`` — non-overlapping by construction (the fused
    symbol a||b no longer equals ``a``, barring a||b == a which needs
    the empty string, filtered at tokenization)."""
    merged = F.array(F.lit(a + b))
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(x))),
    )



def _word_vocab(
    docs: DataFrame,
    text_col: str,
    max_word_len: "int | None",
    with_len0: bool = False,
):
    """The shared trainer prologue: whitespace words (empty filtered,
    optional junk-length guard) aggregated to the (n, syms[, len0])
    vocabulary frame every merge loop starts from — ONE definition so
    the trainers cannot silently diverge on tokenization."""
    tok = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    w = docs.select(tok).where(F.col("word") != "")
    if max_word_len is not None:
        w = w.where(F.length("word") <= max_word_len)
    cols = [F.count(F.lit(1)).alias("n")]
    out = w.groupBy("word").agg(*cols)
    sel = [
        "n",
        F.expr(
            "transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1))"
        ).alias("syms"),
    ]
    if with_len0:
        sel.insert(1, F.length("word").alias("len0"))
    return out.select(*sel)


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    merges: int = 8,
    max_word_len: int | None = None,
) -> DataFrame:
    """Learn ``merges`` BPE merge rules from the corpus. Words are
    whitespace tokens split to characters; ``max_word_len`` (optional)
    drops longer words from the vocabulary (URL/hash junk guard — a
    64-char token contributes 63 pair slots per occurrence).

    Output: (rank, lhs, rhs, pair_count) — one row per learned merge
    in training order; fewer than ``merges`` rows when the vocabulary
    runs out of repeated pairs. The result is driver-sized (K rows) by
    construction; the vocabulary table it is distilled from never
    leaves the cluster.
    """
    if merges < 1:
        raise ValueError("merges must be >= 1")
    spark = docs.sparkSession
    # Each round's vocabulary is eagerly checkpointed (lineage would
    # otherwise nest one fold per merge); the rotator unpersists the
    # PREVIOUS round's blocks so the loop holds one live vocabulary
    # copy, not merges+1.
    rot = CheckpointRotator()
    vocab = rot.checkpoint(_word_vocab(docs, text_col, max_word_len))
    rows = []
    for r in range(1, merges + 1):
        best = (
            vocab.select("n", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0].a, best[0].b, int(best[0].cnt)
        rows.append((r, a, b, cnt))
        vocab = rot.checkpoint(
            vocab.select("n", _fuse(F.col("syms"), a, b).alias("syms"))
        )
    # The merge table was collected in-loop; nothing references the
    # final vocabulary copy anymore.
    rot.close(spark.sparkContext)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "rank int, lhs string, rhs string, pair_count long",
    )


def bpe_stats(
    docs: DataFrame,
    text_col: str = "text",
    merges: int = 8,
    max_word_len: int | None = None,
) -> DataFrame:
    """Train ``merges`` BPE rules (exactly :func:`bpe_train`'s loop)
    and score what the learned vocabulary buys on the SAME corpus —
    the fertility/compression gate a tokenizer budget decision reads:
    symbols per word instance before (= characters) and after the
    merges, and their ratio.

    Every mass is a BIGINT sum over the vocabulary weighted by corpus
    counts (symbols_after = sum n * |syms|), so the two ratios are
    single IEEE divisions — engine-exact. Output one row: (n_words,
    n_word_instances, symbols_before, symbols_after, tokens_per_word,
    compression); n_words is distinct vocabulary size.
    """
    if merges < 1:
        raise ValueError("merges must be >= 1")
    # One-live-copy checkpoint lifecycle, exactly as in bpe_train. The
    # FINAL round's checkpoint stays alive — the returned aggregate
    # reads it — which is the same one-copy budget as scoped_persist.
    rot = CheckpointRotator()
    vocab = rot.checkpoint(
        _word_vocab(docs, text_col, max_word_len, with_len0=True)
    )
    for _ in range(merges):
        best = (
            vocab.select("n", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        vocab = rot.checkpoint(
            vocab.select(
                "n",
                "len0",
                _fuse(F.col("syms"), best[0].a, best[0].b).alias("syms"),
            )
        )
    before = F.sum(F.col("n") * F.col("len0")).cast("bigint")
    after = F.sum(F.col("n") * F.size("syms")).cast("bigint")
    inst = F.sum("n").cast("bigint")
    return vocab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        inst.alias("n_word_instances"),
        before.alias("symbols_before"),
        after.alias("symbols_after"),
        F.round(
            after.cast("double") / inst.cast("double"), 6
        ).alias("tokens_per_word"),
        F.round(
            after.cast("double") / before.cast("double"), 6
        ).alias("compression"),
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 16,
) -> DataFrame:
    """Apply a learned BPE merge table corpus-wide — the missing third
    of the tokenizer pipeline (train -> ENCODE -> budget): every
    document's words are fused through the merges IN RANK ORDER with
    the same greedy left-to-right fold the trainer used.

    ``merges``: the :func:`bpe_train` result (a driver-sized K-row
    DataFrame with rank/lhs/rhs — collected here, the sanctioned 1-row-
    per-merge boundary) or an already-ordered list of (lhs, rhs) pairs.

    Scale shape: the fold runs on the DISTINCT-WORD vocabulary, never
    the corpus — one tokenize pass builds (doc, pos, word), the K
    merges fold over |vocab| rows (chunked ``chunk`` merges per
    projection, checkpoint-rotated so expression depth and lineage stay
    bounded for production-sized merge tables), and one equi-join on
    ``word`` maps the encoded vocabulary back to word occurrences (AQE
    broadcasts it when small). Output one row per input document:
    (id, n_words, n_tokens, encoded) — ``encoded`` joins every token
    with single spaces in document word order (word boundaries carry no
    other marker; words never contain whitespace by construction).
    """
    if isinstance(merges, DataFrame):
        merges = [
            (r.lhs, r.rhs)
            for r in merges.select("rank", "lhs", "rhs")
            .orderBy("rank")
            .collect()
        ]
    merges = list(merges)
    words = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")
    vocab = words.select("word").distinct().withColumn(
        "toks",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ),
    )
    rot = CheckpointRotator()
    for lo in range(0, len(merges), max(1, chunk)):
        col = F.col("toks")
        for a, b in merges[lo : lo + max(1, chunk)]:
            col = _fuse(col, a, b)
        vocab = rot.checkpoint(vocab.select("word", col.alias("toks")))
    enc = (
        words.join(vocab, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.size("toks")).cast("bigint").alias("n_tokens"),
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "toks"))
                        ),
                        lambda s: s.toks,
                    )
                ),
            ).alias("encoded"),
        )
    )
    # Total: a word-less document (empty/NULL text) still gets a row.
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(enc, "id", "left")
        .select(
            "id",
            F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias(
                "n_tokens"
            ),
            F.coalesce("encoded", F.lit("")).alias("encoded"),
        )
    )


def _batch_conflicts(a1: str, b1: str, a2: str, b2: str) -> bool:
    """Can fusing (a1, b1) change the count of (a2, b2)? Only when
    their occurrences overlap in the symbol stream (b1 == a2 or
    a1 == b2) or the created symbol a1||b1 collides with a symbol
    either side mentions — the bpe_train_batch exactness argument."""
    return (
        b1 == a2
        or a1 == b2
        or a2 == a1 + b1
        or b2 == a1 + b1
        or a2 + b2 in (a1, b1, a1 + b1)
    )


def _select_batch(top, k: int) -> list[tuple[str, str, int]]:
    """Up to ``k`` merges from the (cnt desc, a, b)-ordered candidate
    rows, mutually non-conflicting in both directions.

    When a skipped CONFLICTING candidate's count strictly exceeds a
    later in-batch pick's, this round has entered divergence window
    (b) of :func:`bpe_train_batch`'s contract (sequential training
    might have merged the survivor first) — logged as a warning so
    production runs can detect the window without an oracle replay.
    """
    selected: list[tuple[str, str, int]] = []
    skipped: list[tuple[str, str, int, int]] = []
    for row in top:
        if len(selected) == k:
            break
        if any(
            _batch_conflicts(a, b, row.a, row.b)
            or _batch_conflicts(row.a, row.b, a, b)
            for a, b, _ in selected
        ):
            skipped.append((row.a, row.b, int(row.cnt), len(selected)))
            continue
        selected.append((row.a, row.b, int(row.cnt)))
    for a, b, cnt, at in skipped:
        if any(cnt > selected[i][2] for i in range(at, len(selected))):
            _LOG.warning(
                "bpe batch round skipped conflicting pair (%r, %r) "
                "count=%d above a later in-batch pick — possible "
                "divergence from sequential merge order (window b)",
                a,
                b,
                cnt,
            )
            break
    return selected


def bpe_train_fast(
    docs: DataFrame,
    text_col: str = "text",
    merges: int = 8,
    max_word_len: int | None = None,
    batch: int = 1,
) -> DataFrame:
    """:func:`bpe_train` with INCREMENTAL pair-count maintenance — the
    HF-tokenizers training shape: instead of re-aggregating every
    word's pair slots each round, round k touches only the words that
    CONTAIN the winning pair (a, b): they are re-fused and their old
    pair contributions are swapped for their new ones in a persistent
    (a, b, cnt) table. The table is small by construction (distinct
    ADJACENT symbol pairs — bounded by |alphabet + learned merges|^2,
    thousands in practice), so the per-round aggregate is O(affected
    words), not O(sum-of-word-lengths) — what makes production merge
    counts (K ~ 30k) feasible. The merge table is IDENTICAL to the
    naive loop (equivalence-gated in tests — integer counts, same
    (count DESC, lhs, rhs) argmax, same greedy fold).

    Measured (PLANS.md round 11): 2M-distinct-word vocabulary, 16
    merges — naive 107.0 s, this 45.6 s (2.35x wall-clock; the explode
    volume shrinks to the affected subset, and the remaining per-round
    floor is the vocabulary rewrite). At GATE scale (sf0.1's tiny vocabulary)
    the naive loop is FASTER — per-round job overhead dominates — so
    both stay in the registry. A base+overlay variant that avoids the
    per-round full-vocabulary rewrite measured WORSE (46.2 s): early
    merges affect 30%+ of the vocabulary, so the overlay anti-join
    costs more than the rewrite it saves; rejected.

    ``batch`` > 1 composes BATCHED selection on top (round 14): each
    driver round selects up to ``batch`` mutually non-conflicting
    merges from the maintained count table under bpe_train_batch's
    overlap rule and swaps all their contributions in ONE pass —
    17.7 s at the 2M-word/16-merge stress vs 32.1 s at batch=1 (and
    80.9 s naive). Same exactness contract and divergence window as
    bpe_train_batch; batch=1 is the original sequential behavior.
    """
    if merges < 1:
        raise ValueError("merges must be >= 1")
    if batch < 1:
        raise ValueError("batch must be >= 1")
    spark = docs.sparkSession
    vrot, crot = CheckpointRotator(), CheckpointRotator()
    vocab = vrot.checkpoint(_word_vocab(docs, text_col, max_word_len))

    def _pair_counts(v: DataFrame, sign: int) -> DataFrame:
        return (
            v.select((F.col("n") * sign).alias("n"),
                     F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )

    counts = crot.checkpoint(_pair_counts(vocab, 1))
    rows = []
    while len(rows) < merges:
        k = min(batch, merges - len(rows))
        top = (
            counts.where(F.col("cnt") > 0)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(4 * k)
            .collect()
        )
        selected = _select_batch(top, k)
        if not selected:
            break
        for a, b, cnt in selected:
            rows.append((len(rows) + 1, a, b, cnt))
        has_pair = F.expr(
            "size(syms) >= 2 AND exists(sequence(0, size(syms) - 2), "
            "i -> "
            + " OR ".join(
                f"(syms[i] = {_lit(a)} AND syms[i + 1] = {_lit(b)})"
                for a, b, _ in selected
            )
            + ")"
        )
        affected = vocab.where(has_pair)
        col = F.col("syms")
        for a, b, _ in selected:
            col = _fuse(col, a, b)
        fused = affected.select("n", col.alias("syms"))
        # swap the affected words' contributions: -old +new, folded
        # into the running table; zero-sum pairs are dropped lazily by
        # the argmax's cnt > 0 guard (exact integer bookkeeping).
        counts = crot.checkpoint(
            counts.unionByName(_pair_counts(affected, -1))
            .unionByName(_pair_counts(fused, 1))
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .where(F.col("cnt") != 0)
        )
        # coalesce: the union CONCATENATES partitions (unaffected's P +
        # fused's P), so without a bound the vocabulary's partition
        # count doubles every round (observed: 4 -> 1024 by round 10).
        vocab = vrot.checkpoint(
            vocab.where(~has_pair)
            .unionByName(fused)
            .coalesce(spark.sparkContext.defaultParallelism)
        )
    vrot.close(spark.sparkContext)
    crot.close(spark.sparkContext)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "rank int, lhs string, rhs string, pair_count long",
    )


def _lit(s: str) -> str:
    """SQL single-quoted string literal (symbols come from corpus text,
    so quotes/backslashes must be escaped for the expr() predicate)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_train_batch(
    docs: DataFrame,
    text_col: str = "text",
    merges: int = 8,
    batch: int = 4,
    max_word_len: int | None = None,
) -> DataFrame:
    """:func:`bpe_train` with BATCHED merge rounds — the driver-bound
    cut for production merge counts (K ~ 30k): each driver round
    aggregates pair counts ONCE, then selects up to ``batch`` merges
    in argmax order under the NON-OVERLAPPING constraint (a candidate
    is skipped if it shares a symbol with an already-selected pair of
    this round) and applies them in one vocabulary rewrite. K merges
    take ceil(K / batch)-ish driver round-trips instead of K.

    Exactness contract, stated precisely. Fusing (a1, b1) changes the
    count of another pair (a2, b2) ONLY when their occurrences can
    overlap in the symbol stream — i.e. b1 == a2 (the stream
    "a1 b1 b2" loses an (a2, b2)) or a1 == b2 ("a2 a1 b1" likewise) —
    or when the created symbol a1||b1 collides with a symbol either
    pair mentions (possible once earlier merges exist: fusing can then
    mint MORE of an existing symbol). The non-overlapping filter skips
    a candidate exactly on those conditions, so every selected pair's
    count is provably invariant under its batch-mates' fusions and
    the recorded counts equal sequential training's. TWO divergence
    windows remain, both the classic parallel-BPE ones: (a) a pair
    CREATED by an in-batch fusion (x, a1||b1) could, under sequential
    training, outrank a later in-batch selection (created pairs are
    bounded by the creating merge's count, so this needs a sharply
    skewed distribution — natural-language "t h" -> "th e" chains);
    (b) a CONFLICTING pair skipped in-batch whose occurrences only
    PARTIALLY overlap the batch-mate's fusions can survive with a
    count that still outranks the batch's later picks (sequential
    training would merge the survivor next). On such corpora the
    batched table is a valid BPE table for a slightly different
    selection order, not sequential's; both windows are test-pinned. ``batch=1``
    IS bpe_train. The registry corpus is equivalence-gated (tests +
    the driver oracle replaying SEQUENTIAL training — a divergence
    would fail the gate loudly, which is the point).

    Measured at the r11 stress shape (2M distinct words, 16 merges,
    one session, PLANS.md round 14): naive 80.9 s, this 56.7 s at
    batch=4 (1.4x — each batched round still re-aggregates the whole
    vocabulary, so the win is only the skipped rounds), incremental
    (bpe_train_fast) 32.1 s, and the COMPOSITION
    ``bpe_train_fast(batch=4)`` 17.7 s (4.6x naive): batching cuts
    driver ROUNDS, incremental maintenance cuts per-round WORK, and
    they multiply — the configuration a K~30k production run wants.
    All four merge tables IDENTICAL on the gate corpus. Output:
    (rank, lhs, rhs, pair_count), identical schema/order semantics to
    bpe_train.
    """
    if merges < 1:
        raise ValueError("merges must be >= 1")
    if batch < 1:
        raise ValueError("batch must be >= 1")
    spark = docs.sparkSession
    rot = CheckpointRotator()
    vocab = rot.checkpoint(_word_vocab(docs, text_col, max_word_len))
    rows: list[tuple] = []
    while len(rows) < merges:
        k = min(batch, merges - len(rows))
        # 4k candidates cover the skips the disjointness filter makes;
        # a pathological all-overlapping head just yields a short batch
        # (correctness never depends on the candidate window).
        top = (
            vocab.select("n", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(4 * k)
            .collect()
        )
        if not top:
            break
        selected = _select_batch(top, k)
        if not selected:
            break
        for a, b, cnt in selected:
            rows.append((len(rows) + 1, a, b, cnt))
        col = F.col("syms")
        for a, b, _ in selected:
            col = _fuse(col, a, b)
        vocab = rot.checkpoint(vocab.select("n", col.alias("syms")))
    rot.close(spark.sparkContext)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "rank int, lhs string, rhs string, pair_count long",
    )
