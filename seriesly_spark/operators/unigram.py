"""Unigram-LM (SentencePiece-style) tokenizer trainer — the OTHER
tokenizer family production pipelines train next to BPE (Kudo,
"Subword Regularization", ACL'18): a piece vocabulary with log-
probabilities, fit by Viterbi hard-EM with a FIXED unrolled round
count (the BPE/kmeans unrolled-training convention), then a Viterbi
encode pass.

Simplifications vs full SentencePiece, chosen so every round is an
engine-replayable corpus aggregate (documented, not hidden):

* HARD EM (Viterbi counts), not forward-backward expectations — the
  E-step segments each word with the current model and counts the
  pieces actually used; SentencePiece itself ships Viterbi inference,
  and hard EM is its standard deterministic simplification.
* Seeding by substring frequency (all substrings up to
  ``max_piece_len`` of the distinct words, weighted by word
  frequency), top ``vocab_size`` by (count desc, piece asc) plus ALL
  single characters (coverage guarantee — singles are never pruned;
  a multi-char piece unused by any Viterbi path is pruned at the
  round boundary, SentencePiece's prune step at its crudest).
* Probabilities re-estimated per round as cnt/total with single-char
  counts floored at 1 (so log stays finite), logp = round(ln(p), 6)
  — the round-6 boundary absorbs libm ln() ulp drift exactly like
  the LR trainers' exp() convention.

Determinism: DP scores are sums of round-6 logp literals combined in
the SAME expression tree on every engine (dp[j] = dp[j-l] + logp —
one addition per candidate, no reassociation), so comparisons are
bit-identical; Viterbi ties break to the LONGER piece ((score, len)
struct max). The whole trajectory is a pure function of
(corpus, vocab_size, max_piece_len, rounds).

Scale shape: the corpus collapses ONCE to the distinct-word frequency
table — at 100 TB that is |vocabulary| rows (millions), not corpus
rows — and every EM round is ONE narrow in-row pass over it: the
Viterbi DP is an F.aggregate fold per word (the piece table rides
along as a literal map, O(1) lookups, no join, no shuffle), the
traceback a second fold, and the count a piece explode with map-side
combine into <= vocab_size rows. Piece probabilities live on the
driver between rounds (<= vocab_size + alphabet rows — the kmeans/BPE
round-state boundary). Encode segments each DISTINCT word once and
joins documents back by word.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from seriesly_spark.operators.textstats import tokens
from seriesly_spark.operators.util import scoped_persist, spread

UNK_LOGP = -20.0
# Per-BYTE score of a byte-fallback piece (SentencePiece's
# byte_fallback, public spec): an unknown character costs
# BYTE_LOGP x its UTF-8 byte count and emits one <0xXX> piece per
# byte, so encode is TOTAL on any UTF-8 input instead of leaking
# out-of-vocabulary characters as unencodable pseudo-pieces.
BYTE_LOGP = -20.0
# Widest piece table the impl="expr" literal map may carry in the
# plan; beyond this only the broadcast-backed pandas path runs.
LITERAL_MAX_PIECES = 10_000


def byte_pieces(word_piece: str) -> list[str]:
    """The byte-fallback expansion of an out-of-vocabulary character:
    one ``<0xXX>`` piece per UTF-8 byte (SentencePiece's notation)."""
    return [f"<0x{b:02X}>" for b in word_piece.encode("utf-8")]


def decode_pieces(ps: list[str]) -> str:
    """Reconstruct a word from its segmentation — the inverse proving
    byte-fallback encode is lossless: maximal ``<0xXX>`` runs decode
    as UTF-8 byte sequences, every other piece concatenates as-is."""
    out: list[str] = []
    buf = bytearray()
    for p in ps:
        if len(p) == 6 and p.startswith("<0x") and p.endswith(">"):
            buf.append(int(p[3:5], 16))
            continue
        if buf:
            out.append(buf.decode("utf-8"))
            buf = bytearray()
        out.append(p)
    if buf:
        out.append(buf.decode("utf-8"))
    return "".join(out)


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(w, freq): distinct corpus words with total occurrence counts —
    the only corpus-sized aggregate in the trainer; everything after
    runs over |vocabulary| rows."""
    return (
        spread(docs)
        .select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")  # all-whitespace text splits to ['']
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _seed_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, cnt): every substring of length 1..max_piece_len of
    every distinct word, weighted by word frequency and occurrence
    count — all in-row until the final tiny piece aggregate."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("w") - i + F.lit(1)
                    ),
                ),
                lambda l: F.col("w").substr(i, l),
            ),
        )
    )
    return (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


def _viterbi_cols(
    vocab: dict[str, float], max_piece_len: int
) -> tuple[Column, Column]:
    """(dp, pieces) columns over a frame carrying word column ``w``:
    ``dp`` is the Viterbi DP array (index j holds the best score over
    segmentations of w[1..j] plus the backpointer piece length), and
    ``pieces`` the traceback — the argmax segmentation, ties to the
    longer piece. Single characters absent from ``vocab`` score
    ``UNK_LOGP`` (encode-time unknowns; during training every corpus
    character is seeded). The vocabulary rides as a literal map —
    O(1) element_at per candidate, no join."""
    lp = F.map_from_arrays(
        F.array(*[F.lit(p) for p in vocab]),
        F.array(*[F.lit(float(v)) for v in vocab.values()]),
    )
    w = F.col("w")

    def entry(acc: Column, j: Column) -> Column:
        cands = F.array(
            *[
                F.when(
                    j >= F.lit(l),
                    F.struct(
                        (
                            F.element_at(acc, j - F.lit(l) + 1)["s"]
                            + (
                                F.coalesce(
                                    F.element_at(
                                        lp, w.substr(j - F.lit(l) + 1, F.lit(l))
                                    ),
                                    F.lit(UNK_LOGP),
                                )
                                if l == 1
                                else F.element_at(
                                    lp, w.substr(j - F.lit(l) + 1, F.lit(l))
                                )
                            )
                        ).alias("s"),
                        F.lit(l).alias("l"),
                    ),
                )
                for l in range(1, max_piece_len + 1)
            ]
        )
        return F.array_max(F.filter(cands, lambda c: c["s"].isNotNull()))

    dp = F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.array(F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("l"))),
        lambda acc, j: F.array_append(acc, entry(acc, j)),
    )
    dpc = F.col("__dp")
    step = lambda acc, _: F.when(  # noqa: E731
        acc["pos"] > 0,
        F.struct(
            (acc["pos"] - F.element_at(dpc, acc["pos"] + 1)["l"]).alias(
                "pos"
            ),
            F.concat(
                F.array(
                    w.substr(
                        acc["pos"]
                        - F.element_at(dpc, acc["pos"] + 1)["l"]
                        + 1,
                        F.element_at(dpc, acc["pos"] + 1)["l"],
                    )
                ),
                acc["ps"],
            ).alias("ps"),
        ),
    ).otherwise(acc)
    pieces = F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.struct(
            F.length(w).alias("pos"),
            F.array().cast("array<string>").alias("ps"),
        ),
        step,
        lambda acc: acc["ps"],
    )
    return dp, pieces


def _segment_words(
    words: DataFrame,
    vocab: dict[str, float],
    max_piece_len: int,
    impl: str = "pandas",
    byte_fallback: bool = False,
) -> DataFrame:
    """(w, freq, ps): each distinct word's Viterbi segmentation under
    ``vocab``. ``byte_fallback=True`` (pandas path only — the expr
    form is the raw-mode parity reference) makes segmentation TOTAL:
    an out-of-vocabulary character costs BYTE_LOGP per UTF-8 byte and
    emits ``<0xXX>`` byte pieces instead of leaking itself as an
    unencodable pseudo-piece; ``decode_pieces`` inverts exactly.
    Two implementations pinned bit-equal by tests (the LSH
    signature convention):

    * ``impl="pandas"`` (default): one Arrow-batched mapInPandas stage
      running the DP as plain Python — higher-order-function lambdas
      evaluate INTERPRETED on the JVM (no codegen), and this DP is
      lambda-dense (array_append of struct arrays + a map probe per
      candidate), so the Arrow hop wins by ~17x here (1M words: 19 s
      vs 315 s — PLANS.md round 14). Same IEEE doubles, same
      expression tree (dp[j-l] + logp, one addition per candidate),
      same (score, len) tie-break — bit-identical output.
    * ``impl="expr"``: the pure-JVM F.aggregate fold — no Python
      boundary; the parity reference and the plan-gate-friendly form.
      The piece table rides the PLAN as a literal map, so this path is
      capped at LITERAL_MAX_PIECES — beyond it planning itself blows
      up, and it raises instead of thrashing.

    Vocabulary transport on the pandas path is a Spark BROADCAST
    variable, not a closure capture: a closure pickles the full piece
    table into every serialized task, a broadcast ships it once per
    executor — the difference between O(tasks) and O(executors)
    transfers at production piece counts (the promised broadcast
    fallback for the literal-map ceiling; equivalence is the existing
    pandas/expr bit-equality gate).
    """
    if impl == "expr":
        if byte_fallback:
            raise ValueError(
                "byte_fallback is implemented on the pandas path; "
                "impl='expr' is the raw-mode parity reference"
            )
        if len(vocab) > LITERAL_MAX_PIECES:
            raise ValueError(
                f"impl='expr' carries the {len(vocab)}-piece table as "
                f"a plan literal (cap {LITERAL_MAX_PIECES}); use "
                "impl='pandas' (broadcast) at this vocabulary size"
            )
        dp, pieces = _viterbi_cols(vocab, max_piece_len)
        return (
            words.withColumn("__dp", dp)
            .select("w", "freq", pieces.alias("ps"))
        )
    if impl != "pandas":
        raise ValueError('impl must be "pandas" or "expr"')

    bc = words.sparkSession.sparkContext.broadcast(vocab)

    def seg_batches(batches):
        import pandas as pd

        vocab = bc.value
        for pdf in batches:
            out = []
            for w in pdf["w"]:
                n = len(w)
                best = [0.0] * (n + 1)
                bp = [0] * (n + 1)
                for j in range(1, n + 1):
                    bs, bl = None, 0
                    for l in range(1, min(max_piece_len, j) + 1):
                        lp = vocab.get(w[j - l:j])
                        if lp is None:
                            if l != 1:
                                continue
                            lp = (
                                BYTE_LOGP
                                * len(w[j - 1].encode("utf-8"))
                                if byte_fallback
                                else UNK_LOGP
                            )
                        s = best[j - l] + lp
                        # max by (score, len): same tie order as the
                        # expr form's struct array_max
                        if bs is None or s > bs or (s == bs and l > bl):
                            bs, bl = s, l
                    best[j], bp[j] = bs, bl
                ps, pos = [], n
                while pos > 0:
                    p = w[pos - bp[pos]:pos]
                    if byte_fallback and len(p) == 1 and p not in vocab:
                        ps.extend(reversed(byte_pieces(p)))
                    else:
                        ps.append(p)
                    pos -= bp[pos]
                out.append(ps[::-1])
            yield pd.DataFrame(
                {"w": pdf["w"], "freq": pdf["freq"], "ps": out}
            )

    return words.select(
        "w", F.col("freq").cast("bigint").alias("freq")
    ).mapInPandas(seg_batches, "w string, freq bigint, ps array<string>")


def _reestimate(
    counts: dict[str, int], vocab: dict[str, float]
) -> tuple[dict[str, float], dict[str, int]]:
    """M-step on the driver: prune unused multi-char pieces, floor
    single-char counts at 1, logp = round(ln(cnt/total), 6). Returns
    (new vocab, effective counts)."""
    eff = {}
    for p in sorted(vocab):
        c = counts.get(p, 0)
        if len(p) == 1:
            c = max(c, 1)
        if c > 0:
            eff[p] = c
    total = sum(eff.values())
    return (
        {p: round(math.log(c / total), 6) for p, c in eff.items()},
        eff,
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 48,
    max_piece_len: int = 4,
    rounds: int = 2,
) -> DataFrame:
    """Train the unigram-LM piece vocabulary: seed from substring
    frequencies (top ``vocab_size`` + all single chars), then
    ``rounds`` Viterbi hard-EM rounds. Output: (piece, cnt, logp) for
    the surviving pieces after the final round — cnt is the effective
    count the final probabilities were computed from (Viterbi usage,
    singles floored at 1), ordered by piece. Driver state per round is
    the piece table (<= vocab_size + alphabet rows)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    words = scoped_persist(
        _word_counts(docs, text_col), "unigram.words", eager=True
    )
    seed = _seed_counts(words, max_piece_len)
    top = seed.orderBy(F.col("cnt").desc(), "piece").limit(vocab_size)
    singles = seed.where(F.length("piece") == 1)
    srows = (
        top.unionByName(singles)
        .groupBy("piece")
        .agg(F.max("cnt").alias("cnt"))
        .collect()
    )
    if not srows:  # empty/all-NULL corpus: no pieces, empty model
        return docs.sparkSession.createDataFrame(
            [], "piece string, cnt bigint, logp double"
        )
    counts = {r.piece: int(r.cnt) for r in srows}
    vocab, eff = _reestimate(counts, {p: 0.0 for p in counts})
    for _ in range(rounds):
        used = (
            _segment_words(words, vocab, max_piece_len)
            .select("freq", F.explode("ps").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .collect()
        )
        vocab, eff = _reestimate(
            {r.piece: int(r.cnt) for r in used}, vocab
        )
    spark = docs.sparkSession
    rows = [(p, eff[p], vocab[p]) for p in sorted(vocab)]
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "piece string, cnt bigint, logp double",
    ).orderBy("piece")


def unigram_encode(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
    byte_fallback: bool = False,
) -> DataFrame:
    """Viterbi-encode every document with a trained piece table
    (``unigram_train``'s (piece, cnt, logp) shape): segment each
    DISTINCT word once (the model collects to the driver — metadata —
    and rides the DP via broadcast), then join documents back by
    word and stitch in token order. Unknown single characters score
    UNK_LOGP and pass through as themselves — fine for scoring,
    lossy for a downstream piece->id mapping; pass
    ``byte_fallback=True`` for SentencePiece's byte_fallback instead:
    they cost BYTE_LOGP per UTF-8 byte and emit ``<0xXX>`` byte
    pieces, making encode TOTAL on any UTF-8 input
    (``decode_pieces`` inverts the segmentation exactly). Output:
    (id_col, n_pieces, encoded) — encoded is the piece stream joined
    with single spaces; NULL-text docs report (0, '')."""
    vrows = model.select("piece", "logp").collect()
    vocab = {r.piece: float(r.logp) for r in vrows}
    if not vocab:
        raise ValueError("empty piece table")
    pre = spread(docs).select(
        F.col(id_col).alias("id"), tokens(text_col).alias("__t")
    )
    words = (
        pre.select(F.explode("__t").alias("w"))
        .where(F.col("w") != "")
        .distinct()
        .withColumn("freq", F.lit(1))
    )
    seg = _segment_words(
        words, vocab, max_piece_len, byte_fallback=byte_fallback
    ).select("w", "ps")
    tok = pre.select("id", F.posexplode("__t").alias("pos", "w")).where(
        F.col("w") != ""
    )
    enc = (
        tok.join(seg, "w")
        .groupBy("id")
        .agg(
            F.sum(F.size("ps")).cast("bigint").alias("n_pieces"),
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "ps"))
                        ),
                        lambda e: e["ps"],
                    )
                ),
            ).alias("encoded"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(enc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_pieces", F.lit(0)).cast("bigint").alias(
                "n_pieces"
            ),
            F.coalesce("encoded", F.lit("")).alias("encoded"),
        )
    )


def unigram_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 48,
    max_piece_len: int = 4,
    rounds: int = 2,
) -> DataFrame:
    """Train the unigram model (exactly :func:`unigram_train`'s loop)
    and score what the learned pieces buy on the SAME corpus — the
    fertility/compression gate a tokenizer-budget decision reads,
    symmetric with ``bpe_stats``: pieces per word instance before
    (= characters) and after, and their ratio.

    Every mass is a BIGINT sum over the distinct-word table weighted
    by corpus counts, so the two ratios are single IEEE divisions —
    engine-exact. Output one row: (n_words, n_word_instances,
    pieces_before, pieces_after, pieces_per_word, compression);
    n_words is distinct vocabulary size. An empty corpus reports a
    zero row with NULL ratios."""
    model = unigram_train(
        docs, text_col, id_col, vocab_size, max_piece_len, rounds
    )
    vocab = {r.piece: float(r.logp) for r in model.collect()}
    spark = docs.sparkSession
    if not vocab:
        return spark.createDataFrame(
            [(0, 0, 0, 0, None, None)],
            "n_words bigint, n_word_instances bigint, "
            "pieces_before bigint, pieces_after bigint, "
            "pieces_per_word double, compression double",
        )
    words = _word_counts(docs, text_col)
    seg = _segment_words(words, vocab, max_piece_len)
    before = F.sum(F.col("freq") * F.length("w")).cast("bigint")
    after = F.sum(F.col("freq") * F.size("ps")).cast("bigint")
    inst = F.sum("freq").cast("bigint")
    return seg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        inst.alias("n_word_instances"),
        before.alias("pieces_before"),
        after.alias("pieces_after"),
        F.round(after.cast("double") / inst.cast("double"), 6).alias(
            "pieces_per_word"
        ),
        F.round(after.cast("double") / before.cast("double"), 6).alias(
            "compression"
        ),
    )
