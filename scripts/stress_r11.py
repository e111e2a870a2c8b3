#!/usr/bin/env python
"""Round-11 stress + A/B measurements.

Three parts (each env-gated so smoke runs stay cheap):

A. rows_per_band candidate A/B (``STRESS_R11_AB=1``): the verdict-#1
   done-criterion — the same corpus mined at (bands=16, r=1),
   (bands=16, r=2), and (bands=8, r=4) from tuner-shaped shared
   signature vectors. The corpus plants P near-dup pairs (trigram
   Jaccard ~0.65) over a background whose docs share 5-word "header"
   boilerplate in groups of ~G (pairwise Jaccard ~0.06) — the
   real-corpus shape where r=1's per-band collision probability (= s)
   over-generates: expected candidates/background-pair are
   1-(1-s)^16 ~ 0.6 at r=1 vs 1-(1-s^2)^16 ~ 0.05 at r=2 vs
   1-(1-s^4)^8 ~ 1e-4 at r=4. Measured: candidates, verified
   (Jaccard >= 0.5 via ngram_jaccard_pairs on the candidate set),
   planted-pair recall, wall.

B. SimhashIndex Manku split at 2M docs (``STRESS_R11_MANKU=1``):
   the round-10 500k A/B rerun at 4x scale (1M history + 1M probe,
   hash-unique texts). PLANS.md round 10 predicted the pigeonhole4
   candidate count grows ~ |history| x |batch| / 2^16 (quadratic in
   corpus) while manku20 divides by 2^32 — this measures the widening.

C. bpe_encode at production shape (``STRESS_R11_BPE=1``): 10M docs x
   8 words drawn from a 256-word closed-form grid, encoded against a
   fixed 6-rule merge table. The greedy per-word fold is replayed in
   Python over the 256 distinct words, so total n_tokens and per-doc
   encodings are asserted EXACTLY (the vocabulary-fold design means
   corpus size only exercises the tokenize + map-back join — which is
   precisely what this certifies at 10M rows). Also re-times
   bpe_train_fast vs bpe_train at a 2M-distinct-word vocabulary
   (``STRESS_R11_BPE_TRAIN=1``; the 2.3x cited in bpe.py's docstring).

Sizes env-overridable (STRESS_R11_DOCS / STRESS_R11_MANKU_DOCS /
STRESS_R11_BPE_DOCS). Output: markdown table rows for PLANS.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seriesly_spark.session import get_spark  # noqa: E402
from seriesly_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from seriesly_spark.operators.dedup_index import SimhashIndex  # noqa: E402
from seriesly_spark.operators.bpe import (  # noqa: E402
    bpe_encode,
    bpe_train,
    bpe_train_fast,
)

N_DOCS = int(os.environ.get("STRESS_R11_DOCS", 100_000))
N_PAIRS = int(os.environ.get("STRESS_R11_PAIRS", 5_000))
N_HEADERS = int(os.environ.get("STRESS_R11_HEADERS", 2_000))
MANKU_DOCS = int(os.environ.get("STRESS_R11_MANKU_DOCS", 1_000_000))
BPE_DOCS = int(os.environ.get("STRESS_R11_BPE_DOCS", 10_000_000))
BPE_VOCAB = int(os.environ.get("STRESS_R11_BPE_VOCAB", 2_000_000))


def ab_corpus(spark):
    """Planted near-dup pairs + header-boilerplate background.

    ids [0, 2P): P planted pairs — 30 words "p{pair}w{i}", the odd
    member swaps positions 9 and 21 for jittered words (kills <= 6 of
    28 trigrams per side -> Jaccard ~ 22/34 ~ 0.65).
    ids [2P, N): background — 5 header words "h{id%NH}w{i}" + 25
    unique words "u{id}w{i}". Two docs sharing a header share 3 of
    their 28 trigrams -> Jaccard 3/53 ~ 0.057.
    """
    ids = spark.range(N_DOCS).select(F.col("id").cast("long"))
    pair = (F.col("id") / 2).cast("long")
    planted_words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.when(
            (F.col("id") % 2 == 1) & ((i == 9) | (i == 21)),
            F.concat(F.lit("j"), F.col("id"), F.lit("w"), i),
        ).otherwise(F.concat(F.lit("p"), pair, F.lit("w"), i)),
    )
    bg_words = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda i: F.concat(
                F.lit("h"), F.col("id") % N_HEADERS, F.lit("w"), i
            ),
        ),
        F.transform(
            F.sequence(F.lit(5), F.lit(29)),
            lambda i: F.concat(F.lit("u"), F.col("id"), F.lit("w"), i),
        ),
    )
    words = F.when(F.col("id") < 2 * N_PAIRS, planted_words).otherwise(
        bg_words
    )
    return ids.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )


def part_a(spark, rows):
    docs = ab_corpus(spark)
    docs.write.mode("overwrite").parquet(
        os.path.join(tempfile.gettempdir(), "r11_ab_docs")
    )
    docs = spark.read.parquet(
        os.path.join(tempfile.gettempdir(), "r11_ab_docs")
    )
    for bands, r in ((16, 1), (16, 2), (8, 4)):
        t0 = time.time()
        cand = minhash_lsh_pairs(
            docs, bands=bands, rows_per_band=r
        ).persist()
        n_cand = cand.count()
        wall = time.time() - t0
        # Verified + planted recall over the candidate set only.
        planted = cand.where(
            (F.col("a") < 2 * N_PAIRS)
            & (F.col("b") == F.col("a") + 1)
            & (F.col("a") % 2 == 0)
        ).count()
        exact = ngram_jaccard_pairs(docs, threshold=0.5)
        verified = cand.join(exact, ["a", "b"]).count()
        cand.unpersist()
        rows.append(
            f"| (bands={bands}, r={r}) | {n_cand:,} | {verified:,} | "
            f"{planted}/{N_PAIRS} | {wall:.1f} s |"
        )
        print(rows[-1], flush=True)


def manku_corpus(spark, lo, hi):
    # Hash-unique texts: every doc is 12 distinct md5-derived words.
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(11)),
                lambda i: F.md5(F.concat(F.col("id"), F.lit("_"), i)),
            ),
        ).alias("text"),
    )


def part_b(spark, rows):
    half = MANKU_DOCS
    for tables in ("pigeonhole4", "manku20"):
        path = tempfile.mkdtemp(prefix=f"r11_simhash_{tables}_")
        shutil.rmtree(path)
        idx = SimhashIndex(spark, path, tables=tables)
        t0 = time.time()
        idx.update(manku_corpus(spark, 0, half)).count()
        seed_s = time.time() - t0
        t0 = time.time()
        rep = idx.update(manku_corpus(spark, half, 2 * half))
        agg = rep.agg(
            F.sum("n_candidates").alias("cand"),
            F.sum("n_dup_hits").alias("hits"),
        ).collect()[0]
        probe_s = time.time() - t0
        rows.append(
            f"| {tables} ({2 * half:,} docs) | {seed_s:.1f} s | "
            f"{probe_s:.1f} s | {int(agg['cand']):,} | {int(agg['hits'])} |"
        )
        print(rows[-1], flush=True)
        shutil.rmtree(path, ignore_errors=True)


MERGES = [
    ("a", "b"), ("ab", "c"), ("d", "e"), ("de", "f"),
    ("abc", "de"), ("x", "y"),
]


def _py_fuse(toks, a, b):
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_encode(word):
    toks = list(word)
    for a, b in MERGES:
        toks = _py_fuse(toks, a, b)
    return toks


def part_c(spark, rows):
    # 256 distinct words over {a..f,x,y,z}: word_r = base alphabet walk
    # seeded by the residue — every doc picks 8 by (id*8+pos) % 256.
    letters = "abcdefxyz"
    vocab = []
    for r in range(256):
        w = "".join(letters[(r // (3 ** k) + k) % 9] for k in range(4))
        vocab.append(w + letters[r % 9])
    vmap = {r: _py_encode(w) for r, w in enumerate(vocab)}
    docs = spark.range(BPE_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: F.element_at(
                    F.array(*[F.lit(w) for w in vocab]),
                    ((F.col("id") * 8 + i) % 256 + 1).cast("int"),
                ),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    enc = bpe_encode(docs, MERGES).persist()
    got = enc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_words").alias("w"),
        F.sum("n_tokens").alias("t"),
    ).collect()[0]
    wall = time.time() - t0
    # Exact replay: token total is a closed form of the residue grid.
    # Doc d uses residues (8d+i) % 256 — summed over all docs each
    # residue appears exactly BPE_DOCS * 8 / 256 times iff 256 | 8*N.
    assert (BPE_DOCS * 8) % 256 == 0, "pick BPE_DOCS divisible by 32"
    per_res = BPE_DOCS * 8 // 256
    want_t = per_res * sum(len(t) for t in vmap.values())
    ok_totals = (
        got["n"] == BPE_DOCS
        and got["w"] == BPE_DOCS * 8
        and got["t"] == want_t
    )
    # Spot-exact: 64 sampled docs' full encoded strings.
    sample = enc.where(F.col("id") % (BPE_DOCS // 64) == 0).collect()
    ok_docs = all(
        r["encoded"]
        == " ".join(
            tok
            for i in range(8)
            for tok in vmap[(r["id"] * 8 + i) % 256]
        )
        for r in sample
    )
    enc.unpersist()
    rows.append(
        f"| bpe_encode ({BPE_DOCS:,} docs, 6 merges) | {wall:.1f} s | "
        f"{'EXACT' if ok_totals and ok_docs else 'MISMATCH'}: corpus "
        f"n_tokens closed-form ({int(got['t']):,}) + 64 full encodings |"
    )
    print(rows[-1], flush=True)


def part_c_train(spark, rows):
    # 2M distinct words (md5 prefixes, 8 lowercase hex chars) -> the
    # vocabulary-bound training cost the naive loop re-aggregates.
    docs = spark.range(BPE_VOCAB).select(
        F.col("id").alias("doc_id"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 8).alias("text"),
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(tempfile.gettempdir(), "r11_bpe_vocab")
    )
    docs = spark.read.parquet(
        os.path.join(tempfile.gettempdir(), "r11_bpe_vocab")
    )
    t0 = time.time()
    naive = [(r.lhs, r.rhs) for r in bpe_train(docs, merges=16).collect()]
    t_naive = time.time() - t0
    t0 = time.time()
    fast = [
        (r.lhs, r.rhs) for r in bpe_train_fast(docs, merges=16).collect()
    ]
    t_fast = time.time() - t0
    rows.append(
        f"| bpe_train vs bpe_train_fast ({BPE_VOCAB:,} distinct words, "
        f"16 merges) | naive {t_naive:.1f} s | fast {t_fast:.1f} s | "
        f"merge tables {'IDENTICAL' if naive == fast else 'DIFFER'} |"
    )
    print(rows[-1], flush=True)


def part_d(spark, rows):
    """pack_sequences at production shape: N docs, toklen = (id%7)+1,
    32 shards, seq_len=512. EXACT checks: (a) total packed tokens equal
    the closed-form corpus token count; (b) every sequence except each
    (part, shard) stream's last holds exactly seq_len tokens; (c) 64
    sampled docs' (seq_id, doc_start_tok, n_tok_in_seq) rows equal a
    Python replay of the shard's prefix sum (toklen is periodic in the
    shard's arrival index with period 7, so the replay is closed-form,
    never a corpus scan)."""
    from seriesly_spark.operators.packing import pack_sequences

    n = int(os.environ.get("STRESS_R11_PACK_DOCS", 100_000_000))
    shards, seq_len = 32, 512
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("web").alias("source"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 7 + 1).cast("int")),
                lambda i: F.lit("w"),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    packed = pack_sequences(
        docs, seq_len=seq_len, shards=shards
    ).persist()
    total = packed.agg(F.sum("n_tok_in_seq").alias("t")).collect()[0]["t"]
    wall = time.time() - t0
    # (a) closed-form corpus tokens: sum over ids of (id%7)+1.
    full, rem = divmod(n, 7)
    want_total = full * 28 + sum(r + 1 for r in range(rem))
    # (b) all sequences full except each stream's last.
    seqs = packed.groupBy("part", "shard", "seq_id").agg(
        F.sum("n_tok_in_seq").alias("sz")
    )
    last = seqs.groupBy("part", "shard").agg(F.max("seq_id").alias("mx"))
    short = (
        seqs.join(last, ["part", "shard"])
        .where((F.col("seq_id") != F.col("mx")) & (F.col("sz") != seq_len))
        .count()
    )
    # (c) sampled docs vs the periodic prefix-sum replay: every
    # (seq_id, doc_start_tok, n_tok_in_seq) row of 64 sampled docs.
    step = max(1, n // 64)
    sample_ids = list(range(0, n, step))
    got = {}
    for r in packed.where(F.col("doc_id").isin(sample_ids)).collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["seq_id"], r["doc_start_tok"], r["n_tok_in_seq"])
        )
    ok_rows = True
    for d in sample_ids:
        s, k = d % shards, d // shards  # shard, arrival index in shard
        cyc = [((s + shards * j) % 7) + 1 for j in range(7)]
        start = (k // 7) * sum(cyc) + sum(cyc[: k % 7])
        tl = (d % 7) + 1
        want = set()
        for seq in range(start // seq_len, (start + tl - 1) // seq_len + 1):
            lo = max(start, seq * seq_len)
            hi = min(start + tl, (seq + 1) * seq_len)
            want.add((seq, lo - start, hi - lo))
        if got.get(d) != want:
            ok_rows = False
            break
    packed.unpersist()
    ok = total == want_total and short == 0 and ok_rows
    rows.append(
        f"| pack_sequences ({n:,} docs, 32 shards, seq_len=512) | "
        f"{wall:.1f} s | {'EXACT' if ok else 'MISMATCH'}: closed-form "
        f"token total ({total:,}), 0 short non-final sequences, 64 "
        f"sampled spans replayed |"
    )
    print(rows[-1], flush=True)


def main():
    spark = get_spark("stress-r11")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    if os.environ.get("STRESS_R11_AB", "1") == "1":
        part_a(spark, rows)
    if os.environ.get("STRESS_R11_MANKU", "1") == "1":
        part_b(spark, rows)
    if os.environ.get("STRESS_R11_BPE", "1") == "1":
        part_c(spark, rows)
    if os.environ.get("STRESS_R11_BPE_TRAIN", "0") == "1":
        part_c_train(spark, rows)
    if os.environ.get("STRESS_R11_PACK", "0") == "1":
        part_d(spark, rows)
    print("\n".join(rows))


if __name__ == "__main__":
    main()
