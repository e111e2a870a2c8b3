"""Semantic edge cases for the training-sequence assembly operators
(operators/packing.py) — chunk boundaries, overlap sharing, packing
conservation laws the oracle's hash check implies but doesn't state."""

import pytest

from pyspark.sql import functions as F

from seriesly_spark.operators.packing import chunk_documents, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def toks(n, base=0):
    return " ".join(f"w{base + i}" for i in range(n))


class TestChunkDocuments:
    def test_short_doc_single_full_chunk(self, spark):
        d = _docs(spark, [(1, "s", toks(5))])
        out = chunk_documents(d, chunk_tokens=8, overlap=2).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.chunk_id, r.start_tok, r.n_tok) == (0, 0, 5)
        assert r.chunk_text == toks(5)

    def test_exact_boundary_no_extra_chunk(self, spark):
        d = _docs(spark, [(1, "s", toks(8))])
        out = chunk_documents(d, chunk_tokens=8, overlap=2).collect()
        assert len(out) == 1

    def test_overlap_shared_tokens(self, spark):
        d = _docs(spark, [(1, "s", toks(14))])
        out = sorted(
            chunk_documents(d, chunk_tokens=8, overlap=2).collect(),
            key=lambda r: r.chunk_id,
        )
        # stride 6: chunks at 0..7 and 6..13
        assert [r.start_tok for r in out] == [0, 6]
        assert [r.n_tok for r in out] == [8, 8]
        first, second = (r.chunk_text.split(" ") for r in out)
        assert first[6:] == second[:2]  # the 2-token overlap

    def test_tail_chunk_short(self, spark):
        d = _docs(spark, [(1, "s", toks(15))])
        out = sorted(
            chunk_documents(d, chunk_tokens=8, overlap=2).collect(),
            key=lambda r: r.chunk_id,
        )
        assert [r.start_tok for r in out] == [0, 6, 12]
        assert [r.n_tok for r in out] == [8, 8, 3]

    def test_every_token_covered(self, spark):
        d = _docs(spark, [(i, "s", toks(n, base=i * 100)) for i, n in
                          enumerate([1, 7, 8, 9, 20, 33])])
        out = chunk_documents(d, chunk_tokens=8, overlap=2)
        covered = out.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start_tok"), F.col("start_tok") + F.col("n_tok") - 1)
            ).alias("pos"),
        ).distinct()
        n_cov = covered.groupBy("doc_id").count().collect()
        expect = {i: n for i, n in enumerate([1, 7, 8, 9, 20, 33])}
        assert {r.doc_id: r["count"] for r in n_cov} == expect

    def test_overlap_ge_chunk_rejected(self, spark):
        with pytest.raises(ValueError):
            chunk_documents(_docs(spark, [(1, "s", "a")]), chunk_tokens=4, overlap=4)


class TestPackSequences:
    def _pack(self, spark, rows, seq_len=10, shards=1):
        return pack_sequences(
            _docs(spark, rows), seq_len=seq_len, part_col="source", shards=shards
        )

    def test_tokens_conserved_per_doc(self, spark):
        rows = [(i, f"s{i % 2}", toks(n)) for i, n in enumerate([3, 12, 10, 5, 25])]
        out = self._pack(spark, rows)
        per_doc = {
            r.doc_id: r.total
            for r in out.groupBy("doc_id")
            .agg(F.sum("n_tok_in_seq").alias("total"))
            .collect()
        }
        assert per_doc == {0: 3, 1: 12, 2: 10, 3: 5, 4: 25}

    def test_sequences_full_except_tail(self, spark):
        rows = [(i, "s", toks(n)) for i, n in enumerate([3, 12, 10, 5])]
        out = self._pack(spark, rows, seq_len=10)
        per_seq = sorted(
            (r.seq_id, r.total)
            for r in out.groupBy("seq_id")
            .agg(F.sum("n_tok_in_seq").alias("total"))
            .collect()
        )
        # 30 tokens -> seqs 0,1 full (10), seq 2 tail (10) exactly: 3+12+10+5=30
        assert per_seq == [(0, 10), (1, 10), (2, 10)]

    def test_long_doc_spans_sequences(self, spark):
        out = self._pack(spark, [(1, "s", toks(25))], seq_len=10).collect()
        spans = sorted((r.seq_id, r.doc_start_tok, r.n_tok_in_seq) for r in out)
        assert spans == [(0, 0, 10), (1, 10, 10), (2, 20, 5)]

    def test_shards_partition_streams(self, spark):
        rows = [(i, "s", toks(7)) for i in range(6)]
        out = self._pack(spark, rows, seq_len=10, shards=2)
        # docs 0,2,4 -> shard 0; 1,3,5 -> shard 1; each stream has 21 tokens
        per = {
            (r.shard, r.seq_id): r.total
            for r in out.groupBy("shard", "seq_id")
            .agg(F.sum("n_tok_in_seq").alias("total"))
            .collect()
        }
        assert per == {(0, 0): 10, (0, 1): 10, (0, 2): 1,
                       (1, 0): 10, (1, 1): 10, (1, 2): 1}

    def test_doc_order_within_stream(self, spark):
        # doc_id order: doc 2's slice must start after doc 1's tokens
        out = self._pack(spark, [(1, "s", toks(4)), (2, "s", toks(4, base=50))],
                         seq_len=10).collect()
        spans = sorted((r.doc_id, r.seq_id, r.doc_start_tok, r.n_tok_in_seq)
                       for r in out)
        assert spans == [(1, 0, 0, 4), (2, 0, 0, 4)]
