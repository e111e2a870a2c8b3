"""Unit tests for the dataset-splitting / corpus-statistics operators
(hash_split, vocab_topk, contamination_overlap). The oracle suite
(test_entry_oracle) proves cross-engine equality on the driver tables;
these pin the semantics on micro-inputs computable by eye."""

import hashlib

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.sampling import (
    contamination_overlap,
    hash_sample,
    hash_split,
    stratified_sample,
    vocab_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestHashSplit:
    def test_matches_md5_reference(self, spark):
        df = _docs(spark, [(i, "x") for i in range(200)])
        got = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
        for i in range(200):
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 100
            want = "train" if b < 98 else ("val" if b < 99 else "test")
            assert got[i] == want, (i, b)

    def test_deterministic_and_total(self, spark):
        df = _docs(spark, [(i, "x") for i in range(500)])
        a = hash_split(df, "doc_id", salt="s1").collect()
        b = hash_split(df, "doc_id", salt="s1").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert all(r.split in ("train", "val", "test") for r in a)

    def test_salt_changes_assignment(self, spark):
        df = _docs(spark, [(i, "x") for i in range(500)])
        a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
        b = {
            r.doc_id: r.split
            for r in hash_split(df, "doc_id", salt="other").collect()
        }
        assert a != b

    def test_custom_weights_and_validation(self, spark):
        df = _docs(spark, [(i, "x") for i in range(100)])
        out = hash_split(df, "doc_id", weights={"a": 50, "b": 50})
        assert set(r.split for r in out.collect()) <= {"a", "b"}
        with pytest.raises(ValueError):
            hash_split(df, "doc_id", weights={"a": 60, "b": 50})


class TestHashSample:
    def test_matches_md5_reference_and_nests(self, spark):
        df = _docs(spark, [(i, "x") for i in range(2000)])
        kept10 = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
        kept05 = {r.doc_id for r in hash_sample(df, "doc_id", 0.05).collect()}
        for i in kept10:
            v = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
            assert v < round(0.1 * 65536)
        # resolution consistency: smaller sample nests inside larger
        assert kept05 <= kept10
        assert 0.05 < len(kept10) / 2000 < 0.2

    def test_stratified_rates_and_drop(self, spark):
        rows = [(i, "a" if i % 2 else "b") for i in range(1000)]
        rows += [(i + 1000, "c") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = stratified_sample(df, "text", "doc_id", {"a": 1.0, "b": 0.1})
        got = out.groupBy("text").count().collect()
        by = {r.text: r["count"] for r in got}
        assert by["a"] == 500          # fraction 1.0 keeps everything
        assert 10 <= by.get("b", 0) <= 120
        assert "c" not in by           # stratum absent from dict -> dropped


class TestVocabTopk:
    def test_counts_and_tiebreak(self, spark):
        df = _docs(spark, [(1, "a b a"), (2, "b c a"), (3, "c b")])
        rows = vocab_topk(df, k=2).collect()
        # a=3, b=3 (tie -> token asc), c=2
        assert [(r.token, r.cnt) for r in rows] == [("a", 3), ("b", 3)]


class TestContamination:
    def test_overlap_fraction(self, spark):
        # probe doc 0: trigrams {"a b c", "b c d"}; corpus doc 1 contains
        # "a b c" but not "b c d" -> overlap 0.5
        df = _docs(spark, [(0, "a b c d"), (1, "x a b c y")])
        rows = contamination_overlap(df, F.col("doc_id") == 0, n=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.doc_id, r.n_shingles, r.overlap) == (0, 2, 0.5)

    def test_clean_probe_is_zero(self, spark):
        df = _docs(spark, [(0, "p q r s"), (1, "x y z w")])
        r = contamination_overlap(df, F.col("doc_id") == 0, n=3).collect()[0]
        assert r.overlap == 0.0

    def test_short_probe_dropped(self, spark):
        # fewer than n tokens -> no shingles -> no output row
        df = _docs(spark, [(0, "a b"), (1, "x y z w")])
        assert contamination_overlap(df, F.col("doc_id") == 0, n=3).count() == 0


class TestMixtureSample:
    def test_limiting_stratum_keeps_all_and_ratios_hold(self, spark):
        from seriesly_spark.operators.sampling import mixture_sample

        # src a: 40 rows, b: 400, c: 400 — target 1:1:2 makes a limiting.
        rows = (
            [("a", i) for i in range(40)]
            + [("b", 1000 + i) for i in range(400)]
            + [("c", 2000 + i) for i in range(400)]
        )
        df = spark.createDataFrame(rows, "src string, id long")
        out = mixture_sample(df, "src", "id", {"a": 1, "b": 1, "c": 2})
        got = {r.src: r.cnt for r in out.groupBy("src").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("cnt")
        ).collect()}
        assert got["a"] == 40  # limiting stratum: keeps everything
        # b targets ~40, c targets ~80 (md5-Bernoulli, so approximate)
        assert 20 <= got["b"] <= 60   # target 40, sigma ~5.7
        assert 55 <= got["c"] <= 105  # target 80, sigma ~8

    def test_absent_strata_drop_and_determinism(self, spark):
        from seriesly_spark.operators.sampling import mixture_sample

        df = spark.createDataFrame(
            [("a", i) for i in range(10)] + [("x", 100 + i) for i in range(10)],
            "src string, id long",
        )
        out1 = mixture_sample(df, "src", "id", {"a": 1}).collect()
        out2 = mixture_sample(df, "src", "id", {"a": 1}).collect()
        assert sorted(out1) == sorted(out2)
        assert all(r.src == "a" for r in out1) and len(out1) == 10
