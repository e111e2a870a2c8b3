"""Unit tests for the round-5 operators: containment, boilerplate,
heavy hitters, reservoir sampling, label collapse, hard negatives,
PCA power iteration, URL canonicalization."""

import pytest
from pyspark.sql import functions as F


class TestContainmentPairs:
    def test_short_doc_inside_long_doc(self, spark):
        """The signature case: Jaccard small, containment 1.0."""
        from seriesly_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "alpha beta gamma delta epsilon"
        long_ = short + " " + " ".join(f"tok{i}" for i in range(60))
        df = spark.createDataFrame(
            [(1, short), (2, long_), (3, "unrelated words only here")],
            "doc_id long, text string",
        )
        got = {(r.a, r.b): r.containment for r in containment_pairs(df).collect()}
        assert got == {(1, 2): 1.0}
        jac = {
            (r.a, r.b): r.jaccard
            for r in ngram_jaccard_pairs(df, threshold=0.0).collect()
        }
        assert jac[(1, 2)] < 0.1  # jaccard misses what containment catches

    def test_threshold_filters(self, spark):
        from seriesly_spark.operators.dedup import containment_pairs

        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d x y")],
            "doc_id long, text string",
        )
        # grams: doc1 {abc,bcd,cde,def}, doc2 {abc,bcd,cdx,dxy} -> i=2/4
        assert containment_pairs(df, threshold=0.6).count() == 0
        rows = containment_pairs(df, threshold=0.5).collect()
        assert [(r.a, r.b, r.containment) for r in rows] == [(1, 2, 0.5)]


class TestBoilerplateNgrams:
    def test_known_counts(self, spark):
        from seriesly_spark.operators.dedup import boilerplate_ngrams

        banner = "all rights reserved"
        rows = [(i, f"unique{i} content{i} here{i} " + banner) for i in range(10)]
        rows.append((99, "totally different text entirely"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: (r.n_grams, r.n_boiler)
            for r in boilerplate_ngrams(df, min_df_frac=0.5).collect()
        }
        # every banner doc: 4 distinct 3-grams, exactly 1 shared by all 10
        assert out[0] == (4, 1)
        assert out[99] == (2, 0)

    def test_short_docs_emit_no_row(self, spark):
        from seriesly_spark.operators.dedup import boilerplate_ngrams

        df = spark.createDataFrame(
            [(1, "just two"), (2, "three tokens here now")],
            "doc_id long, text string",
        )
        assert [r.doc_id for r in boilerplate_ngrams(df).collect()] == [2]


class TestHeavyHitters:
    def test_exact_above_threshold(self, spark):
        from seriesly_spark.operators.sketches import heavy_hitters

        rows = (
            [("hot",)] * 50 + [("warm",)] * 30 + [("cold%d" % i,) for i in range(20)]
        )
        df = spark.createDataFrame(rows, "item string")
        out = {r.item: r.n for r in heavy_hitters(df, "item", 4).collect()}
        # n=100, threshold 25: hot(50) and warm(30) qualify, no cold
        assert out == {"hot": 50, "warm": 30}

    def test_partitioning_invariant(self, spark):
        """MG candidates depend on partition layout; the recount+filter
        answer must NOT."""
        from seriesly_spark.operators.sketches import heavy_hitters

        rows = [(f"t{i % 7}",) for i in range(700)] + [("rare",)] * 3
        df = spark.createDataFrame(rows, "item string")
        a = sorted(
            (r.item, r.n) for r in heavy_hitters(df.repartition(1), "item", 10).collect()
        )
        b = sorted(
            (r.item, r.n)
            for r in heavy_hitters(df.repartition(13), "item", 10).collect()
        )
        assert a == b
        assert len(a) == 7  # each t0..t6 has 100 > 703/10


class TestReservoirPerGroup:
    def test_deterministic_and_k_bounded(self, spark):
        from seriesly_spark.operators.sampling import reservoir_per_group

        df = spark.createDataFrame(
            [(i, "g%d" % (i % 3)) for i in range(90)], "id long, g string"
        )
        a = sorted(
            (r.g, r.id, r.sample_rank)
            for r in reservoir_per_group(df, ["g"], "id", 4).collect()
        )
        b = sorted(
            (r.g, r.id, r.sample_rank)
            for r in reservoir_per_group(
                df.repartition(7), ["g"], "id", 4
            ).collect()
        )
        assert a == b  # partitioning-invariant (hash rank, no RNG)
        per_g = {}
        for g, _, rank in a:
            per_g.setdefault(g, []).append(rank)
        assert all(sorted(v) == [1, 2, 3, 4] for v in per_g.values())

    def test_different_salt_different_sample(self, spark):
        from seriesly_spark.operators.sampling import reservoir_per_group

        df = spark.createDataFrame(
            [(i, "g") for i in range(200)], "id long, g string"
        )
        a = {r.id for r in reservoir_per_group(df, ["g"], "id", 10).collect()}
        b = {
            r.id
            for r in reservoir_per_group(df, ["g"], "id", 10, salt="x").collect()
        }
        assert a != b


class TestRareLabelCollapse:
    def test_collapse_and_nulls(self, spark):
        from seriesly_spark.operators.sampling import rare_label_collapse

        df = spark.createDataFrame(
            [(1, "en"), (2, "en"), (3, "en"), (4, "fr"), (5, None)],
            "id long, lang string",
        )
        out = {
            r.id: (r.label_final, r.label_n)
            for r in rare_label_collapse(df, "lang", 2).collect()
        }
        assert out[1] == ("en", 3)
        assert out[4] == ("__other__", 0)
        assert out[5] == ("__other__", 0)
        assert len(out) == 5  # no rows lost to the NULL join


class TestHardNegatives:
    def test_excludes_same_label_and_ranks(self, spark):
        from seriesly_spark.operators.similarity import hard_negatives

        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.1], 0),   # same label: must never appear for q0
            (2, [0.9, 0.4], 1),
            (3, [0.0, 1.0], 1),
            (4, [0.7, 0.7], 2),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        out = hard_negatives(df, [0], k=2).collect()
        ids = [r.vec_id for r in out]
        assert 1 not in ids and 0 not in ids
        assert ids == [2, 4]  # by descending cosine to [1, 0]
        assert [r.rnk for r in out] == [1, 2]


class TestPcaPowerIteration:
    def test_dominant_direction_certifies(self, spark):
        """Strong top component (variance concentrated on axis 0):
        fast convergence, every certificate boolean true, total_var
        exact."""
        from seriesly_spark.operators.clustering import pca_power_iteration

        rows = [(i, [float(i % 21 - 10), 0.5 if i % 2 else -0.5, 0.01 * (i % 3)]) for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        r = pca_power_iteration(df, iterations=8).collect()[0]
        assert (r.n, r.dim) == (200, 3)
        assert r.lambda_ratio_ok and r.resid_ok and r.lambda_le_total
        import numpy as np

        X = np.array([row[1] for row in rows])
        tv = ((X - X.mean(0)) ** 2).mean(0).sum()
        assert abs(r.total_var - tv) < 1e-5

    def test_rejects_bad_iterations(self, spark):
        from seriesly_spark.operators.clustering import pca_power_iteration

        df = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError):
            pca_power_iteration(df, iterations=0)


class TestNormalizeUrl:
    CASES = [
        # (raw, canonical)
        ("HTTP://WWW.Example.com:80/a/?utm_source=f&b=1#top",
         "http://www.example.com/a?b=1"),
        ("http://www.example.com/a?b=1", "http://www.example.com/a?b=1"),
        ("https://Example.org:443/", "https://example.org/"),
        ("https://example.org:8443/x/?z=2&a=1&fbclid=abc",
         "https://example.org:8443/x?a=1&z=2"),
        ("http://example.net", "http://example.net/"),
        ("http://example.net:8080/?UTM_CAMPAIGN=x&gclid=1",
         "http://example.net:8080/"),
        ("https://a.b/p/q/", "https://a.b/p/q"),
    ]

    def test_cases(self, spark):
        from seriesly_spark.operators.urls import normalize_url

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(self.CASES)],
            "id long, url string",
        )
        got = {
            r.id: r.n
            for r in df.select(
                "id", normalize_url(F.col("url")).alias("n")
            ).collect()
        }
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, (self.CASES[i], got[i])

    def test_dedup_stats(self, spark):
        from seriesly_spark.operators.urls import url_dedup_stats

        df = spark.createDataFrame(
            [(r,) for r, _ in self.CASES[:2]], "url string"
        )
        rows = url_dedup_stats(df, "url").collect()
        assert [(r.url_norm, r.n_variants) for r in rows] == [
            ("http://www.example.com/a?b=1", 2)
        ]


class TestBm25:
    def test_known_scores_vs_reference(self, spark):
        """Brute-force BM25 in Python on a tiny corpus must agree."""
        import math

        from seriesly_spark.operators.textstats import bm25_topk

        corpus = {
            1: "spark join window spark",
            2: "join filter scan",
            3: "window window window sort",
            4: "totally unrelated words",
        }
        df = spark.createDataFrame(
            list(corpus.items()), "doc_id long, text string"
        )
        q = ["spark", "window"]
        got = {r.doc_id: (r.score, r.rnk) for r in bm25_topk(df, q, k=3).collect()}

        toks = {d: t.split() for d, t in corpus.items()}
        dls = {d: len(t) for d, t in toks.items()}
        avgdl = sum(dls.values()) / len(dls)
        n = len(corpus)
        want = {}
        for d, t in toks.items():
            s = 0.0
            for term in q:
                tf = t.count(term)
                if tf == 0:
                    continue
                df_t = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            if s > 0:
                want[d] = round(s, 6)
        ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert got == {
            d: (s, i + 1) for i, (d, s) in enumerate(ranked)
        }

    def test_no_match_docs_absent(self, spark):
        from seriesly_spark.operators.textstats import bm25_topk

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "needle here")], "doc_id long, text string"
        )
        rows = bm25_topk(df, ["needle"], k=5).collect()
        assert [r.doc_id for r in rows] == [2]


class TestVocabCoverage:
    def test_exact_coverage(self, spark):
        from seriesly_spark.operators.textstats import vocab_coverage

        df = spark.createDataFrame(
            [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string"
        )
        r = vocab_coverage(df, k=2).collect()[0]
        # counts: a=4 b=3 c=1 d=1 -> top-2 covers 7 of 9
        assert (r.n_tokens, r.n_types, r.k, r.covered) == (9, 4, 2, 7)
        assert r.coverage == round(7 / 9, 6)

    def test_k_larger_than_vocab(self, spark):
        from seriesly_spark.operators.textstats import vocab_coverage

        df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        r = vocab_coverage(df, k=10).collect()[0]
        assert (r.covered, r.coverage) == (2, 1.0)


class TestEpochShuffle:
    def test_structure_and_determinism(self, spark):
        from seriesly_spark.operators.sampling import epoch_shuffle

        df = spark.createDataFrame([(i,) for i in range(100)], "id long")
        a = sorted(tuple(r) for r in epoch_shuffle(df, "id", 2, 4).collect())
        b = sorted(
            tuple(r)
            for r in epoch_shuffle(df.repartition(7), "id", 2, 4).collect()
        )
        assert a == b  # partitioning-invariant
        rows = epoch_shuffle(df, "id", 2, 4).collect()
        assert len(rows) == 200  # every row in every epoch
        per = {}
        for r in rows:
            per.setdefault((r.epoch, r.shard), []).append(r.pos)
        assert set(e for e, _ in per) == {0, 1}
        for (_, _), poss in per.items():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        # epochs produce different orders (different hash inputs)
        order0 = [r.id for r in sorted(rows, key=lambda r: (r.shard, r.pos)) if r.epoch == 0]
        order1 = [r.id for r in sorted(rows, key=lambda r: (r.shard, r.pos)) if r.epoch == 1]
        assert order0 != order1


class TestLangConfusion:
    def test_matrix_vs_reference(self, spark):
        from seriesly_spark.operators.textstats import lang_confusion

        df = spark.createDataFrame(
            [
                (1, "en", "the cat and the dog is here with us"),
                (2, "en", "xyzzy plugh"),              # -> und
                (3, "de", "der hund und die katze ist da"),
                (4, "fr", "le chien et la vie est belle"),
                (5, None, "the unlabeled one is here"),
            ],
            "doc_id long, lang string, text string",
        )
        out = {
            (r.lang, r.lang_pred): (r.n, r.frac)
            for r in lang_confusion(df).collect()
        }
        assert out[("en", "en")] == (1, 0.5)
        assert out[("en", "und")] == (1, 0.5)
        assert out[("de", "de")] == (1, 1.0)
        assert out[("fr", "fr")] == (1, 1.0)
        assert out[(None, "en")] == (1, 1.0)  # unlabeled mass visible


class TestLshEval:
    def test_planted_dups_counted(self, spark):
        from seriesly_spark.operators.dedup import lsh_eval

        base = "alpha beta gamma delta epsilon zeta eta theta"
        df = spark.createDataFrame(
            [
                (1, base),
                (2, base),                       # exact dup: jaccard 1.0
                (3, base + " extra trailing"),   # near dup
                (4, "completely different words here now ok"),
            ],
            "doc_id long, text string",
        )
        r = lsh_eval(df, threshold=0.5).collect()[0]
        # identical docs share every band signature: recall must be 1.0
        assert r.n_true >= 2 and r.n_hit == r.n_true and r.recall == 1.0
        assert r.n_cand >= r.n_hit
        assert 0.0 < r.precision <= 1.0

    def test_empty_corpus(self, spark):
        from seriesly_spark.operators.dedup import lsh_eval

        df = spark.createDataFrame([], "doc_id long, text string")
        r = lsh_eval(df).collect()[0]
        assert (r.n_true, r.n_cand, r.n_hit) == (0, 0, 0)
        assert r.recall is None and r.precision is None


class TestDedupIndex:
    def test_two_batches_and_persistence(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import (
            DedupIndex,
            index_update_report,
        )

        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path)
        a = spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "alpha")],  # 3 repeats 1
            "doc_id long, text string",
        )
        ra = index_update_report(idx.update(a)).collect()[0]
        assert (ra.n_in, ra.n_dup_in_batch, ra.n_dup_vs_index, ra.n_new) == (
            3, 1, 0, 2,
        )
        assert idx.size() == 2
        # a FRESH instance over the same path sees the persisted index
        idx2 = DedupIndex(spark, path)
        b = spark.createDataFrame(
            [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "beta")],
            "doc_id long, text string",
        )
        rows = idx2.update(b).collect()
        by_id = {r.id: (r.dup_in_batch, r.dup_vs_index) for r in rows}
        assert by_id[10] == (False, True)    # history dup
        assert by_id[11] == (False, False)   # novel
        assert by_id[12] == (True, False)    # in-batch dup
        assert by_id[13] == (False, True)
        assert idx2.size() == 3  # alpha, beta, gamma

    def test_replayed_batch_is_all_history_dups(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import (
            DedupIndex,
            index_update_report,
        )

        idx = DedupIndex(spark, str(tmp_path / "idx2"))
        batch = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
        )
        idx.update(batch)
        r = index_update_report(idx.update(batch)).collect()[0]
        assert (r.n_dup_vs_index, r.n_new) == (10, 0)
        assert idx.size() == 10  # exactly-once growth


class TestMinhashIndex:
    def test_near_dup_probe_across_shards(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex

        idx = MinhashIndex(spark, str(tmp_path / "mh"))
        base = "one two three four five six seven eight nine ten"
        a = spark.createDataFrame(
            [(1, base), (2, "totally different content in this one here")],
            "doc_id long, text string",
        )
        ra = idx.update(a).collect()
        assert all(not r.near_dup_candidate for r in ra)  # empty history
        b = spark.createDataFrame(
            [
                (10, base + " extra"),            # near-dup of doc 1
                (11, "nothing like anything prior at all ok then"),
            ],
            "doc_id long, text string",
        )
        out = {r.id: (r.n_band_hits, r.near_dup_candidate) for r in idx.update(b).collect()}
        assert out[10][1] is True and out[10][0] >= 1
        assert out[11] == (0, False)

    def test_self_match_excluded(self, spark, tmp_path):
        """A doc must not match its OWN signatures (classification is
        checkpointed before the append)."""
        from seriesly_spark.operators.dedup_index import MinhashIndex

        idx = MinhashIndex(spark, str(tmp_path / "mh2"))
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        r = idx.update(df).collect()[0]
        assert (r.n_band_hits, r.near_dup_candidate) == (0, False)
        r2 = idx.update(df).collect()[0]  # replay: now full-band hit
        assert r2.n_band_hits == 16 and r2.near_dup_candidate
