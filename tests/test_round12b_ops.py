"""Round-12b operator tests: prefix-filtered exact similarity join
(AllPairs/PPJoin), DSIR importance scoring, and token-budget document
selection."""

import pyspark.sql.functions as F
import pytest

from seriesly_spark.operators.dedup import (
    jaccard_prefix_pairs,
    ngram_jaccard_pairs,
)
from seriesly_spark.operators.sampling import budget_select, dsir_scores

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestJaccardPrefixEquivalence:
    """The prefix-filtered join is an OPTIMIZATION: its output must be
    byte-identical to the naive shingle equi-join at every threshold —
    the q21_fast equivalence convention."""

    ROWS = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g x"),
        (3, "a b c d e zz yy xx"),
        (4, "completely different text with no overlap at all"),
        (5, "completely different text with no overlap at most"),
        (6, "a b c d e f g h"),  # exact dup of 1
        (7, "one two"),  # shorter than n=3 -> no shingles
    ]

    @pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
    def test_matches_naive(self, spark, t):
        docs = _docs(spark, self.ROWS)
        naive = {
            (r.a, r.b): r.jaccard
            for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        fast = {
            (r.a, r.b): r.jaccard
            for r in jaccard_prefix_pairs(docs, threshold=t).collect()
        }
        assert fast == naive

    def test_exact_dup_pair_found(self, spark):
        docs = _docs(spark, self.ROWS)
        out = {
            (r.a, r.b): r.jaccard
            for r in jaccard_prefix_pairs(docs, threshold=0.9).collect()
        }
        assert out[(1, 6)] == 1.0

    def test_sf_corpus_equivalence(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        naive = sorted(
            map(tuple, ngram_jaccard_pairs(docs, threshold=0.4).collect())
        )
        fast = sorted(
            map(tuple, jaccard_prefix_pairs(docs, threshold=0.4).collect())
        )
        assert naive == fast

    def test_prefix_join_is_smaller(self, spark):
        """The point of the filter: the prefix table (join input) holds
        strictly fewer rows than the full exploded shingle table."""
        from seriesly_spark.operators.dedup import _shingle_sets

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        full = _shingle_sets(
            docs, "text", "doc_id", 3, "t.full"
        ).count()
        # reproduce the operator's prefix stage row count
        from pyspark.sql import Window

        exploded = _shingle_sets(docs, "text", "doc_id", 3, "t.pre")
        dfreq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        plen = (
            F.col("sz")
            - F.ceil(F.lit(0.5) * F.col("sz") - F.lit(1e-9))
            + F.lit(1)
        )
        rn = F.row_number().over(
            Window.partitionBy("id").orderBy(F.asc("df"), F.asc("g"))
        )
        pref = (
            exploded.join(dfreq, "g")
            .withColumn("__rn", rn)
            .where(F.col("__rn") <= plen)
            .count()
        )
        assert pref < full
        # at t=0.5 the prefix keeps ~ (1-t) of each doc's shingles (+1)
        assert pref <= full * 0.7


class TestDsirScores:
    def test_target_scores_higher(self, spark):
        """Docs drawn from the target's vocabulary must outscore docs
        from a disjoint vocabulary."""
        raw = _docs(
            spark,
            [
                (1, "alpha beta gamma delta alpha beta"),
                (2, "epsilon zeta eta theta epsilon zeta"),
                (3, "alpha beta alpha beta gamma gamma"),
            ],
        )
        target = _docs(
            spark, [(10, "alpha beta gamma alpha beta gamma delta")]
        )
        out = {r.doc_id: r.logratio for r in dsir_scores(raw, target).collect()}
        assert out[1] > out[2]
        assert out[3] > out[2]

    def test_spine_complete_and_counts(self, spark):
        raw = _docs(spark, [(1, "a b c"), (2, "x")])
        target = _docs(spark, [(9, "a b")])
        rows = {r.doc_id: r for r in dsir_scores(raw, target).collect()}
        assert set(rows) == {1, 2}
        # n_feats = unigrams + bigrams = 3 + 2 and 1 + 0
        assert rows[1].n_feats == 5
        assert rows[2].n_feats == 1

    def test_partition_invariance(self, spark):
        raw = _docs(
            spark,
            [(i, f"tok{i % 7} tok{i % 3} tok{i % 5} common") for i in range(40)],
        )
        target = _docs(spark, [(99, "tok1 tok2 common common tok1")])
        a = sorted(map(tuple, dsir_scores(raw, target).collect()))
        b = sorted(
            map(tuple, dsir_scores(raw.repartition(7), target).collect())
        )
        assert a == b


class TestBudgetSelect:
    def test_budget_respected_and_greedy(self, spark):
        df = spark.createDataFrame(
            [
                (1, "s1", "w " * 50),
                (2, "s1", "w " * 30),
                (3, "s1", "w " * 10),
                (4, "s2", "w " * 40),
            ],
            "doc_id long, source string, text string",
        )
        out = budget_select(df, "source", budget_tokens=90)
        rows = {r.doc_id: r for r in out.collect()}
        # every selected doc's running total fits its allocation
        for r in rows.values():
            assert r.cum_tokens <= 90
        # longest-first: doc 1 (50 tokens) must be s1's first pick
        if 2 in rows:
            assert 1 in rows
        tot = (
            out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
        )
        assert all(r.t <= 90 for r in tot)

    def test_all_selected_when_budget_huge(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = budget_select(docs, "source", budget_tokens=10_000_000)
        assert out.count() == docs.count()

    def test_cum_is_prefix_sum(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = budget_select(docs, "source", budget_tokens=5_000).collect()
        by_src = {}
        for r in sorted(out, key=lambda r: (r.source, r.cum_tokens)):
            by_src.setdefault(r.source, []).append(r)
        for rs in by_src.values():
            run = 0
            for r in rs:
                run += r.n_tokens
                assert r.cum_tokens == run


class TestMultiprobeLsh:
    def test_monotone_in_nprobe(self, spark):
        """More probes may only ADD candidates: n_cand and recall are
        non-decreasing in nprobe, and nprobe=1 equals the single-probe
        gate exactly."""
        from seriesly_spark.operators.similarity import (
            ann_lsh_multiprobe_recall,
            ann_lsh_recall,
        )

        vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = [0, 1, 2, 3]
        single = {
            r.query_id: r.recall for r in ann_lsh_recall(vecs, qs).collect()
        }
        prev_cand, prev_rec = None, None
        for np_ in (1, 2, 4):
            rows = {
                r.query_id: r
                for r in ann_lsh_multiprobe_recall(
                    vecs, qs, nprobe=np_
                ).collect()
            }
            if np_ == 1:
                assert {q: r.recall for q, r in rows.items()} == single
            if prev_cand is not None:
                for q in qs:
                    assert rows[q].n_cand >= prev_cand[q]
                    assert rows[q].recall >= prev_rec[q]
            prev_cand = {q: r.n_cand for q, r in rows.items()}
            prev_rec = {q: r.recall for q, r in rows.items()}

    def test_probe_set_shape(self, spark):
        """nprobe=3 at 4 bands: exactly 12 distinct probes per query
        (base + 2 single-bit flips per band — all distinct by
        construction), and every base chunk is present."""
        from seriesly_spark.operators.similarity import (
            lsh_signature,
            _band_chunks,
            multiprobe_chunks,
        )

        vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = [0, 1, 2]
        probes = multiprobe_chunks(vecs, qs, nprobe=3)
        per_q = {
            r.query_id: r.n
            for r in probes.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert per_q == {0: 12, 1: 12, 2: 12}
        sig = lsh_signature(
            vecs.where(F.col("vec_id").isin(qs)), planes=32, dim=64
        )
        base = sig.select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.array(*_band_chunks(32, 4))).alias("bc"),
        ).select("query_id", "bc.band", "bc.chunk")
        missing = base.join(
            probes, ["query_id", "band", "chunk"], "left_anti"
        ).count()
        assert missing == 0


class TestHits:
    def test_star_closed_form(self, spark):
        """10 leaves -> hub: center is the pure authority (1.0), every
        leaf a pure hub (1/sqrt(10)) — the fixed point from round 1, so
        any iteration count gives the closed form."""
        import math

        from seriesly_spark.operators.graph import hits

        edges = spark.createDataFrame(
            [(i, 0) for i in range(1, 11)], "src long, dst long"
        )
        out = {
            r.node: (r.hub, r.authority)
            for r in hits(edges, iterations=3).collect()
        }
        assert out[0] == (0.0, 1.0)
        leaf = round(1 / math.sqrt(10), 9)
        for i in range(1, 11):
            assert out[i] == (leaf, 0.0)

    def test_l2_normalized(self, spark):
        from seriesly_spark.operators.graph import hits

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (1, 3), (4, 2)], "src long, dst long"
        )
        rows = hits(edges, iterations=4).collect()
        h2 = sum(r.hub**2 for r in rows)
        a2 = sum(r.authority**2 for r in rows)
        assert abs(h2 - 1.0) < 1e-6 and abs(a2 - 1.0) < 1e-6

    def test_isolated_nodes_zero(self, spark):
        from seriesly_spark.operators.graph import hits

        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
        out = {
            r.node: (r.hub, r.authority)
            for r in hits(edges, nodes, iterations=2).collect()
        }
        assert set(out) == {0, 1, 2, 3, 4}
        assert out[1] == (1.0, 0.0) and out[2] == (0.0, 1.0)
        for i in (0, 3, 4):
            assert out[i] == (0.0, 0.0)

    def test_partition_invariance(self, spark):
        from seriesly_spark.operators.graph import hits

        edges = spark.createDataFrame(
            [(i, (i * 7) % 23) for i in range(200) if i != (i * 7) % 23],
            "src long, dst long",
        )
        a = sorted(map(tuple, hits(edges, iterations=3).collect()))
        b = sorted(
            map(tuple, hits(edges.repartition(13), iterations=3).collect())
        )
        assert a == b


class TestProfileDiff:
    def test_detects_drift(self, spark):
        from seriesly_spark.operators.analytics import profile_diff

        a = spark.createDataFrame(
            [(i, "t%d" % (i % 5), float(i)) for i in range(100)],
            "user_id long, event_type string, value double",
        )
        # drop B's type diversity to 1 and null out 40% of value
        b = spark.createDataFrame(
            [
                (i, "t0", None if i % 5 < 2 else float(i))
                for i in range(50)
            ],
            "user_id long, event_type string, value double",
        )
        out = {
            r.column: r
            for r in profile_diff(
                a, b, ["user_id", "event_type", "value"]
            ).collect()
        }
        assert out["event_type"].distinct_a == 5
        assert out["event_type"].distinct_b == 1
        assert out["event_type"].distinct_ratio == 0.2
        assert out["value"].null_rate_a == 0.0
        assert out["value"].null_rate_b == 0.4
        assert out["value"].null_rate_delta == 0.4
        assert out["user_id"].n_a == 100 and out["user_id"].n_b == 50

    def test_empty_side_null_rates(self, spark):
        from seriesly_spark.operators.analytics import profile_diff

        a = spark.createDataFrame([(1,)], "x long")
        b = spark.createDataFrame([], "x long")
        (r,) = profile_diff(a, b, ["x"]).collect()
        assert r.n_b == 0
        assert r.null_rate_b is None and r.null_rate_delta is None
        assert r.distinct_ratio == 0.0


class TestMinhashCross:
    def test_no_within_side_pairs_and_subset_of_self_join(self, spark):
        """Cross pairs = exactly the self-join pairs that straddle the
        split (orientation corpus->probe), never within-side pairs."""
        from seriesly_spark.operators.dedup import (
            minhash_lsh_pairs,
            minhash_lsh_pairs_cross,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        corpus = docs.where(F.col("doc_id") % 7 != 0)
        probe = docs.where(F.col("doc_id") % 7 == 0)
        cross = {
            (r.corpus_id, r.probe_id)
            for r in minhash_lsh_pairs_cross(corpus, probe).collect()
        }
        full = {
            (r.a, r.b) for r in minhash_lsh_pairs(docs).collect()
        }
        want = {
            (a, b) if b % 7 == 0 else (b, a)
            for a, b in full
            if (a % 7 == 0) != (b % 7 == 0)
        }
        assert cross == want

    def test_empty_probe(self, spark):
        from seriesly_spark.operators.dedup import minhash_lsh_pairs_cross

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        empty = docs.where(F.lit(False))
        assert minhash_lsh_pairs_cross(docs, empty).count() == 0
        assert minhash_lsh_pairs_cross(empty, docs).count() == 0

    def test_overlapping_id_spaces_emit_no_self_pairs(self, spark):
        """A doc present in BOTH frames under one id (screening a
        shard against a superset corpus) must not report itself."""
        from seriesly_spark.operators.dedup import minhash_lsh_pairs_cross

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
        pairs = minhash_lsh_pairs_cross(docs, docs).collect()
        assert all(r.corpus_id != r.probe_id for r in pairs)


class TestJsonQuarantine:
    def test_routes_bad_lines(self, spark):
        from seriesly_spark.sources.tables import parse_json_quarantine

        df = spark.createDataFrame(
            [
                (1, '{"a": 5, "b": "x"}'),
                (2, '{"a": 5, "b"'),
                (3, "garbage"),
                (4, '{"a": null, "b": "y"}'),
            ],
            "rid long, raw string",
        )
        out = {
            r.rid: r
            for r in parse_json_quarantine(
                df, "a bigint, b string"
            ).collect()
        }
        assert out[1]._corrupt is None and (out[1].a, out[1].b) == (5, "x")
        assert out[2]._corrupt == '{"a": 5, "b"' and out[2].a is None
        assert out[3]._corrupt == "garbage"
        assert out[4]._corrupt is None and out[4].a is None
        assert out[4].b == "y"

    def test_type_mismatch_is_quarantined_with_partial_fields(self, spark):
        """Spark PERMISSIVE semantics: valid JSON with an uncoercible
        field also lands in _corrupt, with coercible fields kept."""
        from seriesly_spark.sources.tables import parse_json_quarantine

        df = spark.createDataFrame(
            [(1, '{"a": "notint", "b": "y"}')], "rid long, raw string"
        )
        (r,) = parse_json_quarantine(df, "a bigint, b string").collect()
        assert r._corrupt is not None and r.b == "y" and r.a is None

    def test_name_collisions_raise_eagerly(self, spark):
        """Parsed fields colliding with input columns, a schema that
        claims _corrupt, or an input that already carries _corrupt
        would all flatten into ambiguous duplicate column names; each
        must raise immediately with the collision named."""
        import pytest

        from seriesly_spark.sources.tables import parse_json_quarantine

        df = spark.createDataFrame([(1, "{}")], "rid long, raw string")
        with pytest.raises(ValueError, match="reserved"):
            parse_json_quarantine(df, "_corrupt string, a bigint")
        with pytest.raises(ValueError, match="rid"):
            parse_json_quarantine(df, "rid bigint, a bigint")
        dirty = df.withColumn("_corrupt", F.lit("x"))
        with pytest.raises(ValueError, match="already has"):
            parse_json_quarantine(dirty, "a bigint")


class TestDedupSpans:
    FIX = [
        (1, "a b c d e"),
        (2, "x y a b c z"),  # "a b c" stale from doc 1
        (3, "a b c d e"),  # exact dup of 1 -> fully excised
        (4, "p q"),  # shorter than n -> untouched
        (5, "k k k k"),  # within-doc repeat only -> kept
    ]

    def test_fixture_semantics(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans

        docs = spark.createDataFrame(self.FIX, "doc_id long, text string")
        out = {r.doc_id: r for r in dedup_spans(docs).collect()}
        assert (out[1].n_removed, out[1].text_clean) == (0, "a b c d e")
        assert (out[2].n_removed, out[2].text_clean) == (3, "x y z")
        assert (out[3].n_removed, out[3].text_clean) == (5, "")
        assert (out[4].n_removed, out[4].text_clean) == (0, "p q")
        assert (out[5].n_removed, out[5].text_clean) == (0, "k k k k")

    def test_first_doc_always_untouched(self, spark):
        """The minimum-id document is the first carrier of every gram
        it holds — nothing may be excised from it."""
        from seriesly_spark.operators.dedup import dedup_spans

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        first_id = docs.agg(F.min("doc_id")).collect()[0][0]
        r = (
            dedup_spans(docs)
            .where(F.col("doc_id") == first_id)
            .collect()[0]
        )
        assert r.n_removed == 0

    def test_partition_invariance(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans

        docs = spark.createDataFrame(self.FIX, "doc_id long, text string")
        a = sorted(map(tuple, dedup_spans(docs).collect()))
        b = sorted(map(tuple, dedup_spans(docs.repartition(5)).collect()))
        assert a == b

    def test_multiple_islands(self, spark):
        """Stale regions separated by fresh gaps > n stay disjoint
        islands; only tokens inside an island are excised."""
        from seriesly_spark.operators.dedup import dedup_spans

        docs = spark.createDataFrame(
            [
                (1, "a b c m n o"),
                # stale "a b c" at 0 and "m n o" at 7; q-run fresh
                (2, "a b c q1 q2 q3 q4 m n o q5 q6"),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in dedup_spans(docs).collect()}
        assert out[1].n_removed == 0
        assert (out[2].n_removed, out[2].text_clean) == (
            6,
            "q1 q2 q3 q4 q5 q6",
        )

    def test_long_heavily_duplicated_doc(self, spark):
        """The r12 verdict's weak case: a 50k-token document that is
        >90% stale. Raw-starts filtering is O(T x S) ~ 2.5e9 lambda
        evaluations on ONE row; the islands fold collapses the stale
        region to a single [lo, hi) interval, so this must finish in
        seconds, with the exact removal count."""
        import time

        from seriesly_spark.operators.dedup import dedup_spans

        base = " ".join(f"t{i}" for i in range(50_000))
        docs = spark.createDataFrame(
            [(1, base), (2, base + " u0 u1 u2 u3 u4")],
            "doc_id long, text string",
        )
        t0 = time.monotonic()
        out = {r.doc_id: r for r in dedup_spans(docs).collect()}
        wall = time.monotonic() - t0
        # stale starts 0..49997 cover [0, 50000): the whole base run
        assert out[1].n_removed == 0
        assert out[2].n_removed == 50_000
        assert out[2].text_clean == "u0 u1 u2 u3 u4"
        assert wall < 120, f"islands filter degraded: {wall:.1f}s"
