"""Round-13 operator tests: HTML -> text main-content extraction (the
first stage of the crawl intake ladder) and the trainable hashed-ngram
logistic-regression quality scorer."""

import pyspark.sql.functions as F
import pytest

from seriesly_spark.operators.html import html_extract
from seriesly_spark.operators.quality import (
    score_quality_lr,
    train_quality_lr,
)

SF_DIR = "/root/testdata/sf0.001"

PAGE = (
    '<html><head><title>T</title><script>var x="<p>nope</p>";</script>'
    "<style>.c{color:red}</style></head><body>"
    '<div class="nav"><ul><li><a href="/">Home</a></li>'
    '<li><a href="/about">About us right now</a></li></ul></div>'
    "<h1>Hi</h1>"
    "<p>This is the real main content of the page, long enough to keep.</p>"
    "<p>Short.</p>"
    "<!-- a comment with <p>fake paragraph long enough to keep</p> -->"
    '<p>Another real paragraph with an <a href="x">inline link</a> inside '
    "a mostly-text block &amp; an entity &lt;tag&gt;.</p>"
    '<div class="footer"><a href="/tos">Terms of service</a> '
    '<a href="/p">Privacy policy and cookies</a></div>'
    "</body></html>"
)


class TestHtmlExtract:
    def test_boilerplate_rules(self, spark):
        """Script/style/comment content never leaks; link-only nav and
        footer blocks fall to the density rule even though long; short
        blocks fall to the length rule; inline links inside real prose
        survive; entities decode exactly once."""
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        (r,) = html_extract(df).collect()
        assert r.n_kept == 2
        assert r.text == (
            "This is the real main content of the page, long enough to "
            "keep.\nAnother real paragraph with an inline link inside a "
            "mostly-text block & an entity <tag>."
        )
        assert r.n_chars == len(r.text)
        assert "nope" not in r.text and "fake" not in r.text
        # nav text, footer text, heading, title: segmented but dropped
        assert r.n_blocks > r.n_kept

    def test_null_and_empty_html(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "plain text with no markup at all x")],
            "doc_id long, html string",
        )
        out = {r.doc_id: r for r in html_extract(df).collect()}
        assert out[1].n_blocks is None and out[1].text is None
        assert (out[2].n_blocks, out[2].n_kept, out[2].text) == (0, 0, "")
        # tagless input is one all-text block
        assert (out[3].n_kept, out[3].text) == (
            1,
            "plain text with no markup at all x",
        )

    def test_double_escaped_decodes_one_level(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>uses &amp;lt; to show a literal less-than sign</p>")],
            "doc_id long, html string",
        )
        (r,) = html_extract(df).collect()
        assert r.text == "uses &lt; to show a literal less-than sign"

    def test_link_density_threshold_boundary(self, spark):
        """A block at exactly the threshold is kept (<=), above it is
        dropped."""
        # normalized block text is pad + ' ' + anchor = 100 chars
        # (tag-strip leaves a joining space); 34/100 > 0.33 drops,
        # 33/100 == 0.33 keeps (inclusive threshold)
        a34 = "<p>" + "z" * 65 + '<a href="x">' + "q" * 34 + "</a></p>"
        a33 = "<p>" + "z" * 66 + '<a href="x">' + "q" * 33 + "</a></p>"
        df = spark.createDataFrame(
            [(1, a34), (2, a33)], "doc_id long, html string"
        )
        out = {r.doc_id: r for r in html_extract(df).collect()}
        assert out[1].n_kept == 0
        assert out[2].n_kept == 1

    def test_no_python_boundary(self, spark):
        """Pure JVM expressions — no BatchEvalPython / ArrowEvalPython
        in the plan (runs at scan speed on a 100 TB crawl)."""
        df = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
        plan = (
            html_extract(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # narrow per-row work: the only exchange allowed is spread()'s
        # round-robin fan-out of a compact input — never a hash/range
        # shuffle (there is no key to shuffle on)
        assert "hashpartitioning" not in plan
        assert "rangepartitioning" not in plan

    def test_real_corpus_roundtrip(self, spark):
        """Wrapping every sf0.001 document in the synthetic page and
        extracting recovers exactly the document text (all >= 25
        chars, whitespace already canonical)."""
        from __spark_entry__ import _html_page_expr

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        pages = docs.select("doc_id", _html_page_expr().alias("html"))
        out = html_extract(pages).select("doc_id", "text")
        bad = (
            out.alias("o")
            .join(docs.alias("d"), "doc_id")
            .where(
                F.col("o.text")
                != F.trim(F.regexp_replace("d.text", r"\s+", " "))
            )
            .count()
        )
        assert bad == 0


def _labeled(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumn("label", (F.col("lang") == "en").cast("double"))
    )


class TestQualityLR:
    def test_partition_invariance(self, spark):
        """Round-6 decimal folds make the trained weights a pure
        function of the data — invariant to partitioning."""
        docs = _labeled(spark)
        a = sorted(map(tuple, train_quality_lr(docs, rounds=2).collect()))
        b = sorted(
            map(
                tuple,
                train_quality_lr(docs.repartition(7), rounds=2).collect(),
            )
        )
        assert a == b

    def test_learns_a_real_signal(self, spark):
        """AUC of the trained scorer against its training labels must
        beat chance decisively (the corpus shares one vocabulary, so
        only n-gram frequencies separate the classes)."""
        from seriesly_spark.operators.evaluation import roc_auc

        docs = _labeled(spark)
        w = train_quality_lr(docs, rounds=5, lr=8.0)
        scored = score_quality_lr(docs, w).join(
            docs.select("doc_id", (F.col("label") == 1.0).alias("label")),
            "doc_id",
        )
        (r,) = roc_auc(scored).collect()
        assert r.auc > 0.6
        assert r.n_skipped == 0

    def test_loss_direction_on_separable_toy(self, spark):
        """On a trivially separable corpus the positive-class tokens
        must end with positive weights and the scorer must rank every
        positive above every negative."""
        rows = [(i, "good solid prose", 1.0) for i in range(20)] + [
            (i + 100, "spam junk noise", 0.0) for i in range(20)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, label double"
        )
        w = train_quality_lr(docs, rounds=5, lr=8.0, buckets=64)
        s = {
            r.doc_id: r.score
            for r in score_quality_lr(docs, w, buckets=64).collect()
        }
        assert min(s[i] for i in range(20)) > max(
            s[i + 100] for i in range(20)
        )

    def test_null_text_scores_null_and_is_excluded(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma", 1.0),
                (2, "delta epsilon zeta", 0.0),
                (3, None, 1.0),
            ],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, rounds=1, buckets=16)
        s = {
            r.doc_id: r.score
            for r in score_quality_lr(docs, w, buckets=16).collect()
        }
        assert s[3] is None
        assert s[1] is not None and s[2] is not None

    def test_rounds_guard(self, spark):
        with pytest.raises(ValueError, match="rounds"):
            train_quality_lr(_labeled(spark), rounds=0)


class TestBudgetSelectCap:
    def test_generous_cap_is_equivalent_and_plan_pinned(self, spark):
        """A cap covering every group's full prefix leaves the
        selection byte-identical, and the rank filter compiles to
        WindowGroupLimit (map-side truncation before the exchange)."""
        from seriesly_spark.operators.sampling import budget_select

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        base = sorted(
            map(tuple, budget_select(docs, "source", 10_000).collect())
        )
        # cap must sit <= spark.sql.optimizer.windowGroupLimitThreshold
        # (1000) for the WindowGroupLimit rewrite to fire
        capped_df = budget_select(
            docs, "source", 10_000, max_rows_per_group=1000
        )
        assert sorted(map(tuple, capped_df.collect())) == base
        plan = capped_df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_tight_cap_bounds_rows(self, spark):
        from seriesly_spark.operators.sampling import budget_select

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = budget_select(
            docs, "source", 10_000_000, max_rows_per_group=3
        )
        per = out.groupBy("source").count().collect()
        assert per and all(r["count"] <= 3 for r in per)

    def test_cap_guard(self, spark):
        from seriesly_spark.operators.sampling import budget_select

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        with pytest.raises(ValueError, match="max_rows_per_group"):
            budget_select(docs, "source", 1000, max_rows_per_group=0)


class TestDedupSpansCross:
    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely original text here nothing shared at all"),
                (3, "alpha beta the quick brown fox gamma delta"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [
                (100, "someone wrote the quick brown fox jumps once"),
                (101, "nothing shared at all obviously"),
            ],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_every_contaminated_span_removed(self, spark):
        """No first-carrier exemption: every corpus token covered by a
        benchmark trigram window is excised, in every document."""
        from seriesly_spark.operators.dedup import dedup_spans_cross

        corpus, bench = self._frames(spark)
        out = {
            r.doc_id: r
            for r in dedup_spans_cross(corpus, bench, n=3).collect()
        }
        assert out[1].text_clean == "over the lazy dog"
        assert out[1].n_removed == 5
        assert out[2].text_clean == "completely original text here"
        assert out[3].text_clean == "alpha beta gamma delta"
        assert set(out) == {1, 2, 3}  # benchmark rows never appear

    def test_clean_corpus_untouched(self, spark):
        from seriesly_spark.operators.dedup import dedup_spans_cross

        corpus, _ = self._frames(spark)
        bench = spark.createDataFrame(
            [(100, "zero overlap with anything whatsoever")],
            "doc_id long, text string",
        )
        out = dedup_spans_cross(corpus, bench, n=3)
        assert out.where(F.col("n_removed") != 0).count() == 0

    def test_differs_from_self_variant_on_first_carriers(self, spark):
        """dedup_spans exempts the first corpus carrier; the cross
        variant must not — a doc fully contained in the benchmark is
        fully excised even when it is the corpus-internal first
        carrier."""
        from seriesly_spark.operators.dedup import dedup_spans_cross

        corpus = spark.createDataFrame(
            [(1, "held out evaluation prompt text")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(9, "held out evaluation prompt text")],
            "doc_id long, text string",
        )
        (r,) = dedup_spans_cross(corpus, bench, n=3).collect()
        assert r.n_removed == r.n_tokens == 5
        assert r.text_clean == ""


class TestSuffixDupStats:
    def _brute(self, rows, cap):
        toks = {i: t.split() if t else [] for i, t in rows}
        def lcp(s1, s2):
            n = 0
            for x, y in zip(s1, s2):
                if x != y:
                    break
                n += 1
            return n
        suf = [(d, p) for d, t in toks.items() for p in range(len(t))]
        want = {}
        for d, t in toks.items():
            m = 0
            for p in range(len(t)):
                for o in suf:
                    if o != (d, p):
                        m = max(m, lcp(toks[d][p:], toks[o[0]][o[1]:]))
            want[d] = (len(t), min(m, cap))
        return want

    def test_matches_brute_force(self, spark):
        """Length-exact vs an O(n^2) python suffix comparison on a
        corpus with heavy short- and long-span overlap."""
        from seriesly_spark.operators.suffix import suffix_dup_stats

        rows = [
            (i, " ".join("t%d" % ((i * 7 + j * 3) % 23)
                         for j in range(5 + i % 9)))
            for i in range(40)
        ] + [(100, "a a a a a a a a"), (101, None)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_tokens, r.max_dup_len)
            for r in suffix_dup_stats(docs, rounds=5).collect()
        }
        assert got == self._brute(rows, cap=31)

    def test_cap_binds_at_low_rounds(self, spark):
        """Two identical 10-token docs under rounds=2 report the cap
        2^2 - 1 = 3, never more — the documented saturation."""
        from seriesly_spark.operators.suffix import suffix_dup_stats

        text = " ".join(f"w{i}" for i in range(10))
        docs = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        out = {r.doc_id: r.max_dup_len
               for r in suffix_dup_stats(docs, rounds=2).collect()}
        assert out == {1: 3, 2: 3}

    def test_truncation_clamp(self, spark):
        """Identical SHORT docs under generous rounds report their
        true length, not an inflated power-of-two sum."""
        from seriesly_spark.operators.suffix import suffix_dup_stats

        docs = spark.createDataFrame(
            [(1, "x y a b c d q"), (2, "x y a b c d q")],
            "doc_id long, text string",
        )
        out = {r.doc_id: (r.n_tokens, r.max_dup_len)
               for r in suffix_dup_stats(docs, rounds=4).collect()}
        assert out == {1: (7, 7), 2: (7, 7)}

    def test_partition_invariance(self, spark):
        from seriesly_spark.operators.suffix import suffix_dup_stats

        rows = [(i, " ".join("t%d" % ((i + j) % 11) for j in range(8)))
                for i in range(30)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, suffix_dup_stats(docs, rounds=4).collect()))
        b = sorted(map(tuple,
                       suffix_dup_stats(docs.repartition(7), rounds=4)
                       .collect()))
        assert a == b

    def test_rounds_guard(self, spark):
        from seriesly_spark.operators.suffix import suffix_dup_stats

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="rounds"):
            suffix_dup_stats(docs, rounds=0)


class TestDedupSpansExact:
    def test_arbitrary_length_coverage(self, spark):
        """A 10-token span shared by two docs is fully excised from
        BOTH (no first-carrier exemption), while a 3-token overlap
        stays below min_len=8 and survives."""
        from seriesly_spark.operators.suffix import dedup_spans_exact

        docs = spark.createDataFrame(
            [
                (1, "u1 u2 u3 a b c d e f g h i j u4 u5"),
                (2, "v1 a b c d e f g h i j v2 v3"),
                (3, "w1 w2 a b c w3 w4 w5 w6 w7 w8 w9"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r for r in dedup_spans_exact(docs, min_len=8).collect()
        }
        assert out[1].text_clean == "u1 u2 u3 u4 u5"
        assert out[2].text_clean == "v1 v2 v3"
        assert out[3].n_removed == 0

    def test_matches_brute_force(self, spark):
        """Exact coverage semantics vs an O(n^4) python check on a
        corpus with spans straddling the min_len boundary."""
        from seriesly_spark.operators.suffix import dedup_spans_exact

        rows = [
            (i, " ".join("t%d" % ((i * 5 + j * 2) % 17)
                         for j in range(6 + i % 7)))
            for i in range(25)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        L = 4
        got = {
            r.doc_id: r.n_removed
            for r in dedup_spans_exact(docs, min_len=L).collect()
        }
        toks = {i: t.split() for i, t in rows}

        def covered(d, j):
            t = toks[d]
            for s in range(len(t)):
                for e in range(s + L, len(t) + 1):
                    if not (s <= j < e):
                        continue
                    sub = t[s:e]
                    for d2, t2 in toks.items():
                        for s2 in range(len(t2) - (e - s) + 1):
                            if (d2, s2) != (d, s) and t2[s2:s2 + e - s] == sub:
                                return True
            return False

        want = {d: sum(1 for j in range(len(t)) if covered(d, j))
                for d, t in toks.items()}
        assert got == want

    def test_min_len_guard(self, spark):
        from seriesly_spark.operators.suffix import dedup_spans_exact

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="min_len"):
            dedup_spans_exact(docs, min_len=0)


def test_quality_lr_all_null_text_returns_zero_weights(spark):
    """Empty featured batch (all-NULL text) = no GD update: the
    symmetric zero init comes back as the model — the empty-input
    convention (never raise on an empty pruned subset)."""
    from seriesly_spark.operators.quality import train_quality_lr

    docs = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 0.0)],
        "doc_id long, text string, label double",
    )
    w = train_quality_lr(docs, rounds=1, buckets=16)
    rows = w.collect()
    assert len(rows) == 17
    assert all(r.weight == 0.0 for r in rows)


class TestReviewFixesR13:
    def test_lr_null_labels_excluded(self, spark):
        """NULL-label docs must neither crash the gradient (TypeError
        on a None bucket sum) nor dilute the batch size."""
        from seriesly_spark.operators.quality import (
            score_quality_lr,
            train_quality_lr,
        )

        labeled = [(1, "alpha beta", 1.0), (2, "gamma delta", 0.0)]
        docs = spark.createDataFrame(
            labeled + [(3, "omega psi chi", None)],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, rounds=2, buckets=32)
        w_clean = train_quality_lr(
            spark.createDataFrame(
                labeled, "doc_id long, text string, label double"
            ),
            rounds=2,
            buckets=32,
        )
        assert sorted(map(tuple, w.collect())) == sorted(
            map(tuple, w_clean.collect())
        )
        # the unlabeled doc still scores
        s = {r.doc_id: r.score for r in score_quality_lr(docs, w).collect()}
        assert s[3] is not None

    def test_score_buckets_derived_and_validated(self, spark):
        from seriesly_spark.operators.quality import (
            score_quality_lr,
            train_quality_lr,
        )

        docs = spark.createDataFrame(
            [(1, "a b c", 1.0), (2, "d e f", 0.0)],
            "doc_id long, text string, label double",
        )
        w = train_quality_lr(docs, rounds=1, buckets=64)
        derived = score_quality_lr(docs, w).collect()
        explicit = score_quality_lr(docs, w, buckets=64).collect()
        assert sorted(map(tuple, derived)) == sorted(map(tuple, explicit))
        with pytest.raises(ValueError, match="does not match"):
            score_quality_lr(docs, w, buckets=128)

    def test_quarantine_casefold_collision(self, spark):
        from seriesly_spark.sources.tables import parse_json_quarantine

        df = spark.createDataFrame(
            [(1, '{"lang":"en"}')], "Lang long, raw string"
        )
        with pytest.raises(ValueError, match="collide"):
            parse_json_quarantine(df, "lang string")

    def test_span_ops_null_text_text_clean_empty(self, spark):
        """NULL-text docs keep NULL counts but '' text_clean — the
        oracles' string_agg/len() convention, uniform across all three
        span operators."""
        from seriesly_spark.operators.dedup import (
            dedup_spans,
            dedup_spans_cross,
        )
        from seriesly_spark.operators.suffix import dedup_spans_exact

        docs = spark.createDataFrame(
            [(1, "a b c d e f g h i j"), (2, None)],
            "doc_id long, text string",
        )
        for out in (
            dedup_spans(docs, n=3),
            dedup_spans_cross(docs, docs.limit(0), n=3),
            dedup_spans_exact(docs, min_len=3),
        ):
            (r,) = [x for x in out.collect() if x.doc_id == 2]
            assert r.text_clean == ""
            assert r.n_tokens is None


class TestDecontamReport:
    def test_severity_classes(self, spark):
        from seriesly_spark.operators.dedup import decontam_report

        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "completely unrelated training text goes here now ok"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog today"),
                (101, "the quick brown fox went elsewhere entirely today"),
                (102, "nothing here matches anything in training at all"),
                (103, "xy"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r for r in decontam_report(corpus, bench).collect()
        }
        assert out[100].severity == "verbatim"
        assert out[100].gram_containment == 1.0
        assert out[100].near_dup_corpus_docs == 1
        assert out[101].severity == "partial"
        assert out[102].severity == "clean"
        assert out[102].gram_containment == 0.0  # grams, zero hits
        assert out[103].severity == "clean"
        assert out[103].gram_containment is None  # too short for grams
        assert set(out) == {100, 101, 102, 103}

    def test_thresholds_are_parameters(self, spark):
        from seriesly_spark.operators.dedup import decontam_report

        corpus = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(100, "a b c d x y")], "doc_id long, text string"
        )
        (r,) = decontam_report(
            corpus, bench, verbatim=0.5, partial=0.1
        ).collect()
        assert r.gram_containment == 0.5 and r.severity == "verbatim"


def test_dedup_spans_cross_is_length_exact_above_n(spark):
    """The fixed-n cross rewrite covers contaminated spans of ANY
    length >= n exactly (every n-window inside a shared span is itself
    shared) — a 10-token benchmark span is fully excised with n=3."""
    from seriesly_spark.operators.dedup import dedup_spans_cross

    corpus = spark.createDataFrame(
        [(1, "pre1 pre2 a b c d e f g h i j post1 post2")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "x a b c d e f g h i j y")], "doc_id long, text string"
    )
    (r,) = dedup_spans_cross(corpus, bench, n=3).collect()
    assert r.n_removed == 10
    assert r.text_clean == "pre1 pre2 post1 post2"
