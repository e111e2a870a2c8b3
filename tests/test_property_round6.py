"""Hypothesis property tests for the round-6 operators: the incremental
index classifications, the LSH auto-tuner, and the compression screen,
each checked against an independent pure-Python brute-force replay."""

import hashlib
import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.lists(
    st.one_of(
        st.none(),
        st.text(
            alphabet=st.sampled_from("ab "), min_size=0, max_size=12
        ),
    ),
    min_size=0,
    max_size=8,
)


class TestDedupIndexProperty:
    @SET
    @given(batch_a=texts, batch_b=texts)
    def test_classification_matches_brute_force(
        self, spark, tmp_path_factory, batch_a, batch_b
    ):
        from seriesly_spark.operators.dedup_index import DedupIndex

        path = str(tmp_path_factory.mktemp("idx") / "i")
        idx = DedupIndex(spark, path)

        def run(batch, history):
            rows = [(i, t) for i, t in enumerate(batch)]
            df = spark.createDataFrame(rows, "doc_id long, text string")
            got = {r.id: r for r in idx.update(df).collect()}
            seen = set()
            for i, t in rows:
                h = (
                    hashlib.md5(t.encode()).hexdigest()
                    if t is not None
                    else None
                )
                exp_in_batch = h is not None and h in seen
                exp_vs_index = h is not None and h in history
                assert got[i].dup_in_batch == exp_in_batch, (i, t)
                assert got[i].dup_vs_index == exp_vs_index, (i, t)
                if h is not None:
                    seen.add(h)
            history |= seen
            return history

        hist = run(batch_a, set())
        run(batch_b, hist)
        # index size == distinct non-NULL digests ever seen
        n = len(
            {
                hashlib.md5(t.encode()).hexdigest()
                for b in (batch_a, batch_b)
                for t in b
                if t is not None
            }
        )
        assert idx.size() == n


def _mh_chunks(grams, n_hashes=32):
    """Pure-Python replay of the chunked minhash: hash i = min over
    grams of substr(md5((i//4) || '|' || g), (i%4)*8, 8)."""
    out = []
    for i in range(n_hashes):
        vals = [
            hashlib.md5(f"{i // 4}|{g}".encode()).hexdigest()[
                (i % 4) * 8 : (i % 4) * 8 + 8
            ]
            for g in grams
        ]
        out.append(min(vals))
    return out


def _trigrams(text):
    toks = text.split()
    return {
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    } if len(toks) >= 3 else set()


class TestLshAutotuneProperty:
    @SET
    @given(
        docs=st.lists(
            st.text(alphabet=st.sampled_from("xy "), min_size=5, max_size=30),
            min_size=0,
            max_size=6,
        )
    )
    def test_matches_brute_force(self, spark, docs):
        from seriesly_spark.operators.dedup import lsh_autotune

        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.bands: r for r in lsh_autotune(df).collect()}

        grams = {i: _trigrams(t) for i, t in rows if _trigrams(t)}
        mh = {i: _mh_chunks(sorted(g)) for i, g in grams.items()}
        ids = sorted(grams)
        truth = set()
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(grams[a] & grams[b])
                un = len(grams[a] | grams[b])
                if un and round(inter / un, 6) >= 0.5:
                    truth.add((a, b))
        for bands, r in ((32, 1), (16, 2), (8, 4), (4, 8)):
            def sig(i, k):
                return hashlib.md5(
                    "".join(mh[i][k * r : (k + 1) * r]).encode()
                ).hexdigest()

            cand = set()
            for ai in range(len(ids)):
                for bi in range(ai + 1, len(ids)):
                    a, b = ids[ai], ids[bi]
                    if any(sig(a, k) == sig(b, k) for k in range(bands)):
                        cand.add((a, b))
            row = got[bands]
            assert row.n_true == len(truth)
            assert row.n_cand == len(cand)
            assert row.n_hit == len(truth & cand)

    def test_pick_is_cheapest_meeting_target(self, spark):
        from seriesly_spark.operators.dedup import lsh_autotune

        base = "p q r s t u v w x y z"
        rows = [(1, base), (2, base + " extra"), (3, "m n o p q r s t u")]
        out = lsh_autotune(
            spark.createDataFrame(rows, "doc_id long, text string"),
            target_recall=0.5,
        ).collect()
        meeting = [r for r in out if r.meets_target]
        picked = next(r for r in out if r.picked)
        if meeting:
            assert picked.meets_target
            assert picked.n_cand == min(r.n_cand for r in meeting)


class TestCompressionScreenProperty:
    @SET
    @given(
        docs=st.lists(
            st.one_of(st.none(), st.text(min_size=0, max_size=200)),
            min_size=0,
            max_size=6,
        )
    )
    def test_matches_zlib_direct(self, spark, docs):
        from seriesly_spark.operators.textstats import compression_screen

        rows = [(i, t) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in compression_screen(df).collect()}
        for i, t in rows:
            raw = (t or "").encode("utf-8")
            n = len(raw)
            c = len(zlib.compress(raw, 6))
            r = got[i]
            assert r.n_bytes == n
            assert r.bound_ok == (c <= n + n / 1000 + 64)
            if n == 0:
                assert r.keep is None
            else:
                ratio = c / n
                # screen band (0.05, 1.1) — compare via the rounded
                # ratio the operator computes
                from seriesly_spark.operators.util import round_half_up

                rr = round_half_up(ratio, 6)
                assert r.keep == (0.05 < rr < 1.1)
