"""Unit tests for the scale-pipeline operators added beyond seriesly parity:
LSH similarity, IVF, BPE-ish token counting, hopping windows, LWW upsert.

The oracle suite (test_entry_oracle) proves cross-engine equality on the
driver tables; these tests pin the *semantics* on hand-built micro-inputs
where the expected answer is computable by eye.
"""

import pytest
from pyspark.sql import functions as F

from seriesly_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_near_dup_pairs,
    ivf_topk,
    lsh_signature,
    rademacher_weights,
)
from seriesly_spark.operators.textstats import token_counts_bpe
from seriesly_spark.operators.windows import hopping_window_agg
from seriesly_spark.sources.tables import latest_by_key


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


class TestRademacher:
    def test_deterministic_and_pm1(self):
        w1 = rademacher_weights(4, 8)
        w2 = rademacher_weights(4, 8)
        assert w1 == w2
        assert all(x in (-1, 1) for row in w1 for x in row)

    def test_roughly_balanced(self):
        w = rademacher_weights(16, 64)
        total = sum(x for row in w for x in row)
        assert abs(total) < 1024 * 0.2  # unbiased coin, generous bound


class TestLshSimilarity:
    def test_identical_vectors_same_signature(self, spark):
        base = [1.0, -2.0, 3.0, 0.5] * 16
        df = _vecs(spark, [(0, base), (1, base), (2, [-x for x in base])])
        sigs = {r.vec_id: r.lsh_sig for r in lsh_signature(df).collect()}
        assert sigs[0] == sigs[1]
        # the negated vector flips every hyperplane side
        assert sigs[2] == sigs[0] ^ 0xFFFF

    def test_near_dup_pairs_finds_clone(self, spark):
        base = [1.0, -2.0, 3.0, 0.5] * 16
        near = list(base)
        near[0] = 1.001  # tiny perturbation, cosine ~ 1
        far = [(-1.0) ** i * float(i) for i in range(64)]
        df = _vecs(spark, [(0, base), (1, near), (7, far)])
        pairs = {(r.a, r.b) for r in cosine_near_dup_pairs(df, 0.9).collect()}
        assert (0, 1) in pairs
        assert all(7 not in p for p in pairs)

    def test_ann_lsh_ranks_clone_first(self, spark):
        base = [1.0, -2.0, 3.0, 0.5] * 16
        near = list(base)
        near[3] = 0.6
        df = _vecs(spark, [(0, base), (1, near), (2, [x * 2 for x in near])])
        top = ann_topk_lsh(df, query_id=0, k=2).collect()
        assert top, "bucket probe must find the near-identical vectors"
        assert top[0].cos_sim == pytest.approx(1.0, abs=1e-3)


class TestIvf:
    def test_probe_returns_cell_neighbors(self, spark):
        # two well-separated clusters along different axes
        a = [1.0] + [0.0] * 63
        b = [0.0] * 63 + [1.0]
        # centroids are vec_id < 2, so one per cluster: 0 -> a, 1 -> b
        rows = [(0, a), (1, b), (2, [x * 3 for x in a]),
                (3, [x * 2 for x in a]), (4, [x * 5 for x in b])]
        df = _vecs(spark, rows)
        got = ivf_topk(df, n_centroids=2, query_id=2, k=5).collect()
        ids = [r.vec_id for r in got]
        # query 2 lives in centroid 0's cell with 0 and 3; 1/4 are in cell 1
        assert set(ids) == {0, 3}
        assert all(r.cos_sim == pytest.approx(1.0) for r in got)


class TestTokenCountsBpe:
    def test_segments_like_gpt2_pretokenizer(self, spark):
        df = spark.createDataFrame(
            [(1, "I'll pay 20 dollars, ok?")], "doc_id long, text string"
        )
        r = token_counts_bpe(df).collect()[0]
        # I |'ll| pay| 20| dollars|,| ok|?
        assert r.n_bpe_tokens == 8
        assert r.n_alpha_tokens == 4  # I, pay, dollars, ok
        assert r.n_num_tokens == 1  # 20
        assert r.n_other_tokens == 3  # 'll, ",", "?"


class TestHoppingWindow:
    def test_each_event_in_four_windows(self, spark):
        df = spark.createDataFrame(
            [("2024-01-02 00:00:00", 10.0), ("2024-01-02 03:00:00", 1.0)],
            "ts string, value double",
        ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
        out = hopping_window_agg(
            df, "ts", length_ms=86_400_000, slide_ms=21_600_000, value_col="value"
        ).collect()
        assert sum(r.cnt for r in out) == 8  # 2 events x 4 windows
        both = [r for r in out if r.cnt == 2]
        # the two events co-occur in windows starting 01-01T06,12,18 and 01-02T00
        assert len(both) == 4
        assert all(r.sum_value == 11.0 for r in both)


class TestLatestByKey:
    def test_last_write_wins(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "old"), (1, 2, "new"), (2, 5, "only")],
            "k long, seq long, v string",
        )
        got = {r.k: (r.seq, r.v) for r in latest_by_key(df, ["k"], "seq").collect()}
        assert got == {1: (2, "new"), 2: (5, "only")}


class TestMultimodalPlumbing:
    def test_frame_sample_boundaries(self, spark):
        from seriesly_spark.operators.multimodal import frame_sample

        df = spark.createDataFrame(
            [(1, "x" * 10), (2, "y" * 4), (3, "")], "doc_id long, text string"
        )
        got = sorted(
            (r.doc_id, r.frame_id, r.frame_len)
            for r in frame_sample(df, frame_size=4).collect()
        )
        assert got == [
            (1, 0, 4), (1, 1, 4), (1, 2, 2),   # 10 bytes -> 4+4+2
            (2, 0, 4),                          # exact fit -> one frame
            (3, 0, 0),                          # empty payload -> one empty frame
        ]

    def test_payload_features_deterministic(self, spark):
        from seriesly_spark.operators.multimodal import payload_features

        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        (row,) = payload_features(df).collect()
        assert len(row.feature) == 8
        assert abs(row.feature[0] - (3 % 97) / 97.0) < 1e-6


class TestJaccardMaxDf:
    def test_max_df_prunes_hot_shingles(self, spark):
        from seriesly_spark.operators.dedup import ngram_jaccard_pairs

        # Docs 1/2 share a unique phrase; the "common common common" shingle
        # appears in all docs (a hot bucket at scale).
        rows = [
            (1, "alpha beta gamma common common common"),
            (2, "alpha beta gamma common common common"),
            (3, "zeta eta theta common common common"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        full = {(r.a, r.b) for r in ngram_jaccard_pairs(df, threshold=0.1).collect()}
        assert (1, 2) in full and (1, 3) in full  # common shingles link 1-3 too
        capped = {
            (r.a, r.b)
            for r in ngram_jaccard_pairs(df, threshold=0.1, max_df=2).collect()
        }
        assert (1, 2) in capped      # unique phrase survives the cap
        assert (1, 3) not in capped  # only linked via pruned hot shingles


class TestLshImplParity:
    def test_pandas_and_expr_signatures_identical(self, spark):
        import random

        from seriesly_spark.operators.similarity import lsh_signature

        rnd = random.Random(7)
        rows = [
            (i, [rnd.uniform(-2, 2) for _ in range(64)]) for i in range(200)
        ]
        rows.append((200, [0.0] * 64))       # zero vector: proj == 0 -> bit set
        rows.append((201, [1e-9] * 64))      # near-zero projections
        df = _vecs(spark, rows)
        a = {r.vec_id: r.lsh_sig for r in lsh_signature(df, 32, 64, impl="pandas").collect()}
        b = {r.vec_id: r.lsh_sig for r in lsh_signature(df, 32, 64, impl="expr").collect()}
        assert a == b
        assert a[200] == (1 << 32) - 1  # all projections 0 -> all bits set


class TestConnectedComponents:
    def test_min_label_clusters(self, spark):
        from seriesly_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
        # components: {0,1,2,3} (chain), {4,5}, {6} isolated
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (0, 3), (4, 5)], "a long, b long"
        )
        got = {
            r.id: r.cluster_id
            for r in connected_components(nodes, pairs).collect()
        }
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


class TestAsofJoin:
    def test_backward_asof_semantics(self, spark):
        from seriesly_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [(1, 100, "l1"), (1, 200, "l2"), (2, 50, "l3")],
            "k long, t long, lv string",
        )
        right = spark.createDataFrame(
            [(1, 100, "r@100"), (1, 150, "r@150"), (1, 300, "r@300")],
            "k long, t long, rv string",
        )
        got = {
            r.lv: r.rv_right
            for r in asof_join(left, right, on="t", by=["k"], right_cols=["rv"]).collect()
        }
        assert got == {
            "l1": "r@100",   # equal ts matches (l.t >= r.t)
            "l2": "r@150",   # latest at-or-before 200
            "l3": None,      # no right row for key 2 -> left outer null
        }


class TestRangeJoin:
    def test_window_pairs(self, spark):
        from seriesly_spark.operators.joins import range_join

        left = spark.createDataFrame(
            [(1, 100, "l1"), (1, 1000, "l2")], "k long, t long, lid string"
        )
        right = spark.createDataFrame(
            [(1, 90, "r1"), (1, 210, "r2"), (1, 2000, "r3"), (2, 100, "r4")],
            "k long, t long, rid string",
        )
        got = {
            (r.lid, r.rid_right, r.dt)
            for r in range_join(
                left, right, on="t", by=["k"], max_dt=100, right_cols=["rid"]
            ).collect()
        }
        # l1@100: r1@90 (dt=10), r2@210 is 110 away -> excluded; r4 other key
        assert got == {("l1", "r1", 10)}


class TestRepetitionStats:
    def test_dup_ratio_and_top_token(self, spark):
        from seriesly_spark.operators.textstats import repetition_stats

        df = spark.createDataFrame(
            [(1, "a a a b"), (2, "x")], "doc_id long, text string"
        )
        rows = {r.doc_id: r for r in repetition_stats(df).collect()}
        r1 = rows[1]
        assert r1.n_tokens == 4 and r1.n_2grams == 3
        # 2-grams: "a a", "a a", "a b" -> 2 distinct of 3
        assert r1.dup_2gram_ratio == pytest.approx(1 - 2 / 3, abs=1e-6)
        assert r1.top_token_ratio == pytest.approx(0.75)
        r2 = rows[2]
        assert r2.n_2grams == 0 and r2.dup_2gram_ratio is None
        assert r2.top_token_ratio == pytest.approx(1.0)


class TestCleanText:
    def test_redaction_stopwords_case(self, spark):
        from seriesly_spark.operators.textstats import clean_text

        df = spark.createDataFrame(
            [(1, "  The CAT  http://x.com/z a b@c.de end ")],
            "doc_id long, text string",
        )
        r = clean_text(df).collect()[0]
        assert r.text_clean == "cat <url> <email> end"
        assert r.n_tokens_clean == 4


class TestEmbeddingCentroids:
    def test_per_label_dim_means(self, spark):
        from seriesly_spark.operators.similarity import embedding_centroids

        df = _vecs(spark, [(0, [1, 2]), (1, [3, 4]), (2, [10, 20])]).withColumn(
            "label", (F.col("vec_id") < 2).cast("int")
        )
        got = {(r.label, r.dim): r.centroid for r in embedding_centroids(df).collect()}
        assert got[(1, 0)] == pytest.approx(2.0)
        assert got[(1, 1)] == pytest.approx(3.0)
        assert got[(0, 0)] == pytest.approx(10.0)
        assert got[(0, 1)] == pytest.approx(20.0)


class TestFillGaps:
    def _series(self, spark):
        return spark.createDataFrame(
            [("a", 0, 1.0), ("a", 3000, 4.0), ("b", 1000, 2.0)],
            "s string, bucket_ms long, v double",
        )

    def test_zero_fill_and_flag(self, spark):
        from seriesly_spark.operators.windows import fill_gaps

        out = fill_gaps(self._series(spark), ["s"], "bucket_ms", "v", 1000, "zero")
        rows = {(r.s, r.bucket_ms): (r.v, r.filled) for r in out.collect()}
        assert rows[("a", 0)] == (1.0, False)
        assert rows[("a", 1000)] == (0.0, True)
        assert rows[("a", 2000)] == (0.0, True)
        assert rows[("a", 3000)] == (4.0, False)
        assert rows[("b", 1000)] == (2.0, False)
        assert len(rows) == 5  # b has a single bucket: no spine growth

    def test_ffill(self, spark):
        from seriesly_spark.operators.windows import fill_gaps

        out = fill_gaps(self._series(spark), ["s"], "bucket_ms", "v", 1000, "ffill")
        rows = {(r.s, r.bucket_ms): r.v for r in out.collect()}
        assert rows[("a", 1000)] == 1.0 and rows[("a", 2000)] == 1.0

    def test_bad_mode(self, spark):
        from seriesly_spark.operators.windows import fill_gaps

        with pytest.raises(ValueError):
            fill_gaps(self._series(spark), ["s"], "bucket_ms", "v", 1000, "lerp")


class TestMovingAvg:
    def test_trailing_frame(self, spark):
        from seriesly_spark.operators.windows import moving_avg

        df = spark.createDataFrame(
            [("a", i * 1000, float(i)) for i in range(4)],
            "s string, bucket_ms long, v double",
        )
        out = moving_avg(df, ["s"], "bucket_ms", "v", 2, out_col="m")
        rows = {r.bucket_ms: r.m for r in out.collect()}
        assert rows[0] == 0.0 and rows[1000] == 0.5
        assert rows[2000] == 1.5 and rows[3000] == 2.5


class TestQualityFilter:
    def test_rules_and_conjunction(self, spark):
        from seriesly_spark.operators.textstats import quality_filter

        good = " ".join(f"tok{i}" for i in range(30))      # varied, no stopwords
        repetitive = " ".join(["dup dup"] * 20)            # dup 2-grams + top share
        short = "one two three"                            # under token band
        stoppy = " ".join(["the"] * 10 + [f"w{i}" for i in range(20)])
        df = spark.createDataFrame(
            [(1, good), (2, repetitive), (3, short), (4, stoppy)],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in quality_filter(df).collect()}
        assert rows[1].keep
        assert not rows[2].dup_ok and not rows[2].keep
        assert not rows[3].tok_ok and not rows[3].keep
        assert not rows[4].stop_ok and not rows[4].keep


class TestParagraphDedup:
    def test_first_occurrence_wins_corpus_wide(self, spark):
        from seriesly_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "a\n\nb\n\na"), (2, "b\n\nc"), (3, "c\n\nd\n\n"), (4, "")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in paragraph_dedup(df).collect()}
        # doc 1: intra-doc repeat of "a" dropped
        assert (rows[1].n_paras, rows[1].n_kept, rows[1].text) == (3, 2, "a\n\nb")
        # doc 2: "b" already seen at (1, 1)
        assert rows[2].text == "c"
        # doc 3: trailing empty paragraph is first "" occurrence -> kept
        assert (rows[3].n_kept, rows[3].text) == (2, "d\n\n")
        # doc 4: its only paragraph ("") is a repeat of (3, 2)
        assert (rows[4].n_kept, rows[4].text) == (0, "")


class TestSketches:
    def test_hll_rollup_exact_at_small_cardinality(self, spark):
        from seriesly_spark.operators.sketches import hll_bucket_rollup

        df = spark.createDataFrame(
            [(d, u) for d in (1, 2, 3) for u in range(d * 50)],
            "day long, user long",
        )
        rows = {r.day: r.est_distinct for r in hll_bucket_rollup(df, "user", "day").collect()}
        # HLL sparse mode is exact at these cardinalities; the None row is
        # the union rollup (users of day 3 are a superset of days 1/2).
        assert rows == {1: 50, 2: 100, 3: 150, None: 150}

    def test_approx_quantile_ranks_hit_targets(self, spark):
        from seriesly_spark.operators.sketches import approx_quantile_ranks

        df = spark.createDataFrame(
            [(g, float((i * 37) % 1000)) for g in ("a", "b") for i in range(500)],
            "g string, v double",
        )
        for r in approx_quantile_ranks(df, "v", "g", [0.5, 0.95]).collect():
            assert r.n == 500
            assert abs(r.rank_0 - 0.5) <= 1e-4 + 1 / r.n
            assert abs(r.rank_1 - 0.95) <= 1e-4 + 1 / r.n


class TestTfidfTopTerms:
    def test_distinctive_term_ranks_first(self, spark):
        from seriesly_spark.operators.textstats import tfidf_top_terms

        df = spark.createDataFrame(
            [
                (1, "zebra zebra zebra common", "a"),
                (2, "common filler words here", "a"),
                (3, "yak yak common filler", "b"),
                (4, "words here common filler", "b"),
            ],
            "doc_id long, text string, source string",
        )
        top = {
            r.source: r.token
            for r in tfidf_top_terms(df, k=1).collect()
        }
        assert top == {"a": "zebra", "b": "yak"}


class TestEmbeddingQuantize:
    def test_quantize_halfup_clamp_and_zero_vector(self, spark):
        from seriesly_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.27, 0.635])],
            "vec_id long, embedding array<float>",
        )
        rows = {r.vec_id: r for r in quantize_int8(df).collect()}
        assert rows[1].q == [95, 127]          # 3/4/5: max maps to 127
        assert rows[2].q == [0, 0] and rows[2].scale == 0.0
        assert rows[3].q == [-127, 64]         # 63.5 rounds half-up to 64
        # reconstruction error bounded by scale/2 per element
        r = rows[1]
        errs = [abs(x - qi * r.scale) for x, qi in zip([3.0, 4.0], r.q)]
        assert max(errs) <= r.scale / 2 + 1e-12

    def test_l2_normalize_unit_and_zero(self, spark):
        from seriesly_spark.operators.similarity import l2_normalize

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        rows = {r.vec_id: r.unit for r in l2_normalize(df).collect()}
        assert rows[1] == [0.6, 0.8]
        assert rows[2] == [0.0, 0.0]


class TestSaltedJoin:
    def test_equals_plain_join_and_salts_the_shuffle(self, spark):
        from seriesly_spark.operators.joins import salted_join
        from seriesly_spark.sources.tables import load_table

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            ev = load_table(spark, "/root/testdata/sf0.001", "events")
            dim = ev.groupBy("event_type").agg(F.round(F.avg("value"), 6).alias("w"))
            sj = salted_join(
                ev.select("event_id", "event_type"), dim, ["event_type"],
                salt_from="event_id", n_salts=8,
            )
            plain = ev.select("event_id", "event_type").join(dim, "event_type")
            assert sorted(map(tuple, sj.collect())) == sorted(map(tuple, plain.collect()))
            plan = sj._jdf.queryExecution().executedPlan().toString()
            assert "__salt" in plan  # the shuffle routes on (key, salt)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_rejects_right_outer(self, spark):
        from seriesly_spark.operators.joins import salted_join

        df = spark.range(1).withColumnRenamed("id", "k")
        with pytest.raises(ValueError):
            salted_join(df, df, ["k"], salt_from="k", how="right")


class TestAnnTopkQuantized:
    def test_matches_exact_topk(self, spark):
        from seriesly_spark.operators.similarity import (
            ann_topk_cosine,
            ann_topk_quantized,
        )
        from seriesly_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        exact = [tuple(r) for r in ann_topk_cosine(emb, query_id=0, k=10).collect()]
        quant = [tuple(r) for r in ann_topk_quantized(emb, query_id=0, k=10).collect()]
        assert quant == exact  # expand=4 fully recovers the exact order here


class TestPpmCodec:
    def test_roundtrip(self):
        import numpy as np

        from seriesly_spark.operators.multimodal import decode_ppm, encode_ppm

        arr = (np.arange(5 * 4 * 3) % 256).astype(np.uint8).reshape(5, 4, 3)
        out = decode_ppm(encode_ppm(arr))
        assert out.shape == (5, 4, 3)
        assert (out == arr).all()

    def test_malformed_raises(self):
        import pytest as _pytest

        from seriesly_spark.operators.multimodal import decode_image, decode_ppm

        with _pytest.raises(ValueError):
            decode_ppm(b"P6\n4 5\n255\nshort")
        with _pytest.raises(ValueError):
            decode_ppm(b"P3\n1 1\n255\n000")  # ASCII PPM is not P6
        with _pytest.raises((NotImplementedError, ValueError)):
            decode_image(b"\xff\xd8\xff\xe0JFIF")  # JPEG: no PIL here

    def test_png_roundtrip_all_filters(self):
        import numpy as np

        from seriesly_spark.operators.multimodal import (
            decode_image,
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(11)
        # h >= 5 guarantees every scanline filter type (r % 5) appears.
        for h, w in [(1, 1), (5, 1), (6, 7), (9, 4), (13, 13)]:
            arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            png = encode_png(arr)
            assert png.startswith(b"\x89PNG\r\n\x1a\n")
            out = decode_png(png)
            assert out.shape == arr.shape and (out == arr).all()
            assert (decode_image(png) == arr).all()  # magic dispatch

    def test_png_gradient_exercises_filter_deltas(self):
        # Smooth gradients are where Sub/Up/Average/Paeth produce
        # non-trivial deltas; constant images only exercise zeros.
        import numpy as np

        from seriesly_spark.operators.multimodal import decode_png, encode_png

        r = np.arange(16)[:, None, None]
        c = np.arange(12)[None, :, None]
        ch = np.arange(3)[None, None, :]
        arr = ((r * 3 + c * 5 + ch * 17) % 256).astype(np.uint8)
        assert (decode_png(encode_png(arr)) == arr).all()

    def test_png_malformed_raises(self):
        import numpy as np
        import pytest as _pytest

        from seriesly_spark.operators.multimodal import decode_png, encode_png

        arr = np.zeros((4, 4, 3), dtype=np.uint8)
        png = encode_png(arr)
        with _pytest.raises(ValueError):
            decode_png(b"NOTAPNG" + png)
        flipped = bytearray(png)
        flipped[-20] ^= 0x01  # corrupt inside IDAT body -> CRC mismatch
        with _pytest.raises(ValueError):
            decode_png(bytes(flipped))
        # Unsupported layout (RGBA color type 6) must refuse, not garble.
        body = bytearray(png)
        # IHDR body starts at 16; color type is byte 9 of the body.
        body[16 + 9] = 6
        import zlib as _z

        crc = (_z.crc32(bytes(body[12:29])) & 0xFFFFFFFF).to_bytes(4, "big")
        body[29:33] = crc
        with _pytest.raises(ValueError):
            decode_png(bytes(body))

    def test_resize_nearest(self):
        import numpy as np

        from seriesly_spark.operators.multimodal import resize_nearest

        arr = np.zeros((4, 4, 3), dtype=np.uint8)
        arr[2:, 2:, :] = 255  # bottom-right quadrant white
        small = resize_nearest(arr, 2, 2)
        assert small.shape == (2, 2, 3)
        assert small[0, 0, 0] == 0 and small[1, 1, 0] == 255

    def test_channel_stats_match_numpy(self, spark):
        import numpy as np

        from seriesly_spark.operators.multimodal import (
            encode_ppm,
            image_channel_stats,
        )

        rng = np.random.default_rng(7)
        arrs = [rng.integers(0, 256, (3, 5, 3), dtype=np.uint8) for _ in range(3)]
        df = spark.createDataFrame(
            [(i, bytearray(encode_ppm(a))) for i, a in enumerate(arrs)],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r for r in image_channel_stats(df).collect()}
        for i, a in enumerate(arrs):
            r = got[i]
            assert (r.width, r.height) == (5, 3)
            for ch, name in enumerate(("mean_r", "mean_g", "mean_b")):
                assert getattr(r, name) == round(
                    int(a[:, :, ch].sum()) / 15, 6
                )


class TestCollocationPmi:
    def test_hapax_pruned_and_collocation_ranks_first(self, spark):
        from seriesly_spark.operators.textstats import collocation_pmi

        # "new york" always travels together (3x); "the cat"/"the dog"
        # share a promiscuous left word; "rare pair" occurs once (hapax).
        docs = spark.createDataFrame(
            [
                ("new york new york is big",),
                ("the cat and the dog saw new york",),
                ("rare pair",),
            ],
            "text string",
        )
        out = collocation_pmi(docs, k=5, min_count=2).collect()
        assert all((r.x, r.y) != ("rare", "pair") for r in out)  # pruned
        assert (out[0].x, out[0].y) == ("new", "york")  # tightest pair
        assert out[0].c_xy == 3
        ranks = [r.rank for r in out]
        assert ranks == sorted(ranks)


class TestSemanticDedup:
    def test_clone_flagged_original_kept(self, spark):
        from seriesly_spark.operators.dedup import semantic_dedup

        base = [float(x) for x in (1, 0, 0, 0)]
        near = [0.99, 0.01, 0.0, 0.0]          # cosine ~0.9999 with base
        far1 = [0.0, 1.0, 0.0, 0.0]
        far2 = [0.0, 0.0, 1.0, 0.0]
        df = spark.createDataFrame(
            [(0, base), (1, near), (2, far1), (3, far2)],
            "vec_id long, embedding array<double>",
        )
        # k=1: one cluster = plain pairwise over all 4 (k=4 would give
        # every vector its own singleton cluster and flag nothing —
        # cluster-bounded comparison is the operator's whole point).
        out = {r.vec_id: r.is_dup
               for r in semantic_dedup(df, k=1, iterations=1, tau=0.95).collect()}
        assert out == {0: False, 1: True, 2: False, 3: False}

    def test_cross_cluster_pairs_never_compared(self, spark):
        from seriesly_spark.operators.dedup import semantic_dedup

        # Identical vectors seeded as DIFFERENT initial centroids stay in
        # separate clusters (argmax tie-break is id asc per vector, but
        # each seeds its own cluster and assignment ties break low) —
        # with k=2 both land in cluster 0 and ARE compared; sanity-check
        # the flag still fires only within a shared cluster.
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        out = semantic_dedup(df, k=2, iterations=1, tau=0.99)
        rows = {r.vec_id: (r.cluster, r.is_dup) for r in out.collect()}
        assert rows[0][0] == rows[1][0]          # clones share a cluster
        assert rows[0][1] is False and rows[1][1] is True
        assert rows[2][1] is False


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


class TestRound3PlanShapes:
    """Pin the scale-relevant physical-plan properties of the round-3
    operators — the properties their docstrings promise."""

    def test_histogram_single_aggregate_no_window(self, spark):
        from seriesly_spark.operators.analytics import histogram

        df = spark.range(100).select(
            (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("v")
        )
        p = _plan(histogram(df, "v", ["g"], 0.0, 100.0, 10))
        assert "Window" not in p
        bc = p.count("BroadcastExchange")
        assert p.count("Exchange") - bc == 1  # one shuffle, the aggregate's

    def test_mad_outliers_data_path_never_shuffles_events(self, spark):
        from seriesly_spark.operators.analytics import mad_outliers

        df = spark.range(1000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 5).alias("g"),
            F.col("id").cast("double").alias("v"),
        )
        p = _plan(mad_outliers(df, "v", ["g"], id_cols=["event_id"]))
        # The two median aggregates shuffle their tiny per-group rows;
        # the event rows themselves ride broadcast joins only.
        assert p.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in p

    def test_minmax_downsample_one_aggregate_no_sort(self, spark):
        from seriesly_spark.operators.windows import minmax_downsample

        df = spark.range(100).select(
            (F.col("id") % 3).alias("g"),
            (F.col("id") * 1000).alias("ts_us"),
            F.col("id").cast("double").alias("v"),
        )
        p = _plan(minmax_downsample(df, ["g"], "ts_us", "v", 60_000))
        # Struct min/max compiles to SortAggregate (partial+final) — the
        # properties that matter: map-side partials before the single
        # shuffle, and no Window over the data.
        assert "Window" not in p
        assert "partial_min" in p  # map-side collapse
        bc = p.count("BroadcastExchange")
        assert p.count("Exchange") - bc == 1

    def test_collocation_pmi_topk_is_take_ordered(self, spark):
        from seriesly_spark.operators.textstats import collocation_pmi

        docs = spark.createDataFrame([("a b c",), ("a b d",)], "text string")
        p = _plan(collocation_pmi(docs, k=3, min_count=1))
        assert "TakeOrderedAndProject" in p  # no global sort of candidates


class TestWavCodec:
    def test_roundtrip(self):
        import numpy as np

        from seriesly_spark.operators.multimodal import decode_wav, encode_wav

        s = (np.arange(-5, 6) * 1000).astype(np.int16)
        data, rate = decode_wav(encode_wav(s, 22_050))
        assert rate == 22_050
        assert (data == s).all()

    def test_malformed_raises(self):
        import numpy as np
        import pytest as _pytest

        from seriesly_spark.operators.multimodal import decode_wav, encode_wav

        with _pytest.raises(ValueError):
            decode_wav(b"RIFFxxxxWAVE")  # no fmt/data chunks
        with _pytest.raises(ValueError):
            decode_wav(b"OggS" + b"\x00" * 40)  # wrong container
        good = encode_wav(np.zeros(4, dtype=np.int16))
        with _pytest.raises(ValueError):
            decode_wav(good[:-3])  # truncated data chunk

    def test_audio_stats_match_python(self, spark):
        import math

        import numpy as np

        from seriesly_spark.operators.multimodal import audio_stats, encode_wav

        s = np.array([3, -4, 0, 12], dtype=np.int16)
        df = spark.createDataFrame(
            [(1, bytearray(encode_wav(s, 8000)))], "doc_id long, payload binary"
        )
        (r,) = audio_stats(df).collect()
        assert (r.n_samples, r.sample_rate, r.peak) == (4, 8000, 12)
        assert r.duration_ms == 0.5
        assert r.rms == round(math.sqrt((9 + 16 + 0 + 144) / 4), 6)


class TestCompressionRatio:
    def test_orders_repetition_prose_gibberish(self, spark):
        import random

        from seriesly_spark.operators.textstats import compression_ratio

        rnd = random.Random(3)
        gibberish = "".join(chr(rnd.randint(33, 126)) for _ in range(400))
        df = spark.createDataFrame(
            [
                (1, "spam " * 80),                       # pure repetition
                (2, "the quick brown fox jumps over the lazy dog and "
                    "then considers whether compression ratios are a "
                    "reasonable proxy for text quality at web scale"),
                (3, gibberish),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in compression_ratio(df).collect()}
        assert out[1].ratio < out[2].ratio < out[3].ratio
        assert out[1].ratio < 0.15          # repetition crushes
        assert out[3].ratio > 0.8           # gibberish barely compresses
        assert out[4].ratio is None         # empty -> null, not div-zero
        assert out[2].n_bytes == len(df.collect()[1].text.encode())

    def test_deterministic(self, spark):
        from seriesly_spark.operators.textstats import compression_ratio

        df = spark.createDataFrame([(1, "abc def " * 30)], "doc_id long, text string")
        a = compression_ratio(df).collect()[0]
        b = compression_ratio(df).collect()[0]
        assert (a.n_compressed, a.ratio) == (b.n_compressed, b.ratio)

    def test_certificate_booleans_hold(self, spark):
        """Every certificate boolean must be TRUE on arbitrary input —
        that is what makes the SQL oracle's hardcoded `true` columns a
        legitimate value check (raw n_bytes is compared exactly)."""
        from seriesly_spark.operators.textstats import compression_certificate

        df = spark.createDataFrame(
            [(1, "spam " * 80), (2, "plain prose here"), (3, ""), (4, None)],
            "doc_id long, text string",
        )
        rows = compression_certificate(df).collect()
        assert len(rows) == 4
        for r in rows:
            assert r.bound_ok and r.const_ok and r.rand_ok and r.order_ok, r
        by_id = {r.doc_id: r for r in rows}
        assert by_id[1].n_bytes == 400
        assert by_id[3].n_bytes == 0 and by_id[4].n_bytes == 0


class TestTypeTokenRatio:
    def test_known_ratios(self, spark):
        from seriesly_spark.operators.textstats import type_token_ratio

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "x y z"), (3, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in type_token_ratio(df).collect()}
        assert (out[1].n_tokens, out[1].n_types) == (3, 2)
        assert out[1].ttr == round(2 / 3, 6)
        assert out[1].hapax_ratio == round(1 / 3, 6)  # only 'b' is hapax
        assert (out[2].n_tokens, out[2].n_types, out[2].ttr) == (3, 3, 1.0)
        # Empty document: zero counts, NULL ratios (no 0/0).
        assert (out[3].n_tokens, out[3].n_types) == (0, 0)
        assert out[3].ttr is None and out[3].hapax_ratio is None


class TestLevenshteinPairs:
    def test_planted_variant_found(self, spark):
        from seriesly_spark.operators.dedup import levenshtein_pairs

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog tonight"),
                (2, "the quick brown fox jumps over the lazy cat tonight"),
                (3, "completely different text with no shared prefix at all"),
            ],
            "doc_id long, text string",
        )
        out = levenshtein_pairs(df, max_dist=8).collect()
        assert [(r.a, r.b) for r in out] == [(1, 2)]
        assert out[0].dist == 3  # dog -> cat within the 48-char window

    def test_blocking_prevents_cross_prefix_pairs(self, spark):
        from seriesly_spark.operators.dedup import levenshtein_pairs

        # One edit INSIDE the prefix: blocked apart, never compared —
        # the documented recall trade of prefix blocking.
        df = spark.createDataFrame(
            [(1, "abcdefgh same tail text here"),
             (2, "Xbcdefgh same tail text here")],
            "doc_id long, text string",
        )
        assert levenshtein_pairs(df, max_dist=8).count() == 0
