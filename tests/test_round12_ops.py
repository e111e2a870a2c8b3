"""Round-12 operator tests: the KMV bottom-k distinct sketch family
(pairwise overlap estimation — the set-intersection question HLL
cannot answer)."""

import pyspark.sql.functions as F
import pytest


def _kmv(spark, rows, k):
    from seriesly_spark.operators.sketches import kmv_overlap

    df = spark.createDataFrame(rows, "g string, key long")
    return {
        (r.g_a, r.g_b): r for r in kmv_overlap(df, "g", "key", k=k).collect()
    }


class TestKmvOverlapExact:
    """Pairs of unsaturated groups (fewer than k distinct keys each)
    must report EXACT distinct counts, union, Jaccard, intersection —
    the sketch holds the whole hash set."""

    def test_exact_values(self, spark):
        rows = (
            [("a", i) for i in range(30)]
            + [("b", i) for i in range(10, 50)]
            + [("c", i) for i in range(100, 120)]
        )
        out = _kmv(spark, rows, k=128)
        ab = out[("a", "b")]
        assert (ab.est_a, ab.est_b) == (30.0, 40.0)
        assert ab.est_union == 50.0
        assert ab.jaccard == pytest.approx(20 / 50)
        assert ab.est_intersect == pytest.approx(20.0)
        ac = out[("a", "c")]
        assert (ac.jaccard, ac.est_intersect) == (0.0, 0.0)

    def test_duplicates_ignored(self, spark):
        # sketch is over DISTINCT keys: repeating rows changes nothing
        base = [("a", i) for i in range(20)] + [("b", i) for i in range(5, 25)]
        out1 = _kmv(spark, base, k=64)
        out2 = _kmv(spark, base * 3, k=64)
        r1, r2 = out1[("a", "b")], out2[("a", "b")]
        assert r1.asDict() == r2.asDict()

    def test_identical_groups(self, spark):
        rows = [("a", i) for i in range(40)] + [("b", i) for i in range(40)]
        r = _kmv(spark, rows, k=128)[("a", "b")]
        assert r.jaccard == 1.0
        assert r.est_intersect == 40.0
        assert r.est_union == 40.0


class TestKmvOverlapEstimates:
    """Saturated groups use the (K-1)/v_K estimator; with k=256 the
    standard error is ~1/sqrt(k) ≈ 6.3%, so a 4-sigma envelope (25%)
    is a deterministic, non-flaky gate (the md5 hash sequence is
    fixed)."""

    def test_envelope(self, spark):
        rows = [("x", i) for i in range(10_000)] + [
            ("y", i) for i in range(5_000, 15_000)
        ]
        r = _kmv(spark, rows, k=256)[("x", "y")]
        assert r.est_a == pytest.approx(10_000, rel=0.25)
        assert r.est_b == pytest.approx(10_000, rel=0.25)
        assert r.est_union == pytest.approx(15_000, rel=0.25)
        assert r.jaccard == pytest.approx(1 / 3, rel=0.35)
        assert r.est_intersect == pytest.approx(5_000, rel=0.35)

    def test_deterministic_across_partitionings(self, spark):
        rows = [("x", i) for i in range(3_000)] + [
            ("y", i) for i in range(1_000, 4_000)
        ]
        from seriesly_spark.operators.sketches import kmv_overlap

        df1 = spark.createDataFrame(rows, "g string, key long").coalesce(1)
        df2 = spark.createDataFrame(rows, "g string, key long").repartition(16)
        a = kmv_overlap(df1, "g", "key", k=128).collect()
        b = kmv_overlap(df2, "g", "key", k=128).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))

    def test_plan_uses_window_group_limit(self, spark):
        # the bottom-k rank filter must compile to WindowGroupLimit so
        # each map task forwards at most k rows per group pre-exchange
        from seriesly_spark.operators.sketches import kmv_overlap

        df = spark.createDataFrame(
            [("a", i) for i in range(10)], "g string, key long"
        )
        plan = (
            kmv_overlap(df, "g", "key", k=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestPagerank:
    def test_matches_power_iteration(self, spark):
        # 1->2, 1->3, 2->3, 3->1, node 4 dangling: closed-loop replay
        from seriesly_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "node long")
        got = {
            r.node: r.rank
            for r in pagerank(edges, nodes, iterations=20).collect()
        }
        r = [0.25] * 4
        adj, deg = {1: [2, 3], 2: [3], 3: [1]}, {1: 2, 2: 1, 3: 1}
        for _ in range(20):
            c = [0.0] * 4
            for u, vs in adj.items():
                for v in vs:
                    c[v - 1] += r[u - 1] / deg[u]
            m = r[3]
            r = [0.15 / 4 + 0.85 * (ci + m / 4) for ci in c]
        for i in range(4):
            assert got[i + 1] == round(r[i], 9)

    def test_mass_conserved(self, spark):
        from seriesly_spark.operators.graph import pagerank

        edges = spark.createDataFrame(
            [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23],
            "src long, dst long",
        )
        out = pagerank(edges, iterations=8).collect()
        assert sum(r.rank for r in out) == pytest.approx(1.0, abs=1e-6)

    def test_all_dangling(self, spark):
        # no edges at all: every node keeps exactly 1/n forever
        from seriesly_spark.operators.graph import pagerank

        edges = spark.createDataFrame([], "src long, dst long")
        nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
        out = pagerank(edges, nodes, iterations=3).collect()
        assert {r.rank for r in out} == {0.2}

    def test_partitioning_invariant(self, spark):
        from seriesly_spark.operators.graph import pagerank

        rows = [(i, (i * 3) % 40) for i in range(40) if i != (i * 3) % 40]
        e1 = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
        e2 = spark.createDataFrame(rows, "src long, dst long").repartition(16)
        a = sorted(map(str, pagerank(e1, iterations=5).collect()))
        b = sorted(map(str, pagerank(e2, iterations=5).collect()))
        assert a == b


class TestDerivationEdges:
    def test_first_carrier_edges(self, spark):
        from seriesly_spark.operators.graph import derivation_edges

        docs = spark.createDataFrame(
            [
                (1, "a b c d"),    # introduces "a b c", "b c d"
                (2, "a b c d"),    # copies both -> edges 2->1 (distinct)
                (3, "x y z"),      # novel: no out-edge
                (4, "b c d q r"),  # shares "b c d" -> edge 4->1
            ],
            "doc_id long, text string",
        )
        got = {(r.src, r.dst) for r in derivation_edges(docs, n=3).collect()}
        assert got == {(2, 1), (4, 1)}


class TestImagePhash:
    """Fixture = the q_image_phash_dedup construction: a 32x32 image
    synthesized from a dense md5-keyed low-frequency DCT spectrum per
    residue (photo-like: every low-freq coefficient carries signal, so
    the median threshold has margin — sparse synthetic gradients put
    the median in a sea of ties and shatter under 1-px noise,
    measured Hamming 12-30)."""

    def _arr(self, res, brightness=0):
        import hashlib

        import numpy as np

        from seriesly_spark.operators.multimodal import _dct_matrix

        m = _dct_matrix(32)
        g = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                if (u, v) == (0, 0):
                    continue
                b = hashlib.md5(f"{res}|{u}|{v}".encode()).digest()[0]
                g[u, v] = (2.0 + b % 16) * (1.0 if b >= 128 else -1.0)
        ideal = m[:8, :].T @ g @ m[:8, :]
        img = 128 + ideal * (90.0 / np.abs(ideal).max())
        out = np.round(
            np.stack([img + 5 * ch for ch in range(3)], axis=2)
        ).clip(0, 255).astype("uint8")
        if brightness:
            out = (out.astype(int) + brightness).clip(0, 255).astype("uint8")
        return out

    @staticmethod
    def _ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    def test_patterns_pairwise_distinct_with_margin(self):
        # the q_image_phash_dedup oracle needs all 40 residue patterns
        # on DISTINCT pHashes; measured min inter-pattern Hamming is 22
        from seriesly_spark.operators.multimodal import phash64

        hashes = [phash64(self._arr(res)) for res in range(40)]
        assert len(set(hashes)) == 40
        m = min(
            self._ham(hashes[i], hashes[j])
            for i in range(40)
            for j in range(i + 1, 40)
        )
        assert m >= 12

    def test_brightness_shift_is_hash_invariant(self):
        # the oracle clusters +30-brightness twins WITH their originals,
        # so this must be exact equality, not merely small Hamming
        from seriesly_spark.operators.multimodal import phash64

        for res in range(40):
            assert phash64(self._arr(res, brightness=30)) == phash64(
                self._arr(res)
            ), res

    def test_single_pixel_noise_stays_local(self):
        from seriesly_spark.operators.multimodal import phash64

        for res in (3, 5, 17, 31):
            noisy = self._arr(res).copy()
            noisy[0, 0, :] = 255
            assert self._ham(phash64(noisy), phash64(self._arr(res))) <= 4

    def test_ppm_roundtrip_preserves_hash(self):
        from seriesly_spark.operators.multimodal import (
            decode_ppm,
            encode_ppm,
            phash64,
        )

        a = self._arr(7)
        assert phash64(decode_ppm(encode_ppm(a))) == phash64(a)

    def test_phash_dedup_clusters(self, spark):
        import pandas as pd

        from seriesly_spark.operators.multimodal import encode_ppm, phash_dedup

        def make(batches):
            # self-contained (closures over the test class do not pickle
            # to executors): same construction as _arr, inlined
            import hashlib

            import numpy as np

            from seriesly_spark.operators.multimodal import (
                _dct_matrix,
                encode_ppm,
            )

            m = _dct_matrix(32)

            def arr(res):
                g = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        if (u, v) == (0, 0):
                            continue
                        b = hashlib.md5(
                            f"{res}|{u}|{v}".encode()
                        ).digest()[0]
                        g[u, v] = (2.0 + b % 16) * (1.0 if b >= 128 else -1.0)
                ideal = m[:8, :].T @ g @ m[:8, :]
                img = 128 + ideal * (90.0 / np.abs(ideal).max())
                return np.round(
                    np.stack([img + 5 * ch for ch in range(3)], axis=2)
                ).clip(0, 255).astype("uint8")

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload": [
                            encode_ppm(arr(int(d) % 3))
                            for d in pdf["doc_id"]
                        ],
                    }
                )

        docs = spark.range(9).select(F.col("id").alias("doc_id"))
        imgs = docs.mapInPandas(make, "doc_id long, payload binary")
        out = {r.doc_id: r for r in phash_dedup(imgs).collect()}
        assert len(out) == 9
        for i in range(9):
            assert out[i].rep_id == i % 3
            assert out[i].cluster_size == 3


class TestCapPerGroup:
    def test_cap_and_monotone(self, spark):
        from seriesly_spark.operators.sampling import cap_per_group

        df = spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(30)], "doc_id long, source string"
        )
        k4 = {r.doc_id for r in cap_per_group(df, "source", "doc_id", 4).collect()}
        k8 = {r.doc_id for r in cap_per_group(df, "source", "doc_id", 8).collect()}
        assert len(k4) == 12 and len(k8) == 24
        assert k4 <= k8  # monotone in cap

    def test_under_cap_groups_kept_whole(self, spark):
        from seriesly_spark.operators.sampling import cap_per_group

        df = spark.createDataFrame(
            [(i, "solo") for i in range(3)], "doc_id long, source string"
        )
        assert cap_per_group(df, "source", "doc_id", 10).count() == 3

    def test_partitioning_invariant_and_plan(self, spark):
        from seriesly_spark.operators.sampling import cap_per_group

        rows = [(i, f"g{i % 5}") for i in range(200)]
        d1 = spark.createDataFrame(rows, "doc_id long, source string").coalesce(1)
        d2 = spark.createDataFrame(rows, "doc_id long, source string").repartition(16)
        a = sorted(r.doc_id for r in cap_per_group(d1, "source", "doc_id", 7).collect())
        b = sorted(r.doc_id for r in cap_per_group(d2, "source", "doc_id", 7).collect())
        assert a == b
        plan = (
            cap_per_group(d2, "source", "doc_id", 7)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestAudioFingerprint:
    def _tone(self, res, scale=1.0):
        import hashlib

        import numpy as np

        frame = 800
        nb = frame // 2
        edges = 1 + (np.arange(18) * nb) // 17
        centers = (edges[:-1] + edges[1:]) // 2
        i = np.arange(frame)
        frames = []
        for f in range(5):
            sig = np.zeros(frame)
            for b in range(17):
                h = hashlib.md5(f"afp|{res}|{f}|{b}".encode()).digest()
                a = 500 + (h[0] % 16) * 150
                sig += a * np.sin(2 * np.pi * centers[b] * i / frame)
            frames.append(sig)
        import numpy as np

        return np.round(np.concatenate(frames) * scale).clip(
            -32768, 32767
        ).astype("int16")

    @staticmethod
    def _ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    def test_tones_pairwise_distinct_with_margin(self):
        from seriesly_spark.operators.multimodal import audio_fingerprint64

        fps = [audio_fingerprint64(self._tone(r)) for r in range(40)]
        assert len(set(fps)) == 40
        m = min(
            self._ham(fps[i], fps[j])
            for i in range(40)
            for j in range(i + 1, 40)
        )
        assert m >= 8

    def test_volume_near_invariance_matches_pinned_table(self):
        # the oracle pins these exact distances; re-derive them here so
        # any audio_fingerprint64 change fails loudly in-suite too
        import __spark_entry__ as entry

        from seriesly_spark.operators.multimodal import audio_fingerprint64

        got = [
            self._ham(
                audio_fingerprint64(self._tone(r, 0.7)),
                audio_fingerprint64(self._tone(r)),
            )
            for r in range(40)
        ]
        assert got == entry._AFP_VOLUME_HD

    def test_wav_roundtrip_preserves_fingerprint(self):
        from seriesly_spark.operators.multimodal import (
            audio_fingerprint64,
            decode_wav,
            encode_wav,
        )

        t = self._tone(11)
        s, rate = decode_wav(encode_wav(t))
        assert rate == 16_000
        assert audio_fingerprint64(s) == audio_fingerprint64(t)

    def test_degenerate_clips(self):
        import numpy as np

        from seriesly_spark.operators.multimodal import audio_fingerprint64

        assert audio_fingerprint64(np.zeros(0, dtype=np.int16)) == 0
        assert audio_fingerprint64(np.zeros(40, dtype=np.int16)) == 0


class TestVideoPhash:
    def test_framepack_roundtrip(self):
        import numpy as np

        from seriesly_spark.operators.multimodal import (
            decode_framepack,
            encode_framepack,
            encode_ppm,
        )

        a = np.zeros((4, 4, 3), dtype=np.uint8)
        frames = [encode_ppm(a), encode_ppm(a + 7), b"opaque"]
        assert decode_framepack(encode_framepack(frames)) == frames
        assert decode_framepack(encode_framepack([])) == []

    def test_framepack_truncation_raises(self):
        import pytest as _pytest

        from seriesly_spark.operators.multimodal import (
            decode_framepack,
            encode_framepack,
        )

        payload = encode_framepack([b"abcdef"])
        with _pytest.raises(ValueError):
            decode_framepack(payload[:-2])

    def test_video_dedup_order_sensitive(self, spark):
        # same frames, different order -> different signature clusters;
        # identical order -> one cluster
        import pandas as pd

        from seriesly_spark.operators.multimodal import (
            encode_framepack,
            encode_ppm,
            video_phash_dedup,
        )

        def make(batches):
            import hashlib

            import numpy as np

            from seriesly_spark.operators.multimodal import _dct_matrix

            m = _dct_matrix(32)

            def img(f):
                g = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        if (u, v) == (0, 0):
                            continue
                        b = hashlib.md5(f"tv|{f}|{u}|{v}".encode()).digest()[0]
                        g[u, v] = (2.0 + b % 16) * (1.0 if b >= 128 else -1.0)
                ideal = m[:8, :].T @ g @ m[:8, :]
                base = 128 + ideal * (90.0 / np.abs(ideal).max())
                return np.round(
                    np.stack([base + 5 * c for c in range(3)], axis=2)
                ).clip(0, 255).astype("uint8")

            from seriesly_spark.operators.multimodal import (
                encode_framepack,
                encode_ppm,
            )

            for pdf in batches:
                payloads = []
                for d in pdf["doc_id"]:
                    order = [0, 1, 2] if int(d) % 2 == 0 else [2, 1, 0]
                    payloads.append(
                        encode_framepack([encode_ppm(img(f)) for f in order])
                    )
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        docs = spark.range(6).select(F.col("id").alias("doc_id"))
        vids = docs.mapInPandas(make, "doc_id long, payload binary")
        out = {r.doc_id: r for r in video_phash_dedup(vids).collect()}
        assert all(r.n_frames == 3 for r in out.values())
        # evens cluster together (rep 0), odds together (rep 1)
        for i in range(6):
            assert out[i].rep_id == (0 if i % 2 == 0 else 1)
            assert out[i].cluster_size == 3


class TestStreamingPhashDedup:
    def test_four_arrivals_one_survivor_per_pattern(self, spark):
        from seriesly_spark.streaming.ingest import streaming_phash_dedup

        out = streaming_phash_dedup(
            spark,
            "/root/testdata/sf0.001/documents.parquet",
            query_name="t12_stream_phash",
        ).collect()
        # 50 docs x (original + brightness twin) x 2 replays = 200
        # arrivals; the state store must fold them to the 40 patterns
        assert [r.n_unique for r in out] == [40]


class TestKmvRollup:
    def test_exact_when_unsaturated_and_merge_is_true_bottom_k(self, spark):
        from seriesly_spark.operators.sketches import kmv_rollup

        rows = (
            [("d1", i) for i in range(40)]
            + [("d2", i) for i in range(20, 60)]
            + [("d3", i) for i in range(50)]
        )
        df = spark.createDataFrame(rows, "bucket string, key long")
        got = {
            r.bucket: r.est_distinct
            for r in kmv_rollup(df, "bucket", "key", k=128).collect()
        }
        # all buckets unsaturated -> exact; merged row (NULL) exact too
        assert got == {"d1": 40.0, "d2": 40.0, "d3": 50.0, None: 60.0}

    def test_saturated_rollup_envelope(self, spark):
        from seriesly_spark.operators.sketches import kmv_rollup

        rows = [(f"d{i % 4}", i) for i in range(40_000)]
        df = spark.createDataFrame(rows, "bucket string, key long")
        out = {
            r.bucket: r.est_distinct
            for r in kmv_rollup(df, "bucket", "key", k=256).collect()
        }
        for b in ("d0", "d1", "d2", "d3"):
            assert out[b] == pytest.approx(10_000, rel=0.25)
        assert out[None] == pytest.approx(40_000, rel=0.25)

    def test_plan_shapes(self, spark):
        from seriesly_spark.operators.sketches import kmv_rollup

        df = spark.createDataFrame(
            [("a", i) for i in range(10)], "bucket string, key long"
        )
        plan = (
            kmv_rollup(df, "bucket", "key", k=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan           # per-bucket bottom-k
        assert "TakeOrderedAndProject" in plan      # global merge limit
