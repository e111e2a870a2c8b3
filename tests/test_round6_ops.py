"""Round-6 hardening tests: durable incremental indexes (staging
parquet instead of localCheckpoint, bucketed layout, compaction),
NULL-text classification, and commit-log seq caching."""

import os

import pytest
from pyspark.sql import functions as F


def _nfiles(d):
    return sum(
        sum(1 for f in files if f.endswith(".parquet"))
        for _r, _d, files in os.walk(d)
    )


class TestDedupIndexDurability:
    def test_layout_bucketed_and_staged(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import DedupIndex

        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path, n_buckets=8)
        batch = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
        )
        idx.update(batch)
        # appends land as flat delta files; the classification staged
        delta = os.path.join(path, "delta")
        assert _nfiles(delta) == 1
        staging = os.path.join(path, "staging")
        assert _nfiles(os.path.join(staging, "1")) > 0
        # compaction folds delta into the bucketed base
        idx.compact()
        data = os.path.join(path, "data")
        assert any(d.startswith("bucket=") for d in os.listdir(data))
        assert not os.path.isdir(delta)

    def test_classification_stable_after_later_updates(self, spark, tmp_path):
        """The returned frame reads from durable staging: consuming it
        AFTER a later update (which mutated the index) must still show
        the classification as of ITS update — the failure mode that
        motivated the old localCheckpoint."""
        from seriesly_spark.operators.dedup_index import DedupIndex

        idx = DedupIndex(spark, str(tmp_path / "idx"))
        a = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "doc_id long, text string"
        )
        out_a = idx.update(a)  # not consumed yet
        b = spark.createDataFrame([(3, "alpha")], "doc_id long, text string")
        out_b = idx.update(b)
        rows_a = {r.id: r.dup_vs_index for r in out_a.collect()}
        assert rows_a == {1: False, 2: False}  # not classified vs itself
        assert out_b.collect()[0].dup_vs_index is True

    def test_null_text_never_indexed(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import (
            DedupIndex,
            index_update_report,
        )

        idx = DedupIndex(spark, str(tmp_path / "idx"))
        batch = spark.createDataFrame(
            [(1, None), (2, "real"), (3, None)], "doc_id long, text string"
        )
        r = index_update_report(idx.update(batch)).collect()[0]
        # NULL-text rows: in n_in, never dups, never appended
        assert (r.n_in, r.n_dup_in_batch, r.n_dup_vs_index, r.n_new) == (
            3, 0, 0, 1,
        )
        assert idx.size() == 1
        # replaying NULLs stays at zero matches and zero growth forever
        r2 = index_update_report(idx.update(batch)).collect()[0]
        assert (r2.n_dup_vs_index, r2.n_new) == (1, 0)
        assert idx.size() == 1

    def test_compact_folds_files_and_prunes_staging(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import DedupIndex

        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path, n_buckets=2)
        for e in range(4):
            batch = spark.createDataFrame(
                [(e * 100 + i, f"doc {e} {i}") for i in range(10)],
                "doc_id long, text string",
            )
            idx.update(batch)
        size_before = idx.size()
        stats = idx.compact(keep_staging=1)
        # 4 flat delta files fold into <= n_buckets base files
        assert stats["files_before"] == 4
        assert stats["files_after"] <= 2
        assert stats["staging_removed"] == 3
        assert idx.size() == size_before  # lossless
        # the index still probes correctly post-compact, and a second
        # compact folds the new delta into the existing base
        r = idx.update(
            spark.createDataFrame([(999, "doc 0 0")], "doc_id long, text string")
        ).collect()[0]
        assert r.dup_vs_index is True
        r2 = idx.update(
            spark.createDataFrame([(1000, "novel x")], "doc_id long, text string")
        ).collect()[0]
        assert r2.dup_vs_index is False
        idx.compact()
        assert idx.size() == size_before + 1  # "novel x" folded in


class TestMinhashIndexDurability:
    def test_band_partitioned_layout_and_compact(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex

        path = str(tmp_path / "mh")
        idx = MinhashIndex(spark, path, bands=4)
        for e in range(3):
            batch = spark.createDataFrame(
                [(e * 10 + i, f"tok{e} alpha beta gamma delta w{i}")
                 for i in range(5)],
                "doc_id long, text string",
            )
            idx.update(batch)
        delta = os.path.join(path, "delta")
        assert _nfiles(delta) == 3  # one flat file per update
        stats = idx.compact(keep_staging=1)
        data = os.path.join(path, "data")
        assert any(d.startswith("band=") for d in os.listdir(data))
        assert not os.path.isdir(delta)
        assert stats["files_after"] <= 4
        assert stats["staging_removed"] == 2
        # post-compact: replay of a seen doc is a full-band hit
        r = idx.update(
            spark.createDataFrame(
                [(99, "tok0 alpha beta gamma delta w0")],
                "doc_id long, text string",
            )
        ).collect()[0]
        assert r.n_band_hits == 4

    def test_classification_stable_after_later_updates(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex

        idx = MinhashIndex(spark, str(tmp_path / "mh"), bands=4)
        a = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        out_a = idx.update(a)  # not consumed yet
        idx.update(a)  # replay mutates the index
        assert out_a.collect()[0].n_band_hits == 0  # still pre-append view


NS = 1_700_000_000_000_000_000


def _k(i):
    return NS + i * 10**9


class TestCommitLogSeqCache:
    def test_seq_monotone_across_fresh_handle(self, spark, tmp_path):
        """A fresh handle (reopen) must continue the seq sequence from
        the on-disk log, not restart it — file names are the durable
        source of truth, the in-memory cache only skips re-listing."""
        import json

        from seriesly_spark.db import SerieslyDB

        root = str(tmp_path / "dbroot")
        db1 = SerieslyDB(spark, root)
        db1.create("cl")
        db1.write_batch("cl", [(_k(1), json.dumps({"k": 1}))])
        db1.write_batch("cl", [(_k(2), json.dumps({"k": 2}))])
        db2 = SerieslyDB(spark, root)  # reopen
        db2.write_batch("cl", [(_k(3), json.dumps({"k": 3}))])
        seqs = [r.seq for r in db2.change_log("cl").collect()]
        assert len(seqs) == 3 and seqs == sorted(set(seqs))

    def test_seq_cache_survives_frozen_clock_without_listing(
        self, spark, tmp_path, monkeypatch
    ):
        """With the clock frozen, repeated mutations must still get
        strictly increasing seqs purely from the cached counter."""
        import json

        import seriesly_spark.db as dbmod
        from seriesly_spark.db import SerieslyDB

        db = SerieslyDB(spark, str(tmp_path / "dbroot"))
        db.create("cl")
        monkeypatch.setattr(dbmod.time, "time_ns", lambda: NS)
        for i in range(4):
            db.write_batch("cl", [(_k(i), json.dumps({"k": i}))])
        seqs = [r.seq for r in db.change_log("cl").collect()]
        assert len(seqs) == 4 and seqs == sorted(set(seqs))

    def test_compact_folds_changelog_segments(self, spark, tmp_path):
        """compact() consolidates the one-file-per-commit log into a
        single segment (plus its own fresh 'compact' row) with the
        batch view unchanged, and post-fold commits keep ascending."""
        import json
        import os as _os

        from seriesly_spark.db import SerieslyDB

        root = str(tmp_path / "dbroot")
        db = SerieslyDB(spark, root)
        db.create("cl")
        for i in range(5):
            db.write_batch("cl", [(_k(i), json.dumps({"k": i}))])
        before = [(r.seq, r.op, r.n_rows) for r in db.change_log("cl").collect()]
        assert len(before) == 5
        db.compact("cl")
        logdir = _os.path.join(root, "cl", ".changelog")
        files = [f for f in _os.listdir(logdir) if f.endswith(".parquet")]
        assert len(files) == 2  # consolidated history + the compact row
        after = [(r.seq, r.op, r.n_rows) for r in db.change_log("cl").collect()]
        assert after[:5] == before  # folded history byte-identical
        assert after[5][1] == "compact"
        # post-fold commits keep ascending from the folded floor
        db2 = SerieslyDB(spark, root)  # reopen: seq floor read from names
        db2.write_batch("cl", [(_k(99), json.dumps({"k": 99}))])
        seqs = [r.seq for r in db2.change_log("cl").collect()]
        assert seqs == sorted(set(seqs)) and len(seqs) == 7


class TestLshAutotune:
    def test_banding_tradeoff_and_pick(self, spark):
        from seriesly_spark.operators.dedup import lsh_autotune

        base = "one two three four five six seven eight nine ten"
        rows = [(1, base), (2, base + " eleven"), (3, base),
                (4, "totally different content entirely here now ok"),
                (5, "a b c d e f g h i j")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = lsh_autotune(df).collect()
        assert [r.bands for r in out] == [32, 16, 8, 4]  # bands DESC
        assert sum(r.picked for r in out) == 1  # exactly one winner
        by_bands = {r.bands: r for r in out}
        # recall never increases as bands shrink (same signature)
        recalls = [by_bands[b].recall for b in (32, 16, 8, 4)]
        assert all(
            a >= b for a, b in zip(recalls, recalls[1:])
            if a is not None and b is not None
        )
        # candidate count is monotone in bands too
        cands = [by_bands[b].n_cand for b in (32, 16, 8, 4)]
        assert all(a >= b for a, b in zip(cands, cands[1:]))
        # the pick meets target when any config does
        if any(r.meets_target for r in out):
            assert next(r for r in out if r.picked).meets_target

    def test_empty_input(self, spark):
        from seriesly_spark.operators.dedup import lsh_autotune

        df = spark.createDataFrame([], "doc_id long, text string")
        out = lsh_autotune(df).collect()
        assert len(out) == 4
        assert all((r.n_true, r.n_cand, r.n_hit) == (0, 0, 0) for r in out)
        assert all(r.recall is None and not r.meets_target for r in out)
        assert sum(r.picked for r in out) == 1

    def test_bad_config_rejected(self, spark):
        from seriesly_spark.operators.dedup import lsh_autotune

        df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
        import pytest as _pt

        with _pt.raises(ValueError):
            lsh_autotune(df, configs=((5, 5),))


class TestCompressionScreen:
    def test_screen_decisions(self, spark):
        from seriesly_spark.operators.textstats import compression_screen

        prose = " ".join(
            f"sentence {i} mentions topic {i * 7 % 13} with detail {i * i}"
            for i in range(40)
        )
        rows = [
            (1, "a" * 2000),   # hyper-compressible -> drop
            (2, prose),        # varied prose -> keep (ratio ~0.3-0.6)
            (3, None),         # NULL text
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in compression_screen(df).collect()}
        assert out[1].keep is False     # ratio < 0.05
        assert out[2].keep is True      # natural-ish redundancy band
        assert out[3].keep is None      # NULL text -> NULL ratio
        assert all(
            r.bound_ok for r in out.values() if r.bound_ok is not None
        )
        assert out[1].n_bytes == 2000


class TestEncodingScreen:
    def test_counts_and_ok(self, spark):
        from seriesly_spark.operators.textstats import encoding_screen

        rows = [
            (1, "perfectly clean prose here"),
            (2, "bad �� decode"),           # 2 replacement chars
            (3, "moji Ã© and â€™ artifacts"),          # 2 mojibake hits
            (4, "ctrl\x01char\x1f"),                   # 2 control chars
            (5, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in encoding_screen(df).collect()}
        assert out[1].enc_ok is True
        assert (out[2].n_replacement, out[2].enc_ok) == (2, False)
        assert out[3].n_mojibake >= 2 and out[3].enc_ok is False
        assert (out[4].n_control, out[4].enc_ok) == (2, False)
        assert out[5].enc_ok is None and out[5].n_replacement is None

    def test_tab_and_newline_are_not_control_hits(self, spark):
        from seriesly_spark.operators.textstats import encoding_screen

        df = spark.createDataFrame(
            [(1, "line one\nline two\ttabbed\r")], "doc_id long, text string"
        )
        r = encoding_screen(df).collect()[0]
        assert (r.n_control, r.enc_ok) == (0, True)


class TestBucketedHistoryProbe:
    def test_history_side_has_no_exchange(self, spark, tmp_path):
        """The cluster-scale probe shape: history exported as a
        digest-bucketed catalog table joins with NO Exchange on its
        side — only the shard's digests shuffle (exactly one Exchange
        in the whole plan, broadcast disabled so the bucketing, not a
        broadcast, is what removes the history shuffle)."""
        from seriesly_spark.operators.dedup_index import (
            DedupIndex,
            probe_bucketed_history,
        )
        from seriesly_spark.sources.bucketed import drop_bucketed

        idx = DedupIndex(spark, str(tmp_path / "idx"), n_buckets=4)
        hist = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
        )
        idx.update(hist)
        idx.compact()
        table = "t_r6_bucketed_hist"
        idx.to_bucketed_table(table, path=str(tmp_path / "tbl"))
        shard = spark.createDataFrame(
            [(100, "doc 7"), (101, "novel a"), (102, "doc 31"), (103, "novel b")],
            "doc_id long, text string",
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probed = probe_bucketed_history(spark, table, shard)
            got = {r.id: r.dup_vs_index for r in probed.collect()}
            assert got == {100: True, 101: False, 102: True, 103: False}
            plan = probed._jdf.queryExecution().executedPlan().toString()
            # AQE prints Final + Initial plans; audit the final one
            final = plan.split("== Initial Plan ==")[0]
            assert final.count("Exchange") == 1, plan
            # and the single Exchange hashes the SHARD side (the scan
            # of the bucketed table reads its recorded distribution)
            assert "SelectedBucketsCount" in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            drop_bucketed(spark, table)


class TestMinhashBucketedProbe:
    def test_history_side_has_no_exchange(self, spark, tmp_path):
        from seriesly_spark.operators.dedup_index import MinhashIndex
        from seriesly_spark.sources.bucketed import drop_bucketed

        idx = MinhashIndex(spark, str(tmp_path / "mh"), bands=4)
        hist = spark.createDataFrame(
            [(i, f"alpha beta gamma delta tail{i}") for i in range(30)],
            "doc_id long, text string",
        )
        idx.update(hist)
        idx.compact()
        table = "t_r6_bucketed_mh"
        idx.to_bucketed_table(table, path=str(tmp_path / "tbl"))
        shard = spark.createDataFrame(
            [(100, "alpha beta gamma delta tail7"),   # replay: full hits
             (101, "completely different words here now")],
            "doc_id long, text string",
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probed = idx.probe_bucketed(table, shard)
            got = {r.id: (r.n_band_hits, r.near_dup_candidate)
                   for r in probed.collect()}
            assert got[100] == (4, True)
            assert got[101] == (0, False)
            plan = probed._jdf.queryExecution().executedPlan().toString()
            # split at the TOP-LEVEL initial-plan marker only: a
            # persisted subtree that itself contains an exchange embeds
            # its own nested (indented) "== Initial Plan ==" section,
            # which a plain substring split would cut at, hiding the
            # outer final plan's scan node.
            final = plan.split("\n+- == Initial Plan ==")[0]
            # semi-join shuffles only the shard's signatures; history
            # scan reads its bucket distribution. (The id-side rollup
            # adds its own exchanges; the history side must add NONE:
            # every Exchange hashes id or (band, sig) of the SHARD.)
            assert "SelectedBucketsCount" in final, plan
            import re
            ex_lines = [ln for ln in final.splitlines() if "Exchange hashpartitioning" in ln]
            assert ex_lines, plan
            # no exchange directly above the bucketed table scan:
            # the scan's subtree between join and FileScan is Sort-only
            seg = final.split("FileScan parquet")[0].splitlines()[-4:]
            assert not any("Exchange" in ln for ln in seg), plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            drop_bucketed(spark, table)


class TestStagingDurability:
    def test_staged_parquet_is_the_classification(self, spark, tmp_path):
        """Restart equivalence: the staging dir holds standard parquet
        that any fresh session can read — its contents ARE the
        classification the update returned (no lineage, no cache, no
        checkpoint directory needed to reconstruct it)."""
        from seriesly_spark.operators.dedup_index import DedupIndex

        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path)
        batch = spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "alpha")],
            "doc_id long, text string",
        )
        returned = {tuple(r) for r in idx.update(batch).collect()}
        # independent read of the on-disk artifact (what a restarted
        # driver would do)
        ondisk = {
            tuple(r)
            for r in spark.read.parquet(
                os.path.join(path, "staging", "1")
            ).select("id", "h", "dup_in_batch", "dup_vs_index").collect()
        }
        assert returned == ondisk and len(ondisk) == 3


class TestDedupBest:
    def test_score_then_id_survivorship(self, spark):
        from seriesly_spark.operators.dedup import dedup_best

        rows = [(1, "same", None), (2, "same", 5.0), (3, "same", None),
                (4, "other", None), (5, "other", None),
                (6, "third", 9.0), (7, "third", 2.0)]
        df = spark.createDataFrame(rows, "doc_id long, text string, score double")
        out = sorted(r.doc_id for r in dedup_best(df, "score").collect())
        # non-NULL score beats NULL; all-NULL group falls to min id;
        # max score wins outright
        assert out == [2, 4, 6]

    def test_empty(self, spark):
        from seriesly_spark.operators.dedup import dedup_best

        df = spark.createDataFrame([], "doc_id long, text string, score double")
        assert dedup_best(df, "score").count() == 0


class TestMaxBucketCap:
    def test_mega_bucket_dropped_real_pairs_kept(self, spark):
        """A signature bucket shared by many docs (corpus-wide
        boilerplate) is dropped from candidate generation; pairs that
        also collide in small buckets survive."""
        from seriesly_spark.operators.dedup import minhash_lsh_pairs

        # 30 docs all ending in the same boilerplate phrase; docs 0/1
        # are near-identical (collide on their OWN content signatures)
        rows = [(0, "alpha beta gamma delta epsilon zeta boiler plate line"),
                (1, "alpha beta gamma delta epsilon zeta boiler plate line x")]
        rows += [(i, f"unique{i} body{i} words{i} here{i} boiler plate line")
                 for i in range(2, 30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        capped = {(r.a, r.b) for r in
                  minhash_lsh_pairs(df, max_bucket=5).collect()}
        assert (0, 1) in capped
        # default (None) keeps exact semantics; the cap may only REMOVE
        # candidates (the > 5-doc boilerplate buckets), never add
        full = {(r.a, r.b) for r in minhash_lsh_pairs(df).collect()}
        assert capped < full
        # the cap bounds COST: boilerplate pairs surviving via small
        # per-band buckets are fine, but the count must drop sharply
        boiler_capped = sum(1 for a, b in capped if a >= 2 and b >= 2)
        boiler_full = sum(1 for a, b in full if a >= 2 and b >= 2)
        assert boiler_capped < boiler_full

    def test_autotune_cap_passthrough(self, spark):
        from seriesly_spark.operators.dedup import lsh_autotune

        rows = [(i, f"u{i} v{i} w{i} x{i} shared frame suffix tokens")
                for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = lsh_autotune(df, max_bucket=4).collect()
        assert len(out) == 4 and sum(r.picked for r in out) == 1
        # with the frame buckets capped, candidate counts collapse
        out_full = lsh_autotune(df).collect()
        by = {r.bands: r.n_cand for r in out}
        by_full = {r.bands: r.n_cand for r in out_full}
        assert all(by[b] <= by_full[b] for b in by)
