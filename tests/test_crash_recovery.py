"""Crash-recovery tests for the maintenance paths that only run after a
failure — exactly the code that must be right when it finally executes
(round-7 VERDICT item 2).

Fault injection strategy: drive the REAL ``compact()`` / fold code and
crash it at a chosen step by wrapping the specific ``os.rename`` /
``shutil.rmtree`` call it makes next — no hand-built directory states
for the compact swap (a hand-built ``data.compact-tmp`` would not be
forced to hold base+delta folded the way the real writer is). The
changelog fold crash IS hand-arranged (restore a copy of a folded
segment), because there the stranded state is just "a removed file came
back".

Covered:
  * DedupIndex/MinhashIndex ``_recover_compact``: all four branches
    (roll-forward, roll-back on incomplete tmp, finish-cleanup,
    drop-stranded-tmp), plus the first-ever-compact window that needs
    the unconditional ``data.compact-old`` marker;
  * DedupIndex legacy-layout migration (including the both-layouts
    duplicated-digest case) and MinhashIndex's loud rejection;
  * SerieslyDB mid-fold changelog crash: batch ``change_log`` delivers
    each seq exactly once, and the dedupe shuffle is paid ONLY when the
    stranding is actually present;
  * two live handles on one root mint strictly-increasing, non-clobbering
    commit seqs even with a frozen clock.
"""

import os
import shutil
import types

import pytest

from seriesly_spark.db import SerieslyDB, _changelog_has_stranded_dups
from seriesly_spark.operators.dedup_index import (
    DedupIndex,
    MinhashIndex,
    index_update_report,
)


class _InjectedCrash(RuntimeError):
    pass


def _crash_rmtree_on(monkeypatch, path, skip=0):
    """Make shutil.rmtree raise when first asked to remove ``path``
    (after ``skip`` earlier removals of that same path)."""
    import seriesly_spark.operators.dedup_index as m

    real = shutil.rmtree
    seen = {"n": 0}

    def wrapper(p, *a, **kw):
        if os.path.abspath(str(p)) == os.path.abspath(path):
            seen["n"] += 1
            if seen["n"] > skip:
                raise _InjectedCrash(p)
        return real(p, *a, **kw)

    monkeypatch.setattr(m.shutil, "rmtree", wrapper)


def _crash_rename_from(monkeypatch, src):
    """Make os.rename raise when asked to move ``src``."""
    import seriesly_spark.operators.dedup_index as m

    real = os.rename

    def wrapper(s, d):
        if os.path.abspath(str(s)) == os.path.abspath(src):
            raise _InjectedCrash(s)
        return real(s, d)

    monkeypatch.setattr(m.os, "rename", wrapper)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe_map(idx, spark, rows):
    out = idx.update(_batch(spark, rows))
    got = out.collect()
    assert len(got) == len(rows), "probe join fanned out on duplicates"
    return {r.id: r.dup_vs_index for r in got}


class TestDedupIndexCompactCrash:
    def _seed(self, spark, path):
        """Index with a compacted base (docs 0..9) plus un-folded delta
        appends (docs 10..19)."""
        idx = DedupIndex(spark, path, n_buckets=4)
        idx.update(_batch(spark, [(i, f"doc {i}") for i in range(10)]))
        idx.compact()
        idx.update(_batch(spark, [(i, f"doc {i}") for i in range(10, 20)]))
        return idx

    def test_crash_before_tmp_install_rolls_forward(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        idx = self._seed(spark, path)
        # Crash mid-swap: base moved aside, tmp (complete) not yet
        # installed -> os.rename(tmp, data) is the failing step.
        _crash_rename_from(monkeypatch, idx._data + ".compact-tmp")
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        assert os.path.isdir(idx._data + ".compact-old")
        assert not os.path.isdir(idx._data)
        # Reopen: tmp has _SUCCESS (holds base+delta folded) -> forward.
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert not os.path.isdir(idx2._data + ".compact-tmp")
        assert not os.path.isdir(idx2._data + ".compact-old")
        assert not os.path.isdir(idx2._delta)
        assert idx2.size() == 20
        flags = _probe_map(
            idx2, spark, [(100, "doc 3"), (101, "doc 15"), (102, "fresh")]
        )
        assert flags == {100: True, 101: True, 102: False}

    def test_crash_with_incomplete_tmp_rolls_back(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        idx = self._seed(spark, path)
        _crash_rename_from(monkeypatch, idx._data + ".compact-tmp")
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        # Strip the completion stamp: the tmp can no longer be trusted.
        os.remove(os.path.join(idx._data + ".compact-tmp", "_SUCCESS"))
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert not os.path.isdir(idx2._data + ".compact-tmp")
        assert os.path.isdir(idx2._data)  # old base reinstated
        assert os.path.isdir(idx2._delta)  # delta untouched
        assert idx2.size() == 20
        flags = _probe_map(
            idx2, spark, [(100, "doc 3"), (101, "doc 15"), (102, "fresh")]
        )
        assert flags == {100: True, 101: True, 102: False}

    def test_crash_before_delta_removal_finishes_cleanup(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        idx = self._seed(spark, path)
        # Crash post-swap: data installed, delta (whose rows are already
        # folded into data) not yet removed. Without cleanup, every
        # delta digest exists twice -> update()'s no-distinct probe
        # would fan out.
        _crash_rmtree_on(monkeypatch, idx._delta)
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        assert os.path.isdir(idx._data) and os.path.isdir(idx._delta)
        assert os.path.isdir(idx._data + ".compact-old")
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert not os.path.isdir(idx2._delta)
        assert not os.path.isdir(idx2._data + ".compact-old")
        assert idx2.size() == 20
        flags = _probe_map(idx2, spark, [(100, "doc 12"), (101, "new")])
        assert flags == {100: True, 101: False}

    def test_crash_before_old_removal_finishes_cleanup(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        idx = self._seed(spark, path)
        # Crash at the very last step: only the old-base marker remains.
        # skip=1: the swap's FIRST rmtree(old) (defensive pre-clean)
        # must run; the second is the real removal.
        _crash_rmtree_on(monkeypatch, idx._data + ".compact-old", skip=1)
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert not os.path.isdir(idx2._data + ".compact-old")
        assert idx2.size() == 20

    def test_crash_before_any_rename_drops_stranded_tmp(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "idx")
        idx = self._seed(spark, path)
        # Crash before the swap touches the live tree: the base has not
        # moved aside yet -> os.rename(data, old) is the failing step.
        _crash_rename_from(monkeypatch, idx._data)
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        assert os.path.isdir(idx._data + ".compact-tmp")
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert not os.path.isdir(idx2._data + ".compact-tmp")
        assert idx2.size() == 20
        flags = _probe_map(idx2, spark, [(100, "doc 3"), (101, "doc 15")])
        assert flags == {100: True, 101: True}

    def test_first_ever_compact_crash_is_recoverable(
        self, spark, tmp_path, monkeypatch
    ):
        """The round-7 ADVICE window: before the unconditional
        ``data.compact-old`` marker, a first-ever compact (no base yet)
        crashing between the tmp install and the delta removal left
        data+delta both holding every digest with NO marker — a state
        recovery could not tell from a normal un-compacted index."""
        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path, n_buckets=4)
        idx.update(_batch(spark, [(i, f"doc {i}") for i in range(10)]))
        assert not os.path.isdir(idx._data)  # never compacted
        _crash_rmtree_on(monkeypatch, idx._delta)
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        # The empty marker is what makes this state distinguishable.
        assert os.path.isdir(idx._data + ".compact-old")
        assert os.path.isdir(idx._data) and os.path.isdir(idx._delta)
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert not os.path.isdir(idx2._delta)
        assert idx2.size() == 10
        # The fan-out regression the marker prevents: a duplicate probe
        # row must come back exactly once.
        r = index_update_report(
            idx2.update(_batch(spark, [(100, "doc 3"), (101, "zzz")]))
        ).collect()[0]
        assert (r.n_in, r.n_dup_vs_index, r.n_new) == (2, 1, 1)

    def test_first_ever_compact_clean_run_leaves_no_marker(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path, n_buckets=4)
        idx.update(_batch(spark, [(1, "a"), (2, "b")]))
        idx.compact()
        assert os.path.isdir(idx._data)
        assert not os.path.isdir(idx._data + ".compact-old")
        assert not os.path.isdir(idx._data + ".compact-tmp")
        assert idx.size() == 2


class TestMinhashIndexCompactCrash:
    def _seed(self, spark, path):
        idx = MinhashIndex(spark, path, n=2, bands=4)
        idx.update(
            _batch(
                spark,
                [(i, f"the quick brown fox {i} jumps") for i in range(8)],
            )
        )
        idx.compact()
        idx.update(
            _batch(
                spark,
                [(i, f"a lazy dog sleeps {i} soundly") for i in range(8, 16)],
            )
        )
        return idx

    def test_crash_mid_swap_rolls_forward(self, spark, tmp_path, monkeypatch):
        path = str(tmp_path / "mh")
        idx = self._seed(spark, path)
        _crash_rename_from(monkeypatch, idx._data + ".compact-tmp")
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        idx2 = MinhashIndex(spark, path, n=2, bands=4)
        assert not os.path.isdir(idx2._data + ".compact-old")
        assert not os.path.isdir(idx2._delta)
        # Near-exact repeats of one base doc and one delta doc must both
        # hit history on every band; a novel doc on none.
        out = idx2.update(
            _batch(
                spark,
                [
                    (100, "the quick brown fox 3 jumps"),
                    (101, "a lazy dog sleeps 12 soundly"),
                    (102, "completely different words entirely here"),
                ],
            )
        )
        got = {r.id: (r.n_band_hits, r.near_dup_candidate) for r in out.collect()}
        assert got[100] == (4, True)
        assert got[101] == (4, True)
        assert got[102] == (0, False)

    def test_crash_before_delta_removal_finishes_cleanup(
        self, spark, tmp_path, monkeypatch
    ):
        path = str(tmp_path / "mh")
        idx = self._seed(spark, path)
        _crash_rmtree_on(monkeypatch, idx._delta)
        with pytest.raises(_InjectedCrash):
            idx.compact()
        monkeypatch.undo()
        assert os.path.isdir(idx._data + ".compact-old")
        idx2 = MinhashIndex(spark, path, n=2, bands=4)
        assert not os.path.isdir(idx2._delta)
        assert not os.path.isdir(idx2._data + ".compact-old")
        # Band hits are capped at `bands` per doc: duplicated signature
        # rows would not change the left-semi hit count, but the
        # storage-level duplicate is gone.
        out = idx2.update(
            _batch(spark, [(100, "a lazy dog sleeps 12 soundly")])
        )
        assert out.collect()[0].n_band_hits == 4


class TestLegacyLayouts:
    def test_dedup_legacy_migrates_into_probe_path(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "idx")
        # Old layout: digest parquet directly under the index root.
        legacy = spark.createDataFrame(
            [(f"doc {i}",) for i in range(5)], "text string"
        ).select(F.md5(F.col("text").cast("binary")).alias("h"))
        legacy.coalesce(1).write.parquet(path)
        idx = DedupIndex(spark, path, n_buckets=4)
        # Files moved off the root (so the migration never re-runs) and
        # the digests are live in the probe path.
        assert not any(
            f.endswith(".parquet") for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
        assert idx.size() == 5
        flags = _probe_map(idx, spark, [(100, "doc 2"), (101, "new doc")])
        assert flags == {100: True, 101: False}

    def test_dedup_both_layouts_restores_at_most_once(self, spark, tmp_path):
        """An index written by BOTH layouts (legacy root files + a
        data/delta tree that re-appended the same digests) must come out
        of the migration's compact with the at-most-once invariant —
        probes must not fan out."""
        from pyspark.sql import functions as F

        path = str(tmp_path / "idx")
        idx = DedupIndex(spark, path, n_buckets=4)
        idx.update(_batch(spark, [(i, f"doc {i}") for i in range(5)]))
        # Retroactively drop legacy files holding an overlapping digest
        # set directly under the root.
        legacy = spark.createDataFrame(
            [(f"doc {i}",) for i in range(3, 8)], "text string"
        ).select(F.md5(F.col("text").cast("binary")).alias("h"))
        legacy.coalesce(1).write.mode("append").parquet(path)
        idx2 = DedupIndex(spark, path, n_buckets=4)
        assert idx2.size() == 8
        r = index_update_report(
            idx2.update(_batch(spark, [(100, "doc 4"), (101, "doc 99")]))
        ).collect()[0]
        assert (r.n_in, r.n_dup_vs_index, r.n_new) == (2, 1, 1)

    def test_minhash_legacy_layout_fails_loudly(self, spark, tmp_path):
        path = str(tmp_path / "mh")
        spark.createDataFrame(
            [("00ff", 1)], "sig string, band int"
        ).coalesce(1).write.parquet(path)
        with pytest.raises(ValueError, match="incompatible MinhashIndex"):
            MinhashIndex(spark, path)


class TestChangelogFoldCrash:
    def test_mid_fold_crash_delivers_each_seq_once(self, spark, tmp_path):
        """A fold interrupted between its atomic replace and the segment
        removals leaves rows in BOTH the consolidated file and an old
        segment; the batch view must still deliver each seq once — and
        must pay the dedupe only when that stranding exists."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        for i in range(4):
            dbs.write("t", '{"k": %d}' % i, ts=f"2024-01-0{i + 1}T00:00:00Z")
        d = os.path.join(dbs._path("t"), ".changelog")
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        assert len(files) == 4
        assert not _changelog_has_stranded_dups(d, files)
        seqs_before = [r.seq for r in dbs.change_log("t").collect()]
        # Keep a copy of a segment the fold will remove, fold (via
        # compact), then put the copy back — the exact mid-fold state.
        saved = os.path.join(str(tmp_path), "saved.parquet")
        shutil.copyfile(os.path.join(d, files[0]), saved)
        dbs.compact("t")
        shutil.copyfile(saved, os.path.join(d, files[0]))
        files_now = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        assert _changelog_has_stranded_dups(d, files_now)
        log = dbs.change_log("t").collect()
        seqs = [r.seq for r in log]
        assert len(seqs) == len(set(seqs)), "duplicate seq delivered"
        # write(4x) + compact, in order, with the original seqs intact
        assert seqs == sorted(seqs)
        assert set(seqs_before) <= set(seqs) and len(seqs) == 5
        assert [r.op for r in log] == ["write"] * 4 + ["compact"]
        # A re-fold after the crash is idempotent: duplicates collapse.
        dbs._fold_changelog("t")
        files_refolded = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )
        assert not _changelog_has_stranded_dups(d, files_refolded)
        assert [r.seq for r in dbs.change_log("t").collect()] == seqs

    def test_clean_log_skips_dedupe_shuffle(self, spark, tmp_path):
        """The round-7 regression guard: an un-stranded log's batch plan
        must not contain the dropDuplicates aggregate."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        for i in range(3):
            dbs.write("t", '{"k": %d}' % i, ts=f"2024-01-0{i + 1}T00:00:00Z")
        plan = dbs.change_log("t")._jdf.queryExecution().executedPlan().toString()
        assert "dropDuplicates" not in plan and "HashAggregate" not in plan

    def test_log_stream_survives_concurrent_fold(self, spark, tmp_path):
        """changes_log_stream running across a compact() (which folds
        the log it is tailing) must neither crash nor miss commits when
        it was caught up at fold time."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"k": 2}', ts="2024-01-02T00:00:00Z")
        q = (
            dbs.changes_log_stream("t")
            .writeStream.format("memory")
            .queryName("t_log_stream")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n0 = spark.table("t_log_stream").count()
            # Fold happens here; the caught-up stream must keep going.
            dbs.compact("t")
            dbs.write("t", '{"k": 3}', ts="2024-01-03T00:00:00Z")
            q.processAllAvailable()
            rows = spark.table("t_log_stream").collect()
        finally:
            q.stop()
        assert n0 == 2
        got_ops = sorted((r.seq, r.op) for r in rows)
        seqs = [s for s, _ in got_ops]
        assert len(seqs) == len(set(seqs))
        # pre-fold writes + the compact commit + the post-fold write
        assert [op for _, op in got_ops] == [
            "write", "write", "compact", "write",
        ]
        # and the batch view agrees with the stream's union
        batch_seqs = [r.seq for r in dbs.change_log("t").collect()]
        assert batch_seqs == seqs

    def test_dedup_within_watermarked_stream(self, spark, tmp_path):
        """dedup_within switches the exactly-once dedup to
        dropDuplicatesWithinWatermark keyed on the commit event time
        (seq IS a ns epoch), so a long-lived consumer's dedup state is
        capped to the horizon instead of growing one row per commit
        forever. Same-run duplicates (the mid-fold crash shape) are
        still collapsed; the helper event-time column must not leak
        into the delivered schema."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"k": 2}', ts="2024-01-02T00:00:00Z")
        # Strand a duplicate the way a mid-fold crash does: an old
        # segment copy comes back next to the consolidated file.
        d = os.path.join(dbs._path("t"), ".changelog")
        seg = sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )[0]
        shutil.copyfile(
            os.path.join(d, seg), os.path.join(d, "stranded-" + seg)
        )
        s = dbs.changes_log_stream("t", dedup_within="1 hour")
        assert "__commit_ts" not in s.columns
        q = (
            s.writeStream.format("memory")
            .queryName("t_log_wm")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.table("t_log_wm").collect()
        finally:
            q.stop()
        seqs = sorted(r.seq for r in rows)
        assert len(seqs) == 2, "stranded duplicate leaked through"
        assert seqs == sorted({r.seq for r in rows})

    def test_compact_fold_opt_out(self, spark, tmp_path):
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        for i in range(3):
            dbs.write("t", '{"k": %d}' % i, ts=f"2024-01-0{i + 1}T00:00:00Z")
        d = os.path.join(dbs._path("t"), ".changelog")
        dbs.compact("t", fold_changelog=False)
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        # 3 writes + the compact commit, all still individual segments
        assert len(files) == 4

    def test_lagging_stream_across_fold_duplicates_never_loses(
        self, spark, tmp_path
    ):
        """The documented lagging-stream failure mode, pinned: a stream
        that stops behind the fold point and restarts afterwards has
        never seen the consolidated file's (reused) path, reads it
        whole, and re-delivers already-seen rows. DUPLICATES, not
        silent loss — every seq is delivered at least once, and keying
        on seq (change_log / exactly_once=True) restores exactly-once."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"k": 2}', ts="2024-01-02T00:00:00Z")
        cp = str(tmp_path / "cp")
        delivered: list[tuple[int, str]] = []

        def sink(df, _epoch):
            delivered.extend((r.seq, r.op) for r in df.collect())

        q = (
            dbs.changes_log_stream("t")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        phase1 = sorted(s for s, _ in delivered)
        assert len(phase1) == 2 and len(set(phase1)) == 2  # caught up
        # Stream is now LAGGING: two more commits land, then the fold
        # consolidates everything into the newest segment's path.
        dbs.write("t", '{"k": 3}', ts="2024-01-03T00:00:00Z")
        dbs.compact("t")  # fold + the compact commit (4th seq)
        q2 = (
            dbs.changes_log_stream("t")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .start()
        )
        q2.processAllAvailable()
        q2.stop()
        seqs = sorted(s for s, _ in delivered)
        batch_seqs = [r.seq for r in dbs.change_log("t").collect()]
        assert len(batch_seqs) == 4 and batch_seqs == sorted(batch_seqs)
        # Duplicates of the two pre-fold rows (the consolidated file was
        # an unseen path), and NOTHING lost.
        from collections import Counter

        counts = Counter(seqs)
        assert set(counts) == set(batch_seqs)
        assert sorted(counts.values()) == [1, 1, 2, 2]
        assert [counts[s] for s in phase1] == [2, 2]
        # ...and the in-flight dedup helper.
        deduped: list[int] = []
        q3 = (
            dbs.changes_log_stream("t", exactly_once=True)
            .writeStream.foreachBatch(
                lambda df, _e: deduped.extend(r.seq for r in df.collect())
            )
            .outputMode("update")
            .start()
        )
        q3.processAllAvailable()
        q3.stop()
        assert sorted(deduped) == batch_seqs

    def test_post_crash_duplicates_delivered_and_deduped(
        self, spark, tmp_path, monkeypatch
    ):
        """Mid-fold crash (consolidated file installed, old segments not
        yet removed): a fresh stream delivers the stranded rows twice;
        change_log and exactly_once=True both collapse them to one row
        per seq with the original ops intact."""
        import seriesly_spark.db as dbmod

        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        for i in range(3):
            dbs.write("t", '{"k": %d}' % i, ts=f"2024-01-0{i + 1}T00:00:00Z")
        d = os.path.join(dbs._path("t"), ".changelog")

        real_remove = os.remove

        def crash_remove(p, *a, **kw):
            if os.path.dirname(p) == d:
                raise _InjectedCrash(p)
            return real_remove(p, *a, **kw)

        monkeypatch.setattr(dbmod.os, "remove", crash_remove)
        with pytest.raises(_InjectedCrash):
            dbs.compact("t")
        monkeypatch.undo()
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        # consolidated file + BOTH old segments still present
        assert len(files) == 3
        assert _changelog_has_stranded_dups(d, files)
        delivered: list[int] = []
        q = (
            dbs.changes_log_stream("t")
            .writeStream.foreachBatch(
                lambda df, _e: delivered.extend(r.seq for r in df.collect())
            )
            .start()
        )
        q.processAllAvailable()
        q.stop()
        log = dbs.change_log("t").collect()
        log_seqs = [r.seq for r in log]
        assert len(log_seqs) == 3 and log_seqs == sorted(log_seqs)
        assert [r.op for r in log] == ["write"] * 3
        # raw stream: the two stranded seqs arrive twice (old segment +
        # fold file), the folded-in-place newest one once
        from collections import Counter

        counts = Counter(delivered)
        assert set(counts) == set(log_seqs)
        assert sorted(counts.values()) == [1, 2, 2]
        assert counts[log_seqs[-1]] == 1
        deduped: list[int] = []
        q2 = (
            dbs.changes_log_stream("t", exactly_once=True)
            .writeStream.foreachBatch(
                lambda df, _e: deduped.extend(r.seq for r in df.collect())
            )
            .outputMode("update")
            .start()
        )
        q2.processAllAvailable()
        q2.stop()
        assert sorted(deduped) == log_seqs


class TestMultiHandleSeq:
    def test_two_handles_never_clobber_and_stay_monotone(
        self, spark, tmp_path, monkeypatch
    ):
        """Two live handles on one root with a FROZEN clock (the
        worst case: time_ns can never break the tie) must still mint
        unique, strictly-increasing commit seqs — the collision re-list
        guard, not luck."""
        import seriesly_spark.db as dbmod

        root = str(tmp_path / "root")
        a = SerieslyDB(spark, root)
        b = SerieslyDB(spark, root)
        a.create("t")
        frozen = 1_700_000_000_000_000_000
        monkeypatch.setattr(
            dbmod, "time", types.SimpleNamespace(time_ns=lambda: frozen)
        )
        writers = [a, b, a, b, b, a]
        for i, h in enumerate(writers):
            h.write("t", '{"k": %d}' % i, ts=f"2024-01-0{i + 1}T00:00:00Z")
        monkeypatch.undo()
        log = a.change_log("t").collect()
        seqs = [r.seq for r in log]
        assert len(seqs) == len(writers), "a handle overwrote a segment"
        assert seqs == sorted(set(seqs)), "seqs not strictly increasing"


class TestDataPlaneRace:
    def test_raced_append_during_rewrite_fails_loudly(self, spark, tmp_path):
        """A second handle appending into a partition while compact()'s
        rewrite is in flight violates the single-writer contract; the
        rewrite must detect it (pre-rmtree re-list), raise, and leave
        BOTH the original files and the raced append readable — loud
        and retryable, never silent row loss."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"k": 2}', ts="2024-01-01T01:00:00Z")
        other = SerieslyDB(spark, str(tmp_path / "root"))

        def racing_transform(df):
            # Fires between the rewrite's read and its tmp write — the
            # window where the old code would rmtree the raced file.
            other.write("t", '{"k": 99}', ts="2024-01-01T02:00:00Z")
            return df

        with pytest.raises(RuntimeError, match="single-writer"):
            dbs._rewrite_partition("t", "2024-01-01", racing_transform)
        got = sorted(
            r.asDict()["doc"] for r in dbs.df("t").select("doc").collect()
        )
        assert len(got) == 3  # 2 originals + the raced append, all alive

    def test_raced_append_leaves_no_tmp_dir(self, spark, tmp_path):
        """When the race detector fires AFTER the staged tmp write, the
        tmp output directory is removed before the raise — repeated
        detected races must not accumulate orphaned .tmp-* dirs."""
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        other = SerieslyDB(spark, str(tmp_path / "root"))

        def racing_transform(df):
            other.write("t", '{"k": 99}', ts="2024-01-01T02:00:00Z")
            return df

        with pytest.raises(RuntimeError, match="single-writer"):
            dbs._rewrite_partition("t", "2024-01-01", racing_transform)
        leftovers = [
            d for d in os.listdir(dbs.root)
            if d.startswith(".tmp-") or d.startswith(".trash-")
        ]
        assert leftovers == []

    def test_append_landing_in_removal_window_is_restored(
        self, spark, tmp_path, monkeypatch
    ):
        """The narrowest race: an append lands AFTER the pre-removal
        re-list but BEFORE the atomic rename. The old rmtree-based code
        silently deleted it; now the rename carries it into the trash
        dir, the post-rename re-list detects it, and the partition is
        restored with every row — including the raced one — intact."""
        import seriesly_spark.db as dbmod

        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"k": 2}', ts="2024-01-01T01:00:00Z")
        other = SerieslyDB(spark, str(tmp_path / "root"))
        part_dir = os.path.join(dbs._path("t"), "date=2024-01-01")
        real = os.rename
        fired = {"n": 0}

        def rename_with_race(s, d):
            if os.path.abspath(str(s)) == os.path.abspath(part_dir):
                if fired["n"] == 0:
                    fired["n"] += 1
                    other.write(
                        "t", '{"k": 99}', ts="2024-01-01T02:00:00Z"
                    )
            return real(s, d)

        monkeypatch.setattr(dbmod.os, "rename", rename_with_race)
        with pytest.raises(RuntimeError, match="single-writer"):
            dbs._rewrite_partition(
                "t", "2024-01-01", lambda df: df
            )
        monkeypatch.undo()
        assert fired["n"] == 1
        got = sorted(
            r.asDict()["doc"] for r in dbs.df("t").select("doc").collect()
        )
        assert len(got) == 3, "raced append was silently dropped"
        assert any('"k": 99' in g or '"k":99' in g for g in got)
        leftovers = [
            d for d in os.listdir(dbs.root)
            if d.startswith(".tmp-") or d.startswith(".trash-")
        ]
        assert leftovers == []

    def test_append_after_atomic_rename_merges_and_survives(
        self, spark, tmp_path, monkeypatch
    ):
        """An append landing AFTER the atomic rename re-creates the
        partition dir; the rewrite's makedirs+move merges its output
        with the raced file — the append survives WITHOUT a raise (it
        was never at risk: the rename already isolated the old files)."""
        import seriesly_spark.db as dbmod

        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        dbs.write("t", '{"k": 1}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"k": 2}', ts="2024-01-01T01:00:00Z")
        other = SerieslyDB(spark, str(tmp_path / "root"))
        part_dir = os.path.join(dbs._path("t"), "date=2024-01-01")
        real = os.rename
        fired = {"n": 0}

        def rename_then_race(s, d):
            out = real(s, d)
            if (
                os.path.abspath(str(s)) == os.path.abspath(part_dir)
                and fired["n"] == 0
            ):
                fired["n"] += 1
                other.write("t", '{"k": 99}', ts="2024-01-01T02:00:00Z")
            return out

        monkeypatch.setattr(dbmod.os, "rename", rename_then_race)
        dbs._rewrite_partition("t", "2024-01-01", lambda df: df)
        monkeypatch.undo()
        assert fired["n"] == 1
        got = sorted(
            r.asDict()["doc"] for r in dbs.df("t").select("doc").collect()
        )
        assert len(got) == 3, "post-rename append must merge and survive"
        assert any('"k": 99' in g or '"k":99' in g for g in got)

    def test_clean_rewrite_still_succeeds(self, spark, tmp_path):
        dbs = SerieslyDB(spark, str(tmp_path / "root"))
        dbs.create("t")
        for h in (0, 1, 2):
            dbs.write("t", '{"k": %d}' % h, ts=f"2024-01-01T0{h}:00:00Z")
        dbs.compact("t")
        part = os.path.join(dbs._path("t"), "date=2024-01-01")
        files = [f for f in os.listdir(part) if f.endswith(".parquet")]
        assert len(files) == 1  # single-file couch rewrite, no false trip
        assert dbs.df("t").count() == 3
