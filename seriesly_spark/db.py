"""SerieslyDB — the operational surface of the engine: database DDL,
document ingest, point/range reads, bulk delete, compaction, changes feed.

Reference parity map (SURVEY §2.1):

  * create/drop/list/exists  ≙ S8  (PUT/DELETE db, GET /_all_dbs;
    reference database.go:85-134, handlers.go:28-44,282-289)
  * write/write_batch        ≙ S4/S5 (keyed upsert + batched flush;
    reference database.go:175-302, handlers.go:56-100) — append-only log
    with a write sequence; same-key overwrite resolved at read time by
    last-write-wins (sources.tables.latest_by_key), the lakehouse analogue
    of couchstore's B-tree key replace.
  * get                      ≙ S3  (point lookup, database.go:324-337)
  * all_docs / dump_lines    ≙ S10/S11 (_all/_dump range reads with limit,
    handlers.go:331-420)
  * delete_range             ≙ S6  (bulk range delete, handlers.go:230-281)
  * compact                  ≙ S7  (couch-file rewrite ≙ partition file
    merge; database.go:136-171)
  * changes                  ≙ S13 (the changes feed the reference 501s,
    handlers.go:455-457 — free via a file-stream source here)
  * info                     ≙ S9  (doc_count/space_used, handlers.go:431-451)

Storage layout — one directory per database, hive-partitioned by UTC date:

    <root>/<db>/date=YYYY-MM-DD/part-*.parquet   (ts_ns LONG, seq LONG, doc STRING)

Design for scale: the date partition column turns every time-range
predicate into partition pruning plus parquet min/max skipping on ts_ns
(the B-tree range-walk analogue); appends are new files (no read-modify-
write); delete_range drops fully-covered partition directories without
touching their data and rewrites only the two edge partitions; compact
merges small files per partition. On a real deployment the same API maps
onto Delta/Iceberg (MERGE, OPTIMIZE, CDF) — plain parquet keeps this
repo dependency-free.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from seriesly_spark.functions.timeparse import canonical_key
from seriesly_spark.plans.query import SerieslyQuery, py_parse_ts_ns, seriesly_query
from seriesly_spark.sources.tables import latest_by_key

DOC_SCHEMA = "ts_ns long, seq long, doc string"
CHANGELOG_SCHEMA = (
    "seq long, op string, ts_lo_ns long, ts_hi_ns long, n_rows long"
)
_CHANGELOG_DIR = ".changelog"


def _footer_rows(d: str) -> int:
    """Exact row count of every parquet file under ``d`` from footer
    metadata — driver-side milliseconds, no Spark job. Hidden dirs
    (commit log) excluded, like Spark's readers exclude them."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, dirnames, files in os.walk(d):
        dirnames[:] = [x for x in dirnames if not x.startswith(".")]
        for f in files:
            if f.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(dirpath, f)).num_rows
    return total


def _changelog_has_stranded_dups(d: str, files: list[str]) -> bool:
    """True iff an interrupted :meth:`SerieslyDB._fold_changelog` left
    duplicate seqs in the log directory. Per-commit segments hold ONE
    row; the fold's consolidated file (named with the max folded seq)
    holds every seq <= its own name. So duplicates exist exactly when a
    multi-row file has a sibling with a smaller name — that sibling was
    folded in, but its removal never ran. Detection is driver-side
    parquet-footer reads over a metadata-sized directory."""
    import pyarrow.parquet as pq

    for f in files[1:]:  # files sorted by name == seq order
        try:
            if pq.read_metadata(os.path.join(d, f)).num_rows > 1:
                return True
        except FileNotFoundError:
            # A concurrent compact() fold removed this segment between
            # the directory listing and the footer read. A vanished file
            # is by definition a folded single-row per-commit segment
            # (the fold only ever deletes those), so it cannot be the
            # multi-row consolidated file we are probing for — skip it
            # rather than surface a crash on a pure read path.
            continue
    return False


class SerieslyDB:
    """Filesystem-rooted database registry + per-database operations.

    ``changelog=True`` (default) additionally appends one tiny parquet
    segment per mutating commit to ``<db>/.changelog/`` — a write-ahead
    commit log in the style of lakehouse table formats (Delta's _delta_log
    analogue, metadata-sized). The dot-prefixed directory is invisible to
    Spark's data readers. Mutations only ever ADD segments, so streaming
    it surfaces deletes and compaction as first-class change rows — the
    piece the plain append-only docs feed (:meth:`changes`) cannot
    observe. One maintenance step does rewrite the log: :meth:`compact`
    folds the accumulated segments into one consolidated file (opt out
    with ``compact(name, fold_changelog=False)``); see
    :meth:`changes_log_stream` for what that means to a live stream.

    Concurrency contract: ONE WRITER HANDLE per database at a time (the
    same single-writer contract as the incremental dedup indexes and any
    table format without a lock service). The commit-log seq counter is
    collision-checked against the directory on every write (two handles
    cannot silently overwrite each other's segment), and a data append
    racing a ``compact``/``delete_range`` partition rewrite is never
    silently dropped: the rewrite removes the old files via an ATOMIC
    directory rename, so a raced append either lands in the renamed dir
    (detected, restored to the partition, and raised — fail loudly,
    retry the maintenance op) or re-creates the partition dir after the
    rename (merged with the rewrite output — it survives). Detection is
    best-effort only in the FALSE-POSITIVE direction: an append the
    rewrite actually folded in can still raise as raced (the retry
    folds it for real); the no-silent-loss guarantee itself has no
    window.
    """

    def __init__(self, spark: SparkSession, root: str, changelog: bool = True):
        self.spark = spark
        self.root = root
        self.changelog = changelog
        # Per-db last commit seq. The changelog directory listing is the
        # durable source of truth, but listing it on EVERY mutation makes
        # commit cost grow with log length; a handle lists once on first
        # touch and counts forward from memory after that. A fresh handle
        # (reopen) re-lists, so monotonicity survives restarts.
        self._last_seq: dict[str, int] = {}
        os.makedirs(root, exist_ok=True)

    # -- DDL (S8) -----------------------------------------------------------

    def _path(self, name: str) -> str:
        if not name or name.startswith(".") or "/" in name:
            raise ValueError(f"invalid db name: {name!r}")
        return os.path.join(self.root, name)

    def create(self, name: str) -> None:
        os.makedirs(self._path(name), exist_ok=True)
        if self.changelog:
            # Pre-create the commit-log dir so log streams can attach to
            # an empty database (file-stream sources need the path).
            os.makedirs(
                os.path.join(self._path(name), _CHANGELOG_DIR), exist_ok=True
            )

    def drop(self, name: str) -> None:
        shutil.rmtree(self._path(name), ignore_errors=True)
        # A re-created db starts a fresh log; the stale cached seq must
        # not leak into it (it would be far in the future, not wrong,
        # but the listing-on-first-touch is the honest source of truth).
        self._last_seq.pop(name, None)

    def list(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d)) and not d.startswith(".")
        )

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    # -- Ingest (S4/S5) -----------------------------------------------------

    def write(self, name: str, doc: str, ts=None) -> int:
        """Store one document; returns the assigned ns key (server-assigned
        now-UTC when ``ts`` is None, reference handlers.go:63-72)."""
        return self.write_batch(name, [(ts, doc)])[0]

    def write_batch(self, name: str, rows: list[tuple[object, str]]) -> list[int]:
        """Batched append — the engine-side analogue of the reference's
        write queue flush (1000 ops / 5 s, database.go:175-254): callers
        batch; each call is one commit (one parquet write job)."""
        path = self._path(name)
        if not os.path.isdir(path):
            raise KeyError(f"no such db: {name}")
        seq = time.time_ns()
        keys: list[int] = []
        out = []
        for i, (ts, doc) in enumerate(rows):
            ns = time.time_ns() if ts is None else py_parse_ts_ns(ts)
            keys.append(ns)
            out.append((ns, seq + i, doc))
        # Small batches (the reference's 1000-op flush and every
        # test/gate commit) are built as a SINGLE partition up front:
        # one task writes one file per date via partitionBy — no date
        # shuffle, no small-file spray from createDataFrame's
        # defaultParallelism split (measured 0.58 s -> 0.29 s per tiny
        # commit; a post-hoc coalesce(1) of the split is pathological
        # at ~4.4 s). Big backfills keep the repartition so each date's
        # file is written by its own task.
        if len(out) <= 10_000:
            df = self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(out, 1), DOC_SCHEMA
            )
        else:
            df = self.spark.createDataFrame(out, DOC_SCHEMA)
        df = df.withColumn(
            "date", F.to_date(F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
        if len(out) > 10_000:
            df = df.repartition("date")
        df.write.partitionBy("date").mode("append").parquet(path)
        self._log_change(name, "write", min(keys), max(keys), len(keys))
        return keys

    # -- Commit log ---------------------------------------------------------

    def _log_change(
        self, name: str, op: str, ts_lo: int | None, ts_hi: int | None,
        n_rows: int,
    ) -> None:
        """Append one commit-log segment (driver-side pyarrow write: the
        log row is metadata, not data — one job per mutation would dwarf
        the mutation itself). File names embed the monotone seq, so the
        log reads back in commit order with a plain sort."""
        if not self.changelog:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = os.path.join(self._path(name), _CHANGELOG_DIR)
        os.makedirs(d, exist_ok=True)
        # Monotonic guard: time_ns alone can collide (two mutations in
        # one ns) or step backwards (clock adjustment); the log's file
        # names ARE its commit order, so seq must strictly increase.
        # File names embed the seq, so max(existing)+1 floors the new
        # seq — but the directory is listed only on the handle's FIRST
        # touch of this db (O(log) per commit otherwise); after that the
        # cached last seq counts forward.
        def _list_floor() -> int:
            return max(
                (
                    int(f.split(".")[0])
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                ),
                default=0,
            )

        last = self._last_seq.get(name)
        if last is None:
            last = _list_floor()
        seq = max(time.time_ns(), last + 1)
        # Collision guard for the multi-handle case: file name IS the
        # seq, so a second live handle whose cached floor is stale could
        # mint a seq some other handle already wrote — and the plain
        # write would OVERWRITE that handle's segment. Re-listing on
        # collision restores both uniqueness and (because every written
        # seq is in the listing) cross-handle monotonicity, at the cost
        # of one directory listing only in the already-raced case.
        while os.path.exists(os.path.join(d, f"{seq:020d}.parquet")):
            seq = max(time.time_ns(), _list_floor() + 1)
        self._last_seq[name] = seq
        table = pa.table(
            {
                "seq": pa.array([seq], pa.int64()),
                "op": pa.array([op], pa.string()),
                "ts_lo_ns": pa.array([ts_lo], pa.int64()),
                "ts_hi_ns": pa.array([ts_hi], pa.int64()),
                "n_rows": pa.array([n_rows], pa.int64()),
            }
        )
        pq.write_table(table, os.path.join(d, f"{seq:020d}.parquet"))

    def change_log(self, name: str) -> DataFrame:
        """Batch view of the commit log, in commit order: one row per
        mutating operation. ``n_rows`` is op-specific: docs appended
        (write), raw rows removed (delete), live rows remaining
        (compact). Empty (no mutations yet, or ``changelog=False``)
        databases return an empty frame."""
        path = self._path(name)
        if not os.path.isdir(path):
            raise KeyError(f"no such db: {name}")
        d = os.path.join(path, _CHANGELOG_DIR)
        files = (
            sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            if os.path.isdir(d)
            else []
        )
        if not files:
            return self.spark.createDataFrame([], CHANGELOG_SCHEMA)
        out = self.spark.read.schema(CHANGELOG_SCHEMA).parquet(d)
        # seq is the commit identity; a fold interrupted between its
        # atomic replace and the segment removals leaves rows present in
        # both the consolidated file and an old segment. That stranding
        # is DETECTABLE from driver-side footer metadata (ms, no job):
        # live segments hold one row each and a consolidated file holds
        # every seq <= its name, so duplicates exist iff some multi-row
        # file has an older-named sibling. Paying a dropDuplicates
        # shuffle on every read to cover a crash window that almost
        # never happens would be the wrong default (it was the one plan
        # regression of round 7: s17_change_log +19%).
        if _changelog_has_stranded_dups(d, files):
            out = out.dropDuplicates(["seq"])
        return out.orderBy("seq")

    # -- Reads (S1-S3, S10/S11) --------------------------------------------

    def df(self, name: str, from_ts=None, to_ts=None) -> DataFrame:
        """Live view of the database: time-range pruned, one row per key
        (last write wins). Range bounds are inclusive ns keys (P4)."""
        path = self._path(name)
        if not os.path.isdir(path):
            raise KeyError(f"no such db: {name}")
        try:
            raw = self.spark.read.parquet(path)
        except Exception:
            # Partition discovery needs at least one file; empty db => empty df.
            return self.spark.createDataFrame([], DOC_SCHEMA)
        if from_ts is not None:
            lo = py_parse_ts_ns(from_ts)
            # date predicate -> partition pruning; ts_ns -> row-group skipping
            raw = raw.where(
                (F.col("date") >= F.to_date(F.timestamp_micros(F.lit(lo // 1000))))
                & (F.col("ts_ns") >= F.lit(lo))
            )
        if to_ts is not None:
            hi = py_parse_ts_ns(to_ts)
            raw = raw.where(
                (F.col("date") <= F.to_date(F.timestamp_micros(F.lit(hi // 1000))))
                & (F.col("ts_ns") <= F.lit(hi))
            )
        return latest_by_key(raw.select("ts_ns", "seq", "doc"), ["ts_ns"], "seq")

    def get(self, name: str, ts) -> str | None:
        ns = py_parse_ts_ns(ts)
        row = self.df(name).where(F.col("ts_ns") == ns).select("doc").first()
        return row[0] if row else None

    def all_docs(
        self, name: str, from_ts=None, to_ts=None, limit: int | None = None
    ) -> DataFrame:
        """Key-ordered (key, doc) range read (S10/S11 + P7 limit)."""
        out = (
            self.df(name, from_ts, to_ts)
            .orderBy("ts_ns")
            .select(canonical_key(F.col("ts_ns")).alias("key"), "doc")
        )
        return out.limit(limit) if limit is not None else out

    def dump_lines(
        self, name: str, from_ts=None, to_ts=None, limit: int | None = None
    ) -> "list[str]":
        """NDJSON lines '{"<key>": <doc>}' (reference _dump,
        handlers.go:381-420). Collects — use only for bounded ranges; the
        scale-out path is :meth:`dump_files`."""
        rows = self.all_docs(name, from_ts, to_ts, limit).collect()
        return ['{"%s": %s}' % (r.key, r.doc) for r in rows]

    def dump_files(
        self, name: str, out_dir: str, from_ts=None, to_ts=None,
        compression: str | None = None,
    ) -> int:
        """Distributed NDJSON dump: the same '{"<key>": <doc>}' lines as
        :meth:`dump_lines`, written executor-side with ``df.write.text``
        (no driver materialization — the 100 TB analogue of the
        reference's incrementally streamed ``_dump``,
        handlers.go:381-420). Files are key-ordered within and across
        part files (range-partitioned by the sort); returns the row
        count. Concatenating the sorted part files reproduces the
        streamed dump byte-for-byte.

        ``compression="gzip"`` is the engine-side analogue of the
        reference's gzip encoding sink (S12, ``newGzippingWriter``,
        handlers.go:300-329, and the dump tool's compressed backups,
        tools/dump/dump.go:45-63): each part file is a ``.txt.gz``
        stream, compressed executor-side.

        The returned count comes from an ``Observation`` metric on the
        write job itself — no second scan of the dump output."""
        obs = Observation()
        out = (
            self.df(name, from_ts, to_ts)
            .orderBy("ts_ns")
            .select(
                F.concat(
                    F.lit('{"'),
                    canonical_key(F.col("ts_ns")),
                    F.lit('": '),
                    F.col("doc"),
                    F.lit("}"),
                ).alias("value")
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        w = out.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.text(out_dir)
        return int(obs.get["n"])

    # -- Maintenance (S6/S7/S9) --------------------------------------------

    def _partitions(self, name: str) -> list[str]:
        path = self._path(name)
        return sorted(
            d for d in os.listdir(path)
            if d.startswith("date=") and os.path.isdir(os.path.join(path, d))
        )

    def delete_range(self, name: str, from_ts, to_ts, compact: bool = False) -> None:
        """Bulk range delete (S6). Partitions fully inside the range are
        dropped as directories (no data read); the two edge partitions are
        rewritten without the deleted keys. The 10k-commit batching of the
        reference (handlers.go:256) is irrelevant here — the rewrite is one
        job per edge partition."""
        lo, hi = py_parse_ts_ns(from_ts), py_parse_ts_ns(to_ts)
        lo_d = _ns_date(lo)
        hi_d = _ns_date(hi)
        path = self._path(name)
        # Commit-log bookkeeping (raw rows removed) comes from parquet
        # FOOTER metadata, not a scan job: dropped directories contribute
        # their exact footer row counts; edge partitions contribute the
        # before/after footer diff around the rewrite (the rewrite
        # removes exactly the in-range rows, so the diff IS the count).
        # This is the "commit metadata, not a scan" story of the table
        # formats — and it removes one whole Spark job per delete.
        n_removed = 0
        for part in self._partitions(name):
            d = part[len("date="):]
            part_dir = os.path.join(path, part)
            if lo_d < d < hi_d:
                n_removed += _footer_rows(part_dir)
                shutil.rmtree(part_dir)
            elif d == lo_d or d == hi_d:
                before = _footer_rows(part_dir)
                self._rewrite_partition(
                    name, d,
                    lambda df: df.where(
                        ~((F.col("ts_ns") >= lo) & (F.col("ts_ns") <= hi))
                    ),
                )
                after = _footer_rows(part_dir)
                n_removed += before - after
        self._log_change(name, "delete", lo, hi, n_removed)
        if compact:
            self.compact(name)

    def _rewrite_partition(
        self, name: str, date: str, transform, target_bytes: int | None = None
    ) -> None:
        path = self._path(name)
        part_dir = os.path.join(path, f"date={date}")
        # Snapshot of the input file set, taken BEFORE the read lists the
        # directory. The single-writer contract (class docstring) says no
        # appends race this rewrite — but a violated contract must fail
        # LOUDLY, not silently drop the raced append when the old files
        # are removed without the rewrite having folded it in. The
        # pre-removal re-list is the cheap (listdir-only) detector, and
        # the removal itself is an ATOMIC os.rename of the partition dir
        # to a trash name: an append that races the removal lands either
        # in the renamed dir (detected post-rename, restored, raised) or
        # in a fresh part_dir (merged with the rewrite output — it
        # survives). Residual imprecision is only ever a FALSE POSITIVE:
        # a file landing between this snapshot and Spark's lazy listing
        # may be folded into the output yet still raise as raced; the
        # retried rewrite then folds it for real.
        seen = {
            f_ for f_ in os.listdir(part_dir) if f_.endswith(".parquet")
        }
        src_bytes = sum(
            os.path.getsize(os.path.join(part_dir, f_)) for f_ in seen
        )

        def _check_no_raced_append() -> None:
            raced = {
                f_
                for f_ in os.listdir(part_dir)
                if f_.endswith(".parquet")
            } - seen
            if raced:
                raise RuntimeError(
                    f"concurrent append(s) {sorted(raced)} landed in "
                    f"{part_dir} during a rewrite — single-writer "
                    "contract violated; partition left untouched, retry "
                    "the maintenance op"
                )

        def _remove_part_dir_atomically() -> None:
            # os.rename is atomic, so a raced append is never deleted:
            # it is either inside the renamed dir (found below, restored
            # to a fresh part_dir, and raised) or it re-created part_dir
            # after the rename (left in place; the caller's makedirs +
            # moves merge with it).
            trash = os.path.join(self.root, f".trash-{uuid.uuid4().hex}")
            os.rename(part_dir, trash)
            raced = {
                f_ for f_ in os.listdir(trash) if f_.endswith(".parquet")
            } - seen
            if raced:
                os.makedirs(part_dir, exist_ok=True)
                for f_ in os.listdir(trash):
                    shutil.move(
                        os.path.join(trash, f_), os.path.join(part_dir, f_)
                    )
                shutil.rmtree(trash, ignore_errors=True)
                raise RuntimeError(
                    f"concurrent append(s) {sorted(raced)} landed in "
                    f"{part_dir} during a rewrite — single-writer "
                    "contract violated; partition restored, retry the "
                    "maintenance op"
                )
            shutil.rmtree(trash)

        cur = self.spark.read.schema(DOC_SCHEMA).parquet(part_dir)
        new = transform(cur)
        if new.isEmpty():
            _check_no_raced_append()
            _remove_part_dir_atomically()
            return
        # Without a target, match the reference's single-file couch rewrite
        # (database.go:136-171). With one, split huge partitions into
        # ~target-sized, ts_ns-RANGE-partitioned files so every output file
        # covers a disjoint time slice (parquet min/max skipping stays as
        # sharp as the single-file layout). Source bytes bound output bytes
        # (compaction only drops rows), so the estimate errs toward
        # slightly smaller files — the safe side.
        n_out = 1
        if target_bytes:
            n_out = max(1, -(-src_bytes // target_bytes))
        out = (
            new.coalesce(1)
            if n_out == 1
            else new.repartitionByRange(n_out, "ts_ns")
        )
        tmp = os.path.join(self.root, f".tmp-{uuid.uuid4().hex}")
        out.write.mode("overwrite").parquet(tmp)
        try:
            _check_no_raced_append()
            _remove_part_dir_atomically()
        except Exception:
            # Don't leak the staged output when the race detector fires
            # (or the removal fails) — the retry writes a fresh tmp.
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        os.makedirs(part_dir, exist_ok=True)
        for f_ in os.listdir(tmp):
            if f_.endswith(".parquet"):
                shutil.move(os.path.join(tmp, f_), os.path.join(part_dir, f_))
        shutil.rmtree(tmp, ignore_errors=True)

    def compact(
        self,
        name: str,
        target_file_bytes: int | None = None,
        fold_changelog: bool = True,
    ) -> None:
        """Merge each partition's files and fold superseded versions of a
        key into the survivor (S7: couch-file rewrite ≙ OPTIMIZE; also
        reclaims overwritten docs the way couchstore compaction drops old
        revisions). Default: one file per partition (reference parity).
        ``target_file_bytes`` splits huge partitions into ~target-sized,
        time-range-ordered files instead — at 100 TB a day can be far
        bigger than one sane parquet file.

        ``fold_changelog=False`` skips the commit-log fold — use it when
        a lagging :meth:`changes_log_stream` consumer may not have
        caught up to the current log tail yet (the fold rewrites the
        newest segment in place, which a file stream never re-reads)."""
        for part in self._partitions(name):
            d = part[len("date="):]
            self._rewrite_partition(
                name,
                d,
                lambda df: latest_by_key(df, ["ts_ns"], "seq"),
                target_bytes=target_file_bytes,
            )
        if self.changelog:
            # Fold the accumulated one-file-per-commit log segments into
            # a single consolidated segment BEFORE recording this
            # compaction (which then lands as a fresh segment). The log
            # grows one tiny file per mutation; without folding, both
            # change_log reads and the first-touch seq listing degrade
            # with mutation count.
            if fold_changelog:
                self._fold_changelog(name)
            # Post-compaction the physical rows ARE the live set (the
            # LWW fold just ran); the count comes straight from the
            # freshly-written parquet footers — no job.
            n_live = sum(
                _footer_rows(os.path.join(self._path(name), p))
                for p in self._partitions(name)
            )
            self._log_change(name, "compact", None, None, n_live)

    def _fold_changelog(self, name: str) -> None:
        """Merge every commit-log segment into one file named with the
        max folded seq (so first-touch seq recovery still reads the
        floor from file names, and the batch ``change_log`` view is
        byte-identical — rows carry their seq; order comes from the
        sort, not the file split). Driver-side pyarrow, like the writes:
        the whole log is metadata-sized.

        Streaming caveat (same in-place-maintenance story as the data
        partitions): the consolidated file REUSES the newest segment's
        path, which an up-to-date ``changes_log_stream`` has already
        seen — nothing is re-delivered to it, and a stream started
        after the fold reads the full consolidated history exactly
        once. A stream LAGGING behind the fold point can miss folded
        segments; fold during maintenance windows, as with any
        file-source compaction."""
        d = os.path.join(self._path(name), _CHANGELOG_DIR)
        if not os.path.isdir(d):
            return
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        if len(files) <= 1:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        merged = pa.concat_tables(
            [pq.read_table(os.path.join(d, f)) for f in files]
        ).sort_by("seq")
        # A crash between the replace and the removals leaves old
        # segments whose rows the consolidated file ALSO holds — rows
        # carry their seq, so readers dedupe; dedupe here too so a
        # re-fold after such a crash stays idempotent.
        seqs = merged.column("seq").to_pylist()
        keep = [i for i, s in enumerate(seqs) if i == 0 or s != seqs[i - 1]]
        if len(keep) != len(seqs):
            merged = merged.take(keep)
        tmp = os.path.join(d, "_fold.tmp")
        pq.write_table(merged, tmp)
        # Crash-safety order: install the consolidated file FIRST (the
        # atomic os.replace), THEN remove the folded segments. A crash
        # in between duplicates rows (recoverable — see above); the old
        # remove-first order lost the whole history if the replace
        # never ran (merged rows stranded in _fold.tmp, which no
        # reader picks up).
        os.replace(tmp, os.path.join(d, files[-1]))
        for f in files[:-1]:
            os.remove(os.path.join(d, f))

    def info(self, name: str) -> dict:
        """S9: doc_count (live keys), space_used, partition/file counts.

        ``doc_count`` runs the LWW dedup (exact live keys — what the
        reference reports from the couchstore header). At cluster scale
        prefer a table format whose snapshot carries row counts, or the
        continuous rollup's cnt partials (plans/rollup.py), and treat
        this as the slow exact path."""
        path = self._path(name)
        n_files = space = 0
        for dirpath, dirnames, files in os.walk(path):
            # Hidden dirs (the .changelog commit log) are metadata, not
            # data — excluded from space/file accounting like Spark's
            # readers exclude them.
            dirnames[:] = [d for d in dirnames if not d.startswith(".")]
            for f_ in files:
                if f_.endswith(".parquet"):
                    n_files += 1
                    space += os.path.getsize(os.path.join(dirpath, f_))
        return {
            "db_name": name,
            "doc_count": self.df(name).count(),
            "space_used": space,
            "n_partitions": len(self._partitions(name)),
            "n_files": n_files,
        }

    # -- Changes feed (S13) -------------------------------------------------

    def changes(self, name: str) -> DataFrame:
        """Streaming DataFrame of appended documents (the feed the
        reference never implemented — 501 at handlers.go:455-457): new
        parquet files in the db directory become micro-batches.

        CONTRACT — append-only. The parquet file source tracks files, not
        rows, so the feed surfaces INSERTS and UPSERT revisions (each
        write_batch lands as new files) but NOT the effects of
        ``delete_range``/``compact``, which rewrite or remove
        already-seen files; a rewritten edge partition is seen AGAIN as
        a whole (the new file), so consumers must apply the same LWW
        collapse the batch reader uses, and deletes are only observable
        as the absence of keys on a fresh batch read. Pinned by
        tests/test_db.py::test_changes_feed_is_append_only. For deletes
        and compaction as FIRST-CLASS change rows, stream the commit log
        instead (:meth:`changes_log_stream` — the log-backed feed this
        docstring used to defer to a table format)."""
        return (
            self.spark.readStream.schema(DOC_SCHEMA + ", date date")
            .option("basePath", self._path(name))
            # Per-source (NOT session-wide): this feed races in-place
            # maintenance — delete_range/compact may remove a file the
            # FileStreamSource already listed. Skipping the vanished
            # file yields pre-delete or post-delete state, never a
            # crash; batch reads elsewhere stay fail-fast.
            .option("ignoreMissingFiles", "true")
            .parquet(self._path(name))
        )

    def changes_log_stream(
        self,
        name: str,
        exactly_once: bool = False,
        dedup_within: str | None = None,
    ) -> DataFrame:
        """Streaming view of the commit log: one row per mutating commit
        (write/delete/compact), delivered incrementally. Unlike
        :meth:`changes`, this feed DOES surface deletes and compaction —
        mutations only ever ADD log segments. This is the
        Delta-CDF-shaped feed built on the plain-parquet layout.

        CONTRACT — append-only EXCEPT during :meth:`compact`'s changelog
        fold, which consolidates the accumulated segments into one file
        (reusing the newest segment's path) and removes the rest. To a
        stream that is CAUGHT UP at fold time this is invisible (every
        folded row was already delivered, and the reused path is never
        re-read). A stream LAGGING behind the fold point skips the
        removed segments without crashing (``ignoreMissingFiles`` below)
        but can MISS their rows; a stream started after the fold reads
        the consolidated history exactly once. After a mid-fold crash,
        rows stranded in both the consolidated file and an old segment
        are delivered twice — exactly-once consumers should key on
        ``seq`` (the batch :meth:`change_log` view dedupes for you, and
        ``exactly_once=True`` dedupes the stream in-flight). Fold during
        maintenance windows, or pass
        ``compact(name, fold_changelog=False)`` while laggards drain —
        the same discipline as any file-source compaction.

        How the duplicates arise (pinned by
        tests/test_crash_recovery.py): a RESTARTED lagging stream has
        not seen the consolidated file's (reused) path, reads it whole,
        and re-delivers rows it already saw as per-commit segments;
        after a mid-fold crash the same rows sit in BOTH the
        consolidated file and the not-yet-removed old segments. Either
        way the failure mode is duplicate delivery, never silent loss —
        loss needs the narrower race where a planned-but-unexecuted
        micro-batch spans segments the fold removes mid-flight
        (``ignoreMissingFiles`` then skips them), which is exactly what
        ``fold_changelog=False`` exists to rule out.

        ``exactly_once=True`` wraps the feed in a streaming
        ``dropDuplicates(["seq"])``. The dedup state is unbounded by
        watermark but bounded by reality: one tiny row per COMMIT (the
        log is metadata-sized by construction — far below any data
        plane, the same budget as the log itself). For a LONG-LIVED
        stream even metadata-sized state grows without bound, so
        ``dedup_within`` (e.g. ``"7 days"``) switches to
        ``dropDuplicatesWithinWatermark`` keyed on the commit's
        event time (``seq`` IS a nanosecond epoch timestamp — see
        ``_log_change``), capping state to commits younger than the
        horizon. The trade: a duplicate re-delivered MORE than
        ``dedup_within`` after the original commit (a consumer
        restarting onto the consolidated file long after a fold) passes
        through — size the horizon to your restart cadence, or restart
        the query (fresh checkpoint) to re-bound plain
        ``exactly_once`` state instead."""
        path = self._path(name)
        if not os.path.isdir(path):
            raise KeyError(f"no such db: {name}")
        s = (
            self.spark.readStream.schema(CHANGELOG_SCHEMA)
            # Per-source, like .changes: a lagging stream races the
            # fold's segment removals; skipping a vanished file yields
            # the fold-time view, never a crash.
            .option("ignoreMissingFiles", "true")
            .parquet(os.path.join(path, _CHANGELOG_DIR))
        )
        if dedup_within is not None:
            return (
                s.withColumn(
                    # Integer division: seq is a NANOSECOND epoch long
                    # (~2^60); float `/` would round it through a 53-bit
                    # mantissa (~200 ns loss) before the cast.
                    "__commit_ts",
                    F.timestamp_micros(F.expr("seq div 1000")),
                )
                .withWatermark("__commit_ts", dedup_within)
                .dropDuplicatesWithinWatermark(["seq"])
                .drop("__commit_ts")
            )
        return s.dropDuplicates(["seq"]) if exactly_once else s

    # -- Query (the §3.1 analytical path) -----------------------------------

    def query(
        self, name: str, q: SerieslyQuery, exact_sums: bool = False
    ) -> DataFrame:
        """The `GET /db/_query` equivalent over the live LWW view."""
        src = self.df(name, q.from_ts, q.to_ts)
        return seriesly_query(
            src, q, doc_col="doc", ts_ns_col="ts_ns", exact_sums=exact_sums
        )


def _ns_date(ns: int) -> str:
    return datetime.fromtimestamp(ns / 1e9, tz=timezone.utc).strftime("%Y-%m-%d")
