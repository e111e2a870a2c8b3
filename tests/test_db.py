"""End-to-end tests for the SerieslyDB operational surface (SURVEY §2.1):
DDL, keyed upsert with LWW reads, range reads + limit, bulk range delete
with partition-drop semantics, compaction, info, changes feed, and the
analytical query path over a written database.
"""

import json

import pytest
from pyspark.sql import functions as F

from seriesly_spark.db import SerieslyDB
from seriesly_spark.plans.query import SerieslyQuery


@pytest.fixture()
def dbs(spark, tmp_path):
    return SerieslyDB(spark, str(tmp_path / "dbroot"))


def _doc(k):
    return json.dumps({"k": k})


class TestDdl:
    def test_create_list_drop(self, dbs):
        assert dbs.list() == []
        dbs.create("a")
        dbs.create("b")
        assert dbs.list() == ["a", "b"]
        dbs.drop("a")
        assert dbs.list() == ["b"]
        assert dbs.exists("b") and not dbs.exists("a")

    def test_invalid_names(self, dbs):
        for bad in ("", ".hidden", "x/y"):
            with pytest.raises(ValueError):
                dbs.create(bad)

    def test_write_to_missing_db(self, dbs):
        with pytest.raises(KeyError):
            dbs.write("nope", _doc(1))


class TestIngestAndRead:
    def test_write_get_roundtrip(self, dbs):
        dbs.create("t")
        k = dbs.write("t", _doc(7), ts="2024-01-02T03:04:05Z")
        assert k == 1_704_164_645_000_000_000
        assert json.loads(dbs.get("t", "2024-01-02T03:04:05Z")) == {"k": 7}
        assert dbs.get("t", "2024-01-02T03:04:06Z") is None

    def test_same_key_overwrites(self, dbs):
        dbs.create("t")
        dbs.write("t", _doc(1), ts="2024-01-02T00:00:00Z")
        dbs.write("t", _doc(2), ts="2024-01-02T00:00:00Z")
        assert json.loads(dbs.get("t", "2024-01-02T00:00:00Z")) == {"k": 2}
        assert dbs.df("t").count() == 1  # one live key

    def test_server_assigned_key(self, dbs):
        dbs.create("t")
        k = dbs.write("t", _doc(1))
        assert isinstance(k, int) and k > 1_700_000_000_000_000_000

    def test_all_docs_order_and_limit(self, dbs):
        dbs.create("t")
        dbs.write_batch(
            "t",
            [(f"2024-01-0{d}T00:00:00Z", _doc(d)) for d in (3, 1, 2)],
        )
        rows = dbs.all_docs("t").collect()
        assert [json.loads(r.doc)["k"] for r in rows] == [1, 2, 3]
        assert rows[0].key == "2024-01-01T00:00:00Z"
        assert dbs.all_docs("t", limit=2).count() == 2
        rng = dbs.all_docs("t", from_ts="2024-01-02", to_ts="2024-01-03").collect()
        assert [json.loads(r.doc)["k"] for r in rng] == [2, 3]

    def test_dump_lines(self, dbs):
        dbs.create("t")
        dbs.write("t", '{"a": 1}', ts="2024-01-01T00:00:00Z")
        assert dbs.dump_lines("t") == ['{"2024-01-01T00:00:00Z": {"a": 1}}']

    def test_empty_db_reads(self, dbs):
        dbs.create("t")
        assert dbs.df("t").count() == 0
        assert dbs.all_docs("t").count() == 0

    def test_dump_files_matches_dump_lines(self, dbs, tmp_path):
        dbs.create("t")
        dbs.write_batch(
            "t",
            [
                (f"2024-01-{d:02d}T{h:02d}:00:00Z", _doc(d * 100 + h))
                for d in (1, 2, 3)
                for h in (0, 6, 12)
            ],
        )
        dbs.write("t", _doc(999), ts="2024-01-02T06:00:00Z")  # overwrite
        out = str(tmp_path / "dump_out")
        n = dbs.dump_files(
            "t", out, from_ts="2024-01-01", to_ts="2024-01-02T12:00:00Z"
        )
        expected = dbs.dump_lines(
            "t", from_ts="2024-01-01", to_ts="2024-01-02T12:00:00Z"
        )
        assert n == len(expected)
        # part files are range-partitioned by the sort: reading them back
        # in part order reproduces the streamed dump exactly
        import glob

        lines = []
        for part in sorted(glob.glob(f"{out}/part-*")):
            with open(part) as fh:
                lines.extend(fh.read().splitlines())
        assert lines == expected
        assert '{"2024-01-02T06:00:00Z": {"k": 999}}' in lines  # LWW survivor


class TestMaintenance:
    def _seed_days(self, dbs, days):
        dbs.create("t")
        dbs.write_batch(
            "t",
            [
                (f"2024-01-{d:02d}T{h:02d}:00:00Z", _doc(d * 100 + h))
                for d in days
                for h in (0, 12)
            ],
        )

    def test_delete_range_drops_and_trims(self, dbs):
        self._seed_days(dbs, [1, 2, 3, 4])
        # range covers all of day 2-3 plus the first write of day 4
        dbs.delete_range("t", "2024-01-02", "2024-01-04T00:00:00Z")
        left = sorted(
            json.loads(r.doc)["k"] for r in dbs.df("t").select("doc").collect()
        )
        assert left == [100, 112, 412]
        # fully-covered partitions are gone as directories
        assert dbs.info("t")["n_partitions"] == 2

    def test_compact_merges_and_reclaims(self, dbs):
        dbs.create("t")
        for i in range(5):
            dbs.write("t", _doc(i), ts="2024-01-01T00:00:00Z")  # 5 versions
        info0 = dbs.info("t")
        assert info0["n_files"] == 5 and info0["doc_count"] == 1
        dbs.compact("t")
        info1 = dbs.info("t")
        assert info1["n_files"] == 1 and info1["doc_count"] == 1
        assert json.loads(dbs.get("t", "2024-01-01T00:00:00Z")) == {"k": 4}

    def test_info_counts(self, dbs):
        self._seed_days(dbs, [1, 2])
        info = dbs.info("t")
        assert info["doc_count"] == 4
        assert info["n_partitions"] == 2
        assert info["space_used"] > 0


class TestChangesFeed:
    def test_stream_sees_appends(self, dbs):
        dbs.create("t")
        dbs.write("t", _doc(1), ts="2024-01-01T00:00:00Z")
        q = (
            dbs.changes("t")
            .writeStream.format("memory")
            .queryName("t_changes")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n0 = dbs.spark.table("t_changes").count()
            dbs.write("t", _doc(2), ts="2024-01-01T01:00:00Z")
            q.processAllAvailable()
            n1 = dbs.spark.table("t_changes").count()
        finally:
            q.stop()
        assert (n0, n1) == (1, 2)

    def test_changes_feed_is_append_only(self, dbs):
        """Pin the documented contract (db.changes): the feed surfaces
        appends only. A delete that drops a whole partition produces NO
        change rows (observable only on a fresh batch read); a delete
        that rewrites an edge partition re-emits the rewritten file as
        a whole (consumers re-apply the LWW collapse)."""
        dbs.create("t")
        dbs.write("t", _doc(1), ts="2024-01-01T00:00:00Z")
        dbs.write("t", _doc(3), ts="2024-01-03T00:00:00Z")
        dbs.write("t", _doc(5), ts="2024-01-05T00:00:00Z")
        q = (
            dbs.changes("t")
            .writeStream.format("memory")
            .queryName("t_changes_ao")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            n0 = dbs.spark.table("t_changes_ao").count()
            # Bounds on partition-free dates: 01-03 is dropped whole,
            # nothing is rewritten — the feed must stay silent.
            dbs.delete_range(
                "t", "2024-01-02T00:00:00Z", "2024-01-04T00:00:00Z"
            )
            q.processAllAvailable()
            n1 = dbs.spark.table("t_changes_ao").count()
            # Bound inside the 01-05 partition: edge rewrite — the
            # surviving file is seen AGAIN (here: its one kept row).
            dbs.delete_range(
                "t", "2024-01-05T12:00:00Z", "2024-01-06T00:00:00Z"
            )
            q.processAllAvailable()
            n2 = dbs.spark.table("t_changes_ao").count()
        finally:
            q.stop()
        assert (n0, n1) == (3, 3)  # partition drop emitted nothing
        assert n2 == 4  # edge rewrite re-emitted the surviving row
        assert dbs.df("t").count() == 2  # batch view shows the delete


class TestQueryPath:
    def test_query_over_written_db(self, dbs):
        dbs.create("t")
        dbs.write_batch(
            "t",
            [
                ("2024-01-01T00:00:10Z", '{"v": "1"}'),
                ("2024-01-01T00:00:20Z", '{"v": 2}'),
                ("2024-01-02T00:00:10Z", '{"v": 30, "x": 1}'),
            ],
        )
        q = SerieslyQuery(
            group_ms=86_400_000,
            fields=[("/v", "count"), ("/v", "sum"), ("/v", "max")],
            aliases=["cnt", "sum_v", "max_v"],
        )
        rows = dbs.query("t", q).collect()
        assert [(r.cnt, r.sum_v, r.max_v) for r in rows] == [
            (2, 3.0, 2.0),
            (1, 30.0, 30.0),
        ]

    def test_query_respects_lww(self, dbs):
        dbs.create("t")
        dbs.write("t", '{"v": 100}', ts="2024-01-01T00:00:00Z")
        dbs.write("t", '{"v": 1}', ts="2024-01-01T00:00:00Z")
        q = SerieslyQuery(group_ms=86_400_000, fields=[("/v", "sum")], aliases=["s"])
        assert dbs.query("t", q).collect()[0].s == 1.0


class TestCompactTargetSize:
    def test_target_splits_partition_into_ranged_files(self, spark, tmp_path):
        from seriesly_spark.db import SerieslyDB

        dbs = SerieslyDB(spark, str(tmp_path))
        dbs.create("t")
        day = 86_400_000_000_000
        docs = [(day + i * 1_000_000_000, '{"k": %d}' % i) for i in range(200)]
        # several small files
        for i in range(0, 200, 50):
            dbs.write_batch("t", docs[i : i + 50])
        before = dbs.info("t")
        dbs.compact("t", target_file_bytes=2000)
        after = dbs.info("t")
        assert after["doc_count"] == before["doc_count"] == 200
        assert after["n_files"] > 1  # split, not coalesced to one
        # files cover disjoint, ordered ts ranges (range partitioning)
        import pyarrow.parquet as pq
        import glob, os
        ranges = []
        for f in glob.glob(os.path.join(str(tmp_path), "t", "date=*", "*.parquet")):
            t = pq.read_table(f, columns=["ts_ns"])["ts_ns"].to_pylist()
            ranges.append((min(t), max(t)))
        ranges.sort()
        for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
            assert hi1 < lo2

    def test_default_stays_single_file(self, spark, tmp_path):
        from seriesly_spark.db import SerieslyDB

        dbs = SerieslyDB(spark, str(tmp_path))
        dbs.create("t")
        day = 86_400_000_000_000
        dbs.write_batch("t", [(day + i * 1_000_000_000, "{}") for i in range(20)])
        dbs.write_batch("t", [(day + (20 + i) * 1_000_000_000, "{}") for i in range(20)])
        dbs.compact("t")
        assert dbs.info("t")["n_files"] == 1


class TestChangeLog:
    # Raw-ns keys (ints above 2_147_483_647_000 pass through ParseTime
    # untouched — smaller ints mean seconds/ms/bare-year per reference
    # timelib semantics).
    NS = 1_700_000_000_000_000_000

    def k(self, i):
        return self.NS + i * 1_000_000_000

    def test_log_records_all_mutations_in_order(self, dbs):
        dbs.create("cl")
        dbs.write_batch("cl", [(self.k(i), _doc(i)) for i in range(4)])
        dbs.write_batch("cl", [(self.k(9), _doc(9))])
        dbs.delete_range("cl", self.k(1), self.k(2))
        dbs.compact("cl")
        rows = dbs.change_log("cl").collect()
        assert [(r.op, r.n_rows) for r in rows] == [
            ("write", 4), ("write", 1), ("delete", 2), ("compact", 3),
        ]
        assert [r.seq for r in rows] == sorted(r.seq for r in rows)
        # write ops carry their key range
        assert (rows[0].ts_lo_ns, rows[0].ts_hi_ns) == (self.k(0), self.k(3))
        assert (rows[2].ts_lo_ns, rows[2].ts_hi_ns) == (self.k(1), self.k(2))

    def test_delete_counts_raw_rows_including_revisions(self, dbs):
        dbs.create("cl")
        dbs.write_batch("cl", [(self.k(5), _doc(1))])
        dbs.write_batch("cl", [(self.k(5), _doc(2))])  # second revision
        dbs.delete_range("cl", self.k(5), self.k(5))
        ops = [(r.op, r.n_rows) for r in dbs.change_log("cl").collect()]
        assert ops[-1] == ("delete", 2)  # both physical revisions removed

    def test_stream_surfaces_deletes_and_compaction(self, dbs, spark):
        import uuid as _uuid

        dbs.create("cl")
        qname = f"cl_stream_{_uuid.uuid4().hex[:8]}"
        stream = (
            dbs.changes_log_stream("cl")
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .start()
        )
        try:
            dbs.write_batch("cl", [(self.k(i), _doc(i)) for i in range(3)])
            stream.processAllAvailable()
            n1 = spark.sql(f"SELECT count(*) n FROM {qname}").first().n
            dbs.delete_range("cl", self.k(0), self.k(0))
            dbs.compact("cl")
            stream.processAllAvailable()
            got = spark.sql(
                f"SELECT op, n_rows FROM {qname} ORDER BY seq"
            ).collect()
        finally:
            stream.stop()
        assert n1 == 1
        assert [(r.op, r.n_rows) for r in got] == [
            ("write", 3), ("delete", 1), ("compact", 2),
        ]

    def test_same_ns_mutations_get_distinct_monotone_seqs(self, dbs, monkeypatch):
        """Two mutations landing in the SAME nanosecond (or a clock
        step-back) must still produce strictly increasing seqs — the
        log's file names are its commit order."""
        import seriesly_spark.db as dbmod

        dbs.create("cl")
        frozen = self.NS  # freeze the clock: every call same ns
        monkeypatch.setattr(dbmod.time, "time_ns", lambda: frozen)
        dbs.write_batch("cl", [(self.k(1), _doc(1))])
        dbs.write_batch("cl", [(self.k(2), _doc(2))])
        # clock steps BACKWARDS past both commits
        monkeypatch.setattr(dbmod.time, "time_ns", lambda: frozen - 10**9)
        dbs.delete_range("cl", self.k(1), self.k(1))
        rows = dbs.change_log("cl").collect()
        seqs = [r.seq for r in rows]
        assert len(seqs) == 3
        assert len(set(seqs)) == 3
        assert seqs == sorted(seqs)
        assert [r.op for r in rows] == ["write", "write", "delete"]

    def test_changelog_opt_out(self, spark, tmp_path):
        dbs = SerieslyDB(spark, str(tmp_path / "nolog"), changelog=False)
        dbs.create("x")
        dbs.write_batch("x", [(self.k(1), _doc(1))])
        dbs.delete_range("x", self.k(1), self.k(1))
        assert dbs.change_log("x").count() == 0

    def test_log_invisible_to_data_paths(self, dbs):
        dbs.create("cl")
        dbs.write_batch("cl", [(self.k(i), _doc(i)) for i in range(3)])
        dbs.compact("cl")
        info = dbs.info("cl")
        # one data partition, one data file — log segments excluded
        assert info["n_partitions"] == 1 and info["n_files"] == 1
        assert info["doc_count"] == 3
        assert dbs.df("cl").count() == 3
