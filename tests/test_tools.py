"""CLI tools (S15/S16) + gzip dump sink (S12): dump/load round trip with
and without gzip, the load tool's min-time filter, compact/info over all
databases, and the poll-copy source with both an injected fetcher and a
real file:// URL through urllib.
"""

import glob
import gzip
import json

import pytest

from seriesly_spark import tools
from seriesly_spark.db import SerieslyDB


@pytest.fixture()
def dbs(spark, tmp_path):
    return SerieslyDB(spark, str(tmp_path / "dbroot"))


def _seed(dbs, name, days=3):
    dbs.create(name)
    dbs.write_batch(
        name,
        [
            (f"2024-01-{d:02d}T{h:02d}:00:00Z", '{"k": %d}' % (d * 100 + h))
            for d in range(1, days + 1)
            for h in (0, 12)
        ],
    )


class TestDumpLoad:
    def test_gzip_roundtrip_preserves_bytes(self, dbs, tmp_path):
        _seed(dbs, "src")
        out = str(tmp_path / "backup")
        counts = tools.dump(dbs, out, compression="gzip")
        assert counts == {"src": 6}
        parts = glob.glob(f"{out}/src/part-*.txt.gz")
        assert parts, "expected gzip part files"
        with gzip.open(parts[0], "rt") as fh:
            assert fh.readline().startswith('{"2024-01-')

        dbs.create("dst")
        n = tools.load_dump_dir(dbs, "dst", f"{out}/src")
        assert n == 6
        assert dbs.dump_lines("dst") == dbs.dump_lines("src")

    def test_plain_dump_and_min_ts_filter(self, dbs, tmp_path):
        _seed(dbs, "src")
        out = str(tmp_path / "plain")
        tools.dump(dbs, out, names=["src"], compression=None)
        dbs.create("dst")
        n = tools.load_dump_dir(dbs, "dst", f"{out}/src", min_ts="2024-01-02")
        assert n == 4  # two 2024-01-01 docs skipped
        keys = [r.key for r in dbs.all_docs("dst").collect()]
        assert min(keys) == "2024-01-02T00:00:00Z"

    def test_load_lines_preserves_doc_bytes(self, dbs):
        dbs.create("t")
        line = '{"2024-01-01T00:00:00Z": {"a":1,  "weird":   "spacing"}}'
        assert tools.load_lines(dbs, "t", [line, ""]) == 1
        assert dbs.dump_lines("t") == [line]


class TestCompactInfo:
    def test_compact_all_and_info(self, dbs):
        _seed(dbs, "a", days=1)
        _seed(dbs, "b", days=1)
        for _ in range(3):  # overwrites -> multiple files
            dbs.write("a", '{"k": 9}', ts="2024-01-01T00:00:00Z")
        assert dbs.info("a")["n_files"] > dbs.info("a")["n_partitions"]
        assert tools.compact(dbs) == ["a", "b"]
        ia = tools.info(dbs)["a"]
        assert ia["n_files"] == ia["n_partitions"]
        assert ia["doc_count"] == 2
        assert json.loads(dbs.get("a", "2024-01-01T00:00:00Z")) == {"k": 9}


class TestPollCopy:
    def test_injected_fetch(self, dbs):
        dbs.create("t")
        bodies = iter([b'{"v": 1}', b'{"v": 2}'])
        clock = iter([1_700_000_000.0, 1_700_000_001.0])
        keys = tools.poll_copy(
            dbs, "fake://x", "t", rounds=2,
            fetch=lambda url: next(bodies), clock=lambda: next(clock),
        )
        assert keys == [1_700_000_000_000_000_000, 1_700_000_001_000_000_000]
        docs = [json.loads(r.doc) for r in dbs.all_docs("t").collect()]
        assert docs == [{"v": 1}, {"v": 2}]

    def test_file_url_via_urllib(self, dbs, tmp_path):
        src = tmp_path / "payload.json"
        src.write_text('{"sampled": true}')
        dbs.create("t")
        keys = tools.poll_copy(dbs, src.as_uri(), "t", rounds=1)
        assert len(keys) == 1
        assert json.loads(dbs.get("t", keys[0])) == {"sampled": True}
