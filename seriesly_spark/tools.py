"""Operational CLI tools over the engine (S15/S16) — the Spark-side
analogues of the reference's client utilities:

  * ``dump``    ≙ tools/dump/dump.go:52-115 (per-db gzip NDJSON backups,
    all databases by default, optional key range)
  * ``load``    ≙ tools/load/load.go:51-101 (NDJSON '{"<key>": <doc>}'
    stream -> keyed writes, optional min-time filter, batched commits)
  * ``compact`` ≙ tools/compact/compact.go:33-76 (one/all databases)
  * ``info``    ≙ tools/serieslyinfo/serieslyinfo.go:72-135
  * ``poll``    ≙ tools/sample/sample.go:56-104 (poll-copy source:
    periodically fetch a URL and store the body as a now-keyed document)

The reference tools speak to seriesly over HTTP; here the "server" is the
database root directory, so the tools drive :class:`SerieslyDB` directly.
``poll`` fetches with ``urllib`` (http/https/file URLs) — the fetch is
injectable for tests and for environments without network access.

Usage: ``python -m seriesly_spark.tools <cmd> --root <dbroot> ...``
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import time
from typing import Callable, Iterable, Iterator

from seriesly_spark.db import SerieslyDB
from seriesly_spark.plans.query import py_parse_ts_ns

LOAD_BATCH = 1000  # reference write-queue flush size (database.go:41)


# -- dump (S10/S11/S12/S16) -------------------------------------------------

def dump(
    dbs: SerieslyDB,
    out_dir: str,
    names: list[str] | None = None,
    from_ts=None,
    to_ts=None,
    compression: str | None = "gzip",
) -> dict[str, int]:
    """Dump each database (all when ``names`` is None, like the reference
    tool's List() fallback) to ``<out_dir>/<db>/`` as NDJSON part files,
    gzip-compressed by default (tools/dump/dump.go:45-76)."""
    targets = names if names is not None else dbs.list()
    counts: dict[str, int] = {}
    for name in targets:
        counts[name] = dbs.dump_files(
            name, f"{out_dir}/{name}", from_ts, to_ts, compression=compression
        )
    return counts


# -- load (S16) -------------------------------------------------------------

def _iter_dump_lines(paths: Iterable[str]) -> Iterator[str]:
    for p in paths:
        opener = gzip.open if p.endswith(".gz") else open
        with opener(p, "rt", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield line


def _parse_dump_line(line: str) -> tuple[str, str]:
    """'{"<key>": <doc>}' -> (key, raw doc text). Dump keys are canonical
    RFC3339 (never contain quotes), so slicing keeps the document bytes
    identical — the reference load's json.RawMessage behavior
    (tools/load/load.go:71-91)."""
    if line.startswith('{"'):
        end = line.find('": ', 2)
        if end > 0 and line.endswith("}"):
            return line[2:end], line[end + 3 : -1]
    # Non-canonical producer: fall back to a real JSON parse (re-renders).
    ((key, doc),) = json.loads(line).items()
    return key, json.dumps(doc, separators=(", ", ": "))


def load_lines(
    dbs: SerieslyDB,
    name: str,
    lines: Iterable[str],
    min_ts=None,
    batch: int = LOAD_BATCH,
) -> int:
    """Load NDJSON '{"<key>": <doc>}' lines into ``name`` with their
    original keys, skipping keys before ``min_ts`` (the reference load
    tool's -minTime filter, tools/load/load.go:43-49,83-89). Writes are
    committed in batches of ``batch`` (the reference's write-queue flush,
    database.go:175-254)."""
    min_ns = py_parse_ts_ns(min_ts) if min_ts is not None else None
    pending: list[tuple[int, str]] = []
    n = 0
    for line in lines:
        line = line.strip()
        if not line:
            continue
        key, doc = _parse_dump_line(line)
        ns = py_parse_ts_ns(key)
        if min_ns is not None and ns < min_ns:
            continue
        pending.append((ns, doc))
        n += 1
        if len(pending) >= batch:
            dbs.write_batch(name, pending)
            pending = []
    if pending:
        dbs.write_batch(name, pending)
    return n


def load_dump_dir(
    dbs: SerieslyDB, name: str, dump_dir: str, min_ts=None
) -> int:
    """Load a :func:`dump` output directory (part files, optionally .gz)
    back into a database — the 'gzip -dc backup.gz | load' round trip."""
    parts = sorted(
        glob.glob(f"{dump_dir}/part-*.txt") + glob.glob(f"{dump_dir}/part-*.txt.gz")
        + glob.glob(f"{dump_dir}/part-*[0-9]")
    )
    return load_lines(dbs, name, _iter_dump_lines(parts), min_ts=min_ts)


# -- compact / info (S7/S9/S16) --------------------------------------------

def compact(dbs: SerieslyDB, names: list[str] | None = None) -> list[str]:
    """Compact one or all databases (tools/compact/compact.go:45-76)."""
    targets = names if names is not None else dbs.list()
    for name in targets:
        dbs.compact(name)
    return targets


def info(dbs: SerieslyDB, names: list[str] | None = None) -> dict[str, dict]:
    targets = names if names is not None else dbs.list()
    return {name: dbs.info(name) for name in targets}


# -- poll-copy source (S15) -------------------------------------------------

def _default_fetch(url: str) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url) as resp:  # http/https/file URLs
        return resp.read()


def poll_copy(
    dbs: SerieslyDB,
    from_url: str,
    name: str,
    rounds: int = 1,
    poll_freq_s: float = 0.0,
    fetch: Callable[[str], bytes] | None = None,
    clock: Callable[[], float] | None = None,
) -> list[int]:
    """Poll-copy source (reference tools/sample/sample.go:56-104): fetch
    ``from_url`` and store the body as a document keyed at fetch time;
    repeat ``rounds`` times every ``poll_freq_s`` (the reference loops on
    time.Tick when -pollfreq is set). Returns the assigned ns keys.
    ``fetch`` is injectable (tests / offline environments)."""
    fetch = fetch or _default_fetch
    keys: list[int] = []
    for i in range(rounds):
        if i > 0 and poll_freq_s > 0:
            time.sleep(poll_freq_s)
        body = fetch(from_url).decode("utf-8")
        ts = None if clock is None else int(clock() * 1e9)
        keys.append(dbs.write(name, body, ts=ts))
    return keys


# -- CLI --------------------------------------------------------------------

def _get_spark():
    from seriesly_spark.session import get_spark

    return get_spark("seriesly-tools")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="seriesly_spark.tools")
    p.add_argument("--root", required=True, help="database root directory")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump")
    d.add_argument("--out", required=True)
    d.add_argument("--db", action="append", default=None)
    d.add_argument("--from-ts", dest="from_ts", default=None)
    d.add_argument("--to-ts", dest="to_ts", default=None)
    d.add_argument("--no-gzip", action="store_true")

    ld = sub.add_parser("load")
    ld.add_argument("--db", required=True)
    ld.add_argument("--in", dest="in_dir", required=True,
                    help="dump output directory (or - for stdin lines)")
    ld.add_argument("--min-ts", dest="min_ts", default=None)

    c = sub.add_parser("compact")
    c.add_argument("--db", action="append", default=None)

    i = sub.add_parser("info")
    i.add_argument("--db", action="append", default=None)

    pl = sub.add_parser("poll")
    pl.add_argument("--db", required=True)
    pl.add_argument("--from-url", required=True)
    pl.add_argument("--rounds", type=int, default=1)
    pl.add_argument("--poll-freq", type=float, default=0.0)

    args = p.parse_args(argv)
    dbs = SerieslyDB(_get_spark(), args.root)
    if args.cmd == "dump":
        out = dump(dbs, args.out, args.db, args.from_ts, args.to_ts,
                   compression=None if args.no_gzip else "gzip")
    elif args.cmd == "load":
        if not dbs.exists(args.db):
            dbs.create(args.db)
        if args.in_dir == "-":
            out = load_lines(dbs, args.db, sys.stdin, min_ts=args.min_ts)
        else:
            out = load_dump_dir(dbs, args.db, args.in_dir, min_ts=args.min_ts)
    elif args.cmd == "compact":
        out = compact(dbs, args.db)
    elif args.cmd == "info":
        out = info(dbs, args.db)
    else:
        if not dbs.exists(args.db):
            dbs.create(args.db)
        out = poll_copy(dbs, args.from_url, args.db,
                        rounds=args.rounds, poll_freq_s=args.poll_freq)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
