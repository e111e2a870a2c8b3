"""Replicates the driver's correctness gate: run every ``queries()`` entry
and its ``oracle_sql()`` side-by-side (DuckDB) and compare row multisets
exactly — no tolerance, because the entry queries are built to be
bit-stable across engines (decimal-accumulated sums + round-6)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=repr,
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, entry_artifacts, name):
    sql = entry_mod.oracle_sql().get(name)
    art = entry_artifacts.get(name)
    if art is None:
        # Streaming queries are never prefetched (their construction
        # runs staged micro-batches); build directly, as before.
        sdf = entry_mod.queries()[name](spark, SF_DIR)
        s_cols = sdf.columns
        s_dtypes = sdf.dtypes
        s_rows = [tuple(r) for r in sdf.collect()]
    elif "err" in art:
        raise art["err"]
    else:
        s_cols, s_dtypes, s_rows = art["cols"], art["dtypes"], art["rows"]
    # Replicate the driver's canonicalizer: pandas sort_values over every
    # column crashes on list/dict cells ("unhashable type"), so any query
    # emitting a raw ARRAY/MAP/STRUCT column must serialize it (to_json)
    # before it reaches the gate. This sort IS that check.
    if s_rows:
        pd.DataFrame(s_rows, columns=s_cols).sort_values(by=sorted(s_cols))
    if sql is None:
        assert len(s_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    rel = duck.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    # Driver-grade TYPE check: the driver hashes each engine's result
    # through pandas, so what matters is the CANONICAL DTYPE FAMILY,
    # not the exact SQL type — Spark int vs DuckDB BIGINT both land in
    # int64 (fine), but Spark BIGINT vs DuckDB HUGEINT lands int64 vs
    # float64 and hash-MISMATCHES even when values agree (the tpch_q12
    # r04 lesson). Flag only cross-family pairs.
    def s_family(t):
        if t in ("tinyint", "smallint", "int", "bigint"):
            return "int"
        if t in ("float", "double"):
            return "float"
        if t == "string":
            return "str"
        if t == "boolean":
            return "bool"
        if t in ("date",):
            return "date"
        if t.startswith("timestamp"):
            return "ts"
        return None  # arrays/structs/binary: value compare covers them

    def d_family(t):
        if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        # HUGEINT and DECIMAL materialize as float64 in pandas
        if t in ("FLOAT", "DOUBLE", "HUGEINT") or t.startswith("DECIMAL"):
            return "float"
        if t in ("VARCHAR", "JSON", "UUID"):
            return "str"
        if t == "BOOLEAN":
            return "bool"
        if t == "DATE":
            return "date"
        if t.startswith("TIMESTAMP"):
            return "ts"
        return None

    d_types = {c: str(t) for c, t in zip(d_cols, rel.types)}
    for col, st in s_dtypes:
        sf, df_ = s_family(st), d_family(d_types[col])
        if sf is None or df_ is None:
            continue
        assert sf == df_, (
            f"{name}.{col}: Spark {st} ({sf}) vs DuckDB {d_types[col]} "
            f"({df_}) — the driver hasher canonicalizes these to "
            f"different pandas dtypes (cast in the SQL)"
        )
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


def test_query_and_oracle_keys_align():
    """Every oracle entry must name a registered query, and every query
    must carry an oracle (rows-only checks need an explicit waiver here)."""
    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o - q == set(), f"oracle_sql keys without a query: {sorted(o - q)}"
    # No rows-only waivers remain: compression_ratio gained a
    # value-checked certificate oracle in round 5 (raw lengths exact,
    # deflate envelope booleans provable — see compression_certificate).
    assert q - o == set(), f"queries without oracle_sql: {sorted(q - o)}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "bucket_ms" in df.columns
