"""Local mirror of the driver's correctness gate: every queries() entry vs
its oracle_sql() twin in DuckDB at sf0.001 — row count, schema (column
names), and order-insensitive value equality."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("ENTRY_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows)


ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = ddb.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: columns differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs {len(drows)}")
    sset = _rowset(scols, [[r[c] for c in scols] for r in srows])
    dset = _rowset(dcols, drows)
    mism = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b]
    assert not mism, (
        f"{name}: first mismatch at {mism[0]}: "
        f"{sset[mism[0]]} != {dset[mism[0]]}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
