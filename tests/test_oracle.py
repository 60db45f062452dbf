"""Mirror of the driver's correctness gate: every queries() entry with an
oracle_sql() runs on Spark AND DuckDB at sf0.001 and must match exactly
(row count, column names, order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("KGFORGE_TEST_SF_DIR", "/root/testdata/sf0.001")
# data-derived oracle literals (IVF centroids) must train on the same tables
os.environ["KGFORGE_ORACLE_SF_DIR"] = SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ducked():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _norm_rows(cols, rows):
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(x) for x in r))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


ORACLES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_parity(spark, ducked, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = ducked.execute(entrymod.oracle_sql()[name])
    d_cols = [c.lower() for c in res.description and [d[0] for d in res.description]]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rows {len(s_rows)} vs {len(d_rows)}"

    # align column order by name
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_sorted = _norm_rows(s_cols, [[r[i] for i in s_idx] for r in s_rows])
    d_sorted = _norm_rows(d_cols, [[r[i] for i in d_idx] for r in d_rows])

    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first diffs {mismatches[:3]}"
