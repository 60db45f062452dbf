"""Mirror of the driver's correctness gate: every queries() entry with an
oracle_sql() runs on Spark AND DuckDB at sf0.001 and must match exactly
(row count, column names, order-insensitive values).

Two lanes cover the same 293 oracles:

- DEFAULT lane: ``test_oracle_sweep`` — one test that drives every oracle
  through a thread pool (Spark schedules jobs from multiple threads
  concurrently; each worker gets its own DuckDB connection).  Full value
  checks, ~3-4× less wall time than the serial parametrization, failures
  reported per-name in one assert.
- SLOW lane: the classic per-param ``test_oracle_parity`` — serial, one
  test per oracle, for granular attribution when the sweep flags names
  (run with ``-m slow`` or ``-k 'name'``).
"""

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


def _connect():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def ducked():
    return _connect()


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


def _check_one(spark, con, name: str) -> str | None:
    """Returns None on parity, else a one-line failure description."""
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = con.execute(entrymod.oracle_sql()[name])
    d_cols = [d[0].lower() for d in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return f"{name}: columns {s_cols} vs {d_cols}"
    if len(s_rows) != len(d_rows):
        return f"{name}: rows {len(s_rows)} vs {len(d_rows)}"

    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_sorted = _norm_rows(s_cols, [[r[i] for i in s_idx] for r in s_rows])
    d_sorted = _norm_rows(d_cols, [[r[i] for i in d_idx] for r in d_rows])
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    if mismatches:
        return f"{name}: first diffs {mismatches[:2]}"
    return None


def test_oracle_sweep(spark):
    """All 293 oracles, full value checks, through a bounded thread pool.
    Spark executes jobs submitted from concurrent threads against the one
    session; DuckDB gets one in-memory connection per worker."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    local = threading.local()

    def run(name: str):
        if not hasattr(local, "con"):
            local.con = _connect()
        try:
            return _check_one(spark, local.con, name)
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            return f"{name}: {type(e).__name__}: {e}"

    workers = int(os.environ.get("KGFORGE_ORACLE_POOL", "8"))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        failures = [f for f in pool.map(run, ORACLES) if f is not None]
    assert not failures, (
        f"{len(failures)}/{len(ORACLES)} oracles failed:\n" + "\n".join(failures)
    )


@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLES)
def test_oracle_parity(spark, ducked, name):
    failure = _check_one(spark, ducked, name)
    assert failure is None, failure
