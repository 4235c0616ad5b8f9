"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle side by side, compare row count + sorted-column
schema + order-insensitive values. Used by tests and by ad-hoc dev
loops so oracle drift is caught before the driver sees it.

Round-3 finding (empirically validated against all 50 CORRECTNESS_r02
rows): the driver's value hash operates at the *pandas* level —
DuckDB 1.0's ``.df()`` lossily converts DECIMAL and HUGEINT columns
to float64, while Spark's ``toPandas()`` keeps ``decimal.Decimal``
objects and int64. A str-level cell comparison then fails exactly
when the representations diverge: ``str(51282.0) != str(51282)``
(every uncast DuckDB ``sum()`` → HUGEINT is red) and
``str(1251869314.0) != str(Decimal('1251869314.00'))`` (a DECIMAL
column is red iff any value has a trailing fractional zero — which is
why same-shaped queries split green/red in round 2). Date-likes ARE
canonicalized by the driver (DATE columns are green despite
``datetime.date`` vs midnight ``Timestamp``), numerics are NOT.

``compare`` therefore replays that strict str-level comparison, so a
pytest-green oracle is driver-green, not merely value-equal. Output
discipline this implies for every registered query: no DECIMAL output
columns (use scaled BIGINT "_e2/_e4/_e6" money), CAST every DuckDB
aggregate that widens (sum → HUGEINT) back to BIGINT, and no raw
binary/array cells (hex/flatten them)."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / float32 artifacts; values are pre-rounded in-query
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _strict_cell(v) -> str:
    """The driver-hasher cell canonicalization (see module docstring):
    date-likes unify to a Timestamp string, nulls to a sentinel,
    sequences flatten recursively; every other value contributes its
    plain ``str`` — so int64 5 vs float64 5.0 vs Decimal('5.00') are
    three DIFFERENT hash inputs, exactly as the driver sees them."""
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (pd.Timestamp, dt.datetime, dt.date)):
        return str(pd.Timestamp(v))
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ", ".join(_strict_cell(x) for x in v) + "]"
    return str(v)


def strict_frames(spark_df, con, sql: str):
    """Fetch both sides at the pandas level — the representation the
    driver hashes — and return (spark_cols, spark_rows, duck_cols,
    duck_rows) with columns name-sorted and cells canonicalized."""
    sp = spark_df.toPandas()
    s_cols = sorted(sp.columns)
    s_rows = [
        tuple(_strict_cell(v) for v in row)
        for row in sp[s_cols].itertuples(index=False, name=None)
    ]
    dp = con.execute(sql).df()
    d_cols = sorted(dp.columns)
    d_rows = [
        tuple(_strict_cell(v) for v in row)
        for row in dp[d_cols].itertuples(index=False, name=None)
    ]
    return s_cols, s_rows, d_cols, d_rows


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    """Assert Spark result == DuckDB result under the driver's own
    comparison: order-insensitive, column-name-sorted, str-level cells
    at the pandas representation (strict — a pass here is a driver
    hash_match, not merely value equality)."""
    s_cols, s_rows, d_cols, d_rows = strict_frames(spark_df, con, sql)

    assert s_cols == d_cols, f"[{name}] columns differ: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted = sorted(s_rows)
    d_sorted = sorted(d_rows)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, (
            f"[{name}] first strict (driver-hash) mismatch at sorted row {i}:\n"
            f"  spark={a}\n  duckdb={b}"
        )
