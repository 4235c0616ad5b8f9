"""Local replica of the driver's correctness gate: run a Spark query
and its DuckDB oracle side by side, compare row count + sorted-column
schema + order-insensitive values. Used by tests and by ad-hoc dev
loops so oracle drift is caught before the driver sees it."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

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


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    """Assert Spark result == DuckDB result (order-insensitive,
    column-name-sorted — the driver's comparison shape)."""
    s_cols = sorted(spark_df.columns)
    s_rows = [tuple(_norm(r[c]) for c in s_cols) for r in spark_df.collect()]

    res = con.execute(sql)
    d_cols_raw = [d[0] for d in res.description]
    d_sorted_idx = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
    d_cols = [d_cols_raw[i] for i in d_sorted_idx]
    d_rows = [tuple(_norm(row[i]) for i in d_sorted_idx) for row in res.fetchall()]

    assert s_cols == d_cols, f"[{name}] columns differ: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"[{name}] row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_sorted = sorted(s_rows, key=repr)
    d_sorted = sorted(d_rows, key=repr)
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        assert a == b, f"[{name}] first value mismatch at sorted row {i}:\n  spark={a}\n  duckdb={b}"
