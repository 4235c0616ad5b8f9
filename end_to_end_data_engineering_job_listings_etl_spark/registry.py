"""Central query registry: merges every plan/operator module's
(QUERIES, ORACLES) pair into the driver contract surface
(`__spark_entry__.py`).

Each module contributes:
- QUERIES: dict[name, callable(spark, sf_dir) -> DataFrame]
- ORACLES: dict[name, ANSI-SQL string for DuckDB]  (a query missing
  here gets the driver's weaker rows-only check — reserved for
  genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .plans import (
    bi,
    corpus,
    curation,
    extended,
    functional,
    joblistings,
    media_stream,
    mlx,
    pricing,
    relational,
    sqlviews,
    star,
    streaming2,
    tpch_more,
    traindata,
    windowfns,
)

_MODULES = [
    star,
    bi,
    functional,
    corpus,
    curation,
    extended,
    pricing,
    tpch_more,
    relational,
    sqlviews,
    joblistings,
    media_stream,
    streaming2,
    mlx,
    traindata,
    windowfns,
]


def _pinned(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin session settings a query's semantics depend on. The driver
    owns the SparkSession; timestamps in the parquet are UTC instants,
    so date derivation must happen in UTC regardless of host TZ."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update({k: _pinned(v) for k, v in m.QUERIES.items()})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    return out
