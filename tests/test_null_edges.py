"""Latent-edge regression tests for the r4 ADVICE fixes: NULL hash
keys in the sketch layer, sparse PIVOT combinations, and the
collation-dedup oracle's case-coinciding names. Each test builds a
perturbed fixture directory (symlinks + one rewritten table) so the
exact production query functions and oracle SQL run unmodified over
data that EXERCISES the previously-latent path, through the same
strict driver-replica compare as everything else.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import SF_DIR
from tests.oracle_check import TABLES, compare, duckdb_conn


def _variant_dir(tmp_path, rewrite: dict[str, str]) -> str:
    """Fixture dir = symlinks to SF_DIR for every table except those
    in ``rewrite`` (table -> DuckDB SQL over the original views)."""
    out = tmp_path / "sfvar"
    out.mkdir()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t + '.parquet')}'"
        )
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if t in rewrite:
            con.execute(f"COPY ({rewrite[t]}) TO '{dst}' (FORMAT PARQUET)")
        else:
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    return str(out)


def test_cms_oracle_parity_with_null_keys(spark, tmp_path):
    """Spark concat propagates NULL while DuckDB concat skips it — the
    _nn coalesce must make both engines hash a NULL event_type to the
    same bucket (was silently divergent before r5)."""
    sf = _variant_dir(
        tmp_path,
        {
            "events": (
                "SELECT event_id, ts, user_id, "
                "CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END "
                "AS event_type, value, props FROM events"
            )
        },
    )
    from end_to_end_data_engineering_job_listings_etl_spark.plans.sketch import ORACLES, QUERIES

    compare(
        QUERIES["agg_cms_frequency"](spark, sf),
        duckdb_conn(sf),
        ORACLES["agg_cms_frequency"],
        "agg_cms_frequency@nullkeys",
    )


def test_kmv_oracle_parity_with_null_keys(spark, tmp_path):
    """NULL o_custkey rows must hash identically in both engines."""
    sf = _variant_dir(
        tmp_path,
        {
            "orders": (
                "SELECT o_orderkey, "
                "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END "
                "AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
                "o_orderpriority FROM orders"
            )
        },
    )
    from end_to_end_data_engineering_job_listings_etl_spark.plans.sketch import ORACLES, QUERIES

    compare(
        QUERIES["agg_kmv_distinct_checked"](spark, sf),
        duckdb_conn(sf),
        ORACLES["agg_kmv_distinct_checked"],
        "agg_kmv_distinct_checked@nullkeys",
    )


def test_pivot_oracle_parity_with_sparse_combo(spark, tmp_path):
    """With every ('1-URGENT', 'P') order removed, Spark PIVOT yields
    NULL for that cell where the oracle's CASE-sum yields 0 — the
    coalesce added in r5 must keep them identical."""
    sf = _variant_dir(
        tmp_path,
        {
            "orders": (
                "SELECT * FROM orders WHERE NOT "
                "(o_orderpriority = '1-URGENT' AND o_orderstatus = 'P')"
            )
        },
    )
    from end_to_end_data_engineering_job_listings_etl_spark.plans.sqlviews import ORACLES, QUERIES

    df = QUERIES["sql_pivot_clause"](spark, sf)
    # the sparse cell must exist and be 0, not NULL / missing row
    row = {r["priority"]: r for r in df.collect()}
    assert row["1-URGENT"]["p"] == 0
    compare(
        QUERIES["sql_pivot_clause"](spark, sf),
        duckdb_conn(sf),
        ORACLES["sql_pivot_clause"],
        "sql_pivot_clause@sparse",
    )


def test_collation_oracle_parity_with_case_coinciding_names(spark, tmp_path):
    """A name whose upper and lower forms coincide (digits-only) was
    double-counted by the old count(DISTINCT upper)+count(DISTINCT
    lower) oracle; the UNION ALL form must match Spark exactly."""
    sf = _variant_dir(
        tmp_path,
        {
            "customer": (
                "SELECT c_custkey, "
                "CASE WHEN c_custkey % 7 = 0 "
                "THEN CAST(c_custkey AS VARCHAR) ELSE c_name END AS c_name, "
                "c_nationkey, c_acctbal, c_mktsegment FROM customer"
            )
        },
    )
    from end_to_end_data_engineering_job_listings_etl_spark.plans.functional import (
        ORACLES,
        QUERIES,
    )

    compare(
        QUERIES["fn_collation_dedup"](spark, sf),
        duckdb_conn(sf),
        ORACLES["fn_collation_dedup"],
        "fn_collation_dedup@digits",
    )
