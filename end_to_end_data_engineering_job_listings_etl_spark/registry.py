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
    tpch3,
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
    tpch3,
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


# The driver's correctness gate checks the FIRST 50 entries of
# all_queries() each round. Queries already driver-verified in a prior
# round keep their banked rows, so each round this list rotates the
# not-yet-driver-checked surface into the window (every name here has a
# DuckDB oracle — no rows-only checks waste a slot).
#
# Round 2 window: the two round-1 FAIL rows (now fixed), the whole
# reference-shaped jl_* warehouse, the literal-SQL views, the
# exactness-gated ANN pair, TPC-H shapes, relational edge semantics,
# and the streaming/sink/multimodal core.
_WINDOW = [
    "inc_watermark_agg",
    "fn_map_column",
    "jl_fact_checked",
    "jl_bridge_checked",
    "jl_dim_company_checked",
    "jl_dim_publisher_checked",
    "jl_dim_employment_type_checked",
    "jl_dim_location_checked",
    "jl_dim_date_checked",
    "jl_dim_skill_checked",
    "jl_dim_job_details_checked",
    "sql_v1_star",
    "sql_v2_star_dates",
    "sql_v3_bridge_flat",
    "sql_q8_monthly",
    "sim_lsh_ann_checked",
    "sim_ivf_topk_checked",
    "li_market_share",
    "li_promo_share_monthly",
    "li_lateness_by_class",
    "cust_order_distribution",
    "li_returned_top_customers",
    "li_big_orders",
    "li_disjunctive_part_join",
    "cust_idle_above_avg",
    "li_top_supplier",
    "set_except_all_priority",
    "set_intersect_all_priority",
    "rel_nullsafe_join",
    "rel_not_in_plain",
    "rel_not_in_null_poison",
    "rel_anti_null_semantics",
    "rel_division_all_priorities",
    "rel_correlated_scalar",
    "agg_multi_distinct",
    "stream_window_counts",
    "stream_user_totals",
    "stream_dedup",
    "stream_session_counts",
    "stream_upsert_dim",
    "sink_bucketed_join",
    "sink_compaction",
    "mm_meta_checked",
    "mm_features",
    "mm_frame_sample_checked",
    "stream_static_join",
    "stream_interval_join",
    "sink_partitioned_roundtrip",
    "sink_csv_roundtrip",
    "sink_orc_roundtrip",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(merged) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update({k: _pinned(v) for k, v in m.QUERIES.items()})
    missing = [n for n in _WINDOW if n not in merged]
    if missing:
        raise ValueError(f"_WINDOW names not registered: {missing}")
    out = {n: merged[n] for n in _WINDOW}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(getattr(m, "ORACLES", {}))
    return out
