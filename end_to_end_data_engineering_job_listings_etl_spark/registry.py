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

from . import cachereg
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
    profiling,
    relational,
    selection,
    sketch,
    sqlviews,
    star,
    streaming2,
    tpch3,
    tpch4,
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
    tpch4,
    profiling,
    sketch,
    selection,
]


def _pinned(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin session settings a query's semantics depend on. The driver
    owns the SparkSession; timestamps in the parquet are UTC instants,
    so date derivation must happen in UTC regardless of host TZ.

    Also the engine's QUERY BOUNDARY (r9 verdict #1): before each
    registry query — the only point where no memo build is in flight —
    ``cachereg.query_boundary`` bounds within-dataset session state
    (evicts least-recently-touched family memos past the state budget,
    drops terminated streaming handles), so a long-lived driver
    walking hundreds of queries against ONE dataset stays inside a
    fixed heap instead of accumulating every family's pinned frames."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        cachereg.query_boundary(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


# The driver's correctness gate checks the FIRST 50 entries of
# all_queries() each round. Queries already driver-verified in a prior
# round keep their banked rows, so each round this list rotates fresh
# or least-recently-checked surface into the window (every name here
# has a DuckDB oracle — no rows-only checks waste a slot).
#
# Round 10 window — ZERO overlap with the r9 window (r9 verdict ask
# #7: "rotate to the next-oldest ~50 names"). Computed from
# CORRECTNESS_r0{1..9}.json: strictly the 50 oracled names whose last
# driver row is OLDEST, oldest round first, alphabetical within a
# round — the full 16-name r4 remainder (set ops, unpivot/filtered
# aggs, dq/profile probes, observed/zorder sinks, lateral/recursive
# SQL, the full-outer stream join) plus the first 34 of the r5 band
# (the sketch-aggregate family, CDC/incremental-view maintenance,
# bloom/salted joins, pandas grouped agg, samplers, SQL surface
# probes, schema-evolution/malformed-CSV sources). The verdict's
# example names (jl_dim_*_checked, sql_v*, mm_*, TPC-H q4-q10) carry
# r6-r8 rows — NEWER than these — and rotate in later rounds.
_WINDOW = [
    # r4 band — last driver row in CORRECTNESS_r04
    "agg_approx_percentile_checked",
    "agg_filtered_bools",
    "agg_unpivot_events",
    "dim_company_bucketed",
    "dq_expectations",
    "fn_explode_outer_keywords",
    "inc_snapshot_diff",
    "profile_table",
    "set_except_customers",
    "set_intersect_customers",
    "sink_observed_write",
    "sink_zorder_roundtrip",
    "sql_lateral_topn",
    "sql_recursive_month_spine",
    "stream_fullouter_interval_join",
    "text_top_bigrams",
    # r5 band — last driver row in CORRECTNESS_r05 (first 34 of 48)
    "agg_bitmap_distinct",
    "agg_cms_frequency",
    "agg_exact_moments",
    "agg_hll_partition_merge",
    "agg_kmv_distinct_checked",
    "agg_kmv_intersection_checked",
    "agg_session_window_batch",
    "dd_duplicate_clusters",
    "dd_prefix_filter_pairs",
    "emb_l2_normalize_arrow",
    "fn_collation_dedup",
    "fn_sql_udf",
    "fn_xml_roundtrip",
    "graph_triangle_count",
    "inc_agg_merge",
    "inc_cdc_apply",
    "inc_join_view_maintain",
    "inc_topk_merge",
    "j_bloom_filter_prune",
    "j_salted_skew_join",
    "ml_gram_matrix",
    "op_grouped_agg_pandas",
    "profile_catalog_stats",
    "profile_table_approx_checked",
    "q21_sole_late_suppliers",
    "rag_hybrid_retrieval",
    "samp_pack_sequences",
    "samp_split_by_cluster",
    "samp_stratified_exact",
    "samp_temperature_mixture",
    "samp_weighted_bernoulli",
    "sink_inverted_index_roundtrip",
    "sql_parameterized",
    "sql_pivot_clause",
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
