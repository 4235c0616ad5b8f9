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
# Round 12 window — ZERO overlap with the r11 window (r11 verdict ask
# #2: rotate to the next-oldest band). Computed from
# CORRECTNESS_r0{1..9}/r10/r11.json the same way every round: strictly
# the 50 oracled names whose last driver row is OLDEST, oldest round
# first, alphabetical within a round — the r6 remainder (the sim_*
# ANN/PQ similarity family, DSIR selection, the text quality-filter
# band) plus the first 41 of the r7 band (the whole bi_* dashboard
# layer, the generic dim_* builds + fact_orders, the fn_* JSON/string
# kit, SCD1/SCD2/upsert incrementals, LSH/IVF checked twins, token
# budget, JSON source). Exactly the families the r11 verdict asked to
# rotate in.
_WINDOW = [
    # r6 band — last driver row in CORRECTNESS_r06 (the remainder)
    "samp_dsir_select",
    "sim_cosine_topk",
    "sim_ivfpq_topk",
    "sim_knn_join",
    "sim_pq_adc",
    "text_boilerplate_lines",
    "text_c4_filters",
    "text_gopher_rules",
    "text_quality_buckets",
    # r7 band — last driver row in CORRECTNESS_r07 (first 41)
    "bi_count_by_region",
    "bi_daily_counts",
    "bi_daily_spine",
    "bi_keyword_flatten",
    "bi_monthly_trend",
    "bi_revenue_by_segment",
    "bi_temporal_window",
    "bi_top15_employers",
    "bi_top_keywords",
    "bi_total_postings",
    "bi_year_month",
    "bridge_doc_keyword",
    "corpus_curation",
    "dd_dedup_stats",
    "dd_embedding_neardup",
    "dd_minhash_estimate",
    "dim_company",
    "dim_date",
    "dim_keyword",
    "dim_location",
    "dim_priority",
    "dim_segment",
    "fact_orders",
    "fn_boolean_sum",
    "fn_json_extract",
    "fn_json_modes",
    "fn_json_roundtrip",
    "fn_normalize_strings",
    "fn_parse_string_array",
    "fn_relative_time",
    "fn_union_by_country",
    "fn_variant_extract",
    "inc_scd1_merge",
    "inc_scd2_status",
    "inc_upsert_dim",
    "samp_token_budget",
    "sim_ivf_topk",
    "sim_ivf_topk_checked",
    "sim_lsh_ann",
    "sim_lsh_ann_checked",
    "src_json_records",
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
