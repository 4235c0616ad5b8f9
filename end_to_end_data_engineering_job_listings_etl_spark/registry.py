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
# Round 11 window — ZERO overlap with the r10 window (r10 verdict ask
# #4: rotate to the next band). Computed from
# CORRECTNESS_r0{1..9}/r10.json the same way every round: strictly the
# 50 oracled names whose last driver row is OLDEST, oldest round
# first, alphabetical within a round — the r5 remainder (SQL scripting,
# schema-evolution/malformed-CSV/resumable sources, stream CDC +
# curation drains, the text CDC/BM25/dup-span layer, window EWMA/
# cume_dist) plus the first 36 of the r6 band (the jl_dim_*_checked
# star dims, both jl fact builds, the TPC-H q2-q20 shapes, the
# dd_* minhash/simhash/keep-best dedup layer, multimodal audio/resize,
# ANN recall, MMR rerank). Exactly the families the r10 verdict asked
# to rotate in.
_WINDOW = [
    # r5 band — last driver row in CORRECTNESS_r05 (the remainder)
    "sql_scripted_pipeline",
    "src_csv_malformed",
    "src_python_stream_resume",
    "src_schema_evolution",
    "stream_cdc_apply",
    "stream_curation_pipeline",
    "text_bm25_topk",
    "text_cdc_chunks",
    "text_chunk_overlap",
    "text_dup_spans",
    "text_repetition_signals",
    "text_winnow_fingerprints",
    "w_cume_dist_nth",
    "w_ewma_decay",
    # r6 band — last driver row in CORRECTNESS_r06 (first 36)
    "dd_keep_best",
    "dd_lsh_candidates",
    "dd_minhash_signatures",
    "dd_simhash",
    "dd_soft_dedup_weights",
    "emb_random_projection",
    "ev_ann_recall",
    "inc_dedup_merge",
    "inc_lsh_merge",
    "jl_bridge_checked",
    "jl_dim_company_checked",
    "jl_dim_date_checked",
    "jl_dim_employment_type_checked",
    "jl_dim_job_details_checked",
    "jl_dim_location_checked",
    "jl_dim_publisher_checked",
    "jl_dim_skill_checked",
    "jl_fact_checked",
    "jl_fact_fallback_checked",
    "li_big_orders",
    "li_disjunctive_part_join",
    "li_late_shipment_priority",
    "li_lateness_by_class",
    "mm_audio_energy_checked",
    "mm_resize_checked",
    "q11_nation_stock_share",
    "q16_supplier_variety",
    "q17_small_quantity",
    "q20_dominant_suppliers",
    "q2_min_balance_supplier",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "rag_mmr_rerank",
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
