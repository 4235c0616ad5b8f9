"""End-to-end reference-shaped pipeline: landing job_listings →
star schema with the reference's table/column names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.plans.joblistings import (
    build_star_schema,
    synth_job_listings,
)

def _now():
    return F.lit("2025-07-01 00:00:00").cast("timestamp")


@pytest.fixture(scope="module")
def star(spark):
    landing = synth_job_listings(spark, 200)
    return build_star_schema(landing, now=_now()), landing


def test_all_nine_tables_produced(star):
    tables, _ = star
    assert set(tables) == {
        "DIM_COMPANY", "DIM_PUBLISHER", "DIM_EMPLOYMENT_TYPE", "DIM_LOCATION",
        "DIM_DATE", "DIM_JOB_DETAILS", "DIM_SKILL", "FACT_JOB_POSTINGS",
        "BRIDGE_JOB_SKILL",
    }


def test_dims_dense_normalized(star):
    tables, _ = star
    comp = tables["DIM_COMPANY"].collect()
    names = sorted(r["employer_name"] for r in comp)
    # trim+upper collapses 'acme corp' / ' ACME CORP'
    assert "ACME CORP" in names and len([n for n in names if "ACME" in n]) == 1
    sks = sorted(r["company_sk"] for r in comp)
    assert sks == list(range(1, len(sks) + 1))
    # initcap collapses dirty employment types but en-dash variant stays
    et = {r["employment_type_name"] for r in tables["DIM_EMPLOYMENT_TYPE"].collect()}
    assert "Full-time" in et and "Full–time" in et


def test_fact_preserves_grain_and_resolves_sks(star):
    tables, landing = star
    fact = tables["FACT_JOB_POSTINGS"]
    rows = fact.collect()
    assert len(rows) == landing.count()
    assert all(r["job_count"] == 1 for r in rows)
    assert all(r["company_sk"] is not None for r in rows)
    assert all(r["date_sk"] is not None for r in rows)
    pks = sorted(r["job_posting_pk"] for r in rows)
    assert pks == list(range(1, len(pks) + 1))


def test_highlights_faithful_null_and_corrected_map(star):
    tables, _ = star
    det = tables["DIM_JOB_DETAILS"].collect()
    # faithful F12: the reference's array-schema parse nulls every record
    assert all(r["job_highlights_array"] is None for r in det)
    # corrected map parse actually works
    assert all(r["job_highlights_map"] is not None for r in det)
    assert all("Qualifications" in r["job_highlights_map"] for r in det)


def test_relative_time_parsed_in_fact_base(spark, star):
    _, landing = star
    from end_to_end_data_engineering_job_listings_etl_spark.functions.relative_time import parse_relative_time

    parsed = landing.select(
        "job_posted_at", parse_relative_time("job_posted_at", _now()).alias("ts")
    ).collect()
    for r in parsed:
        s = r["job_posted_at"]
        if "weeks" in s or s == "just posted":
            assert r["ts"] is None, s
        else:
            assert r["ts"] is not None, s


def test_bridge_pairs_match_skills(star):
    tables, landing = star
    bridge = tables["BRIDGE_JOB_SKILL"]
    n_landing_skills = landing.select(
        F.explode(F.from_json("skills", "array<string>"))
    ).distinct().count()
    assert tables["DIM_SKILL"].count() == n_landing_skills
    # every posting has exactly its distinct skills in the bridge
    import json

    per_job = bridge.groupBy("job_posting_pk").count().collect()
    assert all(1 <= r["count"] <= 2 for r in per_job)
    assert bridge.count() == bridge.distinct().count()


def test_star_writes_roundtrip(tmp_path, spark, star):
    from end_to_end_data_engineering_job_listings_etl_spark.sinks.writers import write_counted

    tables, _ = star
    n = write_counted(tables["DIM_SKILL"], spark, str(tmp_path / "dim_skill"))
    assert n == tables["DIM_SKILL"].count()


def test_fallback_nk_single_partition_exchanges_are_narrow(spark):
    """The fallback natural-key derivation (no pre-supplied
    job_natural_key) must never funnel the full-width landing through a
    single-partition exchange: every Exchange SinglePartition in the
    fact plan is fed by a narrow projection (distinct NK tuples, dim
    keys, or the 1-column pk_map) — wide payload columns stay out."""
    from end_to_end_data_engineering_job_listings_etl_spark.plans.extended import jl_star_fact

    fact = jl_star_fact(spark, "/root/testdata/sf0.001")
    plan = fact._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    wide_cols = ("job_description", "job_highlights")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert not any(c in child for c in wide_cols), (
            f"single-partition exchange carries wide columns:\n{line}\n{child}"
        )
