"""REST ingest (S1/S2/S3) with injected transport."""

from __future__ import annotations

import random

import pytest

from end_to_end_data_engineering_job_listings_etl_spark.sources.readers import JOB_LISTINGS_SCHEMA
from end_to_end_data_engineering_job_listings_etl_spark.sources.rest import (
    HttpStatusError,
    extract_paginated,
    fetch_with_retry,
)


def test_retry_backoff_and_429_jitter():
    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise HttpStatusError(429)
        return [{"ok": True}]

    out = fetch_with_retry(
        flaky, retries=5, sleep=sleeps.append, rng=random.Random(42)
    )
    assert out == [{"ok": True}]
    assert len(sleeps) == 2
    # exponential base + jitter in (1,3) for 429s
    assert 1 * 1 + 1 <= sleeps[0] <= 1 + 3
    assert 2 + 1 <= sleeps[1] <= 2 + 3


def test_retry_exhaustion_raises():
    def dead():
        raise HttpStatusError(500)

    with pytest.raises(RuntimeError, match="after 2 retries"):
        fetch_with_retry(dead, retries=2, sleep=lambda _: None)


def test_extract_paginated_tags_and_conforms(spark):
    def fake_page(country: str, page: int) -> list[dict]:
        if page > 2:
            return []
        return [
            {
                "job_title": f"{country}-job-{page}",
                "employer_name": "ACME",
                "job_is_remote": page % 2 == 0,
            }
        ]

    df = extract_paginated(
        spark,
        fake_page,
        JOB_LISTINGS_SCHEMA,
        countries=("us", "jp"),
        num_pages=3,
        sleep=lambda _: None,
    )
    rows = df.collect()
    assert len(rows) == 4
    assert {r["job_country"] for r in rows} == {"US", "JP"}
    assert [f.name for f in df.schema.fields] == [
        f.name for f in JOB_LISTINGS_SCHEMA.fields
    ]
    assert all(r["job_publisher"] is None for r in rows)


def test_rest_datasource_partitions_per_country(spark):
    """The DataSource form parallelizes ingest: one input partition
    per country, fetched executor-side."""
    from end_to_end_data_engineering_job_listings_etl_spark.sources.rest_datasource import register

    register(spark)
    df = (
        spark.read.format("rest_jobs")
        .option("countries", "us,in")
        .option("num_pages", "2")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2
    rows = df.collect()
    assert len(rows) == 2 * 2 * 10
    assert {r["job_country"] for r in rows} == {"US", "IN"}
    assert all(r["job_publisher"] is None for r in rows)
