"""REST-API ingest: the reference's extraction front door.

Reference analogs:
- S1 paginated multi-country scan: GET per (country × page),
  accumulate record lists (``dags/test_extraction.py:17-23,53-84``;
  legacy variant ``dags/extraction.py:36-79``).
- S2 retry/backoff wrapper: 5 retries, exponential backoff, jittered
  extra wait on HTTP 429 (``dags/test_extraction.py:28-43``).
- S3 per-record projection + null-fill + country tag
  (``dags/test_extraction.py:68-71``).

The transport is injected (``fetch_page``) so the module is testable
offline and swappable (requests/httpx/…). Ingest is driver-side by
design — page counts are tiny (≤20 calls/run in the reference); the
DataFrame boundary is where scale begins. For bulk backfills, write
the fetched pages to a landing directory and use ``spark.read.json``
instead (SURVEY.md S1 mapping)."""

from __future__ import annotations

import random
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .readers import conform_schema

FetchPage = Callable[[str, int], list[dict]]


class HttpStatusError(Exception):
    def __init__(self, status: int, msg: str = ""):
        super().__init__(f"HTTP {status} {msg}")
        self.status = status


def fetch_with_retry(
    fetch: Callable[[], list[dict]],
    retries: int = 5,
    base_sleep: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
    rng: random.Random | None = None,
) -> list[dict]:
    """Reference-exact retry policy (``dags/test_extraction.py:28-43``):
    exponential backoff 2^i, plus uniform(1,3) jitter after HTTP 429."""
    rng = rng or random.Random()
    last: Exception | None = None
    for i in range(retries):
        try:
            return fetch()
        except HttpStatusError as e:
            last = e
            wait = base_sleep * (2**i)
            if e.status == 429:
                wait += rng.uniform(1, 3)
            sleep(wait)
        except Exception as e:  # noqa: BLE001 - transport errors retry too
            last = e
            sleep(base_sleep * (2**i))
    raise RuntimeError(f"fetch failed after {retries} retries") from last


def extract_paginated(
    spark: SparkSession,
    fetch_page: FetchPage,
    schema: T.StructType,
    countries: Sequence[str] = ("us", "in", "jp", "ru"),
    num_pages: int = 5,
    country_col: str = "job_country",
    retries: int = 5,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """S1+S2+S3 composed: per (country, page) fetch with retry, tag
    each record with the upper-cased country, project onto the declared
    schema with null-fill, return one DataFrame (the reference's
    append-into-one-list ≡ UNION ALL by country)."""
    records: list[dict] = []
    for country in countries:
        for page in range(1, num_pages + 1):
            batch = fetch_with_retry(
                lambda c=country, p=page: fetch_page(c, p),
                retries=retries,
                sleep=sleep,
            )
            for rec in batch:
                rec = dict(rec)
                rec[country_col] = country.upper()
                records.append(rec)
    if not records:
        return spark.createDataFrame([], schema)
    raw = spark.createDataFrame(records)
    return conform_schema(raw, schema)
