"""REST ingest as a Spark 4 Python DataSource — the executor-side
upgrade of ``rest.py``'s driver-side pagination.

Reference analog: the same S1/S2/S3 surface
(``dags/test_extraction.py:17-84``), but exposed through
``spark.read.format("rest_jobs")`` with one input partition per
country, so page fetches run ON EXECUTORS in parallel. That is the
form a real 1000-partition backfill takes (partition per
country×page-range×day); driver-side ingest (rest.py) remains the
right tool for the reference's tiny ≤20-call polls.

The transport is deterministic and self-contained (same synthetic
page payload as ``plans/mlx.py::src_rest_ingest``, including one
simulated HTTP 429 on the first fetch of each country's page 3 to
exercise the retry/backoff path executor-side), so the output is
oracle-checkable with pinned literals.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    HAVE_DATASOURCE_API = False
    DataSource = object  # type: ignore[assignment]
    DataSourceReader = object  # type: ignore[assignment]
    InputPartition = object  # type: ignore[assignment]

REST_JOBS_SCHEMA = (
    "job_title string, employer_name string, job_publisher string, "
    "job_country string"
)


def synthetic_page(country: str, page: int) -> list[dict]:
    """The deterministic fake transport: 10 records per (country,
    page), titles keyed by page, three employers round-robin."""
    return [
        {"job_title": f"T{page}-{i}", "employer_name": f"E{i % 3}"}
        for i in range(10)
    ]


class _CountryPartition(InputPartition):
    def __init__(self, country: str):
        self.country = country


class RestJobsReader(DataSourceReader):
    def __init__(self, options):
        self.countries: Sequence[str] = tuple(
            options.get("countries", "us,in,jp,ru").split(",")
        )
        self.num_pages = int(options.get("num_pages", "5"))

    def partitions(self):  # one executor task per country
        return [_CountryPartition(c) for c in self.countries]

    def read(self, partition: _CountryPartition) -> Iterator[tuple]:
        from .rest import HttpStatusError, fetch_with_retry

        country = partition.country
        seen: dict[int, int] = {}

        def fetch(page: int) -> list[dict]:
            seen[page] = seen.get(page, 0) + 1
            if page == 3 and seen[page] == 1:
                raise HttpStatusError(429, "rate limited")
            return synthetic_page(country, page)

        for page in range(1, self.num_pages + 1):
            batch = fetch_with_retry(
                lambda p=page: fetch(p), sleep=lambda _s: None
            )
            for rec in batch:
                # project onto the declared schema with null back-fill
                # (S3), tag the upper-cased country
                yield (
                    rec.get("job_title"),
                    rec.get("employer_name"),
                    rec.get("job_publisher"),
                    country.upper(),
                )


class RestJobsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_jobs"

    def schema(self) -> str:
        return REST_JOBS_SCHEMA

    def reader(self, schema):
        return RestJobsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the rest_jobs format."""
    if not HAVE_DATASOURCE_API:
        raise NotImplementedError(
            "pyspark.sql.datasource requires pyspark >= 4.0"
        )
    spark.dataSource.register(RestJobsDataSource)
