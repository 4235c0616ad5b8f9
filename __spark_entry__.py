"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``end_to_end_data_engineering_job_listings_etl_spark`` package; this file is
the thin adapter over its registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from end_to_end_data_engineering_job_listings_etl_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: top-15 'employers' by posting count — the
    reference's Q11 (superset.db query row 11) on the synthetic star
    (orders ⋈ dims → groupBy → count → orderBy desc → limit 15)."""
    from end_to_end_data_engineering_job_listings_etl_spark.plans.star import star_wide
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = star_wide(spark, SMOKE_SF_DIR)
    return (
        wide.groupBy("employer_name")
        .agg(F.count("order_count").alias("postings"))
        .orderBy(F.desc("postings"), F.asc("employer_name"))
        .limit(15)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names)."""
    return registry.all_oracles()
