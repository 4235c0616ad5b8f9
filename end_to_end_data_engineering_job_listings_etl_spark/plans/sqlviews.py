"""The SQL entry point: registered star views + literal SQL queries.

Reference analog: entry point 3 (SURVEY.md §3.3) — Superset/SQL-Lab
sends SQL text to the warehouse. Here the same query shapes run as
``spark.sql(...)`` over temp views registered from the star builders:
SQL string → Spark parser → Catalyst → the identical physical plans
the DataFrame API produces.

V1 ("Main Job Postings Analytics", superset.db saved_query 1) and the
Q8 monthly rollup (query row 8) are reproduced as literal SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .star import STAR_PREFIX, bridge_doc_keyword, dim_keyword, star_wide


def create_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the star schema as temp views for the SQL surface."""
    star_wide(spark, sf_dir).createOrReplaceTempView("v_star_wide")
    dim_keyword(spark, sf_dir).createOrReplaceTempView("v_dim_keyword")
    bridge_doc_keyword(spark, sf_dir).createOrReplaceTempView("v_bridge_doc_keyword")


_V1_SQL = """
SELECT order_pk, o_orderkey, employer_name, segment_name, priority_name,
       nation_name, region_name, full_date
FROM v_star_wide
"""

_Q8_SQL = """
SELECT CAST(date_trunc('month', full_date) AS DATE) AS month,
       count(*) AS postings
FROM v_star_wide
GROUP BY 1
"""


def sql_v1_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 star-join projection, executed from SQL text."""
    create_star_views(spark, sf_dir)
    return spark.sql(_V1_SQL)


def sql_q8_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 monthly rollup, executed from SQL text."""
    create_star_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


QUERIES = {
    "sql_v1_star": sql_v1_star,
    "sql_q8_monthly": sql_q8_monthly,
}

ORACLES = {
    "sql_v1_star": (
        f"{STAR_PREFIX} SELECT order_pk, o_orderkey, employer_name, segment_name,"
        " priority_name, nation_name, region_name, full_date FROM star_wide"
    ),
    "sql_q8_monthly": (
        f"{STAR_PREFIX} SELECT CAST(date_trunc('month', full_date) AS DATE) AS month,"
        " count(*) AS postings FROM star_wide GROUP BY 1"
    ),
}
