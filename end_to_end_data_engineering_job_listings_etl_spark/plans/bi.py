"""The BI / declarative query surface: the queries the reference's
warehouse actually serves (SURVEY.md §2.11 — superset.db saved
queries, SQL-Lab history, chart configs), re-expressed on the
synthetic star.

Mapping (reference → here):
- Q11 top-15 employers (query row 11)      → bi_top15_employers
- Q12 daily posting counts (row 12)        → bi_daily_counts
- Q8/Q13 DATE_TRUNC monthly rollup (8,13)  → bi_monthly_trend
- Q14 year/month-name counts (row 14)      → bi_year_month
- C1 big-number total (slices row 1)       → bi_total_postings
- C2 world-map count by country (row 2)    → bi_count_by_region
- C3 temporal-range table, row_limit (3)   → bi_temporal_window
- V3 bridge flattening (tables id 3)       → bi_keyword_flatten
- engine extras: top keywords (A4 over the bridge), revenue by
  segment (SUM measure — exact via decimal cast so Spark's
  partition-order-dependent double summation can't drift from the
  oracle).

Scale shapes: every aggregate here is a partial-agg (map-side
combine) groupBy; top-k compiles to TakeOrderedAndProject (no global
sort); the star join underneath broadcasts every dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .star import STAR_PREFIX, _initcap, star_wide


def bi_top15_employers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11: COUNT GROUP BY employer ORDER BY cnt DESC LIMIT 15 —
    tie-broken on name so the selected set is engine-independent."""
    return (
        star_wide(spark, sf_dir)
        .groupBy("employer_name")
        .agg(F.count("*").alias("postings"))
        .orderBy(F.desc("postings"), F.asc("employer_name"))
        .limit(15)
    )


def bi_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12: postings per day."""
    return (
        star_wide(spark, sf_dir).groupBy("full_date").agg(F.count("*").alias("postings"))
    )


def bi_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8/Q13: DATE_TRUNC('month') rollup."""
    return (
        star_wide(spark, sf_dir)
        .groupBy(F.to_date(F.date_trunc("month", "full_date")).alias("month"))
        .agg(F.count("*").alias("postings"))
    )


def bi_year_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: counts by (year, month name) with the month-number sort key."""
    return (
        star_wide(spark, sf_dir)
        .groupBy("year_number", "month_name", "month_number")
        .agg(F.count("*").alias("postings"))
    )


def bi_total_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: big-number total."""
    return star_wide(spark, sf_dir).agg(F.count("order_pk").alias("total_postings"))


def bi_count_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: world-map count by country (region analog here)."""
    return (
        star_wide(spark, sf_dir).groupBy("region_name").agg(F.count("*").alias("postings"))
    )


def bi_temporal_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: temporal-range filter + row_limit 1000, deterministic via
    unique-key ordering."""
    return (
        star_wide(spark, sf_dir)
        .filter(F.col("full_date").between("1996-01-01", "1996-12-31"))
        .select("order_pk", "o_orderkey", "employer_name", "priority_name", "full_date")
        .orderBy("o_orderkey")
        .limit(1000)
    )


def bi_keyword_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: bridge ⋈ dim_skill flattening (doc_id, keyword_name)."""
    from .star import bridge_doc_keyword, dim_keyword

    b = bridge_doc_keyword(spark, sf_dir)
    dk = dim_keyword(spark, sf_dir)
    return b.join(F.broadcast(dk), "keyword_sk").select("doc_id", "keyword_name")


def bi_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 over the bridge: docs per keyword (skill demand analog)."""
    return (
        bi_keyword_flatten(spark, sf_dir)
        .groupBy("keyword_name")
        .agg(F.count("*").alias("n_docs"))
    )


def bi_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extra: SUM measure by segment. Decimal-cast before the
    sum — exact arithmetic, so partition order can't drift vs oracle."""
    return (
        star_wide(spark, sf_dir)
        .groupBy("segment_name")
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("revenue_e2"),
            F.count("*").alias("postings"),
        )
    )


def bi_daily_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free daily series: a generated date spine (sequence +
    explode over the observed min/max — no driver collect, no
    hand-written calendar) left-joins the daily counts so missing
    days surface as explicit zeros. The reference's DIM_DATE only
    contains observed dates (``dags/spark_etl_script.py:112-120``), so
    its daily charts silently skip empty days; this is the
    warehouse-correct form.

    Scale shape: the spine derives from a 1-row aggregate and explodes
    to #days rows (tiny forever); the daily counts are one shuffle on
    the date; the spine join broadcasts."""
    from ..catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    spine = (
        orders.agg(
            F.to_date(F.min("o_orderdate")).alias("mn"),
            F.to_date(F.max("o_orderdate")).alias("mx"),
        )
        .select(
            F.explode(
                F.sequence("mn", "mx", F.expr("INTERVAL 1 DAY"))
            ).alias("day")
        )
    )
    return spine.join(counts, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


QUERIES = {
    "bi_top15_employers": bi_top15_employers,
    "bi_daily_spine": bi_daily_spine,
    "bi_daily_counts": bi_daily_counts,
    "bi_monthly_trend": bi_monthly_trend,
    "bi_year_month": bi_year_month,
    "bi_total_postings": bi_total_postings,
    "bi_count_by_region": bi_count_by_region,
    "bi_temporal_window": bi_temporal_window,
    "bi_keyword_flatten": bi_keyword_flatten,
    "bi_top_keywords": bi_top_keywords,
    "bi_revenue_by_segment": bi_revenue_by_segment,
}

ORACLES = {
    "bi_daily_spine": """
        WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS mn,
                          CAST(max(o_orderdate) AS DATE) AS mx FROM orders),
             spine AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS day
                       FROM b),
             c AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
                   FROM orders GROUP BY 1)
        SELECT spine.day, coalesce(c.n, 0) AS n_orders
        FROM spine LEFT JOIN c USING (day)
    """,
    "bi_top15_employers": (
        f"{STAR_PREFIX} SELECT employer_name, count(*) AS postings FROM star_wide"
        " GROUP BY employer_name ORDER BY postings DESC, employer_name LIMIT 15"
    ),
    "bi_daily_counts": (
        f"{STAR_PREFIX} SELECT full_date, count(*) AS postings FROM star_wide"
        " GROUP BY full_date"
    ),
    "bi_monthly_trend": (
        f"{STAR_PREFIX} SELECT CAST(date_trunc('month', full_date) AS DATE) AS month,"
        " count(*) AS postings FROM star_wide GROUP BY 1"
    ),
    "bi_year_month": (
        f"{STAR_PREFIX} SELECT year_number, month_name, month_number,"
        " count(*) AS postings FROM star_wide GROUP BY 1, 2, 3"
    ),
    "bi_total_postings": (
        f"{STAR_PREFIX} SELECT count(order_pk) AS total_postings FROM star_wide"
    ),
    "bi_count_by_region": (
        f"{STAR_PREFIX} SELECT region_name, count(*) AS postings FROM star_wide"
        " GROUP BY region_name"
    ),
    "bi_temporal_window": (
        f"{STAR_PREFIX} SELECT order_pk, o_orderkey, employer_name, priority_name,"
        " full_date FROM star_wide WHERE full_date BETWEEN DATE '1996-01-01' AND"
        " DATE '1996-12-31' ORDER BY o_orderkey LIMIT 1000"
    ),
    "bi_keyword_flatten": (
        f"{STAR_PREFIX} SELECT k.doc_id, dk.keyword_name"
        f" FROM (SELECT DISTINCT doc_id, trim({_initcap('keyword_raw')}) AS kn"
        f" FROM doc_keywords) k JOIN dim_keyword dk ON k.kn = dk.keyword_name"
    ),
    "bi_top_keywords": (
        f"{STAR_PREFIX} SELECT dk.keyword_name, count(*) AS n_docs"
        f" FROM (SELECT DISTINCT doc_id, trim({_initcap('keyword_raw')}) AS kn"
        f" FROM doc_keywords) k JOIN dim_keyword dk ON k.kn = dk.keyword_name"
        " GROUP BY dk.keyword_name"
    ),
    "bi_revenue_by_segment": (
        f"{STAR_PREFIX} SELECT segment_name,"
        " CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " AS BIGINT) AS revenue_e2,"
        " count(*) AS postings FROM star_wide GROUP BY segment_name"
    ),
}
