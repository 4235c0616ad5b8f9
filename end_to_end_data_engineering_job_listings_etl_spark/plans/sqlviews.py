"""The SQL entry point: registered star views + literal SQL queries.

Reference analog: entry point 3 (SURVEY.md §3.3) — Superset/SQL-Lab
sends SQL text to the warehouse. Here the same query shapes run as
``spark.sql(...)`` over temp views registered from the star builders:
SQL string → Spark parser → Catalyst → the identical physical plans
the DataFrame API produces.

V1 ("Main Job Postings Analytics", superset.db saved_query 1), V2
(saved_query 2 — V1 plus DIM_DATE attributes), V3 (dataset 3 — bridge
flattening to (pk, name) pairs), and the Q8 monthly rollup (query row
8) are reproduced as literal SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


_V2_SQL = """
SELECT order_pk, o_orderkey, employer_name, segment_name, priority_name,
       nation_name, region_name, full_date,
       month_name, month_number, quarter_number, year_number
FROM v_star_wide
"""

_V3_SQL = """
SELECT b.doc_id, k.keyword_name
FROM v_bridge_doc_keyword b
JOIN v_dim_keyword k ON b.keyword_sk = k.keyword_sk
"""


def sql_v1_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 star-join projection, executed from SQL text."""
    create_star_views(spark, sf_dir)
    return spark.sql(_V1_SQL)


def sql_v2_star_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2: the V1 star join widened with DIM_DATE attributes
    ("Job Postings Analytics with datetime", SURVEY.md §2.11 J12)."""
    create_star_views(spark, sf_dir)
    return spark.sql(_V2_SQL)


def sql_v3_bridge_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: bridge flattening to (posting, skill-name) pairs
    ("Skill-Specific Analytics", SURVEY.md §2.11 J13)."""
    create_star_views(spark, sf_dir)
    return spark.sql(_V3_SQL)


def sql_q8_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 monthly rollup, executed from SQL text."""
    create_star_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


# Recursive month spine: WITH RECURSIVE was the one ANSI construct the
# SQL surface lacked (Spark 4 supports it). The spine is tiny
# (84 rows) — the fact join stays the only real work; at 100 TB this
# shape is how calendar gap-filling avoids a generator UDF.
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(month_start) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT add_months(month_start, 1) FROM spine
  WHERE month_start < CAST('2001-12-01' AS DATE)
)
SELECT s.month_start,
       count(w.order_pk) AS postings
FROM spine s
LEFT JOIN v_star_wide w
  ON CAST(date_trunc('month', w.full_date) AS DATE) = s.month_start
GROUP BY s.month_start
"""

# LATERAL correlated subquery: per region, its top-2 nations by
# customer count — the correlated top-n shape Superset users write.
_LATERAL_TOPN_SQL = """
SELECT r.region_name, t.nation_name, t.n_postings
FROM (SELECT DISTINCT region_name FROM v_star_wide) r,
LATERAL (
  SELECT w.nation_name, count(*) AS n_postings
  FROM v_star_wide w
  WHERE w.region_name = r.region_name
  GROUP BY w.nation_name
  ORDER BY n_postings DESC, w.nation_name
  LIMIT 2
) t
"""


def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar spine via WITH RECURSIVE joined to the star — months
    with zero postings appear with count 0 (the gap-filling upgrade of
    Q8's month rollup)."""
    create_star_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPINE_SQL)


def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 nations per region through a LATERAL correlated subquery
    (decorrelated by Catalyst into a ranked window — no per-row
    re-execution)."""
    create_star_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN_SQL)


_PARAM_SQL = """
SELECT o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
            AS BIGINT) AS revenue_e2
FROM v_orders_param
WHERE o_totalprice > :min_price AND o_orderstatus != :excluded_status
GROUP BY o_orderstatus
ORDER BY status
"""


def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``spark.sql(..., args={...})``) — the
    injection-safe front door a SQL-serving layer uses: parameter
    markers ``:min_price`` / ``:excluded_status`` bind as literals at
    analysis time (so constant folding and predicate pushdown see real
    values — check the plan: the filter reaches the scan), never as
    string splices. The oracle inlines the same literals."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_param")
    return spark.sql(
        _PARAM_SQL, args={"min_price": 50_000.0, "excluded_status": "P"}
    )


def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDF (Spark 4 ``CREATE FUNCTION … RETURN expr``):
    the money-scaling idiom declared ONCE as a catalog function and
    reused from SQL text — unlike a Python UDF this inlines into the
    plan at analysis time (no serialization boundary, stays inside
    whole-stage codegen), which is why it's the right tool for shared
    scalar business logic at scale. Oracle inlines the same
    expression."""
    from ..catalog import load_table

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_e2_udf(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(CAST(p AS DECIMAL(12,2)) * 100 AS BIGINT)"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_udf")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(price_e2_udf(o_totalprice)) AS BIGINT) AS revenue_e2,
               CAST(max(price_e2_udf(o_totalprice)) AS BIGINT) AS max_price_e2
        FROM v_orders_udf
        GROUP BY o_orderpriority
        ORDER BY priority
        """
    )


_SCRIPT_SQL = """
BEGIN
  DECLARE avg_price_e2 BIGINT;
  SET avg_price_e2 = (
    SELECT sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
             div count(*)
    FROM v_orders_script
  );
  SELECT o_orderstatus AS status,
         CAST(count(*) AS BIGINT) AS n_above_avg,
         avg_price_e2 AS threshold_e2
  FROM v_orders_script
  WHERE CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) > avg_price_e2
  GROUP BY o_orderstatus
  ORDER BY status;
END
"""


def sql_scripted_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4 BEGIN…END blocks): the procedural
    two-step a stored-procedure shop writes — compute a corpus-level
    scalar into a DECLAREd variable, then parameterize the main query
    with it — executed as ONE script. The variable is bound
    driver-side between statements; each statement is still a full
    Catalyst plan (the scalar subquery runs distributed). Integer
    threshold (sum div count) keeps both engines bit-exact; the oracle
    is the equivalent correlated form."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "v_orders_script"
    )
    return spark.sql(_SCRIPT_SQL)


_PIVOT_SQL = """
SELECT *
FROM (SELECT o_orderpriority AS priority, o_orderstatus AS status
      FROM v_orders_pivot)
PIVOT (count(*) AS n FOR status IN ('F' AS f, 'O' AS o, 'P' AS p))
ORDER BY priority
"""


def sql_pivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (distinct surface from the DataFrame
    ``groupBy().pivot()`` form exercised by agg_pivot_events): order
    counts by priority pivoted across the three statuses. Pivot values
    are declared literals, so the plan is a plain grouped conditional
    aggregation — the oracle is exactly that. Spark's PIVOT count(*)
    yields NULL for a (priority, status) combination with no rows
    where the oracle's CASE-sum yields 0, so each pivoted column is
    coalesced to 0 — a no-op on dense fixtures, required for sparse
    ones."""
    from ..catalog import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_pivot")
    df = spark.sql(_PIVOT_SQL)
    return df.select(
        "priority",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in df.columns
            if c != "priority"
        ],
    )


QUERIES = {
    "sql_pivot_clause": sql_pivot_clause,
    "sql_scripted_pipeline": sql_scripted_pipeline,
    "fn_sql_udf": fn_sql_udf,
    "sql_parameterized": sql_parameterized,
    "sql_v1_star": sql_v1_star,
    "sql_v2_star_dates": sql_v2_star_dates,
    "sql_v3_bridge_flat": sql_v3_bridge_flat,
    "sql_q8_monthly": sql_q8_monthly,
    "sql_recursive_month_spine": sql_recursive_month_spine,
    "sql_lateral_topn": sql_lateral_topn,
}

ORACLES = {
    "sql_pivot_clause": """
        SELECT o_orderpriority AS priority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY priority
    """,
    "sql_scripted_pipeline": """
        WITH thr AS (
          SELECT CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                        // count(*) AS BIGINT) AS t
          FROM orders
        )
        SELECT o.o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_above_avg,
               CAST(max(thr.t) AS BIGINT) AS threshold_e2
        FROM orders o CROSS JOIN thr
        WHERE CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) > thr.t
        GROUP BY o.o_orderstatus
        ORDER BY status
    """,
    "fn_sql_udf": """
        SELECT o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS revenue_e2,
               CAST(max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS max_price_e2
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY priority
    """,
    "sql_parameterized": """
        SELECT o_orderstatus AS status,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS revenue_e2
        FROM orders
        WHERE o_totalprice > 50000.0 AND o_orderstatus != 'P'
        GROUP BY o_orderstatus
        ORDER BY status
    """,
    "sql_v1_star": (
        f"{STAR_PREFIX} SELECT order_pk, o_orderkey, employer_name, segment_name,"
        " priority_name, nation_name, region_name, full_date FROM star_wide"
    ),
    "sql_v2_star_dates": (
        f"{STAR_PREFIX} SELECT order_pk, o_orderkey, employer_name, segment_name,"
        " priority_name, nation_name, region_name, full_date,"
        " month_name, month_number, quarter_number, year_number FROM star_wide"
    ),
    "sql_v3_bridge_flat": (
        f"{STAR_PREFIX} SELECT DISTINCT k.doc_id,"
        f" trim(array_to_string(list_transform(string_split(k.keyword_raw, ' '),"
        f" w -> upper(w[1]) || lower(w[2:])), ' ')) AS keyword_name"
        f" FROM doc_keywords k"
    ),
    "sql_q8_monthly": (
        f"{STAR_PREFIX} SELECT CAST(date_trunc('month', full_date) AS DATE) AS month,"
        " count(*) AS postings FROM star_wide GROUP BY 1"
    ),
    "sql_recursive_month_spine": f"""{STAR_PREFIX},
spine AS (
  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-12-01',
                                     INTERVAL 1 MONTH)) AS DATE) AS month_start
)
SELECT s.month_start, count(w.order_pk) AS postings
FROM spine s
LEFT JOIN star_wide w
  ON CAST(date_trunc('month', w.full_date) AS DATE) = s.month_start
GROUP BY s.month_start""",
    "sql_lateral_topn": f"""{STAR_PREFIX}
SELECT region_name, nation_name, n_postings FROM (
  SELECT region_name, nation_name,
         count(*) AS n_postings,
         row_number() OVER (PARTITION BY region_name
                            ORDER BY count(*) DESC, nation_name) AS rn
  FROM star_wide GROUP BY region_name, nation_name
) WHERE rn <= 2""",
}
