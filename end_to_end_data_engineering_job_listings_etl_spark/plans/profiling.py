"""Data profiling + data-quality expectation checks — the ANALYZE /
expectations surface of a warehouse engine.

Beyond-reference operators (the reference loads whatever the API
returns and trusts it; a 100 TB ingest cannot): ``profile_table``
is the per-column statistics pass an optimizer or a data catalog
needs (row count, null count, exact NDV), ``dq_expectations`` is the
rule gate a landing zone runs before publishing a partition (domain,
uniqueness, referential integrity, range checks — the Great-
Expectations-style contract, expressed as pure aggregations).

Scale shapes:
- ``profile_table`` is ONE aggregation pass over the table; the
  multiple exact count-distincts expand the input (Spark's EXPAND for
  multi-distinct), which is the documented exact-NDV cost — the
  approximate path at 100 TB is ``agg_approx_distinct_checked``
  (plans/media_stream.py), one pass, no expand, with error bounds.
  The tall (column_name, stats) shape comes from ``stack`` AFTER the
  aggregate — pivoting 1 row, not the table.
- ``dq_expectations`` unions six single-row aggregates; the only
  non-agg rule (referential integrity) is a left-anti join on the FK
  key projection, counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders``: row count, null count, exact
    distinct count (nulls excluded, SQL ``count(DISTINCT col)``
    semantics) — one aggregation pass, stacked to a tall frame."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(c).alias(f"{c}__ndv"))
    row = orders.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv" for c in _PROFILE_COLS
    )
    return (
        row.select(
            "n_rows",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack})"
                " as (column_name, n_nulls, n_distinct)"
            ),
        )
        .select("column_name", "n_rows", "n_nulls", "n_distinct")
        .orderBy("column_name")
    )


def profile_table_approx_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiling path EXECUTED, not just documented: same
    tall per-column profile as ``profile_table`` but NDV from the
    one-pass HLL++ ``approx_count_distinct`` (rsd=0.02, no EXPAND
    multiplication of the input), under the tolerance gate pattern of
    ``agg_approx_distinct_checked`` — the output carries the EXACT
    stats plus a boolean asserting the sketch landed within 5%
    relative error, and the oracle pins the exact values and TRUE.
    At scale you run the approx aggregates alone; the exact twin here
    exists only to gate the estimate.

    Plan note: the exact and approx aggregates run as TWO separate
    1-row passes joined by a broadcast — mixing ``countDistinct`` and
    ``approx_count_distinct`` in ONE agg forces Spark's multi-distinct
    Expand rewrite to haul every HLL++ buffer through the expanded
    input (measured 35 s vs 2.5+2.5 s split at sf0.1)."""
    orders = load_table(spark, sf_dir, "orders")
    exact_aggs = [F.count("*").alias("n_rows")]
    approx_aggs = []
    for c in _PROFILE_COLS:
        exact_aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls")
        )
        exact_aggs.append(F.countDistinct(c).alias(f"{c}__ndv"))
        approx_aggs.append(F.approx_count_distinct(c, 0.02).alias(f"{c}__andv"))
    row = orders.agg(*exact_aggs).crossJoin(F.broadcast(orders.agg(*approx_aggs)))
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv, {c}__andv" for c in _PROFILE_COLS
    )
    return (
        row.select(
            "n_rows",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack})"
                " as (column_name, n_nulls, n_distinct, __approx)"
            ),
        )
        .select(
            "column_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            (
                F.abs(F.col("__approx") - F.col("n_distinct"))
                / F.greatest(F.col("n_distinct"), F.lit(1))
                < 0.05
            ).alias("approx_ndv_ok"),
        )
        .orderBy("column_name")
    )


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite over orders/lineitem: each rule
    emits (rule_name, n_checked, n_violations, passed)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def rule(name: str, checked: F.Column, viol: F.Column, src: DataFrame):
        return src.agg(
            F.lit(name).alias("rule_name"),
            checked.alias("n_checked"),
            viol.cast("bigint").alias("n_violations"),
        )

    n = F.count("*")
    rules = [
        rule(
            "orders.o_totalprice_nonnegative",
            n,
            F.sum((F.col("o_totalprice") < 0).cast("bigint")),
            orders,
        ),
        rule(
            "orders.o_orderkey_unique",
            n,
            n - F.countDistinct("o_orderkey"),
            orders,
        ),
        rule(
            "orders.o_orderstatus_in_domain",
            n,
            F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")),
            orders,
        ),
        rule(
            "orders.o_orderdate_not_null",
            n,
            F.sum(F.col("o_orderdate").isNull().cast("bigint")),
            orders,
        ),
        rule(
            "lineitem.l_quantity_in_range",
            n,
            F.sum(
                ((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast(
                    "bigint"
                )
            ),
            li,
        ),
    ]
    # Referential integrity needs a join, not an in-frame aggregate:
    # count lineitems whose order key has no parent order. Built as
    # its own rule frame and appended (not patched into a placeholder
    # list slot — ADVICE r3).
    orphans = (
        li.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("__orphans"))
    )
    rules.append(
        li.agg(F.count("*").alias("n_checked"))
        .crossJoin(F.broadcast(orphans))
        .select(
            F.lit("lineitem.l_orderkey_fk_orders").alias("rule_name"),
            "n_checked",
            F.col("__orphans").cast("bigint").alias("n_violations"),
        )
    )
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.select(
        "rule_name",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule_name")


def profile_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CATALOG statistics path (``ANALYZE TABLE … FOR COLUMNS``)
    under the checked-gate pattern: orders lands as a managed catalog
    table (external location in scratch — nothing under the repo),
    ANALYZE populates per-column min/max/null/NDV stats, and the query
    reads them BACK out of the catalog and grades them against exact
    aggregates — min/max/nulls must be exact, NDV (HLL-backed) within
    10%. This is what feeds cost-based optimization: a stats-informed
    join reorder is only as good as these numbers, so the engine's
    ANALYZE output is itself oracle-gated like every other estimate
    here (approx-NDV profile, approx percentiles, KMV, HLL union).

    Driver-side work is two bounded fetches (a 1-row exact aggregate
    and two DESCRIBE results — catalog metadata, not data). At 100 TB
    ANALYZE runs the same one-pass approximate aggregates the
    profile_table_approx path measures; the catalog is the store."""
    import os as _os

    from ..util import scratch_dir

    cols = ("o_orderkey", "o_custkey")
    orders = load_table(spark, sf_dir, "orders").select(*cols)
    spark.sql("DROP TABLE IF EXISTS jl_orders_stats")
    path = _os.path.join(scratch_dir(prefix="cat_stats_"), "jl_orders_stats")
    orders.write.mode("overwrite").option("path", path).saveAsTable(
        "jl_orders_stats"
    )
    spark.sql(
        "ANALYZE TABLE jl_orders_stats COMPUTE STATISTICS FOR COLUMNS "
        + ", ".join(cols)
    )

    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    exact = orders.agg(*aggs).collect()[0]

    rows = []
    for c in cols:
        desc = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(f"DESCRIBE EXTENDED jl_orders_stats {c}").collect()
        }
        s_min, s_max = int(desc["min"]), int(desc["max"])
        s_nulls, s_ndv = int(desc["num_nulls"]), int(desc["distinct_count"])
        e_min, e_max = exact[f"{c}__min"], exact[f"{c}__max"]
        e_ndv = exact[f"{c}__ndv"]
        rows.append(
            (
                c,
                int(e_min),
                int(e_max),
                int(e_ndv),
                s_min == e_min,
                s_max == e_max,
                s_nulls == 0,
                abs(s_ndv - e_ndv) * 100 <= e_ndv * 10,
            )
        )
    spark.sql("DROP TABLE IF EXISTS jl_orders_stats")
    return spark.createDataFrame(
        rows,
        "col_name string, exact_min long, exact_max long, exact_ndv long, "
        "stats_min_ok boolean, stats_max_ok boolean, stats_nulls_ok boolean, "
        "stats_ndv_ok boolean",
    ).orderBy("col_name")


_CAT_STATS_ORACLE = """
SELECT col_name,
       CAST(exact_min AS BIGINT) AS exact_min,
       CAST(exact_max AS BIGINT) AS exact_max,
       CAST(exact_ndv AS BIGINT) AS exact_ndv,
       TRUE AS stats_min_ok, TRUE AS stats_max_ok,
       TRUE AS stats_nulls_ok, TRUE AS stats_ndv_ok
FROM (
  SELECT 'o_orderkey' AS col_name, min(o_orderkey) AS exact_min,
         max(o_orderkey) AS exact_max, count(DISTINCT o_orderkey) AS exact_ndv
  FROM orders
  UNION ALL
  SELECT 'o_custkey', min(o_custkey), max(o_custkey), count(DISTINCT o_custkey)
  FROM orders
)
ORDER BY col_name
"""


QUERIES = {
    "profile_table": profile_table,
    "profile_table_approx_checked": profile_table_approx_checked,
    "profile_catalog_stats": profile_catalog_stats,
    "dq_expectations": dq_expectations,
}

_PROFILE_ORACLE = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM orders
    """
    for c in _PROFILE_COLS
)

ORACLES = {
    "profile_table": f"SELECT * FROM ({_PROFILE_ORACLE}) ORDER BY column_name",
    "profile_catalog_stats": _CAT_STATS_ORACLE,
    # exact stats pinned + TRUE: a drifting HLL++ estimate fails the
    # value hash, not just a pytest tolerance assert
    "profile_table_approx_checked": (
        f"SELECT *, TRUE AS approx_ndv_ok FROM ({_PROFILE_ORACLE})"
        " ORDER BY column_name"
    ),
    "dq_expectations": """
        WITH rules AS (
          SELECT 'orders.o_totalprice_nonnegative' AS rule_name,
                 CAST(count(*) AS BIGINT) AS n_checked,
                 CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations
          FROM orders
          UNION ALL
          SELECT 'orders.o_orderkey_unique',
                 CAST(count(*) AS BIGINT),
                 CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'orders.o_orderstatus_in_domain',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'orders.o_orderdate_not_null',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT)
          FROM orders
          UNION ALL
          SELECT 'lineitem.l_quantity_in_range',
                 CAST(count(*) AS BIGINT),
                 CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'lineitem.l_orderkey_fk_orders',
                 CAST(count(*) AS BIGINT),
                 CAST((SELECT count(*) FROM lineitem l
                       WHERE NOT EXISTS (SELECT 1 FROM orders o
                                         WHERE o.o_orderkey = l.l_orderkey))
                      AS BIGINT)
          FROM lineitem
        )
        SELECT rule_name, n_checked, n_violations,
               n_violations = 0 AS passed
        FROM rules ORDER BY rule_name
    """,
}
