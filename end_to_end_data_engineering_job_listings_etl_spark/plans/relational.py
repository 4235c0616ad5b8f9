"""Relational edge semantics, round 2: the SQL corners where engines
silently disagree unless handled deliberately — multiset (ALL) set
operations, null-safe equality joins, three-valued NOT IN logic,
anti-join null behavior, relational division, correlated-scalar
decorrelation, and multi-DISTINCT aggregates.

The reference never leaves inner/left equi joins and plain DISTINCT
(SURVEY.md §2.5/§2.10: "no semi/anti in live code... no set ops"), but
a warehouse user migrating real SQL onto this engine hits every one of
these within a week. Each query pins the standard's semantics against
the DuckDB oracle.

Scale shapes: set ops hash-partition on the full row (one shuffle);
the null-poisoned NOT IN is a broadcast of a 1-row guard; relational
division is a partial-agg group-by; none of these touch a window or a
nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, load_tables


def set_except_all_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference): order priorities of finished
    ('F') orders minus, occurrence-for-occurrence, those of open ('O')
    orders. Bag semantics — a priority with 40 F-rows and 30 O-rows
    survives exactly 10 times (DISTINCT-based EXCEPT would emit 0/1)."""
    orders = load_table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f_side.exceptAll(o_side)


def set_intersect_all_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection): min(count_F, count_O)
    occurrences of each priority."""
    orders = load_table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f_side.intersectAll(o_side)


def _nullable_status(col: str):
    """'P' → NULL, else passthrough — a deterministic nullable key."""
    return F.when(F.col(col) == "P", F.lit(None)).otherwise(F.col(col))


def rel_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): both sides
    carry a NULL-bearing key ('P' status nulled out); NULL matches NULL
    exactly once per pair instead of being dropped.

    Plan shape: still a hash join — Spark's EqualNullSafe keys hash
    like any other; no fallback to nested loop."""
    orders = load_table(spark, sf_dir, "orders").select(
        _nullable_status("o_orderstatus").alias("status_key")
    )
    statuses = (
        load_table(spark, sf_dir, "orders")
        .select(_nullable_status("o_orderstatus").alias("rhs_key"))
        .distinct()
    )
    return (
        orders.join(statuses, orders.status_key.eqNullSafe(statuses.rhs_key))
        .groupBy("rhs_key")
        .agg(F.count("*").alias("n_matched"))
    )


def rel_not_in_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a null-free subquery: customers who never placed a
    pending ('P') order. With no NULLs in the subquery, NOT IN is an
    anti join and returns real rows."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        """
    )


def rel_not_in_null_poison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a subquery containing a NULL: three-valued logic
    makes `x NOT IN (..., NULL)` never TRUE, so the count is 0 — the
    classic silent-wrong-answer trap NOT EXISTS avoids. Both engines
    must agree on the standard here; the oracle proves it.

    Scale shape: Spark plans this as a null-aware anti join with a
    broadcast one-row null guard — not a per-row subquery."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                           ELSE o_custkey END
               FROM orders)
        """
    )


def rel_anti_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_anti with a NULL-bearing probe key: equality is
    null-rejecting, so NULL-keyed rows never match and are always
    KEPT — the NOT EXISTS (not the NOT IN) semantics. Counts survivors
    by whether their key was null."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _nullable_status("o_orderstatus").alias("status_key")
    )
    present = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select(F.col("o_orderstatus").alias("rhs_status"))
        .distinct()
    )
    return (
        orders.join(present, orders.status_key == present.rhs_status, "left_anti")
        .groupBy(F.col("status_key").isNull().alias("key_was_null"))
        .agg(F.count("*").alias("n_rows"))
    )


def rel_division_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division (FOR ALL): customers who have placed at
    least one order in EVERY priority class. Expressed as a partial-agg
    distinct-count against the (broadcast, 1-row) universe count — one
    shuffle, no per-divisor join chain."""
    orders = load_table(spark, sf_dir, "orders")
    n_prios = orders.select("o_orderpriority").distinct().agg(
        F.count("*").alias("n_prios")
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.count_distinct("o_orderpriority").alias("n_cust_prios")
    )
    return (
        per_cust.crossJoin(F.broadcast(n_prios))
        .filter(F.col("n_cust_prios") == F.col("n_prios"))
        .select("o_custkey", "n_cust_prios")
    )


def rel_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated: each customer's
    maximum order price, for customers whose max tops 400000. The
    DataFrame side runs the decorrelated plan (group-by then join —
    what any optimizer must reach); the oracle keeps the correlated
    form, proving the rewrite is semantics-preserving."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_e2"),
    )
    max_per_cust = orders.groupBy("o_custkey").agg(
        F.max("price_e2").alias("max_price_e2")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        max_per_cust.filter(F.col("max_price_e2") > 40000000)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "max_price_e2")
    )


def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one GROUP BY: per order status,
    distinct customers, distinct priorities, and plain counts/sums.

    Scale shape: Spark plans this with an Expand (one row replica per
    distinct column set) — the row multiplication is the price of
    single-pass multi-distinct and is the right trade until cardinality
    demands approx sketches (agg_approx_distinct covers that end)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("total_price_e2"),
    )


QUERIES = {
    "set_except_all_priority": set_except_all_priority,
    "set_intersect_all_priority": set_intersect_all_priority,
    "rel_nullsafe_join": rel_nullsafe_join,
    "rel_not_in_plain": rel_not_in_plain,
    "rel_not_in_null_poison": rel_not_in_null_poison,
    "rel_anti_null_semantics": rel_anti_null_semantics,
    "rel_division_all_priorities": rel_division_all_priorities,
    "rel_correlated_scalar": rel_correlated_scalar,
    "agg_multi_distinct": agg_multi_distinct,
}

ORACLES = {
    "set_except_all_priority": """
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
    "set_intersect_all_priority": """
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
    "rel_nullsafe_join": """
        WITH lhs AS (
            SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                        ELSE o_orderstatus END AS status_key
            FROM orders
        ), rhs AS (
            SELECT DISTINCT CASE WHEN o_orderstatus = 'P' THEN NULL
                                 ELSE o_orderstatus END AS rhs_key
            FROM orders
        )
        SELECT rhs_key, count(*) AS n_matched
        FROM lhs JOIN rhs ON lhs.status_key IS NOT DISTINCT FROM rhs.rhs_key
        GROUP BY rhs_key
    """,
    "rel_not_in_plain": """
        SELECT count(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
    "rel_not_in_null_poison": """
        SELECT count(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                           ELSE o_custkey END
               FROM orders)
    """,
    "rel_anti_null_semantics": """
        WITH lhs AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderstatus = 'P' THEN NULL
                        ELSE o_orderstatus END AS status_key
            FROM orders
        ), rhs AS (
            SELECT DISTINCT o_orderstatus AS rhs_status
            FROM orders WHERE o_orderstatus <> 'F'
        )
        SELECT status_key IS NULL AS key_was_null, count(*) AS n_rows
        FROM lhs
        WHERE NOT EXISTS (SELECT 1 FROM rhs WHERE lhs.status_key = rhs.rhs_status)
        GROUP BY status_key IS NULL
    """,
    "rel_division_all_priorities": """
        SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_cust_prios
        FROM orders
        GROUP BY o_custkey
        HAVING count(DISTINCT o_orderpriority) =
               (SELECT count(DISTINCT o_orderpriority) FROM orders)
    """,
    "rel_correlated_scalar": """
        SELECT c_custkey, c_name,
               (SELECT max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                FROM orders WHERE o_custkey = c_custkey) AS max_price_e2
        FROM customer
        WHERE (SELECT max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
               FROM orders WHERE o_custkey = c_custkey) > 40000000
    """,
    "agg_multi_distinct": """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(DISTINCT o_orderpriority) AS n_priorities,
               count(*) AS n_orders,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS total_price_e2
        FROM orders
        GROUP BY o_orderstatus
    """,
}
