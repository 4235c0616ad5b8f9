"""Fact-scale decision-support shapes, round 3: the remaining classic
TPC-H query patterns — EXISTS-gated priority counts (Q4), the pure
filter-aggregate forecast (Q6), bidirectional nation-pair volume
shipping (Q7), product-profit rollup (Q9, reshaped: the synthetic
schema has no partsupp, so supply cost derives from p_retailprice),
and the correlated avg-quantity threshold (Q17).

Same cross-engine-exactness discipline as plans/tpch_more.py: money
flows through decimal casts before arithmetic and lands as ``*_e4``
/ ``*_e2`` scaled BIGINTs; quantities are integer-valued doubles and
compare exactly after integer scaling, so every oracle hash is
bit-stable.

Scale shapes (100 TB posture):
- Q4: orders filtered to one quarter BEFORE the semi join, so the
  shuffle carries the quarter only; the semi's residual condition
  (shipdate > orderdate) evaluates inside the join, no post-filter
  blowup.
- Q6: single scan, filter fully pushed to parquet (range predicates
  on shipdate/discount/quantity), one partial+final agg — the
  cheapest shape Spark has.
- Q7/Q9: nation-filtered supplier/customer dims collapse to tiny
  broadcast sides; the only big shuffle is lineitem ⋈ orders on
  orderkey, then one grouped pass.
- Q17: per-part avg via one hash agg on the (already part-filtered)
  lineitem slice, broadcast back — the correlated subquery never
  re-scans the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .tpch_more import _REV_E4_SQL, _rev_e4


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: for 1997-Q1 orders, count per priority the
    orders with at least one lineitem shipped AFTER the order date
    (the schema's analog of commit<receipt lateness). EXISTS becomes a
    left_semi join with a residual non-equi condition."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue increase forecast — one filtered scan, one
    aggregate. ``revenue = sum(extendedprice * discount)`` over 1997
    shipments with discount in [0.05, 0.07] and quantity < 24.
    decimal(12,2) × decimal(4,2) has scale 4 ⇒ the e4 integer is
    exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return li.agg(
        (F.sum(rev) * F.lit(10000)).cast("bigint").alias("revenue_e4"),
        F.count("*").alias("n_lineitems"),
    )


_Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped volume between two nations, both
    directions, per ship year. The nation-filtered supplier and
    customer sides are tiny (broadcast); lineitem ⋈ orders on orderkey
    is the one real shuffle; the cross-direction filter keeps only
    (N1→N2) and (N2→N1) flows."""
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*_Q7_NATIONS)
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "cust_nation"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        li.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(F.sum(_rev_e4()).alias("volume_e4"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in the synthetic schema): per
    supplier nation and order year, profit over 'widget' parts —
    ``sum(rev - p_retailprice*quantity/10)``, retail-derived cost in
    place of ps_supplycost. All decimal: retailprice(12,2) ×
    qty(12,2 — integer-valued) ⇒ scale 4, /10 folded into the e4
    scaling as ×1000, exact."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    ).select("p_partkey", "p_retailprice")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    cost_e4 = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit(1000)
    ).cast("bigint")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        li.groupBy("supp_nation", "o_year")
        .agg(F.sum(_rev_e4() - cost_e4).alias("profit_e4"))
        .orderBy("supp_nation", "o_year")
    )


_Q17_BRAND = "Brand#13"


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small orders — lineitems of
    one brand whose quantity is below 20% of that part's average
    quantity. The correlated subquery is one hash agg over the
    brand-filtered slice, broadcast back; the threshold compares in
    exact integers: qty < 0.2·avg ⇔ 5·qty·cnt < sum (quantities are
    integer-valued)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == _Q17_BRAND
    ).select("p_partkey")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    qty = F.col("l_quantity").cast("bigint")
    stats = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"), F.count("*").alias("cnt_qty")
    )
    small = li.join(F.broadcast(stats), "l_partkey").filter(
        qty * F.lit(5) * F.col("cnt_qty") < F.col("sum_qty")
    )
    return small.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(12,2)")) * F.lit(100))
        .cast("bigint")
        .alias("small_rev_e2"),
        F.count("*").alias("n_small"),
    )


QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "q17_small_quantity": q17_small_quantity,
}

ORACLES = {
    "q4_order_priority": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": """
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)
                 AS revenue_e4,
               count(*) AS n_lineitems
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(sum({_REV_E4_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS BIGINT) AS volume_e4
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        WHERE sn.n_name IN ('NATION_1', 'NATION_2')
          AND cn.n_name IN ('NATION_1', 'NATION_2')
          AND sn.n_name != cn.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "q9_product_profit": f"""
        SELECT sn.n_name AS supp_nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum({_REV_E4_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                   - CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
                          * CAST(l.l_quantity AS DECIMAL(12,2)) * 1000 AS BIGINT))
                 AS BIGINT) AS profit_e4
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%widget%'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q17_small_quantity": """
        WITH branded AS (
          SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_brand = 'Brand#13'
        ), stats AS (
          SELECT l_partkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
                 count(*) AS cnt_qty
          FROM branded GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(b.l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                 AS small_rev_e2,
               count(*) AS n_small
        FROM branded b JOIN stats s ON b.l_partkey = s.l_partkey
        WHERE CAST(b.l_quantity AS BIGINT) * 5 * s.cnt_qty < s.sum_qty
    """,
}
