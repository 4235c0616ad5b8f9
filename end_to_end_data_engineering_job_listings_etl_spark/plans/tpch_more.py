"""Fact-scale decision-support shapes, round 2: the TPC-H query
patterns the round-1 surface didn't yet cover — ratio-of-sums market
share, conditional promo share, lateness buckets, outer-join count
distributions, HAVING-gated semi joins, disjunctive multi-column join
predicates, scalar-subquery thresholds and argmax selection.

The reference's BI layer (superset.db `query` rows 8-14) stops at
single-table group-bys and star joins; these extend the same warehouse
surface to the shapes a 100 TB deployment actually runs. Every query
is decimal/integer-exact cross-engine:

- Money flows through ``decimal`` casts BEFORE arithmetic (same
  discipline as plans/pricing.py — engines agree on raw-column casts,
  not on rounding computed doubles).
- Ratios are emitted as ``*_e6`` integers: ``floor(num * 1000000.0 /
  den)`` where num/den are exact integers < 2^53, so the double
  division is the same correctly-rounded IEEE op in Spark and DuckDB
  and its floor is bit-identical (the round-1 pr_e6 / idf_e6 trick).

Scale shapes: each query's only unavoidable shuffle is its group-by;
dims broadcast; HAVING-gated semis shuffle the fact once on the join
key; the disjunctive part join broadcasts the filtered part side
rather than falling into a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def _rev_e4(price_col: str = "l_extendedprice", disc_col: str = "l_discount"):
    """Discounted revenue in exact 1e-4 units as BIGINT.

    decimal(12,2) * decimal(3,2) has scale 4, so scaling by 10^4 is an
    exact integer — the cross-engine-stable currency for ratio math."""
    rev = F.col(price_col).cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col(disc_col).cast("decimal(4,2)")
    )
    return (rev * F.lit(10000)).cast("bigint")


_REV_E4_SQL = (
    "CAST(CAST({p} AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - "
    "CAST({d} AS DECIMAL(4,2))) * 10000 AS BIGINT)"
).format(p="l_extendedprice", d="l_discount")


def li_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: of all revenue billed to EUROPE
    customers per order year, the e6 fraction supplied by NATION_7.

    Plan shape: nation/region/supplier dims broadcast onto orders and
    lineitem; one shuffle joins the two facts on orderkey; the ratio is
    a conditional-sum over the same grouped pass (no second scan or
    self-join for the denominator)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("cn_nationkey"))
    customers = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(cust_nations), F.col("c_nationkey") == F.col("cn_nationkey"))
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(customers), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supplier.select("s_suppkey", "n_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    grouped = li.groupBy("o_year").agg(
        F.sum(F.when(F.col("n_name") == "NATION_7", _rev_e4()).otherwise(F.lit(0)))
        .alias("nation_rev_e4"),
        F.sum(_rev_e4()).alias("total_rev_e4"),
    )
    return grouped.select(
        "o_year",
        "nation_rev_e4",
        "total_rev_e4",
        F.floor(
            F.col("nation_rev_e4").cast("double")
            * F.lit(1000000.0)
            / F.col("total_rev_e4").cast("double")
        ).cast("bigint").alias("mkt_share_e6"),
    )


def li_promo_share_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo share per order month of 1997: revenue
    from PROMO-type parts as an e6 fraction of all revenue.

    Part is a broadcast dim carrying only (partkey, is_promo); the
    conditional sum and total come out of one grouped pass."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    grouped = joined.groupBy(F.month("l_shipdate").alias("ship_month")).agg(
        F.sum(F.when(F.col("is_promo"), _rev_e4()).otherwise(F.lit(0))).alias(
            "promo_rev_e4"
        ),
        F.sum(_rev_e4()).alias("total_rev_e4"),
    )
    return grouped.select(
        "ship_month",
        "promo_rev_e4",
        "total_rev_e4",
        F.floor(
            F.col("promo_rev_e4").cast("double")
            * F.lit(1000000.0)
            / F.col("total_rev_e4").cast("double")
        ).cast("bigint").alias("promo_share_e6"),
    )


def li_lateness_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-lateness check: lineitems shipped more
    than 90 days after their order date, counted per line-status with
    high-priority (1-URGENT/2-HIGH) vs lower-priority order splits.

    One shuffle joins fact to fact on orderkey; the lateness predicate
    is a join residual, the priority split a conditional sum."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(high.cast("bigint")).alias("high_priority_count"),
        F.sum((~high).cast("bigint")).alias("low_priority_count"),
    )


def cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: per-customer
    order counts through a LEFT OUTER join (customers with no orders
    count 0), then the histogram of those counts.

    Two shuffles by construction (count per customer, then count per
    count) — both on low-skew keys; the excluded-priority predicate
    filters the fact before the join."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def li_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: top 20 customers by
    revenue lost to returns (l_returnflag = 'R') in 1996H2+, with their
    nation. Customer and nation broadcast; the one shuffle is the
    orderkey fact-fact join feeding a custkey group-by."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_e4()).alias("lost_rev_e4"))
        .orderBy(F.desc("lost_rev_e4"), F.asc("c_custkey"))
        .limit(20)
    )


def li_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: orders whose total
    lineitem quantity exceeds 250, with customer name and order facts.

    The HAVING gate runs as a partial-agg group-by on the fact BEFORE
    any dim joins — the surviving key set is tiny, so everything
    downstream broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    # l_quantity is integer-valued (1..50) so a bigint sum is exact —
    # and BIGINT is the cross-engine-stable output type (a DECIMAL
    # total always ends ".00" here and the driver hashes it as
    # float64 on the DuckDB side).
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"), "total_qty")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.big_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("o_totalprice_e2"),
            "total_qty",
        )
    )


def li_disjunctive_part_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive join: revenue from lineitems whose
    part matches any of three independent (brand, size, quantity)
    clauses. The OR spans both join sides, so a naive plan degenerates
    to a nested loop — instead the part side pre-filters to the union
    of part-only predicates, broadcasts, and the cross-side residual
    evaluates inside the hash join."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    part_any = part.filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
        | (F.col("p_type") == "PROMO")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    clause = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 20))
    return (
        li.join(F.broadcast(part_any), li.l_partkey == F.col("p_partkey"))
        .filter(clause)
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count("*").alias("n_lineitems"),
        )
    )


def cust_idle_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped idle-wealth report: customers with an account
    balance above the positive-balance average who placed no orders,
    counted per nation with their total balance.

    The average is an integer-cents floor (sum_cents DIV n) computed in
    one tiny agg and cross-joined (broadcast of a single row); "no
    orders" is a left_anti against the orders key projection."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("bigint").alias(
            "bal_cents"
        ),
    )
    thresh = (
        cust.filter(F.col("bal_cents") > 0)
        # floor() before the integer cast: Spark's double→bigint cast
        # truncates but DuckDB's rounds — floor makes both exact.
        .agg(
            F.floor(F.sum("bal_cents") / F.count("*"))
            .cast("bigint")
            .alias("avg_cents")
        )
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("bal_cents") > F.col("avg_cents"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("bal_cents").alias("total_bal_cents"),
        )
    )


def li_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: per-supplier 1997 revenue, keep
    the supplier(s) achieving the global maximum (argmax via a
    broadcast single-row max, not a window over one partition)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(_rev_e4()).alias("total_rev_e4")
    )
    max_rev = per_supp.agg(F.max("total_rev_e4").alias("max_rev_e4"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev_e4") == F.col("max_rev_e4"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
    )


QUERIES = {
    "li_market_share": li_market_share,
    "li_promo_share_monthly": li_promo_share_monthly,
    "li_lateness_by_class": li_lateness_by_class,
    "cust_order_distribution": cust_order_distribution,
    "li_returned_top_customers": li_returned_top_customers,
    "li_big_orders": li_big_orders,
    "li_disjunctive_part_join": li_disjunctive_part_join,
    "cust_idle_above_avg": cust_idle_above_avg,
    "li_top_supplier": li_top_supplier,
}

ORACLES = {
    "li_market_share": f"""
        WITH eu_cust AS (
            SELECT c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        ), base AS (
            SELECT year(o_orderdate) AS o_year,
                   {_REV_E4_SQL} AS rev_e4,
                   n.n_name AS supp_nation
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN eu_cust ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n ON s_nationkey = n.n_nationkey
        )
        SELECT o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_e4 ELSE 0 END) AS BIGINT) AS nation_rev_e4,
               CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4,
               CAST(floor(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev_e4 ELSE 0 END) AS DOUBLE)
                          * 1000000.0
                          / CAST(sum(rev_e4) AS DOUBLE)) AS BIGINT) AS mkt_share_e6
        FROM base GROUP BY o_year
    """,
    "li_promo_share_monthly": f"""
        SELECT month(l_shipdate) AS ship_month,
               CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_E4_SQL} ELSE 0 END) AS BIGINT) AS promo_rev_e4,
               CAST(sum({_REV_E4_SQL}) AS BIGINT) AS total_rev_e4,
               CAST(floor(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_E4_SQL} ELSE 0 END) AS DOUBLE)
                          * 1000000.0
                          / CAST(sum({_REV_E4_SQL}) AS DOUBLE)) AS BIGINT) AS promo_share_e6
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY month(l_shipdate)
    """,
    "li_lateness_by_class": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_linestatus
    """,
    "cust_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "li_returned_top_customers": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(sum({_REV_E4_SQL}) AS BIGINT) AS lost_rev_e4
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_rev_e4 DESC, c_custkey
        LIMIT 20
    """,
    "li_big_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS o_totalprice_e2,
               CAST(big.total_qty AS BIGINT) AS total_qty
        FROM orders
        JOIN (SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(l_quantity AS BIGINT)) > 250) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "li_disjunctive_part_join": f"""
        SELECT CAST(sum({_REV_E4_SQL}) AS BIGINT) AS revenue_e4,
               count(*) AS n_lineitems
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_type = 'PROMO' AND l_quantity >= 20)
    """,
    "cust_idle_above_avg": """
        WITH bal AS (
            SELECT c_custkey, c_nationkey,
                   CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_cents
            FROM customer
        ), thresh AS (
            SELECT CAST(floor(CAST(sum(bal_cents) AS DOUBLE) / count(*)) AS BIGINT) AS avg_cents
            FROM bal WHERE bal_cents > 0
        )
        SELECT c_nationkey, count(*) AS n_customers,
               CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
        FROM bal, thresh
        WHERE bal_cents > avg_cents
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
    "li_top_supplier": f"""
        WITH per_supp AS (
            SELECT l_suppkey, sum({_REV_E4_SQL}) AS total_rev_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev_e4 AS BIGINT) AS total_rev_e4
        FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM per_supp)
    """,
}
