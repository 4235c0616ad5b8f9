"""Sort-clustered data layout → parquet min/max (row-group + page
index) skipping: range-partition + sortWithinPartitions on the filter
key lets a pushed range predicate decode a fraction of the rows a
randomly-laid-out copy decodes. This is the write-time layout lever
that turns O(table) scans into O(result) scans at 100 TB.

Observed caveat pinned here: TIMESTAMP_NTZ predicates reach
PushedFilters but do NOT engage parquet stats skipping in this Spark
build — cluster on an int64 key (or derived epoch) for skipping.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
from tests.conftest import SF_DIR


def _scan_metrics(df):
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        out = []
        if "Scan" in node.nodeName():
            m = node.metrics()
            it = m.iterator()
            d = {}
            while it.hasNext():
                kv = it.next()
                d[kv._1()] = kv._2().value()
            out.append(d)
        for i in range(node.children().size()):
            out += walk(node.children().apply(i))
        return out

    return walk(plan)


def test_sorted_layout_prunes_row_groups(spark):
    orders = load_table(spark, SF_DIR, "orders")
    total = orders.count()
    base = tempfile.mkdtemp(prefix="layout_")
    sorted_path = os.path.join(base, "sorted")
    rand_path = os.path.join(base, "rand")
    (
        orders.repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    orders.repartition(8, "o_custkey").write.mode("overwrite").parquet(rand_path)

    # a narrow slice of the keyspace (~5%), so a clustered layout can
    # serve it from one file while the random layout touches all
    hi_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    lo, hi = int(hi_key * 0.10), int(hi_key * 0.15)
    pred = F.col("o_orderkey").between(lo, hi)
    s_df = spark.read.parquet(sorted_path).filter(pred)
    r_df = spark.read.parquet(rand_path).filter(pred)

    s_rows = _scan_metrics(s_df)[0]["numOutputRows"]
    r_rows = _scan_metrics(r_df)[0]["numOutputRows"]

    # identical results, far fewer rows decoded from the sorted layout
    assert sorted(r["o_orderkey"] for r in s_df.collect()) == sorted(
        r["o_orderkey"] for r in r_df.collect()
    )
    assert r_rows == total
    assert s_rows < 0.5 * r_rows, (s_rows, r_rows)


def test_zorder_layout_prunes_on_both_dimensions(spark):
    """A z-ordered (bit-interleaved) layout skips row groups for
    narrow predicates on EITHER participating column; a single-sort
    layout only prunes its own sort column (asserted above)."""
    from end_to_end_data_engineering_job_listings_etl_spark.functions.layout import write_zordered

    orders = load_table(spark, SF_DIR, "orders")
    total = orders.count()
    ok_hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    ck_hi = orders.agg(F.max("o_custkey")).collect()[0][0]
    path = os.path.join(tempfile.mkdtemp(prefix="layout_z_"), "zord")
    write_zordered(orders, path, ["o_orderkey", "o_custkey"], [ok_hi, ck_hi])

    back = spark.read.parquet(path)
    assert back.count() == total

    def decoded(col, lo, hi):
        df = spark.read.parquet(path).filter(F.col(col).between(lo, hi))
        return _scan_metrics(df)[0]["numOutputRows"]

    ok_rows = decoded("o_orderkey", int(ok_hi * 0.40), int(ok_hi * 0.50))
    ck_rows = decoded("o_custkey", int(ck_hi * 0.40), int(ck_hi * 0.50))
    assert ok_rows < 0.8 * total, (ok_rows, total)
    assert ck_rows < 0.8 * total, (ck_rows, total)
