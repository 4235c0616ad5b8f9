"""Runtime bloom-filter join pruning: when a selective filter sits on
the build side of a shuffle join, Catalyst injects a bloom filter of
the build-side keys into the probe-side scan, so most of the big
fact's rows die before the exchange — the runtime analog of static
predicate pushdown, and a first-order win at 100 TB where the probe
side dwarfs the filtered build side."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from end_to_end_data_engineering_job_listings_etl_spark.catalog import load_table
from tests.conftest import SF_DIR

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def _confs(spark, pairs):
    saved = {}
    for k, v in pairs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_filter_injected_and_result_exact(spark):
    with _confs(spark, _CONFS):
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_totalprice") > 450_000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in opt or "bloomfilter" in opt
        got = {r["o_orderpriority"]: r["n"] for r in j.collect()}

    # Exactness: the bloom filter only prunes, never changes results.
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice") > 450_000
    )
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    want = {r["o_orderpriority"]: r["n"] for r in plain.collect()}
    assert got == want and len(got) > 0
