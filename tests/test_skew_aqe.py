"""AQE skew-join splitting, demonstrated and plan-asserted.

The engine's posture for skewed joins is: don't hand-schedule — let
adaptive execution detect the oversized partition at runtime and split
it (`spark.sql.adaptive.skewJoin`). This test builds a join where one
key owns ~90% of the probe side, forces sort-merge (no broadcast
escape hatch), lowers the skew thresholds so sf-test data can trip
them, and asserts the executed plan actually marked the join skewed —
the `isSkewJoin=true` / `skew=true` marker, not just a green result.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        # force the skew path to be observable at test scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        n = 40_000
        probe = spark.range(n).select(
            F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("pay"),
        )
        build = spark.range(200).select(
            F.col("id").alias("k"), F.lit("dim").alias("attr")
        )
        # a global agg after the join does NOT require the join's hash
        # partitioning, so AQE is free to split the skewed partition
        # (with a groupBy(k) downstream it would skip the optimization
        # rather than re-shuffle — that's the documented trade-off)
        joined = probe.join(build, "k").agg(
            F.count("*").alias("n"), F.sum(F.length("pay")).alias("bytes")
        )
        row = joined.collect()[0]
        # hot rows (k=7) all match; cold rows k=id match only below 200
        expected = sum(
            1 for i in range(n) if i % 10 != 0 or (i % 10 == 0 and i < 200)
        )
        assert row["n"] == expected
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan or "isSkewJoin=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
