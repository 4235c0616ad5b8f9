"""Skew-aware aggregation: salted two-phase distinct counts.

Scale problem: ``groupBy(hot_key).agg(countDistinct(v))`` sends every
row of a hot key to ONE reducer. Salting by ``hash(v) % B`` splits
each key into B buckets — and because each distinct value maps to
exactly one bucket, per-bucket distinct counts sum to the exact total.
Two narrow shuffles, no single hot reducer, exact answer.

(For non-decomposable aggs AQE's skew-join splitting handles joins;
this operator covers the aggregation side.)"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame, key: str, value: str, buckets: int = 32
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key, skew-split across
    ``buckets`` reducers per key."""
    salted = df.select(
        F.col(key),
        F.col(value),
        F.pmod(F.hash(F.col(value)), F.lit(buckets)).alias("__salt"),
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.countDistinct(value).alias("__partial")
    )
    return partial.groupBy(key).agg(
        F.sum("__partial").cast("bigint").alias("n_distinct")
    )
