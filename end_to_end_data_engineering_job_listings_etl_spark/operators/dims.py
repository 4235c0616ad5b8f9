"""Dimension builder: project → normalize → drop-null → distinct →
surrogate key.

Reference analog: the seven dimension subplans at
``dags/spark_etl_script.py:92-144`` — each is
``select(normalized).filter(isNotNull).distinct()`` plus
``row_number().over(Window.orderBy(key))`` for the surrogate key
(:95,:100,:105,:110,:130,:144).

Three SK modes (SURVEY.md §7.3):
- ``mode="range"`` (default): the scale path with reference-exact
  VALUES — ``operators.ids.ranked_ids`` computes the same global
  ``row_number`` via range repartition + in-partition windows +
  prefix offsets, so no single-partition exchange exists anywhere in
  the plan and every ANSI-SQL ``row_number() OVER (ORDER BY key)``
  oracle still matches cell-for-cell.
- ``mode="global"``  : the literal reference plan — ``row_number``
  over a global ORDER BY, i.e. a one-partition WindowExec. Kept as
  the opt-in parity mode; do not use above ~10M distinct keys.
- ``mode="bucketed"``: md5-hash-bucketed dense ids (two narrow
  shuffles). Keys are dense and deterministic for a given
  (data, n_buckets) but NOT in global sort order — the variant for
  engines whose oracle must reproduce bucket assignment instead of a
  sort (kept oracle-checkable via the portable md5 bucket hash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ids import ranked_ids


def build_dim(
    df: DataFrame,
    key_exprs: Sequence[Column],
    sk_name: str,
    mode: str = "range",
    n_buckets: int = 256,
) -> DataFrame:
    """Build a dimension from normalized natural-key expressions.

    ``key_exprs`` must be aliased columns; nulls in the FIRST key column
    are rejected (reference P2 semantics: one natural key per dim, the
    multi-column location dim filters on its first column only —
    ``dags/spark_etl_script.py:109``).
    """
    projected = df.select(*key_exprs)
    key_names = list(projected.columns)
    distinct = projected.filter(F.col(key_names[0]).isNotNull()).distinct()
    if mode == "range":
        # pin_input=False: the distinct is a shuffle whose map output
        # Spark reuses across the sampling and exchange jobs (skipped
        # stages), so checkpointing it first only adds a job.
        return ranked_ids(
            distinct, key_names, sk_name, pin_input=False
        ).select(sk_name, *key_names)
    if mode == "global":
        w = Window.orderBy(*key_names)
        return distinct.select(
            F.row_number().over(w).alias(sk_name), *key_names
        )
    if mode == "bucketed":
        # Dense ids without a single-partition sort: row_number within a
        # hash bucket, then add the running count of all lower buckets.
        # Bucket hash is md5-based (not Murmur) so the assignment is
        # portable across engines — the scale path stays oracle-checkable.
        bucket = F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws("\x1f", *key_names)), 1, 8), 16, 10)
            .cast("long"),
            F.lit(n_buckets),
        ).alias("__bucket")
        bucketed = distinct.select(bucket, *key_names)
        w_in = Window.partitionBy("__bucket").orderBy(*key_names)
        counts = bucketed.groupBy("__bucket").count()
        # ≤ n_buckets rows: exclusive prefix counts via a broadcast
        # triangular self-join — a cumulative window here would plan a
        # single-partition exchange (constant partition keys fold away).
        ca, cb = counts.alias("ca"), counts.alias("cb")
        offsets = (
            ca.join(
                F.broadcast(cb), F.col("cb.__bucket") < F.col("ca.__bucket"), "left"
            )
            .groupBy(F.col("ca.__bucket").alias("__bucket"))
            .agg(F.coalesce(F.sum("cb.count"), F.lit(0)).alias("__offset"))
        )
        return (
            bucketed.withColumn("__rn", F.row_number().over(w_in))
            .join(F.broadcast(offsets), "__bucket")
            .select(
                (F.col("__rn") + F.col("__offset")).cast("int").alias(sk_name),
                *key_names,
            )
        )
    raise ValueError(f"unknown surrogate-key mode: {mode}")
