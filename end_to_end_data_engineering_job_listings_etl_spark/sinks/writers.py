"""Sink operators.

Reference analogs (SURVEY.md §2.2):
- K5 partitioned parquet append
  (``scripts/pyspark/extract_postgres_table.py:68-70``) →
  ``write_partitioned_parquet`` — the engine's primary sink; Hive-style
  ``country=/load_date=`` layout gives static + dynamic partition
  pruning downstream.
- K2/K4 truncate-and-load (``dags/test_extraction.py:170-182``;
  ``dags/spark_etl_script.py:31-39``) → ``overwrite_parquet_table``.
- K3/K6/K8 append loads → ``append_parquet_table`` (never
  row-at-a-time: the reference's executemany loop is an anti-pattern
  Spark replaces with a parallel file write).
- K1 CSV export (``dags/test_extraction.py:156``) → ``write_csv``.
- The reference's count()+save() double action (``:32-38``) is
  collapsed: ``write_counted`` writes once and takes the row count
  from parquet footer metadata on re-read (a metadata-only job, no
  second scan of the data)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str], mode: str = "append"
) -> None:
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def overwrite_parquet_table(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").parquet(path)


def append_parquet_table(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)


def write_counted(df: DataFrame, spark: SparkSession, path: str) -> int:
    """Overwrite-write then report rows from footer metadata — one data
    pass total (vs the reference's two full computations)."""
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).count()
