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


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
) -> int:
    """Small-files compaction: rewrite a fragmented parquet directory
    into ceil(total_bytes / target_bytes) files. The standard cure for
    the small-files problem — thousands of tiny files turn a 100 TB
    scan into a metadata/NameNode stampede and a task-per-file
    scheduling storm. Returns the output file count.

    Sizing reads the source directory's actual on-disk bytes through
    the Hadoop FileSystem API (metadata only, no data scan — and the
    same call works on HDFS/S3A, not just local paths); the rewrite
    itself is one repartition — the single shuffle buys every later
    scan its right-sized splits."""
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = src.getFileSystem(hconf)
    total = fs.getContentSummary(src).getLength()
    n_files = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst_path)
    dst = jvm.org.apache.hadoop.fs.Path(dst_path)
    return sum(
        1
        for st in fs.listStatus(dst)
        if st.getPath().getName().endswith(".parquet")
    )
