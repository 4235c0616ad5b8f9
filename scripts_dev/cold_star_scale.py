"""Measure the COLD star-build path at a 10x-sf0.1 (sf1-equivalent
orders/documents volume) synthetic scale point, for BASELINE.md's
cross-SF extrapolation table (round-3 verdict task #4).

Builds /tmp/sfx10 once: every table symlinked from sf0.1 except
orders (150k -> 1.5M rows, o_orderkey offset per replica so keys stay
unique) and documents (5k -> 50k rows, doc_id offset). Then, in THIS
fresh process, times the cold star builds — jl_fact_checked (the full
reference-shaped 9-table build) and fact_orders (the synthetic star)
— exactly like bench.py does (noop sink), plus the warm star_wide
re-read for contrast.

Usage: python scripts_dev/cold_star_scale.py [sf_dir_out]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
REPLICAS = 10


def build_dataset(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(OUT, exist_ok=True)
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "lineitem",
        "events",
        "embeddings",
    ):
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)

    def replicate(table: str, key: str, shift_cols: dict[str, str]) -> None:
        dst = os.path.join(OUT, f"{table}.parquet")
        if os.path.exists(dst):
            return
        df = spark.read.parquet(os.path.join(SRC, f"{table}.parquet"))
        span = df.agg(F.max(key)).collect()[0][0] + 1
        reps = None
        for i in range(REPLICAS):
            part = df
            for c, typ in shift_cols.items():
                part = part.withColumn(c, (F.col(c) + F.lit(i * span)).cast(typ))
            reps = part if reps is None else reps.unionByName(part)
        reps.write.mode("overwrite").parquet(dst)

    replicate("orders", "o_orderkey", {"o_orderkey": "bigint"})
    replicate("documents", "doc_id", {"doc_id": "bigint"})


def main() -> None:
    from end_to_end_data_engineering_job_listings_etl_spark.registry import all_queries
    from end_to_end_data_engineering_job_listings_etl_spark.session import get_spark

    spark = get_spark(app_name="cold-star-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    build_dataset(spark)
    n = spark.read.parquet(os.path.join(OUT, "orders.parquet")).count()
    print(f"dataset ready: {n} orders at {OUT}")

    qs = all_queries()
    for name in ("jl_fact_checked", "fact_orders", "star_wide", "star_wide"):
        t0 = time.perf_counter()
        qs[name](spark, OUT).write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
