"""Measure the round-4 sketch/retrieval/IVM layer at the 10x-sf0.1
(sf1-equivalent) scale point built by cold_star_scale.build_dataset —
extends BASELINE.md's cross-SF extrapolation past sf0.1 for the new
operators whose inputs actually scale there (orders x10, documents
x10; events/customer/embeddings stay 1x symlinks, so CMS/gram/Arrow
ops are excluded — their sf0.001-0.1 rows already cover them).

Method identical to cold_star_scale: one warm pass at sf0.1 (codegen),
then timed noop-sink runs at sf0.1 and 10x in the same session, so the
pair isolates the data-proportional part.

Usage: python scripts_dev/sketch_scale.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cold_star_scale import OUT, build_dataset  # noqa: E402

NAMES = (
    "j_bloom_filter_prune",
    "agg_kmv_distinct_checked",
    "j_salted_skew_join",
    "text_cdc_chunks",
    "text_bm25_topk",
    "sink_inverted_index_roundtrip",
    "inc_join_view_maintain",
    "src_schema_evolution",
)

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    from end_to_end_data_engineering_job_listings_etl_spark.registry import all_queries
    from end_to_end_data_engineering_job_listings_etl_spark.session import get_spark

    spark = get_spark(
        app_name="sketch-scale", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    build_dataset(spark)
    qs = all_queries()
    for name in NAMES:  # codegen warm at sf0.1
        qs[name](spark, SF01).write.format("noop").mode("overwrite").save()
    for name in NAMES:
        row = [name]
        for sf in (SF01, OUT):
            t0 = time.perf_counter()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            row.append(f"{time.perf_counter() - t0:.2f}")
        print("| " + " | ".join(row) + " |", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    main()
