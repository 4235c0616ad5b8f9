"""Measure er_blocking_refined OUTPUT rows at sf1 vs sf10 (r9).

Purpose: the verbatim-replica scale fixture gives every clean/dirty
name N_replica exact copies, so the TRUE-MATCH pair set itself grows
~quadratically in the replica count — no recall-preserving blocking
can emit fewer pairs than the matches that exist. This script
separates that output growth from engine efficiency: it counts the
query's output rows at both SFs so the bench exponent can be restated
per output row (sec / M pairs).

Usage: python scripts_dev/er_output_counts.py [SF1_DIR SF10_DIR [OUT.json]]
(r10: also counts er_unlinked and writes the JSON artifact —
scripts_dev/er_output_counts_r10.json by default — so the output-
linearity analysis is a committed measurement, not BASELINE prose;
r9 verdict ask #3.)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from end_to_end_data_engineering_job_listings_etl_spark.plans.extended import (  # noqa: E402
    er_best_match,
    er_blocking_refined,
    er_unlinked,
)
from end_to_end_data_engineering_job_listings_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    out_path = Path(
        sys.argv[3]
        if len(sys.argv) > 3
        else REPO / "scripts_dev" / "er_output_counts_r10.json"
    )
    spark = get_spark(app_name="er-output-counts")
    out = {}
    for label, sf_dir in (("sf1", sf1), ("sf10", sf10)):
        dirty = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        t0 = time.time()
        pairs = er_blocking_refined(spark, sf_dir).count()
        t1 = time.time()
        best = er_best_match(spark, sf_dir).count()
        t2 = time.time()
        unlinked = er_unlinked(spark, sf_dir).count()
        t3 = time.time()
        out[label] = {
            "dirty_rows": dirty,
            "refined_pairs": pairs,
            "refined_count_sec": round(t1 - t0, 1),
            "best_match_rows": best,
            "best_match_count_sec": round(t2 - t1, 1),
            "unlinked_rows": unlinked,
            "unlinked_count_sec": round(t3 - t2, 1),
            # the construction claims, checked at scale: best-match is
            # one row per dirty record; the residual is a subset
            "best_match_equals_dirty": best == dirty,
        }
        print(label, out[label], flush=True)
    r = out["sf10"]["refined_pairs"] / max(out["sf1"]["refined_pairs"], 1)
    out["pairs_growth_10x_data"] = round(r, 1)
    out["best_match_growth_10x_data"] = round(
        out["sf10"]["best_match_rows"] / max(out["sf1"]["best_match_rows"], 1), 2
    )
    out_path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    print(f"→ {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
