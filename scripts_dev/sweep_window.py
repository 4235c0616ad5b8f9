"""Ad-hoc dev sweep: run registry window (or named queries) through the
strict driver-replica compare at sf0.01. Usage:
    python scripts_dev/sweep_window.py [name ...]
No args = the current _WINDOW (first 50 of all_queries()).
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    from tests.oracle_check import compare, duckdb_conn

    from end_to_end_data_engineering_job_listings_etl_spark import registry
    from end_to_end_data_engineering_job_listings_etl_spark.session import get_spark

    spark = get_spark(app_name="sweep-window", cpus=16)
    con = duckdb_conn(SF_DIR)
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    names = sys.argv[1:] or list(qs)[:50]
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            if name in oracles:
                compare(df, con, oracles[name], name)
                status = "GREEN"
            else:
                n = df.count()
                status = f"rows-only ({n})"
        except Exception:
            status = "FAIL"
            failures.append(name)
            traceback.print_exc()
        print(f"[{i + 1}/{len(names)}] {name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} green; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
