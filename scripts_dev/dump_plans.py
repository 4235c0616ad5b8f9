#!/usr/bin/env python
"""Dump .explain("formatted") for a set of registry queries to
plans/<tag>/<name>_<suffix>.txt — the optimization round's plan
evidence (guide §1: capture the plan shape before and after).

Usage:
  python scripts_dev/dump_plans.py <tag> <suffix> [name ...]
e.g.
  python scripts_dev/dump_plans.py r12 before fact_orders jl_fact_checked

With no names, dumps every bench.py HEADLINE query. Runs in ONE
session; builders that execute eagerly (streaming drains) still only
run once each. SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from end_to_end_data_engineering_job_listings_etl_spark import registry  # noqa: E402
from end_to_end_data_engineering_job_listings_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    queries = registry.all_queries()
    import contextlib
    import io

    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            # public API only (ADVICE r12): df.explain prints to stdout
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building/explaining {name}: {exc}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(text)
        print(f"wrote {name}_{suffix}.txt ({len(text)} chars)", flush=True)


if __name__ == "__main__":
    main()
