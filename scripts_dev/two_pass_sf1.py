"""Two-pass steady-state proof (VERDICT r10 next-round #3): run the
FULL registered surface TWICE in ONE JVM at sf1 and show (a) pass-2
totals within noise of pass-1 — i.e. rebuild-after-evict works for
every family and nothing slowly leaks that the one-pass plateau hid —
and (b) final pinned session state ≤ the cachereg budget.

Every query executes end-to-end through the noop sink (the bench's
measurement path); correctness is NOT re-checked here — that is the
sweep gate's job — this artifact isolates session-lifetime behavior.
er_name_blocking_pairs is excluded exactly as in the sf10 gate
(documented quadratic-output demo, PARITY.md).

Usage:
    SPARK_GRAFT_DRIVER_MEM=16g python scripts_dev/two_pass_sf1.py \
        [SF_DIR] [OUT.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from end_to_end_data_engineering_job_listings_etl_spark import (  # noqa: E402
    cachereg,
    registry,
)
from end_to_end_data_engineering_job_listings_etl_spark.session import (  # noqa: E402
    get_spark,
)

EXCLUDE = {"er_name_blocking_pairs"}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/tmp/sf1"
    out = Path(args[1]) if len(args) > 1 else (
        REPO / "scripts_dev" / "two_pass_sf1_r11.json"
    )

    spark = get_spark(app_name="two-pass")
    qs = registry.all_queries()
    names = [n for n in qs if n not in EXCLUDE]

    passes: list[dict] = []
    for p in (1, 2):
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        t_pass = time.time()
        for i, name in enumerate(names):
            t0 = time.time()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.time() - t0, 2)
            except Exception as e:  # noqa: BLE001
                errors[name] = f"{type(e).__name__}: {e}"[:200]
            if (i + 1) % 25 == 0:
                print(
                    f"[pass {p}] {i + 1}/{len(names)} "
                    f"({round(time.time() - t_pass, 1)}s)",
                    flush=True,
                )
        passes.append(
            {
                "total_sec": round(time.time() - t_pass, 1),
                "n_ok": len(timings),
                "n_err": len(errors),
                "errors": errors,
                "queries": timings,
            }
        )
        print(
            f"pass {p}: {passes[-1]['total_sec']}s, "
            f"{len(timings)} ok / {len(errors)} err",
            flush=True,
        )

    counts = cachereg.boundary_stats()["counts"]
    pinned = cachereg.pinned_bytes(spark)
    budget = cachereg.state_budget_bytes(spark)
    artifact = {
        "sf_dir": sf_dir,
        "n_names": len(names),
        "pass1_total_sec": passes[0]["total_sec"],
        "pass2_total_sec": passes[1]["total_sec"],
        "pass2_over_pass1": round(
            passes[1]["total_sec"] / passes[0]["total_sec"], 3
        ),
        "final_pinned_mb": round(pinned / 2**20),
        "budget_mb": round(budget / 2**20),
        "pinned_within_budget": pinned <= budget,
        "boundary_counts": counts,
        "passes": passes,
    }
    out.write_text(json.dumps(artifact, indent=1) + "\n")
    print(
        f"\npass2/pass1 = {artifact['pass2_over_pass1']}; pinned "
        f"{artifact['final_pinned_mb']} MB ≤ budget {artifact['budget_mb']} "
        f"MB: {artifact['pinned_within_budget']} → {out}"
    )
    n_err = passes[0]["n_err"] + passes[1]["n_err"]
    return 1 if (n_err or not artifact["pinned_within_budget"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
