"""Merge a top-up sweep artifact into a base sweep artifact: per-query
rows from the top-up replace same-named rows in the base (the top-up is
the newer run — e.g. a failed query re-run after a gate fix), counts
are recomputed from the merged rows, and the result overwrites the base.

Usage:
    python scripts_dev/merge_sweep.py BASE.json TOPUP.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> int:
    base_p, topup_p = Path(sys.argv[1]), Path(sys.argv[2])
    base, topup = json.loads(base_p.read_text()), json.loads(topup_p.read_text())
    assert base["sf_dir"] == topup["sf_dir"], "SF mismatch"
    base["queries"].update(topup["queries"])
    qs = base["queries"]
    base["n_queries"] = len(qs)
    base["n_green"] = sum(1 for v in qs.values() if v["status"].startswith("GREEN"))
    base["n_rows_only"] = sum(1 for v in qs.values() if v["status"].startswith("rows-only"))
    base["n_fail"] = sum(1 for v in qs.values() if v["status"] == "FAIL")
    # total_sec from the MERGED per-query timings (r7 advice #3: base +
    # topup double-counts queries the top-up replaced — the base total
    # still held their old runtime). Rows lacking `sec` (older
    # artifacts) fall back to the additive approximation, flagged.
    if all("sec" in v for v in qs.values()):
        base["total_sec"] = round(sum(v["sec"] for v in qs.values()), 1)
    else:
        base["total_sec"] = round(base["total_sec"] + topup["total_sec"], 1)
        base["total_sec_note"] = "additive approximation (per-query sec missing)"
    base["merged_topup"] = sorted(topup["queries"])
    base_p.write_text(json.dumps(base, indent=1) + "\n")
    print(
        f"{base['n_green']} green / {base['n_rows_only']} rows-only / "
        f"{base['n_fail']} FAIL over {base['n_queries']} → {base_p}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
