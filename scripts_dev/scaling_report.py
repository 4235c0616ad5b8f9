"""Emit the sf0.1 -> sf1 per-query scaling table (markdown) from two
bench result JSONs (the full artifacts bench.py writes to
bench_last.json). Ratio = t_sf1 / t_sf01; exponent = log10(ratio)
for a 10x data step (1.0 = linear, 0 = flat). Queries over the 3x
ratio threshold are listed separately so each gets a plan explanation
or a fix in BASELINE.md (VERDICT r4 item 1).

Usage:
    python scripts_dev/scaling_report.py sf01.json sf1.json [threshold]
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    a = json.loads(open(sys.argv[1]).read())
    b = json.loads(open(sys.argv[2]).read())
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in qa:
        if name not in qb or qa[name] <= 0:
            continue
        ratio = qb[name] / qa[name]
        rows.append((name, qa[name], qb[name], ratio, math.log10(max(ratio, 1e-9))))
    rows.sort(key=lambda r: -r[3])

    print(f"| query | sf0.1 s | sf1 s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name, t0, t1, ratio, expo in rows:
        print(f"| {name} | {t0:.2f} | {t1:.2f} | {ratio:.2f}x | {expo:.2f} |")

    hot = [r for r in rows if r[3] > threshold]
    print(f"\n{len(rows)} common queries; {len(hot)} over {threshold}x:")
    for name, t0, t1, ratio, _ in hot:
        print(f"  {name}: {t0:.2f} -> {t1:.2f} ({ratio:.1f}x)")
    su = sum(r[1] for r in rows)
    sv = sum(r[2] for r in rows)
    print(
        f"totals: {su:.1f} -> {sv:.1f} s ({sv / su:.2f}x over 10x data, "
        f"aggregate exponent {math.log10(sv / su):.2f})"
    )


if __name__ == "__main__":
    main()
