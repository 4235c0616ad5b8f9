"""Emit the r9 sf1->sf10 per-query scaling-exponent table from the two
committed final-code bench artifacts (bench_r9_sf1.json, chunked
bench_r9_sf10.json). Exponent = log10(sf10_sec / sf1_sec) for 10x
data; 1.0 = linear, <1 = sublinear (fixed overhead amortizing).
Queries under 0.5 s at sf10 are skipped (session-overhead floor, the
exponent would measure noise).

Usage: python scripts_dev/scaling_exponents_r9.py [--md] [SF1.json SF10.json]
(defaults to the r9 pair; pass e.g. bench_r10_sf1.json
bench_r10_sf10.json for later rounds)
"""

from __future__ import annotations

import json
import math
import signal
import sys
from pathlib import Path

# Piping into `head` must not traceback after the useful lines printed
# (ADVICE r9 item 4).
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

D = Path(__file__).resolve().parent


def main() -> int:
    paths = [a for a in sys.argv[1:] if a not in ("--md", "--force")]
    f1 = paths[0] if len(paths) > 0 else str(D / "bench_r9_sf1.json")
    f10 = paths[1] if len(paths) > 1 else str(D / "bench_r9_sf10.json")
    art1 = json.loads(Path(f1).read_text())
    art10 = json.loads(Path(f10).read_text())
    # Refuse noisy-window artifacts for cross-scale ratios (VERDICT r11
    # "what's wrong" #2): bench.py stamps `noisy: true` when >50% of
    # timed queries tripped the ±20% resample rule — a degraded host
    # window inflates a whole bench 15-20% and the exponents with it.
    # Re-run on a quiet host instead; --force overrides for forensics.
    if "--force" not in sys.argv[1:]:
        for p, art in ((f1, art1), (f10, art10)):
            if art.get("noisy"):
                print(
                    f"REFUSED: {p} is stamped noisy (degraded host "
                    "window) — re-run the bench on a quiet host, or "
                    "pass --force to compare anyway."
                )
                return 2
    sf1 = art1["queries"]
    sf10 = art10["queries"]
    rows = []
    for n, v10 in sf10.items():
        v1 = sf1.get(n)
        if v1 and v1 > 0.05 and v10 >= 0.5:
            rows.append((n, v1, v10, math.log10(v10 / v1)))
    rows.sort(key=lambda r: -r[3])
    md = "--md" in sys.argv[1:]
    if md:
        print("| query | sf1 s | sf10 s | exp |")
        print("|---|---:|---:|---:|")
        for n, v1, v10, e in rows:
            print(f"| {n} | {v1:.2f} | {v10:.1f} | {e:.2f} |")
    else:
        for n, v1, v10, e in rows:
            print(f"{n:40s}{v1:9.2f}{v10:9.1f}{e:7.2f}")
    over = [n for n, _, _, e in rows if e > 1.5]
    print(f"\n{len(rows)} measured; exp>1.5: {over or 'none'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
