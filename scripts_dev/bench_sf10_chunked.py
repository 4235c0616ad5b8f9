"""LEGACY (r10): the within-dataset state budget + GCLocker retry fix
(cachereg.query_boundary, session.py) let a single 16 GB JVM run the
full sf10 headline — `SPARK_GRAFT_SF_DIR=/tmp/sf10
SPARK_GRAFT_DRIVER_MEM=16g SPARK_GRAFT_BENCH_RUNS=1 python bench.py`
— in one process, 0.92× this script's chunked total
(scripts_dev/bench_r10_sf10.json). Kept only as the r9 artifact's
provenance.

Full-headline sf10 bench, chunked: one fresh cold `bench.py --once`
process per ≤24-name HEADLINE slice, merged into one artifact.

Why chunked: a single process running all 122 headline names at sf10
dies around query ~19 in an 8–16 GB heap — not any one query's working
set (each name is green in the 16 GB sf10 *gate*), but accumulated
process state (per-family memoized persisted landings/dims, Derby page
cache, hundreds of stages of listener/codegen state) — the same
failure mode that moved the sf10 sweep to 24-name batches in r9.
Chunking changes NO per-query semantics: the default bench already
runs each pass as a fresh cold subprocess; this just makes the
process boundary fall every 24 names instead of every 122. Every
chunk pays its own cold memo builds, exactly like any --once pass.

Usage:
    python scripts_dev/bench_sf10_chunked.py [SF_DIR] [OUT.json]
Defaults: /tmp/sf10, scripts_dev/bench_r9_sf10.json (override OUT for
later rounds). Chunk size via $BENCH_CHUNK (default 24), heap via
$SPARK_GRAFT_DRIVER_MEM (default 16g, the proven sf10 gate size).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else (
        REPO / "scripts_dev" / "bench_r9_sf10.json"
    )
    chunk = int(os.environ.get("BENCH_CHUNK", "24"))
    names = bench.HEADLINE
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_DRIVER_MEM": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }

    queries: dict[str, float] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for i in range(0, len(names), chunk):
        part = names[i : i + chunk]
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(part)
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--once"],
            capture_output=True,
            text=True,
            env=env,
        )
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines()) if ln.strip()), ""
        )
        try:
            res = json.loads(line)
        except json.JSONDecodeError:
            # bench.py --once only emits per-query results at process
            # end, so a crashed chunk loses the timings of names that
            # DID run before the crash — the error string says so
            # (ADVICE r9 item 2)
            for n in part:
                errors[n] = (
                    "chunk died (earlier names in the chunk may have run "
                    f"but their timings are lost): exit={proc.returncode} "
                    + proc.stderr[-200:]
                )
            print(f"chunk {i // chunk + 1}: FAILED (exit {proc.returncode})", flush=True)
            continue
        queries.update(res.get("queries", {}))
        errors.update(res.get("errors", {}))
        print(
            f"chunk {i // chunk + 1}/{(len(names) + chunk - 1) // chunk}: "
            f"{len(res.get('queries', {}))} timed, "
            f"{res.get('total_timed', 0.0):.1f}s",
            flush=True,
        )

    artifact = {
        "metric": "headline_total_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 10.0 if "sf10" in sf_dir else None,
        "total_timed": round(sum(queries.values()), 3),
        "n_timed": len(queries),
        "n_queries": len(names),
        "n_runs": 1,
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "errors": errors,
        "note": (
            f"single cold pass per query, {chunk}-name fresh-process chunks "
            "(accumulated single-process state OOMs a 16g heap past ~19 sf10 "
            "queries; per-query timing semantics identical to any --once pass)"
        ),
        "wall_total_sec": round(time.time() - t0, 1),
    }
    out.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"{len(queries)} timed / {len(errors)} errors → {out}")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
