#!/bin/bash
# Full-surface sf10 correctness gate, reproducible in one command.
#
# Runs every registered query against /tmp/sf10 (100x sf0.1, built by
# scripts_dev/make_sf1.py semantics at 10x sf1) through the strict /
# digest oracle compare, in batches of <=47 so a single JVM failure
# costs one batch, then merges into one artifact.
#
# Operational notes proven in rounds 7-8:
#   - Batch size 24 since r9: the r9 batch-1 run (47 names) OOMed a
#     16g heap at query #37 — not one query's working set but
#     ACCUMULATED process state (memoized persisted landings/dims per
#     query family, Derby's embedded page cache, 500 stages of
#     listener/codegen state). Every query in that batch is
#     individually green at sf10 in 16g; ≤24 names per process keeps
#     the accumulation bounded. A batch that fails no longer aborts
#     the sweep (each batch merges independently; the script exits
#     nonzero at the end if any FAIL remains).
#   - 16g driver heap suffices since r8 (verdict ask #4):
#     agg_approx_distinct_checked's dual count_distinct used to plan
#     an Expand feeding one stage holding both exact hash sets + HLL
#     buffers, which OOMed a 16g JVM at 60M rows and needed a 32g
#     heroic heap; each exact NDV is now its own column-pruned
#     distinct->count (partitioned, spillable), so the gate runs in
#     16g. If an OOM ever recurs: one OOM poisons every later query
#     in the process (instant sub-second FAILs) — cascade FAILs after
#     an OOM are not real, re-run them in a fresh process.
#   - ORACLE_MEM caps DuckDB so a heavy oracle spills to
#     /tmp/duckdb_spill instead of racing the JVM for the box.
#   - Excluded by documented design (see sweep_r7_sf10.json note):
#     er_name_blocking_pairs only (quadratic pair OUTPUT by semantics,
#     ~4h; the gated scale twin is er_blocking_refined).
#     sem_dedup_clusters re-entered the gate in r9: it now size-routes
#     to sem_dedup_scaled above 5000 vectors, so at sf10 it IS the
#     linear path.
#
# Usage: SWEEP_ROUND=N scripts_dev/sweep_sf10_full.sh [OUT.json]
#        (default scripts_dev/sweep_r${SWEEP_ROUND}_sf10.json).
#        SWEEP_ROUND is REQUIRED (r8 advice #4: a stale default
#        stamped one round's artifacts under another round's name).
set -euo pipefail
cd "$(dirname "$0")/.."
if [ -z "${SWEEP_ROUND:-}" ]; then
  echo "SWEEP_ROUND must be set (artifact-labeling contract)" >&2
  exit 2
fi
OUT="${1:-scripts_dev/sweep_r${SWEEP_ROUND}_sf10.json}"

python3 - <<'EOF'
import sys
sys.path.insert(0, ".")
from end_to_end_data_engineering_job_listings_etl_spark import registry
names = [n for n in registry.all_queries()
         if n not in ("er_name_blocking_pairs",)]
sz = 24
for i in range(0, len(names), sz):
    open(f"/tmp/sf10_full_b{i // sz + 1}.txt", "w").write(
        "\n".join(names[i : i + sz]) + "\n"
    )
print(len(names), "names in", (len(names) + sz - 1) // sz, "batches")
EOF

first=1
rc=0
for f in /tmp/sf10_full_b*.txt; do
  b="${f##*_}"; b="${b%.txt}"
  # a failing batch (sweep_all exits 1 on any FAIL) must not abort
  # the remaining batches — record and continue; FAILed rows stay in
  # the merged artifact for a fresh-process re-run (see the OOM-
  # cascade note above)
  SWEEP_ROUND="${SWEEP_ROUND}" \
  SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-16g}" \
  SWEEP_CPUS="${SWEEP_CPUS:-24}" ORACLE_MEM="${ORACLE_MEM:-32GB}" \
  python scripts_dev/sweep_all.py --sf-dir /tmp/sf10 \
    --out "/tmp/sweep_sf10_full_$b.json" $(cat "$f") || rc=1
  if [ "$first" = 1 ]; then
    cp "/tmp/sweep_sf10_full_$b.json" "$OUT"; first=0
  else
    python scripts_dev/merge_sweep.py "$OUT" "/tmp/sweep_sf10_full_$b.json"
  fi
done
echo "merged -> $OUT (rc=$rc)"
exit "$rc"
