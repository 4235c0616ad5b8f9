#!/bin/bash
# Resume the r9 sf10 gate after the /tmp wipe between sessions: run the
# 221 not-yet-green names (incl. the 11 crash-cascade FAILs from the
# session-1 batch whose JVM died at agg_rollup_year_month) in ≤24-name
# batches, merging each into scripts_dev/sweep_r9_sf10.json.
# Batch files are pre-written to /tmp/r9_batch_*.txt by the session.
set -uo pipefail
cd "$(dirname "$0")/.."
rc=0
for f in /tmp/r9_batch_*.txt; do
  [ -e "$f" ] || continue
  b="${f##*_}"; b="${b%.txt}"
  SWEEP_ROUND=9 \
  SPARK_GRAFT_DRIVER_MEM="${SPARK_GRAFT_DRIVER_MEM:-16g}" \
  SWEEP_CPUS="${SWEEP_CPUS:-24}" ORACLE_MEM="${ORACLE_MEM:-32GB}" \
  if python scripts_dev/sweep_all.py --sf-dir /tmp/sf10 \
    --out "/tmp/r9_topup_$b.json" $(cat "$f"); then
    python scripts_dev/merge_sweep.py scripts_dev/sweep_r9_sf10.json \
      "/tmp/r9_topup_$b.json"
    mv "$f" "$f.done"
  else
    rc=1
    # keep failed batches rerunnable: .failed, not .done (ADVICE r9
    # item 3 — an unconditional .done silently skipped failed batches)
    python scripts_dev/merge_sweep.py scripts_dev/sweep_r9_sf10.json \
      "/tmp/r9_topup_$b.json" || true
    mv "$f" "$f.failed"
  fi
done
echo "resume sweep complete (rc=$rc)"
exit "$rc"
