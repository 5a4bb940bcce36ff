#!/bin/bash
# Retry wrapper: the tunneled TPU worker occasionally crashes on long
# executions; eval resumes at route granularity from the results JSON.
OUT=$1; shift
for i in 1 2 3 4 5 6; do
  timeout 7200 python scripts/eval_town05.py --out "$OUT" --resume "$@" && exit 0
  echo "=== attempt $i failed (rc=$?), retrying after 30s ==="
  sleep 30
done
exit 1
