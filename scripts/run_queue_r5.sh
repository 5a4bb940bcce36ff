#!/bin/bash
# Round-5 TPU end-game queue.
#
# At DEADLINE (default 21:40 UTC) stop the student training (watchdog first
# so it cannot restart, then the trainer; the last --ckpt-every archive is
# the eval input), then run, in order of guaranteed-artifact value:
#   1. expert 10-route Town05 Long re-eval (ADVICE fixes cured the route
#      18/20 blocks on CPU diags; target DS >= 67.4 — VERDICT task 6)
#   2. autopilot Town05 Long with --no-courtesy-yield (fidelity A/B,
#      VERDICT task 5; compare runs/autopilot_town05_long_r9/s*.json)
#   3. student 10-route closed-loop eval (VERDICT task 1) — batch 5 so the
#      per-batch ledger saves survive a worker crash; retry wrapper resumes
#      at route granularity.
set -u
cd /root/repo
DEADLINE=${DEADLINE:-"21:40"}

now_s() { date +%s; }
dl_s=$(date -d "today $DEADLINE" +%s)
if [ "$(now_s)" -lt "$dl_s" ]; then
  echo "[queue] waiting until $DEADLINE (UTC) — $(( (dl_s - $(now_s)) / 60 )) min"
  sleep $(( dl_s - $(now_s) ))
fi

echo "[queue] stopping training at $(date)"
kill "$(cat /tmp/train_watchdog.pid 2>/dev/null)" 2>/dev/null
kill "$(cat /tmp/student.pid 2>/dev/null)" 2>/dev/null
for p in $(cat /tmp/train_watchdog.pid /tmp/student.pid 2>/dev/null); do
  for i in $(seq 1 20); do kill -0 "$p" 2>/dev/null || break; sleep 3; done
  kill -9 "$p" 2>/dev/null
done
sleep 30   # let the tunneled worker settle

echo "[queue] 1/3 expert re-eval at $(date)"
timeout 4500 bash scripts/run_eval_retry.sh runs/expert_rl6_r5_town05_long.json \
    --agent expert --ckpt runs/roach_rl6/params.msgpack --routes 10 \
    --policy-every 2 --worlds-per-batch 5 \
    > runs/expert_rl6_r5_eval.log 2>&1
echo "[queue] expert exit $? at $(date)"

echo "[queue] 2/3 autopilot no-yield A/B at $(date)"
timeout 3000 python scripts/eval_town05.py --agent autopilot --routes 10 \
    --no-courtesy-yield --worlds-per-batch 10 \
    --out runs/autopilot_town05_long_noyield.json \
    > runs/autopilot_noyield.log 2>&1
echo "[queue] A/B exit $? at $(date)"

echo "[queue] 3/3 student eval at $(date)"
bash scripts/run_eval_retry.sh runs/student_rl6_r5_town05_long.json \
    --agent student --ckpt runs/student_rl6/params.msgpack --routes 10 \
    --policy-every 2 --worlds-per-batch 5 \
    > runs/student_rl6_r5_eval.log 2>&1
echo "[queue] student exit $? at $(date)"
