#!/bin/bash
# Round-4 TPU work queue: fires the moment student training releases the
# chip. Ablation (VERDICT r3 task 3) -> full student eval (task 2) ->
# Longest6 reruns with the liveness fixes (tasks 5/6).
set -u
cd /root/repo

echo "[queue] waiting for training pid $(cat /tmp/student.pid)"
while kill -0 "$(cat /tmp/student.pid)" 2>/dev/null; do sleep 60; done
echo "[queue] training done at $(date)"

# 1) control-cadence ablation: same checkpoint, 2 routes, 20 Hz vs 10 Hz hold
timeout 2400 python scripts/eval_town05.py --agent student \
    --ckpt runs/student_rl6/params.msgpack --routes 2 --policy-every 1 \
    --worlds-per-batch 2 --out runs/student_rl6_cadence20.json \
    > runs/student_rl6_cadence20.log 2>&1
echo "[queue] cadence20 exit $? at $(date)"
timeout 2400 python scripts/eval_town05.py --agent student \
    --ckpt runs/student_rl6/params.msgpack --routes 2 --policy-every 2 \
    --worlds-per-batch 2 --out runs/student_rl6_cadence10.json \
    > runs/student_rl6_cadence10.log 2>&1
echo "[queue] cadence10 exit $? at $(date)"

# pick the better cadence for the full 10-route run
PE=$(python - <<'EOF'
import json
def ds(p):
    try:
        return json.load(open(p))["_checkpoint"]["global_record"]["scores"]["score_composed"]
    except Exception:
        return -1.0
print(1 if ds("runs/student_rl6_cadence20.json") >= ds("runs/student_rl6_cadence10.json") else 2)
EOF
)
echo "[queue] full eval at policy-every $PE"

# 2) full 10-route Town05 Long student eval
timeout 7200 python scripts/eval_town05.py --agent student \
    --ckpt runs/student_rl6/params.msgpack --routes 10 --policy-every "$PE" \
    --out runs/student_rl6_town05_long.json \
    > runs/student_rl6_town05_long.log 2>&1
echo "[queue] student full eval exit $? at $(date)"

# 3) Longest6 Town03 autopilot at true density with the liveness fixes
timeout 5400 python scripts/eval_longest6.py --towns Town03 \
    --out runs/autopilot_longest6_v3.json \
    > runs/longest6_v3_town03.log 2>&1
echo "[queue] longest6 Town03 exit $? at $(date)"

# 4) learned-expert Longest6 (first-ever learned driver on this benchmark)
timeout 5400 python scripts/eval_longest6.py --towns Town02 --agent expert \
    --ckpt runs/roach_rl6/params.msgpack \
    --out runs/expert_rl6_longest6.json \
    > runs/longest6_rl6_town02.log 2>&1
echo "[queue] expert longest6 Town02 exit $? at $(date)"

# 5) remaining autopilot towns at true density (as time allows);
# each invocation re-merges every existing v3 per-town ledger into the
# 36-route document
for T in Town04 Town05 Town06 Town01 Town02; do
  timeout 5400 python scripts/eval_longest6.py --towns "$T" \
      --out runs/autopilot_longest6_v3.json \
      > "runs/longest6_v3_${T,,}.log" 2>&1
  echo "[queue] longest6 $T exit $? at $(date)"
done
echo "[queue] all done at $(date)"
