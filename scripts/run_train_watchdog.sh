#!/bin/bash
# Watchdog wrapper for long TPU training runs.
#
# Round-4 failure mode: the tunneled TPU worker went silent after step 900
# (process alive, device silent, 23 min) and the run never finished. This
# wrapper restarts training with --resume whenever the JSONL train log stops
# advancing for STALL_S seconds. Kills are by recorded PID only (never by
# pattern). Training itself checkpoints orbax + params.msgpack every
# --ckpt-every steps, so a restart loses at most that many steps.
#
# Usage: run_train_watchdog.sh LOGFILE TOTAL_STEPS -- python scripts/train_... \
#            (the command must already include --resume and write LOGFILE)
set -u
LOG=$1; shift
STALL_S=${STALL_S:-900}
MAX_RESTARTS=${MAX_RESTARTS:-8}
shift_done=0
if [ "$1" = "--" ]; then shift; fi

for attempt in $(seq 0 "$MAX_RESTARTS"); do
  echo "[watchdog] attempt $attempt: $* (stall budget ${STALL_S}s)" >&2
  # reset the staleness clock: the JSONL may be hours old from a previous
  # run, and compile warmup takes minutes before the first new write
  touch "$LOG" 2>/dev/null
  "$@" &
  PID=$!
  echo "$PID" > /tmp/train_watchdog.pid
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    if [ -f "$LOG" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ "$age" -gt "$STALL_S" ]; then
        echo "[watchdog] $LOG stale ${age}s > ${STALL_S}s — killing $PID" >&2
        kill "$PID" 2>/dev/null
        sleep 20
        kill -9 "$PID" 2>/dev/null
        # give the tunneled TPU worker time to recover before reattaching
        sleep 60
        break
      fi
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] training exited cleanly" >&2
    exit 0
  fi
  echo "[watchdog] training exited rc=$rc; restarting" >&2
  sleep 30
done
echo "[watchdog] gave up after $MAX_RESTARTS restarts" >&2
exit 1
