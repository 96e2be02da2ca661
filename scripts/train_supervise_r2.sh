#!/usr/bin/env bash
# Training supervisor for the round-2 demo run: relaunches the trainer on
# crash and kills+relaunches it when it hangs (the tunneled single-chip
# backend occasionally wedges for hours — docs/ROADMAP.md). Progress is
# judged by the train log's mtime, with a generous first-compile budget.
#
# Writes its own pid to /tmp/train_sup.pid and the trainer's to
# /tmp/train_r2c.pid so scripts/winddown_r2.sh can stop both cleanly
# (supervisor first, so it does not relaunch mid-bench).
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=${CKPT:-checkpoints/demo_r2c}
LOG="$CKPT/train_log.jsonl"
SUPLOG=/tmp/train_sup.log
FIRST_BUDGET_S=${FIRST_BUDGET_S:-2700}   # compile + first val can be slow
STALL_S=${STALL_S:-1500}                 # after first log line
ATTEMPTS=${ATTEMPTS:-100}

echo $$ > /tmp/train_sup.pid
for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "[sup] attempt $attempt $(date -Is)" >> "$SUPLOG"
  START=$(date +%s)
  CKPT="$CKPT" RESUME=--resume \
    EXTRA="${EXTRA:---init-weights weights/waveverify_demo.npz}" \
    bash scripts/train_demo_r2.sh >> /tmp/train_r2c.log 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_r2c.pid
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    if [ -f "$LOG" ] && [ "$(stat -c %Y "$LOG")" -gt "$START" ]; then
      AGE=$(( NOW - $(stat -c %Y "$LOG") )); LIMIT=$STALL_S
    else
      AGE=$(( NOW - START )); LIMIT=$FIRST_BUDGET_S
    fi
    if [ "$AGE" -gt "$LIMIT" ]; then
      echo "[sup] stalled ${AGE}s > ${LIMIT}s — killing $PID" >> "$SUPLOG"
      kill "$PID" 2>/dev/null; sleep 20; kill -9 "$PID" 2>/dev/null
    fi
  done
  wait "$PID"; rc=$?
  echo "[sup] trainer exited rc=$rc after $(( $(date +%s) - START ))s" >> "$SUPLOG"
  [ "$rc" -eq 0 ] && break
  sleep 30
done
echo "[sup] done" >> "$SUPLOG"
