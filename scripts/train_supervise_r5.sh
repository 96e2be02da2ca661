#!/usr/bin/env bash
# Supervisor for the round-4 warm-started execution run (see
# scripts/train_supervise_r2.sh for the rationale): relaunches the trainer
# on crash and kills+relaunches when the tunneled backend wedges. Warm-
# starts from weights/waveverify_demo_r4.npz on first launch;
# relaunches resume from this run's latest checkpoint.
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=${CKPT:-checkpoints/demo_r5}
LOG="$CKPT/train_log.jsonl"
SUPLOG=/tmp/train_sup_r5.log
FIRST_BUDGET_S=${FIRST_BUDGET_S:-2700}
STALL_S=${STALL_S:-1500}
ATTEMPTS=${ATTEMPTS:-100}

echo $$ > /tmp/train_sup_r5.pid
# In-run persistence daemon (VERDICT r4: snapshot-commit discipline must be
# code) — exports + git-commits an npz of `latest` every cycle.
if ! { [ -f /tmp/snapshot_commit_r5.pid ] \
       && kill -0 "$(cat /tmp/snapshot_commit_r5.pid)" 2>/dev/null; }; then
  CKPT="$CKPT" nohup bash scripts/snapshot_commit_r5.sh \
    >> /tmp/snapshot_commit_r5.out 2>&1 &
fi
for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "[sup] attempt $attempt $(date -Is)" >> "$SUPLOG"
  START=$(date +%s)
  CKPT="$CKPT" RESUME=--resume EXTRA="${EXTRA:-}" \
    bash scripts/train_demo_r5.sh >> /tmp/train_r5.log 2>&1 &
  PID=$!
  echo "$PID" > /tmp/train_r5.pid
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
