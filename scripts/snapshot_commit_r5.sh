#!/usr/bin/env bash
# In-run artifact persistence (VERDICT r4 weak #1 / task 1 precondition).
#
# Round 4 lost an entire ~7k-step converged run because artifacts only
# existed on the (recycled) container's disk: checkpoints were written to
# the gitignored ckpt dir and the npz export only happened at winddown.
# This daemon mechanizes the mitigation as code, not a roadmap bullet:
# every PERIOD_S seconds, if the trainer has produced a NEW orbax `latest`
# checkpoint since the last cycle, it
#   1. exports a compact npz snapshot on the CPU backend (never touches
#      the TPU the trainer is using) to weights/snapshots/,
#   2. copies the live train log next to it,
#   3. `git commit`s both — pathspec commit only, so it can never sweep up
#      unrelated staged work; index.lock races retry.
# Safe to kill at any time; the supervisor (train_supervise_r5.sh) starts
# it if it is not already running.
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=${CKPT:-checkpoints/demo_r5}
SNAP=${SNAP:-weights/snapshots/demo_r5_latest.npz}
SNAPLOG=${SNAPLOG:-weights/snapshots/train_log_r5.jsonl}
PERIOD_S=${PERIOD_S:-900}
LOGF=/tmp/snapshot_commit_r5.log

mkdir -p "$(dirname "$SNAP")"
echo $$ > /tmp/snapshot_commit_r5.pid
LAST_MTIME=0
while :; do
  sleep "$PERIOD_S"
  M=$(stat -c %Y "$CKPT/latest/meta.json" 2>/dev/null || echo 0)
  [ "$M" -le "$LAST_MTIME" ] && continue
  # Export on CPU: the checkpoint may momentarily not exist mid-rename
  # (save_checkpoint swaps the dir); a failed export just waits a cycle.
  if timeout 600 python - "$CKPT" "$SNAP" >> "$LOGF" 2>&1 <<'EOF'
# force CPU FIRST: this image's sitecustomize registers the axon TPU
# platform before JAX_PLATFORMS is read (see .claude/skills/verify) — an
# env-var-only guard would grab the tunnel the trainer is using
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from waveverify_tpu.api.core import WaveVerify
from waveverify_tpu.convert import save_weights_npz
ckpt, snap = sys.argv[1], sys.argv[2]
wv = WaveVerify(checkpoint_path=f"{ckpt}/latest")
save_weights_npz(wv.params, snap, config=wv.config)
print("exported", snap, flush=True)
EOF
  then
    LAST_MTIME=$M
    cp -f "$CKPT/train_log.jsonl" "$SNAPLOG" 2>/dev/null || true
    # checkpoint meta (ramp/nbits/scheduler state): committed alongside so
    # a recycled container resumes the CONTROLLERS too (--init-meta), not
    # just the weights — the step-8249 recycle lost ramp state with the
    # orbax dir and the round-5 resume had to reconstruct it by hand.
    SNAPMETA="${SNAP%.npz}_meta.json"
    cp -f "$CKPT/latest/meta.json" "$SNAPMETA" 2>/dev/null || true
    STEP=$(tail -1 "$SNAPLOG" 2>/dev/null \
           | sed -n 's/.*"step": \([0-9]*\).*/\1/p')
    for _ in 1 2 3 4 5; do
      git add -- "$SNAP" "$SNAPLOG" "$SNAPMETA" >> "$LOGF" 2>&1 \
        || { sleep 11; continue; }
      if git commit -q -m "train snapshot @step ${STEP:-?}: in-run npz export" \
           -- "$SNAP" "$SNAPLOG" "$SNAPMETA" >> "$LOGF" 2>&1; then
        echo "[snap] committed step ${STEP:-?} $(date -Is)" >> "$LOGF"
        break
      fi
      sleep 11   # index.lock race with an interactive commit — retry
    done
  else
    echo "[snap] export failed (checkpoint mid-write?); retrying next cycle" \
      >> "$LOGF"
  fi
done
