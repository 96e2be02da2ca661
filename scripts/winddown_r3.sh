#!/usr/bin/env bash
# Round-2b end-of-round sequence (r3 run variant of winddown_r2.sh).
# Run ~1.5-2h before the driver cuts the round:
#   1. stop the TPU trainer (frees HBM for bench.py / eval)
#   2. export the best checkpoint + robustness sweep
#   3. TPU effect-dispatch crossover bench (docs/EFFECT_DISPATCH.md table)
#   4. re-warm the multichip dryrun compile cache (driver re-runs it cold)
#   5. smoke bench.py
# Each phase tolerates failure and moves on; artifacts land in weights/ and
# /tmp for inspection before the final commit.
set -uo pipefail
cd "$(dirname "$0")/.."
# reboot-proof compile cache (see train_demo_r3.sh)
export WAVEVERIFY_COMPILE_CACHE=${WAVEVERIFY_COMPILE_CACHE:-$PWD/.jax_cache/train}

echo "== stop trainer =="
# Stop the relaunch supervisor FIRST or it restarts the trainer mid-bench,
# then its child trainer (found by parent pid — never by name pattern).
if [ -f /tmp/train_sup_r3.pid ] && kill -0 "$(cat /tmp/train_sup_r3.pid)" 2>/dev/null; then
  SUP=$(cat /tmp/train_sup_r3.pid)
  KIDS=$(ps -o pid= --ppid "$SUP" 2>/dev/null || true)
  kill "$SUP" 2>/dev/null || true
  for k in $KIDS; do
    GKIDS=$(ps -o pid= --ppid "$k" 2>/dev/null || true)
    kill "$k" 2>/dev/null || true
    for g in $GKIDS; do kill "$g" 2>/dev/null || true; done
  done
  sleep 10
fi
if [ -f /tmp/train_r3.pid ] && kill -0 "$(cat /tmp/train_r3.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_r3.pid)"
  sleep 10
fi

echo "== export + sweep =="
# r3 ships as a SEPARATE artifact: the r2 demo weights (good perceptual
# quality, BER 0.42) stay in place; r3 (staged-curriculum run, lower BER,
# perceptual ramp never latched) lands next to them for honest comparison.
CKPT=${CKPT:-checkpoints/demo_r3} \
OUT=${OUT:-weights/waveverify_demo_r3.npz} \
SWEEP=${SWEEP:-weights/demo_eval_sweep_r3.json} \
SWEEP_BF16=${SWEEP_BF16:-weights/demo_eval_sweep_r3_bf16.json} \
  timeout 1800 bash scripts/export_and_eval_r2.sh \
  || echo "EXPORT/SWEEP FAILED rc=$?"

echo "== dispatch bench (TPU) =="
timeout 900 python benchmarks/effect_dispatch_bench.py --iters 20 \
  | tee /tmp/dispatch_bench_tpu.log || echo "DISPATCH BENCH FAILED rc=$?"

echo "== dryrun cache warm =="
timeout 500 python __graft_entry__.py 8 >/tmp/dryrun_final.log 2>&1 \
  && echo "dryrun OK" || echo "DRYRUN FAILED rc=$?"

echo "== step-time breakdown (TPU, warm cache) =="
# mirrors the r3 recipe exactly -> hits the trainer's compile cache; the
# breakdown attributes the ~0.94 s/step between host and device
# (docs/ROADMAP.md profiling item). Non-fatal bonus artifact.
timeout 900 python scripts/profile_step.py --steps 20 \
  --resume "${CKPT:-checkpoints/demo_r3}" \
  | tee /tmp/profile_step_tpu.log || echo "PROFILE FAILED rc=$?"

echo "== bench smoke =="
timeout 900 python bench.py || echo "BENCH FAILED rc=$?"
