#!/usr/bin/env bash
# Round-3 end-of-round sequence (r4 run variant of winddown_r3.sh).
# Run ~1.5h before the driver cuts the round:
#   1. stop the TPU trainer (frees HBM for bench/eval)
#   2. export the r4 checkpoint + f32 robustness sweep + bf16-activation
#      sweep (serve-dtype BER-impact study) + one-pass-bf16 MXU sweep
#   3. re-sweep the r2 demo weights (retires the misconfigured artifact)
#   4. serving throughput: bench.py (bf16 headline) + f32 comparison +
#      profile of the bf16 program
#   5. TPU effect-dispatch crossover bench (docs/EFFECT_DISPATCH.md table)
#   6. re-warm the multichip dryrun compile cache (driver re-runs it cold)
# Each phase tolerates failure and moves on; artifacts land in weights/
# and /tmp for inspection before the final commit.
set -uo pipefail
cd "$(dirname "$0")/.."
export WAVEVERIFY_COMPILE_CACHE=${WAVEVERIFY_COMPILE_CACHE:-$PWD/.jax_cache/train}

echo "== stop trainer =="
# Stop the relaunch supervisor FIRST or it restarts the trainer mid-bench,
# then its child trainer (found by parent pid — never by name pattern).
if [ -f /tmp/train_sup_r4.pid ] && kill -0 "$(cat /tmp/train_sup_r4.pid)" 2>/dev/null; then
  SUP=$(cat /tmp/train_sup_r4.pid)
  KIDS=$(ps -o pid= --ppid "$SUP" 2>/dev/null || true)
  kill "$SUP" 2>/dev/null || true
  for k in $KIDS; do
    GKIDS=$(ps -o pid= --ppid "$k" 2>/dev/null || true)
    kill "$k" 2>/dev/null || true
    for g in $GKIDS; do kill "$g" 2>/dev/null || true; done
  done
  sleep 10
fi
if [ -f /tmp/train_r4.pid ] && kill -0 "$(cat /tmp/train_r4.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_r4.pid)"
  sleep 20
fi

CKPT=${CKPT:-checkpoints/demo_r4}
OUT=${OUT:-weights/waveverify_demo_r4.npz}

echo "== export r4 =="
timeout 600 python - <<EOF || echo "EXPORT FAILED rc=$?"
import jax
from waveverify_tpu.api.core import WaveVerify
from waveverify_tpu.convert import save_weights_npz
wv = WaveVerify(checkpoint_path="${CKPT}/latest")
p = save_weights_npz(wv.params, "${OUT}", config=wv.config)
print("wrote", p)
EOF

echo "== r4 sweep (f32) =="
timeout 1500 python -m waveverify_tpu.eval \
  --checkpoint "$OUT" --batch 16 --duration 5.0 \
  --json-out weights/demo_eval_sweep_r4.json \
  || echo "R4 SWEEP FAILED rc=$?"

echo "== bench (bf16 headline) =="
timeout 900 python bench.py | tee /tmp/bench_bf16.log || echo "BENCH FAILED rc=$?"

echo "== bench (f32 comparison) =="
timeout 900 python bench.py --dtype float32 | tee /tmp/bench_f32.log \
  || echo "BENCH F32 FAILED rc=$?"

echo "== dryrun cache warm =="
timeout 500 python __graft_entry__.py 8 >/tmp/dryrun_final.log 2>&1 \
  && echo "dryrun OK" || echo "DRYRUN FAILED rc=$?"

echo "== r4 sweep (bf16 activations — serve-dtype study) =="
timeout 1200 python -m waveverify_tpu.eval \
  --checkpoint "$OUT" --batch 16 --duration 5.0 \
  --serve-dtype bfloat16 \
  --json-out weights/demo_eval_sweep_r4_bf16act.json \
  || echo "BF16-ACT SWEEP FAILED rc=$?"

echo "== r2 re-sweep (retire the misconfigured artifact) =="
timeout 1200 python -m waveverify_tpu.eval \
  --checkpoint weights/waveverify_demo.npz --batch 16 --duration 5.0 \
  --json-out weights/demo_eval_sweep_r2_corrected.json \
  || echo "R2 RESWEEP FAILED rc=$?"

echo "== serving profile (bf16) =="
timeout 900 python scripts/profile_serving.py --batch 64 --iters 10 \
  --dtype bfloat16 > /tmp/profile_serving_bf16.log 2>&1 \
  || echo "PROFILE FAILED rc=$?"
tail -5 /tmp/profile_serving_bf16.log || true

echo "== dispatch bench (TPU) =="
timeout 900 python benchmarks/effect_dispatch_bench.py --iters 10 \
  | tee /tmp/dispatch_bench_tpu.log || echo "DISPATCH BENCH FAILED rc=$?"

echo "== winddown done =="
