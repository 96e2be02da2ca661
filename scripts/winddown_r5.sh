#!/usr/bin/env bash
# Round-4 end-of-round sequence (r5 run variant of winddown_r4.sh).
# Run ~2h before the driver cuts the round:
#   1. stop the TPU trainer (frees HBM for bench/eval)
#   2. export the r5 checkpoint
#   3. serving throughput FIRST (BENCH_r04 artifact): bench.py in both
#      Pallas layouts (tbc = new default, btc = r3 kernel) + f32 reference;
#      the winner becomes the shipped default
#   4. robustness sweeps: f32, bf16-activation (decision-neutrality study,
#      VERDICT task 6), REAL-SPEECH (reference example clips, task 7), and
#      the r2 re-sweep (task 9)
#   5. effect-dispatch table completion E=24/33 (task 8)
#   6. split-disc measured step time at the reference batch-32 x 1 s
#      config (task 5) — bounded; an OOM/timeout is itself the measurement
#   7. re-warm the multichip dryrun compile cache (driver re-runs it cold)
# Each phase tolerates failure and moves on; artifacts land in weights/
# and /tmp for inspection before the final commit.
set -uo pipefail
cd "$(dirname "$0")/.."
export WAVEVERIFY_COMPILE_CACHE=${WAVEVERIFY_COMPILE_CACHE:-$PWD/.jax_cache/train}

echo "== stop trainer =="
# Stop the relaunch supervisor FIRST or it restarts the trainer mid-bench,
# then its child trainer (found by parent pid — never by name pattern).
if [ -f /tmp/train_sup_r5.pid ] && kill -0 "$(cat /tmp/train_sup_r5.pid)" 2>/dev/null; then
  SUP=$(cat /tmp/train_sup_r5.pid)
  KIDS=$(ps -o pid= --ppid "$SUP" 2>/dev/null || true)
  kill "$SUP" 2>/dev/null || true
  for k in $KIDS; do
    GKIDS=$(ps -o pid= --ppid "$k" 2>/dev/null || true)
    kill "$k" 2>/dev/null || true
    for g in $GKIDS; do kill "$g" 2>/dev/null || true; done
  done
  sleep 10
fi
if [ -f /tmp/train_r5.pid ] && kill -0 "$(cat /tmp/train_r5.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_r5.pid)"
  sleep 20
fi
# Stop the snapshot-commit daemon too: its CPU export + pathspec commits
# are harmless but could race the winddown's own export/commits.
if [ -f /tmp/snapshot_commit_r5.pid ] \
   && kill -0 "$(cat /tmp/snapshot_commit_r5.pid)" 2>/dev/null; then
  kill "$(cat /tmp/snapshot_commit_r5.pid)" 2>/dev/null || true
fi

CKPT=${CKPT:-checkpoints/demo_r5}
OUT=${OUT:-weights/waveverify_demo_r5.npz}

echo "== export r5 =="
timeout 600 python - <<EOF || echo "EXPORT FAILED rc=$?"
import jax
from waveverify_tpu.api.core import WaveVerify
from waveverify_tpu.convert import save_weights_npz
wv = WaveVerify(checkpoint_path="${CKPT}/latest")
p = save_weights_npz(wv.params, "${OUT}", config=wv.config)
print("wrote", p)
EOF

echo "== r5 sweep (f32) =="
timeout 1500 python -m waveverify_tpu.eval \
  --checkpoint "$OUT" --batch 16 --duration 5.0 \
  --json-out weights/demo_eval_sweep_r5.json \
  || echo "R5 SWEEP FAILED rc=$?"

# Commit the two artifacts that matter most the moment they exist —
# container recycling mid-winddown cost round 4 its entire results.
git add -- "$OUT" weights/demo_eval_sweep_r5.json 2>/dev/null \
  && git commit -q -m "round-5 checkpoint export + f32 robustness sweep" \
       -- "$OUT" weights/demo_eval_sweep_r5.json \
  && echo "committed checkpoint + f32 sweep" || true

echo "== r5 sweep (bf16 activations — serve-dtype study) =="
timeout 1200 python -m waveverify_tpu.eval \
  --checkpoint "$OUT" --batch 16 --duration 5.0 \
  --serve-dtype bfloat16 \
  --json-out weights/demo_eval_sweep_r5_bf16act.json \
  || echo "BF16-ACT SWEEP FAILED rc=$?"

echo "== r5 sweep (REAL SPEECH — reference example clips) =="
timeout 1200 python -m waveverify_tpu.eval \
  --checkpoint "$OUT" --batch 16 --duration 5.0 \
  --audio-folders /root/reference/examples/audios \
  --json-out weights/demo_eval_sweep_r5_real.json \
  || echo "REAL SWEEP FAILED rc=$?"

echo "== r2 re-sweep (retire the in-training-number debt) =="
timeout 1200 python -m waveverify_tpu.eval \
  --checkpoint weights/waveverify_demo.npz --batch 16 --duration 5.0 \
  --json-out weights/demo_eval_sweep_r2_corrected.json \
  || echo "R2 RESWEEP FAILED rc=$?"

# commit the remaining sweep/bench artifacts before the long tail phases
git add -- weights/demo_eval_sweep_r5_bf16act.json \
  weights/demo_eval_sweep_r5_real.json \
  weights/demo_eval_sweep_r2_corrected.json 2>/dev/null \
  && git commit -q -m "round-5 sweeps: bf16-act neutrality, real speech, r2 re-sweep" \
       -- weights/demo_eval_sweep_r5_bf16act.json \
          weights/demo_eval_sweep_r5_real.json \
          weights/demo_eval_sweep_r2_corrected.json \
  && echo "committed secondary sweeps" || true

echo "== bench: bf16 + pallas tbc (shipped default; driver re-runs this) =="
timeout 900 python bench.py | tee /tmp/bench_bf16_tbc.log || echo "BENCH TBC FAILED rc=$?"

echo "== bench: bf16 + pallas btc (r3 kernel layout) =="
timeout 900 env WAVEVERIFY_PALLAS_LAYOUT=btc python bench.py \
  | tee /tmp/bench_bf16_btc.log || echo "BENCH BTC FAILED rc=$?"

echo "== bench: f32 comparison =="
timeout 900 python bench.py --dtype float32 | tee /tmp/bench_f32.log \
  || echo "BENCH F32 FAILED rc=$?"

echo "== dispatch bench (complete the E table) =="
timeout 1200 python benchmarks/effect_dispatch_bench.py --iters 10 \
  | tee /tmp/dispatch_bench_tpu.log || echo "DISPATCH BENCH FAILED rc=$?"

echo "== serving profile (bf16, winning layout) =="
timeout 900 python scripts/profile_serving.py --batch 64 --iters 10 \
  --dtype bfloat16 > /tmp/profile_serving_bf16_r5.log 2>&1 \
  || echo "PROFILE FAILED rc=$?"
tail -8 /tmp/profile_serving_bf16_r5.log || true

echo "== dryrun cache warm =="
timeout 600 python __graft_entry__.py 8 >/tmp/dryrun_final.log 2>&1 \
  && echo "dryrun OK" || echo "DRYRUN FAILED rc=$?"

echo "== split-disc measured: batch 32 x 1 s with remat (long tail, last) =="
CKPT=checkpoints/probe_split STEPS=25 RESUME= \
  EXTRA="--split-disc --batch-size 32 --set train_duration=1.0 --set valid_freq=1000000 --no-samples --log-every 5" \
  timeout 3000 bash -c 'sed -e "s/--no-remat //" scripts/train_demo_r5.sh > scripts/_train_split_probe.sh && bash scripts/_train_split_probe.sh' \
  > /tmp/train_split_b32.log 2>&1 \
  && tail -3 checkpoints/probe_split/train_log.jsonl \
  || { echo "SPLIT B32 RUN FAILED rc=$? (see /tmp/train_split_b32.log)"; tail -5 /tmp/train_split_b32.log; }

echo "== winddown done =="
