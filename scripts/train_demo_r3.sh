#!/usr/bin/env bash
# Round-2b demo training run: staged attack curriculum (single v5e chip).
#
# What changed vs scripts/train_demo_r2.sh, and why (the isolation
# experiments behind each choice are scripts/exp_decode.py + the curves in
# docs/TRAINING.md):
# - warmup.fx_gate=0.05: stage the curriculum. Stage A trains the clean
#   code only (identity attacks, perceptual weight EXACTLY 0 — the E1
#   experiment forms the code to BER 0.1 in 2k steps under these
#   conditions, while the r2c run's 0.01-scaled perceptual gradient was
#   systematic against the then-noise decode gradient and squeezed the
#   residual L1 from 0.23 to 0.028, killing code formation). Attacks
#   latch on when train-BER EMA <= 0.05; the perceptual squeeze then
#   waits for the ATTACKED BER to re-descend below ber_gate.
# - no alternating freeze (warmup.alt_*): E1 co-learns fine jointly; the
#   75% generator freeze mainly slowed code formation.
# - AdamW.generator_lr_mult=2: the generator is the slow side of clean
#   code formation (E0: a static code decodes in ~600 steps; E1's 2k-step
#   tail is generator-limited).
# - everything else matches the r2c recipe (see train_demo_r2.sh for the
#   batch/HBM and compile-host constraints).
set -euo pipefail
cd "$(dirname "$0")/.."

# Compile cache inside the repo: /root and /tmp are wiped on VM reboots
# (measured 2026-08-19: the resumed trainer paid a ~50 min cold recompile);
# only the repo mount persists. Gitignored (.jax_cache/).
export WAVEVERIFY_COMPILE_CACHE=${WAVEVERIFY_COMPILE_CACHE:-$PWD/.jax_cache/train}

CKPT=${CKPT:-checkpoints/demo_r3}
STEPS=${STEPS:-100000}
RESUME=${RESUME:-}
EXTRA=${EXTRA:-}

exec python -m waveverify_tpu.train \
  --ckpt-dir "$CKPT" \
  --log-file "$CKPT/train_log.jsonl" \
  --batch-size 16 \
  --no-remat --pallas off \
  --max-steps "$STEPS" \
  --log-every 50 \
  --set train_duration=0.9 \
  --set warmup.steps=6000 --set warmup.init_scale=0.01 \
  --set warmup.ber_gate=0.05 \
  --set warmup.fx_gate=0.05 \
  --set warmup.disc_every=4 \
  --set valid_freq=1000 \
  --set sample_freq=10000 \
  --set Generator.film_gamma_bias=1.0 \
  --set Generator.msg_mode=carrier \
  --set Generator.film_carrier_gain="${FILM_CARRIER_GAIN:-0.5}" \
  --set Generator.latent_carrier_gain="${LATENT_CARRIER_GAIN:-0.2}" \
  --set AdamW.detector_lr_mult=10 \
  --set AdamW.generator_lr_mult=2 \
  --set lambdas.dec/loss_clean=10000 \
  --set lambdas.dec/loss_bits=20000 \
  $RESUME $EXTRA
