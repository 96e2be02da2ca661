#!/usr/bin/env bash
# Round-2 demo training run (single v5e chip over the axon tunnel).
#
# Recipe notes (measured on this host class):
# - --no-remat --pallas off: the remote compile helper SIGKILLs on the
#   remat'd/pallas train-step HLO (docs/ROADMAP.md); the scan effect
#   dispatch also tips the helper over — keep the default stack dispatch.
# - batch MUST be a multiple of 8 (v5e tiles the batch dim by 8: batch 20
#   pads to 24 and saves nothing). With lambdas.dec/loss_clean adding a
#   second detector pass, batch 16 @ 0.9 s clips is the largest config
#   that fits 16 GB HBM without remat (batch 16 @ 1.0 s missed by 10 MB).
# - warmup.steps=6000 + ber_gate=0.05: BER-gated perceptual ramp (config.py
#   LossConfig, loop.py BerGatedRamp). The watermark stays loud until the
#   attacked-path train-BER EMA <= 0.05, then squeezes over 6000 ramp steps,
#   pausing whenever the squeeze breaks decoding. (The fixed step-indexed
#   ramp measurably undid decoding: val BER 0.30 -> 0.37 as SI-SNR climbed
#   5.6 -> 10 dB when the ramp hit full weight at 6k.)
# - film_gamma_bias=1 + detector_lr_mult=10 + lambdas.dec/loss_clean:
#   saddle-escape set (see docs/TRAINING.md); the A/B overfit probe shows
#   BER 0 in 120 steps with these vs 0.22+ at 360 without.
# - film_carrier_gain: gain-space carrier (docs/TRAINING.md) — the
#   embedding-space carrier alone still left per-bit audio amplitude to
#   random Dense(1) projection conditioning; at step 32k only the ~5
#   best-conditioned bits had formed. The Hadamard gain-space signature
#   gives all 16 bits equal-power all-band channels by construction.
# - latent_carrier_gain + lambdas.dec/loss_bits: third iteration
#   (docs/TRAINING.md): the FiLM gain slots' audio Jacobian is rank-~2, so
#   even the Hadamard signatures cancel for half the bits; the latent
#   carrier rides the decoder's well-conditioned input Jacobian instead,
#   and the bit-level BCE pushes the deployed time-mean decision directly.
# - warmup.alt_period/alt_gen_frac: while the ramp is closed, freeze the
#   generator for 75% of each 2k-step period so the detector gets long
#   static-code windows to lock all 16 bits.
# - valid_freq 1000 doubles as the checkpoint cadence -> resume-safe with
#   --resume after any interruption.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${CKPT:-checkpoints/demo_r2c}
STEPS=${STEPS:-60000}
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
  --set warmup.disc_every=4 \
  --set valid_freq=1000 \
  --set sample_freq=10000 \
  --set Generator.film_gamma_bias=1.0 \
  --set Generator.msg_mode=carrier \
  --set Generator.film_carrier_gain="${FILM_CARRIER_GAIN:-0.5}" \
  --set Generator.latent_carrier_gain="${LATENT_CARRIER_GAIN:-0.2}" \
  --set warmup.alt_period=2000 --set warmup.alt_gen_frac=0.25 \
  --set AdamW.detector_lr_mult=10 \
  --set lambdas.dec/loss_clean=10000 \
  --set lambdas.dec/loss_bits=20000 \
  $RESUME $EXTRA
