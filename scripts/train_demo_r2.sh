#!/usr/bin/env bash
# Round-2 demo training run (single v5e chip over the axon tunnel).
#
# Recipe notes (measured on this host class):
# - --no-remat --pallas off: the remote compile helper SIGKILLs on the
#   remat'd/pallas train-step HLO (docs/ROADMAP.md); batch 24 fits HBM
#   without remat (~12 GB peak).
# - warmup.steps=6000: perceptual-loss ramp (config.py LossConfig) so the
#   message channel forms before imperceptibility squeezes it.
# - valid_freq 1000 doubles as the checkpoint cadence -> resume-safe with
#   --resume after any interruption.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${CKPT:-checkpoints/demo_r2}
STEPS=${STEPS:-60000}
RESUME=${RESUME:-}

exec python -m waveverify_tpu.train \
  --ckpt-dir "$CKPT" \
  --batch-size 24 \
  --no-remat --pallas off \
  --max-steps "$STEPS" \
  --log-every 50 \
  --set warmup.steps=6000 --set warmup.init_scale=0.01 \
  --set valid_freq=1000 \
  --set sample_freq=10000 \
  $RESUME
