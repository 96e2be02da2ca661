#!/usr/bin/env bash
# Export the round-2 demo checkpoint to weights/ and run the robustness
# sweep against it (writes weights/demo_eval_sweep.json).
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${CKPT:-checkpoints/demo_r2}
OUT=${OUT:-weights/waveverify_demo.npz}
SWEEP=${SWEEP:-weights/demo_eval_sweep.json}
SWEEP_BF16=${SWEEP_BF16:-weights/demo_eval_sweep_bf16.json}

python - <<EOF
import jax
from waveverify_tpu.api.core import WaveVerify
from waveverify_tpu.convert import save_weights_npz
wv = WaveVerify(checkpoint_path="${CKPT}/latest")
p = save_weights_npz(wv.params, "${OUT}", config=wv.config)
print("wrote", p)
EOF

python -m waveverify_tpu.eval \
  --checkpoint "$OUT" \
  --batch 16 --duration 5.0 \
  --json-out "$SWEEP"

# bf16 BER-impact study (docs/ROADMAP.md): same sweep with one-pass bf16
# convs; diff vs the f32-accumulation sweep above quantifies the serving
# precision trade. Tolerates failure (e.g. wedged tunnel) — study is a
# bonus artifact.
python -m waveverify_tpu.eval \
  --checkpoint "$OUT" \
  --batch 16 --duration 5.0 --conv-precision default \
  --json-out "$SWEEP_BF16" \
  || echo "bf16 sweep failed (non-fatal)"
