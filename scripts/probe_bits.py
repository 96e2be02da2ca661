#!/usr/bin/env python
"""CPU-side per-bit probe of a training checkpoint.

Loads the latest orbax checkpoint and reports per-bit accuracy (identity
effect, full-clip protocol) on synthetic audio — the signature to watch
during the closed-warmup phase is individual bits pinned at 0.0 while the
mean BER plateaus (generator<->detector sign-flip lockstep; see
docs/TRAINING.md and config LossConfig.warmup_alt_period). Runs entirely
on host CPU so it never contends with the training chip.

Usage: python scripts/probe_bits.py [ckpt_dir=checkpoints/demo_r2c] [batch=16]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import numpy as np  # noqa: E402


def main() -> None:
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/demo_r2c"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from waveverify_tpu.api.core import WaveVerify
    from waveverify_tpu.eval import run_sweep
    from waveverify_tpu.train.data import SyntheticAudioDataset

    meta = json.load(open(f"{ckpt}/latest/meta.json"))
    wv = WaveVerify(checkpoint_path=f"{ckpt}/latest")
    ds = SyntheticAudioDataset(duration=1.0, seed=123)
    audio = ds.batch(batch)[..., 0] if ds.batch(batch).ndim == 3 \
        else ds.batch(batch)
    res = run_sweep(wv, np.asarray(audio, np.float32), seed=7,
                    effects=[[("identity", {})]], include_codecs=False)
    row = res["identity"]
    acc = row["bit_acc_full"]
    print(json.dumps({
        "step": meta["step"],
        "ber_full": row["ber_full"],
        "tpr_full": row["tpr_full"],
        "ber": row["ber"],
        "miou": row["miou"],
        "bit_acc_full": acc,
        "n_pinned_low": int(sum(a <= 0.25 for a in acc)),
        "n_good": int(sum(a >= 0.75 for a in acc)),
    }))


if __name__ == "__main__":
    main()
