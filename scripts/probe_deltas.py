#!/usr/bin/env python
"""Per-bit audio-sensitivity deltas of a checkpoint (CPU-side).

For each bit i: flip it in a fixed base message and report
RMS(watermarked(msg_i) - watermarked(base)) / RMS(audio) — the audio-domain
amplitude of that bit's channel. The round-2 collapse signature was 11/16
bits at deltas ~1e-3 (dead channels); the carrier fix guarantees a floor.
This probe quantifies whether the code is loud enough for the detector to
bootstrap blind gain estimation (see docs/TRAINING.md).

Usage: python scripts/probe_deltas.py [ckpt=checkpoints/demo_r2c] [dur=0.9]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/demo_r2c"
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9

    from waveverify_tpu.api.core import WaveVerify
    from waveverify_tpu.train.data import SyntheticAudioDataset

    meta = json.load(open(f"{ckpt}/latest/meta.json"))
    wv = WaveVerify(checkpoint_path=f"{ckpt}/latest")
    ds = SyntheticAudioDataset(duration=dur, seed=123)
    audio = np.asarray(ds.batch(4), np.float32)
    if audio.ndim == 3:
        audio = audio[..., 0]
    t = audio.shape[-1]

    base = np.zeros((1, 16), np.float32)
    base[0, ::2] = 1.0  # 1010... pattern

    fn = jax.jit(lambda p, a, m: wv.models.apply_generator(
        p["generator"], a, jnp.broadcast_to(m, (a.shape[0], 16))))

    ref = np.asarray(fn(wv.params, audio, base))
    arms = float(np.sqrt(np.mean(audio ** 2)))
    rrms = float(np.sqrt(np.mean(ref ** 2)))
    deltas = []
    for i in range(16):
        m = base.copy()
        m[0, i] = 1.0 - m[0, i]
        w = np.asarray(fn(wv.params, audio, m))
        deltas.append(float(np.sqrt(np.mean((w - ref) ** 2))))
    print(json.dumps({
        "step": meta["step"],
        "audio_rms": round(arms, 5),
        "residual_rms": round(rrms, 5),
        "bit_delta_rms": [round(d, 5) for d in deltas],
        "delta_over_audio": [round(d / arms, 4) for d in deltas],
        "min_over_max": round(min(deltas) / max(deltas), 4),
    }))


if __name__ == "__main__":
    main()
