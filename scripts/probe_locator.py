#!/usr/bin/env python
"""CPU-side locator diagnosis for band-limited attacks.

The round-2 val sweeps show val/ber/lowpass_filter = 0 (the detector reads
the message fine below 2 kHz) while val/miou/lowpass_filter sits at ~0.5 —
the locator emits a near-constant mask under lowpass. This probe loads a
training checkpoint on host CPU (never contends with the training chip) and
reports, per attack, the locator's sigmoid statistics inside the
ground-truth watermarked region vs the spliced-clean region, plus the mIoU
at several decision thresholds. That separates three hypotheses:

  (a) no separation at all  -> the watermark carries no locally-detectable
      low-band signature yet (training-time problem);
  (b) separated but both sides above 0.5 -> threshold/calibration problem
      (a per-effect threshold or temperature would fix it at eval time);
  (c) inverted separation   -> sign flip like round 1's miou 0.002.

Usage: python scripts/probe_locator.py [ckpt_dir=checkpoints/demo_r3] [batch=8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import numpy as np  # noqa: E402

ATTACKS = [
    ("identity", {}),
    ("lowpass_filter", {"cutoff_freq": 2000}),
    ("bandpass_filter", {"cutoff_freq_low": 300, "cutoff_freq_high": 4000}),
    ("highpass_filter", {"cutoff_freq": 3500}),
    ("resample", {"new_sample_rate": 8000}),
]


def main() -> None:
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "checkpoints/demo_r3"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax.numpy as jnp

    from waveverify_tpu.api.core import WaveVerify
    from waveverify_tpu.effects.effects import AudioEffects
    from waveverify_tpu.metrics import miou as miou_fn
    from waveverify_tpu.train.data import SyntheticAudioDataset

    meta = json.load(open(f"{ckpt}/latest/meta.json"))
    wv = WaveVerify(checkpoint_path=f"{ckpt}/latest")
    models, params = wv.models, wv.params

    ds = SyntheticAudioDataset(duration=1.5, seed=123)
    audio = np.asarray(ds.batch(batch), np.float32)
    if audio.ndim == 3:
        audio = audio[..., 0]
    b, t = audio.shape
    rng = np.random.RandomState(7)
    bits = rng.randint(0, 2, (b, 16)).astype(np.float32)

    # splice a clean 20% span back in (same protocol as eval.run_sweep)
    mask = np.ones((b, t), np.float32)
    span = int(t * 0.2)
    for i, s in enumerate(rng.randint(0, t - span, b)):
        mask[i, s: s + span] = 0.0

    @jax.jit
    def wm_splice(params, clean, bits, mask):
        res = models.apply_generator(params["generator"], clean, bits)
        return jnp.where(mask > 0.5, res + clean, clean)

    spliced = wm_splice(params, jnp.asarray(audio), jnp.asarray(bits),
                        jnp.asarray(mask))

    def probe(name, eff_params):
        fn = getattr(AudioEffects, name)

        @jax.jit
        def run(params, x, m):
            x2, m2 = fn(x, m, jax.random.PRNGKey(0),
                        sample_rate=wv.sample_rate, **eff_params)
            m2 = m if m2 is None else m2
            loc = jax.nn.sigmoid(models.apply_locator(params["locator"], x2))
            if loc.ndim == 3:
                loc = loc[..., 0]
            return x2, m2, loc

        _, m2, loc = run(params, spliced, jnp.asarray(mask))
        loc, m2 = np.asarray(loc), np.asarray(m2)
        inside = loc[m2 > 0.5]
        outside = loc[m2 <= 0.5]
        row = {
            "p_mean_wm": float(inside.mean()),
            "p_mean_clean": float(outside.mean()),
            "separation": float(inside.mean() - outside.mean()),
        }
        for thr in (0.3, 0.5, 0.7, 0.9):
            row[f"miou@{thr}"] = float(
                miou_fn((loc > thr).astype(np.float32), m2))
        # best achievable with an oracle per-effect threshold
        row["miou@best"] = max(v for k, v in row.items()
                               if k.startswith("miou@"))
        return row

    out = {"step": meta["step"], "ckpt": ckpt, "batch": batch}
    for name, eff_params in ATTACKS:
        tag = name if not eff_params else (
            name + "(" + ",".join(str(v) for v in eff_params.values()) + ")")
        out[tag] = probe(name, eff_params)
        print(tag, json.dumps(out[tag]), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
