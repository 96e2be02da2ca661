"""Measure EffectBank dispatch crossover: stack-all vs per-sample lax.switch.

Usage: python benchmarks/effect_dispatch_bench.py [--batch 32] [--seconds 1.0]

Builds banks of E = 3..33 branches by tiling the production effect grid
with parameter variants, times `apply` under jit on the active backend
(TPU when available), and prints a table — the data behind
docs/EFFECT_DISPATCH.md. Cited reference: the runtime-extensible YAML grid
of utils/effect_augmentation.py:2409-2576, whose CPU round trip this
on-device bank replaces.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def variant_grid(n: int):
    """n (effect, params) branches: production-like spread of cheap + FIR +
    resample branches, parameter-swept."""
    base = []
    cutoffs = [300, 500, 800, 1200, 2000, 3000, 3500, 4000]
    i = 0
    while len(base) < n:
        k = i % 6
        if k == 0:
            base.append(("identity", {}) if i == 0 else
                        ("amplitude_scaling", {"scale": 0.6 + 0.05 * i}))
        elif k == 1:
            base.append(("highpass_filter",
                         {"cutoff_freq": cutoffs[i % len(cutoffs)]}))
        elif k == 2:
            base.append(("lowpass_filter",
                         {"cutoff_freq": cutoffs[i % len(cutoffs)]}))
        elif k == 3:
            base.append(("random_noise", {"noise_std": 0.001 + 0.0002 * i}))
        elif k == 4:
            base.append(("quantization", {"bit_depth": 6 + (i % 5)}))
        else:
            base.append(("echo", {"volume_range": (0.1, 0.5),
                                  "duration_range": (0.1, 0.3)}))
        i += 1
    return base[:n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[3, 6, 9, 15, 24, 33])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (lets the bench run while "
                         "the TPU is occupied by a training job)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from waveverify_tpu.effects.effects import EffectBank

    t = int(16000 * args.seconds)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(args.batch, t).astype(np.float32) * 0.1)
    mask = jnp.ones((args.batch, t), jnp.float32)
    key = jax.random.PRNGKey(0)

    dev = jax.devices()[0]
    print(f"backend: {dev.platform} ({dev})")
    print(f"batch={args.batch} T={t}")
    print(f"{'E':>4} {'stack ms':>10} {'scan ms':>10} {'winner':>8}")

    for e in args.sizes:
        grid = variant_grid(e)
        idx = jnp.asarray(rng.randint(0, e, args.batch).astype(np.int32))
        row = []
        for mode in ("stack", "scan"):
            bank = EffectBank(grid, dispatch=mode)
            fn = jax.jit(bank.apply)
            out = fn(audio, mask, idx, key)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(audio, mask, idx, jax.random.fold_in(key, i))
            jax.block_until_ready(out)
            row.append((time.perf_counter() - t0) / args.iters * 1e3)
        winner = "stack" if row[0] <= row[1] else "scan"
        print(f"{e:>4} {row[0]:>10.2f} {row[1]:>10.2f} {winner:>8}")


if __name__ == "__main__":
    main()
