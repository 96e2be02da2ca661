"""Host-side breakdown of the production training step's wall-clock.

The tracker's `step_time` (~1.3 s at batch 16 / 0.9 s clips on v5e over
the tunnel) bundles host batch production, effect scheduling, H2D
transfer, device execution, and the one-dispatch-late feedback fetch.
This script separates them so optimization effort goes where the time is
(reference throughput work: the builder's ~0.3 s/step compute estimate in
docs/ROADMAP.md).

Phases measured per step (means over --steps after --warmup):
  batch     next(batches) — synthetic/folder batch production (threaded
            prefetch, so ~0 unless the single CPU core is saturated)
  sched     EffectScheduler.select_bank_indices (host RNG + bookkeeping)
  shard     shard_batch + block_until_ready on the device arrays (H2D)
  dispatch  step_fn call returning (async enqueue; ~0 unless the program
            is retracing or dispatch serializes on the tunnel)
  device    block_until_ready on the new state (actual execution,
            overlapped with nothing here — upper bound of compute)
  fetch     np.asarray of the feedback outputs (per-sample BER/MIoU +
            replicated train/ber) AFTER execution finished (pure D2H)

Usage (matches scripts/train_demo_r2.sh's recipe):
  python scripts/profile_step.py --steps 20 [--resume checkpoints/demo_r2c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to load 'latest' from")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--duration", type=float, default=0.9)
    ap.add_argument("--cpu", action="store_true",
                    help="profile on the CPU backend (sanity runs)")
    ap.add_argument("--tiny", action="store_true",
                    help="test-size models (smoke-run the harness itself)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVEVERIFY_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/waveverify_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from waveverify_tpu.config import load_config
    from waveverify_tpu.effects.effects import EffectBank
    from waveverify_tpu.effects.scheduler import EffectScheduler
    from waveverify_tpu.ops.pallas_kernels import set_pallas_mode
    from waveverify_tpu.parallel import make_mesh, replicated_sharding, shard_batch
    from waveverify_tpu.train import checkpoint as ckpt
    from waveverify_tpu.train.data import (SyntheticAudioDataset,
                                           prefetch_batches)
    from waveverify_tpu.train.loop import load_effects_config, shard_train_step
    from waveverify_tpu.train.state import create_train_state
    from waveverify_tpu.train.step import make_train_step
    from waveverify_tpu.train.watermarking import WatermarkModels

    # the pinned single-chip recipe (scripts/train_demo_r3.sh) — keep in
    # lockstep with that script: matching it exactly makes this harness hit
    # the trainer's persistent compile cache (~/.cache/waveverify_tpu_xla)
    # instead of paying a tens-of-minutes cold compile on the tunnel.
    set_pallas_mode("off")
    overrides = {
        "batch_size": args.batch_size,
        "train_duration": args.duration,
        "remat": False,
        "warmup.steps": 6000,
        "warmup.init_scale": 0.01,
        "warmup.ber_gate": 0.05,
        "warmup.fx_gate": 0.05,
        "warmup.disc_every": 4,
        "Generator.film_gamma_bias": 1.0,
        "Generator.msg_mode": "carrier",
        "Generator.film_carrier_gain": 0.5,
        "Generator.latent_carrier_gain": 0.2,
        "AdamW.detector_lr_mult": 10,
        "AdamW.generator_lr_mult": 2,
        "lambdas.dec/loss_clean": 10000,
        "lambdas.dec/loss_bits": 20000,
    }
    if args.tiny:  # harness smoke: same code path, test-size networks
        for prefix in ("Generator", "Detector", "Locator"):
            overrides.update({f"{prefix}.dimension": 32,
                              f"{prefix}.channels_enc": 8,
                              f"{prefix}.n_residual_enc": 1})
        overrides.update({"Generator.channels_dec": 12,
                          "Generator.n_residual_dec": 1,
                          "Detector.output_dim": 8,
                          "Locator.output_dim": 8,
                          "Discriminator.periods": [2],
                          "Discriminator.fft_sizes": [256],
                          "MultiScaleSTFTLoss.window_lengths": [256],
                          "MelSpectrogramLoss.n_mels": [5, 10],
                          "MelSpectrogramLoss.window_lengths": [128, 256]})
    cfg = load_config(None, overrides)

    mesh = make_mesh()
    models = WatermarkModels.from_config(cfg)
    fx = load_effects_config(None)
    bank = EffectBank(fx.train_effects, cfg.generator.sample_rate)
    scheduler = EffectScheduler(effect_params=fx.effect_param_grid,
                                beta=fx.beta, ber_threshold=fx.ber_threshold,
                                miou_threshold=fx.miou_threshold,
                                rng=np.random.RandomState(1))
    key = jax.random.PRNGKey(0)
    state = create_train_state(cfg, key, models)
    if args.resume:
        state, meta = ckpt.load_checkpoint(args.resume, "latest", state)
        print(f"resumed step {meta.get('step')}")
    state = jax.device_put(state, replicated_sharding(mesh))
    # with_train_disc mirrors loop.py's disc_gate (warmup.disc_every > 1 in
    # the pinned recipe) — the extra replicated bool changes the program, so
    # it must match the trainer for the cache hit
    step_fn = shard_train_step(make_train_step(models, cfg, bank), mesh,
                               with_percep_scale=True, with_train_disc=True)

    ds = SyntheticAudioDataset(cfg.train_duration, cfg.generator.sample_rate, 3)
    batches = prefetch_batches(ds, cfg.batch_size,
                               cfg.generator.msg_dimension, 3)
    ramp_scale = np.float32(0.01)

    phases = {k: [] for k in
              ("batch", "sched", "shard", "dispatch", "device", "fetch")}
    t_total0 = None
    for i in range(args.warmup + args.steps):
        rec = i >= args.warmup
        if rec and t_total0 is None:
            t_total0 = time.perf_counter()
        t0 = time.perf_counter()
        audio, msg = next(batches)
        t1 = time.perf_counter()
        idx, _sel = scheduler.select_bank_indices(cfg.batch_size, bank.specs)
        t2 = time.perf_counter()
        audio_d, msg_d, idx_d = shard_batch(mesh, audio, msg, idx)
        jax.block_until_ready((audio_d, msg_d, idx_d))
        t3 = time.perf_counter()
        state, metrics = step_fn(state, audio_d, msg_d, idx_d, key,
                                 ramp_scale, np.bool_(i % 4 == 0))
        t4 = time.perf_counter()
        jax.block_until_ready(metrics["train/ber"])
        t5 = time.perf_counter()
        _ = (np.asarray(metrics["per_sample_ber"]),
             np.asarray(metrics["per_sample_miou"]),
             float(np.asarray(metrics["train/ber"])))
        t6 = time.perf_counter()
        if rec:
            for k, d in zip(phases, (t1 - t0, t2 - t1, t3 - t2,
                                     t4 - t3, t5 - t4, t6 - t5)):
                phases[k].append(d)
        else:
            print(f"warmup {i}: {t6 - t0:.2f}s (includes compile on step 0)")
    total = (time.perf_counter() - t_total0) / args.steps

    print(f"\nbackend={jax.devices()[0].platform} batch={cfg.batch_size} "
          f"clip={cfg.train_duration}s steps={args.steps}")
    for k, v in phases.items():
        print(f"  {k:9s} mean {np.mean(v)*1e3:8.1f} ms   "
              f"p50 {np.percentile(v, 50)*1e3:8.1f}   "
              f"max {np.max(v)*1e3:8.1f}")
    print(f"  {'TOTAL':9s} mean {total*1e3:8.1f} ms/step "
          f"({1.0/total:.2f} steps/s)")


if __name__ == "__main__":
    main()
