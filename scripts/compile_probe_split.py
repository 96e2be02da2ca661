#!/usr/bin/env python
"""AOT compile probe for the split-program training mode (VERDICT r3 task 5).

Lowers the disc and gen halves (and optionally the monolithic step) at the
reference batch-32 x 1 s config WITH remat, through the axon chipless
compile helper, and reports compile wall time + XLA memory analysis. No
chip execution — safe to run alongside a live training run.

Usage: python scripts/compile_probe_split.py [--batch 32] [--duration 1.0]
       [--remat/--no-remat] [--pallas off|auto|on] [--mono] [--gen-only]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(message)s")
log = logging.getLogger("probe")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--duration", type=float, default=1.0)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--pallas", default="off", choices=["off", "auto", "on"])
    ap.add_argument("--mono", action="store_true",
                    help="also probe the monolithic step (known to OOM the "
                    "helper with remat — expect failure)")
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--disc-only", action="store_true")
    ap.add_argument("--donate", action="store_true",
                    help="donate the state argument exactly like the train "
                    "loop's jit (pre-warms the persistent compile cache "
                    "for a later real run)")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVEVERIFY_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/waveverify_tpu_xla")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from waveverify_tpu.config import load_config
    from waveverify_tpu.effects.effects import EffectBank
    from waveverify_tpu.effects.effects_config import load_effects_config
    from waveverify_tpu.ops.pallas_kernels import set_pallas_mode
    from waveverify_tpu.parallel import make_mesh, shard_train_step
    from waveverify_tpu.parallel.mesh import shard_disc_step
    from waveverify_tpu.train.state import create_train_state
    from waveverify_tpu.train.step import make_disc_step, make_train_step
    from waveverify_tpu.train.watermarking import WatermarkModels

    set_pallas_mode(args.pallas)
    # the r5 recipe's loss/config knobs (scripts/train_demo_r5.sh) so the
    # probed program is the production one
    overrides = {
        "batch_size": args.batch, "train_duration": args.duration,
        "remat": not args.no_remat, "sub_hop_jitter": True,
        "warmup.steps": 6000, "warmup.init_scale": 0.01,
        "warmup.ber_gate": 0.10, "warmup.fx_gate": 0.12,
        "warmup.disc_every": 4, "warmup.alt_period": 800,
        "warmup.msg_freeze_gate": 0.3, "warmup.msg_refreeze": True,
        "warmup.nbits_start": 4,
        "Generator.film_gamma_bias": 1.0, "Generator.msg_mode": "carrier",
        "Generator.film_carrier_gain": 0.5,
        "Generator.latent_carrier_gain": 0.2,
        "AdamW.detector_lr_mult": 10, "AdamW.generator_lr_mult": 2,
        "lambdas.dec/loss_clean": 10000.0, "lambdas.dec/loss_bits": 20000.0,
    }
    cfg = load_config(None, overrides)
    t = int(args.duration * cfg.generator.sample_rate)
    models = WatermarkModels.from_config(cfg)
    fx = load_effects_config(None)
    bank = EffectBank(fx.train_effects, cfg.generator.sample_rate,
                      dispatch="stack")
    mesh = make_mesh(1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models,
                               example_length=t)

    B = args.batch
    sd = jax.ShapeDtypeStruct
    a_audio = sd((B, t), np.float32)
    a_msg = sd((B, cfg.generator.msg_dimension), np.float32)
    a_idx = sd((B,), np.int32)
    a_key = sd((2,), np.uint32)
    scal = sd((), np.float32)
    a_mask = sd((cfg.generator.msg_dimension,), np.float32)
    flags = dict(with_percep_scale=True, with_train_disc=True,
                 with_gen_scale=True, with_msg_scale=True,
                 with_bit_mask=True)
    extras = (scal, sd((), np.bool_), scal, scal, a_mask)

    def probe(name, jitted, *probe_args):
        t0 = time.time()
        try:
            lowered = jitted.lower(state, *probe_args)
            compiled = lowered.compile()
        except Exception as exc:
            log.info("%-28s FAILED after %.0f s: %s", name,
                     time.time() - t0, str(exc)[:300])
            return
        dt = time.time() - t0
        try:
            ma = compiled.memory_analysis()
            log.info("%-28s OK %.0f s  argbytes=%.2fG out=%.2fG "
                     "temp=%.2fG total_hbm~%.2fG", name, dt,
                     ma.argument_size_in_bytes / 2**30,
                     ma.output_size_in_bytes / 2**30,
                     ma.temp_size_in_bytes / 2**30,
                     (ma.argument_size_in_bytes + ma.output_size_in_bytes
                      + ma.temp_size_in_bytes) / 2**30)
        except Exception:
            log.info("%-28s OK %.0f s (no memory_analysis)", name, dt)

    tag = (f"b{B}x{args.duration}s remat={not args.no_remat} "
           f"pallas={args.pallas}")
    if not args.gen_only:
        probe(f"disc [{tag}]",
              shard_disc_step(make_disc_step(models, cfg), mesh,
                              donate_state=args.donate),
              a_audio, a_msg, a_key)
    if not args.disc_only:
        probe(f"gen  [{tag}]",
              shard_train_step(make_train_step(models, cfg, bank,
                                               update_disc=False), mesh,
                               donate_state=args.donate, **flags),
              a_audio, a_msg, a_idx, a_key, *extras)
    if args.mono:
        probe(f"mono [{tag}]",
              shard_train_step(make_train_step(models, cfg, bank), mesh,
                               donate_state=args.donate, **flags),
              a_audio, a_msg, a_idx, a_key, *extras)


if __name__ == "__main__":
    main()
