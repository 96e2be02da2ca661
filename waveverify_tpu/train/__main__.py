"""Training CLI: ``python -m waveverify_tpu.train --config conf/base.yml``.

Replaces the reference's argbind entry point
(``python scripts/train.py --args.load conf/base.yml``, reference
scripts/train.py:2121-2159) with a plain argparse CLI over the typed config.
The YAML schema is the reference's conf/base.yml (both nested and flat keys).
"""

from __future__ import annotations

import argparse
import logging


def main() -> None:
    ap = argparse.ArgumentParser(description="Train waveverify_tpu")
    ap.add_argument("--config", default=None,
                    help="reference-format YAML (conf/base.yml schema)")
    ap.add_argument("--effects-config", default=None,
                    help="effects YAML (conf/effects_config.yml schema); "
                    "default tries conf/effects_config.yml then built-ins")
    ap.add_argument("--train-folders", nargs="*", default=[],
                    help="folders of training WAVs (synthetic if empty)")
    ap.add_argument("--val-folders", nargs="*", default=[])
    ap.add_argument("--ckpt-dir", default="checkpoints")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--val-batch-size", type=int, default=None)
    ap.add_argument("--train-duration", type=float, default=None)
    ap.add_argument("--val-duration", type=float, default=None,
                    help="seconds per validation clip (default 5.0; lower "
                    "this on compile-memory-constrained hosts)")
    ap.add_argument("--num-devices", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="K training steps per XLA call (lax.scan); "
                    "amortizes remote-device dispatch latency K-fold")
    ap.add_argument("--conv-precision", default=None,
                    choices=["highest", "high", "default"],
                    help="MXU conv precision for training (default: highest "
                    "= f32 accumulation; 'default' = bf16 passes, ~2x)")
    ap.add_argument("--effect-dispatch", default="stack",
                    choices=["stack", "scan"],
                    help="EffectBank dispatch: 'stack' computes every branch "
                    "and gathers (best for small banks); 'scan' runs one "
                    "branch per sample via lax.switch (E-independent, for "
                    "large grids — see docs/EFFECT_DISPATCH.md)")
    ap.add_argument("--pallas", default=None, choices=["auto", "on", "off"],
                    help="pallas kernel mode (default: auto, or the "
                    "WAVEVERIFY_PALLAS env var)")
    ap.add_argument("--platform", default=None,
                    help="force the JAX backend (e.g. 'cpu' for smoke runs). "
                    "Needed because remote-TPU sitecustomize hooks may pin "
                    "jax_platforms via jax.config, which overrides the "
                    "JAX_PLATFORMS env var; also honors WAVEVERIFY_PLATFORM")
    ap.add_argument("--split-disc", action="store_true",
                    help="compile the discriminator update (with its "
                    "second-order gradient-penalty graph) as its own XLA "
                    "program — each program is ~half the monolithic HLO, "
                    "fitting remat/Pallas under memory-tight compile "
                    "services (semantics identical; one extra no-grad "
                    "generator forward on disc-training steps)")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable forward rematerialization (smaller HLO / "
                    "faster compile, higher HBM; use with smaller batches)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VAL",
                    help="override any config key (YAML syntax for values), "
                    "e.g. --set AdamW.lr=2e-4 --set Generator.dimension=64 "
                    "--set num_iters=100000 — same keys as conf/base.yml, "
                    "flat dotted form included (argbind-style overrides)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--init-weights", default=None, metavar="NPZ",
                    help="warm-start generator/detector/locator params from "
                    "a save_weights_npz file (used when --resume finds no "
                    "checkpoint; optimizer state starts fresh)")
    ap.add_argument("--init-meta", default=None, metavar="JSON",
                    help="checkpoint meta.json applied with --init-weights: "
                    "restores the step counter and ramp/nbits/effect-"
                    "scheduler controller state so a warm start continues "
                    "where a lost orbax checkpoint left off")
    ap.add_argument("--reinit-msg-path", action="store_true",
                    help="after resume/warm-start, re-initialize the "
                    "generator's message-embedding MLP (msg_in/msg_hidden_*) "
                    "— for continuing checkpoints with weight-decay-collapsed "
                    "message channels or switching Generator.msg_mode")
    ap.add_argument("--log-file", default="train_log.jsonl")
    ap.add_argument("--tensorboard", default=None, metavar="DIR",
                    help="also mirror scalars to TensorBoard events in DIR")
    ap.add_argument("--wandb", default=None, metavar="PROJECT",
                    help="mirror metrics + audio samples to a wandb project "
                    "(no-ops with a warning when wandb is not installed)")
    ap.add_argument("--profile-steps", default=None, metavar="START:STOP",
                    help="jax.profiler trace of steps [START, STOP) to "
                    "<ckpt-dir>/profile")
    ap.add_argument("--debug-nans", action="store_true",
                    help="jax_debug_nans: fail fast on the first NaN "
                    "(replaces torch detect_anomaly, SURVEY.md §5)")
    ap.add_argument("--no-samples", action="store_true",
                    help="disable periodic audio sample dumps")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )

    import os

    platform = args.platform or os.environ.get("WAVEVERIFY_PLATFORM")
    if platform:
        import jax

        # Must land before the first backend query; overrides any
        # jax_platforms value a sitecustomize hook set at import time.
        jax.config.update("jax_platforms", platform)

    from waveverify_tpu.config import load_config
    from waveverify_tpu.parallel import initialize_distributed
    from waveverify_tpu.train.loop import TrainerConfig, train

    initialize_distributed()

    overrides = {}
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.val_batch_size is not None:
        overrides["val_batch_size"] = args.val_batch_size
    if args.train_duration is not None:
        overrides["train_duration"] = args.train_duration
    if args.val_duration is not None:
        overrides["val_duration"] = args.val_duration
    if args.no_remat:
        overrides["remat"] = False
    for kv in args.set:
        if "=" not in kv:
            ap.error(f"--set expects KEY=VALUE, got {kv!r}")
        k, v = kv.split("=", 1)
        import yaml

        val = yaml.safe_load(v)
        if isinstance(val, str):  # YAML 1.1 won't parse '2e-4' as float
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
        overrides[k.strip()] = val
    import os

    import jax

    # Persistent compile cache: the production train step takes tens of
    # minutes to compile over the remote-TPU tunnel; caching it makes every
    # restart/resume start hot. Keyed by HLO + topology, so config changes
    # miss naturally. Override location with WAVEVERIFY_COMPILE_CACHE.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVEVERIFY_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/waveverify_tpu_xla")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    profile_start = profile_stop = None
    if args.profile_steps:
        profile_start, profile_stop = (int(s) for s in
                                       args.profile_steps.split(":"))

    cfg = load_config(args.config, overrides or None)
    trainer = TrainerConfig(
        train_folders=tuple(args.train_folders),
        val_folders=tuple(args.val_folders),
        ckpt_dir=args.ckpt_dir,
        log_file=args.log_file,
        num_devices=args.num_devices,
        log_every=args.log_every,
        profile_start=profile_start,
        profile_stop=profile_stop,
        dump_samples=not args.no_samples,
        effects_config=args.effects_config,
        tensorboard_dir=args.tensorboard,
        wandb_project=args.wandb,
        pallas_mode=args.pallas,
        steps_per_dispatch=args.steps_per_dispatch,
        conv_precision=args.conv_precision,
        effect_dispatch=args.effect_dispatch,
        init_weights=args.init_weights,
        init_meta=args.init_meta,
        reinit_msg_path=args.reinit_msg_path,
        split_disc_step=args.split_disc,
    )
    train(cfg, trainer, max_steps=args.max_steps, resume=args.resume)


if __name__ == "__main__":
    main()
