#!/usr/bin/env python
"""Isolation experiments for the message-decoding channel.

The round-2 training runs plateau with the decode losses dominating the
total by ~1000x, which means the *clean* code-formation problem itself is
not being learned. This script isolates that problem from every other
moving part (no augmentation, no attacks, no discriminator, no perceptual
pressure) so the failure can be attributed:

  --mode det-only   Detector alone demodulates a FIXED pseudo-random
                    audio-level chip code (DSSS): watermarked =
                    audio + alpha * rms(audio) * sum_i s_i c_i / sqrt(n).
                    Pure stationary supervised learning — if this does not
                    reach BER ~ 0 within a few hundred steps, the detector
                    architecture / optimizer / data plumbing is broken.

  --mode cogen      Generator + Detector jointly, losses = clean per-frame
                    decode BCE + clean bit-level BCE only. If det-only
                    passes but this stalls, the generator's message
                    injection is the bottleneck (too weak / entangled /
                    non-stationary), not the detector.

Both run the demo recipe's model config (carrier msg mode, film/latent
carriers, gamma bias) on synthetic speech-like audio with fresh random
messages per step. Prints a JSONL line every --log-every steps.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("WAVEVERIFY_PALLAS", "off")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["det-only", "cogen"], required=True)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--duration", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--det-lr-mult", type=float, default=10.0)
    p.add_argument("--gen-lr-mult", type=float, default=1.0)
    p.add_argument("--alpha", type=float, default=0.1,
                   help="det-only chip code amplitude vs audio RMS")
    p.add_argument("--lambda-bits", type=float, default=1.0)
    p.add_argument("--latent-gain", type=float, default=0.2)
    p.add_argument("--film-gain", type=float, default=0.5)
    p.add_argument("--clip", type=float, default=0.0, help="0 = no clipping")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--platform", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="JSONL log path")
    # --- round-3 interventions (sign-flip lockstep; docs/TRAINING.md) ---
    p.add_argument("--alt-period", type=int, default=0,
                   help="cogen: alternate gen-on/gen-frozen with this period "
                        "(0 = joint updates every step)")
    p.add_argument("--alt-gen-frac", type=float, default=0.15,
                   help="fraction of each alt period with generator updates")
    p.add_argument("--det-warm", type=int, default=0,
                   help="cogen: freeze the generator for the first N steps "
                        "so the detector learns the stationary init-time code")
    p.add_argument("--init-ckpt", default=None,
                   help="warm-start generator+detector from an orbax "
                        "checkpoint tag dir (e.g. checkpoints/demo_r3/latest)")
    p.add_argument("--curr-bits", type=int, default=0,
                   help="nbits curriculum: mask decode losses to this many "
                        "bits, double when masked-BER EMA < --curr-gate "
                        "(0 = all bits from the start)")
    p.add_argument("--curr-gate", type=float, default=0.02)
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVEVERIFY_EXP_CACHE", "/tmp/waveverify_exp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from waveverify_tpu.config import (DetectorConfig, GeneratorConfig)
    from waveverify_tpu.models import Detector, Generator
    from waveverify_tpu.train.data import SyntheticAudioDataset

    gen_cfg = GeneratorConfig(
        film_gamma_bias=1.0, msg_mode="carrier",
        film_carrier_gain=args.film_gain,
        latent_carrier_gain=args.latent_gain,
    )
    det_cfg = DetectorConfig()
    nbits = det_cfg.nbits

    generator = Generator(config=gen_cfg)
    detector = Detector(config=det_cfg)

    ds = SyntheticAudioDataset(duration=args.duration, seed=args.seed + 1)
    rng = np.random.RandomState(args.seed + 2)
    T = int(args.duration * 16000)

    def batch_host():
        a = np.asarray(ds.batch(args.batch), np.float32)
        if a.ndim == 3:
            a = a[..., 0]
        m = rng.randint(0, 2, size=(args.batch, nbits)).astype(np.float32)
        return a, m

    key = jax.random.PRNGKey(args.seed)
    a0, m0 = batch_host()

    det_params = detector.init(
        {"params": jax.random.fold_in(key, 1)}, jnp.asarray(a0)[..., None]
    )["params"]

    # fixed chip sequences for det-only (host constant, baked into the jit)
    chips = (rng.randint(0, 2, size=(nbits, T)).astype(np.float32) * 2 - 1)
    chips = jnp.asarray(chips / np.sqrt(nbits))  # [nbits, T], code RMS ~ 1

    def losses_from_logits(logits, msg, bit_mask):
        # per-frame BCE + bit-level BCE, each computed PER BIT and then
        # weighted by the (host-fed, traced) curriculum mask so the nbits
        # curriculum changes no program. Also returns per-bit accuracy —
        # the sign-flip-lockstep signature is individual bits pinned well
        # below 0.5 while the mean plateaus.
        target = jnp.broadcast_to(msg[:, None, :], logits.shape)
        el = jax.nn.softplus(logits) - logits * target  # [B, T, nbits]
        per_bit_frame = jnp.mean(el, axis=(0, 1))  # [nbits]
        z = jnp.mean(logits, axis=1)  # [B, nbits] time-mean logits
        zel = jax.nn.softplus(z) - z * msg
        per_bit_bits = jnp.mean(zel, axis=0)  # [nbits]
        denom = jnp.maximum(jnp.sum(bit_mask), 1.0)
        frame = jnp.sum(per_bit_frame * bit_mask) / denom
        bits = jnp.sum(per_bit_bits * bit_mask) / denom
        bit_acc = jnp.mean(((z > 0) == (msg > 0.5)).astype(jnp.float32),
                           axis=0)  # [nbits]
        ber = 1.0 - jnp.mean(bit_acc)
        ber_masked = 1.0 - jnp.sum(bit_acc * bit_mask) / denom
        return frame, bits, ber, ber_masked, bit_acc

    if args.mode == "det-only":
        params = {"detector": det_params}

        def loss_fn(params, audio, msg, _key, bit_mask):
            s = 2.0 * msg - 1.0  # [B, nbits]
            rms = jnp.sqrt(jnp.mean(audio ** 2, axis=1, keepdims=True))
            code = s @ chips  # [B, T]
            wm = audio + args.alpha * rms * code
            logits = detector.apply({"params": params["detector"]},
                                    wm[..., None])
            frame, bits, ber, ber_m, acc = losses_from_logits(
                logits, msg, bit_mask)
            total = frame + args.lambda_bits * bits
            return total, {"frame": frame, "bits": bits, "ber": ber,
                           "ber_masked": ber_m, "bit_acc": acc}

        labels = {"detector": "det"}
    else:
        gen_params = generator.init(
            {"params": jax.random.fold_in(key, 2)},
            jnp.asarray(a0)[..., None], jnp.asarray(m0),
        )["params"]
        params = {"generator": gen_params, "detector": det_params}
        if args.init_ckpt:
            # warm-start from a real training checkpoint (e.g. the r3
            # plateau) to test whether an intervention unlocks it
            from waveverify_tpu.train.checkpoint import load_params
            d, tag = os.path.split(args.init_ckpt.rstrip("/"))
            wm = load_params(d, tag)
            params = {"generator": wm["generator"],
                      "detector": wm["detector"]}
            print(json.dumps({"warm_start": args.init_ckpt}), flush=True)

        def loss_fn(params, audio, msg, _key, bit_mask):
            res = generator.apply({"params": params["generator"]},
                                  audio[..., None], msg)[..., 0]
            wm = audio + res
            logits = detector.apply({"params": params["detector"]},
                                    wm[..., None])
            frame, bits, ber, ber_m, acc = losses_from_logits(
                logits, msg, bit_mask)
            total = frame + args.lambda_bits * bits
            rr = jnp.sqrt(jnp.mean(res ** 2)) / jnp.sqrt(jnp.mean(audio ** 2))
            return total, {"frame": frame, "bits": bits, "ber": ber,
                           "ber_masked": ber_m, "bit_acc": acc,
                           "res_rms_rel": rr}

        labels = {"generator": "gen", "detector": "det"}

    tx = optax.multi_transform(
        {
            "det": optax.adamw(args.lr * args.det_lr_mult, b1=0.8, b2=0.99,
                               weight_decay=0.01),
            "gen": optax.adamw(args.lr * args.gen_lr_mult, b1=0.8, b2=0.99,
                               weight_decay=0.01),
        },
        {k: labels.get(k, "det") for k in params},
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, audio, msg, key, gen_scale, bit_mask):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, audio, msg, key, bit_mask
        )
        if "generator" in grads:
            # alternating freeze: host-fed traced 0/1 — no recompiles
            grads = dict(grads, generator=jax.tree_util.tree_map(
                lambda g: g * gen_scale, grads["generator"]))
        gnorm = optax.global_norm(grads)
        if args.clip > 0:
            scale = jnp.minimum(1.0, args.clip / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux = dict(aux, total=total, grad_norm=gnorm)
        return params, opt_state, aux

    out = open(args.out, "a") if args.out else None
    t0 = time.time()
    cur_bits = args.curr_bits if args.curr_bits > 0 else nbits
    ber_ema = 0.5
    for i in range(args.steps):
        a, m = batch_host()
        key, sub = jax.random.split(key)
        gen_on = 1.0
        if args.mode == "cogen":
            if i < args.det_warm:
                gen_on = 0.0
            elif args.alt_period > 0:
                j = i - args.det_warm
                gen_on = (1.0 if (j % args.alt_period)
                          < max(1, int(args.alt_period * args.alt_gen_frac))
                          else 0.0)
        bit_mask = np.zeros(nbits, np.float32)
        bit_mask[:cur_bits] = 1.0
        params, opt_state, aux = step(params, opt_state, jnp.asarray(a),
                                      jnp.asarray(m), sub,
                                      jnp.float32(gen_on),
                                      jnp.asarray(bit_mask))
        ber_ema = 0.98 * ber_ema + 0.02 * float(aux["ber_masked"])
        if cur_bits < nbits and ber_ema < args.curr_gate:
            cur_bits = min(nbits, cur_bits * 2)
            ber_ema = 0.5  # re-arm for the new mask
            print(json.dumps({"step": i, "curriculum_bits": cur_bits}),
                  flush=True)
        if i % args.log_every == 0 or i == args.steps - 1:
            acc = np.asarray(aux.pop("bit_acc"))
            rec = {"step": i,
                   **{k: round(float(v), 5) for k, v in aux.items()},
                   "gen_on": gen_on, "cur_bits": cur_bits,
                   "n_pinned": int((acc <= 0.25).sum()),
                   "n_good": int((acc >= 0.75).sum()),
                   "acc_min": round(float(acc.min()), 3),
                   "bit_acc": [round(float(x), 2) for x in acc],
                   "elapsed_s": round(time.time() - t0, 1)}
            line = json.dumps(rec)
            print(line, flush=True)
            if out:
                out.write(line + "\n")
                out.flush()


if __name__ == "__main__":
    main()
