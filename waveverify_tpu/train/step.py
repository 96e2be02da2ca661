"""Jitted train / validation steps — one XLA program each.

Reference semantics reproduced exactly (scripts/train.py:1248-1480):

1. ONE composite forward (generator -> augment -> effects -> detector /
   locator).
2. Discriminator update first, on the *raw generator output* ("recons" —
   the reference passes ``recons``, not the watermarked sum, to
   ``_update_discriminator``; scripts/train.py:1464) vs the clean signal,
   with the fake detached, LSGAN + WGAN-GP, grads clipped at 10.
3. Generator update second: its adversarial term sees the *freshly updated*
   discriminator (the reference steps optimizer_d before computing
   generator_loss). Six weighted losses; only the generator subtree's grads
   are clipped (scripts/train.py:1351) though the optimizer also steps
   detector + locator.

The single-forward + exact-ordering combination is achieved with
``jax.vjp``: the forward runs once, the discriminator is updated from its
detached outputs, the generator losses are differentiated w.r.t. the forward
*outputs*, and the cotangents are pulled back through the saved vjp. No
second forward, no host sync.
"""

from __future__ import annotations

import functools
from collections.abc import Mapping
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from waveverify_tpu.config import TrainConfig
from waveverify_tpu.effects.effects import EffectBank
from waveverify_tpu.losses import (
    discriminator_loss,
    generator_loss,
    l1_loss,
    localization_loss,
    decoding_loss,
    decoding_loss_bits,
    mel_spectrogram_loss,
    multi_scale_stft_loss,
)
from waveverify_tpu.metrics import ber, miou, sisnr
from waveverify_tpu.train.state import (
    TrainState,
    clip_by_global_norm,
    make_optimizers,
)
from waveverify_tpu.train.watermarking import (
    WatermarkModels,
    forward_train,
    forward_valid,
)

MAX_GRADIENT_NORM = 10.0  # reference scripts/train.py MAX_GRADIENT_NORM


def make_train_step(
    models: WatermarkModels,
    cfg: TrainConfig,
    bank: EffectBank,
    update_disc: bool = True,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the (un-jitted) train step; callers jit/pjit it with their mesh.

    step(state, audio [B,T], msg [B,nbits], effect_idx [B] int32, key)
      -> (state', metrics dict incl. per-sample ber/miou for the scheduler).

    ``update_disc=False`` builds the GENERATOR HALF of the split-program
    mode (VERDICT r3 task 5; see :func:`make_disc_step`): the
    discriminator update — and its second-order gradient-penalty graph —
    is excluded from this program; ``state.disc_params`` is expected to
    have been refreshed by the companion disc program this step. The
    ``train_disc`` flag keeps its loss-gating role (adversarial terms are
    skipped on disc-gated steps) but no longer triggers an update here.
    Halving the program this way fits remat/Pallas under compile services
    that OOM on the monolithic graph (docs/ROADMAP.md known constraints).
    """
    wm_tx, disc_tx = make_optimizers(cfg.optim)
    loss_cfg = cfg.loss
    sr = cfg.generator.sample_rate

    # remat: the ensemble runs 3x per step (fake, real, interpolates for the
    # gradient penalty); storing all its feature maps dominates HBM. Params
    # are an explicit checkpoint argument so gradients flow through remat.
    _disc_ckpt = (
        jax.checkpoint(lambda p, x: models.apply_discriminator(p, x))
        if cfg.remat
        else (lambda p, x: models.apply_discriminator(p, x))
    )

    def disc_apply_fn(params):
        return lambda x: _disc_ckpt(params, x)

    def train_step(state: TrainState, audio: jnp.ndarray, msg: jnp.ndarray,
                   effect_idx: jnp.ndarray, key: jnp.ndarray,
                   percep_scale: Optional[jnp.ndarray] = None,
                   train_disc: Optional[jnp.ndarray] = None,
                   gen_update_scale: Optional[jnp.ndarray] = None,
                   msg_update_scale: Optional[jnp.ndarray] = None,
                   bit_mask: Optional[jnp.ndarray] = None,
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        k_fwd, k_gp = jax.random.split(jax.random.fold_in(key, state.step))

        # ---- 1. single composite forward, vjp saved -----------------------
        def fwd(wm_params):
            return forward_train(
                models, wm_params, k_fwd, audio, msg, effect_idx, bank,
                sample_rate=sr, window_duration=cfg.window_duration,
                remat=cfg.remat,
                clean_detector=loss_cfg.lambda_dec_clean > 0,
                jitter_hop=(cfg.generator.hop_length
                            if cfg.sub_hop_jitter else 0),
                lowband_cutoff=(loss_cfg.lowband_cutoff_hz
                                if loss_cfg.lambda_dec_lowband > 0 else 0.0),
            )

        outs, fwd_vjp = jax.vjp(fwd, state.wm_params)

        # ---- 2. discriminator update (fake = detached raw generator out) --
        fake = jax.lax.stop_gradient(outs["residual"])

        def d_loss_fn(dp):
            return discriminator_loss(
                disc_apply_fn(dp), fake, audio, key=k_gp,
                gp_weight=loss_cfg.gp_weight,
            )

        def _disc_update(_):
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
            d_grads, d_grad_norm = clip_by_global_norm(
                d_grads, MAX_GRADIENT_NORM
            )
            d_updates, disc_opt_state = disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)
            return d_loss, d_grad_norm, disc_params, disc_opt_state

        if not update_disc:
            # split mode: the disc program already refreshed state.disc_params
            d_loss = jnp.float32(0.0)
            d_grad_norm = jnp.float32(0.0)
            disc_params = state.disc_params
            disc_opt_state = state.disc_opt_state
        elif train_disc is None:
            d_loss, d_grad_norm, disc_params, disc_opt_state = _disc_update(
                None
            )
        else:
            # host-gated discriminator cadence (train/loop.py: every step
            # once the BER-gated ramp starts squeezing; every
            # warmup.disc_every-th step while it is closed). While the
            # adversarial weight sits at init_scale the disc only needs to
            # stay warm, not sharp, and its ensemble + second-order gradient
            # penalty is a large share of the step's device time.
            d_loss, d_grad_norm, disc_params, disc_opt_state = jax.lax.cond(
                jnp.asarray(train_disc, bool),
                _disc_update,
                lambda _: (jnp.float32(0.0), jnp.float32(0.0),
                           state.disc_params, state.disc_opt_state),
                None,
            )

        # ---- 3. generator losses vs the UPDATED discriminator -------------
        new_disc_apply = disc_apply_fn(disc_params)

        # perceptual-loss warmup ramp (config.py LossConfig.warmup_steps;
        # 1.0 when disabled). Either a host-fed scalar (BER-gated ramp —
        # loop.py BerGatedRamp passes one per dispatch) or traced from
        # state.step. No recompiles either way.
        if percep_scale is not None:
            percep_scale = jnp.asarray(percep_scale, jnp.float32)
        elif loss_cfg.warmup_steps > 0:
            frac = jnp.clip(
                jnp.asarray(state.step, jnp.float32) / loss_cfg.warmup_steps,
                0.0, 1.0,
            )
            percep_scale = loss_cfg.warmup_init_scale ** (1.0 - frac)
        else:
            percep_scale = 1.0

        def g_loss_fn(fwd_outs):
            w = fwd_outs["watermarked"]
            logs: Dict[str, jnp.ndarray] = {}
            logs["stft/loss"] = multi_scale_stft_loss(
                w, audio, window_lengths=loss_cfg.stft_window_lengths
            )
            logs["mel/loss"] = mel_spectrogram_loss(
                w, audio, sample_rate=sr,
                n_mels=loss_cfg.mel_n_mels,
                window_lengths=loss_cfg.mel_window_lengths,
                clamp_eps=loss_cfg.mel_clamp_eps,
                mag_weight=loss_cfg.mel_mag_weight,
                pow=loss_cfg.mel_pow,
            )
            logs["waveform/loss"] = l1_loss(w, audio)
            if train_disc is None:
                adv_gen, adv_feat = generator_loss(new_disc_apply, w, audio)
            else:
                # skip the disc forwards (and their pullback) on gated steps;
                # the zero replaces lambda_adv_gen's contribution exactly
                adv_gen, adv_feat = jax.lax.cond(
                    jnp.asarray(train_disc, bool),
                    lambda w_: generator_loss(new_disc_apply, w_, audio),
                    lambda w_: (jnp.float32(0.0), jnp.float32(0.0)),
                    w,
                )
            logs["adv/gen_loss"] = adv_gen
            logs["adv/feat_loss"] = adv_feat  # logged, weight 0 (base.yml quirk)
            logs["dec/loss"] = decoding_loss(
                fwd_outs["detector_logits"], fwd_outs["mask"], msg,
                bit_mask=bit_mask,
            )
            logs["loc/loss"] = localization_loss(
                fwd_outs["locator_logits"], fwd_outs["mask"]
            )
            total = (
                percep_scale * (
                    loss_cfg.lambda_stft * logs["stft/loss"]
                    + loss_cfg.lambda_mel * logs["mel/loss"]
                    + loss_cfg.lambda_waveform * logs["waveform/loss"]
                    + loss_cfg.lambda_adv_gen * logs["adv/gen_loss"]
                )
                + loss_cfg.lambda_dec * logs["dec/loss"]
                + loss_cfg.lambda_loc * logs["loc/loss"]
            )
            if loss_cfg.lambda_dec_clean > 0:
                logs["dec/loss_clean"] = decoding_loss(
                    fwd_outs["detector_logits_clean"],
                    jnp.ones_like(fwd_outs["mask"]), msg,
                    bit_mask=bit_mask,
                )
                total = total + (loss_cfg.lambda_dec_clean
                                 * logs["dec/loss_clean"])
            if loss_cfg.lambda_dec_bits > 0:
                bits = decoding_loss_bits(
                    fwd_outs["detector_logits"], fwd_outs["mask"], msg,
                    bit_mask=bit_mask,
                )
                if loss_cfg.lambda_dec_clean > 0:
                    bits = bits + decoding_loss_bits(
                        fwd_outs["detector_logits_clean"], None, msg,
                        bit_mask=bit_mask,
                    )
                logs["dec/loss_bits"] = bits
                total = total + loss_cfg.lambda_dec_bits * bits
            if loss_cfg.lambda_dec_lowband > 0:
                # low-band decode channel: clean-path targets (message
                # everywhere) read through an ideal FIR lowpass — both the
                # per-frame BCE and the per-bit decision BCE, mirroring the
                # clean-path pair above
                lb = decoding_loss(
                    fwd_outs["detector_logits_lowband"],
                    jnp.ones_like(fwd_outs["mask"]), msg,
                    bit_mask=bit_mask,
                ) + decoding_loss_bits(
                    fwd_outs["detector_logits_lowband"], None, msg,
                    bit_mask=bit_mask,
                )
                logs["dec/loss_lowband"] = lb
                total = total + loss_cfg.lambda_dec_lowband * lb
            logs["loss"] = total
            return total, logs

        (_, logs), out_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(outs)
        (wm_grads,) = fwd_vjp(out_grads)

        # clip the generator subtree only (reference scripts/train.py:1351)
        gen_clipped, g_grad_norm = clip_by_global_norm(
            wm_grads["generator"], MAX_GRADIENT_NORM
        )
        if gen_update_scale is not None:
            # alternating optimization (loop.py AltSchedule / config
            # warmup_alt_period): a host-fed 0/1 scalar freezes the
            # generator's update while the detector re-aligns to its static
            # code. Traced input — no recompiles across phases. Residual
            # AdamW weight decay during frozen phases is lr*wd ~ 3e-6/step,
            # negligible over a phase.
            g = jnp.asarray(gen_update_scale, jnp.float32)
            gen_clipped = jax.tree_util.tree_map(lambda t: t * g, gen_clipped)
        if msg_update_scale is not None:
            # stationary-carrier freeze (config warmup_msg_freeze_gate): a
            # host-fed 0/1 scalar zeroes updates to the generator's
            # message-path subtrees (msg_* / film_* — the carrier
            # projections, same predicate as loop.py's --reinit-msg-path
            # graft) so the bit->pattern code stays at its init value while
            # the detector learns it. Traced input — no recompiles at the
            # unfreeze latch.
            s = jnp.asarray(msg_update_scale, jnp.float32)

            def _scale_msg(tree, in_msg=False):
                # Mapping (not dict) so FrozenDict/Mapping param trees are
                # walked too — matches train/state.py's decay_mask predicate
                # (a dict-only walk would silently skip the freeze there)
                if isinstance(tree, Mapping):
                    return {
                        k: _scale_msg(v, in_msg
                                      or k.startswith(("msg_", "film_")))
                        for k, v in tree.items()
                    }
                return tree * s if in_msg else tree

            gen_clipped = _scale_msg(gen_clipped)
        wm_grads = dict(wm_grads, generator=gen_clipped)
        wm_updates, wm_opt_state = wm_tx.update(
            wm_grads, state.wm_opt_state, state.wm_params
        )
        wm_params = optax.apply_updates(state.wm_params, wm_updates)

        # ---- 4. per-sample feedback for the host-side effect scheduler ----
        per_sample_ber = ber(
            outs["detector_logits"], msg, outs["mask"], per_sample=True
        )
        per_sample_miou = miou(
            jax.nn.sigmoid(outs["locator_logits"]), outs["mask"],
            per_sample=True,
        )
        # per-bit decision accuracy on the attacked path — drives the
        # host-side nbits curriculum, the gate controllers, and gives the
        # sign-flip-lockstep signature (bits pinned below chance) live in
        # the training log instead of only in post-hoc probes. Computed from
        # the MASK-WEIGHTED time-mean logit (the same decision quantity
        # decoding_loss_bits optimizes and metrics.ber thresholds): ~20% of
        # frames are unwatermarked (localization augmentation) and trained
        # toward logit 0, so an unmasked mean biases 1-bits' logit downward
        # and can stall the curriculum even when the masked decode is
        # perfect (ADVICE r3).
        pm = outs["mask"][:, :, None]  # [B, T, 1]
        denom = jnp.sum(pm, axis=1)  # [B, 1]
        z = (jnp.sum(outs["detector_logits"] * pm, axis=1)
             / jnp.maximum(denom, 1.0))  # [B, nbits]
        valid = (denom > 0).astype(jnp.float32)  # [B, 1]
        correct = ((z > 0) == (msg > 0.5)).astype(jnp.float32) * valid
        per_bit_acc = (jnp.sum(correct, axis=0)
                       / jnp.maximum(jnp.sum(valid), 1.0))  # [nbits]

        metrics = {
            **logs,
            "adv/disc_loss": d_loss,
            "grad_norm/generator": g_grad_norm,
            "grad_norm/discriminator": d_grad_norm,
            "train/ber": jnp.mean(per_sample_ber),
            "train/miou": jnp.mean(per_sample_miou),
            "per_sample_ber": per_sample_ber,
            "per_sample_miou": per_sample_miou,
            "per_bit_acc": per_bit_acc,
        }
        new_state = TrainState(
            step=state.step + 1,
            wm_params=wm_params,
            disc_params=disc_params,
            wm_opt_state=wm_opt_state,
            disc_opt_state=disc_opt_state,
        )
        return new_state, metrics

    return train_step


def make_disc_step(
    models: WatermarkModels,
    cfg: TrainConfig,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Discriminator half of the split-program mode (VERDICT r3 task 5).

    disc_step(state, audio [B,T], msg [B,nbits], key) -> (state', metrics)

    Runs ONLY the generator forward (no grad — the discriminator trains on
    the detached residual, reference scripts/train.py:1464) and the
    LSGAN + gradient-penalty discriminator update. This isolates the
    second-order GP graph in its own XLA program; the companion generator
    program (``make_train_step(..., update_disc=False)``) then sees the
    freshly-updated discriminator through ``state.disc_params`` — the exact
    reference ordering (optimizer_d.step before generator_loss), same as
    the monolithic step. RNG: uses the k_gp stream of the same
    ``fold_in(key, step)`` split as the monolithic step, so split-mode
    randomness is bit-identical to monolithic-mode.
    """
    _, disc_tx = make_optimizers(cfg.optim)
    loss_cfg = cfg.loss

    _disc_ckpt = (
        jax.checkpoint(lambda p, x: models.apply_discriminator(p, x))
        if cfg.remat
        else (lambda p, x: models.apply_discriminator(p, x))
    )

    def disc_step(state: TrainState, audio: jnp.ndarray, msg: jnp.ndarray,
                  key: jnp.ndarray
                  ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        _, k_gp = jax.random.split(jax.random.fold_in(key, state.step))
        fake = jax.lax.stop_gradient(
            models.apply_generator(state.wm_params["generator"], audio, msg)
        )

        def d_loss_fn(dp):
            return discriminator_loss(
                lambda x: _disc_ckpt(dp, x), fake, audio, key=k_gp,
                gp_weight=loss_cfg.gp_weight,
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_grads, d_grad_norm = clip_by_global_norm(d_grads, MAX_GRADIENT_NORM)
        d_updates, disc_opt_state = disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)
        new_state = state.replace(disc_params=disc_params,
                                  disc_opt_state=disc_opt_state)
        return new_state, {"adv/disc_loss": d_loss,
                           "grad_norm/discriminator": d_grad_norm}

    return disc_step


def make_multi_train_step(
    models: WatermarkModels,
    cfg: TrainConfig,
    bank: EffectBank,
    steps_per_dispatch: int,
) -> Callable:
    """K training steps per XLA call via ``lax.scan``.

    The scan body is the single train step, so the compiled program is the
    same size as one step — but dispatch/fetch latency (significant over a
    remote-device tunnel) is paid once per K steps instead of every step.
    Scheduler feedback granularity becomes K steps (the host consumes the
    stacked per-sample metrics after each dispatch).

    multi(state, audios [K,B,T], msgs [K,B,nbits], idxs [K,B], key)
      -> (state', metrics with leaves stacked on a leading [K] axis)
    """
    step = make_train_step(models, cfg, bank)

    def multi(state: TrainState, audios: jnp.ndarray, msgs: jnp.ndarray,
              idxs: jnp.ndarray, key: jnp.ndarray,
              percep_scale: Optional[jnp.ndarray] = None,
              train_disc: Optional[jnp.ndarray] = None,
              gen_update_scale: Optional[jnp.ndarray] = None,
              msg_update_scale: Optional[jnp.ndarray] = None,
              bit_mask: Optional[jnp.ndarray] = None):
        # percep_scale (BER-gated ramp) and gen_update_scale (alternating
        # optimization) are held constant within the dispatch; the host
        # updates them between dispatches. train_disc must NOT be: the
        # disc-cadence gate flips every warmup.disc_every steps, and holding
        # it constant over K steps would train the discriminator ensemble
        # (the dominant device cost while the ramp is closed) on every step
        # of a gated dispatch. A [K] vector is scanned per-step instead; a
        # scalar is accepted for backward compatibility (held constant).
        if train_disc is None:
            # static ungated path: keep the single step's unconditional
            # disc update (no lax.cond in the program)
            def body(st, inp):
                a, m, i = inp
                # the inner step folds `key` with st.step, which increments
                # every iteration — each scanned step gets fresh randomness.
                return step(st, a, m, i, key, percep_scale, None,
                            gen_update_scale, msg_update_scale, bit_mask)

            return jax.lax.scan(body, state, (audios, msgs, idxs),
                                length=steps_per_dispatch)

        disc_xs = (train_disc if jnp.ndim(train_disc) >= 1
                   else jnp.broadcast_to(train_disc, (steps_per_dispatch,)))

        def body(st, inp):
            a, m, i, disc = inp
            return step(st, a, m, i, key, percep_scale, disc,
                        gen_update_scale, msg_update_scale, bit_mask)

        return jax.lax.scan(body, state, (audios, msgs, idxs, disc_xs),
                            length=steps_per_dispatch)

    return multi


def make_val_step(
    models: WatermarkModels,
    cfg: TrainConfig,
    eval_effects=None,
) -> Callable[[TrainState, jnp.ndarray, jnp.ndarray, jnp.ndarray],
              Dict[str, jnp.ndarray]]:
    """Validation step (reference scripts/train.py:1094-1193): reconstruction
    losses + per-effect BER/MIoU over the fixed EVAL_EFFECTS sweep. Returns
    scalars only (the heavy tensors stay on device)."""
    loss_cfg = cfg.loss
    sr = cfg.generator.sample_rate

    def val_step(state: TrainState, audio: jnp.ndarray, msg: jnp.ndarray,
                 key: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        out = forward_valid(
            models, state.wm_params, key, audio, msg,
            eval_effects=eval_effects, sample_rate=sr,
        )
        w = out["watermarked"]
        metrics: Dict[str, jnp.ndarray] = {
            "val/stft_loss": multi_scale_stft_loss(
                w, audio, window_lengths=loss_cfg.stft_window_lengths
            ),
            "val/mel_loss": mel_spectrogram_loss(
                w, audio, sample_rate=sr,
                n_mels=loss_cfg.mel_n_mels,
                window_lengths=loss_cfg.mel_window_lengths,
                clamp_eps=loss_cfg.mel_clamp_eps,
                mag_weight=loss_cfg.mel_mag_weight,
                pow=loss_cfg.mel_pow,
            ),
            "val/waveform_loss": l1_loss(w, audio),
            "val/sisnr": sisnr(w, audio),
        }
        total_ber = 0.0
        total_miou = 0.0
        for name, res in out["effects"].items():
            metrics[f"val/ber/{name}"] = res["ber"]
            metrics[f"val/miou/{name}"] = res["miou"]
            total_ber += res["ber"]
            total_miou += res["miou"]
        n = max(len(out["effects"]), 1)
        metrics["val/ber"] = total_ber / n
        metrics["val/miou"] = total_miou / n
        # "Total Loss" the reference tracker uses for `best` tagging
        # (scripts/train.py:1707-1714).
        metrics["val/loss"] = (
            loss_cfg.lambda_stft * metrics["val/stft_loss"]
            + loss_cfg.lambda_mel * metrics["val/mel_loss"]
            + loss_cfg.lambda_waveform * metrics["val/waveform_loss"]
        )
        return metrics

    return val_step
