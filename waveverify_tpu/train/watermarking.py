"""Composite watermarking forward passes (train / valid / audio_sample).

Pure-function equivalent of the reference's stateful ``AudioWatermarking``
module (reference model/watermarking.py:186-808). The dependency inversion
the reference has (the *model* owning augmenters, metrics, and the effect
scheduler) is fixed: models are pure ``params, x -> y``; augmentation and
attack simulation live here in the training layer; the adaptive scheduler
stays host-side (see train/loop.py).

Everything in this file traces into a single XLA program: the reference's
per-step GPU->CPU effects round trip (reference model/watermarking.py:540-544)
does not exist here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from waveverify_tpu.config import TrainConfig
from waveverify_tpu.effects.augment import (
    localization_augmentation,
    sequence_augmentation,
)
from waveverify_tpu.effects.effects import (
    DEFAULT_EVAL_EFFECTS,
    AudioEffects,
    EffectBank,
)
from waveverify_tpu.metrics import ber, miou
from waveverify_tpu.models import Detector, Discriminator, Generator, Locator


@dataclass(frozen=True)
class WatermarkModels:
    """Static bundle of the four model definitions (no parameters).

    Mirrors the reference composite's members (reference
    model/watermarking.py:211-253) minus all the state it wrongly owned.
    """

    generator: Generator
    detector: Detector
    locator: Locator
    discriminator: Discriminator

    @classmethod
    def from_config(cls, cfg: TrainConfig) -> "WatermarkModels":
        return cls(
            generator=Generator(config=cfg.generator),
            detector=Detector(config=cfg.detector),
            locator=Locator(config=cfg.locator),
            discriminator=Discriminator(config=cfg.discriminator),
        )

    # -- parameter-pytree application helpers --------------------------------

    def apply_generator(self, params, audio: jnp.ndarray, msg: jnp.ndarray):
        """audio [B, T] -> watermark residual [B, T]."""
        out = self.generator.apply({"params": params}, audio[..., None], msg)
        return out[..., 0]

    def apply_detector(self, params, audio: jnp.ndarray) -> jnp.ndarray:
        """audio [B, T] -> bit logits [B, T, nbits]."""
        return self.detector.apply({"params": params}, audio[..., None])

    def apply_locator(self, params, audio: jnp.ndarray) -> jnp.ndarray:
        """audio [B, T] -> presence logits [B, T]."""
        return self.locator.apply({"params": params}, audio[..., None])[..., 0]

    def apply_discriminator(self, params, audio: jnp.ndarray):
        """audio [B, T] -> List[List[feature map]]."""
        return self.discriminator.apply({"params": params}, audio[..., None])


def forward_train(
    models: WatermarkModels,
    wm_params: Dict[str, Any],
    key: jnp.ndarray,
    audio: jnp.ndarray,
    msg: jnp.ndarray,
    effect_idx: jnp.ndarray,
    bank: EffectBank,
    sample_rate: int = 16000,
    window_duration: float = 0.1,
    remat: bool = True,
    clean_detector: bool = False,
    jitter_hop: int = 0,
    lowband_cutoff: float = 0.0,
) -> Dict[str, jnp.ndarray]:
    """Training-phase forward (reference model/watermarking.py:340-421).

    audio [B, T] float32, msg [B, nbits] float32 in {0, 1}, effect_idx [B]
    int32 branch indices into ``bank`` (host-selected by the scheduler).

    Returns a dict of differentiable outputs:
      residual      [B, T]  raw generator output ("reconstructed" in the
                            reference — what the discriminator trains on)
      watermarked   [B, T]  residual + audio
      mask          [B, T]  ground-truth presence (1 = watermarked)
      detector_logits [B, T, nbits]
      locator_logits  [B, T]
      updated_original [B, T]
    """
    k_loc, k_seq, k_fx, k_jit, k_jit_clean = jax.random.split(key, 5)

    def _sub_hop_roll(k, x, m=None):
        """Per-sample circular roll by 0..jitter_hop-1 samples
        (TrainConfig.sub_hop_jitter): removes the hop-grid phase-lock
        shortcut — the detector must decode the carrier non-coherently,
        which real-world cropping requires. Differentiable gather, so the
        generator also learns placement-invariant codes."""
        b, t = x.shape
        r = jax.random.randint(k, (b,), 0, jitter_hop)
        idx = (jnp.arange(t)[None, :] - r[:, None]) % t
        x = jnp.take_along_axis(x, idx, axis=1)
        if m is None:
            return x
        return x, jnp.take_along_axis(m, idx, axis=1)

    # Rematerialization: the three network applies re-run in the backward
    # pass instead of storing every intermediate activation — the B=32
    # shipped config does not fit 16 GB HBM without it (measured 15.85 G,
    # OOM by 100 MB), and the recompute rides idle MXU time.
    apply_gen = models.apply_generator
    apply_det = models.apply_detector
    apply_loc = models.apply_locator
    if remat:
        apply_gen = jax.checkpoint(apply_gen)
        apply_det = jax.checkpoint(apply_det)
        apply_loc = jax.checkpoint(apply_loc)

    residual = apply_gen(wm_params["generator"], audio, msg)
    watermarked = residual + audio

    def augment_and_attack(watermarked, audio, effect_idx):
        # ~20% of 0.1 s segments reverted / zeroed / cross-substituted,
        # building the ground-truth mask (reference
        # utils/localization_augmentation.py), then one whole-batch temporal
        # transform, then per-sample on-device attacks.
        augmented, mask, updated_original = localization_augmentation(
            k_loc, audio, watermarked, sample_rate, window_duration
        )
        augmented, updated_original, mask = sequence_augmentation(
            k_seq, augmented, updated_original, mask, sample_rate
        )
        fx_audio, mask = bank.apply(augmented, mask, effect_idx, k_fx)
        if jitter_hop > 0:
            fx_audio, mask = _sub_hop_roll(k_jit, fx_audio, mask)
        return fx_audio, mask, updated_original

    if remat:
        # the effect bank evaluates every branch batched ([E, B, T] stacks);
        # rematerializing this segment keeps those out of the saved residuals
        augment_and_attack = jax.checkpoint(augment_and_attack)
    fx_audio, mask, updated_original = augment_and_attack(
        watermarked, audio, effect_idx
    )

    detector_logits = apply_det(wm_params["detector"], fx_audio)
    locator_logits = apply_loc(wm_params["locator"], fx_audio)

    out = {
        "residual": residual,
        "watermarked": watermarked,
        "mask": mask,
        "detector_logits": detector_logits,
        "locator_logits": locator_logits,
        "updated_original": updated_original,
    }
    if clean_detector or lowband_cutoff > 0:
        # un-augmented, un-attacked read path (LossConfig.lambda_dec_clean):
        # watermark present everywhere, so the loss target is the message
        # broadcast over all frames (a roll changes no target; it only
        # removes the hop-phase shortcut)
        clean_in = (_sub_hop_roll(k_jit_clean, watermarked)
                    if jitter_hop > 0 else watermarked)
        if clean_detector:
            out["detector_logits_clean"] = apply_det(wm_params["detector"],
                                                     clean_in)
        if lowband_cutoff > 0:
            # low-band decode channel (LossConfig.lambda_dec_lowband):
            # force the carrier to survive an ideal lowpass at the cutoff
            # — same decode target as the clean path, read through the
            # on-device FIR lowpass the attack catalog uses
            lb_in, _ = AudioEffects.lowpass_filter(
                clean_in, None, None, cutoff_freq=lowband_cutoff,
                sample_rate=sample_rate,
            )
            out["detector_logits_lowband"] = apply_det(
                wm_params["detector"], lb_in
            )
    return out


def forward_audio_sample(
    models: WatermarkModels,
    wm_params: Dict[str, Any],
    audio: jnp.ndarray,
    msg: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """audio_sample phase: no augmentation, no grad
    (reference model/watermarking.py:423-441). Returns (residual, watermarked).
    """
    residual = models.apply_generator(wm_params["generator"], audio, msg)
    return residual, residual + audio


def forward_valid(
    models: WatermarkModels,
    wm_params: Dict[str, Any],
    key: jnp.ndarray,
    audio: jnp.ndarray,
    msg: jnp.ndarray,
    eval_effects: Optional[List[Tuple[str, Dict]]] = None,
    sample_rate: int = 16000,
    window_duration: float = 0.1,
) -> Dict[str, Any]:
    """Validation phase: fixed effect sweep on the augmented watermarked
    signal (reference model/watermarking.py:443-483, :755-808).

    Like the reference's ``_forward_valid``, the watermarked audio first
    goes through the localization + sequence augmentations (reference
    :463-467), so the MIoU ground truth is a real spliced mask (~20% clean
    segments) — NOT all-ones. With an all-ones ground truth the background
    IoU term is degenerate (any stray zero in the prediction pins bg IoU to
    0 and the mean to ~0.5), which made healthy locators read as collapsed
    in the round-1/2 logs. Each eval effect is then applied to the
    augmented signal; detect + locate; BER is mask-aware. Returns
    ``{"watermarked", "residual", "effects": {name: {...}}}``.
    """
    if eval_effects is None:
        eval_effects = DEFAULT_EVAL_EFFECTS

    residual = models.apply_generator(wm_params["generator"], audio, msg)
    watermarked = residual + audio

    k_loc, k_seq, key = jax.random.split(key, 3)
    augmented, gt_mask, updated_original = localization_augmentation(
        k_loc, audio, watermarked, sample_rate, window_duration
    )
    augmented, updated_original, gt_mask = sequence_augmentation(
        k_seq, augmented, updated_original, gt_mask, sample_rate
    )

    results: Dict[str, Any] = {}
    for i, (name, params) in enumerate(eval_effects):
        key, sub = jax.random.split(key)
        fn = getattr(AudioEffects, name)
        fx, mask = fn(augmented, gt_mask, sub,
                      sample_rate=sample_rate, **params)
        mask = gt_mask if mask is None else mask
        det = models.apply_detector(wm_params["detector"], fx)
        loc = models.apply_locator(wm_params["locator"], fx)
        tag = name if name not in results else f"{name}_{i}"
        results[tag] = {
            "ber": ber(det, msg, mask),
            "miou": miou(jax.nn.sigmoid(loc), mask),
            "detector_logits": det,
            "locator_logits": loc,
            "mask": mask,
        }
    return {
        "residual": residual,
        "watermarked": watermarked,
        "effects": results,
    }
