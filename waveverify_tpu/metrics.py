"""Evaluation metrics, jittable where they run per training step.

BER / MIoU / SI-SNR are pure jax (they feed the effect scheduler every step
— reference model/watermarking.py:697-753 — so they must stay on device).
STOI / PESQ are host-side, eval-only, and gated on their optional libs
(reference scripts/evaluate.py:65-346 uses pystoi / pesq the same way).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BER_THRESHOLD = 0.5
EPSILON = 1e-8


def ber(decoded_logits: jnp.ndarray, original_bits: jnp.ndarray,
        presence_mask: Optional[jnp.ndarray] = None,
        threshold: float = DEFAULT_BER_THRESHOLD,
        per_sample: bool = False) -> jnp.ndarray:
    """Mask-aware bit error rate (reference scripts/evaluate.py:419-516).

    decoded_logits: [B, T, W] (time-major NWC — note the reference is
    [B, W, T]); original_bits: [B, W]; presence_mask: [B, T] or [B, T, 1]
    with 1 = watermarked. Sigmoid -> masked time-average -> threshold ->
    error fraction over bits with >=1 valid step.
    """
    b, t, w = decoded_logits.shape
    probs = jax.nn.sigmoid(decoded_logits)
    if presence_mask is not None:
        if presence_mask.ndim == 3:
            presence_mask = presence_mask[..., 0]
        mask = presence_mask[:, :, None]  # [B, T, 1]
        valid_bits = jnp.sum(mask, axis=1) > 0  # [B, W] (broadcast over W)
        valid_bits = jnp.broadcast_to(valid_bits, (b, w))
        avg_probs = jnp.sum(probs * mask, axis=1) / (jnp.sum(mask, axis=1) + EPSILON)
    else:
        valid_bits = jnp.ones((b, w), bool)
        avg_probs = jnp.mean(probs, axis=1)
    decoded_bits = (avg_probs >= threshold).astype(jnp.float32)
    errors = (decoded_bits != original_bits.astype(jnp.float32)) & valid_bits
    if per_sample:
        n_valid = jnp.sum(valid_bits, axis=1)
        return jnp.where(
            n_valid > 0, jnp.sum(errors, axis=1) / jnp.maximum(n_valid, 1), 0.0
        )
    n_valid = jnp.sum(valid_bits)
    return jnp.where(n_valid > 0, jnp.sum(errors) / jnp.maximum(n_valid, 1), 0.0)


def evaluate_ber(decoded_probs: jnp.ndarray, original_bits: jnp.ndarray,
                 threshold: float = DEFAULT_BER_THRESHOLD) -> jnp.ndarray:
    """Simplified BER for probability (not logit) inputs of the same shape
    (reference scripts/evaluate.py:518-573): binarize both at ``threshold``,
    return 1 - accuracy."""
    if decoded_probs.shape != original_bits.shape:
        raise ValueError(f"Shape mismatch: decoded={decoded_probs.shape}, "
                         f"original={original_bits.shape}")
    decoded = (decoded_probs >= threshold).astype(jnp.float32)
    original = (original_bits >= threshold).astype(jnp.float32)
    return 1.0 - jnp.mean((decoded == original).astype(jnp.float32))


def _iou_pair(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean of foreground and background IoU for one (flattened) mask pair."""
    pred_fg = pred == 1
    gt_fg = gt == 1
    inter_fg = jnp.sum(pred_fg & gt_fg)
    union_fg = jnp.sum(pred_fg | gt_fg)
    iou_fg = jnp.where(union_fg == 0,
                       jnp.where(inter_fg == 0, 1.0, 0.0),
                       inter_fg / jnp.maximum(union_fg, 1))
    pred_bg = ~pred_fg
    gt_bg = ~gt_fg
    inter_bg = jnp.sum(pred_bg & gt_bg)
    union_bg = jnp.sum(pred_bg | gt_bg)
    iou_bg = jnp.where(union_bg == 0,
                       jnp.where(inter_bg == 0, 1.0, 0.0),
                       inter_bg / jnp.maximum(union_bg, 1))
    return (iou_fg + iou_bg) / 2.0


def miou(predicted_mask: jnp.ndarray, ground_truth_mask: jnp.ndarray,
         per_sample: bool = False) -> jnp.ndarray:
    """Mean IoU of binary masks: mean of fg-IoU and bg-IoU
    (reference scripts/evaluate.py:575-665). Masks: [B, T] or [B, T, 1]."""
    if predicted_mask.ndim == 3:
        predicted_mask = predicted_mask[..., 0]
    if ground_truth_mask.ndim == 3:
        ground_truth_mask = ground_truth_mask[..., 0]
    pred = (predicted_mask > 0.5).astype(jnp.int32)
    gt = (ground_truth_mask > 0.5).astype(jnp.int32)
    if per_sample:
        return jax.vmap(_iou_pair)(pred, gt)
    return _iou_pair(pred.reshape(-1), gt.reshape(-1))


def sisnr(estimate: jnp.ndarray, reference: jnp.ndarray,
          zero_mean: bool = True, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SNR in dB, mean over batch
    (reference scripts/evaluate.py:146-229). Inputs [B, T] or [B, T, 1]."""
    if estimate.ndim == 3:
        estimate = estimate[..., 0]
    if reference.ndim == 3:
        reference = reference[..., 0]
    if zero_mean:
        estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
        reference = reference - jnp.mean(reference, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * reference, axis=-1, keepdims=True)
    ref_energy = jnp.sum(reference**2, axis=-1, keepdims=True) + eps
    target = dot * reference / ref_energy
    noise = estimate - target
    ratio = (jnp.sum(target**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps)
    return jnp.mean(10.0 * jnp.log10(ratio))


# ---------------------------------------------------------------------------
# Host-side quality metrics (eval only, optional deps)
# ---------------------------------------------------------------------------


def stoi(estimate: np.ndarray, reference: np.ndarray,
         sample_rate: int = 16000) -> float:
    """Short-time objective intelligibility (host, eval-only).

    Prefers pystoi when installed (the reference's only path,
    scripts/evaluate.py:65-144); otherwise falls back to the bundled
    implementation of the same published algorithm
    (:mod:`waveverify_tpu.quality`) instead of degrading to NaN.
    """
    try:
        from pystoi import stoi as _stoi  # type: ignore

        return float(_stoi(np.asarray(reference).ravel(),
                           np.asarray(estimate).ravel(),
                           sample_rate, extended=False))
    except ImportError:
        from waveverify_tpu.quality import native_stoi

        return float(native_stoi(estimate, reference, sample_rate))


def pesq(estimate: np.ndarray, reference: np.ndarray,
         sample_rate: int = 16000, band: str = "wb") -> float:
    """PESQ via the pesq lib (host, eval-only; reference evaluate.py:231).

    Returns NaN when the lib is unavailable.
    """
    try:
        from pesq import pesq as _pesq  # type: ignore
    except ImportError:
        return float("nan")
    return float(_pesq(sample_rate, np.asarray(reference).ravel(),
                       np.asarray(estimate).ravel(), band))
