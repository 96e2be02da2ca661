"""Training losses, all inside one jitted step.

Reference scripts/loss.py:69-1099. Semantics preserved:

- MultiScaleSTFTLoss: windows [2048, 512], hop = w/4, L1 on
  ``log10(clamp(mag, 1e-5)^2)`` + L1 on raw magnitude (reference :529-578).
- MelSpectrogramLoss: 7 scales (n_mels 5..320, windows 32..2048),
  ``log10(clamp(mel, 1e-5)^pow)`` with pow=1 and mag_weight=0 per
  conf/base.yml:156-162; mel filterbank is the librosa slaney-norm bank
  audiotools uses.
- GANLoss: LSGAN discriminator/generator terms over the ensemble's logit
  maps, L1 feature matching on intermediate maps, and a WGAN-GP gradient
  penalty (weight 10) on random interpolates (reference :733-941). The
  penalty differentiates through the discriminator with jax.grad — no
  autograd.grad plumbing needed.
- Localization/Decoding: BCE-with-logits vs presence mask / mask-broadcast
  message (reference :947-1099).

All audio here is [B, T]; detector logits [B, T, nbits]; locator logits
[B, T, 1]; masks [B, T].
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveverify_tpu.ops.dsp import stft


# ---------------------------------------------------------------------------
# Elementwise helpers
# ---------------------------------------------------------------------------


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x - y))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    reduce: bool = True) -> jnp.ndarray:
    """Numerically-stable BCEWithLogitsLoss (mean when ``reduce``)."""
    out = (jnp.maximum(logits, 0.0) - logits * targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    return jnp.mean(out) if reduce else out


def sisdr_loss(estimate: jnp.ndarray, reference: jnp.ndarray,
               zero_mean: bool = True, clip_min: Optional[float] = None,
               eps: float = 1e-8) -> jnp.ndarray:
    """Negative SI-SDR (reference scripts/loss.py:298-446)."""
    if zero_mean:
        estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
        reference = reference - jnp.mean(reference, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * reference, axis=-1, keepdims=True)
    energy = jnp.sum(reference**2, axis=-1, keepdims=True) + eps
    target = dot * reference / energy
    noise = estimate - target
    ratio = (jnp.sum(target**2, axis=-1) + eps) / (jnp.sum(noise**2, axis=-1) + eps)
    sdr = -10.0 * jnp.log10(ratio)
    if clip_min is not None:
        sdr = jnp.maximum(sdr, clip_min)
    return jnp.mean(sdr)


# ---------------------------------------------------------------------------
# Spectral losses
# ---------------------------------------------------------------------------


def _magnitude(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    re, im = stft(x, n_fft, hop)
    return jnp.sqrt(jnp.maximum(re * re + im * im, 1e-12))


def multi_scale_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray,
    window_lengths: Sequence[int] = (2048, 512),
    clamp_eps: float = 1e-5, mag_weight: float = 1.0, log_weight: float = 1.0,
    pow: float = 2.0,
) -> jnp.ndarray:
    """reference scripts/loss.py:449-578 (defaults) + conf/base.yml:155."""
    loss = 0.0
    for w in window_lengths:
        xm = _magnitude(x, w, w // 4)
        ym = _magnitude(y, w, w // 4)
        if log_weight > 0:
            loss += log_weight * l1_loss(
                jnp.log10(jnp.maximum(xm, clamp_eps) ** pow),
                jnp.log10(jnp.maximum(ym, clamp_eps) ** pow),
            )
        if mag_weight > 0:
            loss += mag_weight * l1_loss(xm, ym)
    return loss


@lru_cache(maxsize=None)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (librosa.filters.mel
    defaults: htk=False, norm='slaney') — what audiotools' mel_spectrogram
    uses under the reference MelSpectrogramLoss."""
    if fmax is None:
        fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        # slaney: linear below 1 kHz, log above
        f_sp = 200.0 / 3
        mel = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                        mel)

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel,
                        min_log_hz * np.exp(logstep * (m - min_log_mel)),
                        freqs)

    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / np.maximum(fdiff[:-1, None], 1e-10)
    upper = ramps[2:] / np.maximum(fdiff[1:, None], 1e-10)
    weights = np.maximum(0, np.minimum(lower, upper))
    # slaney norm: scale by 2 / bandwidth
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_spectrogram_loss(
    x: jnp.ndarray, y: jnp.ndarray, sample_rate: int = 16000,
    n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
    window_lengths: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
    clamp_eps: float = 1e-5, mag_weight: float = 0.0, log_weight: float = 1.0,
    pow: float = 1.0,
) -> jnp.ndarray:
    """reference scripts/loss.py:581-727 with conf/base.yml:156-162 params."""
    loss = 0.0
    for nm, w in zip(n_mels, window_lengths):
        fb = jnp.asarray(mel_filterbank(sample_rate, w, nm))
        xm = _magnitude(x, w, w // 4) @ fb.T  # [B, frames, n_mels]
        ym = _magnitude(y, w, w // 4) @ fb.T
        if log_weight > 0:
            loss += log_weight * l1_loss(
                jnp.log10(jnp.maximum(xm, clamp_eps) ** pow),
                jnp.log10(jnp.maximum(ym, clamp_eps) ** pow),
            )
        if mag_weight > 0:
            loss += mag_weight * l1_loss(xm, ym)
    return loss


# ---------------------------------------------------------------------------
# GAN losses
# ---------------------------------------------------------------------------

DiscApply = Callable[[jnp.ndarray], List[List[jnp.ndarray]]]


def discriminator_loss(
    disc_apply: DiscApply, fake: jnp.ndarray, real: jnp.ndarray,
    key: Optional[jnp.ndarray] = None, use_gradient_penalty: bool = True,
    gp_weight: float = 10.0,
) -> jnp.ndarray:
    """LSGAN discriminator loss + WGAN-GP gradient penalty
    (reference scripts/loss.py:849-897). ``fake`` is stop-gradient'd like the
    reference's ``fake.clone().detach()``."""
    fake = jax.lax.stop_gradient(fake)
    d_fake = disc_apply(fake)
    d_real = disc_apply(real)
    loss_d = 0.0
    for f_maps, r_maps in zip(d_fake, d_real):
        loss_d += jnp.mean(jnp.square(f_maps[-1]))
        loss_d += jnp.mean(jnp.square(1.0 - r_maps[-1]))

    if use_gradient_penalty:
        if key is None:
            key = jax.random.PRNGKey(0)
        alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
        interp = alpha * real + (1 - alpha) * fake

        def critic_sum(x):
            outs = disc_apply(x)
            # sum of logit maps == vjp seed of ones on each output
            return sum(jnp.sum(m[-1]) for m in outs)

        grads = jax.grad(critic_sum)(interp)
        gnorm = jnp.sqrt(
            jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1)), axis=1) + 1e-12
        )
        loss_d += gp_weight * jnp.mean(jnp.square(gnorm - 1.0))
    return loss_d


def generator_loss(
    disc_apply: DiscApply, fake: jnp.ndarray, real: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LSGAN generator + L1 feature-matching losses
    (reference scripts/loss.py:899-941). NOTE: the reference computes
    feature matching but conf/base.yml's lambdas omit 'adv/feat_loss', so it
    never enters the total — we return it for logging and let the caller
    weight it (0 by default) to keep the quirk."""
    d_fake = disc_apply(fake)
    d_real = disc_apply(jax.lax.stop_gradient(real))
    loss_g = 0.0
    for f_maps in d_fake:
        loss_g += jnp.mean(jnp.square(1.0 - f_maps[-1]))
    loss_feat = 0.0
    for f_maps, r_maps in zip(d_fake, d_real):
        for fm, rm in zip(f_maps[:-1], r_maps[:-1]):
            loss_feat += jnp.mean(jnp.abs(fm - rm))
    return loss_g, loss_feat


# ---------------------------------------------------------------------------
# Watermark losses
# ---------------------------------------------------------------------------


def localization_loss(locator_logits: jnp.ndarray,
                      presence_mask: jnp.ndarray) -> jnp.ndarray:
    """BCE-with-logits of the locator output vs the ground-truth presence
    mask (reference scripts/loss.py:947-1018). logits [B, T, 1] or [B, T];
    mask [B, T]."""
    if locator_logits.ndim == 3:
        locator_logits = locator_logits[..., 0]
    return bce_with_logits(locator_logits, presence_mask)


def decoding_loss(detector_logits: jnp.ndarray, presence_mask: jnp.ndarray,
                  message: jnp.ndarray,
                  bit_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BCE-with-logits of per-sample bit logits vs message*mask
    (reference scripts/loss.py:1021-1099): the target is the message
    broadcast over time, zeroed where the watermark is absent.
    detector_logits [B, T, W]; presence_mask [B, T]; message [B, W].

    ``bit_mask`` [W] (nbits curriculum, LossConfig.warmup_nbits_start):
    per-bit loss weights, normalized by the number of active bits so the
    gradient scale per active bit is curriculum-independent."""
    target = message[:, None, :] * presence_mask[:, :, None]
    if bit_mask is None:
        return bce_with_logits(detector_logits, target)
    el = bce_with_logits(detector_logits, target, reduce=False)  # [B, T, W]
    w = bit_mask[None, None, :]
    denom = el.shape[0] * el.shape[1] * jnp.maximum(jnp.sum(bit_mask), 1.0)
    return jnp.sum(el * w) / denom


def decoding_loss_bits(detector_logits: jnp.ndarray,
                       presence_mask: Optional[jnp.ndarray],
                       message: jnp.ndarray,
                       bit_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Bit-level decoding BCE on the (masked) time-MEAN logit.

    Training-side improvement (no reference counterpart): the deployed
    decision rule thresholds the time-averaged detector output per bit, but
    the per-frame BCE above demands per-frame confidence — its gradient is
    dominated by frames that are already confidently wrong, not by the
    decision quantity. This term applies BCE directly to the masked
    time-mean logit per bit, so the gradient pushes every watermarked frame
    toward flipping the *decision* — the quantity BER actually measures.
    detector_logits [B, T, W]; presence_mask [B, T] or None (= all frames);
    message [B, W].
    """
    if presence_mask is None:
        z = jnp.mean(detector_logits, axis=1)  # [B, W]
        if bit_mask is None:
            return bce_with_logits(z, message)
        el = bce_with_logits(z, message, reduce=False)  # [B, W]
        return (jnp.sum(el * bit_mask[None, :])
                / (el.shape[0] * jnp.maximum(jnp.sum(bit_mask), 1.0)))
    m = presence_mask[:, :, None]  # [B, T, 1]
    denom = jnp.sum(m, axis=1)  # [B, 1]
    z = jnp.sum(detector_logits * m, axis=1) / jnp.maximum(denom, 1.0)
    valid = (denom > 0).astype(z.dtype)  # samples with any watermarked frame
    per_bit = bce_with_logits(z, message, reduce=False) * valid
    if bit_mask is None:
        return jnp.sum(per_bit) / jnp.maximum(jnp.sum(valid) * z.shape[-1],
                                              1.0)
    return (jnp.sum(per_bit * bit_mask[None, :])
            / jnp.maximum(jnp.sum(valid) * jnp.sum(bit_mask), 1.0))
