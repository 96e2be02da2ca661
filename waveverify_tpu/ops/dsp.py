"""Core DSP primitives, all jittable with static shapes.

Design notes (TPU):
- FIR filtering and resampling lower to `conv_general_dilated`, which XLA
  maps onto the MXU for the multi-channel cases and fuses with surrounding
  elementwise ops.
- Resampling is *polyphase*: output phase k of a p/q rate change is one
  output channel of a strided conv; a reshape interleaves phases. No
  dynamic shapes, no host round trip (the reference shells out to SoX /
  torchaudio for this — reference utils/effect_augmentation.py:1451-1500).
- STFT uses `jnp.fft.rfft` over framed windows (XLA TPU FFT), matching the
  audiotools `match_stride` semantics used by the MRD discriminator and
  the spectral losses (reference model/discriminator.py:259-263).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# FIR filters
# ---------------------------------------------------------------------------


def _hann(n: np.ndarray, width: float) -> np.ndarray:
    """Hann window evaluated at continuous offsets in [-width, width]."""
    out = np.cos(np.pi * n / width / 2) ** 2
    out[np.abs(n) >= width] = 0.0
    return out


@lru_cache(maxsize=None)
def _sinc_filter(cutoff: float, half_width: int, zeros: int = 8) -> np.ndarray:
    """Windowed-sinc lowpass kernel, length ``2*half_width + 1``.

    ``cutoff`` is in cycles/sample (0, 0.5]. Same family as julius'
    LowPassFilter (windowed sinc with Hann window), which the reference
    uses for its filter effects (reference utils/effect_augmentation.py:1684+).
    """
    t = np.arange(-half_width, half_width + 1, dtype=np.float64)
    window = _hann(t, half_width + 0.5)
    kernel = 2 * cutoff * np.sinc(2 * cutoff * t) * window
    # normalize DC gain to exactly 1
    kernel = kernel / kernel.sum() if kernel.sum() != 0 else kernel
    return kernel.astype(np.float32)


def filter_half_width(cutoff: float, zeros: int = 8) -> int:
    """Support radius so the sinc sees `zeros` zero crossings per side."""
    return int(math.ceil(zeros / (2 * max(cutoff, 1e-4))))


def fir_filter(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase 'same' FIR filtering along the last axis.

    x: [..., T]; kernel: [K] (odd K). Output same shape.
    """
    orig_shape = x.shape
    t = orig_shape[-1]
    xf = x.reshape(-1, t)[:, :, None]  # [N, T, 1]
    k = kernel.shape[0]
    y = jax.lax.conv_general_dilated(
        xf,
        kernel[:, None, None].astype(x.dtype),
        window_strides=(1,),
        padding=[(k // 2, k - 1 - k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[:, :, 0].reshape(orig_shape)


def lowpass_fir(x: jnp.ndarray, cutoff: float, zeros: int = 8) -> jnp.ndarray:
    """Lowpass at normalized cutoff (cycles/sample, 0..0.5)."""
    kernel = jnp.asarray(_sinc_filter(float(cutoff), filter_half_width(cutoff, zeros), zeros))
    return fir_filter(x, kernel)


def highpass_fir(x: jnp.ndarray, cutoff: float, zeros: int = 8) -> jnp.ndarray:
    """Highpass = identity - lowpass (spectral complement, exactly julius-style)."""
    return x - lowpass_fir(x, cutoff, zeros)


def bandpass_fir(x: jnp.ndarray, cutoff_low: float, cutoff_high: float,
                 zeros: int = 8) -> jnp.ndarray:
    """Bandpass = lowpass(high) - lowpass(low)."""
    return lowpass_fir(x, cutoff_high, zeros) - lowpass_fir(x, cutoff_low, zeros)


# ---------------------------------------------------------------------------
# Polyphase resampling
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def resample_kernel(orig_freq: int, new_freq: int, zeros: int = 24,
                    rolloff: float = 0.945) -> Tuple[np.ndarray, int, int]:
    """Polyphase windowed-sinc resampling kernels.

    Returns ``(kernel [L, 1, q], p, q)`` where ``p/q`` is the reduced
    orig/new ratio and ``L = 2*width + p``. Output sample ``n = k*q + i``
    lands at input time ``k*p + i*p/q``; phase i's kernel is the Hann-windowed
    sinc sampled at integer offsets ``m - i*p/q`` for ``m in [-width,
    width+p)``, so a single stride-``p`` correlation produces all q phases
    (the construction torchaudio/julius use). Cutoff is
    ``0.5 * rolloff * min(1, q/p)`` cycles per input sample (anti-aliasing
    for downsampling). Each phase is normalized to unit DC gain.
    """
    g = math.gcd(orig_freq, new_freq)
    p, q = orig_freq // g, new_freq // g
    if p == q:
        return np.ones((1, 1, 1), np.float32), 1, 1
    cutoff = 0.5 * rolloff * min(1.0, q / p)
    width = int(math.ceil(zeros / (2 * cutoff)))
    m = np.arange(-width, width + p, dtype=np.float64)[None, :]  # [1, L]
    f = (np.arange(q, dtype=np.float64) * p / q)[:, None]  # [q, 1]
    t = m - f
    support = zeros / (2 * cutoff)
    window = np.where(np.abs(t) < support, np.cos(np.pi * t / support / 2) ** 2, 0.0)
    kernels = 2 * cutoff * np.sinc(2 * cutoff * t) * window  # [q, L]
    kernels /= kernels.sum(axis=1, keepdims=True)
    return kernels.T[:, None, :].astype(np.float32), p, q


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             zeros: int = 24, rolloff: float = 0.945) -> jnp.ndarray:
    """Rational-rate resampling along the last axis (static output length).

    x: [..., T] -> [..., ceil(T * new/orig)]. One strided conv with q output
    channels + a reshape interleave — fully on device, MXU-friendly.
    """
    kernel_np, p, q = resample_kernel(orig_freq, new_freq, zeros, rolloff)
    if p == q:
        return x
    orig_shape = x.shape
    t = orig_shape[-1]
    out_t = int(math.ceil(t * q / p))
    n_frames = (out_t + q - 1) // q
    xf = x.reshape(-1, t)[:, :, None]
    length = kernel_np.shape[0]
    width = (length - p) // 2
    # frame k reads x[k*p - width : k*p - width + L]
    pad_right = max(0, (n_frames - 1) * p - width + length - t)
    y = jax.lax.conv_general_dilated(
        jnp.pad(xf, ((0, 0), (width, pad_right), (0, 0))),
        jnp.asarray(kernel_np).astype(x.dtype),
        window_strides=(p,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )  # [N, n_frames, q]
    y = y[:, :n_frames, :].reshape(y.shape[0], -1)[:, :out_t]
    return y.reshape(orig_shape[:-1] + (out_t,))


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[..., T] -> [..., n_frames, frame_length] via gather-free strided conv
    trick: use reshape-compatible dynamic slicing through conv is overkill —
    XLA lowers the gather below to an efficient copy on TPU."""
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


@lru_cache(maxsize=None)
def _hann_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


@lru_cache(maxsize=None)
def _rdft_basis(n_fft: int) -> np.ndarray:
    """Real-DFT basis [n_fft, 2F]: columns are cos then -sin, F = n_fft//2+1.

    ``frames @ basis`` == rfft as (real, imag) halves. We avoid jnp.fft on
    purpose: complex FFT is unimplemented on this TPU backend, and an
    [N, 2F] matmul maps straight onto the MXU (8.4 MFLOP per 2048-frame —
    noise next to the conv stacks it feeds).
    """
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.concatenate([np.cos(ang), -np.sin(ang)], axis=1).astype(np.float32)


def _rdft(frames: jnp.ndarray, n_fft: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    basis = jnp.asarray(_rdft_basis(n_fft))
    out = jnp.matmul(frames, basis.astype(frames.dtype),
                     precision=jax.lax.Precision.HIGHEST)
    f = n_fft // 2 + 1
    return out[..., :f], out[..., f:]


def stft(x: jnp.ndarray, n_fft: int, hop: int,
         window: Optional[jnp.ndarray] = None, center: bool = True,
         pad_mode: str = "reflect") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT as (real, imag). x: [..., T] -> 2 x [..., n_frames, n_fft//2+1]."""
    if window is None:
        window = jnp.asarray(_hann_window(n_fft))
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop) * window
    return _rdft(frames, n_fft)


def stft_match_stride(x: jnp.ndarray, window_length: int,
                      hop: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """audiotools-style STFT with ``match_stride=True`` semantics.

    Pads so n_frames == ceil(T / hop) and frames align with a strided conv
    (reference model/discriminator.py:259-263 via audiotools.AudioSignal.stft):
    reflect-pad (window - hop) / 2 on the left, same + right alignment pad on
    the right, then centerless framing.

    x: [..., T] -> (real, imag), each [..., n_frames, window//2+1].
    """
    if hop is None:
        hop = window_length // 4
    t = x.shape[-1]
    right_align = int(math.ceil(t / hop)) * hop - t
    pad = (window_length - hop) // 2
    pads = [(0, 0)] * (x.ndim - 1) + [(pad, pad + right_align)]
    x = jnp.pad(x, pads, mode="reflect")
    window = jnp.asarray(_hann_window(window_length))
    frames = frame_signal(x, window_length, hop) * window
    return _rdft(frames, window_length)
