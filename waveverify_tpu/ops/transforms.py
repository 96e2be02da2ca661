"""Audio analysis/synthesis transforms: STDCT, MDCT, PQMF.

Ports the reference transform catalog (reference modules/audio_modules.py:
STDCT :54-224, MDCT :227-316, PQMF :554-683) as stateless jax transforms:
each holds precomputed numpy filter banks and lowers to one strided conv
(analysis) / transposed conv (synthesis) per call — both MXU matmuls in
disguise on TPU.

Interfaces use [B, T] waveforms and [B, frames, bins] spectra (NWC — the
reference is [B, bins, frames]; bins ride TPU lanes here).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from waveverify_tpu.modules.conv import conv_precision, conv_transpose1d

PI = math.pi

# PQMF defaults (reference modules/audio_modules.py:44-47)
DEFAULT_BETA = 9.0
DEFAULT_CUTOFF_RATIO = 0.142
DEFAULT_TAPS = 62
DEFAULT_SUBBANDS = 4


def _conv_bank(x: jnp.ndarray, bank: jnp.ndarray, stride: int,
               padding: int) -> jnp.ndarray:
    """x [B, T]; bank [bins, K] -> [B, frames, bins] strided correlation."""
    y = jax.lax.conv_general_dilated(
        x[:, :, None],
        jnp.transpose(bank, (1, 0))[:, None, :].astype(x.dtype),  # (K,1,bins)
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=conv_precision(),
    )
    return y


def _convt_bank(spec: jnp.ndarray, bank: jnp.ndarray, stride: int,
                padding: int, output_padding: int) -> jnp.ndarray:
    """spec [B, frames, bins]; bank [bins, K] -> [B, T] torch
    conv_transpose1d(stride, padding, output_padding) semantics."""
    w = bank[:, None, :]  # (Cin=bins, Cout=1, K)
    full = conv_transpose1d(spec, jnp.asarray(w, spec.dtype), stride=stride)
    end = full.shape[1] - padding + output_padding
    return full[:, padding:end, 0]


class STDCT:
    """Short-time DCT-II as a strided conv against a windowed DCT basis
    (reference modules/audio_modules.py:54-224). NOLA-checked inverse."""

    def __init__(self, N: int, hop_size: int,
                 window: Optional[np.ndarray] = None):
        self.N = N
        self.hop_size = hop_size
        self.padding = (N - hop_size + 1) // 2
        self.output_padding = (N - hop_size) % 2
        self.clip = hop_size % 2 == 1
        if window is None:
            window = np.ones(N, np.float32)
        window = np.asarray(window, np.float32)
        n = np.arange(N, dtype=np.float64)[None, :]
        k = np.arange(N, dtype=np.float64)[:, None]
        basis = np.cos(PI / N * k * (n + 0.5)) * math.sqrt(2.0 / N)
        basis[0] /= math.sqrt(2.0)  # orthonormal DCT-II first row
        self.filter = (basis * window[None, :]).astype(np.float32)  # [N, N]
        self.window_square = (window ** 2).astype(np.float32)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, T] -> [B, frames, N]."""
        y = _conv_bank(x, jnp.asarray(self.filter), self.hop_size,
                       self.padding)
        if self.clip:
            y = y[:, :-1, :]
        return y

    def inverse(self, spec: jnp.ndarray) -> jnp.ndarray:
        """spec [B, frames, N] -> [B, T] with NOLA window compensation."""
        wav = _convt_bank(spec, jnp.asarray(self.filter), self.hop_size,
                          self.padding, self.output_padding)
        frames = spec.shape[1]
        ones = jnp.ones((1, frames, 1), wav.dtype)
        wsq = _convt_bank(ones, jnp.asarray(self.window_square[None, :]),
                          self.hop_size, self.padding, self.output_padding)
        # NOLA: the overlapped window energy must be nonzero everywhere
        # (reference modules/audio_modules.py:166-169)
        return wav / jnp.maximum(wsq, 1e-11)

    def nola_satisfied(self) -> bool:
        """Host-side NOLA check for the (window, hop) pair."""
        frames = 8
        acc = np.zeros(self.hop_size * (frames - 1) + self.N, np.float64)
        for f in range(frames):
            acc[f * self.hop_size : f * self.hop_size + self.N] += (
                self.window_square
            )
        inner = acc[self.N : -self.N] if len(acc) > 2 * self.N else acc
        return bool((inner > 1e-11).all())


class MDCT:
    """Modified DCT (reference modules/audio_modules.py:227-316):
    X[k] = sum_n x[n] cos(pi/N (n + 0.5 + N/2)(k + 0.5)), frame 2N, hop N."""

    def __init__(self, N: int, normalize: bool = True):
        self.N = N
        self.normalize = normalize
        k = np.arange(N, dtype=np.float64)[:, None]
        n = np.arange(2 * N, dtype=np.float64)[None, :]
        basis = np.cos(PI / N * (n + 0.5 + N / 2) * (k + 0.5))
        if normalize:
            basis = basis / math.sqrt(N)
        self.filter = basis.astype(np.float32)  # [N, 2N]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, N*frames] -> [B, frames+1, N]."""
        return _conv_bank(x, jnp.asarray(self.filter), self.N, self.N)

    def inverse(self, spec: jnp.ndarray) -> jnp.ndarray:
        """spec [B, frames+1, N] -> [B, N*frames] (TDAC overlap-add)."""
        f = self.filter if self.normalize else self.filter / self.N
        return _convt_bank(spec, jnp.asarray(f), self.N, self.N, 0)


def design_prototype_filter(taps: int = DEFAULT_TAPS,
                            cutoff_ratio: float = DEFAULT_CUTOFF_RATIO,
                            beta: float = DEFAULT_BETA) -> np.ndarray:
    """Kaiser-window prototype lowpass for PQMF
    (reference modules/audio_modules.py:499-552). Length taps+1."""
    if taps % 2 != 0:
        raise ValueError(f"taps must be even, got {taps}")
    if not 0.0 < cutoff_ratio < 1.0:
        raise ValueError(f"cutoff_ratio must be in (0, 1), got {cutoff_ratio}")
    omega_c = PI * cutoff_ratio
    n = np.arange(taps + 1, dtype=np.float64) - 0.5 * taps
    with np.errstate(invalid="ignore"):
        h_ideal = np.sin(omega_c * n) / (PI * n)
    h_ideal[taps // 2] = cutoff_ratio
    try:
        from scipy.signal.windows import kaiser as _kaiser
    except ImportError:  # pragma: no cover
        from numpy import kaiser as _kaiser  # type: ignore
        return (h_ideal * _kaiser(taps + 1, beta)).astype(np.float64)
    return h_ideal * _kaiser(taps + 1, beta)


class PQMF:
    """Pseudo-QMF cosine-modulated filterbank
    (reference modules/audio_modules.py:554-683): near-perfect
    reconstruction critical sampling into ``subbands`` bands."""

    def __init__(self, subbands: int = DEFAULT_SUBBANDS,
                 taps: int = DEFAULT_TAPS,
                 cutoff_ratio: float = DEFAULT_CUTOFF_RATIO,
                 beta: float = DEFAULT_BETA):
        self.subbands = subbands
        self.taps = taps
        h_proto = design_prototype_filter(taps, cutoff_ratio, beta)
        k = np.arange(subbands, dtype=np.float64)[:, None]
        n = np.arange(taps + 1, dtype=np.float64)[None, :]
        modulation = np.cos(
            (2 * k + 1) * PI / (2 * subbands) * (n - taps / 2)
            + ((-1.0) ** k) * PI / 4
        )
        self.bank = (
            2.0 * h_proto[None, :] * modulation * math.sqrt(subbands)
        ).astype(np.float32)  # [subbands, taps+1]

    def analysis(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, T] -> subbands [B, T//subbands, subbands]."""
        return _conv_bank(x, jnp.asarray(self.bank), self.subbands,
                          self.taps // 2)

    def synthesis(self, subband_signals: jnp.ndarray) -> jnp.ndarray:
        """[B, frames, subbands] -> [B, frames*subbands]."""
        return _convt_bank(subband_signals, jnp.asarray(self.bank),
                           self.subbands, self.taps // 2, self.subbands - 1)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.analysis(x)
