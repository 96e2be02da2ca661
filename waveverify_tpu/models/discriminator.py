"""Adversarial discriminator ensemble: MPD + MSD + MRD.

Reference model/discriminator.py:77-462. Training-only (the public API
never loads it), so exact checkpoint parity is not required — but the
architecture, feature-map taps (used by the feature-matching loss), and
preprocessing are reproduced faithfully.

TPU notes: audio rides NWC / NHWC so channels sit on lanes; the MRD's
complex STFT is a DFT matmul (``ops.dsp.stft_match_stride``) because
jnp.fft is unimplemented on this backend — and the matmul rides the MXU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveverify_tpu.config import DiscriminatorConfig
from waveverify_tpu.modules.conv import NormConv1d, NormConv2d
from waveverify_tpu.ops.dsp import resample, stft_match_stride

_LEAKY_SLOPE = 0.1


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=_LEAKY_SLOPE)


class MPD(nn.Module):
    """Multi-period discriminator (reference model/discriminator.py:77-152).

    Reshapes audio into a [time/period, period] image and applies a stack of
    (5, 1)-kernel 2-D convs striding the time axis.
    """

    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: [B, T, 1] -> pad to period multiple. Reference quirk kept: the
        # pad amount is `period - T % period`, i.e. a full extra period when
        # T already divides evenly (reference :110-121).
        t = x.shape[1]
        pad_amount = self.period - t % self.period
        x = jnp.pad(x, ((0, 0), (0, pad_amount), (0, 0)), mode="reflect")
        # b (l p) c -> b l p c  (NHWC: H=l, W=period)
        b = x.shape[0]
        x = x.reshape(b, x.shape[1] // self.period, self.period, 1)

        fmaps: List[jnp.ndarray] = []
        specs = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for i, (_cin, cout) in enumerate(specs):
            x = NormConv2d(
                features=cout, kernel_size=(5, 1), stride=(3, 1),
                padding=(2, 0), norm="weight_norm", name=f"conv_{i}",
            )(x)
            x = _lrelu(x)
            fmaps.append(x)
        x = NormConv2d(
            features=1024, kernel_size=(5, 1), stride=(1, 1), padding=(2, 0),
            norm="weight_norm", name="conv_4",
        )(x)
        x = _lrelu(x)
        fmaps.append(x)
        x = NormConv2d(
            features=1, kernel_size=(3, 1), stride=(1, 1), padding=(1, 0),
            norm="weight_norm", name="conv_post",
        )(x)
        fmaps.append(x)
        return fmaps


class MSD(nn.Module):
    """Multi-scale discriminator (reference model/discriminator.py:155-215).

    Grouped 1-D convs over audio resampled by ``rate`` (disabled in
    conf/base.yml:117 — rates: []).
    """

    rate: int = 1
    sample_rate: int = 16000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: [B, T, 1]
        if self.rate != 1:
            flat = resample(x[..., 0], self.sample_rate,
                            self.sample_rate // self.rate)
            x = flat[..., None]
        fmaps: List[jnp.ndarray] = []
        specs = [
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (cout, k, s, g, p) in enumerate(specs):
            x = _pad_w(x, p)
            x = NormConv1d(
                features=cout, kernel_size=k, stride=s, groups=g,
                norm="weight_norm", name=f"conv_{i}",
            )(x)
            x = _lrelu(x)
            fmaps.append(x)
        x = _pad_w(x, 1)
        x = NormConv1d(features=1, kernel_size=3, norm="weight_norm",
                       name="conv_post")(x)
        fmaps.append(x)
        return fmaps


def _pad_w(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Symmetric time padding (torch Conv1d padding=p semantics)."""
    if p == 0:
        return x
    return jnp.pad(x, ((0, 0), (p, p), (0, 0)))


class MRD(nn.Module):
    """Multi-resolution (complex-STFT band) discriminator
    (reference model/discriminator.py:230-355)."""

    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 16000
    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0),
    )
    channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: [B, T, 1] -> complex spectrogram as NHWC [B, frames, F, 2]
        hop = int(self.window_length * self.hop_factor)
        re, im = stft_match_stride(x[..., 0], self.window_length, hop)
        spec = jnp.stack([re, im], axis=-1)  # [B, T', F, 2]

        n_fft = self.window_length // 2 + 1
        band_idx = [(int(b0 * n_fft), int(b1 * n_fft)) for b0, b1 in self.bands]

        fmaps: List[jnp.ndarray] = []
        processed: List[jnp.ndarray] = []
        conv_specs = [
            ((3, 9), (1, 1), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 9), (1, 2), (1, 4)),
            ((3, 3), (1, 1), (1, 1)),
        ]
        for bi, (lo, hi) in enumerate(band_idx):
            band = spec[:, :, lo:hi, :]
            for ci, (k, s, p) in enumerate(conv_specs):
                band = NormConv2d(
                    features=self.channels, kernel_size=k, stride=s, padding=p,
                    norm="weight_norm", name=f"band_{bi}_conv_{ci}",
                )(band)
                band = _lrelu(band)
                fmaps.append(band)
            processed.append(band)
        x = jnp.concatenate(processed, axis=2)  # cat along frequency
        x = NormConv2d(
            features=1, kernel_size=(3, 3), stride=(1, 1), padding=(1, 1),
            norm="weight_norm", name="conv_post",
        )(x)
        fmaps.append(x)
        return fmaps


class Discriminator(nn.Module):
    """Ensemble of MPDs (per period), MSDs (per rate), MRDs (per fft size)
    (reference model/discriminator.py:362-462).

    __call__ : audio [B, T, 1] -> List[List[feature_map]], one inner list per
    sub-discriminator, last entry of each inner list is its logit map.
    """

    config: DiscriminatorConfig = DiscriminatorConfig()

    @staticmethod
    def preprocess(y: jnp.ndarray) -> jnp.ndarray:
        """DC-remove + 0.8 peak normalize (reference :412-435)."""
        y = y - jnp.mean(y, axis=1, keepdims=True)
        peak = jnp.max(jnp.abs(y), axis=1, keepdims=True) + 1e-9
        return 0.8 * y / peak

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        if x.ndim == 2:
            x = x[..., None]
        x = self.preprocess(x)
        c = self.config
        outputs: List[List[jnp.ndarray]] = []
        for i, period in enumerate(c.periods):
            outputs.append(MPD(period=period, name=f"mpd_{i}")(x))
        for i, rate in enumerate(c.rates):
            outputs.append(
                MSD(rate=rate, sample_rate=c.sample_rate, name=f"msd_{i}")(x)
            )
        for i, fft_size in enumerate(c.fft_sizes):
            outputs.append(
                MRD(
                    window_length=fft_size,
                    sample_rate=c.sample_rate,
                    bands=tuple(c.bands),
                    name=f"mrd_{i}",
                )(x)
            )
        return outputs
