"""Watermark detector: SEANet encoder + learned upsampling bit head.

Recovers per-sample logits for the 16 message bits
(reference model/detector.py:62-434, ~4.5 M params per README.md:34).

Two decision paths exist in the reference and both are kept:

- ``detector_postprocess``: softmax over the bit axis -> time mean ->
  sigmoid -> threshold (reference model/detector.py:347-356 — a quirky
  double squashing preserved for compatibility).
- ``detector_bits`` / ``detector_confidence``: sigmoid -> time mean ->
  threshold, the path the public API and the BER metric use
  (reference waveverify/core.py:577-586, scripts/evaluate.py:471-494) —
  treat this one as canonical.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from waveverify_tpu.config import DetectorConfig
from waveverify_tpu.modules.conv import NormConv1d, NormConvTranspose1d
from waveverify_tpu.modules.seanet import SEANetEncoder

DEFAULT_MESSAGE_THRESHOLD = 0.5


class Detector(nn.Module):
    """audio [B, T, 1] -> per-sample bit logits [B, T, nbits].

    Pipeline (reference model/detector.py:178-218, :278-318):
    SEANet encoder (no message) -> ConvTranspose1d(dim -> output_dim,
    k = stride = hop_length, plain torch init, no weight norm) -> trim to
    the original sample count -> 1x1 conv to ``nbits`` logits.
    """

    config: DetectorConfig = DetectorConfig()

    @property
    def hop_length(self) -> int:
        return self.config.hop_length

    def setup(self):
        d = self.config
        self.encoder = SEANetEncoder(
            channels=d.channels_audio,
            dimension=d.dimension,
            n_filters=d.channels_enc,
            n_fft_base=d.n_fft_base,
            n_residual_layers=d.n_residual_enc,
            ratios=tuple(d.strides),
            activation=d.activation,
            activation_params={"alpha": d.activation_alpha},
            norm=d.norm,
            kernel_size=d.kernel_size,
            last_kernel_size=d.last_kernel_size,
            residual_kernel_size=d.residual_kernel_size,
            dilation_base=d.dilation_base,
            skip=d.skip,
            causal=d.causal,
            pad_mode=d.pad_mode,
            act_all=d.act_all,
            expansion=d.expansion,
            groups=d.groups,
            l2norm=d.encoder_l2norm,
            use_bias=d.bias,
            spec=d.spec,
            spec_compression=d.spec_compression,
            res_scale=d.res_scale_enc,
            zero_init=d.zero_init,
            inout_norm=d.inout_norm,
        )
        # Plain (un-normalized) transposed conv, torch default init semantics
        # (reference model/detector.py:209-215).
        self.reverse_convolution = NormConvTranspose1d(
            features=d.output_dim,
            kernel_size=self.hop_length,
            stride=self.hop_length,
            norm="none",
            use_bias=True,
        )
        self.last_layer = NormConv1d(
            features=d.nbits, kernel_size=1, norm="none", use_bias=True
        )

    def preprocess(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Right-pad to hop multiple (reference model/detector.py:226-276).

        NOTE: kept for API parity but — like the reference — NOT used by
        ``__call__``: reference Detector.forward (model/detector.py:366-391)
        feeds the raw length straight to the encoder, whose smart convs do
        the ceil-padding internally. Pre-padding would change tail values.
        """
        length = audio.shape[1]
        right_pad = -length % self.hop_length
        if right_pad:
            audio = jnp.pad(audio, ((0, 0), (0, right_pad), (0, 0)))
        return audio

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        if audio.ndim == 2:
            audio = audio[..., None]
        original_length = audio.shape[1]
        z = self.encoder(audio, None)
        # ConvTranspose1d(k=stride) -> trim -> 1x1, fused into one matmul
        # (identical math + params; see fused_upsample_head).
        from waveverify_tpu.modules.conv import fused_upsample_head

        return fused_upsample_head(
            self.reverse_convolution, self.last_layer, z, original_length
        )  # [B, T, nbits]


def detector_postprocess(
    logits: jnp.ndarray, message_threshold: float = DEFAULT_MESSAGE_THRESHOLD
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference ``Detector.postprocess`` quirk path
    (reference model/detector.py:320-356).

    logits [B, T, nbits] -> (bits [B, nbits] int32, probabilities [B, nbits]).
    Softmax over the bit axis, mean over time, then *sigmoid* again.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    decoded = jnp.mean(probs, axis=1)
    message_probabilities = jax.nn.sigmoid(decoded)
    bits = (message_probabilities > message_threshold).astype(jnp.int32)
    return bits, message_probabilities


def detector_confidence(logits: jnp.ndarray) -> jnp.ndarray:
    """API confidence: mean over time and bits of sigmoid(logits)
    (reference waveverify/core.py:577-583). logits [B, T, nbits] -> [B]."""
    return jnp.mean(jax.nn.sigmoid(logits), axis=(1, 2))


def detector_bits(
    logits: jnp.ndarray, threshold: float = DEFAULT_MESSAGE_THRESHOLD
) -> jnp.ndarray:
    """Canonical bit decision: sigmoid -> time mean -> threshold
    (reference waveverify/utils.py:356-412). logits [B, T, nbits] -> [B, nbits]."""
    probs = jnp.mean(jax.nn.sigmoid(logits), axis=1)
    return (probs > threshold).astype(jnp.int32)
