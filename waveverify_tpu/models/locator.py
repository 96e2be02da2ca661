"""Watermark locator: small SEANet encoder + presence-mask head.

Produces sample-level watermark-presence logits
(reference model/locator.py:46-299, ~0.13 M params per README.md:33).
Hop length is 8*4 = 32 so the upsampling head is a k = stride = 32
transposed conv (reference model/locator.py:174-183).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from waveverify_tpu.config import LocatorConfig
from waveverify_tpu.modules.conv import NormConv1d, NormConvTranspose1d
from waveverify_tpu.modules.seanet import SEANetEncoder


class Locator(nn.Module):
    """audio [B, T, 1] -> presence logits [B, T, 1]."""

    config: LocatorConfig = LocatorConfig()

    @property
    def hop_length(self) -> int:
        return self.config.hop_length

    def setup(self):
        c = self.config
        self.encoder = SEANetEncoder(
            channels=c.channels_audio,
            dimension=c.dimension,
            n_filters=c.channels_enc,
            n_fft_base=c.n_fft_base,
            n_residual_layers=c.n_residual_enc,
            ratios=tuple(c.strides),
            activation=c.activation,
            activation_params={"alpha": c.activation_alpha},
            norm=c.norm,
            kernel_size=c.kernel_size,
            last_kernel_size=c.last_kernel_size,
            residual_kernel_size=c.residual_kernel_size,
            dilation_base=c.dilation_base,
            skip=c.skip,
            causal=c.causal,
            pad_mode=c.pad_mode,
            act_all=c.act_all,
            expansion=c.expansion,
            groups=c.groups,
            l2norm=c.encoder_l2norm,
            use_bias=c.bias,
            spec=c.spec,
            spec_compression=c.spec_compression,
            res_scale=c.res_scale_enc,
            zero_init=c.zero_init,
            inout_norm=c.inout_norm,
            # Locator strides (8, 4) only have 2 scales + spec_post; slice the
            # default 5-entry spec stats like the reference's encoder does.
        )
        self.reverse_convolution = NormConvTranspose1d(
            features=c.output_dim,
            kernel_size=self.hop_length,
            stride=self.hop_length,
            norm="none",
            use_bias=True,
        )
        self.last_layer = NormConv1d(
            features=1, kernel_size=1, norm="none", use_bias=True
        )

    def preprocess(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Right-pad to hop multiple (reference model/locator.py:190-226).

        Kept for API parity but NOT used by ``__call__`` — the reference's
        forward (model/locator.py:268-299) feeds the raw length straight to
        the encoder (see Detector.preprocess note).
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
        from waveverify_tpu.modules.conv import fused_upsample_head

        return fused_upsample_head(
            self.reverse_convolution, self.last_layer, z, original_length
        )  # [B, T, 1]
