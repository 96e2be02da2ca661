"""Watermark generator: FiLM-conditioned SEANet encoder/decoder.

Produces an additive watermark *residual* the same length as the input
(reference model/generator.py:48-423; the residual is added to the clean
signal by the training composite, reference model/watermarking.py:361).

TPU notes: input length is padded up to a multiple of ``hop_length`` at
trace time (static shapes), the whole encode/decode pipeline is one XLA
program, and audio rides NWC layout so channels map to TPU lanes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from waveverify_tpu.config import GeneratorConfig
from waveverify_tpu.modules.seanet import SEANetDecoder, SEANetEncoder


class Generator(nn.Module):
    """audio [B, T, 1], msg [B, msg_dim] -> watermark residual [B, T, 1].

    Hyper-parameter mapping follows reference model/generator.py:174-238:
    the encoder takes ``channels_enc`` filters / ``n_residual_enc`` blocks /
    ``res_scale_enc``, the decoder ``channels_dec`` / ``n_residual_dec`` /
    ``res_scale_dec`` and the final activation (Tanh in conf/base.yml:28).
    ``spec_learnable`` is accepted but not forwarded by the reference
    (reference model/generator.py:95 vs :177-209) — reproduced via
    ``spec_learnable_effective``.
    """

    config: GeneratorConfig = GeneratorConfig()

    @property
    def hop_length(self) -> int:
        return self.config.hop_length

    def setup(self):
        g = self.config
        act_params = {"alpha": g.activation_alpha}
        self.encoder = SEANetEncoder(
            channels=g.channels_audio,
            dimension=g.dimension,
            msg_dimension=g.msg_dimension,
            n_filters=g.channels_enc,
            n_fft_base=g.n_fft_base,
            n_residual_layers=g.n_residual_enc,
            ratios=tuple(g.strides),
            activation=g.activation,
            activation_params=act_params,
            norm=g.norm,
            kernel_size=g.kernel_size,
            last_kernel_size=g.last_kernel_size,
            residual_kernel_size=g.residual_kernel_size,
            dilation_base=g.dilation_base,
            skip=g.skip,
            causal=g.causal,
            pad_mode=g.pad_mode,
            act_all=g.act_all,
            expansion=g.expansion,
            groups=g.groups,
            l2norm=g.encoder_l2norm,
            use_bias=g.bias,
            spec=g.spec,
            spec_compression=g.spec_compression,
            spec_learnable=g.spec_learnable_effective,
            res_scale=g.res_scale_enc,
            zero_init=g.zero_init,
            inout_norm=g.inout_norm,
            embedding_dim=g.embedding_dim,
            embedding_layers=g.embedding_layers,
            film_gamma_bias=g.film_gamma_bias,
            freq_bands=g.freq_bands,
            msg_mode=g.msg_mode,
            msg_carrier_gain=g.msg_carrier_gain,
            film_carrier_gain=g.film_carrier_gain,
        )
        self.decoder = SEANetDecoder(
            channels=g.channels_audio,
            dimension=g.dimension,
            n_filters=g.channels_dec,
            n_residual_layers=g.n_residual_dec,
            ratios=tuple(g.strides),
            activation=g.activation,
            activation_params=act_params,
            norm=g.norm,
            kernel_size=g.kernel_size,
            last_kernel_size=g.last_kernel_size,
            residual_kernel_size=g.residual_kernel_size,
            dilation_base=g.dilation_base,
            skip=g.skip,
            causal=g.causal,
            pad_mode=g.pad_mode,
            final_activation=g.final_activation,
            act_all=g.act_all,
            expansion=g.expansion,
            groups=g.groups,
            use_bias=g.bias,
            res_scale=g.res_scale_dec,
            zero_init=g.zero_init,
            inout_norm=g.inout_norm,
        )

    def preprocess(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Right-pad to a hop_length multiple (reference generator.py:245-288)."""
        length = audio.shape[1]
        right_pad = -length % self.hop_length
        if right_pad:
            audio = jnp.pad(audio, ((0, 0), (0, right_pad), (0, 0)))
        return audio

    def encode(self, audio: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
        """audio [B, T, 1] -> latent [B, ceil(T/hop), dimension]."""
        return self.encoder(self.preprocess(audio), msg)

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(latent)

    def _latent_carrier(self, latent: jnp.ndarray,
                        msg: jnp.ndarray) -> jnp.ndarray:
        """Fixed orthonormal per-bit latent directions, scaled relative to
        the latent's own RMS (stop-gradient) so ``latent_carrier_gain`` is a
        content-independent fraction. Constants only — no parameters, so
        checkpoints resume with the carrier switched on. See
        GeneratorConfig.latent_carrier_gain for the conditioning rationale.
        """
        g = self.config
        rs = np.random.RandomState(18)
        c = np.linalg.qr(
            rs.randn(g.dimension, g.msg_dimension)
        )[0].astype(np.float32)  # [dim, nbits], orthonormal columns
        s = 2.0 * msg.astype(jnp.float32) - 1.0  # [B, nbits]
        rms = jnp.sqrt(jnp.mean(jnp.square(latent), axis=(1, 2),
                                keepdims=True) + 1e-12)
        rms = jax.lax.stop_gradient(rms)
        off = (s @ jnp.asarray(c.T))[:, None, :]  # [B, 1, dim]
        # conditioning math runs f32; cast at the add so the latent stream
        # keeps its dtype (bf16-serving leak fix, docs/SERVING_PERF.md)
        return latent + (g.latent_carrier_gain * rms * off).astype(
            latent.dtype)

    def __call__(self, audio: jnp.ndarray, msg: jnp.ndarray) -> jnp.ndarray:
        if audio.ndim == 2:  # accept [B, T]
            audio = audio[..., None]
        original_length = audio.shape[1]
        latent = self.encode(audio, msg)
        if self.config.latent_carrier_gain > 0 and msg is not None:
            latent = self._latent_carrier(latent, msg)
        residual = self.decode(latent)
        return residual[:, :original_length, :]
