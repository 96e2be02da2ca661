"""SEANet encoder/decoder with FiLM message conditioning, TPU-first.

Re-implements the reference SEANet stack (reference modules/seanet.py) as
Flax modules in NWC layout. Architectural semantics reproduced:

- depth-wise separable residual blocks with progressive pre-scaling
  ``(1 + idx * res_scale^2)^-0.5`` and residual output scaling
  (reference seanet.py:123-281),
- per-scale ``SpecBlock`` residual injection of log-STFT features computed
  from the *raw waveform* at the cumulative stride of that scale
  (reference seanet.py:365-511),
- FiLM modulation of ``freq_bands`` channel bands by an MLP embedding of the
  16-bit message, applied after each downsample (reference seanet.py:915-966),
- waveform std normalization ``1/0.1122080159`` on input and its inverse at
  the decoder output (reference seanet.py:631, 1193).

Known reference quirk handled here: with ``l2norm=True`` and ``bias=False``
(the shipped conf/base.yml), the reference crashes at construction
(reference seanet.py:828 dereferences a None bias). This build keeps the
evident intent — the final projection gets a bias drawn from N(0,1) whenever
``l2norm`` is enabled — and never crashes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from waveverify_tpu.modules.conv import CausalSTFT, SConv1d, SConvTranspose1d

# Default per-scale spectrogram normalization stats (reference seanet.py:632-633)
DEFAULT_SPEC_MEANS = (-4.554, -4.315, -4.021, -3.726, -3.477)
DEFAULT_SPEC_STDS = (2.830, 2.837, 2.817, 2.796, 2.871)
DEFAULT_WAV_STD = 0.1122080159


def get_activation(name: str, params: Optional[Dict[str, Any]] = None) -> Callable:
    """Map torch activation names to jax functions."""
    params = params or {}
    params = {k: v for k, v in params.items() if k != "inplace"}
    if name == "ELU":
        alpha = params.get("alpha", 1.0)
        return lambda x: jax.nn.elu(x, alpha=alpha)
    if name == "ReLU":
        return jax.nn.relu
    if name == "LeakyReLU":
        slope = params.get("negative_slope", 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "Tanh":
        return jnp.tanh
    if name == "GELU":
        return jax.nn.gelu
    if name == "Sigmoid":
        return jax.nn.sigmoid
    raise ValueError(f"unsupported activation: {name}")


class L2Norm(nn.Module):
    """Channel-wise L2 norm scaled by sqrt(C) (reference seanet.py:288-318)."""

    inout_norm: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch F.normalize: x / max(||x||_2, eps) along channel axis (last in NWC)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        y = x / jnp.maximum(norm, self.eps)
        if self.inout_norm:
            y = y * (x.shape[-1] ** 0.5)
        return y


class Scale(nn.Module):
    """Fixed or learnable channel scale (reference seanet.py:321-359)."""

    dim: int = 1
    value: float = 1.0
    learnable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.learnable:
            scale = self.param(
                "scale",
                lambda key, shape: jnp.full(shape, self.value, jnp.float32),
                (self.dim,),
            )
            return x * scale.astype(x.dtype)
        return x * jnp.asarray(self.value, x.dtype)


class FiLM(nn.Module):
    """Feature-wise linear modulation (reference seanet.py:518-550).

    ``gamma_bias`` (default 0.0 = reference init: zero bias, so the
    modulated bands start multiplied by ~0) lets training start from an
    identity-like modulation (gamma ~= 1): the feature path through the
    FiLM'd bands stays alive from step 0, which measurably accelerates
    message-channel formation (see docs/TRAINING.md). Checkpoint-converted
    weights overwrite the init either way.
    """

    gamma_bias: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, condition: jnp.ndarray,
                 offsets: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        gamma = nn.Dense(
            1, kernel_init=nn.initializers.truncated_normal(0.02),
            bias_init=nn.initializers.constant(self.gamma_bias), name="gamma"
        )(condition)
        beta = nn.Dense(
            1, kernel_init=nn.initializers.truncated_normal(0.02), name="beta"
        )(condition)
        if offsets is not None:
            # gain-space carrier: fixed per-bit +/- signature added directly
            # to this site's (gamma, beta) — constants, no parameters (see
            # _film_carrier and GeneratorConfig.film_carrier_gain)
            gamma = gamma + offsets[:, 0:1]
            beta = beta + offsets[:, 1:2]
        # x: [B, T, C_band]; gamma/beta: [B, 1]. The conditioning math runs
        # f32 (tiny tensors); cast at the modulation so the [B, T, C]
        # activation stream keeps ITS dtype — without this, bf16 serving
        # silently upcasts the whole network at the first FiLM site
        # (docs/SERVING_PERF.md dtype-leak study).
        gamma = gamma.astype(x.dtype)
        beta = beta.astype(x.dtype)
        return x * gamma[:, None, :] + beta[:, None, :]


def _film_carrier(nbits: int, n_sites: int) -> np.ndarray:
    """Fixed orthogonal per-bit signatures over the FiLM gain slots.

    Returns [nbits, 2 * n_sites] with exactly orthonormal rows: bit i's
    signature spans every (scale, band) site's gamma AND beta slot. When the
    slot count is a power of two >= nbits + 1 (the base config: 4 scales x
    4 bands x 2 = 32), rows come from a Sylvester-Hadamard matrix (skipping
    the all-ones row so no bit aliases global loudness) — every bit touches
    every site with identical magnitude, differing only in sign, so all bits
    are exactly symmetric in gain space and survive band-limited attacks
    equally. Otherwise (tiny test configs) a fixed random orthonormal basis
    (QR) is used; rows stay orthonormal, spread is merely near-uniform.
    """
    slots = 2 * n_sites
    if slots >= nbits + 1 and slots & (slots - 1) == 0:
        h = np.ones((1, 1), np.float64)
        while h.shape[0] < slots:
            h = np.block([[h, h], [h, -h]])
        sig = h[1:nbits + 1] / np.sqrt(slots)
    else:
        rs = np.random.RandomState(17)
        q = np.linalg.qr(rs.randn(max(slots, nbits), nbits))[0]  # orth cols
        sig = q[:slots].T  # [nbits, slots]; orthonormal rows iff slots>=nbits
        norms = np.linalg.norm(sig, axis=1, keepdims=True)
        sig = sig / np.maximum(norms, 1e-8)
    return sig.astype(np.float32)


def _dws_conv_block(
    parent: nn.Module,
    prefix: str,
    act: Callable,
    dim: int,
    kernel_size: int,
    dilation: int,
    norm: str,
    norm_params: Dict[str, Any],
    causal: bool,
    pad_mode: str,
    act_all: bool,
    expansion: int,
    groups: int,
    bias: bool,
) -> List[Callable]:
    """Depth-wise separable conv block: act -> 1x1 -> (act) -> grouped conv.

    Mirrors reference seanet.py:39-116; returns callables closing over
    submodules created on ``parent``.
    """
    pw = SConv1d(
        features=dim,
        kernel_size=1,
        norm=norm,
        norm_kwargs=norm_params,
        use_bias=bias if act_all else False,
        nonlinearity="relu",
        name=f"{prefix}_pw",
    )
    g = groups if groups != -1 else dim // expansion
    dw = SConv1d(
        features=dim,
        kernel_size=kernel_size,
        dilation=dilation,
        groups=g,
        norm=norm,
        norm_kwargs=norm_params,
        causal=causal,
        pad_mode=pad_mode,
        use_bias=bias,
        nonlinearity="relu" if act_all else "linear",
        name=f"{prefix}_dw",
    )
    steps: List[Callable] = [act, pw]
    if act_all:
        steps.append(act)
    steps.append(dw)
    return steps


def _apply_resblock_chain(parent: nn.Module, blocks, x: jnp.ndarray
                          ) -> jnp.ndarray:
    """Apply a run of adjacent residual blocks, fusing the WHOLE chain into
    one Pallas kernel when eligible (shipped encoder/decoder scales run 2-3
    identical-shape blocks back to back; one kernel per chain costs one HBM
    read of x + one write of the output instead of one pair per block —
    docs/SERVING_PERF.md, the program is memory-bound). Falls back to
    per-block application (which itself may fuse single blocks) whenever
    the chain is not eligible, and always during init (the per-block path
    creates/owns the params)."""
    if blocks and not parent.is_initializing():
        from waveverify_tpu.ops.pallas_kernels import (
            can_fuse,
            fused_resblock_chain,
            pallas_enabled,
        )

        b0 = blocks[0]
        if (
            pallas_enabled()
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and all(tuple(m.dilations) == (1, 1)
                    and m.kernel_size == b0.kernel_size
                    and m.res_scale == b0.res_scale
                    and m.activation_params == b0.activation_params
                    for m in blocks)
            and can_fuse(x.shape[1], x.shape[2], b0.kernel_size,
                         m=len(blocks))
        ):
            fps = [m._fused_params() for m in blocks]
            if all(fp is not None for fp in fps):
                slots = [fp[0] + fp[1] for fp in fps]
                prescales = tuple(
                    (1.0 + m.idx * m.res_scale**2) ** -0.5
                    if m.res_scale is not None else 1.0
                    for m in blocks
                )
                return fused_resblock_chain(
                    x, slots, k=b0.kernel_size, dilations=(1, 1),
                    prescales=prescales,
                    res_scale=(b0.res_scale
                               if b0.res_scale is not None else 1.0),
                    alpha=(b0.activation_params or {}).get("alpha", 1.0),
                )
    for m in blocks:
        x = m(x)
    return x


class SEANetResnetBlock(nn.Module):
    """Residual block with skip strategies (reference seanet.py:123-281)."""

    dim: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 1)
    activation: str = "ELU"
    activation_params: Dict[str, Any] = None
    norm: str = "weight_norm"
    norm_params: Dict[str, Any] = None
    causal: bool = True
    pad_mode: str = "constant"
    skip: str = "1x1"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    use_bias: bool = True
    res_scale: Optional[float] = None
    idx: int = 0
    zero_init: bool = True

    def _fused_params(self) -> Optional[tuple]:
        """Read + weight-norm-fuse this block's conv params for the Pallas
        kernel. Returns None when the block shape isn't kernel-eligible."""
        if (
            self.skip != "identity"
            or self.act_all
            or self.activation != "ELU"
            or self.zero_init
            or not self.causal
            or self.expansion != 1
            or self.groups != -1
            or tuple(self.dilations) != (1, 1)
            or self.norm not in ("weight_norm", "none")
        ):
            return None

        def conv_kernel(name: str):
            p = self.get_variable("params", name)["conv"]
            v = p["v"]
            if self.norm == "weight_norm":
                axes = (0, 1)
                norm_v = jnp.sqrt(
                    jnp.sum(jnp.square(v), axis=axes, keepdims=True)
                )
                w = v * (p["g"][None, None, :] / norm_v)
            else:
                w = v
            return w, p.get("b")

        out = []
        for i in range(2):
            pw, _ = conv_kernel(f"block_{i}_pw")  # (1, C, C), no bias
            dw, db = conv_kernel(f"block_{i}_dw")  # (k, 1, C)
            c = pw.shape[-1]
            if db is None:
                db = jnp.zeros((c,), pw.dtype)
            out.append((pw[0], dw[:, 0, :], db))
        return out

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation, self.activation_params or {"alpha": 1.0})

        # Fused Pallas path (TPU): the whole block as one VMEM-resident
        # kernel (see ops/pallas_kernels.py). Init and non-eligible shapes
        # take the step-by-step path below, which creates/owns the params.
        if not self.is_initializing():
            from waveverify_tpu.ops.pallas_kernels import (
                can_fuse,
                fused_resblock,
                pallas_enabled,
            )

            # bf16 inputs supported: the kernel loads bf16 (halved
            # HBM<->VMEM transfer) and computes f32-internally — Mosaic on
            # this target cannot lower bf16 vector comparisons, so the
            # ELU/where arithmetic must be f32 regardless.
            if (
                pallas_enabled()
                and x.dtype in (jnp.float32, jnp.bfloat16)
                and can_fuse(x.shape[1], x.shape[2], self.kernel_size)
            ):
                fp = self._fused_params()
                if fp is not None:
                    (pw1, dw1, b1), (pw2, dw2, b2) = fp
                    prescale = (
                        (1.0 + self.idx * self.res_scale**2) ** -0.5
                        if self.res_scale is not None else 1.0
                    )
                    alpha = (self.activation_params or {}).get("alpha", 1.0)
                    return fused_resblock(
                        x, pw1, dw1, b1, pw2, dw2, b2,
                        k=self.kernel_size,
                        dilations=(self.dilations[0], self.dilations[1]),
                        prescale=prescale,
                        res_scale=(self.res_scale
                                   if self.res_scale is not None else 1.0),
                        alpha=alpha,
                    )

        steps: List[Callable] = []
        for i, dilation in enumerate(self.dilations):
            steps += _dws_conv_block(
                self,
                f"block_{i}",
                act,
                self.dim,
                self.kernel_size,
                dilation,
                self.norm,
                self.norm_params or {},
                self.causal,
                self.pad_mode,
                self.act_all,
                self.expansion,
                self.groups,
                self.use_bias,
            )

        # Skip connection (reference seanet.py:212-229, 254-262)
        if self.skip == "identity":
            shortcut = x
        elif self.skip == "1x1":
            shortcut = SConv1d(
                features=self.dim,
                kernel_size=1,
                norm=self.norm,
                norm_kwargs=self.norm_params,
                use_bias=self.use_bias,
                name="shortcut",
            )(x)
        elif self.skip == "scale":
            scale = self.param("skip_scale", nn.initializers.ones, (1,))
            shortcut = x * scale
        elif self.skip == "exp_scale":
            scale = self.param("skip_scale", nn.initializers.zeros, (1,))
            shortcut = x * jnp.exp(scale)
        elif self.skip == "channelwise_scale":
            scale = self.param("skip_scale", nn.initializers.ones, (self.dim,))
            shortcut = x * scale
        else:
            raise ValueError(f"unknown skip type: {self.skip}")

        # Progressive pre-scaling (reference seanet.py:183, 265-266)
        y = x
        if self.res_scale is not None:
            y = y * (1.0 + self.idx * self.res_scale**2) ** -0.5
        for step in steps:
            y = step(y)

        scale_out = 1.0 if self.res_scale is None else self.res_scale
        if self.zero_init:
            res_scale_param = self.param("res_scale_param", nn.initializers.zeros, (1,))
            return y * (scale_out * res_scale_param) + shortcut
        return y * scale_out + shortcut


class SpecBlock(nn.Module):
    """Residual injection of normalized log-STFT features
    (reference seanet.py:365-511)."""

    spec: str
    spec_compression: str
    n_fft: int
    channels: int
    stride: int
    norm: str = "weight_norm"
    norm_params: Dict[str, Any] = None
    use_bias: bool = False
    pad_mode: str = "constant"
    learnable: bool = False
    causal: bool = True
    mean: float = 0.0
    std: float = 1.0
    res_scale: Optional[float] = 1.0
    zero_init: bool = True
    inout_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, wav: jnp.ndarray) -> jnp.ndarray:
        if self.spec == "":
            return x
        if self.spec != "stft":
            raise ValueError(f"unknown spec type: {self.spec}")

        y = CausalSTFT(
            n_fft=self.n_fft,
            hop_size=self.stride,
            pad_mode=self.pad_mode,
            learnable=self.learnable,
            name="stft",
        )(wav)

        if self.spec_compression == "log":
            y = jnp.log(jnp.maximum(y, 1e-5))
        elif self.spec_compression == "":
            pass
        else:
            p = float(self.spec_compression)
            y = jnp.sign(y) * jnp.power(jnp.abs(y), p)

        if self.inout_norm:
            y = (y - self.mean) / self.std

        y = SConv1d(
            features=self.channels,
            kernel_size=1,
            norm=self.norm,
            norm_kwargs=self.norm_params,
            use_bias=self.use_bias,
            pad_mode=self.pad_mode,
            name="proj",
        )(y)

        scale = 1.0 if self.res_scale is None else self.res_scale
        if self.zero_init:
            scale_param = self.param("scale_param", nn.initializers.zeros, (1,))
            # f32 param cast to the stream dtype (bf16-serving leak fix)
            return x + y * (scale_param.astype(y.dtype) * scale)
        return x + y * scale


class SEANetEncoder(nn.Module):
    """SEANet encoder with hierarchical FiLM message modulation.

    Reference seanet.py:555-976. Ratios are processed **reversed** (coarse to
    fine), cumulative-stride spec blocks are applied before each downsample,
    and FiLM modulates ``freq_bands`` channel bands after each downsample.

    Input  : audio ``[B, T, channels]``, message ``[B, msg_dimension]`` or None
    Output : latent ``[B, ceil(T / prod(ratios)), dimension]``
    """

    channels: int = 1
    dimension: int = 128
    msg_dimension: int = 16
    n_filters: int = 32
    n_fft_base: int = 64
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Dict[str, Any] = None
    norm: str = "weight_norm"
    norm_params: Dict[str, Any] = None
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    skip: str = "1x1"
    causal: bool = False
    pad_mode: str = "constant"
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    l2norm: bool = False
    use_bias: bool = True
    spec: str = "stft"
    spec_compression: str = ""
    spec_learnable: bool = False
    res_scale: Optional[float] = None
    wav_std: float = DEFAULT_WAV_STD
    spec_means: Sequence[float] = DEFAULT_SPEC_MEANS
    spec_stds: Sequence[float] = DEFAULT_SPEC_STDS
    zero_init: bool = True
    inout_norm: bool = True
    embedding_dim: int = 64
    embedding_layers: int = 2
    freq_bands: int = 4
    film_gamma_bias: float = 0.0
    msg_mode: str = "reference"  # "reference" | "carrier" (see _msg_embed)
    msg_carrier_gain: float = 1.0
    film_carrier_gain: float = 0.0  # gain-space carrier (see _film_carrier)

    @property
    def rev_ratios(self) -> List[int]:
        return list(reversed(list(self.ratios)))

    @property
    def hop_length(self) -> int:
        return int(np.prod(list(self.ratios)))

    def _msg_embed(self, msg: jnp.ndarray) -> jnp.ndarray:
        """Message MLP: Linear(msg->emb) then layers x [Linear, ReLU]
        (reference seanet.py:831-839).

        ``msg_mode="carrier"`` (training-side improvement; default
        "reference" keeps converted-checkpoint parity): feed the MLP +/-1
        bits instead of {0,1} (a 0-bit otherwise contributes nothing through
        ``msg_in``) and add a *fixed orthonormal carrier* term so every bit
        owns an immortal, mutually-orthogonal direction in embedding space.
        Rationale (measured, round 2): with the learned-only map, AdamW
        weight decay kills the embedding channel of any bit the detector has
        not yet learned to decode (its decode gradient is pure noise), a
        self-reinforcing death — per-bit audio-sensitivity probe on a 29k-step
        checkpoint showed 11/16 bits with ~0 audio delta and exactly-chance
        accuracy. The constant carrier has no weights to decay, so the
        channel for every bit stays alive regardless of training dynamics.
        """
        carrier_mode = self.msg_mode == "carrier"
        m = msg.astype(jnp.float32)
        s = 2.0 * m - 1.0 if carrier_mode else m
        h = nn.Dense(
            self.embedding_dim,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="msg_in",
        )(s)
        for i in range(self.embedding_layers):
            h = nn.Dense(
                self.embedding_dim,
                kernel_init=nn.initializers.truncated_normal(0.02),
                name=f"msg_hidden_{i}",
            )(h)
            h = jax.nn.relu(h)
        if carrier_mode:
            # Deterministic orthonormal columns (numpy at trace time — a
            # compile-time constant, never a parameter).
            rs = np.random.RandomState(16)
            c = np.linalg.qr(
                rs.randn(self.embedding_dim, self.msg_dimension)
            )[0].astype(np.float32)  # [emb, nbits], orthonormal columns
            h = h + s @ jnp.asarray(c.T) * self.msg_carrier_gain
        return h

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, msg: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        act = get_activation(self.activation, self.activation_params or {"alpha": 1.0})
        norm_params = self.norm_params or {}
        ratios = self.rev_ratios
        wav = x

        # conv_pre: waveform normalization + first conv (reference :657-664)
        if self.inout_norm:
            x = x * (1.0 / self.wav_std)
        x = SConv1d(
            features=self.n_filters,
            kernel_size=self.kernel_size,
            norm=self.norm,
            norm_kwargs=norm_params,
            causal=self.causal,
            pad_mode=self.pad_mode,
            use_bias=self.use_bias,
            name="conv_pre",
        )(x)

        # Message embedding. Always create the params (the reference builds
        # msg_embedding/film even when unused, e.g. in the Detector), but
        # only spend compute when a message is provided.
        msg_embedded = None
        film_offsets = None
        if msg is not None:
            msg_embedded = self._msg_embed(msg)
            if self.film_carrier_gain > 0:
                sig = _film_carrier(
                    self.msg_dimension,
                    len(ratios) * self.freq_bands,
                )  # [nbits, 2 * n_sites], compile-time constant
                s = 2.0 * msg.astype(jnp.float32) - 1.0
                film_offsets = (
                    s @ jnp.asarray(sig)
                ) * self.film_carrier_gain  # [B, 2 * n_sites]
        elif self.is_initializing():
            self._msg_embed(jnp.zeros((1, self.msg_dimension), jnp.float32))

        mult = 1
        stride = 1
        for block_idx, ratio in enumerate(ratios):
            dim = mult * self.n_filters
            x = _apply_resblock_chain(self, [
                SEANetResnetBlock(
                    dim=dim,
                    kernel_size=self.residual_kernel_size,
                    dilations=(self.dilation_base**j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm,
                    norm_params=norm_params,
                    causal=self.causal,
                    pad_mode=self.pad_mode,
                    skip=self.skip,
                    act_all=self.act_all,
                    expansion=self.expansion,
                    groups=self.groups,
                    use_bias=self.use_bias,
                    res_scale=self.res_scale,
                    idx=j - 1 if self.spec == "" else j,
                    zero_init=self.zero_init,
                    name=f"block_{block_idx}_{j - 1}",
                )
                for j in range(1, self.n_residual_layers + 1)
            ], x)

            x = SpecBlock(
                spec=self.spec,
                spec_compression=self.spec_compression,
                n_fft=mult * self.n_fft_base,
                channels=dim,
                stride=stride,
                norm=self.norm,
                norm_params=norm_params,
                use_bias=False,
                pad_mode=self.pad_mode,
                learnable=self.spec_learnable,
                causal=self.causal,
                mean=self.spec_means[block_idx],
                std=self.spec_stds[block_idx],
                res_scale=self.res_scale,
                zero_init=self.zero_init,
                inout_norm=self.inout_norm,
                name=f"spec_block_{block_idx}",
            )(x, wav)
            stride *= ratio

            # Downsample: fixed scale -> act -> 1x1 expand -> depthwise strided
            # (reference seanet.py:732-772)
            if self.res_scale is not None:
                x = x * (1.0 + self.n_residual_layers * self.res_scale**2) ** -0.5
            x = act(x)
            x = SConv1d(
                features=dim * 2,
                kernel_size=1,
                norm=self.norm,
                norm_kwargs=norm_params,
                use_bias=False,
                nonlinearity="relu",
                name=f"down_{block_idx}_expand",
            )(x)
            x = SConv1d(
                features=dim * 2,
                kernel_size=ratio * 2,
                stride=ratio,
                groups=dim * 2,
                norm=self.norm,
                norm_kwargs=norm_params,
                causal=self.causal,
                pad_mode=self.pad_mode,
                use_bias=self.use_bias,
                name=f"down_{block_idx}_dw",
            )(x)

            # FiLM over frequency bands (reference seanet.py:928-966)
            c = x.shape[-1]
            if c % self.freq_bands != 0:
                raise ValueError(
                    f"channels ({c}) must be divisible by freq_bands "
                    f"({self.freq_bands}) at scale {block_idx}"
                )
            if msg_embedded is not None or self.is_initializing():
                cond = (
                    msg_embedded
                    if msg_embedded is not None
                    else jnp.zeros((x.shape[0], self.embedding_dim), jnp.float32)
                )
                band_width = c // self.freq_bands
                bands = []
                for band_idx in range(self.freq_bands):
                    band = x[..., band_idx * band_width : (band_idx + 1) * band_width]
                    site = block_idx * self.freq_bands + band_idx
                    band = FiLM(
                        gamma_bias=self.film_gamma_bias,
                        name=f"film_{block_idx}_{band_idx}",
                    )(
                        band, cond,
                        offsets=(
                            film_offsets[:, 2 * site : 2 * site + 2]
                            if film_offsets is not None
                            else None
                        ),
                    )
                    bands.append(band)
                modulated = jnp.concatenate(bands, axis=-1)
                if msg_embedded is not None:
                    x = modulated

            mult *= 2

        x = SpecBlock(
            spec=self.spec,
            spec_compression=self.spec_compression,
            n_fft=mult * self.n_fft_base,
            channels=mult * self.n_filters,
            stride=stride,
            norm=self.norm,
            norm_params=norm_params,
            use_bias=False,
            pad_mode=self.pad_mode,
            learnable=self.spec_learnable,
            causal=self.causal,
            mean=self.spec_means[-1],
            std=self.spec_stds[-1],
            res_scale=self.res_scale,
            zero_init=self.zero_init,
            inout_norm=self.inout_norm,
            name="spec_post",
        )(x, wav)

        # conv_post (reference seanet.py:797-828)
        x = act(x)
        x = SConv1d(
            features=mult * self.n_filters,
            kernel_size=self.last_kernel_size,
            groups=mult * self.n_filters,
            norm=self.norm,
            norm_kwargs=norm_params,
            causal=self.causal,
            pad_mode=self.pad_mode,
            use_bias=False,
            nonlinearity="relu",
            name="post_dw",
        )(x)
        # NOTE: with l2norm the reference draws this bias from N(0,1) to avoid
        # gradient explosion on silent audio (reference seanet.py:825-828) —
        # and crashes if bias=False; here the bias is forced on instead.
        proj_bias = self.use_bias or self.l2norm
        x = _ProjConv(
            features=self.dimension,
            norm=self.norm,
            norm_params=norm_params,
            use_bias=proj_bias,
            normal_bias=self.l2norm,
            name="post_proj",
        )(x)
        if self.l2norm:
            x = L2Norm(inout_norm=self.inout_norm, name="l2norm")(x)
        return x


class _ProjConv(nn.Module):
    """1x1 projection whose bias can be drawn from N(0,1) (l2norm case)."""

    features: int
    norm: str
    norm_params: Dict[str, Any]
    use_bias: bool
    normal_bias: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = SConv1d(
            features=self.features,
            kernel_size=1,
            norm=self.norm,
            norm_kwargs=self.norm_params,
            use_bias=False,
            name="conv",
        )(x)
        if self.use_bias:
            init = (
                nn.initializers.normal(stddev=1.0)
                if self.normal_bias
                else nn.initializers.zeros
            )
            b = self.param("b", init, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class SEANetDecoder(nn.Module):
    """SEANet decoder: latent -> waveform (reference seanet.py:979-1227).

    Input  : latent ``[B, T', dimension]``
    Output : audio ``[B, T' * prod(ratios), channels]``
    """

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    activation: str = "ELU"
    activation_params: Dict[str, Any] = None
    norm: str = "weight_norm"
    norm_params: Dict[str, Any] = None
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    skip: str = "1x1"
    causal: bool = False
    pad_mode: str = "constant"
    trim_right_ratio: float = 1.0
    final_activation: Optional[str] = None
    final_activation_params: Optional[Dict[str, Any]] = None
    act_all: bool = False
    expansion: int = 1
    groups: int = -1
    use_bias: bool = True
    res_scale: Optional[float] = None
    wav_std: float = DEFAULT_WAV_STD
    zero_init: bool = True
    inout_norm: bool = True

    @property
    def hop_length(self) -> int:
        return int(np.prod(list(self.ratios)))

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation, self.activation_params or {"alpha": 1.0})
        norm_params = self.norm_params or {}
        mult = int(2 ** len(list(self.ratios)))
        x = SConv1d(
            features=mult * self.n_filters,
            kernel_size=1,
            norm=self.norm,
            norm_kwargs=norm_params,
            use_bias=False,
            name="conv_in",
        )(z)
        x = SConv1d(
            features=mult * self.n_filters,
            kernel_size=self.kernel_size,
            groups=mult * self.n_filters,
            norm=self.norm,
            norm_kwargs=norm_params,
            causal=self.causal,
            pad_mode=self.pad_mode,
            use_bias=self.use_bias,
            name="conv_in_dw",
        )(x)

        for i, ratio in enumerate(list(self.ratios)):
            dim = mult * self.n_filters
            if i > 0 and self.res_scale is not None:
                x = x * (1.0 + self.n_residual_layers * self.res_scale**2) ** -0.5
            x = act(x)
            x = SConvTranspose1d(
                features=dim,
                kernel_size=ratio * 2,
                stride=ratio,
                groups=dim,
                norm=self.norm,
                norm_kwargs=norm_params,
                causal=self.causal,
                trim_right_ratio=self.trim_right_ratio,
                use_bias=False,
                nonlinearity="relu",
                name=f"up_{i}_dw",
            )(x)
            x = SConv1d(
                features=dim // 2,
                kernel_size=1,
                norm=self.norm,
                norm_kwargs=norm_params,
                use_bias=self.use_bias,
                name=f"up_{i}_proj",
            )(x)
            x = _apply_resblock_chain(self, [
                SEANetResnetBlock(
                    dim=dim // 2,
                    kernel_size=self.residual_kernel_size,
                    dilations=(self.dilation_base**j, 1),
                    activation=self.activation,
                    activation_params=self.activation_params,
                    norm=self.norm,
                    norm_params=norm_params,
                    causal=self.causal,
                    pad_mode=self.pad_mode,
                    skip=self.skip,
                    act_all=self.act_all,
                    expansion=self.expansion,
                    groups=self.groups,
                    use_bias=self.use_bias,
                    res_scale=self.res_scale,
                    idx=j,
                    zero_init=self.zero_init,
                    name=f"block_{i}_{j}",
                )
                for j in range(self.n_residual_layers)
            ], x)
            mult //= 2

        if self.res_scale is not None:
            x = x * (1.0 + self.n_residual_layers * self.res_scale**2) ** -0.5
        x = act(x)
        x = SConv1d(
            features=self.channels,
            kernel_size=self.last_kernel_size,
            norm=self.norm,
            norm_kwargs=norm_params,
            causal=self.causal,
            pad_mode=self.pad_mode,
            use_bias=self.use_bias,
            nonlinearity="relu",
            name="conv_out",
        )(x)
        if self.inout_norm:
            x = x * self.wav_std
        if self.final_activation is not None:
            final_act = get_activation(
                self.final_activation, self.final_activation_params or {}
            )
            x = final_act(x)
        return x
