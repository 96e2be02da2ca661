"""Pallas TPU kernels for the hot SEANet path.

The SEANet residual block (reference modules/seanet.py:123-281; shipped
config: ELU -> 1x1 conv -> causal depthwise k=5 -> ELU -> 1x1 -> depthwise,
identity skip) is bandwidth-bound: its six intermediate [B, T, C] tensors
each round-trip HBM under plain XLA fusion. This kernel keeps one batch
item's whole [T, C] activation resident in VMEM across the entire block —
HBM traffic drops to one read of x, one write of the output, plus weights.

The 1x1 convs are MXU matmuls (`jnp.dot` with f32 accumulation); the causal
depthwise convs are k shifted multiply-adds on the VPU (exactly the
``(k-1)*d`` left-zero-pad semantics of SConv1d, reference modules/conv.py:
739-745).

Gradients: the kernel carries a ``jax.custom_vjp`` whose backward pass
re-derives the block with plain XLA ops (`jax.vjp` over the identical math),
so training through fused blocks is exact; the Pallas body only ever runs
forward.

Applicability (checked by ``can_fuse``): identity skip, act_all=False, two
depthwise-separable units, ELU activation, depthwise groups == channels, and
weights small enough for VMEM (C <= 768: two CxC f32 kernels + the [T, C]
tile must fit in ~16 MB).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# Global switch: pallas kernels default ON for TPU backends, OFF elsewhere
# (CPU tests exercise the kernel explicitly via interpret mode).
_PALLAS_MODE = "auto"  # "auto" | "on" | "off"

MAX_FUSED_CHANNELS = 768
MAX_FUSED_VMEM_BYTES = 12 * 1024 * 1024


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"invalid pallas mode: {mode}")
    _PALLAS_MODE = mode


def pallas_enabled() -> bool:
    if not _HAVE_PALLAS or _PALLAS_MODE == "off":
        return False
    if _PALLAS_MODE == "on":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def can_fuse(t: int, c: int, k: int) -> bool:
    """VMEM feasibility for one [T, C] tile + 2 CxC weights + dw taps."""
    if c > MAX_FUSED_CHANNELS:
        return False
    f32 = 4
    need = (3 * t * c + 2 * c * c + 2 * k * c + 2 * c) * f32
    return need <= MAX_FUSED_VMEM_BYTES


def _causal_dw(u: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, k: int,
               dilation: int) -> jnp.ndarray:
    """u [T, C], w [k, C] -> causal depthwise conv: out[t] = sum_j w[j] *
    u[t - (k-1-j)*d] (zeros for t < 0) + b."""
    t = u.shape[0]
    acc = u * w[k - 1][None, :]
    for j in range(k - 1):
        shift = (k - 1 - j) * dilation
        shifted = jnp.pad(u, ((shift, 0), (0, 0)))[:t]
        acc = acc + shifted * w[j][None, :]
    return acc + b[None, :]


def _resblock_math(x, pw1, dw1, b1, pw2, dw2, b2, *, k, d1, d2, prescale,
                   res_scale, alpha, dot):
    """Shared block math: x [T, C] -> [T, C]. ``dot`` abstracts the matmul
    so the same body serves the Pallas kernel and the XLA reference."""
    y = jax.nn.elu(x * prescale, alpha=alpha)
    y = dot(y, pw1)
    y = _causal_dw(y, dw1, b1, k, d1)
    y = jax.nn.elu(y, alpha=alpha)
    y = dot(y, pw2)
    y = _causal_dw(y, dw2, b2, k, d2)
    return y * res_scale + x


def _resblock_xla(x, pw1, dw1, b1, pw2, dw2, b2, *, k, d1, d2, prescale,
                  res_scale, alpha):
    """Plain-XLA reference implementation over [B, T, C] (differentiable)."""
    def dot(a, w):
        return jnp.dot(a, w, precision=jax.lax.Precision.DEFAULT)

    def one(xb):
        return _resblock_math(xb, pw1, dw1, b1, pw2, dw2, b2, k=k, d1=d1,
                              d2=d2, prescale=prescale, res_scale=res_scale,
                              alpha=alpha, dot=dot)

    return jax.vmap(one)(x)


def _resblock_kernel(x_ref, pw1_ref, dw1_ref, b1_ref, pw2_ref, dw2_ref,
                     b2_ref, out_ref, *, k, d1, d2, prescale, res_scale,
                     alpha):
    def dot(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    out_ref[0] = _resblock_math(
        x_ref[0], pw1_ref[:], dw1_ref[:], b1_ref[:], pw2_ref[:], dw2_ref[:],
        b2_ref[:], k=k, d1=d1, d2=d2, prescale=prescale,
        res_scale=res_scale, alpha=alpha, dot=dot,
    ).astype(out_ref.dtype)


def _pallas_forward(x, pw1, dw1, b1, pw2, dw2, b2, *, k, d1, d2, prescale,
                    res_scale, alpha, interpret):
    b, t, c = x.shape
    kern = functools.partial(
        _resblock_kernel, k=k, d1=d1, d2=d2, prescale=prescale,
        res_scale=res_scale, alpha=alpha,
    )
    item = pl.BlockSpec((1, t, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        in_specs=[
            item,
            full((c, c)), full((k, c)), full((c,)),
            full((c, c)), full((k, c)), full((c,)),
        ],
        out_specs=item,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * (2 * c + 2 * k),
            bytes_accessed=4 * (2 * b * t * c + 2 * c * c),
            transcendentals=2 * b * t * c,  # ELU exps
        ),
    )(x, pw1, dw1, b1, pw2, dw2, b2)


@functools.lru_cache(maxsize=None)
def make_fused_resblock(k: int, d1: int, d2: int, prescale: float,
                        res_scale: float, alpha: float,
                        interpret: bool = False):
    """Build (and cache) the custom-vjp fused residual block for a static
    (k, dilations, scales) signature.

    fn(x [B,T,C], pw1 [C,C], dw1 [k,C], b1 [C], pw2, dw2, b2) -> [B,T,C]
    """
    statics = dict(k=k, d1=d1, d2=d2, prescale=prescale,
                   res_scale=res_scale, alpha=alpha)

    @jax.custom_vjp
    def fused(x, pw1, dw1, b1, pw2, dw2, b2):
        return _pallas_forward(x, pw1, dw1, b1, pw2, dw2, b2,
                               interpret=interpret, **statics)

    def fwd(x, pw1, dw1, b1, pw2, dw2, b2):
        out = fused(x, pw1, dw1, b1, pw2, dw2, b2)
        return out, (x, pw1, dw1, b1, pw2, dw2, b2)

    def bwd(residuals, g):
        # exact gradients by re-deriving the identical math in XLA
        _, vjp = jax.vjp(
            lambda *a: _resblock_xla(*a, **statics), *residuals
        )
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def fused_resblock(x: jnp.ndarray, pw1, dw1, b1, pw2, dw2, b2, *, k: int,
                   dilations: Tuple[int, int], prescale: float,
                   res_scale: float, alpha: float = 1.0,
                   interpret: bool = False) -> jnp.ndarray:
    """Public entry: fused SEANet residual block (see module docstring)."""
    fn = make_fused_resblock(k, dilations[0], dilations[1], float(prescale),
                             float(res_scale), float(alpha), interpret)
    return fn(x, pw1, dw1, b1, pw2, dw2, b2)
