"""Pallas TPU kernels for the hot SEANet path.

The SEANet residual block (reference modules/seanet.py:123-281; shipped
config: ELU -> 1x1 conv -> causal depthwise k=5 -> ELU -> 1x1 -> depthwise,
identity skip) is bandwidth-bound: its six intermediate [B, T, C] tensors
each round-trip HBM under plain XLA fusion. This kernel keeps a [T_tile, C]
activation slab resident in VMEM across the entire block — HBM traffic
drops to one read of x, one write of the output, plus weights.

Tiling: grid (B, T // t_tile). Causality makes halos one-directional — a
tile only needs ``2*(k-1)`` rows of *history*, which it reads from the
previous tile by passing x a second time with a shifted index map (tile 0's
halo is zeroed, exactly the causal zero-pad of SConv1d, reference
modules/conv.py:739-745). t_tile is chosen so ~8 live [t_tile, C] f32
temporaries (measured Mosaic stack behavior) fit the VMEM budget.

The 1x1 convs are MXU matmuls (`jnp.dot` with f32 accumulation); the causal
depthwise convs are k shifted multiply-adds on the VPU. ELU is written as
exp(x)-1 (no Pallas TPU lowering exists for expm1).

Gradients: `jax.custom_vjp` whose backward re-derives the block with plain
XLA ops (`jax.vjp` over identical math), so training through fused blocks is
exact; the Pallas body only ever runs forward.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

# Global switch: pallas kernels default ON for TPU backends, OFF elsewhere
# (CPU tests exercise the kernel explicitly via interpret mode).
# WAVEVERIFY_PALLAS=auto|on|off overrides without code changes.
import os as _os

_PALLAS_MODE = _os.environ.get("WAVEVERIFY_PALLAS", "auto")
if _PALLAS_MODE not in ("auto", "on", "off"):  # pragma: no cover
    _PALLAS_MODE = "auto"

# Kernel data layout (docs/SERVING_PERF.md Lever 2). "btc": grid (B, T/t),
# [t_tile, C] slabs — the r3 kernel. "tbc": the array is passed as
# [T, B, C], whose DEFAULT custom-call layout {2,1,0} is bit-identical to
# the {2,0,1} physical layout XLA picks for the surrounding matmul fusions
# on [B, T, C] — so the 1.5-1.6 ms transpose copies at each custom-call
# edge (13.6% of serving device time in the r3 trace) become layout no-ops,
# and the depthwise shifts vectorize across the whole batch inside one
# program. Selected by measurement; both numerically identical.
_PALLAS_LAYOUT = _os.environ.get("WAVEVERIFY_PALLAS_LAYOUT", "tbc")
if _PALLAS_LAYOUT not in ("btc", "tbc"):  # pragma: no cover
    _PALLAS_LAYOUT = "tbc"

MAX_FUSED_CHANNELS = 768
# VMEM budget for one program's working set. Mosaic's stack allocator keeps
# ~8 live [t_tile, C] f32 temporaries for this block (measured: 31.25 M
# requested for a full [16000, 64] tile).
VMEM_BUDGET_BYTES = 10 * 1024 * 1024
# The tbc kernel's slabs carry the whole batch ([t_tile, B, C]); under the
# btc budget a serving batch of 64 would shrink t_tile below the chain
# halo's size (t_tile 20 vs halo 16 = 44% recompute overhead). v5e has
# 128 MB VMEM per core; a larger budget keeps the halo share small while
# leaving ample headroom over the ~8-live-temps estimate.
VMEM_BUDGET_BYTES_TBC = 32 * 1024 * 1024
# Mosaic's default scoped-vmem (kernel stack) limit is 16 MB — well under
# the 128 MB physical VMEM; the tbc kernels' whole-batch slabs need more
# (measured: a [25+16, 64, 256] bf16 chain program requests 16.7 MB).
# Passed to pallas_call via CompilerParams(vmem_limit_bytes=...).
VMEM_LIMIT_BYTES = 100 * 1024 * 1024
_LIVE_TEMPS = 8


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"invalid pallas mode: {mode}")
    _PALLAS_MODE = mode


def set_pallas_layout(layout: str) -> None:
    global _PALLAS_LAYOUT
    if layout not in ("btc", "tbc"):
        raise ValueError(f"invalid pallas layout: {layout}")
    _PALLAS_LAYOUT = layout


def pallas_enabled() -> bool:
    if not _HAVE_PALLAS or _PALLAS_MODE == "off":
        return False
    if _PALLAS_MODE == "on":
        return True
    try:
        # a `with jax.default_device(cpu)` context (e.g. bench.py's host
        # baseline on a TPU-attached host) must lower without pallas
        dd = jax.config.jax_default_device
        if dd is not None:
            # jax accepts either a Device or a platform string here
            platform = dd if isinstance(dd, str) else getattr(dd, "platform", None)
            return platform == "tpu"
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _tile_bytes(t_tile: int, c: int, halo: int, m: int = 1) -> int:
    # VMEM tiles are (8, 128): channels pad up to a lane multiple (a [T, 32]
    # f32 buffer occupies 4x its logical size) and rows pad up to 8
    c_eff = -(-c // 128) * 128
    rows = -(-(t_tile + halo) // 8) * 8
    return _LIVE_TEMPS * rows * c_eff * 4 + m * 2 * c_eff * c * 4


def choose_t_tile(t: int, c: int, k: int, m: int = 1) -> Optional[int]:
    """Largest divisor tiling of T that fits the VMEM budget (None: can't
    fuse). Tiles must cover the halo (m blocks x 2*(k-1) rows of history)."""
    if c > MAX_FUSED_CHANNELS:
        return None
    halo = m * 2 * (k - 1)
    for n in range(1, 65):
        if t % n:
            continue
        t_tile = t // n
        if t_tile < halo:
            return None
        # Mosaic: the sublane (second-to-last) block dim must be divisible
        # by 8 unless the block spans the full dimension
        if t_tile != t and t_tile % 8:
            continue
        if _tile_bytes(t_tile, c, halo, m) <= VMEM_BUDGET_BYTES:
            return t_tile
    return None


def can_fuse(t: int, c: int, k: int, m: int = 1) -> bool:
    return choose_t_tile(t, c, k, m) is not None


def _elu(x: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """ELU without expm1 (no Pallas TPU lowering); exp(x)-1 differs from
    expm1 only below f32 noise for activation magnitudes."""
    return jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


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


def _block_core(xx, pw1, dw1, b1, pw2, dw2, b2, *, k, d1, d2, prescale,
                alpha, dot):
    """The block chain WITHOUT the residual add: xx [T', C] -> [T', C].
    Entries of xx before the true start of time must be zero (causal pad)."""
    y = _elu(xx * prescale, alpha)
    y = dot(y, pw1)
    y = _causal_dw(y, dw1, b1, k, d1)
    y = _elu(y, alpha)
    y = dot(y, pw2)
    y = _causal_dw(y, dw2, b2, k, d2)
    return y


def _resblock_chain_xla(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s, *, k, d1, d2,
                        prescales, res_scale, alpha):
    """Plain-XLA reference: M chained residual blocks over [B, T, C]
    (differentiable). Weights carry a leading [M] axis; ``prescales`` is a
    static length-M tuple (per-block 1/sqrt(1 + idx * res_scale^2))."""
    def dot(a, w):
        return jnp.dot(a, w, precision=jax.lax.Precision.DEFAULT)

    def one(xb):
        for i, ps in enumerate(prescales):
            y = _block_core(xb, pw1s[i], dw1s[i], b1s[i], pw2s[i], dw2s[i],
                            b2s[i], k=k, d1=d1, d2=d2, prescale=ps,
                            alpha=alpha, dot=dot)
            xb = y * res_scale + xb
        return xb

    return jax.vmap(one)(x)


def _resblock_xla(x, pw1, dw1, b1, pw2, dw2, b2, *, k, d1, d2, prescale,
                  res_scale, alpha):
    """Single-block convenience wrapper over :func:`_resblock_chain_xla`."""
    return _resblock_chain_xla(
        x, pw1[None], dw1[None], b1[None], pw2[None], dw2[None], b2[None],
        k=k, d1=d1, d2=d2, prescales=(prescale,), res_scale=res_scale,
        alpha=alpha)


def _resblock_kernel(xm_ref, xp_ref, pw1_ref, dw1_ref, b1_ref, pw2_ref,
                     dw2_ref, b2_ref, out_ref, *, k, d1, d2, prescales,
                     res_scale, alpha, halo):
    """M chained blocks, grid (B, T/t_tile), [t_tile, C] slabs. Fusing the
    chain (encoder scales run 2-3 identical-shape blocks back to back)
    halves the pair's HBM traffic vs one kernel per block: one read of x +
    one write of the output covers the whole chain."""
    def dot(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    j = pl.program_id(1)
    # bf16 serving: refs may be bf16 (halved HBM<->VMEM transfer); ALL
    # in-kernel arithmetic upcasts to f32 — Mosaic on this target cannot
    # lower bf16 vector comparisons (the ELU/where cmpf), and f32
    # accumulation is wanted anyway. Stores downcast at out_ref.
    f32 = jnp.float32
    xm = xm_ref[0].astype(f32)  # [t_tile, C] current tile
    # history: last `halo` rows of the previous tile; zeros for tile 0
    # (== SConv1d's causal zero padding at the sequence start). halo covers
    # the WHOLE chain (M x 2(k-1) rows): block i+1's tail needs block i's
    # output over its own receptive field, recomputed here from the shared
    # history instead of round-tripping HBM between blocks.
    hist = xp_ref[0, -halo:, :].astype(f32)
    hist = jnp.where(j == 0, jnp.zeros_like(hist), hist)
    xx = jnp.concatenate([hist, xm], axis=0)  # [halo + t_tile, C]
    row = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 0)
    pad_rows = (j == 0) & (row < halo)  # tile 0: causal zero-pad rows

    for i, ps in enumerate(prescales):
        u = _elu(xx * ps, alpha)
        u = dot(u, pw1_ref[i].astype(f32))  # pw has no bias: zeros stay 0
        u = _causal_dw(u, dw1_ref[i].astype(f32), b1_ref[i].astype(f32),
                       k, d1)
        # the dw biases leak into the t<0 zero-pad rows of tile 0; the next
        # op's true input there is zero — mask after every bias add
        u = jnp.where(pad_rows, jnp.zeros_like(u), u)
        u = _elu(u, alpha)
        u = dot(u, pw2_ref[i].astype(f32))
        u = _causal_dw(u, dw2_ref[i].astype(f32), b2_ref[i].astype(f32),
                       k, d2)
        xx = u * res_scale + xx
        xx = jnp.where(pad_rows, jnp.zeros_like(xx), xx)
    out_ref[0] = xx[halo:].astype(out_ref.dtype)


def _tile_bytes_tbc(t_tile: int, b: int, c: int, halo: int,
                    m: int = 1) -> int:
    # [t_tile, B, C] slabs: the (8, 128) VMEM tiling applies to the minor
    # (B, C) pair — B pads to a sublane multiple, C to a lane multiple; the
    # major T dim has no padding or divisibility constraint.
    c_eff = -(-c // 128) * 128
    b_eff = -(-b // 8) * 8
    return (_LIVE_TEMPS * (t_tile + halo) * b_eff * c_eff * 4
            + m * 2 * c_eff * c * 4)


def choose_t_tile_tbc(t: int, b: int, c: int, k: int,
                      m: int = 1) -> Optional[int]:
    """Largest divisor tiling of T for the [T, B, C] kernel (None: can't
    fuse this way). The whole batch lives in each program, so rows cost
    B x more VMEM than the btc kernel's but need no sublane rounding."""
    if c > MAX_FUSED_CHANNELS:
        return None
    halo = m * 2 * (k - 1)
    for n in range(1, 2049):
        if t % n:
            continue
        t_tile = t // n
        if t_tile < halo:
            return None
        if _tile_bytes_tbc(t_tile, b, c, halo, m) <= VMEM_BUDGET_BYTES_TBC:
            return t_tile
    return None


def _resblock_kernel_tbc(xm_ref, xp_ref, pw1_ref, dw1_ref, b1_ref, pw2_ref,
                         dw2_ref, b2_ref, out_ref, *, k, d1, d2, prescales,
                         res_scale, alpha, halo):
    """[T, B, C] variant of the chained kernel: one program owns a
    [t_tile, B, C] slab — the depthwise shifts slide whole [B, C] planes
    and the 1x1 matmuls contract [t x B, C] rows. Same math as
    _resblock_kernel."""
    f32 = jnp.float32
    j = pl.program_id(0)
    xm = xm_ref[...].astype(f32)  # [t_tile, B, C]
    hist = xp_ref[-halo:].astype(f32)
    hist = jnp.where(j == 0, jnp.zeros_like(hist), hist)
    xx = jnp.concatenate([hist, xm], axis=0)  # [halo + t_tile, B, C]
    tp, bb, c = xx.shape
    row = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 0)
    pad_rows = (j == 0) & (row < halo)

    def dot(a, w):
        # collapse (T, B) into matmul rows; Mosaic keeps the (B, C)-tiled
        # registers in place (B is a sublane multiple or pads once)
        return jnp.dot(a.reshape(tp * bb, c), w,
                       preferred_element_type=f32).reshape(tp, bb, c)

    def dw(u, w, bias, dilation):
        acc = u * w[k - 1][None, None, :]
        for jj in range(k - 1):
            shift = (k - 1 - jj) * dilation
            shifted = jnp.pad(u, ((shift, 0), (0, 0), (0, 0)))[:tp]
            acc = acc + shifted * w[jj][None, None, :]
        return acc + bias[None, None, :]

    for i, ps in enumerate(prescales):
        u = _elu(xx * ps, alpha)
        u = dot(u, pw1_ref[i].astype(f32))
        u = dw(u, dw1_ref[i].astype(f32), b1_ref[i].astype(f32), d1)
        u = jnp.where(pad_rows, jnp.zeros_like(u), u)
        u = _elu(u, alpha)
        u = dot(u, pw2_ref[i].astype(f32))
        u = dw(u, dw2_ref[i].astype(f32), b2_ref[i].astype(f32), d2)
        xx = u * res_scale + xx
        xx = jnp.where(pad_rows, jnp.zeros_like(xx), xx)
    out_ref[...] = xx[halo:].astype(out_ref.dtype)


def _chain_cost(b, t, c, k, m):
    return pl.CostEstimate(
        flops=m * 2 * b * t * c * (2 * c + 2 * k),
        bytes_accessed=4 * (2 * b * t * c + m * 2 * c * c),
        transcendentals=m * 2 * b * t * c,  # ELU exps
    )


def _pallas_forward_tbc(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s, *, k, d1, d2,
                        prescales, res_scale, alpha, interpret, t_tile):
    """x [B, T, C] -> transpose to [T, B, C] (a layout NO-OP against XLA's
    preferred {2,0,1} physical layout) -> tiled chain kernel over T."""
    b, t, c = x.shape
    m = len(prescales)
    halo = m * ((k - 1) * d1 + (k - 1) * d2)
    n_t = t // t_tile
    kern = functools.partial(
        _resblock_kernel_tbc, k=k, d1=d1, d2=d2, prescales=prescales,
        res_scale=res_scale, alpha=alpha, halo=halo,
    )
    x_tbc = jnp.transpose(x, (1, 0, 2))  # [T, B, C]
    tile = pl.BlockSpec((t_tile, b, c), lambda j: (j, 0, 0),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((t_tile, b, c),
                        lambda j: (jnp.maximum(j - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(n_t,),
        out_shape=jax.ShapeDtypeStruct((t, b, c), x.dtype),
        in_specs=[
            tile, prev,
            full((m, c, c)), full((m, k, c)), full((m, c)),
            full((m, c, c)), full((m, k, c)), full((m, c)),
        ],
        out_specs=tile,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES) if _HAVE_PALLAS else None,
        cost_estimate=_chain_cost(b, t, c, k, m),
    )(x_tbc, x_tbc, pw1s, dw1s, b1s, pw2s, dw2s, b2s)
    return jnp.transpose(out, (1, 0, 2))


def _pallas_forward(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s, *, k, d1, d2,
                    prescales, res_scale, alpha, interpret):
    """Chain forward over [B, T, C]; weights carry a leading [M] axis."""
    b, t, c = x.shape
    m = len(prescales)
    halo = m * ((k - 1) * d1 + (k - 1) * d2)
    if _PALLAS_LAYOUT == "tbc":
        tt = choose_t_tile_tbc(t, b, c, k, m)
        if tt is not None:
            return _pallas_forward_tbc(
                x, pw1s, dw1s, b1s, pw2s, dw2s, b2s, k=k, d1=d1, d2=d2,
                prescales=prescales, res_scale=res_scale, alpha=alpha,
                interpret=interpret, t_tile=tt)
        # fall through to the btc tiling, then XLA
    t_tile = choose_t_tile(t, c, k, m)
    if t_tile is None:
        return _resblock_chain_xla(
            x, pw1s, dw1s, b1s, pw2s, dw2s, b2s, k=k, d1=d1, d2=d2,
            prescales=prescales, res_scale=res_scale, alpha=alpha)
    n_t = t // t_tile
    kern = functools.partial(
        _resblock_kernel, k=k, d1=d1, d2=d2, prescales=prescales,
        res_scale=res_scale, alpha=alpha, halo=halo,
    )
    tile = pl.BlockSpec((1, t_tile, c), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    prev = pl.BlockSpec(
        (1, t_tile, c),
        lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b, n_t),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        in_specs=[
            tile, prev,
            full((m, c, c)), full((m, k, c)), full((m, c)),
            full((m, c, c)), full((m, k, c)), full((m, c)),
        ],
        out_specs=tile,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES) if _HAVE_PALLAS else None,
        cost_estimate=_chain_cost(b, t, c, k, m),
    )(x, x, pw1s, dw1s, b1s, pw2s, dw2s, b2s)


@functools.lru_cache(maxsize=None)
def make_fused_resblock_chain(k: int, d1: int, d2: int,
                              prescales: Tuple[float, ...],
                              res_scale: float, alpha: float,
                              interpret: bool = False):
    """Build (and cache) the custom-vjp fused residual-block CHAIN for a
    static (k, dilations, prescales, scales) signature; M = len(prescales).

    fn(x [B,T,C], pw1s [M,C,C], dw1s [M,k,C], b1s [M,C], pw2s, dw2s, b2s)
      -> [B,T,C]
    """
    statics = dict(k=k, d1=d1, d2=d2, prescales=tuple(prescales),
                   res_scale=res_scale, alpha=alpha)

    @jax.custom_vjp
    def fused(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s):
        return _pallas_forward(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s,
                               interpret=interpret, **statics)

    def fwd(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s):
        out = fused(x, pw1s, dw1s, b1s, pw2s, dw2s, b2s)
        return out, (x, pw1s, dw1s, b1s, pw2s, dw2s, b2s)

    def bwd(residuals, g):
        # exact gradients by re-deriving the identical math in XLA
        _, vjp = jax.vjp(
            lambda *a: _resblock_chain_xla(*a, **statics), *residuals
        )
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def make_fused_resblock(k: int, d1: int, d2: int, prescale: float,
                        res_scale: float, alpha: float,
                        interpret: bool = False):
    """Single-block compatibility wrapper over the chain builder."""
    chain = make_fused_resblock_chain(k, d1, d2, (float(prescale),),
                                      float(res_scale), float(alpha),
                                      interpret)

    def fused(x, pw1, dw1, b1, pw2, dw2, b2):
        return chain(x, pw1[None], dw1[None], b1[None],
                     pw2[None], dw2[None], b2[None])

    return fused


# compatibility: callers (tests) clear the kernel cache through the old name
make_fused_resblock.cache_clear = make_fused_resblock_chain.cache_clear


def fused_resblock(x: jnp.ndarray, pw1, dw1, b1, pw2, dw2, b2, *, k: int,
                   dilations: Tuple[int, int], prescale: float,
                   res_scale: float, alpha: float = 1.0,
                   interpret: bool = False) -> jnp.ndarray:
    """Public entry: one fused SEANet residual block (see module
    docstring). For adjacent identical-shape blocks prefer
    :func:`fused_resblock_chain` — one kernel per chain costs one read of
    x + one write of the output for ALL blocks."""
    return fused_resblock_chain(
        x, [(pw1, dw1, b1, pw2, dw2, b2)], k=k, dilations=dilations,
        prescales=(prescale,), res_scale=res_scale, alpha=alpha,
        interpret=interpret)


def fused_resblock_chain(x: jnp.ndarray, slots, *, k: int,
                         dilations: Tuple[int, int],
                         prescales: Tuple[float, ...],
                         res_scale: float, alpha: float = 1.0,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused chain of M residual blocks. ``slots`` is a length-M list of
    (pw1, dw1, b1, pw2, dw2, b2) weight tuples; ``prescales`` the matching
    per-block pre-scales (1/sqrt(1 + idx * res_scale^2))."""
    fn = make_fused_resblock_chain(
        k, dilations[0], dilations[1],
        tuple(float(p) for p in prescales), float(res_scale), float(alpha),
        interpret)
    # weights follow the activation dtype (bf16 serving): mixed-dtype dots
    # don't lower in Mosaic, and f32 weights would silently upcast the
    # VMEM-resident slab. NB under bf16 this QUANTIZES the weight VALUES to
    # bf16 at load (same as the non-fused path, whose conv kernels cast to
    # x.dtype) — "f32-internal" means accumulation/arithmetic only
    # (preferred_element_type in the kernel body), not full-precision
    # weights.
    stacked = [jnp.stack([jnp.asarray(s[i]).astype(x.dtype) for s in slots])
               for i in range(6)]
    return fn(x, *stacked)
