"""Pallas fused-resblock kernel tests (interpret mode on the CPU mesh):
forward parity with the XLA path, gradient correctness via the custom vjp,
and the eligibility/VMEM gating logic."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import waveverify_tpu.ops.pallas_kernels as pk
from waveverify_tpu.modules.seanet import SEANetResnetBlock


@pytest.fixture(autouse=True)
def _reset_mode():
    layout = pk._PALLAS_LAYOUT
    yield
    pk.set_pallas_mode("auto")
    pk.set_pallas_layout(layout)


def _block(dim=16, k=5, res_scale=0.577, idx=1, bias=True):
    return SEANetResnetBlock(
        dim=dim, kernel_size=k, dilations=(1, 1), activation="ELU",
        activation_params={"alpha": 1.0}, norm="weight_norm", causal=True,
        skip="identity", act_all=False, expansion=1, groups=-1,
        use_bias=bias, res_scale=res_scale, idx=idx, zero_init=False,
    )


def test_fused_resblock_matches_xla_path():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 64, 16).astype(np.float32) * 0.3)
    m = _block()
    params = m.init(jax.random.PRNGKey(0), x)

    pk.set_pallas_mode("off")
    y_xla = np.asarray(m.apply(params, x))

    # interpret-mode pallas (no TPU in CI); patch the forward to interpret
    orig = pk._pallas_forward
    try:
        pk.make_fused_resblock.cache_clear()
        pk._pallas_forward = lambda *a, interpret, **kw: orig(
            *a, interpret=True, **kw
        )
        pk.set_pallas_mode("on")
        y_pallas = np.asarray(m.apply(params, x))
    finally:
        pk._pallas_forward = orig
        pk.make_fused_resblock.cache_clear()

    np.testing.assert_allclose(y_pallas, y_xla, atol=2e-5, rtol=1e-5)
    assert not np.allclose(y_pallas, np.asarray(x))  # block actually did work


def test_fused_resblock_gradients_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 48, 8).astype(np.float32) * 0.3)
    m = _block(dim=8)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x, mode):
        pk.set_pallas_mode(mode)
        try:
            return jnp.sum(jnp.square(m.apply(p, x)))
        finally:
            pk.set_pallas_mode("off")

    g_xla = jax.grad(lambda p: loss(p, x, "off"))(params)

    orig = pk._pallas_forward
    try:
        pk.make_fused_resblock.cache_clear()
        pk._pallas_forward = lambda *a, interpret, **kw: orig(
            *a, interpret=True, **kw
        )
        g_pal = jax.grad(lambda p: loss(p, x, "on"))(params)
    finally:
        pk._pallas_forward = orig
        pk.make_fused_resblock.cache_clear()

    for a, b in zip(jax.tree_util.tree_leaves(g_xla),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_causal_dw_semantics():
    # out[t] = sum_j w[j] * u[t - (k-1-j)], zero history
    u = jnp.asarray(np.arange(1, 7, dtype=np.float32).reshape(6, 1))
    w = jnp.asarray(np.array([[1.0], [10.0], [100.0]], np.float32))
    b = jnp.zeros((1,), jnp.float32)
    y = np.asarray(pk._causal_dw(u, w, b, k=3, dilation=1))[:, 0]
    # t=0: 100*1; t=1: 100*2 + 10*1; t=2: 100*3 + 10*2 + 1*1
    np.testing.assert_allclose(y[:3], [100.0, 210.0, 321.0])


def test_can_fuse_limits():
    # every shipped-config block shape (encoder + decoder scales) must fuse
    for t, c in [(16000, 64), (8000, 128), (2000, 256), (400, 512),
                 (400, 768), (2000, 384), (8000, 192), (16000, 96)]:
        assert pk.can_fuse(t, c, 5), (t, c)
        t_tile = pk.choose_t_tile(t, c, 5)
        assert t % t_tile == 0
        assert pk._tile_bytes(t_tile, c, 8) <= pk.VMEM_BUDGET_BYTES
    assert not pk.can_fuse(50, 1536, 5)  # decoder scale0: weights too big
    assert not pk.can_fuse(16000, 1024, 5)
    # prime T that can't tile under budget falls back
    assert pk.choose_t_tile(15013, 512, 5) is None


def test_tiled_kernel_matches_single_tile():
    """Tiling with halos must be invisible: compare a T that tiles (grid
    n_t > 1) against the XLA reference."""
    rng = np.random.RandomState(7)
    c, k = 64, 5
    t = 4096  # with the test budget below -> multiple tiles
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32) * 0.3)
    pw1 = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    dw1 = jnp.asarray(rng.randn(k, c).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    pw2 = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    dw2 = jnp.asarray(rng.randn(k, c).astype(np.float32) * 0.3)
    b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    statics = dict(k=k, d1=1, d2=1, prescale=0.9, res_scale=0.577, alpha=1.0)
    chain_statics = dict(k=k, d1=1, d2=1, prescales=(0.9,), res_scale=0.577,
                         alpha=1.0)
    y_ref = np.asarray(pk._resblock_xla(x, pw1, dw1, b1, pw2, dw2, b2,
                                        **statics))
    budget = pk.VMEM_BUDGET_BYTES
    try:
        pk.VMEM_BUDGET_BYTES = 1 * 1024 * 1024  # force n_t = 8 tiles
        assert pk.choose_t_tile(t, c, k) < t
        y_tiled = np.asarray(pk._pallas_forward(
            x, pw1[None], dw1[None], b1[None], pw2[None], dw2[None],
            b2[None], interpret=True, **chain_statics
        ))
    finally:
        pk.VMEM_BUDGET_BYTES = budget
    np.testing.assert_allclose(y_tiled, y_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("layout", ["btc", "tbc"])
def test_layout_variants_match_xla_multi_tile(layout):
    """Both kernel data layouts (docs/SERVING_PERF.md Lever 2) must produce
    identical results under multi-tile grids, including a batch that is not
    a sublane multiple."""
    rng = np.random.RandomState(11)
    c, k, t, b = 32, 5, 512, 3  # b=3: not a multiple of 8
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.3)
    ws = [jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
          for s in [(c, c), (k, c), (c,), (c, c), (k, c), (c,)]]
    statics = dict(k=k, d1=1, d2=1, prescale=0.9, res_scale=0.577, alpha=1.0)
    chain_statics = dict(k=k, d1=1, d2=1, prescales=(0.9,), res_scale=0.577,
                         alpha=1.0)
    y_ref = np.asarray(pk._resblock_xla(x, *ws, **statics))

    budget = pk.VMEM_BUDGET_BYTES
    budget_tbc = pk.VMEM_BUDGET_BYTES_TBC
    try:
        pk.VMEM_BUDGET_BYTES = 1024 * 1024  # force several tiles
        pk.VMEM_BUDGET_BYTES_TBC = 1024 * 1024
        pk.set_pallas_layout(layout)
        if layout == "tbc":
            tt = pk.choose_t_tile_tbc(t, b, c, k)
            assert tt is not None and tt < t  # actually tiled
        y = np.asarray(pk._pallas_forward(*(x,) + tuple(w[None] for w in ws),
                                          interpret=True, **chain_statics))
    finally:
        pk.VMEM_BUDGET_BYTES = budget
        pk.VMEM_BUDGET_BYTES_TBC = budget_tbc
    np.testing.assert_allclose(y, y_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("layout", ["btc", "tbc"])
@pytest.mark.parametrize("m", [2, 3])
def test_fused_chain_matches_sequential(layout, m):
    """The M-block chain kernel must equal M sequential single blocks
    (with per-idx prescales), across layouts and tile counts."""
    rng = np.random.RandomState(5)
    c, k, t, b = 32, 5, 512, 2
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.3)
    res_scale = 0.577
    slots, prescales = [], []
    for i in range(m):
        slots.append(tuple(
            jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
            for s in [(c, c), (k, c), (c,), (c, c), (k, c), (c,)]))
        prescales.append((1.0 + i * res_scale**2) ** -0.5)

    # sequential single-block XLA reference
    y_ref = x
    for slot, ps in zip(slots, prescales):
        y_ref = pk._resblock_xla(y_ref, *slot, k=k, d1=1, d2=1, prescale=ps,
                                 res_scale=res_scale, alpha=1.0)
    y_ref = np.asarray(y_ref)

    budget = pk.VMEM_BUDGET_BYTES
    budget_tbc = pk.VMEM_BUDGET_BYTES_TBC
    orig = pk._pallas_forward
    try:
        pk.VMEM_BUDGET_BYTES = 1024 * 1024  # force several tiles
        pk.VMEM_BUDGET_BYTES_TBC = 1024 * 1024
        pk.set_pallas_layout(layout)
        pk.make_fused_resblock.cache_clear()
        pk._pallas_forward = lambda *a, interpret, **kw: orig(
            *a, interpret=True, **kw)
        y = np.asarray(pk.fused_resblock_chain(
            x, slots, k=k, dilations=(1, 1), prescales=tuple(prescales),
            res_scale=res_scale, alpha=1.0))
    finally:
        pk.VMEM_BUDGET_BYTES = budget
        pk.VMEM_BUDGET_BYTES_TBC = budget_tbc
        pk._pallas_forward = orig
        pk.make_fused_resblock.cache_clear()
    np.testing.assert_allclose(y, y_ref, atol=3e-5, rtol=1e-5)


def test_fused_chain_gradients_match():
    """custom_vjp backward of the chain equals autodiff through the
    sequential XLA blocks."""
    rng = np.random.RandomState(9)
    c, k, t, b, m = 16, 5, 128, 2, 2
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.3)
    res_scale = 0.577
    slots = [tuple(jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
                   for s in [(c, c), (k, c), (c,), (c, c), (k, c), (c,)])
             for _ in range(m)]
    prescales = tuple((1.0 + i * res_scale**2) ** -0.5 for i in range(m))

    def seq_loss(x, slots):
        y = x
        for slot, ps in zip(slots, prescales):
            y = pk._resblock_xla(y, *slot, k=k, d1=1, d2=1, prescale=ps,
                                 res_scale=res_scale, alpha=1.0)
        return jnp.sum(jnp.square(y))

    g_ref = jax.grad(seq_loss, argnums=(0, 1))(x, slots)

    orig = pk._pallas_forward
    try:
        pk.make_fused_resblock.cache_clear()
        pk._pallas_forward = lambda *a, interpret, **kw: orig(
            *a, interpret=True, **kw)

        def chain_loss(x, slots):
            y = pk.fused_resblock_chain(
                x, slots, k=k, dilations=(1, 1), prescales=prescales,
                res_scale=res_scale, alpha=1.0)
            return jnp.sum(jnp.square(y))

        g_chain = jax.grad(chain_loss, argnums=(0, 1))(x, slots)
    finally:
        pk._pallas_forward = orig
        pk.make_fused_resblock.cache_clear()
    for a, bb in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(g_chain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=2e-4, rtol=1e-4)


def test_tbc_falls_back_to_btc_tiling():
    """When the whole-batch [t_tile, B, C] slab cannot fit VMEM (huge B),
    the tbc layout must fall back to the per-sample btc tiling, not XLA."""
    assert pk.choose_t_tile_tbc(16000, 4096, 64, 5) is None
    assert pk.choose_t_tile(16000, 64, 5) is not None


def test_pallas_layout_switch():
    pk.set_pallas_layout("btc")
    assert pk._PALLAS_LAYOUT == "btc"
    pk.set_pallas_layout("tbc")
    with pytest.raises(ValueError):
        pk.set_pallas_layout("ctb")


def test_eligibility_gating():
    x = jnp.zeros((1, 32, 8), jnp.float32)
    # non-causal block must not take the fused path (returns None)
    m = SEANetResnetBlock(dim=8, kernel_size=5, dilations=(1, 1),
                          causal=False, skip="identity", act_all=False,
                          norm="weight_norm", use_bias=True, res_scale=0.5,
                          zero_init=False)
    p = m.init(jax.random.PRNGKey(0), x)
    bound = m.bind(p)
    assert bound._fused_params() is None
    # shipped-config-shaped block is eligible
    m2 = _block(dim=8)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.bind(p2)._fused_params() is not None


def test_pallas_mode_switch():
    pk.set_pallas_mode("off")
    assert not pk.pallas_enabled()
    pk.set_pallas_mode("on")
    assert pk.pallas_enabled()
    with pytest.raises(ValueError):
        pk.set_pallas_mode("sometimes")


def test_fused_resblock_bf16_inputs():
    """bf16 serving path: the kernel takes bf16 loads, computes
    f32-internally (Mosaic bf16-cmpf limitation), and returns bf16 that
    tracks the f32 result within bf16 tolerance."""
    rng = np.random.RandomState(2)
    x32 = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32) * 0.3)
    m = _block()
    params = m.init(jax.random.PRNGKey(0), x32)

    pk.set_pallas_mode("off")
    y_ref = np.asarray(m.apply(params, x32))

    orig = pk._pallas_forward
    try:
        pk.make_fused_resblock.cache_clear()
        pk._pallas_forward = lambda *a, interpret, **kw: orig(
            *a, interpret=True, **kw
        )
        pk.set_pallas_mode("on")
        y16 = np.asarray(m.apply(params, x32.astype(jnp.bfloat16)))
    finally:
        pk._pallas_forward = orig
        pk.make_fused_resblock.cache_clear()

    assert y16.dtype == jnp.bfloat16
    # bf16 mantissa ~ 8 bits: tolerance scales with output magnitude
    scale = np.abs(y_ref).max()
    assert np.abs(y16.astype(np.float32) - y_ref).max() < 0.02 * scale + 1e-3
