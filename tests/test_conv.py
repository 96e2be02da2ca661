"""Unit + golden-parity tests for the smart conv primitives.

Parity oracle: the PyTorch reference at /root/reference (modules layer only).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveverify_tpu.modules.conv import (
    CausalSTFT,
    SConv1d,
    SConvTranspose1d,
    get_extra_padding_for_conv1d,
    pad1d,
    unpad1d,
)

from tests import torch_ref


def rng(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Shape / causality invariants (reference self-checks, SURVEY §4)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("length", [1, 7, 100, 320, 1601])
@pytest.mark.parametrize("k,s,d", [(5, 1, 1), (5, 1, 4), (16, 8, 1), (4, 2, 1)])
def test_sconv1d_output_length(length, k, s, d):
    """SConv1d must emit ceil(L / stride) frames for any input length."""
    if (k - 1) * d - (s - 1) < 0:
        pytest.skip("negative padding config")
    m = SConv1d(features=3, kernel_size=k, stride=s, dilation=d, causal=True,
                norm="weight_norm")
    x = jnp.asarray(rng(2, length, 2))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, int(np.ceil(length / s)), 3)


@pytest.mark.parametrize("k,s", [(16, 8), (10, 5), (4, 2), (320, 320)])
def test_sconvtr_inverts_length(k, s):
    """SConvTranspose1d(k=2r, stride=r, causal) maps T' -> T'*r exactly."""
    m = SConvTranspose1d(features=4, kernel_size=k, stride=s, causal=True,
                         norm="weight_norm")
    x = jnp.asarray(rng(2, 7, 4))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 7 * s, 4)


def test_causality():
    """A causal conv's output at t must not depend on inputs after t."""
    m = SConv1d(features=1, kernel_size=5, stride=1, causal=True)
    x = jnp.asarray(rng(1, 64, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    y0 = m.apply(params, x)
    x2 = x.at[0, 40:, 0].set(99.0)
    y2 = m.apply(params, x2)
    np.testing.assert_allclose(y0[0, :40, 0], y2[0, :40, 0], atol=1e-6)


def test_pad_unpad_roundtrip():
    x = jnp.asarray(rng(2, 10, 3))
    y = pad1d(x, (4, 2), mode="reflect")
    assert y.shape == (2, 16, 3)
    z = unpad1d(y, (4, 2))
    np.testing.assert_allclose(np.asarray(z), np.asarray(x))


def test_reflect_pad_small_input():
    # input shorter than pad: reference's zero-extension workaround
    x = jnp.asarray(rng(1, 3, 1))
    y = pad1d(x, (5, 5), mode="reflect")
    assert y.shape == (1, 13, 1)


def test_extra_padding_formula():
    # mirror of reference modules/conv.py:160-196
    assert get_extra_padding_for_conv1d(100, 16, 8, 9) == 3
    assert get_extra_padding_for_conv1d(320, 16, 8, 9) == 7
    assert get_extra_padding_for_conv1d(320, 5, 1, 4) == 0


# ---------------------------------------------------------------------------
# Golden parity vs PyTorch reference
# ---------------------------------------------------------------------------

needs_ref = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="torch/reference unavailable"
)


@needs_ref
@pytest.mark.parametrize("k,s,d,groups,causal", [
    (5, 1, 1, 1, True),
    (5, 1, 1, 1, False),
    (16, 8, 1, 1, True),
    (10, 5, 1, 8, True),
    (5, 1, 4, 1, True),
    (1, 1, 1, 1, True),
])
def test_sconv1d_parity(k, s, d, groups, causal):
    import torch

    ref = torch_ref.import_reference_modules()
    cin = cout = 8
    tm = ref.SConv1d(cin, cout, kernel_size=k, stride=s, dilation=d,
                     groups=groups, bias=True, causal=causal, norm="weight_norm")
    tm.eval()

    m = SConv1d(features=cout, kernel_size=k, stride=s, dilation=d,
                groups=groups, use_bias=True, causal=causal, norm="weight_norm")
    x = rng(2, 100, cin, seed=3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    torch_ref.set_norm_conv(p["conv"], tm.conv.conv)

    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, atol=2e-5, rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("k,s,groups", [(16, 8, 1), (16, 8, 8), (4, 2, 1), (320, 320, 1)])
def test_sconvtr_parity(k, s, groups):
    import torch

    ref = torch_ref.import_reference_modules()
    cin = cout = 8
    tm = ref.SConvTranspose1d(cin, cout, kernel_size=k, stride=s, groups=groups,
                              causal=True, norm="weight_norm", bias=True)
    tm.eval()

    m = SConvTranspose1d(features=cout, kernel_size=k, stride=s, groups=groups,
                         causal=True, norm="weight_norm", use_bias=True)
    x = rng(2, 11, cin, seed=4)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    torch_ref.set_norm_conv(p["convtr"], tm.convtr.convtr, transposed=True)

    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(yj, yt, atol=2e-5, rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("n_fft,hop", [(64, 1), (128, 2), (1024, 320)])
def test_causal_stft_parity(n_fft, hop):
    import torch

    ref = torch_ref.import_reference_modules()
    tm = ref.CausalSTFT(n_fft=n_fft, hop_size=hop)
    tm.eval()
    m = CausalSTFT(n_fft=n_fft, hop_size=hop)
    x = rng(2, 3200, seed=5)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    with torch.no_grad():
        yt = tm(torch.from_numpy(x)).numpy()  # (B, F, frames)
    yj = np.asarray(m.apply(params, jnp.asarray(x)))  # (B, frames, F)
    np.testing.assert_allclose(yj.transpose(0, 2, 1), yt, atol=1e-4, rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("k,s,p,op,groups", [
    ((4, 4), (2, 2), (1, 1), (0, 0), 1),
    ((3, 5), (1, 2), (0, 1), (0, 1), 1),
    ((4, 4), (2, 2), (0, 0), (0, 0), 4),
])
def test_norm_convtr2d_parity(k, s, p, op, groups):
    """NormConvTranspose2d vs torch ConvTranspose2d + weight_norm
    (reference modules/conv.py:579-625)."""
    import torch
    from torch.nn.utils import weight_norm

    from waveverify_tpu.modules.conv import NormConvTranspose2d

    cin, cout = 8, 8
    tm = weight_norm(torch.nn.ConvTranspose2d(
        cin, cout, k, stride=s, padding=p, output_padding=op, groups=groups,
        bias=True))
    tm.eval()

    m = NormConvTranspose2d(features=cout, kernel_size=k, stride=s,
                            padding=p, output_padding=op, groups=groups,
                            use_bias=True, norm="weight_norm")
    x = rng(2, 9, 11, cin, seed=6)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    pm = jax.tree_util.tree_map(np.asarray, params["params"])
    with torch.no_grad():
        w = tm.weight.detach().numpy()  # (Cin, Cout/g, Kh, Kw)
    pm["v"] = w.astype(np.float32)
    pm["g"] = np.sqrt((w.astype(np.float64) ** 2).sum(axis=(1, 2, 3))).astype(
        np.float32)
    pm["b"] = tm.bias.detach().numpy().astype(np.float32)

    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    yj = np.asarray(m.apply({"params": pm}, jnp.asarray(x)))
    np.testing.assert_allclose(yj.transpose(0, 3, 1, 2), yt,
                               atol=2e-5, rtol=1e-4)
