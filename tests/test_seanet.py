"""Golden-parity tests for the full SEANet encoder/decoder vs the reference.

These exercise every padding/norm/spec-block/FiLM decision at once: if any
off-by-one or norm-axis error exists, the outputs diverge immediately.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveverify_tpu.modules.seanet import SEANetDecoder, SEANetEncoder

from tests import torch_ref

needs_ref = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="torch/reference unavailable"
)

# conf/base.yml Generator hyper-params (small n_filters for test speed)
ENC_KW = dict(
    channels=1,
    dimension=32,
    msg_dimension=16,
    n_filters=8,
    n_fft_base=64,
    n_residual_layers=2,
    ratios=[8, 5, 4, 2],
    activation="ELU",
    activation_params={"alpha": 1.0},
    norm="weight_norm",
    kernel_size=5,
    last_kernel_size=5,
    residual_kernel_size=5,
    dilation_base=1,
    skip="identity",
    causal=True,
    act_all=False,
    expansion=1,
    groups=-1,
    l2norm=True,
    spec="stft",
    spec_compression="log",
    res_scale=0.5773502691896258,
    pad_mode="constant",
    zero_init=False,
    inout_norm=True,
    embedding_dim=64,
    embedding_layers=2,
    freq_bands=4,
)


def _build_ref_encoder(ref, bias=True):
    return ref.SEANetEncoder(
        bias=bias,
        **{
            k: v
            for k, v in ENC_KW.items()
        },
    )


@needs_ref
def test_encoder_parity():
    import torch

    ref = torch_ref.import_reference_modules()
    tm = _build_ref_encoder(ref)
    tm.eval()

    m = SEANetEncoder(use_bias=True, **{k: v for k, v in ENC_KW.items()})
    x = np.random.RandomState(7).randn(2, 1600, 1).astype(np.float32)
    msg = np.random.RandomState(8).randint(0, 2, (2, 16)).astype(np.float32)

    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(msg))
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    torch_ref.load_encoder(p, tm, n_residual_layers=2, n_scales=4)

    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(msg))
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x), jnp.asarray(msg)))
    np.testing.assert_allclose(
        yj.transpose(0, 2, 1), yt.numpy(), atol=5e-4, rtol=1e-3
    )


@needs_ref
def test_encoder_parity_no_msg():
    """Detector-style encoder call (msg=None skips FiLM)."""
    import torch

    ref = torch_ref.import_reference_modules()
    tm = _build_ref_encoder(ref)
    tm.eval()
    m = SEANetEncoder(use_bias=True, **{k: v for k, v in ENC_KW.items()})
    x = np.random.RandomState(9).randn(2, 1600, 1).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), None)
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    torch_ref.load_encoder(p, tm, n_residual_layers=2, n_scales=4)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 2, 1)), None)
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x), None))
    np.testing.assert_allclose(
        yj.transpose(0, 2, 1), yt.numpy(), atol=5e-4, rtol=1e-3
    )


@needs_ref
def test_decoder_parity():
    import torch

    ref = torch_ref.import_reference_modules()
    kw = dict(
        channels=1,
        dimension=32,
        n_filters=12,
        n_residual_layers=3,
        ratios=[8, 5, 4, 2],
        activation="ELU",
        activation_params={"alpha": 1.0},
        norm="weight_norm",
        kernel_size=5,
        last_kernel_size=5,
        residual_kernel_size=5,
        dilation_base=1,
        skip="identity",
        causal=True,
        final_activation="Tanh",
        act_all=False,
        expansion=1,
        groups=-1,
        res_scale=0.5773502691896258,
        pad_mode="constant",
        zero_init=False,
        inout_norm=True,
    )
    tm = ref.SEANetDecoder(bias=True, **kw)
    tm.eval()
    m = SEANetDecoder(use_bias=True, **kw)
    z = np.random.RandomState(11).randn(2, 5, 32).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(z))
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    torch_ref.load_decoder(p, tm, n_residual_layers=3, n_scales=4)
    with torch.no_grad():
        yt = tm(torch.from_numpy(z.transpose(0, 2, 1)))
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(z)))
    assert yj.shape == (2, 5 * 320, 1)
    np.testing.assert_allclose(
        yj.transpose(0, 2, 1), yt.numpy(), atol=5e-4, rtol=1e-3
    )
