"""Golden-parity + invariant tests for the model layer.

Oracle: the reference `model/` package run through a minimal audiotools shim
(tests/torch_ref.py — the reference models only touch AudioSignal.audio_data
and ml.BaseModel, so the shim is faithful).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveverify_tpu.config import (
    DetectorConfig,
    DiscriminatorConfig,
    GeneratorConfig,
    LocatorConfig,
)
from waveverify_tpu.models import (
    Detector,
    Discriminator,
    Generator,
    Locator,
    detector_bits,
    detector_postprocess,
)

from tests import torch_ref

needs_ref = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="torch/reference unavailable"
)

# Small hyper-params for test speed; same topology as conf/base.yml.
SMALL = dict(
    dimension=32,
    channels_enc=8,
    kernel_size=5,
    last_kernel_size=5,
    residual_kernel_size=5,
    dilation_base=1,
    skip="identity",
    causal=True,
    encoder_l2norm=True,
    bias=True,
    spec_compression="log",
    zero_init=False,
)


def _np_params(module, *args):
    variables = module.init(jax.random.PRNGKey(0), *args)
    return jax.tree_util.tree_map(np.asarray, variables["params"])


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


@needs_ref
@pytest.mark.slow
def test_generator_parity():
    import torch

    ref = torch_ref.import_reference_models()
    audiotools = torch_ref.install_fake_audiotools()

    cfg = GeneratorConfig(channels_dec=12, n_residual_enc=2, n_residual_dec=3,
                          **SMALL)
    tm = ref.Generator(
        dimension=cfg.dimension, channels_enc=cfg.channels_enc,
        channels_dec=cfg.channels_dec, n_residual_enc=2, n_residual_dec=3,
        bias=True, zero_init=False, spec_learnable=False,
    )
    tm.eval()

    m = Generator(cfg)
    # non-multiple-of-320 length exercises preprocess padding + output trim
    x = np.random.RandomState(3).randn(2, 1601, 1).astype(np.float32) * 0.1
    msg = np.random.RandomState(4).randint(0, 2, (2, 16)).astype(np.float32)
    p = _np_params(m, jnp.asarray(x), jnp.asarray(msg))
    torch_ref.load_encoder(p["encoder"], tm.encoder, n_residual_layers=2,
                           n_scales=4)
    torch_ref.load_decoder(p["decoder"], tm.decoder, n_residual_layers=3,
                           n_scales=4)

    with torch.no_grad():
        sig = audiotools.AudioSignal(x.transpose(0, 2, 1), 16000)
        yt = tm(sig, torch.from_numpy(msg)).audio_data.numpy()
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x), jnp.asarray(msg)))
    assert yj.shape == (2, 1601, 1)
    np.testing.assert_allclose(
        yj.transpose(0, 2, 1), yt, atol=5e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# Detector
# ---------------------------------------------------------------------------


@needs_ref
def test_detector_parity():
    import torch

    ref = torch_ref.import_reference_models()
    audiotools = torch_ref.install_fake_audiotools()

    cfg = DetectorConfig(n_residual_enc=2, output_dim=16, **SMALL)
    tm = ref.Detector(dimension=cfg.dimension, channels_enc=cfg.channels_enc,
                      n_residual_enc=2, bias=True, zero_init=False,
                      output_dim=16)
    tm.eval()

    m = Detector(cfg)
    x = np.random.RandomState(5).randn(2, 1601, 1).astype(np.float32) * 0.1
    p = _np_params(m, jnp.asarray(x))
    torch_ref.load_encoder(p["encoder"], tm.encoder, n_residual_layers=2,
                           n_scales=4)
    torch_ref.set_plain_convtr(p["reverse_convolution"], tm.reverse_convolution)
    torch_ref.set_plain_conv(p["last_layer"], tm.last_layer)

    with torch.no_grad():
        sig = audiotools.AudioSignal(x.transpose(0, 2, 1), 16000)
        yt = tm(sig).numpy()  # [B, nbits, T]
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x)))  # [B, T, nbits]
    assert yj.shape == (2, 1601, 16)
    np.testing.assert_allclose(
        yj.transpose(0, 2, 1), yt, atol=5e-4, rtol=1e-3
    )

    # postprocess quirk path: softmax -> time-mean -> sigmoid -> threshold
    bits, probs = detector_postprocess(jnp.asarray(yj))
    tr = torch.softmax(torch.from_numpy(yt), dim=1).mean(dim=-1)
    tp = torch.sigmoid(tr)
    np.testing.assert_allclose(np.asarray(probs), tp.numpy(), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(bits), (tp.numpy() > 0.5).astype(np.int32)
    )


# ---------------------------------------------------------------------------
# Locator
# ---------------------------------------------------------------------------


@needs_ref
def test_locator_parity():
    import torch

    ref = torch_ref.import_reference_models()
    audiotools = torch_ref.install_fake_audiotools()

    cfg = LocatorConfig(n_residual_enc=1, output_dim=16, **SMALL)
    tm = ref.Locator(dimension=cfg.dimension, channels_enc=cfg.channels_enc,
                     n_residual_enc=1, bias=True, zero_init=False,
                     output_dim=16)
    tm.eval()

    m = Locator(cfg)
    x = np.random.RandomState(6).randn(2, 1601, 1).astype(np.float32) * 0.1
    p = _np_params(m, jnp.asarray(x))
    torch_ref.load_encoder(p["encoder"], tm.encoder, n_residual_layers=1,
                           n_scales=2)
    torch_ref.set_plain_convtr(p["reverse_convolution"], tm.reverse_convolution)
    torch_ref.set_plain_conv(p["last_layer"], tm.last_layer)

    with torch.no_grad():
        sig = audiotools.AudioSignal(x.transpose(0, 2, 1), 16000)
        yt = tm(sig).numpy()  # [B, 1, T]
    yj = np.asarray(m.apply({"params": p}, jnp.asarray(x)))
    assert yj.shape == (2, 1601, 1)
    np.testing.assert_allclose(
        yj.transpose(0, 2, 1), yt, atol=5e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# Parameter budgets (README.md:33-34: locator ~0.13M, detector ~4.5M)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_full_size_param_counts():
    det = Detector(DetectorConfig())
    x = jnp.zeros((1, 320, 1))
    n_det = param_count(det.init(jax.random.PRNGKey(0), x)["params"])
    assert 4.0e6 < n_det < 5.5e6, n_det

    loc = Locator(LocatorConfig())
    n_loc = param_count(loc.init(jax.random.PRNGKey(0), x)["params"])
    assert 0.10e6 < n_loc < 0.20e6, n_loc


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


@needs_ref
def test_mpd_parity():
    """MPD runs standalone in the reference (no audiotools in its forward)."""
    import torch

    torch_ref.install_fake_audiotools()
    import importlib.util
    import sys

    if torch_ref.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, torch_ref.REFERENCE_ROOT)
    spec = importlib.util.spec_from_file_location(
        "_ref_model_discriminator",
        f"{torch_ref.REFERENCE_ROOT}/model/discriminator.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_model_discriminator"] = mod
    spec.loader.exec_module(mod)
    RefMPD = mod.MPD

    tm = RefMPD(period=3)
    tm.eval()
    from waveverify_tpu.models.discriminator import MPD

    m = MPD(period=3)
    x = np.random.RandomState(12).randn(1, 1600, 1).astype(np.float32)
    p = _np_params(m, jnp.asarray(x))
    # load each weight-normed conv (Sequential(conv, act) except post)
    for i in range(5):
        torch_ref.set_norm_conv2d(p[f"conv_{i}"], tm.convs[i][0])
    torch_ref.set_norm_conv2d(p["conv_post"], tm.conv_post)

    with torch.no_grad():
        fm_t = tm(torch.from_numpy(x.transpose(0, 2, 1)))
    fm_j = m.apply({"params": p}, jnp.asarray(x))
    assert len(fm_j) == len(fm_t)
    for a, b in zip(fm_j, fm_t):
        # torch NCHW -> NHWC
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )


def test_discriminator_shapes():
    cfg = DiscriminatorConfig(periods=(2, 3), fft_sizes=(512,))
    d = Discriminator(cfg)
    x = jnp.asarray(np.random.RandomState(13).randn(2, 1600, 1).astype(np.float32))
    p = d.init(jax.random.PRNGKey(0), x)
    outs = d.apply(p, x)
    assert len(outs) == 3  # 2 MPD + 1 MRD
    for fmaps in outs:
        assert all(np.isfinite(np.asarray(f)).all() for f in fmaps)
        assert fmaps[-1].shape[-1] == 1  # logit map
    # MPD fmap count: 5 convs + post
    assert len(outs[0]) == 6
    # MRD fmap count: 5 bands x 5 convs + post
    assert len(outs[2]) == 26


@needs_ref
def test_mrd_parity():
    """MRD golden parity: the torch oracle runs with an audiotools-faithful
    stft shim (match_stride semantics, tests/torch_ref.py), so this
    validates stft_match_stride + the per-band conv stacks end to end."""
    import torch

    torch_ref.install_fake_audiotools()
    import importlib.util
    import sys

    if torch_ref.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, torch_ref.REFERENCE_ROOT)
    spec = importlib.util.spec_from_file_location(
        "_ref_model_discriminator_mrd",
        f"{torch_ref.REFERENCE_ROOT}/model/discriminator.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_model_discriminator_mrd"] = mod
    spec.loader.exec_module(mod)

    tm = mod.MRD(window_length=512)
    tm.eval()
    from waveverify_tpu.models.discriminator import MRD

    m = MRD(window_length=512)
    x = np.random.RandomState(21).randn(1, 4000, 1).astype(np.float32)
    p = _np_params(m, jnp.asarray(x))
    for bi, stack in enumerate(tm.band_convs):
        for ci, layer in enumerate(stack):
            torch_ref.set_norm_conv2d(p[f"band_{bi}_conv_{ci}"], layer[0])
    torch_ref.set_norm_conv2d(p["conv_post"], tm.conv_post)

    with torch.no_grad():
        fm_t = tm(torch.from_numpy(x.transpose(0, 2, 1)))
    fm_j = m.apply({"params": p}, jnp.asarray(x))
    assert len(fm_j) == len(fm_t)  # 5 bands x 5 convs + post = 26
    for a, b in zip(fm_j, fm_t):
        # torch [B, C, T', Fb] -> jax [B, T', Fb, C]
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
            atol=5e-4, rtol=1e-3,
        )


@needs_ref
def test_msd_parity_rate1():
    """MSD golden parity at rate=1 (the no-resample path; conf/base.yml
    disables MSD entirely — rates: [] — so the conv stack is the whole
    story; rate>1 uses our polyphase resampler vs julius: semantic)."""
    import torch

    torch_ref.install_fake_audiotools()
    import importlib.util
    import sys

    if torch_ref.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, torch_ref.REFERENCE_ROOT)
    spec = importlib.util.spec_from_file_location(
        "_ref_model_discriminator_msd",
        f"{torch_ref.REFERENCE_ROOT}/model/discriminator.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_model_discriminator_msd"] = mod
    spec.loader.exec_module(mod)

    tm = mod.MSD(rate=1)
    tm.eval()
    from waveverify_tpu.models.discriminator import MSD

    m = MSD(rate=1)
    x = np.random.RandomState(22).randn(1, 3200, 1).astype(np.float32)
    p = _np_params(m, jnp.asarray(x))
    for i, layer in enumerate(tm.convs):
        torch_ref.set_norm_conv(p[f"conv_{i}"], layer[0])
    torch_ref.set_norm_conv(p["conv_post"], tm.conv_post)

    with torch.no_grad():
        fm_t = tm(torch.from_numpy(x.transpose(0, 2, 1)))
    fm_j = m.apply({"params": p}, jnp.asarray(x))
    assert len(fm_j) == len(fm_t)  # 6 convs + post
    for a, b in zip(fm_j, fm_t):
        # torch [B, C, T'] -> jax [B, T', C]
        np.testing.assert_allclose(
            np.asarray(a), b.numpy().transpose(0, 2, 1),
            atol=5e-4, rtol=1e-3,
        )
