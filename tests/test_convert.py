"""Checkpoint-converter tests: a reference torch checkpoint (built from live
reference models) converts into our param trees and reproduces the reference
outputs through the full WaveVerify pipeline — the end-to-end parity path a
reference user migrating to this framework follows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveverify_tpu.config import (
    DetectorConfig,
    GeneratorConfig,
    LocatorConfig,
    TrainConfig,
)
from waveverify_tpu.train.watermarking import WatermarkModels

from tests import torch_ref

needs_ref = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="torch/reference unavailable"
)

SMALL = dict(
    dimension=32, channels_enc=8, kernel_size=5, last_kernel_size=5,
    residual_kernel_size=5, dilation_base=1, skip="identity", causal=True,
    encoder_l2norm=True, bias=True, spec_compression="log", zero_init=False,
)


def small_cfg() -> TrainConfig:
    return TrainConfig(
        generator=GeneratorConfig(channels_dec=12, n_residual_enc=2,
                                  n_residual_dec=3, **SMALL),
        detector=DetectorConfig(n_residual_enc=2, output_dim=16, **SMALL),
        locator=LocatorConfig(n_residual_enc=1, output_dim=16, **SMALL),
    )


@pytest.fixture(scope="module")
def torch_checkpoint(tmp_path_factory):
    """Build reference models and save them in the reference's atomic layout
    (reference scripts/train.py:1632-1655, weights still parametrized — the
    converter must fuse them)."""
    import torch

    ref = torch_ref.import_reference_models()
    torch_ref.install_fake_audiotools()
    torch.manual_seed(0)

    gen = ref.Generator(dimension=32, channels_enc=8, channels_dec=12,
                        n_residual_enc=2, n_residual_dec=3, bias=True,
                        zero_init=False, spec_learnable=False)
    det = ref.Detector(dimension=32, channels_enc=8, n_residual_enc=2,
                       bias=True, zero_init=False, output_dim=16)
    loc = ref.Locator(dimension=32, channels_enc=8, n_residual_enc=1,
                      bias=True, zero_init=False, output_dim=16)
    for m in (gen, det, loc):
        m.eval()

    path = tmp_path_factory.mktemp("ckpt") / "reference.pth"
    torch.save({
        "step": 123,
        "models": {
            "generator": gen.state_dict(),
            "detector": det.state_dict(),
            "locator": loc.state_dict(),
        },
    }, path)
    return path, gen, det, loc


@needs_ref
@pytest.mark.slow
def test_convert_and_generator_parity(torch_checkpoint):
    import torch

    from waveverify_tpu.convert import convert_torch_checkpoint

    path, gen, det, loc = torch_checkpoint
    audiotools = torch_ref.install_fake_audiotools()
    cfg = small_cfg()
    wm_params = convert_torch_checkpoint(path, cfg)

    models = WatermarkModels.from_config(cfg)
    x = np.random.RandomState(3).randn(2, 1601).astype(np.float32) * 0.1
    msg = np.random.RandomState(4).randint(0, 2, (2, 16)).astype(np.float32)

    with torch.no_grad():
        sig = audiotools.AudioSignal(x[:, None, :], 16000)
        yt = gen(sig, torch.from_numpy(msg)).audio_data.numpy()[:, 0, :]
    yj = np.asarray(models.apply_generator(
        jax.tree_util.tree_map(jnp.asarray, wm_params["generator"]),
        jnp.asarray(x), jnp.asarray(msg),
    ))
    np.testing.assert_allclose(yj, yt, atol=5e-4, rtol=1e-3)


@needs_ref
@pytest.mark.slow
def test_convert_detector_locator_parity(torch_checkpoint):
    import torch

    from waveverify_tpu.convert import convert_torch_checkpoint

    path, gen, det, loc = torch_checkpoint
    audiotools = torch_ref.install_fake_audiotools()
    cfg = small_cfg()
    wm_params = convert_torch_checkpoint(path, cfg)
    models = WatermarkModels.from_config(cfg)

    x = np.random.RandomState(5).randn(2, 1601).astype(np.float32) * 0.1
    sig = audiotools.AudioSignal(x[:, None, :], 16000)

    with torch.no_grad():
        yt_det = det(sig).numpy()  # [B, nbits, T]
        yt_loc = loc(sig).numpy()  # [B, 1, T]

    p = jax.tree_util.tree_map(jnp.asarray, wm_params)
    yj_det = np.asarray(models.apply_detector(p["detector"], jnp.asarray(x)))
    yj_loc = np.asarray(models.apply_locator(p["locator"], jnp.asarray(x)))
    np.testing.assert_allclose(yj_det.transpose(0, 2, 1), yt_det,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(yj_loc[:, None, :], yt_loc,
                               atol=5e-4, rtol=1e-3)


@needs_ref
def test_wave_verify_loads_torch_checkpoint(torch_checkpoint, tmp_path):
    """End-to-end migration path: WaveVerify(checkpoint_path=<.pth>) embeds
    and the converted detector agrees with the torch detector on the result."""
    import torch

    from waveverify_tpu.api.audio_io import save_audio
    from waveverify_tpu.api.core import WaveVerify
    from waveverify_tpu import WatermarkID

    path, gen, det, loc = torch_checkpoint
    audiotools = torch_ref.install_fake_audiotools()

    wv = WaveVerify(checkpoint_path=path, config=small_cfg())
    t = np.arange(8000) / 16000
    save_audio((0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32),
               tmp_path / "in.wav")

    wm = WatermarkID.custom(0x1234)
    audio, sr, _ = wv.embed(tmp_path / "in.wav", wm, tmp_path / "out.wav")
    assert audio.shape == (8000,)

    # our detector on our watermarked audio == torch detector (bit probs)
    with torch.no_grad():
        sig = audiotools.AudioSignal(audio[None, None, :].astype(np.float32),
                                     16000)
        yt = det(sig).numpy()  # [1, nbits, T]
    probs_t = 1 / (1 + np.exp(-yt.mean(axis=2)))
    detected, conf = wv.detect_array(audio)
    # detect_array pads to a bucket; compare against torch on padded input
    padded = np.zeros(9600, np.float32)
    padded[:8000] = audio
    with torch.no_grad():
        sig_p = audiotools.AudioSignal(padded[None, None, :], 16000)
        yt_p = det(sig_p).numpy()
    probs_p = 1 / (1 + np.exp(-yt_p)).mean(axis=2)
    bits_torch = "".join(str(int(b)) for b in (probs_p[0] > 0.5).astype(int))
    assert detected.to_bits() == bits_torch


@needs_ref
@pytest.mark.slow
def test_save_converted_roundtrip(torch_checkpoint, tmp_path):
    from waveverify_tpu.api.core import WaveVerify
    from waveverify_tpu.convert import convert_torch_checkpoint, save_converted

    path, *_ = torch_checkpoint
    cfg = small_cfg()
    out = save_converted(path, tmp_path / "orbax", cfg)
    assert out.exists()
    wv = WaveVerify(checkpoint_path=tmp_path / "orbax" / "latest", config=cfg)
    direct = convert_torch_checkpoint(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(wv.params),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fuse_parametrizations_math():
    from waveverify_tpu.convert import fuse_parametrizations

    rng = np.random.RandomState(0)
    v = rng.randn(4, 3, 5).astype(np.float32)
    g = rng.rand(4, 1, 1).astype(np.float32) + 0.5
    sd = {
        "conv.parametrizations.weight.original0": g,
        "conv.parametrizations.weight.original1": v,
        "conv.bias": np.zeros(4, np.float32),
    }
    fused = fuse_parametrizations(sd)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
    np.testing.assert_allclose(fused["conv.weight"], g * v / norm, rtol=1e-5)
    assert "conv.bias" in fused
    assert not any(".parametrizations." in k for k in fused)


def test_npz_weights_roundtrip(tmp_path):
    """Compact-weights interchange: tree -> .npz (f16) -> tree preserves
    structure and values to f16 resolution; WaveVerify loads the file."""
    import jax
    import numpy as np

    from waveverify_tpu.convert import load_weights_npz, save_weights_npz

    tree = {
        "generator": {"conv": {"g": np.random.RandomState(0).randn(8).astype(np.float32),
                               "v": np.random.RandomState(1).randn(3, 2, 8).astype(np.float32)}},
        "detector": {"dense": {"kernel": np.ones((4, 4), np.float32)}},
    }
    p = save_weights_npz(tree, tmp_path / "w.npz")
    back = load_weights_npz(p)
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(tree)
    for a, b in zip(jax.tree_util.tree_leaves(back),
                    jax.tree_util.tree_leaves(tree)):
        assert a.dtype == np.float32
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
