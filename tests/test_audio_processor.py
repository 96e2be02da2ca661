"""AudioProcessor length-adjust: golden parity vs torch.nn.functional
(the exact ops the reference uses, utils/effect_augmentation.py:109-457)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from waveverify_tpu.ops.audio_processor import (
    AudioProcessor,
    adjust_audio_length,
    adjust_mask_length,
)


@pytest.mark.parametrize("cur,target", [(1000, 1500), (1500, 1000),
                                        (777, 1024), (320, 321)])
def test_audio_pad_truncate(cur, target):
    x = np.random.RandomState(0).randn(2, 3, cur).astype(np.float32)
    out = adjust_audio_length(jnp.asarray(x), target)
    assert out.shape == (2, 3, target)
    n = min(cur, target)
    np.testing.assert_array_equal(np.asarray(out)[..., :n], x[..., :n])
    if target > cur:
        assert np.all(np.asarray(out)[..., cur:] == 0)


@pytest.mark.parametrize("cur,target", [(1000, 1500), (1500, 1000),
                                        (777, 1024)])
def test_audio_stretch_matches_torch_linear(cur, target):
    x = np.random.RandomState(1).randn(2, 1, cur).astype(np.float32)
    ours = np.asarray(adjust_audio_length(jnp.asarray(x), target, "stretch"))
    ref = F.interpolate(torch.from_numpy(x), size=target, mode="linear",
                        align_corners=False).numpy()
    # f32 position arithmetic differs by one ulp at a few indices
    np.testing.assert_allclose(ours, ref, atol=5e-5)


@pytest.mark.parametrize("cur,target", [(1000, 1500), (1500, 1000),
                                        (100, 33)])
def test_audio_nearest_matches_torch(cur, target):
    x = np.random.RandomState(2).randn(1, 1, cur).astype(np.float32)
    ours = np.asarray(adjust_audio_length(jnp.asarray(x), target, "nearest"))
    ref = F.interpolate(torch.from_numpy(x), size=target,
                        mode="nearest").numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("cur,target", [(1000, 1500), (1500, 1000),
                                        (100, 33)])
def test_mask_nearest_exact_matches_torch(cur, target):
    rng = np.random.RandomState(3)
    m = (rng.rand(2, 1, cur) > 0.5).astype(np.float32)
    ours = np.asarray(adjust_mask_length(jnp.asarray(m), target,
                                         "nearest-exact"))
    ref = F.interpolate(torch.from_numpy(m), size=target,
                        mode="nearest-exact").numpy()
    np.testing.assert_array_equal(ours, ref)
    assert set(np.unique(ours)) <= {0.0, 1.0}


def test_mask_stretch_binarizes():
    m = np.zeros((1, 1, 100), np.float32)
    m[..., 40:60] = 1.0
    out = np.asarray(adjust_mask_length(jnp.asarray(m), 150, "stretch"))
    ref = (F.interpolate(torch.from_numpy(m), size=150, mode="linear",
                         align_corners=False) > 0.5).float().numpy()
    np.testing.assert_array_equal(out, ref)
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_validation_errors():
    x = jnp.zeros((4, 10))
    with pytest.raises(ValueError):
        adjust_audio_length(x, 0)
    with pytest.raises(ValueError):
        adjust_audio_length(x, 20, "bogus")
    with pytest.raises(ValueError):
        adjust_mask_length(x, 20, "nearest")  # audio-only mode name
    # class namespace mirrors the reference surface
    assert AudioProcessor.adjust_audio_length is adjust_audio_length
    assert AudioProcessor.adjust_mask_length is adjust_mask_length


def test_identity_when_already_target():
    x = jnp.ones((3, 50))
    assert adjust_audio_length(x, 50) is x
    assert adjust_mask_length(x, 50) is x
