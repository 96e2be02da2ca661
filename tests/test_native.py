"""Native ingest extension tests: C++ decode parity with the Python WAV
reader, batch crop semantics, and the dataset integration fallback."""

import wave

import numpy as np
import pytest

from waveverify_tpu.native import get_wavio
from waveverify_tpu.train.data import AudioFolderDataset, read_wav

wavio = get_wavio()
needs_native = pytest.mark.skipif(
    wavio is None, reason="native toolchain unavailable"
)


def _write_wav(path, x, sr=16000, sampwidth=2, channels=1):
    x = np.clip(np.asarray(x, np.float32), -1, 1)
    if channels > 1:
        x = np.repeat(x[:, None], channels, axis=1).ravel()
    with wave.open(str(path), "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(sampwidth)
        f.setframerate(sr)
        if sampwidth == 2:
            f.writeframes((x * 32767).astype(np.int16).tobytes())
        elif sampwidth == 4:
            f.writeframes((x * 2147483647).astype(np.int32).tobytes())
        elif sampwidth == 3:
            v = (x * 8388607).astype(np.int32)
            b = np.zeros((len(v), 3), np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            f.writeframes(b.tobytes())


@needs_native
def test_decode_parity_with_python(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.rand(5000).astype(np.float32) * 1.6 - 0.8)
    for width in (2, 3, 4):
        p = tmp_path / f"w{width}.wav"
        _write_wav(p, x, sampwidth=width)
        y_native, sr = wavio.decode_wav(p.read_bytes())
        y_python, sr_py = read_wav(str(p))
        assert sr == sr_py == 16000
        np.testing.assert_allclose(y_native, y_python, atol=2e-7)


@needs_native
def test_decode_stereo_mixdown(tmp_path):
    x = np.linspace(-0.5, 0.5, 1000).astype(np.float32)
    p = tmp_path / "stereo.wav"
    _write_wav(p, x, channels=2)
    y, sr = wavio.decode_wav(p.read_bytes())
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)  # both channels identical


@needs_native
def test_load_crop_batch(tmp_path):
    rng = np.random.RandomState(1)
    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.wav"
        _write_wav(p, rng.randn(8000 + 1000 * i).astype(np.float32) * 0.2)
        paths.append(str(p))
    out, srs, err = wavio.load_crop_batch(paths, 4000, 42)
    assert err == ""
    assert out.shape == (5, 4000) and out.dtype == np.float32
    assert (srs == 16000).all()
    assert np.abs(out).max() > 0
    # deterministic per (seed, index)
    out2, _, _ = wavio.load_crop_batch(paths, 4000, 42)
    np.testing.assert_array_equal(out, out2)
    out3, _, _ = wavio.load_crop_batch(paths, 4000, 43)
    assert not np.array_equal(out, out3)


@needs_native
def test_load_crop_batch_short_file_zero_pads(tmp_path):
    p = tmp_path / "short.wav"
    _write_wav(p, np.ones(100, np.float32) * 0.5)
    out, srs, err = wavio.load_crop_batch([str(p)], 400, 0)
    assert err == ""
    np.testing.assert_allclose(out[0, :100], 0.5, atol=1e-4)
    assert (out[0, 100:] == 0).all()


@needs_native
def test_load_crop_batch_bad_file_fails_soft(tmp_path):
    good = tmp_path / "good.wav"
    _write_wav(good, np.ones(1000, np.float32) * 0.3)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"this is not a wav file at all")
    out, srs, err = wavio.load_crop_batch([str(good), str(bad)], 500, 0)
    assert err != ""
    assert np.abs(out[0]).max() > 0
    assert (out[1] == 0).all() and srs[1] == 0


def test_dataset_native_python_equivalence(tmp_path):
    """Batches from the native and Python paths are drawn from the same
    files with the same shapes (crop offsets differ by RNG stream)."""
    rng = np.random.RandomState(2)
    for i in range(3):
        _write_wav(tmp_path / f"d{i}.wav", rng.randn(6000).astype(np.float32) * 0.2)
    ds_native = AudioFolderDataset([str(tmp_path)], duration=0.25, seed=5,
                                   use_native=True)
    ds_python = AudioFolderDataset([str(tmp_path)], duration=0.25, seed=5,
                                   use_native=False)
    b_native = ds_native.batch(4)
    b_python = ds_python.batch(4)
    assert b_native.shape == b_python.shape == (4, 4000)
    assert np.isfinite(b_native).all()
    assert np.abs(b_native).max() > 0
