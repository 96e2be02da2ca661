"""STDCT / MDCT / PQMF transform tests: reconstruction invariants + golden
parity vs the reference torch implementations (which run standalone)."""

import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from waveverify_tpu.ops.transforms import MDCT, PQMF, STDCT, design_prototype_filter

from tests import torch_ref

needs_ref = pytest.mark.skipif(
    not torch_ref.reference_available(), reason="torch/reference unavailable"
)


def _ref_audio_modules():
    if torch_ref.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, torch_ref.REFERENCE_ROOT)
    name = "_ref_audio_modules"
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(
        name, f"{torch_ref.REFERENCE_ROOT}/modules/audio_modules.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_stdct_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1024).astype(np.float32)
    t = STDCT(N=64, hop_size=32, window=np.hanning(64).astype(np.float32))
    assert t.nola_satisfied()
    spec = t(jnp.asarray(x))
    y = np.asarray(t.inverse(spec))
    # interior reconstruction (edges lack full window overlap)
    n = min(y.shape[1], x.shape[1])
    np.testing.assert_allclose(y[:, 64 : n - 64], x[:, 64 : n - 64], atol=1e-3)


def test_mdct_tdac_roundtrip():
    rng = np.random.RandomState(1)
    N = 32
    x = rng.randn(2, N * 16).astype(np.float32)
    t = MDCT(N=N)
    y = np.asarray(t.inverse(t(jnp.asarray(x))))
    assert y.shape == x.shape
    # MDCT TDAC gives perfect reconstruction away from the frame edges
    np.testing.assert_allclose(y[:, N:-N], x[:, N:-N], atol=1e-3)


def test_pqmf_near_perfect_reconstruction():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4096).astype(np.float32)
    pq = PQMF(subbands=4)
    sub = pq.analysis(jnp.asarray(x))
    assert sub.shape == (2, 1024, 4)
    y = np.asarray(pq.synthesis(sub))
    assert y.shape == x.shape
    # locate the filterbank group delay by cross-correlation, then score SNR
    c = np.correlate(y[0], x[0], mode="full")
    delay = int(np.argmax(c)) - (len(x[0]) - 1)
    assert 0 <= delay <= pq.taps
    ys = y[:, delay:]
    xs = x[:, : ys.shape[1]]
    n = ys.shape[1] - 128
    num = np.sum(xs[:, 64:n] ** 2)
    den = np.sum((ys[:, 64:n] - xs[:, 64:n]) ** 2) + 1e-12
    snr = 10 * np.log10(num / den)
    assert snr > 30.0, f"PQMF reconstruction SNR too low: {snr:.1f} dB"


def test_prototype_filter_properties():
    h = design_prototype_filter()
    assert h.shape == (63,)
    # lowpass: DC gain ~ 2*cutoff, symmetric
    np.testing.assert_allclose(h, h[::-1], atol=1e-12)
    with pytest.raises(ValueError):
        design_prototype_filter(taps=61)
    with pytest.raises(ValueError):
        design_prototype_filter(cutoff_ratio=1.5)


@needs_ref
def test_pqmf_parity_with_reference():
    import torch

    ref = _ref_audio_modules()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 2048).astype(np.float32)

    tm = ref.PQMF(subbands=4)
    with torch.no_grad():
        sub_t = tm.analysis(torch.from_numpy(x[:, None, :])).numpy()
        rec_t = tm.synthesis(torch.from_numpy(sub_t)).numpy()

    pq = PQMF(subbands=4)
    sub_j = np.asarray(pq.analysis(jnp.asarray(x)))
    np.testing.assert_allclose(sub_j.transpose(0, 2, 1), sub_t,
                               atol=1e-4, rtol=1e-4)
    rec_j = np.asarray(pq.synthesis(jnp.asarray(sub_j)))
    np.testing.assert_allclose(rec_j[:, None, :], rec_t, atol=1e-4, rtol=1e-4)


@needs_ref
def test_mdct_parity_with_reference():
    import torch

    ref = _ref_audio_modules()
    rng = np.random.RandomState(4)
    N = 16
    x = rng.randn(2, N * 8).astype(np.float32)

    tm = ref.MDCT(N=N)
    with torch.no_grad():
        spec_t = tm(torch.from_numpy(x[:, None, :])).numpy()
        rec_t = tm.inverse(torch.from_numpy(spec_t)).numpy()

    t = MDCT(N=N)
    spec_j = np.asarray(t(jnp.asarray(x)))
    np.testing.assert_allclose(spec_j.transpose(0, 2, 1), spec_t,
                               atol=1e-4, rtol=1e-4)
    rec_j = np.asarray(t.inverse(jnp.asarray(spec_j)))
    np.testing.assert_allclose(rec_j[:, None, :], rec_t, atol=1e-4, rtol=1e-4)


@needs_ref
def test_stdct_parity_with_reference():
    import torch

    ref = _ref_audio_modules()
    rng = np.random.RandomState(5)
    x = rng.randn(2, 512).astype(np.float32)
    win = np.hanning(64).astype(np.float32)

    tm = ref.STDCT(N=64, hop_size=32, window=torch.from_numpy(win))
    with torch.no_grad():
        spec_t = tm(torch.from_numpy(x[:, None, :])).numpy()

    t = STDCT(N=64, hop_size=32, window=win)
    spec_j = np.asarray(t(jnp.asarray(x)))
    np.testing.assert_allclose(spec_j.transpose(0, 2, 1), spec_t,
                               atol=1e-4, rtol=1e-4)
