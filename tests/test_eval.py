"""Robustness-sweep evaluation tests (waveverify_tpu/eval.py)."""

import numpy as np
import pytest

from waveverify_tpu.api.core import WaveVerify
from waveverify_tpu.config import (
    DetectorConfig,
    GeneratorConfig,
    LocatorConfig,
    TrainConfig,
)
from waveverify_tpu.eval import EVAL_COMBINED, EVAL_SINGLE, _effect_tag, run_sweep

SMALL = dict(
    dimension=32, channels_enc=8, kernel_size=5, last_kernel_size=5,
    residual_kernel_size=5, dilation_base=1, skip="identity", causal=True,
    encoder_l2norm=True, bias=True, spec_compression="log", zero_init=False,
)


@pytest.fixture(scope="module")
def wv():
    cfg = TrainConfig(
        generator=GeneratorConfig(channels_dec=12, n_residual_enc=1,
                                  n_residual_dec=1, **SMALL),
        detector=DetectorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        locator=LocatorConfig(n_residual_enc=1, output_dim=8, **SMALL),
    )
    return WaveVerify(config=cfg)


def test_run_sweep_structure(wv):
    rng = np.random.RandomState(0)
    audio = rng.randn(4, 4800).astype(np.float32) * 0.1
    effects = [[("identity", {})],
               [("random_noise", {"noise_std": 0.001})]]
    results = run_sweep(wv, audio, seed=1, effects=effects,
                        include_codecs=False)
    assert set(results) == {"_quality", "identity", "random_noise(0.001)"}
    q = results.pop("_quality")
    # reference README quality table rows (README.md:184-186): SI-SNR is a
    # real dB number, STOI in [0,1]; PESQ is NaN when the lib is absent.
    assert np.isfinite(q["sisnr_db"])
    assert 0.0 <= q["stoi"] <= 1.0
    assert q["pesq"] is None or 1.0 <= q["pesq"] <= 4.64
    for tag, r in results.items():
        assert set(r) == {"ber", "tpr", "fpr", "miou", "confidence",
                          "ber_full", "tpr_full", "bit_acc_full"}
        assert len(r["bit_acc_full"]) == 16
        assert all(0.0 <= a <= 1.0 for a in r["bit_acc_full"])
        assert 0.0 <= r["ber"] <= 1.0, tag
        assert 0.0 <= r["ber_full"] <= 1.0, tag
        assert 0.0 <= r["miou"] <= 1.0, tag
        assert 0.0 <= r["tpr"] <= 1.0 and 0.0 <= r["fpr"] <= 1.0
        assert 0.0 <= r["tpr_full"] <= 1.0


def test_effect_tags():
    assert _effect_tag([("identity", {})]) == "identity"
    assert _effect_tag(
        [("highpass_filter", {"cutoff_freq": 3500}),
         ("random_noise", {"noise_std": 0.001})]
    ) == "highpass_filter(3500) + random_noise(0.001)"


def test_default_sweep_lists_cover_readme_tables():
    # reference README.md:194-208 effects present in the default sweep
    singles = {name for name, _ in EVAL_SINGLE}
    assert {"identity", "resample", "speed", "highpass_filter",
            "bandpass_filter"} <= singles
    assert len(EVAL_COMBINED) == 3
    for chain in EVAL_COMBINED:
        assert len(chain) == 2


# -- native STOI (waveverify_tpu/quality.py) ---------------------------------


class TestNativeSTOI:
    def _speech_like(self, seconds=2.0, fs=16000, seed=0):
        """Amplitude-modulated multi-tone — has the spectro-temporal
        modulation STOI measures (white noise alone has none)."""
        rng = np.random.RandomState(seed)
        t = np.arange(int(seconds * fs)) / fs
        x = np.zeros_like(t)
        for f0 in (220, 440, 880, 1760, 3000):
            x += rng.rand() * np.sin(2 * np.pi * f0 * t + rng.rand())
        x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t)  # 3 Hz envelope
        return (0.1 * x / np.max(np.abs(x))).astype(np.float64)

    def test_identity_is_one(self):
        from waveverify_tpu.quality import native_stoi

        x = self._speech_like()
        assert native_stoi(x, x, 16000) == pytest.approx(1.0, abs=1e-6)

    def test_monotonic_in_noise(self):
        from waveverify_tpu.quality import native_stoi

        x = self._speech_like()
        rng = np.random.RandomState(1)
        noise = rng.randn(len(x))
        scores = [native_stoi(x + s * noise, x, 16000)
                  for s in (0.0, 0.01, 0.05, 0.2)]
        assert scores[0] == pytest.approx(1.0, abs=1e-6)
        assert all(a > b for a, b in zip(scores, scores[1:]))
        assert scores[-1] < 0.8

    def test_metrics_stoi_never_nan(self):
        from waveverify_tpu.metrics import stoi

        x = self._speech_like(1.0)
        v = stoi(x, x, 16000)
        assert np.isfinite(v) and v > 0.99

    def test_too_short_returns_floor(self):
        from waveverify_tpu.quality import native_stoi

        x = self._speech_like(0.2)  # < 30 frames after framing at 10 kHz
        assert native_stoi(x, x, 16000) == pytest.approx(1e-5)


def test_codec_rows_report_honest_status(wv):
    """mp3/aac/encodec rows must appear with real numbers when the codec
    can run, or an explicit `unavailable` status — never silent
    passthrough numbers (reference's fail-safe hid this,
    utils/effect_augmentation.py:640-852)."""
    from waveverify_tpu.effects.effects import codec_available

    rng = np.random.RandomState(0)
    audio = rng.randn(2, 4800).astype(np.float32) * 0.1
    results = run_sweep(wv, audio, seed=1, effects=[[("identity", {})]],
                        include_codecs=True)
    for codec, tag in (("mp3", "mp3(128k)"), ("aac", "aac(128k)"),
                       ("encodec", "encodec")):
        assert tag in results, sorted(results)
        row = results[tag]
        if codec_available(codec):
            assert row["status"] == "measured" and "ber" in row
        else:
            assert row["status"].startswith("unavailable")
            assert "ber" not in row
