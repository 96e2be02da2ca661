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
    results = run_sweep(wv, audio, seed=1, effects=effects)
    assert set(results) == {"identity", "random_noise(0.001)"}
    for tag, r in results.items():
        assert set(r) == {"ber", "tpr", "fpr", "miou", "confidence"}
        assert 0.0 <= r["ber"] <= 1.0, tag
        assert 0.0 <= r["miou"] <= 1.0, tag
        assert 0.0 <= r["tpr"] <= 1.0 and 0.0 <= r["fpr"] <= 1.0


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
