"""Tests for the on-device effects, augmentations, scheduler, and metrics.

Encodes the reference self-check invariants (SURVEY §4): effects preserve
batch shape and mask binariness; BER/MIoU behave correctly under full and
partial masks; the scheduler's param weighting responds to success feedback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveverify_tpu.effects import (
    AudioEffects,
    EffectBank,
    EffectScheduler,
    apply_effect,
    localization_augmentation,
    sequence_augmentation,
)
from waveverify_tpu.metrics import ber, miou, sisnr

KEY = jax.random.PRNGKey(0)


def batch(b=4, t=16000, seed=0):
    x = np.random.RandomState(seed).randn(b, t).astype(np.float32) * 0.1
    return jnp.asarray(x)


ALL_EFFECTS = [
    ("identity", {}),
    ("highpass_filter", {"cutoff_freq": 3500}),
    ("lowpass_filter", {"cutoff_freq": 2000}),
    ("bandpass_filter", {"cutoff_freq_low": 300, "cutoff_freq_high": 4000}),
    ("speed", {"speed": 0.8}),
    ("resample", {"new_sample_rate": 32000}),
    ("random_noise", {"noise_std": 0.001}),
    ("white_noise", {"noise_std": 0.01}),
    ("pink_noise", {"noise_std": 0.01}),
    ("echo", {}),
    ("amplitude_scaling", {"scale": 0.5}),
    ("quantization", {"bit_depth": 8}),
    ("sample_suppression", {"suppression_percentage": 0.1}),
    ("shush", {"fraction": 0.01}),
    ("median_filter", {"kernel_size": 3}),
    ("smooth", {"window_size": 5}),
    ("random_equalization", {}),
    ("codec_proxy", {}),
    ("time_shift", {"shift": 161}),
]


@pytest.mark.parametrize("name,params", ALL_EFFECTS)
def test_effect_shape_and_mask_invariants(name, params):
    """Every effect preserves shape and returns a binary mask
    (reference utils/effect_augmentation.py:2638-2877 test_all_effects)."""
    x = batch()
    mask = jnp.ones_like(x)
    fn = getattr(AudioEffects, name)
    y, m = fn(x, mask, KEY, **params)
    assert y.shape == x.shape
    assert m.shape == mask.shape
    vals = np.unique(np.asarray(m))
    assert np.all((vals == 0) | (vals == 1)), f"mask not binary: {vals}"
    assert np.isfinite(np.asarray(y)).all()


def test_effects_differentiable():
    """Scheduled train effects must pass gradients to the input (STE or real)."""
    x = batch(2, 3200)
    mask = jnp.ones_like(x)
    for name, params in [
        ("highpass_filter", {"cutoff_freq": 500}),
        ("speed", {"speed": 0.8}),
        ("resample", {"new_sample_rate": 32000}),
        ("quantization", {"bit_depth": 8}),
        ("random_noise", {"noise_std": 0.001}),
    ]:
        fn = getattr(AudioEffects, name)
        g = jax.grad(lambda a: jnp.sum(fn(a, mask, KEY, **params)[0] ** 2))(x)
        assert np.abs(np.asarray(g)).max() > 0, f"{name} has zero gradient"


def test_effect_bank_dispatch():
    bank = EffectBank.default_train_bank()
    x = batch()
    mask = jnp.ones_like(x)
    idx = jnp.asarray([0, 6, 8, 3], jnp.int32)  # identity, speed, noise, lp
    y, m = jax.jit(bank.apply)(x, mask, idx, KEY)
    assert y.shape == x.shape and m.shape == mask.shape
    # identity row is exactly the input
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(x[0]), atol=1e-6)
    # speed row differs
    assert np.abs(np.asarray(y[1] - x[1])).max() > 1e-4


def test_apply_effect_shapes():
    x1 = batch(1)[0]  # 1D
    y, _ = apply_effect(x1, "lowpass_filter", cutoff_freq=2000)
    assert y.shape == x1.shape
    x3 = batch()[:, :, None]  # [B, T, 1]
    y3, _ = apply_effect(x3, "identity")
    assert y3.shape == x3.shape


def test_speed_semantics():
    """speed(0.8) == sox speed + STE stretch-back: the net transform keeps
    the tone frequency (the stretch undoes the tempo change) but injects
    double-resample artifacts — the property the watermark must survive
    (reference utils/effect_augmentation.py:1381-1448 + :580-589)."""
    sr = 16000
    t = np.arange(sr) / sr
    tone = jnp.asarray(np.sin(2 * np.pi * 1000 * t, dtype=np.float32))[None]
    y, _ = AudioEffects.speed(tone, None, KEY, speed=0.8)
    y = np.asarray(y)[0]
    mid = y[2000:14000]
    crossings = np.sum(np.diff(np.signbit(mid)))
    freq = crossings / 2 / (len(mid) / sr)
    assert abs(freq - 1000) < 20, freq  # frequency preserved
    # but not the identity: near-Nyquist content is destroyed by the chain
    hi = jnp.asarray(np.sin(2 * np.pi * 7600 * t, dtype=np.float32))[None]
    z = np.asarray(AudioEffects.speed(hi, None, KEY, speed=0.8)[0])[0]
    out_rms = np.sqrt((z[2000:14000] ** 2).mean())
    assert out_rms < 0.3, out_rms  # 7.6 kHz tone heavily attenuated


# ---------------------------------------------------------------------------
# Augmentations
# ---------------------------------------------------------------------------


def test_localization_augmentation():
    orig = batch(4, 16000, seed=1)
    wm = orig + 0.01
    aug, mask, upd = localization_augmentation(KEY, orig, wm)
    assert aug.shape == wm.shape and mask.shape == wm.shape
    m = np.asarray(mask)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # ~20% of segments modified -> mask zero fraction in [5%, 35%]
    frac = 1 - m.mean()
    assert 0.05 < frac < 0.35, frac
    # where mask==1, audio is untouched watermarked
    keep = m == 1
    np.testing.assert_allclose(np.asarray(aug)[keep], np.asarray(wm)[keep])


def test_sequence_augmentation_consistency():
    wm = batch(2, 16000, seed=2)
    orig = batch(2, 16000, seed=3)
    mask = (batch(2, 16000, seed=4) > 0).astype(jnp.float32)
    for seed in range(6):
        k = jax.random.PRNGKey(seed)
        w2, o2, m2 = sequence_augmentation(k, wm, orig, mask)
        assert w2.shape == wm.shape
        # transform applied identically: sample multisets preserved
        np.testing.assert_allclose(
            np.sort(np.asarray(w2), axis=1), np.sort(np.asarray(wm), axis=1),
            atol=1e-6,
        )
        # mask stays binary
        assert set(np.unique(np.asarray(m2))) <= {0.0, 1.0}


# ---------------------------------------------------------------------------
# Scheduler
# ---------------------------------------------------------------------------


def test_scheduler_selection_and_feedback():
    sched = EffectScheduler(rng=np.random.RandomState(0))
    bank = EffectBank.default_train_bank()
    idx, selections = sched.select_bank_indices(32, bank.specs)
    assert idx.shape == (32,) and idx.dtype == np.int32
    assert all(0 <= i < len(bank) for i in idx)
    assert len(selections) == 32

    # feedback: highpass 3500 always fails, 500 always succeeds
    for _ in range(50):
        sched.update_effect_metrics("highpass_filter", {"cutoff_freq": 3500},
                                    0.4, 0.5)
        sched.update_effect_metrics("highpass_filter", {"cutoff_freq": 500},
                                    0.0, 0.99)
    # success-rate weighting: 500 gets weight 0.6 vs 3500's 0.1 -> selected
    # ~86% of the time
    counts = {500: 0, 3500: 0}
    for _ in range(400):
        p = sched._resolve_effect_params(
            sched.effect_params["highpass_filter"], "highpass_filter"
        )
        counts[p["cutoff_freq"]] += 1
    assert counts[500] > counts[3500] * 2, counts

    # EMA history recorded
    assert sched.effect_metrics_history["highpass_filter"]["ber"] is not None

    # adapt_effect_probabilities works but is off-path (never auto-called)
    before = dict(sched.effect_probabilities)
    sched.adapt_effect_probabilities()
    after = sched.effect_probabilities
    assert abs(sum(after.values()) - 1.0) < 1e-9
    assert before != after


def test_scheduler_state_roundtrip():
    sched = EffectScheduler(rng=np.random.RandomState(0))
    sched.update_effect_metrics("speed", {"speed": 0.8}, 0.1, 0.9)
    state = sched.state_dict()
    sched2 = EffectScheduler(rng=np.random.RandomState(1))
    sched2.load_state_dict(state)
    assert sched2.effect_metrics_history["speed"]["ber"] == pytest.approx(0.1)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def test_ber_full_and_partial_mask():
    b_, t, w = 2, 100, 16
    bits = jnp.asarray(np.random.RandomState(0).randint(0, 2, (b_, w)))
    # logits strongly encode the bits everywhere
    logits = (bits[:, None, :] * 2.0 - 1.0) * 10.0
    logits = jnp.broadcast_to(logits, (b_, t, w))
    assert float(ber(logits, bits)) == 0.0
    # flipped logits -> BER 1
    assert float(ber(-logits, bits)) == 1.0
    # partial mask: correct in masked region, garbage elsewhere
    noise = jnp.asarray(
        np.random.RandomState(1).randn(b_, t, w).astype(np.float32) * 10
    )
    half = jnp.concatenate([jnp.ones((b_, t // 2)), jnp.zeros((b_, t // 2))], 1)
    mixed = jnp.where(half[:, :, None] > 0, logits, noise)
    assert float(ber(mixed, bits, half)) == 0.0
    # per-sample variant
    ps = ber(mixed, bits, half, per_sample=True)
    assert ps.shape == (b_,)


def test_miou_cases():
    full = jnp.ones((2, 100))
    assert float(miou(full, full)) == 1.0
    assert float(miou(full, jnp.zeros((2, 100)))) == 0.0
    half_pred = jnp.concatenate([jnp.ones((1, 50)), jnp.zeros((1, 50))], 1)
    m = float(miou(half_pred, jnp.ones((1, 100))))
    assert 0.2 < m < 0.3  # fg IoU 0.5, bg IoU 0 -> 0.25
    ps = miou(full, full, per_sample=True)
    assert ps.shape == (2,)


def test_sisnr():
    x = batch(2, 8000, seed=5)
    assert float(sisnr(x, x)) > 60  # identical -> very high
    assert float(sisnr(x * 0.5, x)) > 60  # scale-invariant
    y = x + 0.1 * batch(2, 8000, seed=6)
    v = float(sisnr(y, x))
    assert -5 < v < 25


# -- effects config YAML (reference model/watermarking.py:55-181) -------------


def test_load_effects_config_from_repo_yaml():
    from waveverify_tpu.effects import load_effects_config
    from waveverify_tpu.effects.effects import (
        DEFAULT_EVAL_EFFECTS,
        DEFAULT_TRAIN_EFFECTS,
    )

    cfg = load_effects_config()  # conf/effects_config.yml ships with the repo
    assert cfg.source.endswith("effects_config.yml")
    assert list(cfg.train_effects) == [(n, p) for n, p in DEFAULT_TRAIN_EFFECTS]
    assert list(cfg.eval_effects) == [(n, p) for n, p in DEFAULT_EVAL_EFFECTS]
    assert cfg.beta == 0.9
    assert cfg.ber_threshold == 0.001
    assert cfg.miou_threshold == 0.95
    assert set(cfg.effect_param_grid) == {
        "identity", "highpass_filter", "lowpass_filter", "bandpass_filter",
        "speed", "resample", "random_noise",
    }


def test_load_effects_config_fallback_and_custom(tmp_path):
    from waveverify_tpu.effects import load_effects_config

    # missing file -> fail-safe defaults, like the reference (:117-119)
    cfg = load_effects_config(str(tmp_path / "nope.yml"))
    assert cfg.source == "defaults"
    assert len(cfg.train_effects) == 9

    custom = tmp_path / "fx.yml"
    custom.write_text(
        "effect_param_grid:\n"
        "  identity: {}\n"
        "  random_noise:\n"
        "    noise_std: {choices: [0.01, 0.02]}\n"
        "train_effects:\n"
        "  - {name: identity, params: {}}\n"
        "  - {name: random_noise, params: {noise_std: 0.01}}\n"
        "eval_effects:\n"
        "  - {name: identity, params: {}}\n"
        "scheduler_config: {beta: 0.5, ber_threshold: 0.01, miou_threshold: 0.9}\n"
    )
    cfg = load_effects_config(str(custom))
    assert cfg.train_effects == (("identity", {}),
                                 ("random_noise", {"noise_std": 0.01}))
    assert cfg.eval_effects == (("identity", {}),)
    assert cfg.beta == 0.5

    # the loaded grid drives a scheduler + bank end to end
    sched = EffectScheduler(effect_params=cfg.effect_param_grid,
                            beta=cfg.beta, ber_threshold=cfg.ber_threshold,
                            miou_threshold=cfg.miou_threshold,
                            rng=np.random.RandomState(0))
    bank = EffectBank(cfg.train_effects, 16000)
    idx, sels = sched.select_bank_indices(4, bank.specs)
    assert idx.shape == (4,)
    a, m = bank.apply(batch(4, 1600), jnp.ones((4, 1600)), jnp.asarray(idx),
                      KEY)
    assert a.shape == (4, 1600)


def test_load_effects_config_two_element_list_params(tmp_path):
    from waveverify_tpu.effects import load_effects_config

    custom = tmp_path / "fx.yml"
    custom.write_text(
        "effect_param_grid: {identity: {}}\n"
        "train_effects:\n"
        "  - {name: identity, params: {band: [300, 4000]}}\n"
        "eval_effects:\n"
        "  - {name: identity, params: {}}\n"
    )
    cfg = load_effects_config(str(custom))
    # 2-element lists normalize to tuples (reference watermarking.py:104-109)
    assert cfg.train_effects[0][1]["band"] == (300, 4000)


def test_evaluate_ber():
    from waveverify_tpu.metrics import evaluate_ber

    probs = jnp.asarray([[0.9, 0.1, 0.8, 0.2]])
    bits = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    assert float(evaluate_ber(probs, bits)) == 0.0
    flipped = jnp.asarray([[0.0, 1.0, 1.0, 0.0]])
    assert float(evaluate_ber(probs, flipped)) == pytest.approx(0.5)
    with pytest.raises(ValueError):
        evaluate_ber(probs, bits[:, :2])


def test_effect_bank_scan_dispatch_matches_stack():
    """The per-sample lax.switch dispatch must produce the same outputs as
    stack-all for deterministic branches (random branches consume keys in a
    different split pattern by construction)."""
    from waveverify_tpu.effects.effects import EffectBank

    deterministic = [
        ("identity", {}),
        ("highpass_filter", {"cutoff_freq": 500}),
        ("lowpass_filter", {"cutoff_freq": 2000}),
        ("bandpass_filter", {"cutoff_freq_low": 300,
                             "cutoff_freq_high": 4000}),
        ("quantization", {"bit_depth": 8}),
        ("median_filter", {"kernel_size": 3}),
        ("smooth", {"window_size": 5}),
    ]
    rng = np.random.RandomState(0)
    B, T = 8, 2000
    audio = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, len(deterministic), B).astype(np.int32))
    key = jax.random.PRNGKey(7)

    stack = EffectBank(deterministic, dispatch="stack")
    scan = EffectBank(deterministic, dispatch="scan")
    a1, m1 = jax.jit(stack.apply)(audio, mask, idx, key)
    a2, m2 = jax.jit(scan.apply)(audio, mask, idx, key)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_effect_bank_scan_dispatch_random_branches_shapes():
    """Random branches under scan dispatch: right shapes, finite, and the
    selected branch is actually applied (noise branch changes the signal)."""
    from waveverify_tpu.effects.effects import EffectBank

    bank = EffectBank([("identity", {}),
                       ("random_noise", {"noise_std": 0.05})],
                      dispatch="scan")
    B, T = 4, 1500
    audio = jnp.zeros((B, T), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    idx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    out, m = jax.jit(bank.apply)(audio, mask, idx, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert np.all(out[0] == 0) and np.all(out[2] == 0)
    assert np.abs(out[1]).max() > 0.01 and np.abs(out[3]).max() > 0.01
    assert not np.allclose(out[1], out[3])  # per-sample keys differ


def test_host_codec_roundtrip_with_fake_ffmpeg(monkeypatch, tmp_path):
    """Exercise the mp3/aac ffmpeg round-trip row-by-row logic — incl. the
    encoder delay trim (reference utils/effect_augmentation.py:96-97) and
    the short-output pad — without a real encoder: subprocess.run is faked
    to write a decode WAV that prepends `delay` silence samples to the
    input, exactly what a codec's encoder delay looks like."""
    import shutil
    import subprocess
    import wave

    from waveverify_tpu.effects import effects as fx

    monkeypatch.setattr(shutil, "which", lambda name: "/usr/bin/ffmpeg")

    real_run = subprocess.run

    def fake_run(cmd, check=False, **kw):
        # only intercept ffmpeg invocations (numpy.testing lazily shells
        # out to lscpu through subprocess.run on first import)
        if not (isinstance(cmd, (list, tuple)) and cmd
                and cmd[0] == "ffmpeg"):
            return real_run(cmd, check=check, **kw)
        # cmd: ffmpeg -y -loglevel quiet -i <in> [-b:a BR] <out>
        src, dst = cmd[5], cmd[-1]
        if dst.endswith(".wav"):  # decode call: in.wav lives next to enc
            raw = os.path.join(os.path.dirname(dst), "in.wav")
            with wave.open(raw, "rb") as f:
                data = np.frombuffer(f.readframes(f.getnframes()), np.int16)
            delay = 1152 if src.endswith(".mp3") else 1024
            out = np.concatenate([np.zeros(delay, np.int16), data])
            with wave.open(dst, "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(16000)
                f.writeframes(out.tobytes())
        else:  # encode call: just mark the encoded file present
            with open(dst, "wb") as f:
                f.write(b"x")
        return subprocess.CompletedProcess(cmd, 0)

    import os

    monkeypatch.setattr(subprocess, "run", fake_run)

    rng = np.random.RandomState(3)
    audio = rng.randn(2, 4000).astype(np.float32) * 0.1
    for name, delay in (("mp3_lossy_compression", 1152),
                        ("aac_lossy_compression", 1024)):
        y, m = getattr(AudioEffects, name)(audio, None, None,
                                           sample_rate=16000)
        y = np.asarray(y)
        assert y.shape == audio.shape
        # delay-trimmed: output aligns with the input (int16 quantization
        # is the only loss in the fake codec)
        np.testing.assert_allclose(y, audio, atol=2.0 / 32768.0)


def test_host_codec_failsafe_without_ffmpeg(monkeypatch):
    """No ffmpeg in PATH -> the reference's fail-safe contract: input
    returned unchanged (reference utils/effect_augmentation.py:640-852)."""
    import shutil

    monkeypatch.setattr(shutil, "which", lambda name: None)
    audio = np.ones((1, 100), np.float32) * 0.5
    y, _ = AudioEffects.mp3_lossy_compression(audio, None, None)
    np.testing.assert_array_equal(np.asarray(y), audio)


def test_encodec_proxy_fallback_warns_and_tags(monkeypatch, caplog):
    """Encodec unavailable -> proxy substitution must WARN and set the
    `encodec_last_was_proxy` flag (round-2 advisor: silent substitution let
    callers measure quantize+lowpass as 'encodec robustness')."""
    import logging

    from waveverify_tpu.effects import effects as fx

    def boom(*a, **k):
        raise RuntimeError("no weights in image")

    monkeypatch.setattr(fx, "_encodec_roundtrip", boom)
    audio = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 2000).astype(np.float32) * 0.1)
    with caplog.at_level(logging.WARNING,
                         logger="waveverify_tpu.effects.effects"):
        y, _ = AudioEffects.encodec(audio, None, jax.random.PRNGKey(0))
    assert AudioEffects.encodec_last_was_proxy is True
    assert any("PROXY" in r.message for r in caplog.records)
    assert np.asarray(y).shape == (1, 2000)


def test_time_shift_rolls_audio_and_mask_together():
    import jax.numpy as jnp

    from waveverify_tpu.effects.effects import AudioEffects

    b, t = 2, 1000
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(b, t).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, t) > 0.5).astype(np.float32))
    out, m = AudioEffects.time_shift(audio, mask, None, shift=161)
    assert np.allclose(np.asarray(out), np.roll(np.asarray(audio), 161, -1))
    assert np.allclose(np.asarray(m), np.roll(np.asarray(mask), 161, -1))


def test_sub_hop_jitter_forward():
    """TrainConfig.sub_hop_jitter: the composite forward runs, keeps
    shapes, and actually moves the detector input (different jitter keys
    give different attacked-path logits for identical audio)."""
    import jax
    import jax.numpy as jnp

    from waveverify_tpu.config import (DetectorConfig, GeneratorConfig,
                                       LocatorConfig, TrainConfig)
    from waveverify_tpu.effects.effects import EffectBank
    from waveverify_tpu.train.watermarking import (WatermarkModels,
                                                   forward_train)

    SMALL = dict(dimension=32, channels_enc=8, kernel_size=5,
                 last_kernel_size=5, residual_kernel_size=5, dilation_base=1,
                 skip="identity", causal=True, encoder_l2norm=True, bias=True,
                 spec_compression="log", zero_init=False)
    cfg = TrainConfig(
        generator=GeneratorConfig(channels_dec=12, n_residual_enc=1,
                                  n_residual_dec=1, **SMALL),
        detector=DetectorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        locator=LocatorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        sub_hop_jitter=True,
    )
    models = WatermarkModels.from_config(cfg)
    from waveverify_tpu.train.state import create_train_state

    b, t = 2, 3200
    state = create_train_state(cfg, jax.random.PRNGKey(0), models,
                               example_length=t)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.randint(0, 2, (b, 16)).astype(np.float32))
    bank = EffectBank([("identity", {})])
    idx = jnp.zeros((b,), jnp.int32)
    hop = cfg.generator.hop_length

    def run(seed):
        return forward_train(models, state.wm_params, jax.random.PRNGKey(seed),
                             audio, msg, idx, bank, remat=False,
                             clean_detector=True, jitter_hop=hop)

    o1, o2 = run(1), run(2)
    assert o1["detector_logits"].shape == (b, t, 16)
    assert o1["mask"].shape == (b, t)
    # different keys -> different sub-hop placements -> different logits
    assert not np.allclose(np.asarray(o1["detector_logits_clean"]),
                           np.asarray(o2["detector_logits_clean"]))
    # jitter off reproduces the un-jittered forward deterministically
    a = forward_train(models, state.wm_params, jax.random.PRNGKey(1), audio,
                      msg, idx, bank, remat=False, jitter_hop=0)
    bb = forward_train(models, state.wm_params, jax.random.PRNGKey(1), audio,
                       msg, idx, bank, remat=False, jitter_hop=0)
    assert np.allclose(np.asarray(a["detector_logits"]),
                       np.asarray(bb["detector_logits"]))
