"""Training-layer tests: composite forward, full train step on the 8-device
virtual mesh, optimizer semantics, data pipeline, checkpointing.

Uses a shrunken (but topologically identical) config so the jitted step
compiles in seconds on CPU.
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
    LossConfig,
    TrainConfig,
)
from waveverify_tpu.effects.effects import EffectBank
from waveverify_tpu.effects.scheduler import EffectScheduler
from waveverify_tpu.parallel import make_mesh, shard_batch, shard_train_step
from waveverify_tpu.train import (
    WatermarkModels,
    create_train_state,
    forward_audio_sample,
    forward_train,
    forward_valid,
    make_train_step,
    make_val_step,
)
from waveverify_tpu.train.data import (
    SyntheticAudioDataset,
    generate_random_message,
)
from waveverify_tpu.train.state import clip_by_global_norm, param_count

SMALL = dict(
    dimension=32, channels_enc=8, kernel_size=5, last_kernel_size=5,
    residual_kernel_size=5, dilation_base=1, skip="identity", causal=True,
    encoder_l2norm=True, bias=True, spec_compression="log", zero_init=False,
)


def tiny_config(batch_size: int = 4) -> TrainConfig:
    return TrainConfig(
        generator=GeneratorConfig(channels_dec=12, n_residual_enc=1,
                                  n_residual_dec=1, **SMALL),
        detector=DetectorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        locator=LocatorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        discriminator=DiscriminatorConfig(periods=(2,), fft_sizes=(256,)),
        loss=LossConfig(
            stft_window_lengths=(256,),
            mel_n_mels=(5, 10),
            mel_window_lengths=(128, 256),
        ),
        batch_size=batch_size,
    )


SMALL_BANK = EffectBank([
    ("identity", {}),
    ("highpass_filter", {"cutoff_freq": 500}),
    ("random_noise", {"noise_std": 0.001}),
])

B, T = 4, 3200


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(B)
    models = WatermarkModels.from_config(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models,
                               example_length=T)
    rng = np.random.RandomState(0)
    audio = rng.randn(B, T).astype(np.float32) * 0.1
    msg = rng.randint(0, 2, (B, 16)).astype(np.float32)
    idx = rng.randint(0, len(SMALL_BANK), B).astype(np.int32)
    return cfg, models, state, audio, msg, idx


def test_forward_train_shapes(setup):
    cfg, models, state, audio, msg, idx = setup
    out = jax.jit(
        lambda p, a, m, i, k: forward_train(models, p, k, a, m, i, SMALL_BANK)
    )(state.wm_params, audio, msg, idx, jax.random.PRNGKey(1))
    assert out["residual"].shape == (B, T)
    assert out["watermarked"].shape == (B, T)
    assert out["mask"].shape == (B, T)
    assert out["detector_logits"].shape == (B, T, 16)
    assert out["locator_logits"].shape == (B, T)
    mask = np.asarray(out["mask"])
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # watermarked = residual + audio exactly
    np.testing.assert_allclose(
        np.asarray(out["watermarked"]),
        np.asarray(out["residual"]) + audio, atol=1e-6,
    )


def test_forward_train_lowband_channel(setup):
    """lowband_cutoff > 0 adds the lowpassed clean decode channel; the
    logits differ from the attacked-path logits (it reads a different,
    band-limited signal)."""
    cfg, models, state, audio, msg, idx = setup
    out = jax.jit(
        lambda p, a, m, i, k: forward_train(
            models, p, k, a, m, i, SMALL_BANK, lowband_cutoff=2000.0
        )
    )(state.wm_params, audio, msg, idx, jax.random.PRNGKey(1))
    assert out["detector_logits_lowband"].shape == (B, T, 16)
    assert "detector_logits_clean" not in out  # clean_detector stays off
    assert not np.allclose(np.asarray(out["detector_logits_lowband"]),
                           np.asarray(out["detector_logits"]))


@pytest.mark.slow
def test_train_step_lowband_loss(setup):
    """lambda_dec_lowband > 0 logs a finite dec/loss_lowband and changes the
    watermarking gradient (the term is wired into the total)."""
    import dataclasses

    cfg, models, state, audio, msg, idx = setup
    cfg_lb = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, lambda_dec_lowband=5.0)
    )
    step_base = jax.jit(make_train_step(models, cfg, SMALL_BANK),
                       donate_argnums=())
    step_lb = jax.jit(make_train_step(models, cfg_lb, SMALL_BANK),
                     donate_argnums=())
    key = jax.random.PRNGKey(3)
    _, m_base = step_base(state, audio, msg, idx, key)
    s_lb, m_lb = step_lb(state, audio, msg, idx, key)
    assert "dec/loss_lowband" not in m_base
    lb = float(np.asarray(m_lb["dec/loss_lowband"]))
    assert np.isfinite(lb) and lb > 0
    # the extra term steers the detector update away from the base step's
    d_base = jax.tree_util.tree_leaves(
        step_base(state, audio, msg, idx, key)[0].wm_params["detector"])[0]
    d_lb = jax.tree_util.tree_leaves(s_lb.wm_params["detector"])[0]
    assert not np.allclose(np.asarray(d_base), np.asarray(d_lb))


@pytest.mark.slow
def test_forward_audio_sample(setup):
    cfg, models, state, audio, msg, idx = setup
    residual, watermarked = forward_audio_sample(
        models, state.wm_params, jnp.asarray(audio), jnp.asarray(msg)
    )
    np.testing.assert_allclose(np.asarray(watermarked),
                               np.asarray(residual) + audio, atol=1e-6)


@pytest.mark.slow
def test_train_step_runs_and_learns(setup):
    """Two steps on the 8-device mesh: params change, metrics finite, and the
    decoding loss direction is sane."""
    cfg, models, state, audio, msg, idx = setup
    mesh = make_mesh(4)  # B=4 over 4 of the 8 virtual devices
    step = shard_train_step(
        make_train_step(models, cfg, SMALL_BANK), mesh, donate_state=False
    )
    a, m, i = shard_batch(mesh, audio, msg, idx)
    key = jax.random.PRNGKey(2)
    state1, metrics1 = step(state, a, m, i, key)
    state2, metrics2 = step(state1, a, m, i, key)

    for k in ("loss", "adv/disc_loss", "dec/loss", "loc/loss", "stft/loss",
              "mel/loss", "waveform/loss", "train/ber", "train/miou"):
        assert np.isfinite(float(np.asarray(metrics1[k]))), k

    assert int(state2.step) == 2
    # params actually moved
    g0 = jax.tree_util.tree_leaves(state.wm_params["generator"])[0]
    g2 = jax.tree_util.tree_leaves(state2.wm_params["generator"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g2))
    d0 = jax.tree_util.tree_leaves(state.disc_params)[0]
    d2 = jax.tree_util.tree_leaves(state2.disc_params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d2))
    # per-sample metrics have batch shape
    assert np.asarray(metrics1["per_sample_ber"]).shape == (B,)
    assert np.asarray(metrics1["per_sample_miou"]).shape == (B,)


@pytest.mark.slow
def test_train_step_disc_gate(setup):
    """train_disc flag: 1 reproduces the ungated step exactly; 0 leaves the
    discriminator (params + opt state) untouched, zeroes the adversarial
    logs, and still updates the watermarking subtree."""
    cfg, models, state, audio, msg, idx = setup
    mesh = make_mesh(4)
    step_ref = shard_train_step(
        make_train_step(models, cfg, SMALL_BANK), mesh, donate_state=False
    )
    step_gated = shard_train_step(
        make_train_step(models, cfg, SMALL_BANK), mesh, donate_state=False,
        with_percep_scale=True, with_train_disc=True,
    )
    a, m, i = shard_batch(mesh, audio, msg, idx)
    key = jax.random.PRNGKey(2)

    s_ref, m_ref = step_ref(state, a, m, i, key)
    s_on, m_on = step_gated(state, a, m, i, key, np.float32(1.0),
                            np.bool_(True))
    for k in ("loss", "adv/disc_loss", "dec/loss", "adv/gen_loss"):
        np.testing.assert_allclose(np.asarray(m_on[k]), np.asarray(m_ref[k]),
                                   rtol=1e-5, err_msg=k)

    s_off, m_off = step_gated(state, a, m, i, key, np.float32(1.0),
                              np.bool_(False))
    assert float(np.asarray(m_off["adv/disc_loss"])) == 0.0
    assert float(np.asarray(m_off["adv/gen_loss"])) == 0.0
    for d0, d1 in zip(jax.tree_util.tree_leaves(state.disc_params),
                      jax.tree_util.tree_leaves(s_off.disc_params)):
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    g0 = jax.tree_util.tree_leaves(state.wm_params["generator"])[0]
    g1 = jax.tree_util.tree_leaves(s_off.wm_params["generator"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    assert np.isfinite(float(np.asarray(m_off["loss"])))


def test_val_step(setup):
    cfg, models, state, audio, msg, idx = setup
    eval_effects = [("identity", {}), ("random_noise", {"noise_std": 0.001})]
    val = jax.jit(make_val_step(models, cfg, eval_effects))
    out = val(state, jnp.asarray(audio), jnp.asarray(msg),
              jax.random.PRNGKey(3))
    assert "val/ber/identity" in out and "val/miou/random_noise" in out
    for k, v in out.items():
        assert np.isfinite(float(np.asarray(v))), k
    assert 0.0 <= float(np.asarray(out["val/ber"])) <= 1.0
    assert 0.0 <= float(np.asarray(out["val/miou"])) <= 1.0


@pytest.mark.slow
def test_forward_valid_sweep(setup):
    cfg, models, state, audio, msg, idx = setup
    out = forward_valid(models, state.wm_params, jax.random.PRNGKey(4),
                        jnp.asarray(audio), jnp.asarray(msg),
                        eval_effects=[("identity", {})])
    assert "identity" in out["effects"]
    res = out["effects"]["identity"]
    # reference _forward_valid augments before the sweep (localization +
    # sequence, model/watermarking.py:463-467): ground truth is a real
    # spliced mask, binary, mostly-watermarked (~20% reverted segments)
    m = np.asarray(res["mask"])
    assert set(np.unique(m)).issubset({0.0, 1.0})
    assert m.mean() > 0.2


def test_clip_by_global_norm():
    tree = {"a": jnp.ones((4,)) * 3.0, "b": jnp.ones((2,)) * 4.0}
    # global norm = sqrt(4*9 + 2*16) = sqrt(68)
    clipped, norm = clip_by_global_norm(tree, 1.0)
    assert np.isclose(float(norm), np.sqrt(68.0), rtol=1e-5)
    cn = np.sqrt(sum(float(np.sum(np.square(x)))
                     for x in jax.tree_util.tree_leaves(clipped)))
    assert cn <= 1.0 + 1e-4
    # below the limit: unchanged
    same, _ = clip_by_global_norm(tree, 100.0)
    np.testing.assert_allclose(np.asarray(same["a"]), np.asarray(tree["a"]))


def test_scheduler_bank_bridge():
    sched = EffectScheduler(rng=np.random.RandomState(0))
    bank = EffectBank.default_train_bank()
    idx, selections = sched.select_bank_indices(32, bank.specs)
    assert idx.shape == (32,) and idx.dtype == np.int32
    assert len(selections) == 32
    assert idx.min() >= 0 and idx.max() < len(bank)
    # every selected (name, params) maps to the right branch
    for i, (name, params) in zip(idx, selections):
        assert bank.specs[i][0] == name
    # reference cap quirk: at most |catalog| non-identity picks
    idx_capped, sel_capped = sched.select_bank_indices(
        32, bank.specs, match_reference_cap=True)
    assert len(sel_capped) == len(sched.effect_params)
    assert (idx_capped[len(sel_capped):] == 0).all()


def test_scheduler_feedback_loop():
    from waveverify_tpu.train.loop import _feed_scheduler

    sched = EffectScheduler(rng=np.random.RandomState(0))
    selections = [("highpass_filter", {"cutoff_freq": 500}),
                  ("speed", {"speed": 0.8})]
    _feed_scheduler(
        sched,
        {"ber": np.array([0.0, 0.4]), "miou": np.array([0.99, 0.7])},
        selections,
    )
    assert sched.effect_metrics_history["highpass_filter"]["ber"] == 0.0
    assert sched.effect_metrics_history["speed"]["ber"] == pytest.approx(0.4)
    # success tracking recorded for the param choices
    hp = sched.parameter_success_rates["highpass_filter"]
    assert hp[("cutoff_freq", 500)] == [True]
    sp = sched.parameter_success_rates["speed"]
    assert sp[("speed", 0.8)] == [False]


def test_synthetic_dataset_and_messages():
    ds = SyntheticAudioDataset(duration=0.5, seed=1)
    batch = ds.batch(3)
    assert batch.shape == (3, 8000) and batch.dtype == np.float32
    assert np.abs(batch).max() <= 1.0
    # the vectorized producer must still draw params PER SAMPLE: rows must
    # differ (f0/phase/envelope) and each row carries real signal energy
    assert np.abs(batch[0] - batch[1]).max() > 1e-3
    assert (np.abs(batch).max(axis=1) > 0.1).all()
    msg = generate_random_message(np.random.RandomState(0), 5, 16)
    assert msg.shape == (5, 16)
    assert set(np.unique(msg)) <= {0.0, 1.0}


@pytest.mark.slow
def test_checkpoint_roundtrip(setup, tmp_path):
    from waveverify_tpu.train import checkpoint as ckpt

    cfg, models, state, audio, msg, idx = setup
    host = {"step": 7, "scheduler_state": {"total_effects": 3}}
    ckpt.save_checkpoint(str(tmp_path), "latest", state, host)
    assert ckpt.checkpoint_tags(str(tmp_path)) == ["latest"]

    # fresh target with different values
    target = create_train_state(cfg, jax.random.PRNGKey(99), models,
                                example_length=T)
    restored, meta = ckpt.load_checkpoint(str(tmp_path), "latest", target)
    assert meta["step"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.wm_params),
                    jax.tree_util.tree_leaves(restored.wm_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # params-only restore must work WITHOUT a TrainState template, so
    # inference loads succeed even when the checkpoint was trained with a
    # different optimizer structure (e.g. AdamW.detector_lr_mult changes
    # the optax chain pytree — regression for the r2c export failure)
    params = ckpt.load_params(str(tmp_path), "latest")
    for a, b in zip(jax.tree_util.tree_leaves(state.wm_params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wav_io_roundtrip(tmp_path):
    from waveverify_tpu.train.data import AudioFolderDataset, read_wav
    from waveverify_tpu.api.audio_io import save_audio

    x = (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000) * 0.5).astype(
        np.float32
    )
    save_audio(x, tmp_path / "a.wav")
    y, sr = read_wav(str(tmp_path / "a.wav"))
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1e-3)

    ds = AudioFolderDataset([str(tmp_path)], duration=0.25)
    crop = ds.sample_crop()
    assert crop.shape == (4000,)


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    """Outer train() loop: effects YAML -> bank/scheduler, JSONL + optional
    TensorBoard sinks, checkpoint tags, resume metadata. Also guards the
    single-compile property: the initial state is committed to the mesh
    before step 0, so step 1 must NOT recompile the train step (the
    mesh-axis aval mismatch recompile doubled compile cost and OOMed
    memory-tight remote compile services)."""
    import dataclasses
    import logging

    from waveverify_tpu.train.loop import TrainerConfig, train
    from waveverify_tpu.train import checkpoint as ckpt

    compile_events = []

    class _Counter(logging.Handler):
        def emit(self, record):
            m = record.getMessage()
            if "Compiling jit(train_step)" in m:
                compile_events.append(m)

    handler = _Counter()
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(handler)

    fx = tmp_path / "fx.yml"
    fx.write_text(
        "effect_param_grid:\n"
        "  identity: {}\n"
        "  random_noise:\n"
        "    noise_std: {choices: [0.001]}\n"
        "train_effects:\n"
        "  - {name: identity, params: {}}\n"
        "  - {name: random_noise, params: {noise_std: 0.001}}\n"
        "eval_effects:\n"
        "  - {name: identity, params: {}}\n"
        "scheduler_config: {beta: 0.9, ber_threshold: 0.001, miou_threshold: 0.95}\n"
    )
    cfg = dataclasses.replace(
        tiny_config(B), num_iters=2, valid_freq=2, sample_freq=10**9,
        train_duration=0.2, val_duration=0.2, val_batch_size=2,
    )
    trainer = TrainerConfig(
        ckpt_dir=str(tmp_path / "ckpt"),
        log_file=str(tmp_path / "log.jsonl"),
        tensorboard_dir=str(tmp_path / "tb"),
        effects_config=str(fx),
        dump_samples=False,
        log_every=1,
        num_devices=1,
    )
    try:
        train(cfg, trainer)
    finally:
        jax.config.update("jax_log_compiles", False)
        logging.getLogger("jax._src.interpreters.pxla").removeHandler(handler)
    assert (tmp_path / "log.jsonl").exists()
    lines = (tmp_path / "log.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 2
    assert "latest" in ckpt.checkpoint_tags(str(tmp_path / "ckpt"))
    if (tmp_path / "tb").exists():  # written only when tensorboard importable
        assert any(f.startswith("events") for f in
                   __import__("os").listdir(tmp_path / "tb"))
    assert len(compile_events) == 1, (
        f"train step compiled {len(compile_events)}x over 2 steps — the "
        "initial state must be mesh-committed so step 2 reuses step 1's "
        "executable"
    )


@pytest.mark.slow
def test_multi_step_dispatch_matches_single(tmp_path):
    """K steps per dispatch (lax.scan) is numerically identical to K=1:
    the inner step folds the key with state.step, the data stream and
    effect-index sequence are seed-deterministic, and the scan body IS the
    single-step program."""
    import dataclasses
    import json

    from waveverify_tpu.train.loop import TrainerConfig, train

    fx = tmp_path / "fx.yml"
    fx.write_text(
        "effect_param_grid:\n"
        "  identity: {}\n"
        "  random_noise:\n"
        "    noise_std: {choices: [0.001]}\n"
        "train_effects:\n"
        "  - {name: identity, params: {}}\n"
        "  - {name: random_noise, params: {noise_std: 0.001}}\n"
        "eval_effects:\n"
        "  - {name: identity, params: {}}\n"
    )
    cfg = dataclasses.replace(
        tiny_config(B), num_iters=4, valid_freq=10**9, sample_freq=10**9,
        train_duration=0.2, val_duration=0.2, val_batch_size=2, remat=False,
    )

    logs = {}
    for k_disp in (1, 2):
        log = tmp_path / f"log_k{k_disp}.jsonl"
        trainer = TrainerConfig(
            ckpt_dir=str(tmp_path / f"ckpt_k{k_disp}"),
            log_file=str(log),
            effects_config=str(fx),
            dump_samples=False,
            log_every=1,
            num_devices=1,
            steps_per_dispatch=k_disp,
        )
        train(cfg, trainer, max_steps=4)
        logs[k_disp] = [json.loads(l) for l in log.read_text().splitlines()]

    # the K=2 run logs steps 1 and 3 (last of each dispatch); compare loss
    by_step_1 = {e["step"]: e for e in logs[1]}
    by_step_2 = {e["step"]: e for e in logs[2]}
    assert 3 in by_step_2, sorted(by_step_2)
    for s in by_step_2:
        if s in by_step_1 and "loss" in by_step_2[s]:
            np.testing.assert_allclose(
                by_step_2[s]["loss"], by_step_1[s]["loss"],
                rtol=2e-4,
            )


@pytest.mark.slow
def test_multi_step_dispatch_disc_cadence(tmp_path):
    """K>1 dispatches scan a [K] per-step disc-cadence vector: with the
    BER-gated ramp active and warmup_disc_every=2, K=2 must reproduce K=1's
    alternating disc updates exactly (a constant-per-dispatch gate would
    train the discriminator on both steps of every gated dispatch)."""
    import dataclasses
    import json

    from waveverify_tpu.train.loop import TrainerConfig, train

    fx = tmp_path / "fx.yml"
    fx.write_text(
        "effect_param_grid:\n"
        "  identity: {}\n"
        "train_effects:\n"
        "  - {name: identity, params: {}}\n"
        "eval_effects:\n"
        "  - {name: identity, params: {}}\n"
    )
    base = tiny_config(B)
    cfg = dataclasses.replace(
        base, num_iters=4, valid_freq=10**9, sample_freq=10**9,
        train_duration=0.2, val_duration=0.2, val_batch_size=2, remat=False,
        loss=dataclasses.replace(base.loss, warmup_steps=10,
                                 warmup_init_scale=0.01,
                                 warmup_ber_gate=0.05,
                                 warmup_disc_every=2),
    )

    logs = {}
    for k_disp in (1, 2):
        log = tmp_path / f"log_k{k_disp}.jsonl"
        train(cfg, TrainerConfig(
            ckpt_dir=str(tmp_path / f"ckpt_k{k_disp}"),
            log_file=str(log), effects_config=str(fx), dump_samples=False,
            log_every=1, num_devices=1, steps_per_dispatch=k_disp,
        ), max_steps=4)
        # keep train rows only — the end-of-run val/checkpoint row shares
        # the final step number and would overwrite the train row
        logs[k_disp] = {e["step"]: e for e in
                        map(json.loads, log.read_text().splitlines())
                        if "grad_norm/discriminator" in e}

    # disc trains on steps 0 and 2 only; its grad norm at step 1/3 is 0 in
    # both runs, and every shared logged scalar matches across K
    assert 3 in logs[2], sorted(logs[2])
    assert logs[2][3]["grad_norm/discriminator"] == 0.0
    for s, row in logs[2].items():
        if s in logs[1] and "loss" in row:
            for key in ("loss", "grad_norm/discriminator"):
                np.testing.assert_allclose(
                    row[key], logs[1][s][key], rtol=2e-4, atol=1e-7,
                    err_msg=f"step {s} {key}",
                )


def test_cli_flag_plumbing(monkeypatch):
    """CLI flags reach TrainerConfig/TrainConfig without starting a run."""
    import sys
    from unittest import mock

    import waveverify_tpu.train.__main__ as tm

    seen = {}

    def fake_train(cfg, trainer, max_steps=None, resume=False):
        seen.update(cfg=cfg, trainer=trainer, max_steps=max_steps,
                    resume=resume)

    argv = ["prog", "--max-steps", "0", "--batch-size", "8",
            "--no-remat", "--pallas", "off", "--steps-per-dispatch", "4",
            "--conv-precision", "default", "--log-every", "7",
            "--set", "AdamW.lr=2e-4", "--set", "Generator.dimension=64",
            "--effects-config", "conf/effects_config.yml",
            "--resume"]
    monkeypatch.setattr(sys, "argv", argv)
    with mock.patch("waveverify_tpu.train.loop.train", fake_train):
        tm.main()

    cfg, trainer = seen["cfg"], seen["trainer"]
    assert cfg.batch_size == 8 and cfg.remat is False
    assert cfg.optim.lr == 2e-4 and cfg.generator.dimension == 64
    assert trainer.pallas_mode == "off"
    assert trainer.steps_per_dispatch == 4
    assert trainer.conv_precision == "default"
    assert trainer.log_every == 7
    assert trainer.effects_config == "conf/effects_config.yml"
    assert seen["max_steps"] == 0 and seen["resume"] is True


@pytest.mark.slow
def test_init_weights_warm_start(tmp_path):
    """train(init_weights=...) loads compact npz params into the fresh state
    (the cross-round continuation path: orbax dirs are gitignored, so a new
    round warm-starts from the committed save_weights_npz file)."""
    import dataclasses

    from waveverify_tpu.convert import load_weights_npz, save_weights_npz
    from waveverify_tpu.train.loop import TrainerConfig, train

    cfg = dataclasses.replace(tiny_config(2), num_iters=0, train_duration=0.2,
                              val_duration=0.2, val_batch_size=2)
    models = WatermarkModels.from_config(cfg)
    donor = create_train_state(cfg, jax.random.PRNGKey(42), models,
                               example_length=T)
    npz = tmp_path / "w.npz"
    save_weights_npz(jax.tree_util.tree_map(np.asarray, donor.wm_params), npz,
                     dtype=np.float32)

    trainer = TrainerConfig(
        ckpt_dir=str(tmp_path / "ckpt"), log_file=None, dump_samples=False,
        num_devices=1, init_weights=str(npz),
    )
    state = train(cfg, trainer, max_steps=0)
    got = jax.tree_util.tree_leaves(state.wm_params)
    want = jax.tree_util.tree_leaves(load_weights_npz(npz))
    assert all(np.allclose(np.asarray(g), w) for g, w in zip(got, want))


@pytest.mark.slow
def test_init_meta_restores_controllers(tmp_path):
    """--init-meta alongside --init-weights restores the step counter (and
    controller state) from a committed meta.json, so a warm start after a
    container recycle continues where the lost orbax checkpoint left off
    instead of replaying the gate curriculum from step 0."""
    import dataclasses
    import json

    from waveverify_tpu.convert import save_weights_npz
    from waveverify_tpu.train.loop import TrainerConfig, train

    cfg = dataclasses.replace(
        tiny_config(2), num_iters=0, train_duration=0.2, val_duration=0.2,
        val_batch_size=2,
        loss=dataclasses.replace(tiny_config(2).loss, warmup_steps=100,
                                 warmup_init_scale=0.01, warmup_ber_gate=0.1,
                                 warmup_fx_gate=0.12, warmup_nbits_start=4))
    models = WatermarkModels.from_config(cfg)
    donor = create_train_state(cfg, jax.random.PRNGKey(42), models,
                               example_length=T)
    npz = tmp_path / "w.npz"
    save_weights_npz(jax.tree_util.tree_map(np.asarray, donor.wm_params), npz,
                     dtype=np.float32)
    meta = {"step": 321,
            "ramp_state": {"progress": 0.09, "ema": 0.35, "fx_latched": 1.0,
                           "msg_latched": 1.0, "msg_refrozen": 0.0,
                           "bit_acc_ema": [0.5] * 16},
            "nbits_state": {"n_active": 16, "acc_ema": [0.5] * 16}}
    mf = tmp_path / "meta.json"
    mf.write_text(json.dumps(meta))

    trainer = TrainerConfig(
        ckpt_dir=str(tmp_path / "ckpt"), log_file=None, dump_samples=False,
        num_devices=1, init_weights=str(npz), init_meta=str(mf),
    )
    state = train(cfg, trainer, max_steps=0)
    assert int(np.asarray(state.step)) == 321


def test_ramp_and_nbits_state_roundtrip():
    """BerGatedRamp / NbitsCurriculum state dicts round-trip exactly — the
    contract --init-meta and checkpoint resume both rely on."""
    from waveverify_tpu.train.loop import BerGatedRamp, NbitsCurriculum

    r = BerGatedRamp(1000, 0.01, 0.1, fx_gate=0.12, msg_freeze_gate=0.3,
                     msg_refreeze=True, nbits=16)
    r.load_state_dict({"progress": 0.093, "ema": 0.349, "fx_latched": 1.0,
                       "msg_latched": 1.0, "msg_refrozen": 0.0,
                       "bit_acc_ema": [0.4] * 16})
    assert r.attacks_on() and r.msg_on()
    assert abs(r.scale() - 0.01 ** (1 - 0.093)) < 1e-12
    r2 = BerGatedRamp(1000, 0.01, 0.1, fx_gate=0.12, msg_freeze_gate=0.3,
                      msg_refreeze=True, nbits=16)
    r2.load_state_dict(r.state_dict())
    assert r2.state_dict() == r.state_dict()

    c = NbitsCurriculum(16, 4, 0.02)
    c.load_state_dict({"n_active": 16, "acc_ema": [0.6] * 16})
    assert c.n_active == 16 and c.mask().sum() == 16
    c2 = NbitsCurriculum(16, 4, 0.02)
    c2.load_state_dict(c.state_dict())
    assert c2.state_dict() == c.state_dict()


@pytest.mark.slow
def test_reinit_msg_path_gating(tmp_path):
    """--reinit-msg-path grafts a fresh message path over an npz warm start
    on EVERY relaunch without a checkpoint (a crash before the first save
    re-loads the stale npz msg path), and is skipped exactly when the run
    resumes from a checkpoint (where msg-path learning actually lives)."""
    import dataclasses

    from waveverify_tpu.convert import save_weights_npz
    from waveverify_tpu.train import checkpoint as ckpt
    from waveverify_tpu.train.loop import TrainerConfig, train

    cfg = dataclasses.replace(tiny_config(2), num_iters=0, train_duration=0.2,
                              val_duration=0.2, val_batch_size=2)
    models = WatermarkModels.from_config(cfg)
    donor = create_train_state(cfg, jax.random.PRNGKey(42), models,
                               example_length=T)
    npz = tmp_path / "w.npz"
    save_weights_npz(jax.tree_util.tree_map(np.asarray, donor.wm_params), npz,
                     dtype=np.float32)

    def leaves_by_path(params):
        flat = {}

        def rec(node, path, in_msg=False):
            if hasattr(node, "items"):
                for k, v in node.items():
                    rec(v, path + (k,),
                        in_msg or k.startswith(("msg_", "film_")))
            else:
                flat[path] = (np.asarray(node), in_msg)
        rec(params, ())
        return flat

    trainer = TrainerConfig(
        ckpt_dir=str(tmp_path / "ckpt"), log_file=None, dump_samples=False,
        num_devices=1, init_weights=str(npz), reinit_msg_path=True,
    )
    # launch 1: no checkpoint — graft must apply (msg path differs from npz)
    state = train(cfg, trainer, max_steps=0, resume=True)
    donor_flat = leaves_by_path(donor.wm_params["generator"])
    got_flat = leaves_by_path(state.wm_params["generator"])
    msg_diff = [not np.allclose(got_flat[p][0], donor_flat[p][0])
                for p in got_flat if got_flat[p][1]]
    other_same = [np.allclose(got_flat[p][0], donor_flat[p][0])
                  for p in got_flat if not got_flat[p][1]]
    assert msg_diff and any(msg_diff), "msg path was not re-initialized"
    assert other_same and all(other_same), "non-msg params were touched"

    # launch 2: still no checkpoint (crash-before-save) — graft re-applies
    state2 = train(cfg, trainer, max_steps=0, resume=True)
    got2 = leaves_by_path(state2.wm_params["generator"])
    assert any(not np.allclose(got2[p][0], donor_flat[p][0])
               for p in got2 if got2[p][1])

    # launch 3: checkpoint exists — graft must be SKIPPED (resume wins)
    ckpt.save_checkpoint(str(tmp_path / "ckpt"), "latest", donor,
                         host_state={"step": 5})
    state3 = train(cfg, trainer, max_steps=0, resume=True)
    got3 = leaves_by_path(state3.wm_params["generator"])
    assert all(np.allclose(got3[p][0], donor_flat[p][0]) for p in got3), \
        "resume-from-checkpoint must not re-wipe the message path"


@pytest.mark.slow
def test_split_disc_step_matches_monolithic(setup):
    """Split-program mode (VERDICT r3 task 5): disc_step followed by the
    update_disc=False train step must reproduce the monolithic step — same
    RNG streams, same disc-before-generator ordering — to float tolerance,
    over multiple steps."""
    from waveverify_tpu.train.step import make_disc_step

    cfg, models, state, audio, msg, idx = setup
    mono = jax.jit(make_train_step(models, cfg, SMALL_BANK))
    disc = jax.jit(make_disc_step(models, cfg))
    gen = jax.jit(make_train_step(models, cfg, SMALL_BANK,
                                  update_disc=False))
    key = jax.random.PRNGKey(42)

    s_m, s_s = state, state
    for _ in range(2):
        s_m, m_m = mono(s_m, audio, msg, idx, key)
        s_s, m_d = disc(s_s, audio, msg, key)
        s_s, m_g = gen(s_s, audio, msg, idx, key)
        assert np.allclose(float(m_m["adv/disc_loss"]),
                           float(m_d["adv/disc_loss"]), atol=1e-4)
        assert np.allclose(float(m_m["loss"]), float(m_g["loss"]),
                           rtol=1e-4, atol=1e-4)
        assert float(m_g["adv/disc_loss"]) == 0.0  # gen half reports zeros
    for a, b in zip(jax.tree_util.tree_leaves(s_m.wm_params),
                    jax.tree_util.tree_leaves(s_s.wm_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_m.disc_params),
                    jax.tree_util.tree_leaves(s_s.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-4)


def test_ber_gated_ramp_controller():
    """Host-side BerGatedRamp: holds while BER EMA is above the gate,
    advances while at/below it, never regresses, round-trips its state."""
    from waveverify_tpu.train.loop import BerGatedRamp

    ramp = BerGatedRamp(steps=10, init_scale=0.01, gate=0.1, beta=0.0)
    assert ramp.scale() == pytest.approx(0.01)
    for _ in range(50):  # chance-level BER: ramp must hold
        ramp.update(0.5)
    assert ramp.progress == 0.0 and ramp.scale() == pytest.approx(0.01)
    for _ in range(5):  # decoding works: ramp advances 1/steps per step
        ramp.update(0.0)
    assert ramp.progress == pytest.approx(0.5)
    assert ramp.scale() == pytest.approx(0.01 ** 0.5)
    ramp.update(0.5)  # squeeze broke decoding: pause, never regress
    assert ramp.progress == pytest.approx(0.5)
    for _ in range(20):
        ramp.update(0.0)
    assert ramp.progress == 1.0 and ramp.scale() == pytest.approx(1.0)

    other = BerGatedRamp(steps=10, init_scale=0.01, gate=0.1)
    other.load_state_dict(ramp.state_dict())
    assert other.progress == ramp.progress and other.ema == ramp.ema


def test_ber_gated_ramp_fx_latch():
    """Attack-curriculum latch (LossConfig.warmup_fx_gate): effects stay
    identity-only and the perceptual scale stays EXACTLY zero until the BER
    EMA first reaches fx_gate; then attacks latch on permanently, the EMA
    resets to the chance prior (so the stale clean-path value cannot ride
    through the lower perceptual gate), and the ramp behaves as before."""
    from waveverify_tpu.train.loop import BerGatedRamp

    ramp = BerGatedRamp(steps=10, init_scale=0.01, gate=0.05, beta=0.0,
                        fx_gate=0.2)
    assert not ramp.attacks_on()
    assert ramp.scale() == 0.0  # stage A: zero perceptual pressure
    ramp.update(0.5)
    assert not ramp.attacks_on()
    ramp.update(0.0)  # clean BER crosses fx_gate -> latch
    assert ramp.attacks_on()
    assert ramp.ema == pytest.approx(0.5)  # EMA reset to chance prior
    assert ramp.progress == 0.0  # squeeze must not have advanced
    assert ramp.scale() == pytest.approx(0.01)
    ramp.update(0.5)  # attacks broke decoding: latch stays, no progress
    assert ramp.attacks_on() and ramp.progress == 0.0
    ramp.update(0.0)  # attacked BER below the perceptual gate: squeeze
    assert ramp.progress == pytest.approx(0.1)

    # state round-trip preserves the latch
    other = BerGatedRamp(steps=10, init_scale=0.01, gate=0.05, fx_gate=0.2)
    assert not other.attacks_on()
    other.load_state_dict(ramp.state_dict())
    assert other.attacks_on() and other.progress == ramp.progress

    # fx_gate=0 (off) pre-latches: reference-style runs are unaffected
    off = BerGatedRamp(steps=10, init_scale=0.01, gate=0.05)
    assert off.attacks_on() and off.scale() == pytest.approx(0.01)


def test_ber_gated_ramp_msg_refreeze():
    """Lockstep-triggered re-freeze (warmup_msg_refreeze): after the freeze
    latch opens, an ACTIVE bit whose accuracy EMA pins WELL below chance
    (<0.35 — anti-aligned, not merely weak) re-freezes the msg path; it
    thaws once all active bits recover (>0.45). Inactive (curriculum-
    masked) bits never trigger it, and weak-but-aligned bits (~0.4-0.6)
    must NOT trigger it (they need generator growth, not a freeze)."""
    from waveverify_tpu.train.loop import BerGatedRamp

    ramp = BerGatedRamp(steps=10, init_scale=0.01, gate=0.05, beta=0.0,
                        msg_freeze_gate=0.2, msg_refreeze=True, nbits=4)
    good = np.array([1.0, 1.0, 1.0, 1.0])
    assert not ramp.msg_on()  # freeze latch not yet open
    ramp.update(0.1, per_bit_acc=good, n_active=4)  # EMA crosses the gate
    assert ramp.msg_on()

    # a WEAK-but-aligned active bit (acc ~0.4) must NOT refreeze — it needs
    # the generator to grow its channel, which a freeze would block
    ramp.update(0.1, per_bit_acc=np.array([1.0, 1.0, 1.0, 0.40]), n_active=4)
    assert ramp.msg_on()
    ramp.update(0.1, per_bit_acc=good, n_active=4)  # restore the EMA
    # an inactive below-chance bit must NOT refreeze (bit 3 masked out)
    ramp.update(0.1, per_bit_acc=np.array([1.0, 1.0, 1.0, 0.1]), n_active=3)
    assert ramp.msg_on()
    # the same bit active -> lockstep signature -> refreeze
    ramp.update(0.1, per_bit_acc=np.array([1.0, 1.0, 1.0, 0.1]), n_active=4)
    assert not ramp.msg_on() and ramp.msg_latched  # latch stays open

    # hysteresis: 0.40 is not enough to thaw, >0.45 is
    ramp.update(0.1, per_bit_acc=np.array([1.0, 1.0, 1.0, 0.40]), n_active=4)
    assert not ramp.msg_on()
    ramp.update(0.1, per_bit_acc=good, n_active=4)
    assert ramp.msg_on()

    # state round-trips, including the refrozen flag and the per-bit EMA
    ramp.update(0.1, per_bit_acc=np.array([0.1, 1.0, 1.0, 1.0]), n_active=4)
    assert not ramp.msg_on()
    other = BerGatedRamp(steps=10, init_scale=0.01, gate=0.05, beta=0.0,
                         msg_freeze_gate=0.2, msg_refreeze=True, nbits=4)
    other.load_state_dict(ramp.state_dict())
    assert not other.msg_on() and other.msg_latched
    assert np.allclose(other.bit_acc_ema, ramp.bit_acc_ema)

    # refreeze disabled (default): below-chance bits never freeze anything
    plain = BerGatedRamp(steps=10, init_scale=0.01, gate=0.05, beta=0.0,
                         msg_freeze_gate=0.2, nbits=4)
    plain.update(0.1, per_bit_acc=good, n_active=4)
    plain.update(0.1, per_bit_acc=np.array([0.1, 0.1, 0.1, 0.1]), n_active=4)
    assert plain.msg_on()


@pytest.mark.slow
def test_train_loop_fx_gate(tmp_path):
    """Loop-level attack curriculum: while the latch is open every scheduled
    effect index is the identity branch and ramp/fx_on logs 0; with a
    trivially-high fx_gate the latch opens on the first ramp feedback and
    fx_on flips to 1."""
    import dataclasses
    import json as _json

    from waveverify_tpu.train.loop import TrainerConfig, train

    cfg = dataclasses.replace(
        tiny_config(B), num_iters=4, valid_freq=10**9, sample_freq=10**9,
        train_duration=0.2,
        loss=dataclasses.replace(
            tiny_config(B).loss, warmup_steps=10, warmup_init_scale=0.01,
            warmup_ber_gate=0.05, warmup_fx_gate=0.9,
        ),
    )
    trainer = TrainerConfig(
        ckpt_dir=str(tmp_path / "ckpt"),
        log_file=str(tmp_path / "log.jsonl"),
        dump_samples=False, log_every=1, num_devices=1,
    )
    train(cfg, trainer)
    recs = [_json.loads(l) for l in
            (tmp_path / "log.jsonl").read_text().strip().splitlines()]
    fx_on = [r["ramp/fx_on"] for r in recs if "ramp/fx_on" in r]
    scales = [r["ramp/percep_scale"] for r in recs if "ramp/percep_scale" in r]
    assert fx_on[0] == 0.0, "latch must start closed"
    assert scales[0] == 0.0, "stage A perceptual scale must be exactly 0"
    # feedback is one dispatch delayed; with fx_gate=0.9 the first update
    # latches regardless of BER, so later steps must show attacks on
    assert fx_on[-1] == 1.0, f"latch never opened: {fx_on}"
    assert scales[-1] == pytest.approx(0.01)


@pytest.mark.slow
def test_train_step_host_percep_scale(setup):
    """The host-fed percep_scale argument rescales exactly the perceptual
    terms of the generator loss (BER-gated ramp path)."""
    cfg, models, state, audio, msg, idx = setup
    mesh = make_mesh(4)
    step = shard_train_step(
        make_train_step(models, cfg, SMALL_BANK), mesh,
        donate_state=False, with_percep_scale=True,
    )
    a, m, i = shard_batch(mesh, audio, msg, idx)
    key = jax.random.PRNGKey(2)
    _, m_lo = step(state, a, m, i, key, np.float32(0.0))
    _, m_hi = step(state, a, m, i, key, np.float32(1.0))
    lo, hi = (lambda d: {k: float(np.asarray(v)) for k, v in d.items()
                         if np.asarray(v).ndim == 0})(m_lo), None
    hi = {k: float(np.asarray(v)) for k, v in m_hi.items()
          if np.asarray(v).ndim == 0}
    # same forward -> identical unweighted loss terms, different totals
    assert lo["dec/loss"] == pytest.approx(hi["dec/loss"], rel=1e-5)
    assert lo["stft/loss"] == pytest.approx(hi["stft/loss"], rel=1e-5)
    percep = (cfg.loss.lambda_stft * hi["stft/loss"]
              + cfg.loss.lambda_mel * hi["mel/loss"]
              + cfg.loss.lambda_waveform * hi["waveform/loss"]
              + cfg.loss.lambda_adv_gen * hi["adv/gen_loss"])
    assert hi["loss"] - lo["loss"] == pytest.approx(percep, rel=1e-3)


def test_generator_lr_mult():
    """AdamW.generator_lr_mult scales only the generator subtree's step and
    keeps the optax state pytree structure identical to detector_lr_mult-only
    runs (resume compatibility across the flag flip)."""
    import optax
    from waveverify_tpu.config import OptimConfig
    from waveverify_tpu.train.state import make_optimizers

    params = {
        "generator": {"w": jnp.ones((4,))},
        "detector": {"w": jnp.ones((4,))},
        "locator": {"w": jnp.ones((4,))},
    }
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params)

    tx, _ = make_optimizers(OptimConfig(detector_lr_mult=10.0,
                                        generator_lr_mult=3.0))
    st = tx.init(params)
    upd, _ = tx.update(grads, st, params)
    # first bias-corrected Adam step magnitude ~= lr per subtree
    mags = {k: float(jnp.abs(upd[k]["w"]).mean()) for k in params}
    assert mags["generator"] == pytest.approx(3.0 * mags["locator"], rel=0.05)
    assert mags["detector"] == pytest.approx(10.0 * mags["locator"], rel=0.05)

    # same state structure as a detector-mult-only optimizer -> resumable
    tx_old, _ = make_optimizers(OptimConfig(detector_lr_mult=10.0))
    assert (jax.tree_util.tree_structure(tx_old.init(params))
            == jax.tree_util.tree_structure(st))


def test_generator_lr_mult_yaml_key(tmp_path):
    from waveverify_tpu.config import load_config

    p = tmp_path / "c.yml"
    p.write_text("AdamW.generator_lr_mult: 2.5\nAdamW.detector_lr_mult: 4\n")
    cfg = load_config(str(p))
    assert cfg.optim.generator_lr_mult == 2.5
    assert cfg.optim.detector_lr_mult == 4.0


@pytest.mark.slow
def test_gen_update_scale_freezes_generator(setup):
    """gen_update_scale=0 must freeze the generator subtree (detector and
    locator keep stepping); 1.0 must reproduce the normal joint update.
    The only frozen-phase drift allowed is AdamW weight decay (~lr*wd)."""
    cfg, models, state, audio, msg, idx = setup
    mesh = make_mesh(4)
    step = shard_train_step(
        make_train_step(models, cfg, SMALL_BANK), mesh,
        donate_state=False, with_percep_scale=True, with_train_disc=True,
        with_gen_scale=True,
    )
    a, m, i = shard_batch(mesh, audio, msg, idx)
    key = jax.random.PRNGKey(5)

    def deltas(new_state):
        out = {}
        for k in ("generator", "detector", "locator"):
            old = jax.tree_util.tree_leaves(state.wm_params[k])
            new = jax.tree_util.tree_leaves(new_state.wm_params[k])
            out[k] = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
                         for x, y in zip(old, new))
        return out

    s_frozen, _ = step(state, a, m, i, key, np.float32(0.01),
                       np.bool_(True), np.float32(0.0))
    s_joint, _ = step(state, a, m, i, key, np.float32(0.01),
                      np.bool_(True), np.float32(1.0))
    d0, d1 = deltas(s_frozen), deltas(s_joint)
    # frozen: generator moves only by AdamW weight decay, bounded by
    # lr*wd*max|param| = 1e-6 * max|param| (measured 2.6e-6 vs 1.0e-4 joint,
    # a 40x reduction; the joint delta is ~lr because fresh-Adam steps are
    # sign-normalized).
    max_param = max(float(np.max(np.abs(np.asarray(x))))
                    for x in jax.tree_util.tree_leaves(state.wm_params["generator"]))
    assert d0["generator"] <= 1.5e-6 * max_param, (d0, d1, max_param)
    assert d0["generator"] < 0.05 * d1["generator"], (d0, d1)
    # detector / locator keep training at the same magnitude either way
    assert d0["detector"] == pytest.approx(d1["detector"], rel=0.5)
    assert d0["locator"] > 0


@pytest.mark.slow
def test_msg_update_scale_freezes_carrier_only(setup):
    """msg_update_scale=0 (stationary-carrier freeze, warmup_msg_freeze_gate)
    must freeze ONLY the generator's msg_*/film_* subtrees; the rest of the
    generator and the detector keep stepping. 1.0 reproduces the joint
    update."""
    cfg, models, state, audio, msg, idx = setup
    mesh = make_mesh(4)
    step = shard_train_step(
        make_train_step(models, cfg, SMALL_BANK), mesh,
        donate_state=False, with_percep_scale=True, with_train_disc=True,
        with_gen_scale=True, with_msg_scale=True,
    )
    a, m, i = shard_batch(mesh, audio, msg, idx)
    key = jax.random.PRNGKey(5)

    def split_deltas(new_state):
        """Max |delta| over (msg-path, non-msg) generator leaves."""
        def walk(old, new, in_msg):
            if isinstance(old, dict):
                out = [0.0, 0.0]
                for k in old:
                    sub = walk(old[k], new[k],
                               in_msg or k.startswith(("msg_", "film_")))
                    out = [max(out[0], sub[0]), max(out[1], sub[1])]
                return out
            d = float(np.max(np.abs(np.asarray(old) - np.asarray(new))))
            return [d, 0.0] if in_msg else [0.0, d]

        return walk(state.wm_params["generator"],
                    new_state.wm_params["generator"], False)

    s_frozen, _ = step(state, a, m, i, key, np.float32(0.01),
                       np.bool_(True), np.float32(1.0), np.float32(0.0))
    s_joint, _ = step(state, a, m, i, key, np.float32(0.01),
                      np.bool_(True), np.float32(1.0), np.float32(1.0))
    msg_d0, rest_d0 = split_deltas(s_frozen)
    msg_d1, rest_d1 = split_deltas(s_joint)
    max_param = max(
        float(np.max(np.abs(np.asarray(x))))
        for x in jax.tree_util.tree_leaves(state.wm_params["generator"]))
    # frozen: msg-path drift bounded by AdamW weight decay (zero when the
    # decay mask exempts msg_/film_)
    assert msg_d0 <= 1.5e-6 * max_param, (msg_d0, msg_d1, max_param)
    assert msg_d0 < 0.05 * msg_d1, (msg_d0, msg_d1)
    # the rest of the generator keeps stepping at joint magnitude
    assert rest_d0 == pytest.approx(rest_d1, rel=0.5)
    assert rest_d0 > 1e-6
