"""Public-API tests: WaveVerify embed/detect/locate/verify + WatermarkID +
audio I/O + message conversions (reference waveverify/ package semantics)."""

import numpy as np
import pytest

from waveverify_tpu import WatermarkID
from waveverify_tpu.api.audio_io import (
    load_audio,
    message_to_tensor,
    save_audio,
    tensor_to_message,
)
from waveverify_tpu.api.core import WaveVerify, _next_bucket
from waveverify_tpu.config import (
    DetectorConfig,
    GeneratorConfig,
    LocatorConfig,
    TrainConfig,
)

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


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("audio") / "tone.wav"
    t = np.arange(12345) / 16000  # deliberately not a hop multiple
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    save_audio(x, path)
    return path


def test_embed_returns_same_length(wv, wav_file, tmp_path):
    out_path = tmp_path / "wm.wav"
    wm = WatermarkID.custom(0xBEEF)
    audio, sr, wm_out = wv.embed(wav_file, wm, out_path)
    assert sr == 16000
    assert audio.shape == (12345,)
    assert wm_out.to_bits() == wm.to_bits()
    assert out_path.exists()
    # watermark is a small additive perturbation
    orig, _ = load_audio(wav_file)
    assert not np.allclose(audio, orig)
    assert np.mean(np.abs(audio - orig)) < 0.5


def test_detect_types(wv, wav_file):
    wm, conf = wv.detect(wav_file)
    assert isinstance(wm, WatermarkID)
    assert len(wm.to_bits()) == 16
    assert 0.0 <= conf <= 1.0


def test_locate_shape(wv, wav_file):
    mask = wv.locate(wav_file)
    assert mask.shape == (12345,)
    assert mask.min() >= 0.0 and mask.max() <= 1.0


def test_verify_self_consistent(wv, wav_file):
    detected, _ = wv.detect(wav_file)
    assert wv.verify(wav_file, detected) is True
    flipped = "".join("1" if b == "0" else "0" for b in detected.to_bits())
    assert wv.verify(wav_file, flipped) is False


def test_accepts_raw_watermark_values(wv, wav_file, tmp_path):
    # int / str / bytes accepted like the reference (core.py:703-729)
    for value in (1234, "0101010101010101", b"\x12\x34"):
        _, _, wm = wv.embed(wav_file, value, tmp_path / "x.wav")
        assert isinstance(wm, WatermarkID)


def test_batch_embed_detect(wv):
    rng = np.random.RandomState(0)
    audio = rng.randn(3, 4800).astype(np.float32) * 0.1
    bits = rng.randint(0, 2, (3, 16)).astype(np.float32)
    watermarked = wv.embed_batch(audio, bits)
    assert watermarked.shape == audio.shape
    got_bits, conf = wv.detect_batch(watermarked)
    assert got_bits.shape == (3, 16)
    assert conf.shape == (3,)


def test_bucket_padding():
    assert _next_bucket(100) == 4800
    b1 = _next_bucket(16000)
    assert b1 >= 16000 and b1 % 320 == 0
    # monotone, geometric-ish
    assert _next_bucket(b1) == b1
    b2 = _next_bucket(b1 + 1)
    assert b2 > b1 and b2 % 320 == 0
    # few buckets over 4 orders of magnitude
    buckets = {_next_bucket(n) for n in range(4800, 16000 * 60, 999)}
    assert len(buckets) < 30


def test_message_tensor_roundtrip():
    bits = "0110100111001010"
    t = message_to_tensor(bits)
    assert t.shape == (1, 16)
    assert tensor_to_message(t) == bits
    with pytest.raises(ValueError):
        message_to_tensor("012")


def test_tensor_to_message_time_average():
    # 3-D [B, T, W] averages over time first (reference utils.py:356-412)
    x = np.zeros((1, 4, 3), np.float32)
    x[0, :, 0] = [0.9, 0.9, 0.0, 0.9]  # mean 0.675 -> 1
    x[0, :, 1] = [0.4, 0.4, 0.4, 0.4]  # -> 0
    x[0, :, 2] = [1.0, 1.0, 1.0, 1.0]  # -> 1
    assert tensor_to_message(x) == "101"


# ---------------------------------------------------------------------------
# WatermarkID semantics (reference waveverify/watermark_id.py)
# ---------------------------------------------------------------------------


def test_watermark_id_factories():
    a = WatermarkID.for_creator("studio_abc")
    b = WatermarkID.for_creator("studio_abc")
    assert a == b and a.to_bits() == b.to_bits()
    assert len(a.to_bits()) == 16

    c = WatermarkID.custom(0)
    assert c.to_int() == 0 and c.to_bits() == "0" * 16
    d = WatermarkID.custom(65535)
    assert d.to_bits() == "1" * 16
    with pytest.raises(ValueError):
        WatermarkID.custom(65536)

    e = WatermarkID.custom(b"\xab\xcd")
    assert e.to_int() == 0xABCD
    assert e.to_hex().lower().endswith("abcd")

    f = WatermarkID.for_tracking("12345")
    assert f.to_int() == 12345  # numeric-direct path


def test_watermark_id_timestamp_packing():
    from datetime import datetime

    ts = datetime(2025, 3, 15, 14, 0)  # quarter-of-day = 2
    wm = WatermarkID.for_timestamp(ts)
    bits = wm.to_bits()
    year = int(bits[0:5], 2) + 2024
    month = int(bits[5:9], 2)
    day = int(bits[9:14], 2)
    quarter = int(bits[14:16], 2)
    assert (year, month, day, quarter) == (2025, 3, 15, 2)


def test_load_audio_resamples(tmp_path):
    # write an 8 kHz file, loader must return 16 kHz
    import wave

    path = tmp_path / "lo.wav"
    x = (np.sin(2 * np.pi * 220 * np.arange(4000) / 8000) * 0.5)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes((x * 32767).astype(np.int16).tobytes())
    y, sr = load_audio(path)
    assert sr == 16000
    assert abs(len(y) - 8000) <= 8


@pytest.mark.slow
def test_chunked_long_audio_matches_monolithic():
    """Chunked long-audio inference is bit-exact vs the monolithic path:
    causal nets (measured left RF: generator 5422, detector 2542, locator
    382 samples; intra-frame lookahead < hop) + hop-aligned chunk starts +
    real left context => identical outputs."""
    import jax
    import jax.numpy as jnp

    wv = WaveVerify()  # random weights; equality is weight-independent
    rng = np.random.RandomState(3)
    t = 32000  # 2 s
    audio = (rng.randn(t) * 0.1).astype(np.float32)
    msg = jnp.asarray(rng.randint(0, 2, (1, 16)).astype(np.float32))

    # force the chunked path with small, hop-aligned chunk geometry
    wv.long_threshold = 16000
    wv.chunk_samples = 6400
    wv.chunk_context = 6400  # > max left RF (5422)

    chunked = wv._embed_long(audio, msg)
    x, _ = wv._pad_bucket(audio)
    _, mono = wv._generator_fn(x.shape[-1])(wv.params, x, msg)
    np.testing.assert_allclose(chunked, np.asarray(mono)[0, :t],
                               atol=2e-5, rtol=1e-4)

    probs_c, conf_c = wv._detect_long(audio)
    logits = wv.models.apply_detector(wv.params["detector"], x)
    probs_m = np.asarray(jnp.mean(jax.nn.sigmoid(logits), axis=1))[0]
    # monolithic probs average over the padded bucket; recompute over [0, t)
    probs_m_exact = np.asarray(
        jax.nn.sigmoid(logits)[0, :t].mean(axis=0)
    )
    np.testing.assert_allclose(probs_c, probs_m_exact, atol=2e-5, rtol=1e-4)

    mask_c = wv._locate_long(audio)
    mask_full = np.asarray(
        jax.nn.sigmoid(wv.models.apply_locator(wv.params["locator"], x))
    )[0, :t]
    np.testing.assert_allclose(mask_c, mask_full, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_batch_serving_over_mesh():
    """use_mesh() shards embed_batch/detect_batch over the virtual 8-device
    data mesh; outputs match the single-device batch path."""
    import jax

    wv = WaveVerify()
    rng = np.random.RandomState(4)
    audio = (rng.randn(8, 4800) * 0.1).astype(np.float32)
    bits = rng.randint(0, 2, (8, 16)).astype(np.float32)

    plain = wv.embed_batch(audio, bits)
    d_bits_plain, d_conf_plain = wv.detect_batch(plain)

    wv.use_mesh()
    sharded = wv.embed_batch(audio, bits)
    np.testing.assert_allclose(sharded, plain, atol=2e-5, rtol=1e-4)
    # params/batch actually live on the mesh
    assert wv._mesh is not None and wv._mesh.devices.size == len(jax.devices())
    d_bits, d_conf = wv.detect_batch(sharded)
    np.testing.assert_array_equal(d_bits, d_bits_plain)
    np.testing.assert_allclose(d_conf, d_conf_plain, atol=2e-5)


def test_checkpoint_config_snapshot_applied(tmp_path):
    """A checkpoint's embedded model-config snapshot (msg_mode etc.) must
    reach the constructed models when the caller doesn't pass an explicit
    `config=`. Regression: the eval CLI passed `config=load_config(None)`,
    which suppressed the snapshot and swept carrier-mode checkpoints with
    the wrong message path (identity BER at chance instead of the true
    value)."""
    from waveverify_tpu.config import (
        DetectorConfig, GeneratorConfig, LocatorConfig, TrainConfig,
    )
    from waveverify_tpu.convert import save_weights_npz

    cfg = TrainConfig(
        generator=GeneratorConfig(channels_dec=12, n_residual_enc=1,
                                  n_residual_dec=1, msg_mode="carrier",
                                  film_carrier_gain=0.5, **SMALL),
        detector=DetectorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        locator=LocatorConfig(n_residual_enc=1, output_dim=8, **SMALL),
    )
    src = WaveVerify(config=cfg)
    path = save_weights_npz(src.params, tmp_path / "carrier.npz", config=cfg)

    # checkpoint_path alone (the eval CLI's fixed construction): snapshot on
    wv2 = WaveVerify(checkpoint_path=path, config_path=None, precision=None)
    assert wv2.config.generator.msg_mode == "carrier"
    assert wv2.config.generator.film_carrier_gain == 0.5

    # explicit config still wins (tests / parity workflows rely on this)
    plain = TrainConfig(
        generator=GeneratorConfig(channels_dec=12, n_residual_enc=1,
                                  n_residual_dec=1, **SMALL),
        detector=DetectorConfig(n_residual_enc=1, output_dim=8, **SMALL),
        locator=LocatorConfig(n_residual_enc=1, output_dim=8, **SMALL),
    )
    wv3 = WaveVerify(checkpoint_path=path, config=plain)
    assert wv3.config.generator.msg_mode == "reference"


def test_ctor_precision_none_leaves_global():
    """precision=None must not clobber a caller-managed global conv
    precision (the eval CLI forwards --conv-precision; None = untouched)."""
    import jax

    from waveverify_tpu.modules import conv as conv_mod
    from waveverify_tpu.modules.conv import set_conv_precision

    prior = conv_mod._CONV_PRECISION
    try:
        set_conv_precision("highest")
        WaveVerify(precision=None)
        assert conv_mod._CONV_PRECISION == jax.lax.Precision.HIGHEST
        WaveVerify(precision="default")
        assert conv_mod._CONV_PRECISION == jax.lax.Precision.DEFAULT
    finally:
        conv_mod._CONV_PRECISION = prior


def test_serve_dtype_bf16_path(wv, wav_file):
    """serve_dtype="bfloat16" runs the network passes in bf16 while keeping
    the public outputs f32 and the watermarked audio at f32 fidelity.
    Decision-level agreement with f32 is measured per-checkpoint by the
    eval CLI's --serve-dtype study; here we check structure: dtypes, finite
    outputs, and that the bf16 residual tracks the f32 one closely relative
    to its own scale (same weights, same audio)."""
    import jax.numpy as jnp

    wv16 = WaveVerify(config=wv.config, serve_dtype="bfloat16")
    wv16.params = wv.params  # identical (random) weights

    audio, _ = load_audio(wav_file)
    x, t = wv._pad_bucket(audio)
    msg = jnp.zeros((1, 16), jnp.float32)

    r32, w32 = wv._generator_fn(x.shape[-1])(wv.params, x, msg)
    r16, w16 = wv16._generator_fn(x.shape[-1])(wv16.params, x, msg)
    assert w16.dtype == jnp.float32 and r16.dtype == jnp.float32
    assert np.isfinite(np.asarray(w16)).all()
    # RANDOM weights amplify bf16 noise chaotically through the L2Norm'd
    # encoder (measured: cosine 0.857, rms-delta/rms 0.53 on this config)
    # — so bound direction + energy, not elementwise closeness. The
    # trained-checkpoint delta is what matters and is measured by the eval
    # CLI --serve-dtype study.
    a, b = np.asarray(r16).ravel(), np.asarray(r32).ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.7, cos
    assert np.sqrt(((a - b) ** 2).mean()) < np.sqrt((b ** 2).mean()), \
        "bf16 noise exceeds the signal itself"

    p32, c32 = wv._detector_fn(x.shape[-1])(wv.params, x, jnp.int32(t))
    p16, c16 = wv16._detector_fn(x.shape[-1])(wv16.params, x, jnp.int32(t))
    assert p16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(p16 - p32))) < 0.05

    m16 = wv16._locator_fn(x.shape[-1])(wv16.params, x)
    assert m16.dtype == jnp.float32
    assert np.isfinite(np.asarray(m16)).all()
