"""Tests for the carrier message mode + message-path decay exemption.

Round-2 finding (docs/TRAINING.md): with the reference's learned-only
message MLP, AdamW weight decay kills the audio channel of every bit the
detector has not yet learned to decode (its decode gradient is pure noise)
— measured as 11/16 bits with ~zero per-bit audio sensitivity after 29k
steps. ``Generator.msg_mode="carrier"`` adds a fixed orthonormal per-bit
carrier (no weights → nothing to decay), and
``AdamW.decay_exclude_msg_path`` masks decay off ``msg_*``/``film_*``.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveverify_tpu.config import (OptimConfig, apply_model_config,
                                   load_config, model_config_dict)
from waveverify_tpu.modules.seanet import SEANetEncoder

TINY = dict(
    channels=1, dimension=16, msg_dimension=16, n_filters=4, n_fft_base=64,
    n_residual_layers=1, ratios=[8, 5, 4, 2], kernel_size=5,
    last_kernel_size=5, residual_kernel_size=5, dilation_base=1,
    skip="identity", causal=True, l2norm=True, spec_compression="log",
    res_scale=0.577, zero_init=False, embedding_dim=32, embedding_layers=2,
    freq_bands=4,
)


def _per_bit_latent_deltas(msg_mode: str, seed: int = 0) -> np.ndarray:
    enc = SEANetEncoder(msg_mode=msg_mode, **TINY)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(1, 3200, 1).astype(np.float32) * 0.1)
    msg0 = jnp.asarray(rng.randint(0, 2, (1, 16)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(seed), x, msg0)
    apply = jax.jit(enc.apply)
    z0 = apply(params, x, msg0)
    deltas = []
    for j in range(16):
        m = np.array(msg0)
        m[:, j] = 1 - m[:, j]
        zj = apply(params, x, jnp.asarray(m))
        deltas.append(float(jnp.sqrt(jnp.mean((zj - z0) ** 2))))
    return np.asarray(deltas)


def test_carrier_mode_all_bits_alive_at_init():
    deltas = _per_bit_latent_deltas("carrier")
    assert (deltas > 0).all(), deltas
    # no bit's channel is orders of magnitude weaker than the strongest —
    # the collapse signature was a 30-2000x spread
    assert deltas.min() / deltas.max() > 1e-3, deltas


def test_carrier_mode_changes_embedding_only_additively():
    """carrier and reference modes share the same parameter tree (the
    carrier is a compile-time constant, never a parameter)."""
    enc_ref = SEANetEncoder(msg_mode="reference", **TINY)
    enc_car = SEANetEncoder(msg_mode="carrier", **TINY)
    x = jnp.zeros((1, 3200, 1))
    m = jnp.zeros((1, 16))
    p_ref = enc_ref.init(jax.random.PRNGKey(0), x, m)
    p_car = enc_car.init(jax.random.PRNGKey(0), x, m)
    assert jax.tree_util.tree_structure(p_ref) == \
        jax.tree_util.tree_structure(p_car)


@pytest.mark.parametrize("exclude", [True, False])
def test_decay_mask_msg_path(exclude):
    from waveverify_tpu.train.state import make_optimizers

    cfg = OptimConfig(decay_exclude_msg_path=exclude)
    wm_tx, _ = make_optimizers(cfg)
    params = {
        "generator": {"encoder": {
            "msg_in": {"kernel": jnp.ones((16, 8))},
            "msg_hidden_0": {"kernel": jnp.ones((8, 8))},
            "film_0_0": {"gamma": {"kernel": jnp.ones((8, 1))}},
            "conv": {"kernel": jnp.ones((3, 1, 4))},
        }},
        "detector": {"head": {"kernel": jnp.ones((4, 16))}},
        "locator": {"head": {"kernel": jnp.ones((4, 1))}},
    }
    st = wm_tx.init(params)
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = wm_tx.update(zero, st, params)
    gen = upd["generator"]["encoder"]
    msg_upd = float(jnp.abs(gen["msg_in"]["kernel"]).max())
    film_upd = float(jnp.abs(gen["film_0_0"]["gamma"]["kernel"]).max())
    conv_upd = float(jnp.abs(gen["conv"]["kernel"]).max())
    assert conv_upd > 0  # decay always applies to ordinary convs
    if exclude:
        assert msg_upd == 0 and film_upd == 0
    else:
        assert msg_upd > 0 and film_upd > 0


def test_film_carrier_matrix_properties():
    from waveverify_tpu.modules.seanet import _film_carrier

    # base config: 4 scales x 4 bands -> 32 slots -> Hadamard path
    sig = _film_carrier(16, 16)
    assert sig.shape == (16, 32)
    assert np.allclose(sig @ sig.T, np.eye(16), atol=1e-5)  # orthonormal
    # Hadamard: every bit touches every slot with identical magnitude
    assert np.allclose(np.abs(sig), 1.0 / np.sqrt(32), atol=1e-6)
    # non-power-of-two slot count: QR fallback, rows still unit-norm
    sig2 = _film_carrier(16, 12)  # 24 slots
    assert sig2.shape == (16, 24)
    assert np.allclose(np.linalg.norm(sig2, axis=1), 1.0, atol=1e-5)


def test_film_carrier_equal_per_bit_deltas():
    """Gain-space carrier: every bit's latent signature has near-equal
    power (the embedding-space carrier alone leaves per-bit amplitude to
    random Dense(1) projection conditioning — the step-32k failure)."""
    enc = SEANetEncoder(msg_mode="carrier", film_carrier_gain=0.3, **TINY)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 3200, 1).astype(np.float32) * 0.1)
    msg0 = jnp.asarray(rng.randint(0, 2, (1, 16)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x, msg0)
    apply = jax.jit(enc.apply)
    z0 = apply(params, x, msg0)
    deltas = []
    for j in range(16):
        m = np.array(msg0)
        m[:, j] = 1 - m[:, j]
        zj = apply(params, x, jnp.asarray(m))
        deltas.append(float(jnp.sqrt(jnp.mean((zj - z0) ** 2))))
    deltas = np.asarray(deltas)
    assert (deltas > 0).all(), deltas
    assert deltas.min() / deltas.max() > 0.2, deltas


def test_film_carrier_params_unchanged():
    """film_carrier_gain is a compile-time constant — same parameter tree,
    so a trained checkpoint resumes with the carrier switched on."""
    enc_off = SEANetEncoder(msg_mode="carrier", **TINY)
    enc_on = SEANetEncoder(
        msg_mode="carrier", film_carrier_gain=0.3, **TINY)
    x = jnp.zeros((1, 3200, 1))
    m = jnp.zeros((1, 16))
    p_off = enc_off.init(jax.random.PRNGKey(0), x, m)
    p_on = enc_on.init(jax.random.PRNGKey(0), x, m)
    assert jax.tree_util.tree_structure(p_off) == \
        jax.tree_util.tree_structure(p_on)


@pytest.mark.slow
def test_latent_carrier_equal_audio_deltas():
    """Latent-space carrier: every bit gets a comparable AUDIO-domain
    channel through the decoder (the FiLM gain-slot Jacobian is rank-
    deficient in practice — measured rank ~2 at step 33k — so gain-space
    orthogonality alone leaves bits with ~zero audio signature)."""
    from waveverify_tpu.config import GeneratorConfig
    from waveverify_tpu.models.generator import Generator

    cfg = GeneratorConfig(
        dimension=32, channels_enc=8, channels_dec=12, n_residual_enc=1,
        n_residual_dec=1, kernel_size=5, last_kernel_size=5,
        residual_kernel_size=5, dilation_base=1, skip="identity",
        causal=True, encoder_l2norm=True, bias=True,
        spec_compression="log", zero_init=False,
        msg_mode="carrier", latent_carrier_gain=0.2,
    )
    gen = Generator(config=cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 3200, 1).astype(np.float32) * 0.1)
    msg0 = jnp.asarray(rng.randint(0, 2, (1, 16)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), x, msg0)
    apply = jax.jit(gen.apply)
    r0 = apply(params, x, msg0)
    deltas = []
    for j in range(16):
        m = np.array(msg0)
        m[:, j] = 1 - m[:, j]
        rj = apply(params, x, jnp.asarray(m))
        deltas.append(float(jnp.sqrt(jnp.mean((rj - r0) ** 2))))
    deltas = np.asarray(deltas)
    assert (deltas > 0).all(), deltas
    assert deltas.min() / deltas.max() > 0.1, deltas
    # constants only: same parameter tree as with the carrier off
    p2 = Generator(
        config=GeneratorConfig(
            **{**cfg.__dict__, "latent_carrier_gain": 0.0})
    ).init(jax.random.PRNGKey(0), x, msg0)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)


def test_model_config_snapshot_roundtrip():
    cfg = load_config(None, overrides={"Generator.msg_mode": "carrier"})
    snap = json.loads(json.dumps(model_config_dict(cfg)))
    cfg2 = apply_model_config(load_config(None), snap)
    assert cfg2.generator.msg_mode == "carrier"
    assert cfg2.generator.strides == cfg.generator.strides
    assert cfg2.detector.strides == cfg.detector.strides


def test_npz_embeds_config(tmp_path):
    from waveverify_tpu.api.core import WaveVerify
    from waveverify_tpu.convert import load_weights_npz, save_weights_npz

    cfg = load_config(None, overrides={"Generator.msg_mode": "carrier"})
    params = {"generator": {"w": np.ones((2, 2), np.float32)}}
    out = tmp_path / "w.npz"
    save_weights_npz(params, out, config=cfg)
    snap = WaveVerify._peek_model_config(out)
    assert snap and snap["Generator"]["msg_mode"] == "carrier"
    loaded = load_weights_npz(out)
    assert set(loaded) == {"generator"}  # __config__ not in the param tree
