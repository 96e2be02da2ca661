"""Training state: parameter pytrees + two-optimizer optax setup.

Mirrors the reference's optimizer layout (reference scripts/train.py:740-776):
one AdamW over the whole watermarking composite (generator + detector +
locator), one AdamW over the discriminator, each with a per-step exponential
LR decay (gamma = 0.999996, conf/base.yml:130). bf16 grad scaling is not
needed on TPU (the reference's accel.scaler machinery has no equivalent
here by design — see SURVEY.md §2.7).

ZeRO-style optimizer-state sharding (the reference's
ZeroRedundancyOptimizer, scripts/train.py:755) is unnecessary at ~10 M
params: state is replicated over the data mesh; flip to a sharded
NamedSharding in parallel/mesh.py if the model ever grows.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from waveverify_tpu.config import OptimConfig, TrainConfig
from waveverify_tpu.train.watermarking import WatermarkModels


@struct.dataclass
class TrainState:
    """All device-side mutable training state (one pytree, donate-able)."""

    step: jnp.ndarray  # int32 scalar
    wm_params: Any  # {"generator": .., "detector": .., "locator": ..}
    disc_params: Any
    wm_opt_state: Any
    disc_opt_state: Any


def make_optimizers(cfg: OptimConfig) -> Tuple[optax.GradientTransformation,
                                               optax.GradientTransformation]:
    """AdamW(beta=(0.8, 0.99), lr 1e-4, torch-default weight decay 0.01) with
    per-step exponential decay (reference scripts/train.py:178-197 +
    conf/base.yml:128-130). Gradient clipping is NOT part of the chain — the
    reference clips different subtrees in each update (discriminator: all
    params; generator update: generator subtree only, scripts/train.py:1351)
    so the step function clips explicitly before calling ``update``.
    """

    def decay_mask(params: Any) -> Any:
        """True = apply weight decay. With ``decay_exclude_msg_path`` the
        message-embedding MLP and FiLM readouts are exempt: for a bit the
        detector cannot yet decode, the decode gradient on these weights is
        pure noise, so decay monotonically kills that bit's audio channel
        (measured: 11/16 dead channels after 29k steps, see
        modules/seanet.py:_msg_embed). Deviation from the reference's
        whole-model torch AdamW(0.01) — documented in docs/TRAINING.md."""
        if not cfg.decay_exclude_msg_path:
            return jax.tree_util.tree_map(lambda _: True, params)

        def walk(tree, exempt):
            if isinstance(tree, Mapping):
                return {
                    k: walk(v, exempt or k.startswith(("msg_", "film_")))
                    for k, v in tree.items()
                }
            return not exempt

        return walk(params, False)

    def make(lr: float) -> optax.GradientTransformation:
        schedule = optax.exponential_decay(
            init_value=lr, transition_steps=1, decay_rate=cfg.exp_gamma
        )
        return optax.adamw(
            learning_rate=schedule, b1=cfg.beta1, b2=cfg.beta2,
            eps=1e-8, weight_decay=0.01, mask=decay_mask,
        )

    if cfg.detector_lr_mult != 1.0 or cfg.generator_lr_mult != 1.0:
        # Per-subtree LR for the watermarking optimizer. Labels are the
        # top-level param-tree keys ("generator"/"detector"/"locator") so the
        # transform follows the tree structure without hard-coding leaves.
        def label_fn(params):
            return {
                k: jax.tree_util.tree_map(lambda _: k, v)
                for k, v in params.items()
            }

        wm_tx = optax.multi_transform(
            {
                "generator": make(cfg.lr * cfg.generator_lr_mult),
                "detector": make(cfg.lr * cfg.detector_lr_mult),
                "locator": make(cfg.lr),
            },
            label_fn,
        )
    else:
        wm_tx = make(cfg.lr)
    return wm_tx, make(cfg.lr)


def clip_by_global_norm(grads: Any, max_norm: float) -> Tuple[Any, jnp.ndarray]:
    """torch.nn.utils.clip_grad_norm_ semantics: scale the whole tree by
    ``max_norm / norm`` when norm > max_norm; returns (clipped, pre-clip norm).
    """
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


def create_train_state(
    cfg: TrainConfig,
    key: jnp.ndarray,
    models: WatermarkModels = None,
    example_length: int = 3200,
) -> TrainState:
    """Initialize all four models' parameters and both optimizer states.

    ``example_length`` only shapes the init trace (conv params are
    length-independent); it must be >= the largest SpecBlock n_fft.
    """
    if models is None:
        models = WatermarkModels.from_config(cfg)
    kg, kd, kl, kdisc = jax.random.split(key, 4)
    audio = jnp.zeros((1, example_length, 1), jnp.float32)
    msg = jnp.zeros((1, cfg.generator.msg_dimension), jnp.float32)

    # jit each init: eager init dispatches hundreds of per-op compiles
    # (~0.2 s each on a multi-device backend); one fused program is ~10x
    # faster and produces identical params.
    wm_params = {
        "generator": jax.jit(models.generator.init)(kg, audio, msg)["params"],
        "detector": jax.jit(models.detector.init)(kd, audio)["params"],
        "locator": jax.jit(models.locator.init)(kl, audio)["params"],
    }
    # MRD's largest fft window needs enough context to trace.
    disc_len = max(example_length, max(cfg.discriminator.fft_sizes) + 256)
    disc_params = jax.jit(models.discriminator.init)(
        kdisc, jnp.zeros((1, disc_len, 1), jnp.float32)
    )["params"]

    wm_tx, disc_tx = make_optimizers(cfg.optim)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        wm_params=wm_params,
        disc_params=disc_params,
        wm_opt_state=wm_tx.init(wm_params),
        disc_opt_state=disc_tx.init(disc_params),
    )


def param_count(tree: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
