"""Attack-simulation pipeline, fully on device.

The reference applies effects by moving every batch to CPU and shelling out
to SoX / FFmpeg / Encodec mid-step (reference model/watermarking.py:540-544,
utils/effect_augmentation.py:462-1332) — the single biggest perf bug the TPU
rebuild designs away. Here every scheduled effect is a jax function with
static shapes; per-sample heterogeneous effect dispatch happens inside one
jitted step via a branch stack + one-hot gather (all branches run batched on
the MXU, then each sample selects its row — on TPU this is faster than
serializing per-sample switches and keeps the step a single XLA program).

The adaptive EffectScheduler stays host-side Python between steps (it only
consumes scalar metrics), exactly as the reference's does.
"""

from waveverify_tpu.effects.effects import (
    AudioEffects,
    EffectBank,
    apply_effect,
)
from waveverify_tpu.effects.effects_config import (
    EffectsConfig,
    load_effects_config,
)
from waveverify_tpu.effects.scheduler import EffectScheduler
from waveverify_tpu.effects.augment import (
    localization_augmentation,
    sequence_augmentation,
)

__all__ = [
    "AudioEffects",
    "EffectBank",
    "apply_effect",
    "EffectsConfig",
    "load_effects_config",
    "EffectScheduler",
    "localization_augmentation",
    "sequence_augmentation",
]
