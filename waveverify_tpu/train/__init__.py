"""Training layer: composite forward, jitted train/val steps, data, loop.

The reference folds augmentation, attack simulation, and metric plumbing
into a stateful ``AudioWatermarking`` nn.Module (reference
model/watermarking.py:186-808) and drives it from an imperative script
(reference scripts/train.py). Here the same capability is layered the
TPU-native way:

- :mod:`waveverify_tpu.train.watermarking` — pure composite forward
  functions (train / valid / audio_sample phases);
- :mod:`waveverify_tpu.train.state` — parameter/optimizer pytrees;
- :mod:`waveverify_tpu.train.step` — ONE jitted program per training step
  (generator forward, augmentations, on-device effects, detector/locator,
  discriminator update, generator update) — no host round trips;
- :mod:`waveverify_tpu.train.data` — host input pipeline;
- :mod:`waveverify_tpu.train.checkpoint` — orbax checkpoints with the
  reference's latest/best/{N}k tag layout;
- :mod:`waveverify_tpu.train.loop` — the outer loop + host-side effect
  scheduler feedback.
"""

from waveverify_tpu.train.watermarking import (
    WatermarkModels,
    forward_train,
    forward_valid,
    forward_audio_sample,
)
from waveverify_tpu.train.state import TrainState, create_train_state, make_optimizers
from waveverify_tpu.train.step import make_train_step, make_val_step

__all__ = [
    "WatermarkModels",
    "forward_train",
    "forward_valid",
    "forward_audio_sample",
    "TrainState",
    "create_train_state",
    "make_optimizers",
    "make_train_step",
    "make_val_step",
]
