"""Model layer: Generator / Detector / Locator / Discriminator.

Pure Flax modules over the SEANet primitive layer. Unlike the reference's
``model/`` package (which imports upward into utils/scripts —
reference model/watermarking.py:24-26), this layer depends only on
``waveverify_tpu.modules`` and ``waveverify_tpu.config``: the composite
training logic lives in ``waveverify_tpu.train``.
"""

from waveverify_tpu.models.generator import Generator
from waveverify_tpu.models.detector import (
    Detector,
    detector_bits,
    detector_confidence,
    detector_postprocess,
)
from waveverify_tpu.models.locator import Locator
from waveverify_tpu.models.discriminator import Discriminator

__all__ = [
    "Generator",
    "Detector",
    "Locator",
    "Discriminator",
    "detector_bits",
    "detector_confidence",
    "detector_postprocess",
]
