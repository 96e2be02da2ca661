"""TPU-native signal-processing ops shared by models, effects, and losses.

Everything here is pure jax on static shapes: FIR filtering, polyphase
resampling, STFT framing, mel filterbanks. These replace the reference's
out-of-process SoX/FFmpeg/julius/scipy calls on the training path
(reference utils/effect_augmentation.py) so the whole step stays on device.
"""

from waveverify_tpu.ops.dsp import (
    fir_filter,
    frame_signal,
    highpass_fir,
    lowpass_fir,
    bandpass_fir,
    resample,
    resample_kernel,
    stft,
    stft_match_stride,
)
from waveverify_tpu.ops.transforms import (
    MDCT,
    PQMF,
    STDCT,
    design_prototype_filter,
)

__all__ = [
    "fir_filter",
    "frame_signal",
    "highpass_fir",
    "lowpass_fir",
    "bandpass_fir",
    "resample",
    "resample_kernel",
    "stft",
    "stft_match_stride",
    "STDCT",
    "MDCT",
    "PQMF",
    "design_prototype_filter",
]
