"""NN primitives: smart-padded convolutions, norms, STFT basis convs, SEANet.

TPU-native equivalents of the reference `modules/` package
(reference modules/__init__.py:10-22).
"""

from waveverify_tpu.modules.conv import (
    SConv1d,
    SConvTranspose1d,
    CausalSTFT,
    ConvLayerNorm,
    NormConv1d,
    NormConv2d,
    NormConvTranspose1d,
    NormConvTranspose2d,
    pad1d,
    unpad1d,
    get_extra_padding_for_conv1d,
)
from waveverify_tpu.modules.seanet import (
    SEANetEncoder,
    SEANetDecoder,
    SEANetResnetBlock,
    SpecBlock,
    FiLM,
    L2Norm,
    Scale,
)

__all__ = [
    "SConv1d",
    "SConvTranspose1d",
    "CausalSTFT",
    "ConvLayerNorm",
    "NormConv1d",
    "NormConv2d",
    "NormConvTranspose1d",
    "NormConvTranspose2d",
    "pad1d",
    "unpad1d",
    "get_extra_padding_for_conv1d",
    "SEANetEncoder",
    "SEANetDecoder",
    "SEANetResnetBlock",
    "SpecBlock",
    "FiLM",
    "L2Norm",
    "Scale",
]
