"""Standalone audio/mask length-adjust utilities (``AudioProcessor``).

jax-native port of the reference's public length-adjust surface
(reference utils/effect_augmentation.py:109-457): the on-device effect
pipeline mostly bakes these semantics into each effect (static shapes),
but the utilities are part of the reference's public API and are useful
for host-side pre/post-processing, so they exist standalone here too.

All functions operate on the LAST axis, accept any leading shape, and are
trace-compatible (``target_length`` must be static — it defines the output
shape, exactly like torch's ``F.interpolate(size=...)``).

Semantics matched to torch:
- ``stretch``     = ``F.interpolate(mode='linear', align_corners=False)``
- ``nearest``     = ``F.interpolate(mode='nearest')``        (floor rule)
- ``nearest-exact`` = ``F.interpolate(mode='nearest-exact')`` (round rule)
- mask ``stretch`` re-binarizes with ``> 0.5`` (reference :304-321).
"""

from __future__ import annotations

import jax.numpy as jnp

_AUDIO_MODES = ("pad_truncate", "stretch", "nearest")
_MASK_MODES = ("pad_truncate", "stretch", "nearest-exact")


def _pad_truncate(x: jnp.ndarray, target_length: int) -> jnp.ndarray:
    cur = x.shape[-1]
    if cur > target_length:
        return x[..., :target_length]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target_length - cur)]
    return jnp.pad(x, pad)


def _linear(x: jnp.ndarray, target_length: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False)."""
    cur = x.shape[-1]
    scale = cur / target_length
    pos = (jnp.arange(target_length) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, cur - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, cur - 1)
    w = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1 - w) + x[..., hi] * w


def _nearest(x: jnp.ndarray, target_length: int, exact: bool) -> jnp.ndarray:
    cur = x.shape[-1]
    scale = cur / target_length
    if exact:  # round rule (nearest-exact)
        idx = jnp.floor((jnp.arange(target_length) + 0.5) * scale)
    else:  # floor rule (torch legacy 'nearest')
        idx = jnp.floor(jnp.arange(target_length) * scale)
    idx = jnp.clip(idx.astype(jnp.int32), 0, cur - 1)
    return x[..., idx]


def adjust_audio_length(tensor: jnp.ndarray, target_length: int,
                        mode: str = "pad_truncate") -> jnp.ndarray:
    """Adjust audio to ``target_length`` samples along the last axis
    (reference utils/effect_augmentation.py:117-232)."""
    if not isinstance(target_length, int) or target_length <= 0:
        raise ValueError(
            f"Target length must be a positive integer, got {target_length}"
        )
    if mode not in _AUDIO_MODES:
        raise ValueError(f"Unknown mode: {mode!r}. Valid: {_AUDIO_MODES}")
    if tensor.shape[-1] == target_length:
        return tensor
    if mode == "pad_truncate":
        return _pad_truncate(tensor, target_length)
    if mode == "stretch":
        return _linear(tensor, target_length)
    return _nearest(tensor, target_length, exact=False)


def adjust_mask_length(mask: jnp.ndarray, target_length: int,
                       mode: str = "pad_truncate") -> jnp.ndarray:
    """Adjust a binary presence mask to ``target_length`` samples,
    preserving binary values (reference utils/effect_augmentation.py:
    234-352): stretch re-binarizes at > 0.5, nearest-exact uses the round
    rule so single-sample features survive."""
    if not isinstance(target_length, int) or target_length <= 0:
        raise ValueError(
            f"Target length must be a positive integer, got {target_length}"
        )
    if mode not in _MASK_MODES:
        raise ValueError(f"Unknown mode: {mode!r}. Valid: {_MASK_MODES}")
    if mask.shape[-1] == target_length:
        return mask
    if mode == "pad_truncate":
        return _pad_truncate(mask, target_length)
    m = mask.astype(jnp.float32)
    if mode == "stretch":
        return (_linear(m, target_length) > 0.5).astype(mask.dtype)
    return _nearest(m, target_length, exact=True).astype(mask.dtype)


class AudioProcessor:
    """Drop-in namespace mirroring the reference class surface."""

    adjust_audio_length = staticmethod(adjust_audio_length)
    adjust_mask_length = staticmethod(adjust_mask_length)
