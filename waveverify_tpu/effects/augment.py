"""Localization & sequence augmentations, on device.

The reference implements these as per-segment Python loops over the batch
(reference utils/localization_augmentation.py:267-321,
utils/seq_augmentation.py:100-259) — host-bound and O(batch*segments) kernel
launches. Here both are single fused XLA programs driven by PRNG keys:

- localization_augmentation: per item, ~20% of 0.1 s segments are modified —
  revert-to-original (p<0.33), zero-replace (p<0.66), else cross-batch
  substitute — building the ground-truth presence mask in the same pass.
  Segment choices are made with a batched random top-k trick (no python
  loops), and the per-segment action is a vectorized select.
- sequence_augmentation: one whole-batch temporal transform per step:
  reverse p=0.3, circular shift p=0.4, 0.5 s-segment shuffle p=0.3. The
  method draw happens host-side? No — everything is traced with lax.switch
  so the jitted step stays closed over the PRNG key only.

Both return the same static shapes they were given.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TARGET_AUGMENTATION_RATIO = 0.20  # reference localization_augmentation.py:38
ORIGINAL_REVERT_PROB = 0.33
ZERO_REPLACE_PROB = 0.66
REVERSE_PROBABILITY = 0.3  # reference seq_augmentation.py:29-31
CIRCULAR_SHIFT_PROBABILITY = 0.4
SHUFFLE_PROBABILITY = 0.3
DEFAULT_SEGMENT_DURATION = 0.5  # seconds, shuffle segments


def localization_augmentation(
    key: jnp.ndarray,
    original: jnp.ndarray,
    watermarked: jnp.ndarray,
    sample_rate: int = 16000,
    window_duration: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (augmented_watermarked, presence_mask, updated_original).

    original / watermarked: [B, T]. presence_mask: [B, T] float 1=watermarked.
    Reference utils/localization_augmentation.py:212-321.
    """
    b, t = watermarked.shape
    seg_len = int(window_duration * sample_rate)
    n_segs = -(-t // seg_len)  # ceil
    n_modify = int(n_segs * TARGET_AUGMENTATION_RATIO)

    k_sel, k_act, k_other = jax.random.split(key, 3)

    # choose n_modify distinct segments per item: rank random scores
    scores = jax.random.uniform(k_sel, (b, n_segs))
    ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
    seg_modified = ranks < n_modify  # [B, S] bool

    # per-(item, segment) action draw
    probs = jax.random.uniform(k_act, (b, n_segs))
    act_revert = probs < ORIGINAL_REVERT_PROB
    act_zero = (probs >= ORIGINAL_REVERT_PROB) & (probs < ZERO_REPLACE_PROB)
    act_cross = probs >= ZERO_REPLACE_PROB
    if b < 2:
        act_cross = jnp.zeros_like(act_cross)
        # cross-substitution needs >=2 items (reference :294); segment stays
        # watermarked (reference skips the branch entirely)
        seg_modified = seg_modified & ~(probs >= ZERO_REPLACE_PROB)

    # donor index for cross substitution: uniform over other items
    offset = jax.random.randint(k_other, (b, n_segs), 1, max(b, 2))
    donor = (jnp.arange(b)[:, None] + offset) % max(b, 1)

    # expand segment decisions to samples
    seg_of_sample = jnp.arange(t) // seg_len  # [T]
    def per_sample(x):  # [B, S] -> [B, T]
        return x[:, seg_of_sample]

    modified = per_sample(seg_modified)
    revert = per_sample(act_revert) & modified
    zero = per_sample(act_zero) & modified
    cross = per_sample(act_cross) & modified
    donor_of_sample = donor[:, seg_of_sample]  # [B, T]

    donor_audio = original[donor_of_sample, jnp.arange(t)[None, :]]

    augmented = jnp.where(revert, original, watermarked)
    augmented = jnp.where(zero, 0.0, augmented)
    augmented = jnp.where(cross, donor_audio, augmented)

    updated_original = jnp.where(zero, 0.0, original)
    updated_original = jnp.where(cross, donor_audio, updated_original)

    presence = jnp.where(modified, 0.0, 1.0).astype(watermarked.dtype)
    return augmented, presence, updated_original


def sequence_augmentation(
    key: jnp.ndarray,
    watermarked: jnp.ndarray,
    updated_original: jnp.ndarray,
    mask: jnp.ndarray,
    sample_rate: int = 16000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One whole-batch temporal transform applied identically to
    (watermarked, original, mask) — reference utils/seq_augmentation.py:100-259.

    Returns (watermarked, updated_original, mask).
    """
    b, t = watermarked.shape
    k_method, k_shift, k_perm = jax.random.split(key, 3)
    u = jax.random.uniform(k_method, ())

    seg = int(DEFAULT_SEGMENT_DURATION * sample_rate)
    can_shuffle = t >= 2 * seg and t % seg == 0
    n_segs = t // seg if can_shuffle else 1

    shift = jax.random.randint(k_shift, (), 1, t)
    perm = jax.random.permutation(k_perm, n_segs)

    def apply_all(fn):
        return fn(watermarked), fn(updated_original), fn(mask)

    def do_reverse(_):
        return apply_all(lambda x: jnp.flip(x, axis=1))

    def do_shift(_):
        return apply_all(lambda x: jnp.roll(x, shift, axis=1))

    def do_shuffle(_):
        if not can_shuffle:
            return watermarked, updated_original, mask

        def shuf(x):
            segs = x.reshape(b, n_segs, seg)
            return segs[:, perm, :].reshape(b, t)

        return apply_all(shuf)

    def do_identity(_):
        return watermarked, updated_original, mask

    branch = jnp.where(
        u < REVERSE_PROBABILITY,
        0,
        jnp.where(
            u < REVERSE_PROBABILITY + CIRCULAR_SHIFT_PROBABILITY,
            1,
            jnp.where(
                u < (REVERSE_PROBABILITY + CIRCULAR_SHIFT_PROBABILITY
                     + SHUFFLE_PROBABILITY),
                2,
                3,
            ),
        ),
    )
    return jax.lax.switch(branch, [do_reverse, do_shift, do_shuffle,
                                   do_identity], None)
