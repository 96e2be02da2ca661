"""Mesh construction and sharding rules.

Data parallelism is the production configuration (SURVEY.md §2.7): the
models total ~10 M params so parameters and optimizer state are replicated
and only the batch is sharded. All collectives (gradient all-reduce) are
inserted by XLA from the sharding annotations and ride ICI.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (replaces the reference's torch DDP launcher +
    LOCAL_RANK check, reference scripts/train.py:2140). No-op when already
    initialized or when running single-process."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data mesh over the first ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)} "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"for a virtual CPU mesh)"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_step(train_step: Callable, mesh: Mesh,
                     donate_state: bool = True,
                     with_percep_scale: bool = False,
                     with_train_disc: bool = False,
                     with_gen_scale: bool = False,
                     with_msg_scale: bool = False,
                     with_bit_mask: bool = False) -> Callable:
    """jit the train step over the mesh: state replicated (and donated so
    params/optimizer state update in place in HBM), batch tensors sharded on
    the data axis, PRNG key replicated.

    Signature expected: step(state, audio, msg, effect_idx, key) — plus a
    trailing replicated host scalar per enabled flag, in order:
    ``with_percep_scale`` (the BER-gated perceptual-ramp value, see
    train/loop.py BerGatedRamp), ``with_train_disc`` (the discriminator-
    cadence gate), ``with_gen_scale`` (the alternating-optimization
    generator-update gate), ``with_msg_scale`` (the stationary-carrier
    freeze gate) and ``with_bit_mask`` (the [nbits] curriculum weight
    vector).
    """
    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh)
    extra = (repl,) if with_percep_scale else ()
    if with_train_disc:
        extra = extra + (repl,)
    if with_gen_scale:
        extra = extra + (repl,)
    if with_msg_scale:
        extra = extra + (repl,)
    if with_bit_mask:
        extra = extra + (repl,)  # [nbits] replicated weight vector
    return jax.jit(
        train_step,
        in_shardings=(repl, batch, batch, batch, repl) + extra,
        out_shardings=None,
        donate_argnums=(0,) if donate_state else (),
    )


def shard_disc_step(disc_step: Callable, mesh: Mesh,
                    donate_state: bool = True) -> Callable:
    """jit the discriminator half of the split-program mode
    (train/step.py make_disc_step): state replicated + donated, batch
    tensors sharded on the data axis, PRNG key replicated."""
    repl = replicated_sharding(mesh)
    batch = batch_sharding(mesh)
    return jax.jit(
        disc_step,
        in_shardings=(repl, batch, batch, repl),
        out_shardings=None,
        donate_argnums=(0,) if donate_state else (),
    )


def shard_multi_step(multi_step: Callable, mesh: Mesh,
                     donate_state: bool = True,
                     with_percep_scale: bool = False,
                     with_train_disc: bool = False,
                     with_gen_scale: bool = False,
                     with_msg_scale: bool = False,
                     with_bit_mask: bool = False) -> Callable:
    """jit a K-steps-per-dispatch train fn (see make_multi_train_step):
    batch tensors are stacked [K, B, ...] with the batch (axis 1) sharded
    on the data axis; state replicated + donated."""
    repl = replicated_sharding(mesh)
    stacked = NamedSharding(mesh, P(None, DATA_AXIS))
    extra = (repl,) if with_percep_scale else ()
    if with_train_disc:
        extra = extra + (repl,)
    if with_gen_scale:
        extra = extra + (repl,)
    if with_msg_scale:
        extra = extra + (repl,)
    if with_bit_mask:
        extra = extra + (repl,)  # [nbits] replicated weight vector
    return jax.jit(
        multi_step,
        in_shardings=(repl, stacked, stacked, stacked, repl) + extra,
        out_shardings=None,
        donate_argnums=(0,) if donate_state else (),
    )


def local_batch_rows(x: Any, axis: int = 0) -> np.ndarray:
    """This process's rows of a global array whose ``axis`` is (possibly)
    sharded over the data axis — the rows this process contributed via
    :func:`shard_batch` / :func:`shard_stacked_batch`.

    Global jax.Arrays spanning other processes' devices cannot be fetched
    wholesale (``np.asarray`` raises); per-sample train-step outputs (BER /
    mIoU for the effect scheduler) are batch-sharded, and each process's
    scheduler must see exactly the rows of the samples IT selected. Works
    for replicated arrays too (full local copy -> slice our range).
    Single-process: plain fetch."""
    if jax.process_count() == 1:
        return np.asarray(x)
    b = x.shape[axis]
    per = b // jax.process_count()
    lo = jax.process_index() * per
    rows: dict = {}
    for s in x.addressable_shards:
        idx = s.index[axis]
        start = idx.start or 0
        data = np.moveaxis(np.asarray(s.data), axis, 0)
        for j in range(data.shape[0]):
            rows.setdefault(start + j, data[j])
    missing = [g for g in range(lo, lo + per) if g not in rows]
    if missing:
        raise RuntimeError(
            f"process {jax.process_index()} holds no addressable shard for "
            f"batch rows {missing} (axis {axis}); expected its own slice "
            f"[{lo}, {lo + per})"
        )
    out = np.stack([rows[g] for g in range(lo, lo + per)])
    return np.moveaxis(out, 0, axis)


def _put(sharding: NamedSharding, a: Any):
    """Lay a host array out over the mesh. Single-process: plain
    device_put. Multi-process: ``a`` is this host's LOCAL shard and the
    global jax.Array is assembled from every process's contribution
    (jax.make_array_from_process_local_data) — the JAX-native equivalent of
    the reference's per-rank DistributedSampler slices
    (reference scripts/train.py:875-876)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))
    return jax.device_put(a, sharding)


def shard_stacked_batch(mesh: Mesh, *arrays: Any):
    """[K, B, ...] host arrays with batch axis 1 sharded (local B slice per
    process in multi-host runs)."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    out = tuple(_put(sh, a) for a in arrays)
    return out[0] if len(out) == 1 else out


def shard_batch(mesh: Mesh, *arrays: Any):
    """Host arrays with the batch sharding. Each process passes its own
    local batch rows in multi-host runs; single-process passes the full
    batch."""
    sh = batch_sharding(mesh)
    out = tuple(_put(sh, a) for a in arrays)
    return out[0] if len(out) == 1 else out
