"""Orbax checkpointing with the reference's tag layout.

The reference writes atomic single-file .pth checkpoints tagged
``latest`` / ``best`` / ``{N}k`` containing models + optimizers + schedulers
+ tracker + config (reference scripts/train.py:1589-1717). Here each tag is
an orbax PyTree checkpoint directory (orbax writes to a tmp dir and renames
— same atomicity) holding the full :class:`TrainState`, plus a sidecar JSON
with host state (effect-scheduler, step, config snapshot).

Layout:
    <ckpt_dir>/latest/   state/   meta.json
    <ckpt_dir>/best/     ...
    <ckpt_dir>/100k/     ...
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:  # orbax is baked into the image; guard anyway for minimal installs
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _np_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _pytree_checkpointer() -> "ocp.Checkpointer":
    """A PyTree checkpointer whose internal barriers involve only THIS process.

    orbax's ``Checkpointer.save`` ends in ``sync_global_processes`` — a
    cross-process device collective. Our save/load wrappers are called
    rank-0-only (reference DDP rank-0 checkpointing, scripts/train.py:1589),
    and every leaf is host-local numpy by the time orbax sees it, so a global
    barrier would be one-sided: process 0 wedges in a Gloo allgather for the
    full 30-min timeout while the other ranks have long moved on (measured in
    the 2-process gating test). Restricting ``active_processes`` to the
    caller keeps orbax's atomicity and makes the barrier a self-sync.
    """
    pid = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=pid,
            active_processes={pid},
            barrier_sync_key_prefix=f"wv_local_p{pid}",
        ),
    )


def save_checkpoint(ckpt_dir: str, tag: str, state: Any,
                    host_state: Optional[Dict[str, Any]] = None) -> Path:
    """Atomically save ``state`` (a TrainState pytree) under ``tag``."""
    root = Path(ckpt_dir)
    root.mkdir(parents=True, exist_ok=True)
    target = root / tag
    state_np = _np_tree(state)

    if _HAVE_ORBAX:
        ckptr = _pytree_checkpointer()
        tmp = root / f".tmp_{tag}"
        if tmp.exists():
            shutil.rmtree(tmp)
        ckptr.save((tmp / "state").resolve(), state_np)
        (tmp / "meta.json").write_text(json.dumps(host_state or {}, default=str))
        if target.exists():
            shutil.rmtree(target)
        tmp.rename(target)
    else:  # pragma: no cover - fallback: npz of flattened leaves
        target.mkdir(parents=True, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(state_np)
        np.savez(target / "state.npz", *leaves)
        (target / "meta.json").write_text(json.dumps(host_state or {}, default=str))
    return target


def load_checkpoint(ckpt_dir: str, tag: str, target_state: Any
                    ) -> tuple[Any, Dict[str, Any]]:
    """Restore a TrainState saved by :func:`save_checkpoint`.

    ``target_state`` supplies the pytree structure/dtypes (create it with
    ``create_train_state`` first — the reference does the same via
    ``load_state_dict``).
    """
    path = Path(ckpt_dir) / tag
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    meta: Dict[str, Any] = {}
    meta_file = path / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())

    if _HAVE_ORBAX and (path / "state").exists():
        ckptr = _pytree_checkpointer()
        restored = ckptr.restore(
            (path / "state").resolve(), item=_np_tree(target_state)
        )
    else:  # pragma: no cover
        data = np.load(path / "state.npz")
        leaves = [data[k] for k in data.files]
        treedef = jax.tree_util.tree_structure(target_state)
        restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return restored, meta


def load_state_free(ckpt_dir: str, tag: str) -> Tuple[Any, Dict[str, Any]]:
    """Structure-free restore: the raw on-disk tree (nested dicts of numpy
    arrays) plus meta.json. Lets a resume survive optimizer-chain structure
    changes (e.g. a weight-decay mask added between runs): the caller grafts
    ``wm_params``/``disc_params``/``step`` onto a freshly-built TrainState
    and starts the optimizer state fresh."""
    path = Path(ckpt_dir) / tag
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    meta: Dict[str, Any] = {}
    meta_file = path / "meta.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
    if _HAVE_ORBAX and (path / "state").exists():
        ckptr = _pytree_checkpointer()
        return ckptr.restore((path / "state").resolve()), meta
    raise FileNotFoundError(f"no orbax state under {path}")


def load_params(ckpt_dir: str, tag: str) -> Any:
    """Restore ONLY the model parameter subtree (``wm_params``) of a saved
    TrainState.

    Inference loaders (``WaveVerify``) must not need the training-run's
    optimizer hyperparameters: optax chains change pytree structure with
    knobs like ``detector_lr_mult``, so restoring against a freshly built
    TrainState template fails on checkpoints from differently-configured
    runs. Restoring the on-disk tree structure-free and picking the params
    field sidesteps that entirely (and skips optimizer-state I/O).
    """
    path = Path(ckpt_dir) / tag
    if not path.exists():
        raise FileNotFoundError(f"no checkpoint at {path}")
    if _HAVE_ORBAX and (path / "state").exists():
        ckptr = _pytree_checkpointer()
        restored = ckptr.restore((path / "state").resolve())
        try:
            return restored["wm_params"]
        except (KeyError, TypeError) as e:  # pragma: no cover
            raise ValueError(
                f"checkpoint at {path} has no 'wm_params' field — not a "
                "WaveVerify TrainState checkpoint?"
            ) from e
    raise FileNotFoundError(
        f"no orbax state under {path}; params-only loading requires an "
        "orbax checkpoint (use load_checkpoint with a matching TrainState "
        "for legacy .npz state files)"
    )


def checkpoint_tags(ckpt_dir: str) -> list[str]:
    root = Path(ckpt_dir)
    if not root.exists():
        return []
    return sorted(
        p.name for p in root.iterdir()
        if p.is_dir() and not p.name.startswith(".tmp")
    )
