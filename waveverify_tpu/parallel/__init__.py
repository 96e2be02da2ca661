"""Device-mesh parallelism for waveverify_tpu.

The reference's only parallelism is torch DataParallel/DDP + ZeRO-1 over
NCCL (reference scripts/train.py:875-876, :755; SURVEY.md §2.7). The
TPU-native equivalent is one pjit program over a ``jax.sharding.Mesh``:
batch sharded over the ``data`` axis, parameters/optimizer state replicated
(~10 M params — sharding them buys nothing), gradient all-reduce inserted by
XLA over ICI. The reference's DP-awareness hacks (message batch repair,
reference model/watermarking.py:313-329) disappear by construction.

Multi-host: call :func:`initialize_distributed` first on each host, then
build the mesh over ``jax.devices()`` as usual.
"""

from waveverify_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_disc_step,
    shard_train_step,
)

__all__ = [
    "DATA_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_disc_step",
    "shard_train_step",
    "initialize_distributed",
]
