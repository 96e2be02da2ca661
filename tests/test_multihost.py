"""Multi-host (2-process) execution tests over CPU Gloo collectives.

Validates what single-process mesh tests cannot: per-process batch
assembly (jax.make_array_from_process_local_data), cross-process gradient
all-reduce, and the train loop's process-0 gating of checkpoints/logs.
Reference equivalent: DDP multi-node via LOCAL_RANK
(reference scripts/train.py:875-876, :2140).

Each test launches two fresh subprocesses (jax.distributed can only
initialize once per process) with 4 virtual CPU devices each -> one
8-device global mesh.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = str(Path(__file__).resolve().parent.parent)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_pair(script: str, tmp_path, timeout=1500):
    """Run `script` in 2 coordinated processes; return their outputs."""
    port = _free_port()
    path = tmp_path / "worker.py"
    path.write_text(script)
    env = dict(
        os.environ,
        PYTHONPATH=REPO_ROOT,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        WORKDIR=str(tmp_path),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(path), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO_ROOT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"multihost worker timed out:\n{out[-3000:]}")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
    return outs


PREAMBLE = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/waveverify_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from waveverify_tpu.parallel import initialize_distributed
initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=pid)
import os
import numpy as np
import jax.numpy as jnp
"""


def test_two_process_batch_assembly_and_allreduce(tmp_path):
    """Each host contributes 4 local rows; the global batch must hold all 8
    and a sharded gradient computation must all-reduce across processes."""
    outs = _run_pair(PREAMBLE + """
from waveverify_tpu.parallel import make_mesh, shard_batch, replicated_sharding
assert jax.process_count() == 2
assert jax.local_device_count() == 4 and jax.device_count() == 8
mesh = make_mesh()

# per-host slice: host p contributes rows valued p*4 + [0..3]
local = (np.arange(4)[:, None] + 4.0 * pid) * np.ones((4, 16), np.float32)
x = shard_batch(mesh, local)
assert x.shape == (8, 16)
total = float(np.asarray(jax.jit(jnp.sum)(x)))
assert total == float(sum(range(8)) * 16), total

# gradient of a replicated-param loss over the sharded batch must match
# the single-host value for the SAME global batch (all-reduce across hosts)
w = jax.device_put(jnp.ones((16,), jnp.float32), replicated_sharding(mesh))
def loss(w, x):
    return jnp.mean((x @ w) ** 2)
g = jax.jit(jax.grad(loss))(w, x)
g_np = np.asarray(g)
full = (np.arange(8)[:, None] * np.ones((8, 16))).astype(np.float32)
expected = 2.0 * (full * (full @ np.ones(16))[:, None]).mean(axis=0)
np.testing.assert_allclose(g_np, expected, rtol=1e-5)
print(f"[{pid}] ASSEMBLY+ALLREDUCE OK", flush=True)
""", tmp_path)
    for out in outs:
        assert "ASSEMBLY+ALLREDUCE OK" in out


@pytest.mark.slow
def test_two_process_train_loop_gating(tmp_path):
    """2 real train steps across 2 processes: per-host batch slicing feeds
    one global step, and only process 0 writes checkpoints/logs."""
    outs = _run_pair(PREAMBLE + """
from waveverify_tpu.config import (TrainConfig, GeneratorConfig,
                                   DetectorConfig, LocatorConfig,
                                   DiscriminatorConfig, LossConfig)
from waveverify_tpu.train.loop import TrainerConfig, train
SMALL = dict(dimension=32, channels_enc=8, n_residual_enc=1)
cfg = TrainConfig(
    generator=GeneratorConfig(channels_dec=12, n_residual_dec=1, **SMALL),
    detector=DetectorConfig(output_dim=8, **SMALL),
    locator=LocatorConfig(output_dim=8, **SMALL),
    discriminator=DiscriminatorConfig(periods=(2,), fft_sizes=(256,),
                                      bands=((0.0, 0.5), (0.5, 1.0))),
    loss=LossConfig(stft_window_lengths=(256,), mel_n_mels=(5, 10),
                    mel_window_lengths=(128, 256)),
    batch_size=8, val_batch_size=2, num_iters=2, valid_freq=2,
    sample_freq=10**9, train_duration=0.2, val_duration=0.2, remat=False)
d = os.environ["WORKDIR"]
log = os.path.join(d, f"log{pid}.jsonl")
train(cfg, TrainerConfig(ckpt_dir=os.path.join(d, "ckpt"),
                         log_file=log,
                         dump_samples=False, log_every=1), max_steps=2)
import json, pathlib
wrote_log = pathlib.Path(log).exists()
assert wrote_log == (pid == 0), f"proc {pid}: log gating broken"
if pid == 0:
    assert (pathlib.Path(d) / "ckpt" / "latest").exists()
    lines = [json.loads(l) for l in open(log)]
    assert any("loss" in l for l in lines)
print(f"[{pid}] TRAIN GATING OK", flush=True)
""", tmp_path, timeout=2700)  # >= loop.py's 1800 s post-val barrier budget
    for out in outs:
        assert "TRAIN GATING OK" in out
