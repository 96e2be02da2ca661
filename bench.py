"""Headline benchmark: embed+detect throughput (clips/sec/chip @ 16 kHz).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

The BASELINE.json target is >= 20x the CPU baseline per chip. The baseline
is the same embed+detect pipeline executed on the host CPU backend (the
reference is a CPU/GPU PyTorch stack; its CPU path is the portable
baseline available in this image). ``vs_baseline`` = device throughput /
host-CPU throughput measured in the same process.

Usage: python bench.py [--batch 64] [--seconds 1.0] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import numpy as np


def _build(cfg, act_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from waveverify_tpu.train.state import create_train_state
    from waveverify_tpu.train.watermarking import WatermarkModels

    models = WatermarkModels.from_config(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    act = jnp.dtype(act_dtype)

    @jax.jit
    def embed_detect(params, audio, msg):
        # bf16 activation mode (profile-driven, docs/SERVING_PERF.md): the
        # program is memory-bound (intensity ~37 flops/byte vs the ~240
        # bf16 roofline crossover on v5e), so halving activation bytes is
        # the first-order lever. The CLEAN audio and the watermarked sum
        # stay f32 — only the network activations (residual synthesis and
        # detector features) run in bf16; the residual is cast up before
        # the add so watermarked-audio fidelity is f32.
        a = audio.astype(act)
        residual = models.apply_generator(params["generator"], a,
                                          msg.astype(act))
        watermarked = residual.astype(jnp.float32) + audio
        logits = models.apply_detector(params["detector"],
                                       watermarked.astype(act))
        bit_probs = jnp.mean(jax.nn.sigmoid(logits.astype(jnp.float32)),
                             axis=1)
        return watermarked, bit_probs

    return embed_detect, state.wm_params


def _throughput_with(fn, params, batch: int, clip_len: int, iters: int,
                     repeats: int = 3) -> float:
    import jax
    import numpy as np

    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    audio = jnp.asarray(rng.randn(batch, clip_len).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.randint(0, 2, (batch, 16)).astype(np.float32))
    for _ in range(2):  # warmup; second call catches re-tracing
        w, p = fn(params, audio, msg)
        np.asarray(p)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            w, p = fn(params, audio, msg)
        # a full host fetch is the only completion signal the remote-TPU
        # tunnel honors — block_until_ready can return while compute is
        # still in the pipeline, under-reporting by >100x (measured)
        np.asarray(p)
        times.append(time.perf_counter() - t0)
    return batch * iters / sorted(times)[len(times) // 2]


def _throughput(device, batch: int, clip_len: int, iters: int,
                repeats: int = 3, act_dtype: str = "float32") -> float:
    """clips/sec of jitted embed+detect on `device` (median of `repeats`
    timed windows, warmup excluded, completion forced by host fetch)."""
    import jax

    from waveverify_tpu.config import TrainConfig

    cfg = TrainConfig()
    with jax.default_device(device):
        fn, params = _build(cfg, act_dtype)
        params = jax.device_put(params, device)
        return _throughput_with(fn, params, batch, clip_len, iters, repeats)


def _probe_real_backend(timeout_s: float = 60.0, retries: int = 4,
                        retry_wait_s: float = 30.0) -> int:
    """Count non-cpu devices via a SUBPROCESS probe.

    jax.devices() blocks indefinitely while this image's tunneled TPU
    backend is wedged (threads stuck on futex, recovers after ~10 min), so
    probing in-process would hang the whole bench. Retry for a bounded
    window to ride out a wedge, then report 0 so the caller can fall back
    to CPU instead of producing no artifact at all.
    """
    import subprocess

    code = ("import jax; "
            "print(sum(d.platform != 'cpu' for d in jax.devices()))")
    for attempt in range(retries):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s,
            )
            return int(out.stdout.strip().splitlines()[-1])
        except Exception:
            if attempt < retries - 1:
                time.sleep(retry_wait_s)
    return 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu-iters", type=int, default=3)
    ap.add_argument("--cpu-batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="accelerator activation dtype (clean audio and the "
                         "watermarked sum stay f32 either way; the CPU "
                         "baseline always runs f32)")
    args = ap.parse_args()

    n_accel = _probe_real_backend()

    import jax

    if n_accel == 0:
        # never touch the (possibly wedged) tunnel backend in this process,
        # and reuse a persistent compile cache so the CPU fallback fits a
        # driver timeout (full-config CPU compiles are multi-minute). The
        # cache lives inside the repo: /tmp and /root/.cache are wiped on
        # VM reboots, only the repo mount persists.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(REPO_ROOT) / ".jax_cache" / "bench_cpu"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    # Serving precision: one-pass bf16 MXU passes for f32 convs. Measured on
    # v5e: 2.4x over HIGHEST with max bit-probability delta 2e-5 (threshold
    # decisions unchanged for any trained model). Golden-parity tests run on
    # CPU where this flag is a no-op.
    from waveverify_tpu.modules.conv import set_conv_precision

    set_conv_precision("default")

    clip_len = int(16000 * args.seconds)

    accel = [d for d in jax.devices() if d.platform != "cpu"]
    cpu = jax.devices("cpu")[0] if accel else None
    target = accel[0] if accel else jax.devices()[0]

    note = None
    try:
        value = _throughput(target, args.batch, clip_len, args.iters,
                            act_dtype=args.dtype if accel else "float32")
    except Exception as exc:
        if not accel:
            raise
        # e.g. RESOURCE_EXHAUSTED when a training run holds the chip's HBM:
        # fall back to a CPU measurement rather than producing no artifact
        note = (f"accelerator measurement failed ({type(exc).__name__}: "
                f"{str(exc)[:120]}); CPU-only fallback measurement")
        accel = []
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/waveverify_tpu_jax_cache")
        target, cpu = jax.devices("cpu")[0], None
        value = _throughput(target, args.cpu_batch, clip_len, args.cpu_iters)

    if accel:
        # pallas can't lower for the CPU backend; the host baseline is the
        # plain XLA program (pallas_enabled() also checks default_device —
        # this is belt and braces for the driver's canonical run)
        from waveverify_tpu.ops import pallas_kernels
        from waveverify_tpu.ops.pallas_kernels import set_pallas_mode

        prior_mode = pallas_kernels._PALLAS_MODE  # may be a WAVEVERIFY_PALLAS override
        set_pallas_mode("off")
        cpu_tp = _throughput(cpu, args.cpu_batch, clip_len, args.cpu_iters)
        set_pallas_mode(prior_mode)
    else:
        cpu_tp = value  # already on CPU: ratio 1.0 by definition

    out = {
        "metric": "embed_detect_throughput_16khz_1s_clips",
        "value": round(value, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(value / max(cpu_tp, 1e-9), 2),
        "act_dtype": args.dtype if accel else "float32",
    }
    if n_accel == 0:
        out["note"] = ("accelerator unreachable (tunnel wedge outlasted the "
                       "probe window); CPU-only fallback measurement")
    elif note is not None:
        out["note"] = note
    if "note" in out:
        # cite the most recent REAL accelerator measurement so a fallback
        # row is not mistaken for a regression
        last = _last_accel_measurement()
        if last is not None:
            out["last_accel"] = last
    print(json.dumps(out))


def _last_accel_measurement():
    """Most recent driver-recorded TPU bench result (BENCH_r*.json),
    skipping rounds whose own row was a CPU fallback."""
    import re

    best = None
    for p in sorted(Path(REPO_ROOT).glob("BENCH_r*.json")):
        try:
            parsed = json.loads(p.read_text()).get("parsed") or {}
        except Exception:
            continue
        if "note" in parsed:  # that round was itself a fallback
            continue
        if "value" in parsed:
            m = re.search(r"r(\d+)", p.name)
            best = {"round": int(m.group(1)) if m else None,
                    "value": parsed["value"],
                    "vs_baseline": parsed.get("vs_baseline")}
    return best


if __name__ == "__main__":
    main()
