#!/usr/bin/env python
"""Capture a jax.profiler trace of the headline embed+detect program and
print a per-op time breakdown (VERDICT r2 weak #1: 683 clips/s = ~5% MFU,
no profile showing where the other 95% goes).

Writes the trace under --out (default /tmp/waveverify_profile) and, after
capture, parses the .xplane.pb with tensorflow's profiler protos if
available — otherwise leaves the trace for manual inspection and prints
wall-clock timing plus the XLA cost analysis (FLOPs/bytes) roofline.

Usage: python scripts/profile_serving.py [--batch 64] [--iters 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("WAVEVERIFY_COMPILE_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache", "bench"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/waveverify_profile")
    ap.add_argument("--precision", default="default")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="activation dtype for the profiled program")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["WAVEVERIFY_COMPILE_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np

    from waveverify_tpu.config import TrainConfig
    from waveverify_tpu.modules.conv import set_conv_precision
    from waveverify_tpu.train.state import create_train_state
    from waveverify_tpu.train.watermarking import WatermarkModels

    set_conv_precision(args.precision)

    cfg = TrainConfig()
    models = WatermarkModels.from_config(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0), models)
    params = state.wm_params

    act = jnp.dtype(args.dtype)

    @jax.jit
    def embed_detect(params, audio, msg):
        # --dtype bfloat16: same structure as bench.py — network passes in
        # bf16, clean audio + watermarked sum stay f32 (memory-bound
        # program; halving activation bytes is the first-order lever)
        residual = models.apply_generator(
            params["generator"], audio.astype(act), msg.astype(act)
        ).astype(jnp.float32)
        watermarked = residual + audio
        logits = models.apply_detector(params["detector"],
                                       watermarked.astype(act))
        bit_probs = jnp.mean(jax.nn.sigmoid(logits.astype(jnp.float32)),
                             axis=1)
        return watermarked, bit_probs

    rng = np.random.RandomState(0)
    T = int(16000 * args.seconds)
    audio = jnp.asarray(rng.randn(args.batch, T).astype(np.float32) * 0.1)
    msg = jnp.asarray(rng.randint(0, 2, (args.batch, 16)).astype(np.float32))

    # cost analysis (device-independent): FLOPs + HBM bytes for the roofline
    lowered = embed_detect.lower(params, audio, msg)
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", float("nan"))
        bytes_total = cost.get("bytes accessed", float("nan"))
        print(json.dumps({"cost_analysis": {
            "gflops_per_call": round(flops / 1e9, 2),
            "gbytes_per_call": round(bytes_total / 1e9, 3),
            "arithmetic_intensity_flops_per_byte":
                round(flops / max(bytes_total, 1.0), 1),
        }}), flush=True)
    except Exception as e:
        print(f"cost analysis unavailable: {e}", flush=True)

    for _ in range(2):
        w, p = embed_detect(params, audio, msg)
        np.asarray(p)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        w, p = embed_detect(params, audio, msg)
    np.asarray(p)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "batch": args.batch, "iters": args.iters,
        "sec_per_call": round(dt / args.iters, 4),
        "clips_per_sec": round(args.batch * args.iters / dt, 1),
    }), flush=True)

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        w, p = embed_detect(params, audio, msg)
    np.asarray(p)
    jax.profiler.stop_trace()
    print(f"trace written to {args.out}", flush=True)

    # Find the .xplane.pb and summarize op time if tensorboard-plugin-profile
    # or tensorflow protos are importable; otherwise print its path.
    import glob

    planes = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane.pb found in trace dir", flush=True)
        return
    plane = planes[-1]
    print(f"xplane: {plane}", flush=True)
    try:
        summarize_xplane(plane)
    except Exception as e:
        print(f"xplane parse unavailable ({type(e).__name__}: {e}); "
              f"inspect with tensorboard", flush=True)


def summarize_xplane(path: str, top: int = 30) -> None:
    """Minimal .xplane.pb reader: decodes the XSpace proto with a
    hand-rolled varint walker (no tensorflow dependency) and prints the
    top ops by total self-duration on the device planes."""
    from collections import defaultdict

    data = open(path, "rb").read()

    def varint(buf, i):
        x = 0
        s = 0
        while True:
            b = buf[i]
            i += 1
            x |= (b & 0x7F) << s
            if not b & 0x80:
                return x, i
            s += 7

    def fields(buf):
        i = 0
        n = len(buf)
        while i < n:
            tag, i = varint(buf, i)
            fnum, wt = tag >> 3, tag & 7
            if wt == 2:
                ln, i = varint(buf, i)
                yield fnum, buf[i:i + ln]
                i += ln
            elif wt == 0:
                v, i = varint(buf, i)
                yield fnum, v
            elif wt == 5:
                yield fnum, buf[i:i + 4]
                i += 4
            elif wt == 1:
                yield fnum, buf[i:i + 8]
                i += 8
            else:
                raise ValueError(f"wire type {wt}")

    # xplane.proto numbering:
    # XPlane{ id=1, name=2, lines=3, event_metadata=4, stat_metadata=5 }
    # XLine{ id=1, name=2, ..., events=4 }
    # XEvent{ metadata_id=1, offset_ps=2, duration_ps=3, stats=4 }
    # XEventMetadata map entry{ key=1, value=2(XEventMetadata{id=1,name=2}) }
    def classify(name: str) -> str:
        """Bucket an XLA op name into a readable category."""
        n = name.lstrip("%")
        if "tpu_custom_call" in name or n.startswith(("block_",)):
            return "pallas custom-call"
        if n.startswith("copy-start") or n.startswith("copy-done"):
            return "async param copy"
        if n.startswith("copy"):
            return "layout copy"
        if n.startswith(("convolution", "conv")):
            return "convolution"
        if n.startswith(("fusion", "loop_", "input_", "output_",
                         "broadcast", "multiply", "add", "reduce",
                         "select", "bitcast", "slice", "concatenate",
                         "transpose", "reverse", "pad", "dynamic")):
            return "fusion/elementwise"
        if n.startswith("dot") or "einsum" in n:
            return "matmul"
        if n.startswith("jit_"):
            return "program(parent)"
        return "other"

    for fnum, val in fields(data):
        if fnum != 1:
            continue
        plane_name = ""
        md = {}
        lines = []
        for f2, v2 in fields(val):
            if f2 == 2:
                plane_name = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # event_metadata map entry
                key = None
                name = ""
                for f3, v3 in fields(v2):
                    if f3 == 1:
                        key = v3
                    elif f3 == 2:
                        for f4, v4 in fields(v3):
                            if f4 == 2:
                                name = v4.decode("utf-8", "replace")
                md[key] = name
        if "TPU" not in plane_name and "/device" not in plane_name.lower():
            continue
        print(f"\n==== plane: {plane_name} ====")
        for line in lines:
            line_name = ""
            dur = defaultdict(int)
            cnt = defaultdict(int)
            for f3, v3 in fields(line):
                if f3 == 2:
                    line_name = v3.decode("utf-8", "replace")
                elif f3 == 4:  # XEvent
                    mid = 0
                    d = 0
                    for f4, v4 in fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            d = v4
                    dur[mid] += d
                    cnt[mid] += 1
            if not dur:
                continue
            total = sum(dur.values())
            print(f"\n-- line: {line_name!r}  total {total / 1e12:.4f} s "
                  f"({sum(cnt.values())} events) --")
            # category rollup (async copies overlap compute; their spans
            # are wait time, not bandwidth — rank compute lines by this)
            cats = defaultdict(int)
            for mid, d in dur.items():
                cats[classify(md.get(mid, str(mid)))] += d
            for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
                print(f"   {d / 1e12:9.5f} s  {100.0 * d / total:5.1f}%  "
                      f"[{c}]")
            rows = sorted(dur.items(), key=lambda kv: -kv[1])[:top]
            for mid, d in rows:
                name = md.get(mid, str(mid))
                print(f"{d / 1e12:9.5f} s  {100.0 * d / total:5.1f}%  "
                      f"x{cnt[mid]:<5d} {name[:140]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--summarize":
        summarize_xplane(sys.argv[2])
    else:
        main()
