"""Basic WaveVerify usage: embed -> detect -> verify -> locate
(mirrors reference examples/basic_usage.py, same flow on the TPU stack).

Run:  python examples/basic_usage.py [input.wav] [--checkpoint PATH]
With no input, a synthetic tone is generated so the example is self-contained.
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

# honor WAVEVERIFY_PLATFORM (e.g. =cpu) before the first jax backend use —
# same opt-in as the train CLI; on images whose sitecustomize pins
# JAX_PLATFORMS to a device tunnel, plain env vars can't force CPU
if os.environ.get("WAVEVERIFY_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["WAVEVERIFY_PLATFORM"])

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from waveverify_tpu import WatermarkID, WaveVerify
from waveverify_tpu.api.audio_io import save_audio


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax dir or reference .pth (random weights if unset)")
    ap.add_argument("--outdir", default="output")
    args = ap.parse_args()

    outdir = Path(args.outdir)
    outdir.mkdir(exist_ok=True)

    if args.input is None:
        print("no input given — generating a synthetic 3 s tone")
        t = np.arange(3 * 16000) / 16000
        tone = (0.4 * np.sin(2 * np.pi * 440 * t)
                + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
        args.input = str(outdir / "input.wav")
        save_audio(tone, args.input)

    wv = WaveVerify(checkpoint_path=args.checkpoint)

    # 1. create a watermark identity
    wm = WatermarkID.for_creator("studio_abc")
    print(f"watermark: bits={wm.to_bits()} hex={wm.to_hex()}")

    # 2. embed
    out_path = outdir / "watermarked.wav"
    audio, sr, _ = wv.embed(args.input, wm, out_path)
    print(f"embedded -> {out_path} ({len(audio)} samples @ {sr} Hz)")

    # 3. detect
    detected, confidence = wv.detect(out_path)
    print(f"detected: bits={detected.to_bits()} confidence={confidence:.3f}")

    # 4. verify
    ok = wv.verify(out_path, wm)
    print(f"verify(expected={wm.to_hex()}): {'MATCH' if ok else 'MISMATCH'}"
          + ("" if args.checkpoint else "  (random weights — detection needs"
             " a trained checkpoint)"))

    # 5. locate
    mask = wv.locate(out_path)
    frac = float((mask > 0.5).mean())
    print(f"locate: {frac:.1%} of samples flagged as watermarked")

    # 6. false-positive check on clean audio
    clean_wm, clean_conf = wv.detect(args.input)
    print(f"clean audio detect: confidence={clean_conf:.3f} "
          f"bits={clean_wm.to_hex()}")


if __name__ == "__main__":
    main()
