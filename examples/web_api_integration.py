"""REST API for watermarking (mirrors reference examples/web_api_integration.py).

Endpoints:
  GET  /health            -> {"status": "ok", ...}
  POST /watermark/embed   multipart: file=<audio>, watermark=<hex|bits|int>
                          -> watermarked WAV bytes
  POST /watermark/detect  multipart: file=<audio>
                          -> {"watermark": "...", "confidence": 0.97}
  POST /watermark/locate  multipart: file=<audio>
                          -> {"presence_ratio": 0.93, "mask_downsampled": [...]}

Uses Flask when available, else falls back to http.server (zero-dependency).
The single WaveVerify instance is shared across requests; jitted appliers
make repeat requests at the same bucketed length run at full device speed.

Run: python examples/web_api_integration.py [--checkpoint PATH] [--port 8080]
"""

import argparse
import io
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

# honor WAVEVERIFY_PLATFORM (e.g. =cpu) before the first jax backend use —
# same opt-in as the train CLI (see examples/basic_usage.py)
if os.environ.get("WAVEVERIFY_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["WAVEVERIFY_PLATFORM"])

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from waveverify_tpu import WatermarkID, WaveVerify
from waveverify_tpu.api.audio_io import save_audio

wv: WaveVerify = None  # initialized in main()


def _parse_watermark(value: str) -> WatermarkID:
    value = value.strip()
    if set(value) <= {"0", "1"} and len(value) == 16:
        return WatermarkID.custom(value)
    if value.lower().startswith("0x"):
        return WatermarkID.custom(int(value, 16))
    return WatermarkID.custom(int(value))


def _embed_bytes(audio_bytes: bytes, watermark: str) -> bytes:
    with tempfile.NamedTemporaryFile(suffix=".wav") as fin, \
            tempfile.NamedTemporaryFile(suffix=".wav") as fout:
        fin.write(audio_bytes)
        fin.flush()
        wm = _parse_watermark(watermark)
        audio, sr, _ = wv.embed(fin.name, wm, fout.name)
        return Path(fout.name).read_bytes()


def _detect_bytes(audio_bytes: bytes) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".wav") as fin:
        fin.write(audio_bytes)
        fin.flush()
        wm, conf = wv.detect(fin.name)
    return {"watermark": wm.to_hex(), "bits": wm.to_bits(),
            "confidence": round(conf, 4)}


def _locate_bytes(audio_bytes: bytes) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".wav") as fin:
        fin.write(audio_bytes)
        fin.flush()
        mask = wv.locate(fin.name)
    ds = mask[:: max(len(mask) // 200, 1)]
    return {"presence_ratio": round(float((mask > 0.5).mean()), 4),
            "mask_downsampled": [round(float(v), 3) for v in ds]}


def run_flask(port: int) -> None:
    from flask import Flask, jsonify, request, send_file

    app = Flask("waveverify_tpu")

    @app.get("/health")
    def health():
        return jsonify({"status": "ok", "framework": "waveverify_tpu"})

    @app.post("/watermark/embed")
    def embed():
        f = request.files["file"]
        out = _embed_bytes(f.read(), request.form.get("watermark", "0"))
        return send_file(io.BytesIO(out), mimetype="audio/wav",
                         download_name="watermarked.wav")

    @app.post("/watermark/detect")
    def detect():
        return jsonify(_detect_bytes(request.files["file"].read()))

    @app.post("/watermark/locate")
    def locate():
        return jsonify(_locate_bytes(request.files["file"].read()))

    app.run(host="0.0.0.0", port=port)


def run_stdlib(port: int) -> None:
    """Dependency-free fallback: raw-body endpoints (no multipart)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json({"status": "ok", "framework": "waveverify_tpu"})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                if self.path.startswith("/watermark/embed"):
                    from urllib.parse import parse_qs, urlparse

                    q = parse_qs(urlparse(self.path).query)
                    out = _embed_bytes(body, q.get("watermark", ["0"])[0])
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header("Content-Length", str(len(out)))
                    self.end_headers()
                    self.wfile.write(out)
                elif self.path == "/watermark/detect":
                    self._json(_detect_bytes(body))
                elif self.path == "/watermark/locate":
                    self._json(_locate_bytes(body))
                else:
                    self._json({"error": "not found"}, 404)
            except Exception as e:  # noqa: BLE001 — report to client
                self._json({"error": str(e)}, 500)

    print(f"stdlib server on :{port} (POST raw WAV bodies; "
          f"embed: /watermark/embed?watermark=0xBEEF)")
    HTTPServer(("0.0.0.0", port), Handler).serve_forever()


def main() -> None:
    global wv
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args()

    wv = WaveVerify(checkpoint_path=args.checkpoint)
    try:
        import flask  # noqa: F401

        run_flask(args.port)
    except ImportError:
        run_stdlib(args.port)


if __name__ == "__main__":
    main()
