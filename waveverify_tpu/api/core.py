"""Public inference API: WaveVerify embed / detect / locate / verify.

Mirrors the reference API exactly (reference waveverify/core.py:51-729) —
same method signatures, return types, and decision semantics:

- ``embed(path, wm, out)``   -> (np watermarked, 16000, WatermarkID)
- ``detect(path)``           -> (WatermarkID, confidence); confidence is the
  mean over time and bits of sigmoid(logits) (reference core.py:577-583);
  bits via sigmoid -> time mean -> threshold 0.5 (the canonical path, see
  SURVEY.md §3.4).
- ``locate(path)``           -> per-sample float mask, linearly interpolated
  back to the input length (reference core.py:599-655).
- ``verify(path, expected)`` -> bool bit equality (reference core.py:657-701).

TPU-native design: each network is a jitted apply over **bucketed lengths**
(audio is right-padded to the next bucket so arbitrary-length files reuse a
small set of compiled programs; the conv stack is causal so padding never
contaminates earlier samples, and outputs are trimmed back). Batched
variants (`embed_batch` / `detect_batch`) shard over the data mesh for
fleet-scale serving.
"""

from __future__ import annotations

import functools
import logging
import math
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from waveverify_tpu.api.audio_io import (
    load_audio,
    message_to_tensor,
    save_audio,
    tensor_to_message,
)
from waveverify_tpu.api.watermark_id import WatermarkID
from waveverify_tpu.config import TrainConfig, load_config
from waveverify_tpu.models.detector import detector_bits, detector_confidence
from waveverify_tpu.train.watermarking import WatermarkModels

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000


def _next_bucket(length: int, hop: int = 320, min_len: int = 4800) -> int:
    """Smallest bucket >= length: hop-aligned, ~1.26x geometric spacing so
    any audio length maps to one of ~25 compiled programs."""
    n = max(length, min_len)
    bucket = min_len
    while bucket < n:
        bucket = int(math.ceil(bucket * 1.26 / hop) * hop)
    return bucket


class WaveVerify:
    """Drop-in replacement for the reference ``waveverify.WaveVerify``.

    Parameters
    ----------
    checkpoint_path:
        - a directory written by :mod:`waveverify_tpu.train.checkpoint`
          (orbax) or by :func:`waveverify_tpu.convert.convert_checkpoint`;
        - a reference PyTorch ``.pth`` file (converted on the fly, needs
          host torch — baked into this image);
        - ``None``: randomly-initialized weights (embedding still works
          end-to-end; detection quality requires trained weights).
    config_path: optional reference-format YAML (conf/base.yml schema).
    serve_dtype: activation dtype for the jitted model passes. "bfloat16"
        roughly halves HBM traffic on the memory-bound serving program
        (profile: intensity ~37 flops/byte vs the ~240 roofline crossover
        on v5e) — clean audio, the watermarked sum, and all
        probabilities/decisions stay f32; only network-internal [B, T, C]
        activations are bf16. Default "float32" = bit-level parity with
        the reference path; flip to "bfloat16" for throughput-critical
        serving (BER impact measured per-checkpoint by the eval CLI's
        --serve-dtype study).
    """

    def __init__(self, checkpoint_path: Optional[Union[str, Path]] = None,
                 config_path: Optional[Union[str, Path]] = None,
                 config: Optional[TrainConfig] = None,
                 seed: int = 0,
                 precision: Optional[str] = "default",
                 serve_dtype: str = "float32"):
        # Serving runs one-pass bf16 MXU passes for f32 convs ("default"):
        # measured 2.4x over "highest" on v5e with max bit-probability delta
        # 2e-5 — decision-irrelevant on converged small-residual weights.
        # Pass precision="highest" for bit-level reference parity work, or
        # precision=None to leave the process-global setting untouched
        # (callers like the eval CLI manage precision themselves; the ctor
        # must not clobber their --conv-precision choice).
        from waveverify_tpu.modules.conv import set_conv_precision

        if precision is not None:
            set_conv_precision(precision)
        # Config precedence: an explicit `config=` object always wins; else
        # the checkpoint's embedded model-config snapshot overrides the
        # (default or YAML-loaded) model sections — the snapshot is what the
        # weights were trained with, and sweeping carrier-mode checkpoints
        # without it reads BER-at-chance. When a YAML was explicitly given
        # AND a snapshot exists, the override is surfaced as a WARNING with
        # the overridden keys; pass `config=load_config(path)` to make the
        # YAML win instead.
        self.config = config if config is not None else load_config(config_path)
        if checkpoint_path is not None and config is None:
            snap = self._peek_model_config(Path(checkpoint_path))
            if snap:
                from waveverify_tpu.config import apply_model_config

                if config_path is not None:
                    logger.warning(
                        "checkpoint model-config snapshot overrides the "
                        "explicit config YAML for model sections %s — pass "
                        "config=load_config(%r) to force the YAML instead",
                        sorted(snap.keys()), str(config_path))
                self.config = apply_model_config(self.config, snap)
                logger.info("applied model-config snapshot from checkpoint")
        self.models = WatermarkModels.from_config(self.config)
        self.sample_rate = self.config.generator.sample_rate
        self.hop = self.config.generator.hop_length
        self._act = jnp.dtype(serve_dtype)
        self._apply_cache: Dict[Tuple[str, int], callable] = {}

        if checkpoint_path is not None:
            self.params = self._load_params(Path(checkpoint_path))
        else:
            logger.warning(
                "no checkpoint given — using randomly initialized weights"
            )
            from waveverify_tpu.train.state import create_train_state

            state = create_train_state(self.config, jax.random.PRNGKey(seed),
                                       self.models)
            self.params = state.wm_params
        self._mesh = None

    # -- multi-chip serving ------------------------------------------------------

    def use_mesh(self, mesh=None) -> "WaveVerify":
        """Shard batched serving (`embed_batch`/`detect_batch`) over a data
        mesh: batch dim split across chips, params replicated, collectives
        over ICI. Single-clip methods stay single-device (a batch of one
        can't shard). Pass a `jax.sharding.Mesh` or None for all devices.
        Returns self for chaining."""
        from waveverify_tpu.parallel import make_mesh, replicated_sharding

        self._mesh = mesh if mesh is not None else make_mesh()
        self._apply_cache.clear()
        self.params = jax.device_put(
            self.params, replicated_sharding(self._mesh)
        )
        return self

    def _batch_shardings(self, n_batch_args: int):
        """(in_shardings, batch_put) for a mesh-sharded batch fn, or None."""
        if self._mesh is None:
            return None
        from waveverify_tpu.parallel import batch_sharding, replicated_sharding

        repl = replicated_sharding(self._mesh)
        batch = batch_sharding(self._mesh)
        return (repl,) + (batch,) * n_batch_args, batch

    # -- checkpoint loading ---------------------------------------------------

    @staticmethod
    def _peek_model_config(path: Path) -> Optional[dict]:
        """Read the architecture snapshot a checkpoint carries, if any:
        ``meta.json["model_config"]`` for orbax tag dirs (written by the
        train loop) or the ``__config__`` entry of a compact ``.npz``."""
        import json as _json

        try:
            if path.suffix == ".npz":
                with np.load(path) as z:
                    if "__config__" in z.files:
                        return _json.loads(bytes(z["__config__"]).decode())
                return None
            for meta in (path / "meta.json",
                         path / "latest" / "meta.json"):
                if meta.exists():
                    return _json.loads(meta.read_text()).get("model_config")
        except Exception:
            logger.warning("could not read model-config snapshot from %s",
                           path, exc_info=True)
        return None

    def _load_params(self, path: Path):
        if path.suffix in (".pth", ".pt", ".ckpt"):
            from waveverify_tpu.convert import convert_torch_checkpoint

            logger.info("converting PyTorch checkpoint %s", path)
            return convert_torch_checkpoint(path, self.config)
        if path.suffix == ".npz":
            from waveverify_tpu.convert import load_weights_npz

            logger.info("loading compact weights %s", path)
            return jax.tree_util.tree_map(jnp.asarray,
                                          load_weights_npz(path))
        # orbax TrainState dir (tag dir or ckpt root containing 'latest')
        from waveverify_tpu.train import checkpoint as ckpt

        root, tag = path, None
        if (path / "state").exists():
            root, tag = path.parent, path.name
        elif (path / "latest").exists():
            tag = "latest"
        else:
            raise FileNotFoundError(
                f"no checkpoint found at {path} (expected an orbax tag dir "
                "or a .pth file)"
            )
        # params-only restore: independent of the optimizer structure the
        # checkpoint was trained with (see train/checkpoint.load_params)
        params = ckpt.load_params(str(root), tag)
        return jax.tree_util.tree_map(jnp.asarray, params)

    # -- jitted model appliers (per bucketed length) --------------------------

    def _generator_fn(self, length: int):
        key = ("generator", length)
        if key not in self._apply_cache:
            act = self._act

            @jax.jit
            def run(params, audio, msg):
                # serve_dtype: network runs in `act`; the residual is cast
                # up BEFORE the add so the watermarked audio keeps f32
                # fidelity (the watermark residual's own bf16 quantization
                # is ~0.4% relative on an already ~-25 dB signal)
                residual = self.models.apply_generator(
                    params["generator"], audio.astype(act), msg.astype(act)
                ).astype(audio.dtype)
                return residual, residual + audio

            self._apply_cache[key] = run
        return self._apply_cache[key]

    def _detector_fn(self, length: int):
        """Detector over a padded bucket, time-averaged over the REAL length.

        ``t`` is a traced scalar: sigmoid(logits) is averaged over [0, t)
        only, so bucket zero-padding (up to ~26% of the buffer at the 1.26x
        bucket spacing) never dilutes bit probabilities or confidence. This
        matches the reference's unpadded mean (waveverify/core.py:577-583)
        and the `_detect_long` streaming definition — short and long audio
        share one decision rule.
        """
        key = ("detector", length)
        if key not in self._apply_cache:
            act = self._act

            @jax.jit
            def run(params, audio, t):
                logits = self.models.apply_detector(
                    params["detector"], audio.astype(act)
                ).astype(jnp.float32)
                probs = jax.nn.sigmoid(logits)  # [B, T, nbits]
                valid = (jnp.arange(probs.shape[1]) < t)[None, :, None]
                denom = jnp.maximum(t, 1).astype(probs.dtype)
                probs = jnp.sum(probs * valid, axis=1) / denom  # [B, nbits]
                conf = jnp.mean(probs, axis=1)
                return probs, conf

            self._apply_cache[key] = run
        return self._apply_cache[key]

    def _locator_fn(self, length: int):
        key = ("locator", length)
        if key not in self._apply_cache:
            act = self._act

            @jax.jit
            def run(params, audio):
                return jax.nn.sigmoid(
                    self.models.apply_locator(
                        params["locator"], audio.astype(act)
                    ).astype(jnp.float32)
                )

            self._apply_cache[key] = run
        return self._apply_cache[key]

    def _pad_bucket(self, audio: np.ndarray) -> Tuple[jnp.ndarray, int]:
        t = audio.shape[-1]
        bucket = _next_bucket(t, self.hop)
        x = np.zeros((1, bucket), np.float32)
        x[0, :t] = audio
        return jnp.asarray(x), t

    # -- chunked long-audio path ------------------------------------------------
    #
    # All three networks are causal (conf/base.yml `causal: true`): output at
    # sample t depends only on inputs in [t - RF, t]. Audio longer than
    # `long_threshold` is therefore processed in fixed hop-aligned chunks
    # with `chunk_context` samples of real left context; outputs inside the
    # context region are discarded, making every kept sample bit-exact vs
    # the full-length computation (chunk starts are hop multiples, so conv
    # framing and SpecBlock STFT phases line up with the monolithic run).
    # One executable shape serves the entire stream -> O(1) device memory
    # for unbounded audio, one compile.

    long_threshold: int = 60 * 16000   # use chunking above this many samples
    chunk_samples: int = 160000        # 10 s per chunk
    chunk_context: int = 16000         # 1 s >> total causal receptive field

    def _iter_chunks(self, audio: np.ndarray):
        """Yield (window [1, W], keep_from, out_start, out_len) with
        W = context + chunk fixed (one executable for the whole stream).

        The first window starts at sample 0 and keeps its whole output —
        prepending literal zeros would NOT reproduce the model's own
        per-layer causal padding. Later windows start `context` samples
        early on real audio and keep only the non-context region. The final
        window is zero-padded on the right, exactly like the monolithic
        path's bucket padding.
        """
        t = audio.shape[-1]
        ctx, chunk = self.chunk_context, self.chunk_samples
        w = ctx + chunk
        s = 0
        while s < t:
            keep_from = 0 if s == 0 else ctx
            lo = s - keep_from
            piece = audio[lo:lo + w]
            buf = np.zeros((1, w), np.float32)
            buf[0, :piece.shape[-1]] = piece
            out_len = min(w - keep_from, t - s)
            yield jnp.asarray(buf), keep_from, s, out_len
            s += out_len

    def _embed_long(self, audio: np.ndarray, msg: jnp.ndarray) -> np.ndarray:
        fn = self._generator_fn(self.chunk_context + self.chunk_samples)
        out = np.empty_like(audio)
        for x, keep, s, n in self._iter_chunks(audio):
            _, w = fn(self.params, x, msg)
            out[s:s + n] = np.asarray(w)[0, keep:keep + n]
        return out

    def _detect_long(self, audio: np.ndarray) -> Tuple[np.ndarray, float]:
        """Returns (bit probs [nbits], confidence) — streaming time-average
        of sigmoid(logits), identical to the full-length definition."""
        key = ("detector_logits", self.chunk_context + self.chunk_samples)
        if key not in self._apply_cache:
            act = self._act
            self._apply_cache[key] = jax.jit(
                lambda p, a: jax.nn.sigmoid(
                    self.models.apply_detector(
                        p["detector"], a.astype(act)
                    ).astype(jnp.float32)
                )
            )
        fn = self._apply_cache[key]
        t = audio.shape[-1]
        acc = None
        for x, keep, s, n in self._iter_chunks(audio):
            probs = np.asarray(fn(self.params, x))[0, keep:keep + n]  # [n, 16]
            part = probs.sum(axis=0, dtype=np.float64)
            acc = part if acc is None else acc + part
        bit_probs = (acc / t).astype(np.float32)
        return bit_probs, float(bit_probs.mean())

    def _locate_long(self, audio: np.ndarray) -> np.ndarray:
        fn = self._locator_fn(self.chunk_context + self.chunk_samples)
        out = np.empty(audio.shape[-1], np.float32)
        for x, keep, s, n in self._iter_chunks(audio):
            out[s:s + n] = np.asarray(fn(self.params, x))[0, keep:keep + n]
        return out

    # -- public API ------------------------------------------------------------

    def embed(self, audio_path: Union[str, Path],
              watermark: Union[WatermarkID, str, int, bytes],
              output_path: Optional[Union[str, Path]] = None
              ) -> Tuple[np.ndarray, int, WatermarkID]:
        """Embed a watermark (reference waveverify/core.py:476-543)."""
        wm = self._validate_watermark_id(watermark)
        audio, sr = load_audio(audio_path, self.sample_rate)
        msg = jnp.asarray(message_to_tensor(wm.to_bits()))
        if audio.shape[-1] > self.long_threshold:
            out = self._embed_long(np.asarray(audio, np.float32).ravel(), msg)
        else:
            x, t = self._pad_bucket(audio)
            _, watermarked = self._generator_fn(x.shape[-1])(
                self.params, x, msg
            )
            out = np.asarray(watermarked)[0, :t]
        if output_path is not None:
            save_audio(out, output_path, sr)
        return out, sr, wm

    def detect(self, audio_path: Union[str, Path]
               ) -> Tuple[WatermarkID, float]:
        """Detect the embedded watermark (reference waveverify/core.py:545-597)."""
        audio, _sr = load_audio(audio_path, self.sample_rate)
        return self.detect_array(audio)

    def detect_array(self, audio: np.ndarray) -> Tuple[WatermarkID, float]:
        """Detection from an in-memory float32 array (TPU-side extension;
        the reference only accepts paths)."""
        audio = np.asarray(audio, np.float32).ravel()
        if audio.shape[-1] > self.long_threshold:
            bit_probs, conf = self._detect_long(audio)
            bits = tensor_to_message(bit_probs[None, :])
            return WatermarkID.custom(bits), conf
        x, t = self._pad_bucket(audio)
        probs, conf = self._detector_fn(x.shape[-1])(
            self.params, x, jnp.int32(t)
        )
        bits = tensor_to_message(np.asarray(probs))
        return WatermarkID.custom(bits), float(np.asarray(conf)[0])

    def locate(self, audio_path: Union[str, Path]) -> np.ndarray:
        """Per-sample watermark presence mask
        (reference waveverify/core.py:599-655)."""
        audio, _sr = load_audio(audio_path, self.sample_rate)
        return self.locate_array(audio)

    def locate_array(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32).ravel()
        if audio.shape[-1] > self.long_threshold:
            return self._locate_long(audio)
        x, t = self._pad_bucket(audio)
        mask = np.asarray(self._locator_fn(x.shape[-1])(self.params, x))[0]
        # the locator is sample-resolution already; trimming the bucket pad
        # IS the reference's interpolate-to-input-length (core.py:637-644)
        return mask[:t]

    def verify(self, audio_path: Union[str, Path],
               expected_watermark: Union[WatermarkID, str, int, bytes]) -> bool:
        """Bit-exact watermark verification (reference waveverify/core.py:657-701)."""
        expected = self._validate_watermark_id(expected_watermark)
        detected, _conf = self.detect(audio_path)
        return detected.to_bits() == expected.to_bits()

    # -- batched serving (TPU extension) ----------------------------------------

    def embed_batch(self, audio: np.ndarray, bits: np.ndarray) -> np.ndarray:
        """audio [B, T] float32, bits [B, 16] float32 -> watermarked [B, T].
        One jitted call; after `use_mesh()` the batch shards over the data
        mesh (B must divide the device count)."""
        x = jnp.asarray(audio, jnp.float32)
        b = jnp.asarray(bits, jnp.float32)
        sh = self._batch_shardings(2)
        if sh is None:
            fn = self._generator_fn(x.shape[-1])
        else:
            in_sh, batch_put = sh
            key = ("generator_mesh", x.shape[-1])
            if key not in self._apply_cache:
                act = self._act

                def run(params, audio, msg):
                    residual = self.models.apply_generator(
                        params["generator"], audio.astype(act),
                        msg.astype(act)
                    ).astype(audio.dtype)
                    return residual, residual + audio

                self._apply_cache[key] = jax.jit(run, in_shardings=in_sh)
            fn = self._apply_cache[key]
            x = jax.device_put(x, batch_put)
            b = jax.device_put(b, batch_put)
        _, watermarked = fn(self.params, x, b)
        return np.asarray(watermarked)

    def detect_batch(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """audio [B, T] -> (bits [B, 16] int, confidence [B]). Shards over
        the data mesh after `use_mesh()`."""
        x = jnp.asarray(audio, jnp.float32)
        sh = self._batch_shardings(1)
        if sh is None:
            det = self._detector_fn(x.shape[-1])
            fn = lambda params, a: det(params, a, jnp.int32(a.shape[-1]))
        else:
            in_sh, batch_put = sh
            key = ("detector_mesh", x.shape[-1])
            if key not in self._apply_cache:
                act = self._act

                def run(params, audio):
                    logits = self.models.apply_detector(
                        params["detector"], audio.astype(act)
                    ).astype(jnp.float32)
                    probs = jnp.mean(jax.nn.sigmoid(logits), axis=1)
                    return probs, detector_confidence(logits)

                self._apply_cache[key] = jax.jit(run, in_shardings=in_sh)
            fn = self._apply_cache[key]
            x = jax.device_put(x, batch_put)
        probs, conf = fn(self.params, x)
        return (np.asarray(probs) > 0.5).astype(int), np.asarray(conf)

    # -- helpers ---------------------------------------------------------------

    @staticmethod
    def _validate_watermark_id(
        watermark: Union[WatermarkID, str, int, bytes]
    ) -> WatermarkID:
        """reference waveverify/core.py:703-729."""
        if isinstance(watermark, WatermarkID):
            return watermark
        return WatermarkID.custom(watermark)
