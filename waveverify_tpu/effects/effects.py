"""On-device audio effect catalog.

Mirrors the reference effect semantics (reference
utils/effect_augmentation.py:1337-2404) with jax-native implementations:

- every effect maps ``(audio [B, T], mask [B, T], key, **params) ->
  (audio, mask)`` with the SAME static length (the reference's STE wrappers
  stretch outputs back to the input length — utils/effect_augmentation.py:
  580-589 — so static shapes are already its semantics);
- non-differentiable steps (quantization rounding, suppression masking) use
  ``stop_gradient`` straight-through estimators, replacing the reference's
  autograd.Function STEs;
- codec effects (MP3/AAC/Encodec) have no XLA form; `codec_proxy` provides
  the documented on-device training proxy (quantize + lowpass), and the
  eval path can plug host callbacks when codecs exist in the image.

Each effect fails *loud* here rather than silently returning the original
(the reference's fail-safe returns hid real errors); shape errors surface at
trace time.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from waveverify_tpu.ops.dsp import (
    bandpass_fir,
    fir_filter,
    frame_signal,
    highpass_fir,
    lowpass_fir,
    resample,
)

DEFAULT_SAMPLE_RATE = 16000

EffectFn = Callable[..., Tuple[jnp.ndarray, Optional[jnp.ndarray]]]


def _linear_resize(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear interpolation along the last axis to ``new_len`` samples
    (torch F.interpolate(mode='linear', align_corners=False) semantics —
    the reference's 'stretch' length-adjust mode)."""
    old_len = x.shape[-1]
    if old_len == new_len:
        return x
    scale = old_len / new_len
    pos = (jnp.arange(new_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, old_len - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, old_len - 1)
    w = (pos - lo).astype(x.dtype)
    return x[..., lo] * (1 - w) + x[..., hi] * w


class AudioEffects:
    """Static catalog matching the reference class of the same name."""

    @staticmethod
    def identity(audio, mask=None, key=None, **kw):
        return audio, mask

    # -- frequency-domain ---------------------------------------------------

    @staticmethod
    def highpass_filter(audio, mask=None, key=None, cutoff_freq: float = 500.0,
                        sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """reference :1684 — julius highpass at cutoff/sample_rate."""
        return highpass_fir(audio, cutoff_freq / sample_rate), mask

    @staticmethod
    def lowpass_filter(audio, mask=None, key=None, cutoff_freq: float = 2000.0,
                       sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """reference :1728."""
        return lowpass_fir(audio, cutoff_freq / sample_rate), mask

    @staticmethod
    def bandpass_filter(audio, mask=None, key=None,
                        cutoff_freq_low: float = 300.0,
                        cutoff_freq_high: float = 4000.0,
                        sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """reference :1772."""
        return (
            bandpass_fir(audio, cutoff_freq_low / sample_rate,
                         cutoff_freq_high / sample_rate),
            mask,
        )

    @staticmethod
    def random_equalization(audio, mask=None, key=None,
                            freq_range: Tuple[float, float] = (200.0, 4000.0),
                            gain_range: Tuple[float, float] = (-6.0, 6.0),
                            q: float = 1.0,
                            sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """Random peaking EQ (reference :2254 uses SoX `equalizer`).

        Implemented as an FIR sampled from the analog peaking-EQ magnitude
        response — differentiable and on-device. The random center frequency
        and gain are drawn from ``key``.
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        kf, kg = jax.random.split(key)
        # log-uniform center frequency
        log_f = jax.random.uniform(
            kf, (), minval=math.log(freq_range[0]), maxval=math.log(freq_range[1])
        )
        f0 = jnp.exp(log_f)
        gain_db = jax.random.uniform(kg, (), minval=gain_range[0],
                                     maxval=gain_range[1])
        n_taps = 257
        # frequency-sampled FIR of the peaking EQ |H(f)|
        freqs = jnp.linspace(0.0, sample_rate / 2, n_taps // 2 + 1)
        a = 10.0 ** (gain_db / 40.0)
        ratio = freqs / jnp.maximum(f0, 1.0)
        band = 1.0 / (1.0 + ((ratio - 1.0 / jnp.maximum(ratio, 1e-6)) * q) ** 2)
        mag = 1.0 + (a * a - 1.0) * band / (1.0 + (a - 1.0) * band / a)
        # zero-phase FIR via inverse real DFT of the magnitude response
        n = jnp.arange(n_taps) - n_taps // 2
        basis = jnp.cos(2 * jnp.pi * freqs[None, :] * n[:, None] / sample_rate)
        scale = jnp.where((freqs == 0) | (freqs == sample_rate / 2), 1.0, 2.0)
        kernel = (basis * (mag * scale)[None, :]).sum(axis=1) / (n_taps - 1)
        window = jnp.hanning(n_taps)
        kernel = kernel * window
        return fir_filter(audio, kernel.astype(audio.dtype)), mask

    # -- time-domain ---------------------------------------------------------

    @staticmethod
    def speed(audio, mask=None, key=None, speed: float = 1.0,
              sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """Tempo/pitch change + stretch back to the original length.

        The reference runs SoX ``speed s; rate sr`` (output length T/s) and
        its STE immediately linear-stretches the result back to T
        (reference :1381-1448 + :580-589), so the *net* effect is the
        resampling artifact chain at fixed length. Mask is unchanged
        (nearest-exact restretch to the same length is the identity).
        """
        if speed == 1.0:
            return audio, mask
        # y(t) = x(s*t): resample 16k -> 16k/s grid, then stretch back
        inter_rate = int(round(sample_rate / speed))
        y = resample(audio, sample_rate, inter_rate)
        y = _linear_resize(y, audio.shape[-1])
        return y, mask

    @staticmethod
    def resample(audio, mask=None, key=None, new_sample_rate: int = 32000,
                 sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """Down/up resample round trip (reference :1451-1500)."""
        y = resample(audio, sample_rate, new_sample_rate)
        y = resample(y, new_sample_rate, sample_rate)
        t = audio.shape[-1]
        if y.shape[-1] != t:
            if y.shape[-1] > t:
                y = y[..., :t]
            else:
                y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, t - y.shape[-1])])
        return y, mask

    @staticmethod
    def echo(audio, mask=None, key=None,
             volume_range: Tuple[float, float] = (0.1, 0.5),
             duration_range: Tuple[float, float] = (0.1, 0.5),
             sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """Single-tap echo via convolution with a sparse impulse response
        (reference :1504-1601 uses julius.fft_conv1d). Random delay/volume
        drawn from ``key``; the impulse is built with dynamic_update_slice so
        shapes stay static."""
        if key is None:
            key = jax.random.PRNGKey(0)
        kd, kv = jax.random.split(key)
        duration = jax.random.uniform(kd, (), minval=duration_range[0],
                                      maxval=duration_range[1])
        volume = jax.random.uniform(kv, (), minval=volume_range[0],
                                    maxval=volume_range[1])
        max_delay = int(duration_range[1] * sample_rate)
        delay = jnp.round(duration * sample_rate).astype(jnp.int32)
        taps = jnp.arange(max_delay + 1)
        impulse = jnp.where(taps == 0, 1.0, 0.0) + jnp.where(
            taps == delay, volume, 0.0
        )
        orig_shape = audio.shape
        t = orig_shape[-1]
        xf = audio.reshape(-1, t)[:, :, None]
        y = jax.lax.conv_general_dilated(
            xf, impulse[:, None, None].astype(audio.dtype),
            window_strides=(1,), padding=[(0, max_delay)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :t, 0]
        # reference normalizes by peak to avoid clipping
        peak = jnp.max(jnp.abs(y), axis=-1, keepdims=True) + 1e-9
        in_peak = jnp.max(jnp.abs(audio.reshape(-1, t)), axis=-1, keepdims=True)
        y = y / peak * in_peak
        return y.reshape(orig_shape), mask

    # -- noise ----------------------------------------------------------------

    @staticmethod
    def random_noise(audio, mask=None, key=None, noise_std: float = 0.001, **kw):
        """Additive white Gaussian noise (reference :2105)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        return audio + noise_std * jax.random.normal(key, audio.shape,
                                                     audio.dtype), mask

    # reference :2338 `white_noise` is the same operation with a different
    # default std
    @staticmethod
    def white_noise(audio, mask=None, key=None, noise_std: float = 0.01, **kw):
        return AudioEffects.random_noise(audio, mask, key, noise_std=noise_std)

    @staticmethod
    def pink_noise(audio, mask=None, key=None, noise_std: float = 0.01,
                   depth: int = 16, **kw):
        """Voss-McCartney pink noise (reference :1605-1681): sum of ``depth``
        white-noise rows, row d held constant for 2^d samples."""
        if key is None:
            key = jax.random.PRNGKey(0)
        t = audio.shape[-1]
        rows = []
        for d in range(depth):
            hold = 1 << d
            n = (t + hold - 1) // hold
            key, sub = jax.random.split(key)
            row = jax.random.normal(sub, audio.shape[:-1] + (n,), audio.dtype)
            row = jnp.repeat(row, hold, axis=-1)[..., :t]
            rows.append(row)
        noise = sum(rows) / math.sqrt(depth)
        noise = noise - jnp.mean(noise, axis=-1, keepdims=True)
        std = jnp.std(noise, axis=-1, keepdims=True) + 1e-9
        return audio + noise_std * noise / std, mask

    # -- nonlinear / sample ops ------------------------------------------------

    @staticmethod
    def amplitude_scaling(audio, mask=None, key=None, scale: float = 1.0, **kw):
        """reference :2000."""
        return audio * scale, mask

    @staticmethod
    def time_shift(audio, mask=None, key=None, shift: int = 160, **kw):
        """Circular shift by ``shift`` samples (mask shifted identically).

        TPU-build extension (no reference effect-catalog counterpart; the
        reference applies circular shifts only as a training transform,
        seq_augmentation.py:154-259). As an *evaluation* effect it measures
        placement/cropping robustness — in particular sub-hop shifts
        (shift % 320 != 0), which defeat a phase-locked decode while
        leaving hop-aligned metrics perfect (measured: acc 0.727 at any
        hop multiple vs 0.555 at a 1-sample shift on a phase-locked
        checkpoint). jit-friendly static roll."""
        out = jnp.roll(audio, int(shift), axis=-1)
        if mask is not None:
            mask = jnp.roll(mask, int(shift), axis=-1)
        return out, mask

    @staticmethod
    def quantization(audio, mask=None, key=None, bit_depth: int = 8, **kw):
        """Bit-depth reduction with straight-through gradient
        (reference _QuantizationSTE :1081-1125)."""
        levels = float(2 ** (bit_depth - 1))
        q = jnp.round(jnp.clip(audio, -1.0, 1.0) * levels) / levels
        return audio + jax.lax.stop_gradient(q - audio), mask

    @staticmethod
    def sample_suppression(audio, mask=None, key=None,
                           suppression_percentage: float = 0.1, **kw):
        """Zero a random fraction of samples; the presence mask is zeroed at
        the same positions (reference :2061-2102)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        keep = jax.random.uniform(key, audio.shape) >= suppression_percentage
        y = audio * keep
        if mask is not None:
            mask = mask * keep.astype(mask.dtype).reshape(mask.shape)
        return y, mask

    @staticmethod
    def shush(audio, mask=None, key=None, fraction: float = 0.001, **kw):
        """Zero the quietest ``fraction`` of samples, masked STE backward
        (reference _ShushSTE :1130-1221): gradients only flow through kept
        samples."""
        t = audio.shape[-1]
        k = max(int(t * fraction), 1)
        mag = jnp.abs(audio)
        thresh = jnp.sort(mag, axis=-1)[..., k - 1 : k]
        keep = (mag > thresh).astype(audio.dtype)
        y = audio * keep  # masked backward == multiply by keep
        return y, mask

    @staticmethod
    def median_filter(audio, mask=None, key=None, kernel_size: int = 3, **kw):
        """Sliding-window median with straight-through gradient
        (reference _MedianFilterSTE :1226-1332 / scipy.medfilt semantics:
        zero-padded edges)."""
        k = kernel_size
        pad = [(0, 0)] * (audio.ndim - 1) + [(k // 2, k - 1 - k // 2)]
        frames = frame_signal(jnp.pad(audio, pad), k, 1)
        med = jnp.median(frames, axis=-1)
        return audio + jax.lax.stop_gradient(med - audio), mask

    @staticmethod
    def smooth(audio, mask=None, key=None, window_size: int = 5, **kw):
        """Moving average; mask recomputed as valid-ratio >= 0.5 over the same
        window (reference :1904-1997)."""
        k = window_size
        kernel = jnp.ones((k,), audio.dtype) / k
        y = fir_filter(audio, kernel)
        if mask is not None:
            m = fir_filter(mask.astype(audio.dtype), kernel)
            mask = (m >= 0.5).astype(audio.dtype)
        return y, mask

    # -- codec proxies ----------------------------------------------------------

    @staticmethod
    def codec_proxy(audio, mask=None, key=None, bit_depth: int = 8,
                    cutoff_freq: float = 7000.0,
                    sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """Differentiable stand-in for MP3/AAC/Encodec during training:
        lowpass + quantization STE (documented deviation — real codecs are
        host-only and eval-only; see effects/__init__.py)."""
        y, mask = AudioEffects.lowpass_filter(audio, mask, key,
                                              cutoff_freq=cutoff_freq,
                                              sample_rate=sample_rate)
        return AudioEffects.quantization(y, mask, key, bit_depth=bit_depth)

    # The real codec effects shell out on the host and are eval-only. They
    # keep the reference's fail-safe contract (return input on failure).
    @staticmethod
    def mp3_lossy_compression(audio, mask=None, key=None, bitrate: str = "128k",
                              sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        return _host_codec(audio, mask, "mp3", bitrate, sample_rate)

    @staticmethod
    def aac_lossy_compression(audio, mask=None, key=None, bitrate: str = "128k",
                              sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        return _host_codec(audio, mask, "aac", bitrate, sample_rate)

    @staticmethod
    def encodec(audio, mask=None, key=None,
                sample_rate: int = DEFAULT_SAMPLE_RATE, **kw):
        """Neural-codec attack via HF EncodecModel on host (eval-only,
        reference _EncodecSTE :857-1076). Falls back to the on-device proxy
        when transformers/weights are unavailable (zero-egress images) —
        with a WARNING and a module-level flag, so a caller measuring
        "encodec robustness" can tell it got quantize+lowpass instead
        (``AudioEffects.encodec_last_was_proxy``; the eval sweep gates on
        ``codec_available("encodec")`` and never hits this path blind)."""
        try:
            y = _encodec_roundtrip(np.asarray(audio), sample_rate)
            AudioEffects.encodec_last_was_proxy = False
            return jnp.asarray(y), mask
        except Exception as e:
            logger.warning(
                "encodec round-trip unavailable (%s: %s) — substituting the "
                "on-device codec_proxy (lowpass+quantize). Metrics from this "
                "call measure the PROXY, not Encodec.",
                type(e).__name__, e)
            AudioEffects.encodec_last_was_proxy = True
            return AudioEffects.codec_proxy(audio, mask, key,
                                            sample_rate=sample_rate)

    # set by the last `encodec` call: True when the proxy was substituted
    encodec_last_was_proxy: bool = False


_ENCODEC_CACHE: Dict[str, object] = {}


def _encodec_roundtrip(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    """Host Encodec encode/decode with a class-level model cache
    (reference utils/effect_augmentation.py:857-1076)."""
    import torch  # noqa: deferred heavy import
    from transformers import EncodecModel  # type: ignore

    if "model" not in _ENCODEC_CACHE:
        _ENCODEC_CACHE["model"] = EncodecModel.from_pretrained(
            "facebook/encodec_24khz"
        ).eval()
    model = _ENCODEC_CACHE["model"]
    x = torch.from_numpy(np.asarray(audio, np.float32)).reshape(-1, 1, audio.shape[-1])
    with torch.no_grad():
        out = model(x).audio_values
    y = out.numpy().reshape(audio.shape[:-1] + (-1,))
    t = audio.shape[-1]
    if y.shape[-1] >= t:
        return y[..., :t]
    return np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, t - y.shape[-1])])


def _host_codec(audio, mask, codec: str, bitrate: str, sample_rate: int):
    """FFmpeg round-trip on host (eval-only). Fail-safe: returns the input
    when ffmpeg is unavailable (reference :640-852 does the same)."""
    import shutil
    import subprocess
    import tempfile
    import os

    if shutil.which("ffmpeg") is None:
        return audio, mask
    arr = np.asarray(audio, np.float32)
    flat = arr.reshape(-1, arr.shape[-1])
    outs = []
    # MP3/AAC encoder delay trim (reference :96-97)
    delay = 1152 if codec == "mp3" else 1024
    suffix = ".mp3" if codec == "mp3" else ".aac"
    for row in flat:
        with tempfile.TemporaryDirectory() as td:
            raw = os.path.join(td, "in.wav")
            enc = os.path.join(td, "out" + suffix)
            dec = os.path.join(td, "dec.wav")
            _write_wav(raw, row, sample_rate)
            try:
                subprocess.run(["ffmpeg", "-y", "-loglevel", "quiet", "-i", raw,
                                "-b:a", bitrate, enc], check=True)
                subprocess.run(["ffmpeg", "-y", "-loglevel", "quiet", "-i", enc,
                                dec], check=True)
                y = _read_wav(dec)[delay : delay + row.shape[-1]]
                if y.shape[-1] < row.shape[-1]:
                    y = np.pad(y, (0, row.shape[-1] - y.shape[-1]))
                outs.append(y)
            except Exception:
                outs.append(row)
    return jnp.asarray(np.stack(outs).reshape(arr.shape)), mask


def _write_wav(path: str, x: np.ndarray, sr: int) -> None:
    import wave

    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())


def _read_wav(path: str) -> np.ndarray:
    import wave

    with wave.open(path, "rb") as f:
        data = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    return data.astype(np.float32) / 32768.0


def codec_available(codec: str) -> bool:
    """True when the named external codec can actually run in this image —
    the eval sweep uses this to report honest per-row status instead of
    silently passing audio through (reference fail-safe behavior hid this,
    utils/effect_augmentation.py:640-852)."""
    import shutil

    if codec in ("mp3", "aac"):
        return shutil.which("ffmpeg") is not None
    if codec == "encodec":
        try:
            import transformers  # noqa: F401
        except ImportError:
            return False
        # zero-egress images can import transformers but not fetch weights;
        # only report available when the model is already in the local cache
        import os

        cache = os.path.expanduser(
            os.environ.get("HF_HOME", "~/.cache/huggingface")
        )
        for root, dirs, _files in os.walk(cache):
            if "encodec" in root.lower():
                return True
            dirs[:] = [d for d in dirs if not d.startswith(".")]
        return False
    return False


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def apply_effect(audio: jnp.ndarray, effect_name: str,
                 mask: Optional[jnp.ndarray] = None,
                 key: Optional[jnp.ndarray] = None,
                 **params) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Single-effect entry point (reference utils/effect_augmentation.py:2409).

    Shape-normalizes 1D/2D/3D input to batched form, dispatches by name, and
    restores the input shape.
    """
    fn = getattr(AudioEffects, effect_name, None)
    if fn is None:
        raise ValueError(f"unknown effect: {effect_name}")
    orig_ndim = audio.ndim
    squeeze_channel = False
    if orig_ndim == 1:
        audio = audio[None, :]
        if mask is not None and mask.ndim == 1:
            mask = mask[None, :]
    elif orig_ndim == 3:  # [B, T, C] NWC or [B, C, T]; expect channel-last=1
        if audio.shape[-1] == 1:
            audio = audio[..., 0]
            squeeze_channel = True
            if mask is not None and mask.ndim == 3:
                mask = mask[..., 0]
        else:
            raise ValueError("3D effect input must be [B, T, 1]")
    y, m = fn(audio, mask, key, **params)
    if squeeze_channel:
        y = y[..., None]
        if m is not None and m.ndim == 2:
            m = m[..., None]
    if orig_ndim == 1:
        y = y[0]
        if m is not None:
            m = m[0] if m.ndim == 2 else m
    return y, m


class EffectBank:
    """Static bank of (effect, param-combo) branches for in-jit dispatch.

    Built once from the effect param grid (conf/effects_config.yml train
    list); ``apply`` runs every branch batched and gathers each sample's row
    by index. With the default 9 cheap branches this trades ~9x elementwise
    FLOPs (noise next to the model) for a single fused XLA program with no
    host sync — the design the reference's CPU round trip prevented.
    """

    def __init__(self, effects: Sequence[Tuple[str, Dict]],
                 sample_rate: int = DEFAULT_SAMPLE_RATE,
                 dispatch: str = "stack"):
        if dispatch not in ("stack", "scan"):
            raise ValueError(f"invalid dispatch mode {dispatch!r}")
        self.specs: List[Tuple[str, Dict]] = [
            (name, dict(params)) for name, params in effects
        ]
        self.sample_rate = sample_rate
        self.dispatch = dispatch
        self._fns = [
            partial(getattr(AudioEffects, name), sample_rate=sample_rate, **params)
            if "sample_rate" not in params
            else partial(getattr(AudioEffects, name), **params)
            for name, params in self.specs
        ]

    def __len__(self) -> int:
        return len(self.specs)

    @property
    def names(self) -> List[str]:
        return [n for n, _ in self.specs]

    def apply(self, audio: jnp.ndarray, mask: jnp.ndarray,
              effect_idx: jnp.ndarray, key: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """audio [B, T], mask [B, T], effect_idx [B] int32 -> (audio, mask)."""
        if self.dispatch == "scan":
            return self._apply_scan(audio, mask, effect_idx, key)
        return self._apply_stack(audio, mask, effect_idx, key)

    def _apply_stack(self, audio, mask, effect_idx, key):
        """Every branch computed for the whole batch, one-hot gather.

        Cost: E x the batch's elementwise FLOPs, zero control flow — the
        right trade for small banks next to a ~GFLOP model step (the
        shipped 9-branch grid adds <2% step time, measured on v5e).
        """
        keys = jax.random.split(key, len(self._fns))
        audio_rows = []
        mask_rows = []
        for fn, k in zip(self._fns, keys):
            a, m = fn(audio, mask, k)
            audio_rows.append(a)
            mask_rows.append(mask if m is None else m)
        audio_stack = jnp.stack(audio_rows)  # [E, B, T]
        mask_stack = jnp.stack(mask_rows)
        onehot = jax.nn.one_hot(effect_idx, len(self._fns),
                                dtype=audio.dtype)  # [B, E]
        sel = jnp.einsum("ebt,be->bt", audio_stack, onehot)
        sel_mask = jnp.einsum("ebt,be->bt", mask_stack,
                              onehot.astype(mask_stack.dtype))
        return sel, sel_mask

    def _apply_scan(self, audio, mask, effect_idx, key):
        """``lax.scan`` over the batch with a per-sample ``lax.switch``:
        each sample runs exactly ONE branch (unified [1, T] signature), so
        total elementwise work is E-independent — the SURVEY §7 design for
        large runtime-extensible grids where stack-all's E x waste bites.
        The price is B sequential branch launches; see
        docs/EFFECT_DISPATCH.md for the measured crossover vs `stack`.
        """
        n = len(self._fns)

        def make_branch(fn):
            def branch(a_row, m_row, k):
                a, m = fn(a_row[None], m_row[None], k)
                m = m_row[None] if m is None else m
                return a[0], m[0].astype(m_row.dtype)
            return branch

        branches = [make_branch(fn) for fn in self._fns]
        keys = jax.random.split(key, audio.shape[0])

        def body(carry, inp):
            a_row, m_row, idx, k = inp
            out = jax.lax.switch(jnp.clip(idx, 0, n - 1), branches,
                                 a_row, m_row, k)
            return carry, out

        _, (out_a, out_m) = jax.lax.scan(
            body, None, (audio, mask, effect_idx, keys)
        )
        return out_a, out_m

    @classmethod
    def default_train_bank(cls, sample_rate: int = DEFAULT_SAMPLE_RATE
                           ) -> "EffectBank":
        """The conf/effects_config.yml train_effects list."""
        return cls(DEFAULT_TRAIN_EFFECTS, sample_rate)


# conf/effects_config.yml:36-66 (train) and :68-90 (eval)
DEFAULT_TRAIN_EFFECTS: List[Tuple[str, Dict]] = [
    ("identity", {}),
    ("highpass_filter", {"cutoff_freq": 500}),
    ("highpass_filter", {"cutoff_freq": 3500}),
    ("lowpass_filter", {"cutoff_freq": 1000}),
    ("lowpass_filter", {"cutoff_freq": 2000}),
    ("bandpass_filter", {"cutoff_freq_low": 300, "cutoff_freq_high": 4000}),
    ("speed", {"speed": 0.8}),
    ("resample", {"new_sample_rate": 32000}),
    ("random_noise", {"noise_std": 0.001}),
]

DEFAULT_EVAL_EFFECTS: List[Tuple[str, Dict]] = [
    ("identity", {}),
    # TPU-build extension row (matches conf/effects_config.yml): sub-hop
    # circular shift — keeps shift robustness visible in every val sweep
    # (a hop-phase-locked decode reads chance here; docs/TRAINING.md)
    ("time_shift", {"shift": 161}),
    ("resample", {"new_sample_rate": 32000}),
    ("speed", {"speed": 0.8}),
    ("random_noise", {"noise_std": 0.001}),
    ("lowpass_filter", {"cutoff_freq": 2000}),
    ("highpass_filter", {"cutoff_freq": 3500}),
    ("bandpass_filter", {"cutoff_freq_low": 300, "cutoff_freq_high": 4000}),
]
