"""Audio file I/O + message/tensor conversion for the public API.

Reference waveverify/utils.py:170-412, rebuilt without torchaudio: WAV read
/write via stdlib ``wave`` (16-bit PCM out, like the reference's default),
mono mixdown, host polyphase resample to 16 kHz. Message conversions keep
the reference's exact semantics (3-D logits -> time mean -> threshold 0.5).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Tuple, Union

import numpy as np

from waveverify_tpu.train.data import resample_poly

logger = logging.getLogger(__name__)

TARGET_SAMPLE_RATE = 16000


DEFAULT_CHECKPOINT_URL = ""  # reference waveverify/utils.py:45-52: placeholder


def download_checkpoint(url: str = DEFAULT_CHECKPOINT_URL,
                        dest_dir: Union[str, Path] = "~/.cache/waveverify_tpu"
                        ) -> Path:
    """Fetch + extract a checkpoint archive (reference waveverify/utils.py:
    45-167). The reference ships an empty placeholder URL, and this image
    has no egress; the function exists for API parity and raises a clear
    error when no URL is configured."""
    if not url:
        raise ValueError(
            "no checkpoint URL configured (the reference ships an empty "
            "placeholder too — reference waveverify/utils.py:45-52); pass "
            "checkpoint_path= to WaveVerify instead"
        )
    import tarfile
    import urllib.request

    dest = Path(dest_dir).expanduser()
    dest.mkdir(parents=True, exist_ok=True)
    archive = dest / Path(url).name
    if not archive.exists():
        urllib.request.urlretrieve(url, archive)
    if archive.suffixes[-2:] == [".tar", ".gz"] or archive.suffix == ".tgz":
        with tarfile.open(archive) as tf:
            tf.extractall(dest)
    return dest


def load_audio(path: Union[str, Path],
               target_sample_rate: int = TARGET_SAMPLE_RATE
               ) -> Tuple[np.ndarray, int]:
    """Load audio as mono float32 at 16 kHz
    (reference waveverify/utils.py:170-224). Returns (audio [T], sr)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"audio file not found: {path}")
    # dispatch on CONTENT, not extension (api/codecs.py): WAV + FLAC decode
    # natively; the reference repo's own `.ogg` demo clips are RIFF data and
    # load through the WAV fast path.
    from waveverify_tpu.api.codecs import decode_auto

    audio, sr = decode_auto(path)
    if sr != target_sample_rate:
        audio = resample_poly(audio, sr, target_sample_rate)
        sr = target_sample_rate
    return audio.astype(np.float32), sr


def save_audio(audio: np.ndarray, path: Union[str, Path],
               sample_rate: int = TARGET_SAMPLE_RATE) -> None:
    """Write mono 16-bit PCM WAV, clamped to [-1, 1]
    (reference waveverify/utils.py:227-287)."""
    import wave

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    x = np.clip(np.asarray(audio, np.float32).ravel(), -1.0, 1.0)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes((x * 32767.0).astype(np.int16).tobytes())


def message_to_tensor(bits: str) -> np.ndarray:
    """'0101...' (16 chars) -> float32 [1, 16]
    (reference waveverify/utils.py:290-353)."""
    if not isinstance(bits, str) or len(bits) != 16 or set(bits) - {"0", "1"}:
        raise ValueError(f"message must be a 16-char bit string, got {bits!r}")
    return np.array([[float(b) for b in bits]], np.float32)


def tensor_to_message(logits_or_probs: np.ndarray,
                      threshold: float = 0.5) -> str:
    """Detector output -> 16-char bit string
    (reference waveverify/utils.py:356-412): 3-D input is time-averaged
    first; values are probabilities (sigmoid already applied by the caller,
    matching the reference API path)."""
    x = np.asarray(logits_or_probs)
    if x.ndim == 3:  # [B, T, W] (NWC) -> time mean
        x = x.mean(axis=1)
    if x.ndim == 2:
        x = x[0]
    bits = (x > threshold).astype(int)
    return "".join(str(int(b)) for b in bits)
