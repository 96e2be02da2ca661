"""Round-trip tests for the native audio ingest (api/codecs.py).

The image has no FLAC encoder, so these tests carry a minimal in-repo
encoder (bit-exact integer math mirroring the spec) and verify the decoder
reconstructs the original PCM exactly — covering constant / verbatim /
fixed / LPC subframes, rice + escape residual partitions, mono and all
stereo decorrelation modes, plus content sniffing (the reference repo's
`.ogg` demo clips are RIFF data — reference examples/audios/*.ogg).
"""

import wave
from pathlib import Path

import numpy as np
import pytest

from waveverify_tpu.api.codecs import decode_auto, decode_flac, sniff_format

REFERENCE_AUDIO = Path("/root/reference/examples/audios")


# ---------------------------------------------------------------------------
# minimal FLAC encoder (test oracle)
# ---------------------------------------------------------------------------


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int):
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _rice_encode(w: BitWriter, residual, plen: int):
    """Single partition, fixed param (or escape when param would be huge)."""
    mean_abs = float(np.mean(np.abs(residual))) if len(residual) else 0.0
    param = max(0, int(np.ceil(np.log2(mean_abs + 1))) + 1)
    escape = (1 << plen) - 1
    w.write(0 if plen == 4 else 1, 2)  # coding method
    w.write(0, 4)  # partition order 0
    if param >= escape:
        w.write(escape, plen)
        raw = max(2, int(np.max(np.abs(residual))).bit_length() + 1)
        w.write(raw, 5)
        for r in residual:
            w.write_signed(int(r), raw)
        return
    w.write(param, plen)
    for r in residual:
        r = int(r)
        u = (abs(r) << 1) - 1 if r < 0 else r << 1  # zigzag
        q, rem = u >> param, u & ((1 << param) - 1)
        w.write_unary(q)
        if param:
            w.write(rem, param)


def _write_subframe(w: BitWriter, x, bps: int, mode: str):
    w.write(0, 1)  # padding
    if mode == "constant":
        assert np.all(x == x[0])
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(x[0]), bps)
    elif mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in x[:order]:
            w.write_signed(int(v), bps)
        coeffs = {0: [], 1: [1], 2: [2, -1]}[order]
        res = [int(x[i]) - sum(c * int(x[i - 1 - j])
                               for j, c in enumerate(coeffs))
               for i in range(order, len(x))]
        _rice_encode(w, np.array(res, np.int64), 4)
    elif mode == "lpc":
        order, precision, shift = 2, 12, 9
        coeffs = [900, -420]  # arbitrary; decoder must invert exactly
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for v in x[:order]:
            w.write_signed(int(v), bps)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coeffs:
            w.write_signed(c, precision)
        res = [int(x[i]) - ((coeffs[0] * int(x[i - 1])
                             + coeffs[1] * int(x[i - 2])) >> shift)
               for i in range(order, len(x))]
        _rice_encode(w, np.array(res, np.int64), 5)
    else:
        raise AssertionError(mode)


def encode_flac(path, channels, sample_rate=16000, bps=16, blocksize=1024,
                modes=("verbatim",), chan_mode="independent"):
    """channels: list of int arrays (same length). modes cycles per frame."""
    n = len(channels[0])
    n_ch = len(channels)
    out = bytearray(b"fLaC")
    # STREAMINFO (last block)
    si = BitWriter()
    si.write(blocksize, 16); si.write(blocksize, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    for start in range(0, n, blocksize):
        bs = min(blocksize, n - start)
        mode = modes[frame_idx % len(modes)]
        w = BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)   # 16-bit blocksize-1 field
        w.write(5, 4)   # 16 kHz from table
        chan_code = {"independent": n_ch - 1, "left_side": 8,
                     "right_side": 9, "mid_side": 10}[chan_mode]
        w.write(chan_code, 4)
        w.write(4, 3)   # 16 bps
        w.write(0, 1)
        assert frame_idx < 128
        w.write(frame_idx, 8)  # utf8 single byte
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        hdr += bytes([crc8(hdr)])

        body_w = BitWriter()
        segs = [np.asarray(c[start:start + bs], np.int64) for c in channels]
        if chan_mode == "independent":
            for seg in segs:
                _write_subframe(body_w, seg, bps, mode)
        elif chan_mode == "left_side":
            left, right = segs
            _write_subframe(body_w, left, bps, mode)
            _write_subframe(body_w, left - right, bps + 1, mode)
        elif chan_mode == "right_side":
            left, right = segs
            _write_subframe(body_w, left - right, bps + 1, mode)
            _write_subframe(body_w, right, bps, mode)
        elif chan_mode == "mid_side":
            left, right = segs
            side = left - right
            mid = (left + right) >> 1
            _write_subframe(body_w, mid, bps, mode)
            _write_subframe(body_w, side, bps + 1, mode)
        body_w.align()
        frame = hdr + body_w.bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        frame_idx += 1
    Path(path).write_bytes(bytes(out))


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _pcm(n, seed=0, amp=12000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 16000.0
    x = amp * np.sin(2 * np.pi * 440 * t) + rng.randint(-500, 500, n)
    return np.clip(x, -32768, 32767).astype(np.int64)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed0", "fixed1",
                                  "fixed2", "lpc"])
def test_flac_subframe_modes_roundtrip(tmp_path, mode):
    n = 3000  # 3 frames at blocksize 1024 (last partial)
    x = (np.full(n, 777, np.int64) if mode == "constant" else _pcm(n))
    p = tmp_path / f"{mode}.flac"
    encode_flac(p, [x], modes=(mode,))
    audio, sr = decode_flac(p)
    assert sr == 16000
    assert audio.shape == (n,)
    np.testing.assert_allclose(audio, x / 32768.0, atol=1e-7)


@pytest.mark.parametrize("chan_mode", ["independent", "left_side",
                                       "right_side", "mid_side"])
def test_flac_stereo_decorrelation(tmp_path, chan_mode):
    n = 2048
    left, right = _pcm(n, 1), _pcm(n, 2)
    p = tmp_path / f"{chan_mode}.flac"
    encode_flac(p, [left, right], modes=("verbatim", "fixed2"),
                chan_mode=chan_mode)
    audio, sr = decode_flac(p)
    expected = (left + right) / 2.0 / 32768.0  # mono mixdown
    np.testing.assert_allclose(audio, expected, atol=1e-7)


def test_flac_mixed_modes_roundtrip(tmp_path):
    n = 5000
    x = _pcm(n, 3)
    p = tmp_path / "mixed.flac"
    encode_flac(p, [x], modes=("verbatim", "fixed1", "lpc", "fixed2"))
    audio, _ = decode_flac(p)
    np.testing.assert_allclose(audio, x / 32768.0, atol=1e-7)


def test_sniff_format(tmp_path):
    w = tmp_path / "x.wav"
    with wave.open(str(w), "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes(b"\x00\x00" * 100)
    assert sniff_format(w) == "wav"
    f2 = tmp_path / "y.flac"
    encode_flac(f2, [_pcm(1024)])
    assert sniff_format(f2) == "flac"
    (tmp_path / "z.ogg").write_bytes(b"OggS" + b"\x00" * 32)
    assert sniff_format(tmp_path / "z.ogg") == "ogg"


def test_misnamed_ogg_wav_loads(tmp_path):
    """RIFF data behind a .ogg suffix must load (the reference's own demo
    clips are exactly this — /root/reference/examples/audios/*.ogg)."""
    p = tmp_path / "actually_wav.ogg"
    x = (_pcm(1600) / 32768.0).astype(np.float32)
    with wave.open(str(p), "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes((x * 32767).astype(np.int16).tobytes())
    audio, sr = decode_auto(p)
    assert sr == 16000 and audio.shape == (1600,)

    from waveverify_tpu.api.audio_io import load_audio

    audio2, sr2 = load_audio(p)
    assert sr2 == 16000
    np.testing.assert_allclose(audio2, audio, atol=1e-6)


@pytest.mark.skipif(not REFERENCE_AUDIO.exists(),
                    reason="reference checkout not present")
def test_reference_example_audio_loads():
    from waveverify_tpu.api.audio_io import load_audio

    for f in sorted(REFERENCE_AUDIO.glob("*.ogg")):
        audio, sr = load_audio(f)
        assert sr == 16000
        assert audio.size > 16000  # at least a second of real audio
        assert float(np.abs(audio).max()) <= 1.0


def test_flac_in_training_folder_dataset(tmp_path):
    from waveverify_tpu.train.data import AudioFolderDataset

    x = _pcm(20000, 5)
    encode_flac(tmp_path / "clip.flac", [x], modes=("fixed2",))
    ds = AudioFolderDataset([str(tmp_path)], duration=0.5, use_native=False)
    batch = ds.batch(2)
    assert batch.shape == (2, 8000)
    assert np.abs(batch).max() > 0.01
