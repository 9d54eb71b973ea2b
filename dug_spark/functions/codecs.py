"""Pure-stdlib media codecs: PNG and WAV, written from the public specs.

The container has no PIL/torchaudio/pyav, but the PNG format (RFC 2083 /
W3C PNG spec) needs only ``zlib`` + ``struct``, and WAV PCM needs only the
stdlib ``wave`` module — so image and audio decode can be REAL here, and
only video remains a stub in operators/multimodal.py.

Supported PNG subset: 8-bit depth, color types 0 (grayscale), 2 (RGB),
6 (RGBA), non-interlaced — all five scanline filters (None/Sub/Up/
Average/Paeth) implemented per spec.  The encoder writes filter-0 rows.
WAV: 16-bit PCM mono/stereo.

Everything is deterministic pure Python over bytes, so codec outputs are
bit-reproducible across executors and recomputable by driver-side
oracles.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


# ---------------------------------------------------------------------------
# PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, list[bytearray]]:
    """→ (width, height, channels, rows) with rows[y] a bytearray of
    width*channels unfiltered samples."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    pos, idat = len(_PNG_SIG), b""
    width = height = channels = None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(f"unsupported PNG depth/color ({depth}/{color})")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        rows.append(line)
        prev = line
    return width, height, channels, rows


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, channels: int, rows: list[bytes]) -> bytes:
    """Minimal encoder: filter-0 scanlines, one IDAT."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, rows: list[bytearray], new_w: int, new_h: int
) -> list[bytearray]:
    """Nearest-neighbour resample (deterministic integer mapping)."""
    out = []
    for y in range(new_h):
        sy = y * height // new_h
        src = rows[sy]
        line = bytearray(new_w * channels)
        for x in range(new_w):
            sx = x * width // new_w
            line[x * channels : (x + 1) * channels] = src[
                sx * channels : (sx + 1) * channels
            ]
        out.append(line)
    return out


def png_features(payload: bytes, dims: int = 16) -> list[float]:
    """Fixed-width image descriptor: dimensions + per-channel mean/std
    (÷255), zero-padded to ``dims``."""
    width, height, channels, rows = decode_png(payload)
    feats = [float(width), float(height), float(channels)]
    n = width * height
    for c in range(4):
        if c < channels:
            vals = [row[i] for row in rows for i in range(c, len(row), channels)]
            mean = sum(vals) / n
            var = sum((v - mean) ** 2 for v in vals) / n
            feats += [mean / 255.0, var**0.5 / 255.0]
        else:
            feats += [0.0, 0.0]
    return (feats + [0.0] * dims)[:dims]


# ---------------------------------------------------------------------------
# WAV (16-bit PCM via the stdlib wave module)


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """→ (sample_rate, n_channels, samples) — interleaved 16-bit values."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate, nch, n = w.getframerate(), w.getnchannels(), w.getnframes()
        frames = w.readframes(n)
    samples = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    return rate, nch, samples


def encode_wav(rate: int, nch: int, samples: list[int]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_features(payload: bytes, dims: int = 16) -> list[float]:
    """Fixed-width audio descriptor: rate, channels, length, mean, rms,
    zero-crossing rate, min, max (scaled), zero-padded to ``dims``."""
    rate, nch, samples = decode_wav(payload)
    n = max(len(samples), 1)
    mean = sum(samples) / n
    rms = (sum(s * s for s in samples) / n) ** 0.5
    zc = sum(
        1 for i in range(1, len(samples)) if (samples[i - 1] < 0) != (samples[i] < 0)
    )
    feats = [
        float(rate) / 48000.0,
        float(nch),
        float(len(samples)) / 1e6,
        mean / 32768.0,
        rms / 32768.0,
        zc / n,
        min(samples, default=0) / 32768.0,
        max(samples, default=0) / 32768.0,
    ]
    return (feats + [0.0] * dims)[:dims]
