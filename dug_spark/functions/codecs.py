"""Pure-stdlib media codecs: PNG and WAV, written from the public specs.

The container has no PIL/torchaudio/pyav, but the PNG format (RFC 2083 /
W3C PNG spec) needs only ``zlib`` + ``struct``, WAV PCM needs only the
stdlib ``wave`` module, and YUV4MPEG2 (Y4M) is a bytes-sliceable
uncompressed video container — so image, audio AND video decode are all
REAL here; only compressed video (mp4/webm) stays honestly unsupported.

Supported PNG subset: 8-bit depth, color types 0 (grayscale), 2 (RGB),
6 (RGBA), non-interlaced — all five scanline filters (None/Sub/Up/
Average/Paeth) implemented per spec.  The encoder writes filter-0 rows.
WAV: 16-bit PCM mono/stereo.

Everything is deterministic over bytes, so codec outputs are
bit-reproducible across executors and recomputable by driver-side
oracles.

Two execution paths, bit-identical by construction (round 4):

- ``use_numpy=True`` (default when numpy imports — the EXECUTOR path):
  defilter and statistics vectorized with numpy.  At 100 TB of media the
  per-pixel interpreted-Python loops are the bottleneck; numpy is
  available in executor Python (the LSH signature matmul already relies
  on it).
- ``use_numpy=False`` (the ORACLE path): the original pure-Python loops,
  kept as the independent driver-side recompute.

Bit-identity is guaranteed, not hoped for: every statistic is computed
from EXACT integer moments (Σv and Σv² over uint8/int16 samples — exact
in int64 on both paths), and the float ops applied to those moments
(mean = S1/n, var = S2/n − mean², rms = √(S2/n)) are the same IEEE
doubles in the same order on both paths.  The defilter itself is
mod-256 integer arithmetic — exact everywhere.  Filters Average/Paeth
carry a sequential cross-pixel dependency (recon[x] needs recon[x−1]) so
both paths share the per-byte loop for those rows; None/Sub/Up — the
filters our encoder and most minimal encoders emit — vectorize fully
(Sub is a lane-wise uint8 cumulative sum, Up a wrapping row add).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

try:  # executor fast path; pure-Python oracle path works without it
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into this env
    _np = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _resolve_numpy(use_numpy: bool | None) -> bool:
    if use_numpy is None:
        return _np is not None
    if use_numpy and _np is None:
        raise RuntimeError("numpy requested but not importable")
    return use_numpy


# ---------------------------------------------------------------------------
# PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _defilter_row_py(
    ftype: int, line: bytearray, prev, channels: int, stride: int
) -> bytearray:
    """Per-spec scanline reconstruction, pure-Python per byte (shared by
    both paths for the sequentially-dependent Average/Paeth filters)."""
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
    return line


def decode_png(
    payload: bytes, use_numpy: bool | None = None
) -> tuple[int, int, int, list[bytearray]]:
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
    if _resolve_numpy(use_numpy):
        return width, height, channels, _defilter_np(
            raw, width, height, channels, stride
        )
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        line = _defilter_row_py(
            raw[off], bytearray(raw[off + 1 : off + 1 + stride]), prev,
            channels, stride,
        )
        rows.append(line)
        prev = line
    return width, height, channels, rows


def _defilter_np(
    raw: bytes, width: int, height: int, channels: int, stride: int
) -> list[bytearray]:
    """Vectorized reconstruction (mod-256 integer arithmetic — exact):
    Sub is a lane-wise uint8 cumulative sum over the x axis (uint8
    accumulate wraps mod 256 by construction), Up a wrapping row add.
    Average/Paeth rows carry a strict recon[x-1] dependency and fall back
    to the shared per-byte loop — our encoder (and most minimal encoders)
    emit None/Sub/Up only."""
    arr = _np.frombuffer(raw, dtype=_np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    out = _np.empty((height, stride), dtype=_np.uint8)
    prev = _np.zeros(stride, dtype=_np.uint8)
    for y in range(height):
        f = int(ftypes[y])
        line = arr[y, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # Sub: cumulative sum per channel lane, wrapping
            rec = _np.add.accumulate(
                line.reshape(width, channels), axis=0, dtype=_np.uint8
            ).reshape(stride)
        elif f == 2:  # Up: wrapping vector add
            rec = line + prev  # uint8 + uint8 wraps mod 256
        elif f in (3, 4):
            # hand prev to the shared loop as a bytearray, NOT the numpy
            # row: under NumPy 2.x weak-scalar promotion (NEP 50),
            # `int + np.uint8` stays uint8 and `(left + prev[i]) >> 1` /
            # Paeth's `a + b - c` would silently wrap mod 256
            rec = _np.frombuffer(
                bytes(
                    _defilter_row_py(
                        f, bytearray(line.tobytes()),
                        bytearray(prev.tobytes()), channels, stride,
                    )
                ),
                dtype=_np.uint8,
            )
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prev = out[y]
    return [bytearray(out[y].tobytes()) for y in range(height)]


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
    width: int,
    height: int,
    channels: int,
    rows: list[bytearray],
    new_w: int,
    new_h: int,
    use_numpy: bool | None = None,
) -> list[bytearray]:
    """Nearest-neighbour resample (deterministic integer mapping —
    sx = x·width//new_w — so the numpy fancy-index path is byte-identical
    to the loop path)."""
    if _resolve_numpy(use_numpy):
        arr = _np.frombuffer(b"".join(bytes(r) for r in rows), dtype=_np.uint8)
        arr = arr.reshape(height, width, channels)
        sy = (_np.arange(new_h) * height) // new_h
        sx = (_np.arange(new_w) * width) // new_w
        res = arr[sy][:, sx]
        return [bytearray(res[y].tobytes()) for y in range(new_h)]
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


def png_features(
    payload: bytes, dims: int = 16, use_numpy: bool | None = None
) -> list[float]:
    """Fixed-width image descriptor: dimensions + per-channel mean/std
    (÷255), zero-padded to ``dims``.

    Stats derive from EXACT integer moments (S1=Σv, S2=Σv² — exact in
    int64 either way), then identical IEEE float ops on both paths:
    mean = S1/n, var = S2/n − mean² (clamped at 0), std = √var — so the
    numpy executor path and the pure-Python oracle path are bit-equal."""
    un = _resolve_numpy(use_numpy)
    width, height, channels, rows = decode_png(payload, use_numpy=un)
    feats = [float(width), float(height), float(channels)]
    n = width * height
    if un:
        arr = _np.frombuffer(b"".join(bytes(r) for r in rows), dtype=_np.uint8)
        arr = arr.reshape(height * width, channels)
    for c in range(4):
        if c < channels:
            if un:
                lane = arr[:, c].astype(_np.int64)
                s1 = int(lane.sum())
                s2 = int((lane * lane).sum())
            else:
                s1 = s2 = 0
                for row in rows:
                    for i in range(c, len(row), channels):
                        v = row[i]
                        s1 += v
                        s2 += v * v
            mean = s1 / n
            var = max(s2 / n - mean * mean, 0.0)
            feats += [mean / 255.0, var**0.5 / 255.0]
        else:
            feats += [0.0, 0.0]
    return (feats + [0.0] * dims)[:dims]


# ---------------------------------------------------------------------------
# WAV (16-bit PCM via the stdlib wave module)


def _read_wav_frames(payload: bytes) -> tuple[int, int, bytes]:
    """→ (sample_rate, n_channels, raw interleaved 16-bit LE frames)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        return w.getframerate(), w.getnchannels(), w.readframes(w.getnframes())


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """→ (sample_rate, n_channels, samples) — interleaved 16-bit values."""
    rate, nch, frames = _read_wav_frames(payload)
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


def wav_features(
    payload: bytes, dims: int = 16, use_numpy: bool | None = None
) -> list[float]:
    """Fixed-width audio descriptor: rate, channels, length, mean, rms,
    zero-crossing rate, min, max (scaled), zero-padded to ``dims``.

    Same exact-integer-moment contract as png_features: S1/S2/zc/min/max
    are exact integers on both paths, the float ops identical — numpy
    executor path ≡ pure-Python oracle path bit-for-bit."""
    un = _resolve_numpy(use_numpy)
    if un:
        rate, nch, frames = _read_wav_frames(payload)
        arr = _np.frombuffer(frames, dtype="<i2")
        n_samples = len(arr)
        n = max(n_samples, 1)
    else:
        rate, nch, samples = decode_wav(payload)
        n_samples = len(samples)
        n = max(n_samples, 1)
    if un and n_samples:
        a64 = arr.astype(_np.int64)
        s1 = int(a64.sum())
        s2 = int((a64 * a64).sum())
        neg = arr < 0
        zc = int((neg[:-1] != neg[1:]).sum())
        mn, mx = int(arr.min()), int(arr.max())
    elif un:
        s1 = s2 = zc = mn = mx = 0
    else:
        s1 = sum(samples)
        s2 = sum(s * s for s in samples)
        zc = sum(
            1
            for i in range(1, len(samples))
            if (samples[i - 1] < 0) != (samples[i] < 0)
        )
        mn = min(samples, default=0)
        mx = max(samples, default=0)
    feats = [
        float(rate) / 48000.0,
        float(nch),
        float(n_samples) / 1e6,
        s1 / n / 32768.0,
        (s2 / n) ** 0.5 / 32768.0,
        zc / n,
        mn / 32768.0,
        mx / 32768.0,
    ]
    return (feats + [0.0] * dims)[:dims]


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2 — uncompressed planar video; public spec shipped with
# mjpegtools' yuv4mpeg(5) man page).  The container is a one-line ASCII
# header (`YUV4MPEG2 W<w> H<h> F<num>:<den> [C<cs>] ...\n`) followed by
# frames, each `FRAME[ params]\n` + raw planar YUV — parseable with
# nothing but bytes.split and struct-free slicing, so VIDEO decode can be
# real here too.  Compressed containers (mp4/webm) genuinely need
# external codecs and stay honestly unsupported in multimodal.py.

_Y4M_MAGIC = b"YUV4MPEG2"
# colorspace tag → (x_div, y_div) chroma subsampling; None = no chroma
_Y4M_SUBSAMPLE: dict[str, tuple[int, int] | None] = {
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def _y4m_plane_sizes(width: int, height: int, cs: str) -> tuple[int, int]:
    sub = _Y4M_SUBSAMPLE[cs]
    ysize = width * height
    if sub is None:
        return ysize, 0
    xd, yd = sub
    if width % xd or height % yd:
        raise ValueError(f"Y4M C{cs} requires dims divisible by {xd}x{yd}")
    return ysize, (width // xd) * (height // yd)


def decode_y4m(
    payload: bytes,
) -> tuple[int, int, int, int, str, list[tuple[bytes, bytes | None, bytes | None]]]:
    """→ (width, height, fps_num, fps_den, colorspace, frames); each
    frame is (y_plane, u_plane, v_plane) raw bytes (u/v None for Cmono).
    Pure byte slicing — no float, no platform dependence."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M (no header newline)")
    width = height = None
    fps_num, fps_den, cs = 25, 1, "420jpeg"  # spec defaults
    for tok in payload[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C":
            if val not in _Y4M_SUBSAMPLE:
                raise ValueError(f"unsupported Y4M colorspace C{val}")
            cs = val
        # I (interlace), A (aspect), X (extension) carry no pixel layout
    if not width or not height or fps_num <= 0 or fps_den <= 0:
        raise ValueError("Y4M header missing/invalid W, H, or F")
    ysize, csize = _y4m_plane_sizes(width, height, cs)
    frames: list[tuple[bytes, bytes | None, bytes | None]] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M FRAME marker")
        pos = fnl + 1
        end = pos + ysize + 2 * csize
        if end > len(payload):
            raise ValueError("truncated Y4M frame data")
        y = payload[pos : pos + ysize]
        if csize:
            u = payload[pos + ysize : pos + ysize + csize]
            v = payload[pos + ysize + csize : end]
        else:
            u = v = None
        frames.append((y, u, v))
        pos = end
    return width, height, fps_num, fps_den, cs, frames


def encode_y4m(
    width: int,
    height: int,
    fps_num: int,
    fps_den: int,
    frames: list[tuple[bytes, bytes | None, bytes | None]],
    colorspace: str = "420jpeg",
) -> bytes:
    ysize, csize = _y4m_plane_sizes(width, height, colorspace)
    out = [
        f"YUV4MPEG2 W{width} H{height} F{fps_num}:{fps_den} Ip A1:1 "
        f"C{colorspace}\n".encode("ascii")
    ]
    for y, u, v in frames:
        if len(y) != ysize or (csize and (len(u) != csize or len(v) != csize)):
            raise ValueError("Y4M plane size mismatch")
        out.append(b"FRAME\n")
        out.append(bytes(y))
        if csize:
            out.append(bytes(u))
            out.append(bytes(v))
    return b"".join(out)


def _clip8(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def y4m_frame_rgb(
    width: int,
    height: int,
    colorspace: str,
    planes: tuple[bytes, bytes | None, bytes | None],
    use_numpy: bool | None = None,
) -> list[bytearray]:
    """One Y4M frame → RGB rows (bytearray of width*3 per row), via the
    public ITU-R BT.601 limited-range INTEGER transform
    (c=Y−16, d=U−128, e=V−128; R=(298c+409e+128)>>8, …) with
    nearest-neighbour chroma upsampling — all-integer, so the numpy and
    pure-Python paths are bit-identical by construction.  Cmono maps Y
    straight to gray RGB (the same transform with d=e=0)."""
    un = _resolve_numpy(use_numpy)
    sub = _Y4M_SUBSAMPLE[colorspace]
    yp, up, vp = planes
    if un:
        ya = _np.frombuffer(yp, dtype=_np.uint8).reshape(height, width)
        c = ya.astype(_np.int32) - 16
        if sub is None:
            d = _np.zeros((height, width), dtype=_np.int32)
            e = d
        else:
            xd, yd = sub
            cw = width // xd
            ua = _np.frombuffer(up, dtype=_np.uint8).reshape(height // yd, cw)
            va = _np.frombuffer(vp, dtype=_np.uint8).reshape(height // yd, cw)
            d = _np.repeat(_np.repeat(ua, yd, axis=0), xd, axis=1).astype(
                _np.int32
            ) - 128
            e = _np.repeat(_np.repeat(va, yd, axis=0), xd, axis=1).astype(
                _np.int32
            ) - 128
        r = _np.clip((298 * c + 409 * e + 128) >> 8, 0, 255)
        g = _np.clip((298 * c - 100 * d - 208 * e + 128) >> 8, 0, 255)
        b = _np.clip((298 * c + 516 * d + 128) >> 8, 0, 255)
        rgb = _np.stack([r, g, b], axis=2).astype(_np.uint8)
        return [bytearray(rgb[yy].tobytes()) for yy in range(height)]
    rows = []
    for yy in range(height):
        row = bytearray(width * 3)
        for xx in range(width):
            c = yp[yy * width + xx] - 16
            if sub is None:
                d = e = 0
            else:
                xd, yd = sub
                cw = width // xd
                ci = (yy // yd) * cw + (xx // xd)
                d = up[ci] - 128
                e = vp[ci] - 128
            row[xx * 3] = _clip8((298 * c + 409 * e + 128) >> 8)
            row[xx * 3 + 1] = _clip8((298 * c - 100 * d - 208 * e + 128) >> 8)
            row[xx * 3 + 2] = _clip8((298 * c + 516 * d + 128) >> 8)
        rows.append(row)
    return rows


def _plane_moments_np(chunks: list[bytes]) -> tuple[int, int, int]:
    arr = _np.frombuffer(b"".join(chunks), dtype=_np.uint8).astype(_np.int64)
    return int(arr.sum()), int((arr * arr).sum()), int(arr.size)


def _plane_moments_py(chunks: list[bytes]) -> tuple[int, int, int]:
    s1 = s2 = n = 0
    for ch in chunks:
        for v in ch:
            s1 += v
            s2 += v * v
        n += len(ch)
    return s1, s2, n


def y4m_features(
    payload: bytes, dims: int = 16, use_numpy: bool | None = None
) -> list[float]:
    """Fixed-width video descriptor: dims, frame count, fps, exact
    integer-moment mean/std per Y/U/V plane across all frames, plus
    first/last-frame mean luma (temporal signal).  Same exact-moment
    contract as png_features/wav_features — numpy executor path ≡
    pure-Python oracle path bit-for-bit."""
    un = _resolve_numpy(use_numpy)
    width, height, fps_num, fps_den, cs, frames = decode_y4m(payload)
    moments = _plane_moments_np if un else _plane_moments_py

    def mean_std(chunks: list[bytes]) -> tuple[float, float]:
        if not chunks or chunks[0] is None:
            return 0.0, 0.0
        s1, s2, n = moments(chunks)
        if not n:
            return 0.0, 0.0
        mean = s1 / n
        var = max(s2 / n - mean * mean, 0.0)
        return mean / 255.0, var**0.5 / 255.0

    y_mean, y_std = mean_std([f[0] for f in frames])
    u_mean, u_std = mean_std([f[1] for f in frames])
    v_mean, v_std = mean_std([f[2] for f in frames])
    first_mean = mean_std([frames[0][0]])[0] if frames else 0.0
    last_mean = mean_std([frames[-1][0]])[0] if frames else 0.0
    feats = [
        float(width),
        float(height),
        float(len(frames)),
        fps_num / fps_den,
        y_mean,
        y_std,
        u_mean,
        u_std,
        v_mean,
        v_std,
        first_mean,
        last_mean,
    ]
    return (feats + [0.0] * dims)[:dims]
