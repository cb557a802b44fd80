"""Pure-stdlib media codecs: PNG, BMP, WAV and baseline JPEG
decode/encode with numpy + zlib + wave — no PIL/opencv/ffmpeg required.

These make the multimodal stages' decode REAL for the formats
expressible without external libraries (reference parity note: the
reference has no media path at all; this backs the engine's own
multimodal operators, see raylink/multimodal.py). Video is covered by
raylink.mp4 (ISO-BMFF parser/writer + Motion-JPEG frames via the
raylink.jpeg codec); only H.264/H.265 PIXEL decode remains honestly
out of scope (needs a real codec library).

PNG support: 8-bit greyscale / RGB / RGBA, non-interlaced, all five
scanline filter types on decode (encode emits filter 0). BMP support:
24-bit uncompressed BI_RGB. WAV support: PCM 8/16/32-bit via the
stdlib ``wave`` module. JPEG support (raylink.jpeg, re-exported
here): baseline sequential decode incl. chroma subsampling + restart
intervals; 4:4:4 / 4:2:0 encode with the Annex K tables.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg  # noqa: F401 (re-export)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_media(data: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        yield ctype, data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 ndarray of shape (h, w) or (h, w, channels).

    8-bit depth, color types 0/2/4/6, non-interlaced. All five filter
    types are reconstructed; the horizontally-dependent ones (Sub /
    Average / Paeth) fall back to a per-pixel loop, the others are
    vectorized per scanline."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    channels = None
    idat = []
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(payload)
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = int(filters[y])
        line = scan[y].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else \
            np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = line.astype(np.uint8)
        elif f == 2:  # Up
            out[y] = ((line + prev) & 0xFF).astype(np.uint8)
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            acc = line.reshape(width, bpp)
            out[y] = np.add.accumulate(
                acc.astype(np.uint8), axis=0,
                dtype=np.uint8).reshape(stride)
        else:  # Average (3) / Paeth (4): left-dependent, per pixel
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 3:
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    c = prev[i - bpp] if i >= bpp else 0
                    rec[i] = (line[i] + _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {f}")
            out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 ndarray (h,w) / (h,w,1|2|3|4) -> PNG bytes (filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(scan.tobytes(), 6)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + \
            struct.pack(">I", crc)

    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + \
        chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> uint8 RGB ndarray (h, w, 3). 24-bit BI_RGB only."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h, planes, bpp = struct.unpack("<IiihH", data[14:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data[off:off + stride * h], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_bmp(img: np.ndarray) -> bytes:
    """uint8 RGB ndarray (h, w, 3) -> 24-bit BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiihHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    return header + info + pixels


# ---------------------------------------------------------------------------
# WAV (PCM, stdlib wave)

_WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples float32 in [-1, 1] shaped (n, channels),
    sample_rate). PCM 8/16/32-bit."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        nch, width, rate, nframes = (wf.getnchannels(), wf.getsampwidth(),
                                     wf.getframerate(), wf.getnframes())
        raw = wf.readframes(nframes)
    if width not in _WIDTH_DTYPE:
        raise ValueError(f"unsupported WAV sample width {width}")
    arr = np.frombuffer(raw, dtype=_WIDTH_DTYPE[width]).reshape(-1, nch)
    if width == 1:  # 8-bit WAV is unsigned
        samples = (arr.astype(np.float32) - 128.0) / 128.0
    else:
        samples = arr.astype(np.float32) / float(2 ** (8 * width - 1))
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float array in [-1, 1] (n,) or (n, channels) -> 16-bit PCM WAV."""
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()
