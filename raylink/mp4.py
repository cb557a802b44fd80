"""Pure-stdlib MP4 (ISO/IEC 14496-12 ISO-BMFF) container codec.

Closes the last declared media stub (reference parity note: the
reference — irem-kaya/Address-Parsing — has no media path at all; this
backs the engine's own multimodal operators in raylink/multimodal.py):

- ``probe_mp4`` parses the box tree of ANY mp4 (metadata only): brands,
  per-track handler/codec fourcc, dimensions, duration, sample count.
- ``decode_mjpeg_mp4`` extracts and decodes the frames of a
  Motion-JPEG mp4 (sample entry fourcc ``jpeg``/``mjpa``) using the
  repo's own baseline JPEG codec (raylink.jpeg) — a fully from-scratch
  video decode path with no ffmpeg/PIL.
- ``encode_mjpeg_mp4`` writes a minimal single-track MJPEG mp4
  (ftyp + mdat + moov with a complete sample table).

H.264/H.265 PIXEL decode stays honestly out of scope (an entropy
decoder for those genuinely needs a real codec library); their
metadata still probes fine, and raylink.multimodal raises
NotImplementedError for them in strict mode.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"mvex", b"udta"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in a range.

    Handles 32-bit sizes, size==1 (64-bit largesize) and size==0
    (box extends to the end of the enclosing range), per ISO 14496-12
    §4.2. Raises ValueError on truncation or overlap."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        fourcc = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize header")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"bad MP4 box size for {fourcc!r}")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """Yield (body_start, body_end) of every box matching a fourcc
    path (e.g. [b'moov', b'trak']) under the given range."""
    head, rest = path[0], path[1:]
    for fourcc, b0, b1 in _boxes(data, start, end):
        if fourcc != head:
            continue
        if not rest:
            yield b0, b1
        else:
            yield from _find(data, b0, b1, rest)


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """(version, flags) of a full box body starting at ``pos``."""
    return data[pos], int.from_bytes(data[pos + 1:pos + 4], "big")


def _mdhd_times(data: bytes, b0: int) -> tuple[int, int]:
    """(timescale, duration) from an mvhd/mdhd body (v0 or v1)."""
    ver, _ = _fullbox(data, b0)
    if ver == 1:
        ts, dur = struct.unpack(">IQ", data[b0 + 20:b0 + 32])
    else:
        ts, dur = struct.unpack(">II", data[b0 + 12:b0 + 20])
    return ts, dur


def _parse_track(data: bytes, t0: int, t1: int) -> dict:
    """One trak box -> handler, codec, dims, timing + sample layout."""
    info: dict = {"handler": None, "codec": None, "width": 0,
                  "height": 0, "timescale": 0, "duration": 0,
                  "sample_count": 0}
    for m0, m1 in _find(data, t0, t1, [b"mdia"]):
        for h0, _h1 in _find(data, m0, m1, [b"hdlr"]):
            info["handler"] = data[h0 + 8:h0 + 12].decode(
                "latin1").strip()
        for d0, _d1 in _find(data, m0, m1, [b"mdhd"]):
            info["timescale"], info["duration"] = _mdhd_times(data, d0)
        for s0, s1 in _find(data, m0, m1, [b"minf", b"stbl"]):
            info.update(_parse_stbl(
                data, s0, s1, visual=info["handler"] == "vide"))
    return info


def _parse_stbl(data: bytes, s0: int, s1: int,
                visual: bool = True) -> dict:
    """Sample-table boxes -> codec fourcc, dims, per-sample
    (offset, size, time) arrays. Implements the full stsc run-length
    chunk map and both stco/co64."""
    out: dict = {}
    sizes = offsets = None
    stsc_rows: list[tuple[int, int]] = []
    chunk_offs: np.ndarray | None = None
    deltas: list[tuple[int, int]] = []
    for fourcc, b0, b1 in _boxes(data, s0, s1):
        if fourcc == b"stsd":
            (n,) = struct.unpack(">I", data[b0 + 4:b0 + 8])
            if n >= 1:
                # first VisualSampleEntry: size(4) fourcc(4) ...
                e0 = b0 + 8
                out["codec"] = data[e0 + 4:e0 + 8].decode("latin1")
                # dims live at offset 32 only in a VisualSampleEntry;
                # in a SoundSampleEntry those bytes are the 16.16
                # samplerate (a one-codec 'mp4a' blacklist reported
                # width=44100 for any other audio fourcc) — key off
                # the track's hdlr type instead
                if visual and b1 - e0 >= 36:
                    w, h = struct.unpack(">HH", data[e0 + 32:e0 + 36])
                    out["width"], out["height"] = w, h
        elif fourcc == b"stsz":
            fixed, n = struct.unpack(">II", data[b0 + 4:b0 + 12])
            if fixed:
                sizes = np.full(n, fixed, np.int64)
            else:
                sizes = np.frombuffer(
                    data, ">u4", n, b0 + 12).astype(np.int64)
            out["sample_count"] = n
        elif fourcc == b"stsc":
            (n,) = struct.unpack(">I", data[b0 + 4:b0 + 8])
            for i in range(n):
                first, per, _desc = struct.unpack(
                    ">III", data[b0 + 8 + 12 * i:b0 + 20 + 12 * i])
                stsc_rows.append((first, per))
        elif fourcc in (b"stco", b"co64"):
            (n,) = struct.unpack(">I", data[b0 + 4:b0 + 8])
            dt = ">u4" if fourcc == b"stco" else ">u8"
            chunk_offs = np.frombuffer(
                data, dt, n, b0 + 8).astype(np.int64)
        elif fourcc == b"stts":
            (n,) = struct.unpack(">I", data[b0 + 4:b0 + 8])
            for i in range(n):
                cnt, delta = struct.unpack(
                    ">II", data[b0 + 8 + 8 * i:b0 + 16 + 8 * i])
                deltas.append((cnt, delta))
    if sizes is not None and chunk_offs is not None and stsc_rows:
        offsets = np.zeros(len(sizes), np.int64)
        si = 0
        nchunks = len(chunk_offs)
        for ri, (first, per) in enumerate(stsc_rows):
            last = stsc_rows[ri + 1][0] - 1 if ri + 1 < len(stsc_rows) \
                else nchunks
            for ci in range(first - 1, last):
                off = int(chunk_offs[ci])
                for _ in range(per):
                    if si >= len(sizes):
                        break
                    offsets[si] = off
                    off += int(sizes[si])
                    si += 1
        out["sample_sizes"] = sizes
        out["sample_offsets"] = offsets
    if deltas:
        times = np.repeat(
            [d for _, d in deltas], [c for c, _ in deltas])
        out["sample_times"] = np.concatenate(
            [[0], np.cumsum(times)[:-1]]).astype(np.int64)
        out["frame_delta"] = deltas[0][1]
    return out


def probe_mp4(data: bytes) -> dict:
    """Parse the box tree of any mp4: brands, movie duration_ms and
    per-track handler / codec / dims / sample count. Metadata only —
    never touches mdat."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    info: dict = {"brand": data[8:12].decode("latin1"),
                  "duration_ms": 0, "tracks": []}
    for fourcc, b0, b1 in _boxes(data, 0, len(data)):
        if fourcc != b"moov":
            continue
        for m0, _m1 in _find(data, b0, b1, [b"mvhd"]):
            ts, dur = _mdhd_times(data, m0)
            if ts:
                info["duration_ms"] = int(dur * 1000 / ts)
        for t0, t1 in _find(data, b0, b1, [b"trak"]):
            tr = _parse_track(data, t0, t1)
            info["tracks"].append(
                {k: tr.get(k) for k in
                 ("handler", "codec", "width", "height",
                  "timescale", "duration", "sample_count")})
    if not info["tracks"]:
        raise ValueError("MP4 has no moov/trak (not a finalized file)")
    return info


_JPEG_FOURCC = ("jpeg", "mjpa", "mjpb", "JPEG")


def iter_mjpeg_samples(data: bytes):
    """Yield (ts_ms, jpeg_bytes) for each frame of the first MJPEG
    video track. Raises ValueError for non-MJPEG codecs (caller
    decides whether that is a strict failure)."""
    if data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (missing ftyp)")
    for b0, b1 in _find(data, 0, len(data), [b"moov", b"trak"]):
        tr = _parse_track(data, b0, b1)
        if tr.get("handler") != "vide":
            continue
        if tr.get("codec") not in _JPEG_FOURCC:
            raise ValueError(
                f"MP4 video codec {tr.get('codec')!r} is not "
                "Motion-JPEG (H.264/H.265 decode needs a codec "
                "library, not in this environment)")
        offs = tr.get("sample_offsets")
        sizes = tr.get("sample_sizes")
        if offs is None or sizes is None:
            raise ValueError("MP4 track has no sample table")
        ts = tr.get("sample_times")
        scale = tr.get("timescale") or 1
        for i in range(len(sizes)):
            t_ms = int(ts[i] * 1000 / scale) if ts is not None else 0
            o, s = int(offs[i]), int(sizes[i])
            if o + s > len(data):
                raise ValueError("MP4 sample extends past EOF")
            yield t_ms, data[o:o + s]
        return
    raise ValueError("MP4 has no video track")


def decode_mjpeg_mp4(data: bytes) -> tuple[np.ndarray, float]:
    """Motion-JPEG mp4 -> (frames uint8 (n, h, w, 3), fps)."""
    frames = [decode_jpeg(b) for _, b in iter_mjpeg_samples(data)]
    if not frames:
        raise ValueError("MP4 video track has no samples")
    arr = np.stack([f if f.ndim == 3 else
                    np.repeat(f[:, :, None], 3, axis=2)
                    for f in frames])
    info = probe_mp4(data)
    vid = next(t for t in info["tracks"] if t["handler"] == "vide")
    fps = 0.0
    if vid["sample_count"] and vid["duration"] and vid["timescale"]:
        fps = vid["sample_count"] * vid["timescale"] / vid["duration"]
    return arr, fps


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int,
          payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) +
                flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)


def encode_mjpeg_mp4(frames: np.ndarray, fps: float = 10.0,
                     quality: int = 85) -> bytes:
    """uint8 frames (n, h, w, 3) or (n, h, w) -> minimal single-track
    Motion-JPEG mp4 (layout: ftyp, mdat, moov — stco is exact because
    mdat precedes moov). Each sample is one baseline JPEG from the
    repo's own encoder."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = np.repeat(frames[:, :, :, None], 3, axis=3)
    n, h, w = frames.shape[:3]
    if n == 0:
        raise ValueError("MP4 needs at least one frame")
    samples = [encode_jpeg(f, quality=quality) for f in frames]
    sizes = [len(s) for s in samples]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) +
                b"isommp41")
    mdat = _box(b"mdat", b"".join(samples))
    first_off = len(ftyp) + 8                   # mdat body start

    timescale = 90000
    delta = max(int(round(timescale / fps)), 1)
    dur = delta * n

    stsd_entry = (struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 +
                  struct.pack(">H", 1) + b"\x00" * 16 +
                  struct.pack(">HH", w, h) +
                  struct.pack(">II", 0x480000, 0x480000) +
                  struct.pack(">I", 0) + struct.pack(">H", 1) +
                  b"\x00" * 32 + struct.pack(">Hh", 24, -1))
    stbl = (
        _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry) +
        _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta)) +
        _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1)) +
        _full(b"stsz", 0, 0, struct.pack(">II", 0, n) +
              b"".join(struct.pack(">I", s) for s in sizes)) +
        _full(b"stco", 0, 0, struct.pack(">II", 1, first_off)))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) +
                 _full(b"url ", 0, 1, b""))
    minf = _box(b"minf",
                _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                + _box(b"dinf", dref) + _box(b"stbl", stbl))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" +
                 b"\x00" * 12 + b"raylink mjpeg\x00")
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, dur) +
                 struct.pack(">HH", 0x55C4, 0))   # lang 'und'
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIIII", 0, 0, 1, 0, dur) +
                 b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0) +
                 _MATRIX + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, dur) +
                 struct.pack(">IHH", 0x10000, 0x100, 0) +
                 b"\x00" * 8 + _MATRIX + b"\x00" * 24 +
                 struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
