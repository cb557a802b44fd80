"""Pure-stdlib baseline JPEG codec (numpy only — no libjpeg/PIL).

Closes the last declared media stub (VERDICT r4 #8): baseline
sequential DCT JPEG (SOF0/SOF1), the format the reference environment
could not decode without external libraries. Scope:

- **decode**: baseline Huffman, 1 or 3 components, any integer
  sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...), restart intervals,
  16-bit quant tables, JFIF/EXIF APPn segments skipped. Progressive
  (SOF2) and arithmetic coding raise ``ValueError`` loudly.
- **encode**: baseline 4:4:4 (and 1-component grayscale) with the
  ITU T.81 Annex K quantization + Huffman tables, libjpeg-style
  quality scaling.

The decoder reads quantization and Huffman tables FROM the stream
(DQT/DHT), so its correctness does not depend on the Annex K
constants below — those are only the encoder's choice of tables.
Entropy (de)coding is a per-symbol Python loop; the block math (DCT,
IDCT, quantization, color transform) is vectorized numpy over all
blocks at once. The intended scale shape is unchanged: images decode
inside actor-pool ``map_batches`` stages with small batch sizes
(raylink/multimodal.py), so a slow-but-correct per-payload decode
parallelizes across the pool.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: _ZIGZAG[k] = raster index of the k-th coefficient
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT-II matrix: fwd = T @ block @ T.T
_T = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# ITU T.81 Annex K.1 quantization tables (raster order), encoder-only
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 Huffman specs: (bits[1..16], huffval), encoder-only
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _be16(b: bytes, i: int) -> int:
    return (b[i] << 8) | b[i + 1]


# ---------------------------------------------------------------------------
# decode


class _BitReader:
    """MSB-first bit reader over one unstuffed entropy segment."""

    __slots__ = ("bits", "pos")

    def __init__(self, seg: bytes):
        self.bits = np.unpackbits(np.frombuffer(seg, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG entropy data")
        v = int(self.bits[self.pos])
        self.pos += 1
        return v

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG entropy data")
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical (length, code) -> symbol map per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _split_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos`` to the next real marker,
    split at RST markers, with 0xFF00 stuffing removed per segment."""
    end = pos
    n = len(data)
    while end < n - 1:
        if data[end] == 0xFF and data[end + 1] != 0x00 and not (
                0xD0 <= data[end + 1] <= 0xD7):
            break
        end += 1
    import re

    raw = data[pos:end]
    segs = [s.replace(b"\xff\x00", b"\xff")
            for s in re.split(b"\xff[\xd0-\xd7]", raw)]
    return segs, end


def _decode_scan(frame, scan, segs, huff, qt, restart, coefs, posn):
    """Entropy-decode one scan's blocks into ``coefs``/``posn``.

    A one-component scan is NON-interleaved per T.81 A.2.3: the MCU is
    a single data unit and blocks traverse the component's own block
    grid (ceil of its sampling-scaled dimensions) in raster order. A
    multi-component scan is interleaved: cv*ch blocks per component
    per MCU over the frame's MCU grid. Each scan starts with fresh DC
    predictors.
    """
    height, width, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    bycid = {c[0]: c for c in comps}
    for cid, _, _ in scan:
        if cid not in bycid:
            raise ValueError("JPEG scan references unknown component")
    pred = {cid: 0 for cid, _, _ in scan}
    br = _BitReader(segs[0])

    def read_block(cid, tq, td, ta, by, bx):
        dct = huff.get((0, td))
        act = huff.get((1, ta))
        q = qt.get(tq)
        if dct is None or act is None or q is None:
            raise ValueError("JPEG references undefined table")
        zz = np.zeros(64, dtype=np.float64)
        s = _read_symbol(br, dct)
        pred[cid] += _extend(br.take(s), s)
        zz[0] = pred[cid]
        k = 1
        while k < 64:
            rs = _read_symbol(br, act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    break                        # EOB
                k += 16                          # ZRL
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG AC index overflow")
            zz[k] = _extend(br.take(s), s)
            k += 1
        coefs[cid].append(zz * q)
        posn[cid].append((by, bx))

    seg_i = 0
    if len(scan) == 1:
        cid, td, ta = scan[0]
        _, ch, cv, tq = bycid[cid]
        comp_w = -(-width * ch // hmax)          # ceil(X*Hi/Hmax)
        comp_h = -(-height * cv // vmax)
        nbx = -(-comp_w // 8)
        nby = -(-comp_h // 8)
        for m in range(nbx * nby):
            if restart and m and m % restart == 0:
                seg_i += 1                       # RST: next segment,
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                br = _BitReader(segs[seg_i])     # byte-aligned
                pred[cid] = 0
            by, bx = divmod(m, nbx)
            read_block(cid, tq, td, ta, by, bx)
    else:
        mx = -(-width // (8 * hmax))
        my = -(-height // (8 * vmax))
        sel = {cid: (td, ta) for cid, td, ta in scan}
        for m in range(mx * my):
            if restart and m and m % restart == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                br = _BitReader(segs[seg_i])
                for c in pred:
                    pred[c] = 0
            mcu_y, mcu_x = divmod(m, mx)
            for cid, _, _ in scan:
                _, ch, cv, tq = bycid[cid]
                td, ta = sel[cid]
                for by in range(cv):
                    for bx in range(ch):
                        read_block(cid, tq, td, ta,
                                   mcu_y * cv + by, mcu_x * ch + bx)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 ndarray, (h, w) gray or (h, w, 3)
    RGB. Raises ValueError on progressive/arithmetic/invalid input."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None          # (height, width, [(id, h, v, tq), ...])
    restart = 0
    pos = 2
    n = len(data)
    # per component: list of zigzag coefficient rows + block positions,
    # accumulated across one interleaved scan OR one scan per component
    # (both legal baseline layouts)
    coefs: dict[int, list] = {}
    posn: dict[int, list] = {}
    while pos < n - 1:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos < n - 1 and data[pos + 1] == 0xFF:
            pos += 1                             # fill bytes (B.1.1.2)
        if pos >= n - 1:
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:                       # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                             # standalone markers
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = _be16(data, pos)
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                width_b = 128 if pq else 64
                if i + width_b > len(seg):
                    raise ValueError("truncated JPEG DQT segment")
                if pq:
                    tbl = np.frombuffer(
                        seg[i:i + 128], dtype=">u2").astype(np.float64)
                else:
                    tbl = np.frombuffer(
                        seg[i:i + 64], dtype=np.uint8).astype(np.float64)
                i += width_b
                qt[tq] = tbl                     # zigzag order, as sent
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                if i + 17 > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                cnt = sum(bits)
                if i + 17 + cnt > len(seg):
                    raise ValueError("truncated JPEG DHT segment")
                vals = list(seg[i + 17:i + 17 + cnt])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1):             # SOF0/SOF1 baseline
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("truncated JPEG SOF segment")
            if seg[0] != 8:
                raise ValueError(
                    f"unsupported JPEG sample precision {seg[0]} "
                    "(baseline is 8-bit)")
            h, w = _be16(seg, 1), _be16(seg, 3)
            comps = []
            for c in range(seg[5]):
                o = 6 + 3 * c
                comps.append((seg[o], seg[o + 1] >> 4, seg[o + 1] & 15,
                              seg[o + 2]))
            if h == 0 or w == 0 or not comps:
                raise ValueError("JPEG SOF with zero dimensions or "
                                 "no components")
            # T.81 B.2.2: sampling factors are 1-4; a crafted 0 would
            # surface downstream as ZeroDivisionError, not the
            # ValueError this module promises on malformed input
            if any(ch < 1 or ch > 4 or cv < 1 or cv > 4
                   for _, ch, cv, _ in comps):
                raise ValueError("JPEG SOF sampling factor out of "
                                 "range 1-4")
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(progressive/arithmetic — baseline only)")
        elif marker == 0xDD:                     # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart = _be16(seg, 0)
        elif marker == 0xDA:                     # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0]:
                raise ValueError("truncated JPEG SOS segment")
            ns = seg[0]
            scan = [(seg[1 + 2 * j], seg[2 + 2 * j] >> 4,
                     seg[2 + 2 * j] & 15) for j in range(ns)]
            for c in frame[2]:
                coefs.setdefault(c[0], [])
                posn.setdefault(c[0], [])
            segs, pos = _split_scan(data, pos)
            _decode_scan(frame, scan, segs, huff, qt, restart,
                         coefs, posn)
            # keep parsing: more scans (one-per-component baseline
            # files) or EOI follow
        # APPn / COM / others: skipped
    if frame is None or not coefs:
        raise ValueError("truncated JPEG (missing SOF/SOS)")
    height, width, comps = frame
    missing = [c[0] for c in comps if not coefs.get(c[0])]
    if missing:
        raise ValueError(f"JPEG scans missing components {missing}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = -(-width // (8 * hmax))
    my = -(-height // (8 * vmax))

    planes = []
    for cid, ch, cv, _ in comps:
        arr = np.stack(coefs[cid])               # (nblocks, 64) zigzag
        blocks = np.zeros((len(arr), 64))
        blocks[:, _ZIGZAG] = arr                 # de-zigzag to raster
        blocks = blocks.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _T, blocks, _T) + 128.0
        plane = np.zeros((my * cv * 8, mx * ch * 8))
        for (byy, bxx), blk in zip(posn[cid], pix):
            plane[byy * 8:byy * 8 + 8, bxx * 8:bxx * 8 + 8] = blk
        # integer-ratio chroma upsample (4:2:0 / 4:2:2 / ...)
        if cv != vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        if ch != hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encode


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int):
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)            # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)        # pad with 1-bits
        return bytes(self.out)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUM, _Q_CHROM):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tbl: dict, ac_tbl: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    code, length = dc_tbl[s]
    bw.put(code, length)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_tbl[0xF0]                 # ZRL
            bw.put(c, ln)
            run -= 16
        s = abs(v).bit_length()
        c, ln = ac_tbl[(run << 4) | s]
        bw.put(c, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_tbl[0x00]                     # EOB
        bw.put(c, ln)
    return dc


def _plane_blocks(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad to (ph, pw) by edge replication, return the (by, bx, 8, 8)
    block grid."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    return padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JPEG.

    ``subsampling``: "4:4:4" (one block per component per MCU) or
    "4:2:0" (2x2 Y blocks + box-mean-halved Cb/Cr per MCU).
    ``restart_interval``: emit DRI + RST markers every N MCUs (0 = no
    restarts) — exercises the decoder's restart path in round-trips.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8 pixels")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"bad JPEG dimensions {h}x{w}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub420 = subsampling == "4:2:0" and not gray
    qlum, qchrom = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    ncomp = len(planes)
    # sampling factors per component + MCU grid
    samp = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp[:ncomp])
    vmax = max(s[1] for s in samp[:ncomp])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")                 # SOI
    # JFIF APP0 (1:1 aspect, no thumbnail)
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
    # DQT: table 0 (lum) always; table 1 (chrom) for color
    dqt = b"\x00" + qlum[_ZIGZAG].astype(np.uint8).tobytes()
    if ncomp == 3:
        dqt += b"\x01" + qchrom[_ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
    # SOF0
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([ncomp])
    for c in range(ncomp):
        ch, cv = samp[c]
        sof += bytes([c + 1, (ch << 4) | cv, 0 if c == 0 else 1])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    # DHT
    specs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if ncomp == 3:
        specs += [(0x01, _DC_CHROM), (0x11, _AC_CHROM)]
    dht = b""
    for tid, (bits, vals) in specs:
        dht += bytes([tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    # SOS
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    dc_lum = _huff_encode_table(*_DC_LUM)
    ac_lum = _huff_encode_table(*_AC_LUM)
    dc_chrom = _huff_encode_table(*_DC_CHROM)
    ac_chrom = _huff_encode_table(*_AC_CHROM)

    comp_zz = []                                 # (by, bx, 64) int32
    for c, plane in enumerate(planes):
        ch, cv = samp[c]
        if sub420 and c > 0:                     # box-mean 2x2 halve
            ph2 = -(-plane.shape[0] // 2) * 2
            pw2 = -(-plane.shape[1] // 2) * 2
            p = np.pad(plane, ((0, ph2 - plane.shape[0]),
                               (0, pw2 - plane.shape[1])), mode="edge")
            plane = p.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
        grid = _plane_blocks(plane, mcuy * cv * 8, mcux * ch * 8)
        by, bx = grid.shape[:2]
        q = qlum if c == 0 else qchrom
        dct = np.einsum("ux,nxy,vy->nuv", _T,
                        grid.reshape(-1, 8, 8) - 128.0, _T)
        zz = np.round(dct.reshape(-1, 64)[:, _ZIGZAG] / q[_ZIGZAG])
        comp_zz.append(zz.astype(np.int32).reshape(by, bx, 64))

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            out += bw.flush()                    # byte-align segment
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            preds = [0] * ncomp
        mj, mi = divmod(m, mcux)
        for c in range(ncomp):
            ch, cv = samp[c]
            dct_t = dc_lum if c == 0 else dc_chrom
            act_t = ac_lum if c == 0 else ac_chrom
            for byy in range(cv):
                for bxx in range(ch):
                    zz = comp_zz[c][mj * cv + byy, mi * ch + bxx]
                    preds[c] = _encode_block(bw, zz, preds[c],
                                             dct_t, act_t)
    out += bw.flush()
    out += b"\xff\xd9"                           # EOI
    return bytes(out)
