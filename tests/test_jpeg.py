"""Baseline JPEG codec tests (raylink.jpeg — VERDICT r4 #8).

The round-trip tests exercise encoder+decoder together; the golden
test hand-assembles a JPEG at the BIT level inside the test (own
Huffman tables, own entropy bits, 16-bit DQT) and checks the decoded
pixels against an independently-written IDCT double loop — so a
shared encoder/decoder bug (e.g. a wrong zigzag constant cancelling
out) cannot pass it.
"""

import numpy as np
import pytest

from raylink.jpeg import decode_jpeg, encode_jpeg


def _test_image(h=41, w=53, seed=7):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    (xx + yy) * 255 // (w + h - 2)], axis=2)
    return np.clip(img + rng.randint(0, 30, img.shape),
                   0, 255).astype(np.uint8)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
@pytest.mark.parametrize("rst", [0, 3])
def test_jpeg_round_trip_tolerance(sub, rst):
    """Lossy round-trip within quantization tolerance, at odd
    (non-multiple-of-16) dimensions, both subsamplings, with and
    without restart markers."""
    img = _test_image()
    data = encode_jpeg(img, quality=90, subsampling=sub,
                       restart_interval=rst)
    out = decode_jpeg(data)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 8.0
    assert err.max() <= 48


def test_jpeg_restart_markers_do_not_change_pixels():
    img = _test_image(32, 48, seed=3)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=2))
    np.testing.assert_array_equal(base, rst)


def test_jpeg_grayscale_and_flat():
    g = (np.mgrid[0:24, 0:40][1] * 255 // 39).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == g.shape
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 4
    # a flat block has only a DC coefficient -> near-exact at any q
    flat = np.full((16, 24, 3), 137, np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(flat, quality=75)), flat)


def test_jpeg_quality_monotone_size():
    img = _test_image(40, 40, seed=11)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_rejects_progressive_and_garbage():
    img = _test_image(16, 16)
    data = bytearray(encode_jpeg(img))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2                       # masquerade as SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 truncated")


def test_jpeg_golden_hand_assembled_block():
    """Decoder-only golden vector: one 8x8 grayscale block assembled
    bit-by-bit HERE (not by encode_jpeg), with a 16-bit (Pq=1) quant
    table of all 2s, DC diff = 3 and one AC coefficient at zigzag
    index 1 (raster (0,1)) = -1. Expected pixels computed with an
    explicit cosine double loop written independently below."""

    def seg(marker, payload):
        return bytes([0xFF, marker]) + \
            (len(payload) + 2).to_bytes(2, "big") + payload

    # DQT Pq=1 (16-bit), Tq=0, all entries 2
    dqt = seg(0xDB, b"\x10" + (2).to_bytes(2, "big") * 64)
    # SOF0: 8-bit, 8x8, 1 component id=1, h=v=1, q-table 0
    sof = seg(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    # DC table (class 0, id 0): single symbol "category 2" = code 00
    dht_dc = seg(0xC4, bytes([0x00]) +
                 bytes([0, 1] + [0] * 14) + bytes([2]))
    # AC table (class 1, id 0): 0x01 -> 00, 0x00 (EOB) -> 01
    dht_ac = seg(0xC4, bytes([0x10]) +
                 bytes([0, 2] + [0] * 14) + bytes([0x01, 0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # entropy bits: DC code 00 + magnitude "11" (diff=+3), AC symbol
    # 0x01 (run 0, size 1) code 00 + bit 0 (EXTEND(0,1) = -1), EOB 01,
    # padded with 1s -> 0011000 011 111111 -> 0x30 0xFF; the 0xFF data
    # byte must be stuffed with 0x00
    scan = b"\x30\xff\x00"
    data = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + scan +
            b"\xff\xd9")

    got = decode_jpeg(data)
    assert got.shape == (8, 8)

    # independent IDCT: B[0,0] = 3*2, B[0,1] = -1*2 (dequantized)
    def c(u):
        return np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)

    want = np.zeros((8, 8))
    coef = {(0, 0): 6.0, (0, 1): -2.0}
    for x in range(8):
        for y in range(8):
            s = 0.0
            for (u, v), val in coef.items():
                s += (c(u) * c(v) * val *
                      np.cos((2 * x + 1) * u * np.pi / 16) *
                      np.cos((2 * y + 1) * v * np.pi / 16))
            want[x, y] = s + 128.0
    np.testing.assert_array_equal(
        got, np.clip(want, 0, 255).astype(np.uint8))


def test_jpeg_decode_image_stage_real_decode():
    """The actor stage really decodes a JPEG payload: features equal
    the block-mean of the DECODED pixels (not a fake), and the PNG
    round-trip self-check still holds on them."""
    import pyarrow as pa

    from raylink.multimodal import DecodeImage, _block_mean_resize

    img = _test_image(24, 32, seed=5)
    payload = encode_jpeg(img, quality=92)
    batch = pa.table(
        {
            "media_id": ["j1"],
            "payload": pa.array([payload], pa.binary()),
            "width": pa.array([32], pa.int32()),
            "height": pa.array([24], pa.int32()),
        }
    )
    out = DecodeImage(strict=True, check_roundtrip=True)(batch)
    assert out.column("roundtrip_ok")[0].as_py() is True
    got = np.array(out.column("feature")[0].as_py())
    want = _block_mean_resize(
        decode_jpeg(payload).mean(axis=2), 8, 8).flatten()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker code; they are padding, not markers or segment bytes."""
    img = _test_image(16, 16)
    data = encode_jpeg(img, quality=85)
    base = decode_jpeg(data)
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    padded = padded.replace(b"\xff\xda", b"\xff\xff\xff\xff\xda", 1)
    np.testing.assert_array_equal(decode_jpeg(padded), base)


def test_jpeg_truncated_raises_value_error():
    """Malformed/truncated headers raise the documented ValueError,
    never a bare IndexError."""
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x02\xff\xd9")
    data = encode_jpeg(_test_image(16, 16))
    sof = data.find(b"\xff\xc0")
    with pytest.raises(ValueError):
        decode_jpeg(data[:sof + 6])             # cut mid-SOF
    bad = bytearray(data)
    bad[sof + 2:sof + 4] = (0xFFFF).to_bytes(2, "big")
    with pytest.raises(ValueError):             # length past EOF
        decode_jpeg(bytes(bad))


def test_jpeg_rejects_non_8bit_precision():
    """12-bit extended-sequential input raises loudly instead of
    silently decoding with the wrong level shift."""
    data = bytearray(encode_jpeg(_test_image(16, 16)))
    sof = data.find(b"\xff\xc0")
    assert data[sof + 4] == 8                   # precision byte
    data[sof + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(data))


@pytest.mark.parametrize("rst", [0, 3])
def test_jpeg_grayscale_sampling_factors_gt1(rst):
    """A 1-component frame may declare sampling factors >1; its single
    scan is then NON-interleaved (T.81 A.2.3) with MCU = one data unit
    in raster order over the component's own block grid — which makes
    the entropy stream identical to the 1x1-sampling encoding of the
    same pixels, so patching the SOF sampling byte must not change the
    decode."""
    g = _test_image(16, 32)[:, :, 0].copy()
    data = bytearray(encode_jpeg(g, quality=90, restart_interval=rst))
    base = decode_jpeg(bytes(data))
    sof = data.find(b"\xff\xc0")
    assert data[sof + 11] == 0x11               # comp sampling h|v
    data[sof + 11] = 0x22
    np.testing.assert_array_equal(decode_jpeg(bytes(data)), base)


def _encode_3scan(img, quality=90):
    """Assemble a legal baseline JPEG with one SOS PER COMPONENT
    (non-interleaved sequential scans, 4:4:4), reusing the codec's own
    block/Huffman kernels so the coefficients match encode_jpeg's."""
    from raylink import jpeg as J

    h, w = img.shape[:2]
    qlum, qchrom = J._quality_tables(quality)
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    planes = [0.299 * r + 0.587 * g + 0.114 * b,
              -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
              0.5 * r - 0.418688 * g - 0.081312 * b + 128.0]
    out = bytearray(b"\xff\xd8")
    dqt = b"\x00" + qlum[J._ZIGZAG].astype(np.uint8).tobytes()
    dqt += b"\x01" + qchrom[J._ZIGZAG].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([3])
    for c in range(3):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    dht = b""
    for tid, (bits, vals) in [(0x00, J._DC_LUM), (0x10, J._AC_LUM),
                              (0x01, J._DC_CHROM),
                              (0x11, J._AC_CHROM)]:
        dht += bytes([tid]) + bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    nbx, nby = -(-w // 8), -(-h // 8)
    for c, plane in enumerate(planes):
        grid = J._plane_blocks(plane, nby * 8, nbx * 8)
        q = qlum if c == 0 else qchrom
        dct = np.einsum("ux,nxy,vy->nuv", J._T,
                        grid.reshape(-1, 8, 8) - 128.0, J._T)
        zz = np.round(dct.reshape(-1, 64)[:, J._ZIGZAG] /
                      q[J._ZIGZAG]).astype(np.int32)
        dc_t = J._huff_encode_table(
            *(J._DC_LUM if c == 0 else J._DC_CHROM))
        ac_t = J._huff_encode_table(
            *(J._AC_LUM if c == 0 else J._AC_CHROM))
        sos = bytes([1, c + 1, 0x00 if c == 0 else 0x11]) + \
            b"\x00\x3f\x00"
        out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
        bw = J._BitWriter()
        pred = 0
        for zzrow in zz:
            pred = J._encode_block(bw, zzrow, pred, dc_t, ac_t)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_multi_scan_one_component_per_sos():
    """Baseline files may carry the components in sequential
    non-interleaved scans (one SOS each); the decode must match the
    interleaved single-scan encoding of the same image exactly (the
    quantized coefficients are identical by construction)."""
    img = _test_image(24, 24, seed=9)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    got = decode_jpeg(_encode_3scan(img, quality=90))
    np.testing.assert_array_equal(got, base)


def test_jpeg_zero_sampling_factor_raises_value_error():
    """A crafted SOF whose component sampling factor is 0 must raise
    the documented ValueError, not ZeroDivisionError downstream in
    the MCU-grid ceil divisions (code-review r5)."""
    data = bytearray(encode_jpeg(_test_image(16, 16)))
    sof = data.find(b"\xff\xc0")
    assert data[sof + 11] in (0x11, 0x21, 0x22)  # comp-0 sampling
    data[sof + 11] = 0x00
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(data))
