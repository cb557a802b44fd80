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
