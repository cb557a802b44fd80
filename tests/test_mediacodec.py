"""Pure-stdlib media codec tests (PNG/BMP/WAV) + the real-decode
multimodal stages. The codec tests are numpy-only (no Ray)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from raylink.mediacodec import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    sniff_media,
)


def _rand_img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_round_trip_exact(ch):
    img = _rand_img(13, 17, ch, seed=ch)
    data = encode_png(img)
    assert sniff_media(data) == "png"
    out = decode_png(data)
    want = img if ch != 1 else img
    np.testing.assert_array_equal(out, want)


def _png_with_filter(img: np.ndarray, filt: int) -> bytes:
    """Build a PNG whose scanlines use filter type ``filt`` — exercises
    every unfilter branch of decode_png against a naive encoder."""
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc_ else \
                    (b if pb <= pc_ else c)
            enc[i] = (cur[i] - pred) & 0xFF
        lines.append(bytes([filt]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + \
            struct.pack(">I", crc)

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", idat) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_all_filter_types(filt):
    img = _rand_img(9, 11, 3, seed=filt + 10)
    out = decode_png(_png_with_filter(img, filt))
    np.testing.assert_array_equal(out, img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"\xff\xd8not a png")


def test_bmp_round_trip_odd_width():
    # width 5 -> 15-byte rows padded to 16 (exercises stride padding)
    img = _rand_img(7, 5, 3, seed=3)
    data = encode_bmp(img)
    assert sniff_media(data) == "bmp"
    np.testing.assert_array_equal(decode_bmp(data), img)


def test_wav_round_trip():
    rate = 8000
    t = np.arange(rate) / rate
    tone = 0.25 * np.sin(2 * np.pi * 440 * t)
    data = encode_wav(tone, rate)
    assert sniff_media(data) == "wav"
    samples, got_rate = decode_wav(data)
    assert got_rate == rate
    assert samples.shape == (rate, 1)
    np.testing.assert_allclose(samples[:, 0], tone, atol=1.5 / 32767)


def test_sniff_media():
    assert sniff_media(b"\xff\xd8\xff\xe0...") == "jpeg"
    assert sniff_media(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert sniff_media(b"??") == "unknown"


def test_decode_image_real_png_block_mean():
    """DecodeImage on a real PNG returns the block mean of the ACTUAL
    pixels — the decode is real, not the hash-seeded fake."""
    import pyarrow as pa

    from raylink.multimodal import DecodeImage

    img = _rand_img(16, 16, 3, seed=9)
    batch = pa.table(
        {
            "media_id": ["x"],
            "payload": pa.array([encode_png(img)], pa.binary()),
            "width": pa.array([16], pa.int32()),
            "height": pa.array([16], pa.int32()),
        }
    )
    out = DecodeImage(out_size=(2, 2), strict=True)(batch)
    feat = np.array(out.column("feature")[0].as_py()).reshape(2, 2)
    gray = img.mean(axis=2)
    want = gray.reshape(2, 8, 2, 8).mean(axis=(1, 3))
    np.testing.assert_allclose(feat, want, rtol=1e-5)


def test_decode_image_strict_raises_on_mp4():
    """JPEG is now really decoded (raylink.jpeg) — the remaining
    strict-mode refusal is MP4; a corrupt JPEG fails loudly as a
    ValueError, not a fake decode."""
    import pyarrow as pa

    from raylink.multimodal import DecodeImage

    def batch(payload: bytes) -> pa.Table:
        return pa.table(
            {
                "media_id": ["x"],
                "payload": pa.array([payload], pa.binary()),
                "width": pa.array([4], pa.int32()),
                "height": pa.array([4], pa.int32()),
            }
        )

    mp4 = b"\x00\x00\x00\x18ftypisom rest-of-box"
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(batch(mp4))
    # non-strict falls back to the deterministic fake for mp4
    out = DecodeImage(strict=False)(batch(mp4))
    assert len(out.column("feature")[0].as_py()) == 64
    # a truncated JPEG is a decode ERROR in either mode (it reaches
    # the real decoder, which must not silently fake pixels)
    with pytest.raises(ValueError):
        DecodeImage(strict=True)(batch(b"\xff\xd8\xff\xe0 fake jpeg"))


def test_audio_features_real_wav():
    """AudioFeatures on a real WAV: duration exact, spectral centroid
    lands on the tone frequency."""
    import pyarrow as pa

    from raylink.multimodal import AudioFeatures

    rate = 8000
    t = np.arange(rate * 2) / rate          # 2 s
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    batch = pa.table(
        {
            "media_id": ["a"],
            "payload": pa.array([encode_wav(tone, rate)], pa.binary()),
        }
    )
    out = AudioFeatures(strict=True)(batch)
    assert abs(out.column("duration_s")[0].as_py() - 2.0) < 1e-3
    assert abs(out.column("rms")[0].as_py() - 0.5 / np.sqrt(2)) < 1e-2
    assert abs(out.column("spectral_centroid_hz")[0].as_py() - 440) < 20


def test_media_fixture_payloads_are_real():
    """The media fixture now carries genuinely decodable payloads."""
    from raylink.mediacodec import decode_jpeg, sniff_media
    from raylink.multimodal import build_media_fixture

    tbl = build_media_fixture(24)
    mimes = set()
    for i in range(24):
        kind = tbl.column("kind")[i].as_py()
        payload = tbl.column("payload")[i].as_py()
        if kind == "image":
            mime = tbl.column("mime")[i].as_py()
            mimes.add(mime)
            if mime == "image/jpeg":
                assert sniff_media(payload) == "jpeg"
                px = decode_jpeg(payload)
            else:
                px = decode_png(payload)
            assert px.shape == (tbl.column("height")[i].as_py(),
                                tbl.column("width")[i].as_py(), 3)
        elif kind == "audio":
            samples, rate = decode_wav(payload)
            want_ms = tbl.column("duration_ms")[i].as_py()
            assert abs(len(samples) / rate * 1000 - want_ms) < 2
    assert mimes == {"image/png", "image/jpeg"}
