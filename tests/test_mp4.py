"""MP4 (ISO-BMFF) container codec tests: Motion-JPEG round trip,
metadata probe, box-parser robustness, and the real video stages.
The codec tests are numpy-only (no Ray)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from raylink.jpeg import decode_jpeg, encode_jpeg
from raylink.mp4 import (
    decode_mjpeg_mp4,
    encode_mjpeg_mp4,
    iter_mjpeg_samples,
    probe_mp4,
)


def _frames(n=4, h=24, w=32, seed=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.zeros((n, h, w, 3), np.uint8)
    for f in range(n):
        px = ((xx * 9 + f * 31)[:, :, None] * np.array([1, 0, 0]) +
              (yy * 11)[:, :, None] * np.array([0, 1, 0]) +
              rng.randint(0, 48, size=(h, w, 3)))
        out[f] = px.clip(0, 255)
    return out


def test_mjpeg_mp4_round_trip_bit_exact():
    """Every extracted sample is bit-identical to the standalone JPEG
    encoding of that frame, and the decoded pixels match the JPEG
    codec's own decode — the container adds zero loss."""
    frames = _frames(5)
    data = encode_mjpeg_mp4(frames, fps=10, quality=90)
    samples = list(iter_mjpeg_samples(data))
    assert len(samples) == 5
    for i, (ts, jb) in enumerate(samples):
        assert ts == i * 100
        assert jb == encode_jpeg(frames[i], quality=90)
    dec, fps = decode_mjpeg_mp4(data)
    assert dec.shape == frames.shape
    assert fps == pytest.approx(10.0)
    for i, (_, jb) in enumerate(samples):
        np.testing.assert_array_equal(dec[i], decode_jpeg(jb))


def test_mjpeg_mp4_grayscale_frames():
    g = _frames(3)[:, :, :, 0]
    data = encode_mjpeg_mp4(g, fps=4, quality=85)
    dec, fps = decode_mjpeg_mp4(data)
    assert dec.shape == (3, 24, 32, 3)
    assert fps == pytest.approx(4.0)


def test_probe_mp4_metadata():
    frames = _frames(6, h=16, w=48)
    data = encode_mjpeg_mp4(frames, fps=3, quality=80)
    info = probe_mp4(data)
    assert info["brand"] == "isom"
    assert info["duration_ms"] == 2000           # 6 frames at 3 fps
    (trk,) = info["tracks"]
    assert trk["handler"] == "vide"
    assert trk["codec"] == "jpeg"
    assert (trk["width"], trk["height"]) == (48, 16)
    assert trk["sample_count"] == 6


def test_probe_rejects_non_mp4_and_truncated():
    with pytest.raises(ValueError):
        probe_mp4(b"not an mp4 at all")
    data = encode_mjpeg_mp4(_frames(2), fps=5)
    with pytest.raises(ValueError):
        probe_mp4(data[: len(data) // 2])        # moov cut off
    # box size pointing past EOF
    bad = bytearray(data)
    bad[0:4] = struct.pack(">I", len(data) + 100)
    with pytest.raises(ValueError):
        probe_mp4(bytes(bad))


def test_largesize_and_size0_boxes():
    """size==1 (64-bit largesize) and size==0 (to-end) headers parse
    per ISO 14496-12 4.2."""
    data = encode_mjpeg_mp4(_frames(2), fps=5)
    # rewrite the ftyp box with a largesize header (shifts every later
    # offset by 8, so patch stco's single chunk offset to match)
    (ftyp_size,) = struct.unpack(">I", data[0:4])
    ftyp_body = data[8:ftyp_size]
    big_ftyp = (struct.pack(">I", 1) + b"ftyp" +
                struct.pack(">Q", 16 + len(ftyp_body)) + ftyp_body)
    rest = bytearray(data[ftyp_size:])
    stco_at = bytes(rest).find(b"stco")
    (old_off,) = struct.unpack(
        ">I", rest[stco_at + 12:stco_at + 16])
    rest[stco_at + 12:stco_at + 16] = struct.pack(">I", old_off + 8)
    patched = big_ftyp + bytes(rest)
    dec, _ = decode_mjpeg_mp4(patched)
    base, _ = decode_mjpeg_mp4(data)
    np.testing.assert_array_equal(dec, base)
    # size==0: the LAST box may run to EOF
    moov_at = patched.rfind(b"moov") - 4
    zeroed = bytearray(patched)
    zeroed[moov_at:moov_at + 4] = b"\x00\x00\x00\x00"
    dec2, _ = decode_mjpeg_mp4(bytes(zeroed))
    np.testing.assert_array_equal(dec2, base)


def test_non_mjpeg_codec_raises_value_error():
    """An mp4 whose video track is not Motion-JPEG (e.g. avc1) is a
    loud ValueError from the sample iterator — the honest boundary."""
    data = bytearray(encode_mjpeg_mp4(_frames(2), fps=5))
    at = bytes(data).find(b"jpeg", bytes(data).find(b"stsd"))
    data[at:at + 4] = b"avc1"
    with pytest.raises(ValueError, match="avc1"):
        list(iter_mjpeg_samples(bytes(data)))
    # but the metadata probe still works on it
    info = probe_mp4(bytes(data))
    assert info["tracks"][0]["codec"] == "avc1"


def test_sample_frames_stage_real_mjpeg():
    """SampleFrames over a real MJPEG mp4 emits the actual JPEG sample
    bytes at as-of timestamps, decodable by DecodeImage."""
    import pyarrow as pa

    from raylink.multimodal import DecodeImage, SampleFrames

    frames = _frames(4)
    data = encode_mjpeg_mp4(frames, fps=2, quality=90)  # 500 ms apart
    batch = pa.table({
        "media_id": ["v0"],
        "payload": pa.array([data], pa.binary()),
        "duration_ms": pa.array([2000], pa.int32()),
    })
    out = SampleFrames(every_ms=1000, strict=True)(batch)
    ts = out.column("frame_ts_ms").to_pylist()
    assert ts == [0, 1000]
    jbs = out.column("frame").to_pylist()
    assert jbs[0] == encode_jpeg(frames[0], quality=90)
    assert jbs[1] == encode_jpeg(frames[2], quality=90)  # as-of pick
    img_batch = pa.table({
        "media_id": ["v0@0", "v0@1000"],
        "payload": pa.array(jbs, pa.binary()),
        "width": pa.array([32, 32], pa.int32()),
        "height": pa.array([24, 24], pa.int32()),
    })
    feats = DecodeImage(strict=True,
                        check_roundtrip=True)(img_batch)
    assert feats.column("roundtrip_ok").to_pylist() == [True, True]


def test_sample_frames_stage_strict_vs_fallback():
    import pyarrow as pa

    from raylink.multimodal import SampleFrames

    opaque = pa.table({
        "media_id": ["x"],
        "payload": pa.array([b"\x00" * 64], pa.binary()),
        "duration_ms": pa.array([2500], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        SampleFrames(every_ms=1000, strict=True)(opaque)
    out = SampleFrames(every_ms=1000, strict=False)(opaque)
    assert out.column("frame_ts_ms").to_pylist() == [0, 1000, 2000]


def test_decode_image_first_frame_of_mjpeg_mp4():
    import pyarrow as pa

    from raylink.multimodal import DecodeImage

    frames = _frames(3)
    data = encode_mjpeg_mp4(frames, fps=5, quality=90)
    batch = pa.table({
        "media_id": ["v"],
        "payload": pa.array([data], pa.binary()),
        "width": pa.array([32], pa.int32()),
        "height": pa.array([24], pa.int32()),
    })
    out = DecodeImage(out_size=(2, 2), strict=True)(batch)
    want = decode_jpeg(encode_jpeg(frames[0], quality=90)).mean(axis=2)
    want = want.reshape(2, 12, 2, 16).mean(axis=(1, 3))
    got = np.array(out.column("feature")[0].as_py()).reshape(2, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_media_fixture_videos_are_real_mjpeg():
    """The fixture's MJPEG videos probe + decode for real; the opaque
    ones stay opaque (the honest H.264-class coverage)."""
    from raylink.mediacodec import sniff_media
    from raylink.multimodal import build_media_fixture

    tbl = build_media_fixture(48)
    real = fake = 0
    for i in range(48):
        if tbl.column("kind")[i].as_py() != "video":
            continue
        payload = tbl.column("payload")[i].as_py()
        if sniff_media(payload) == "mp4":
            real += 1
            info = probe_mp4(payload)
            assert info["tracks"][0]["codec"] == "jpeg"
            assert info["tracks"][0]["width"] == \
                tbl.column("width")[i].as_py()
            dur = tbl.column("duration_ms")[i].as_py()
            assert abs(info["duration_ms"] - dur) <= 1
            dec, _ = decode_mjpeg_mp4(payload)
            assert dec.ndim == 4 and dec.shape[3] == 3
        else:
            fake += 1
    assert real > 0 and fake > 0


def test_sample_frames_empty_sample_table():
    """An MJPEG mp4 whose stsz declares ZERO samples (stripped /
    still-initializing file) must route through the strict-raise /
    fake-fallback contract, not die on a bare IndexError in the
    as-of pick (code-review r5)."""
    import pyarrow as pa

    from raylink.multimodal import SampleFrames

    data = bytearray(encode_mjpeg_mp4(_frames(3), fps=2))
    i = data.find(b"stsz")
    assert i > 0
    data[i + 12:i + 16] = struct.pack(">I", 0)      # sample count -> 0
    batch = pa.table({
        "media_id": ["v"],
        "payload": pa.array([bytes(data)], pa.binary()),
        "duration_ms": pa.array([2500], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        SampleFrames(every_ms=1000, strict=True)(batch)
    out = SampleFrames(every_ms=1000, strict=False)(batch)
    assert out.column("frame_ts_ms").to_pylist() == [0, 1000, 2000]


def test_decode_image_undecodable_mjpeg_sample():
    """An mp4 whose sample-entry fourcc says MJPEG but whose first
    sample the baseline codec rejects (here: SOF0 flipped to
    progressive SOF2) must honor the strict/fallback contract — the
    decode_jpeg call sits INSIDE the try (code-review r5)."""
    import pyarrow as pa

    from raylink.multimodal import DecodeImage

    data = bytearray(encode_mjpeg_mp4(_frames(2), fps=2, quality=85))
    m = data.find(b"mdat")
    sof = data.find(b"\xff\xc0", m)
    assert sof > m > 0
    data[sof + 1] = 0xC2                            # -> progressive
    batch = pa.table({
        "media_id": ["v"],
        "payload": pa.array([bytes(data)], pa.binary()),
        "width": pa.array([32], pa.int32()),
        "height": pa.array([24], pa.int32()),
    })
    with pytest.raises(NotImplementedError):
        DecodeImage(out_size=(2, 2), strict=True)(batch)
    out = DecodeImage(out_size=(2, 2), strict=False)(batch)
    assert len(out.column("feature")[0].as_py()) == 4  # fake, no raise


def test_probe_mp4_audio_track_has_no_dims():
    """A SoundSampleEntry stores the 16.16 samplerate at the byte
    offset where a VisualSampleEntry stores width/height; the probe
    must key off the hdlr type, not a one-codec blacklist — a 'twos'
    audio track used to report width=44100 (code-review r5)."""
    from raylink.mp4 import _box, _full

    entry = (struct.pack(">I", 36) + b"twos" + b"\x00" * 6 +
             struct.pack(">H", 1) +                  # data-ref index
             struct.pack(">HHIHHHH", 0, 0, 0, 2, 16, 0, 0) +
             struct.pack(">I", 44100 << 16))         # 16.16 rate
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd)
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I", 0) + b"soun" + b"\x00" * 12)
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 8000, 8000) +
                 struct.pack(">HH", 0, 0))
    mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 1000, 2000) + b"\x00" * 80)
    moov = _box(b"moov", mvhd + _box(b"trak", mdia))
    data = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom") + moov
    info = probe_mp4(data)
    (tr,) = info["tracks"]
    assert tr["handler"] == "soun" and tr["codec"] == "twos"
    assert tr["width"] == 0 and tr["height"] == 0
