"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
environment — see DecodeImage.decode): they either raise
NotImplementedError (strict mode) or produce a deterministic fake
derived from the bytes, so the Ray-side plumbing — schema, small batch
sizes for large payloads, actor signature, output layout — is real and
tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("kind", pa.string()),        # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def _fake_pixels(data: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: seed a PRNG from the payload hash.

    Replace with a real decoder (PIL.Image.open etc.) when the library
    is available; the surrounding plumbing is unchanged."""
    seed = int.from_bytes(hashlib.blake2b(data, digest_size=4).digest(),
                          "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: binary payload -> fixed-size feature vector.

    __init__ holds the (stub) decoder state; __call__ maps a batch.
    Use small ``batch_size`` (e.g. 64) — payloads are large and
    batch_size * concurrency blocks must fit the worker heap."""

    def __init__(self, out_size: tuple[int, int] = (8, 8),
                 strict: bool = False):
        self.out_size = out_size
        self.strict = strict

    def decode(self, data: bytes, width: int, height: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "real image decoding requires PIL/opencv, not present in "
                "this environment")
        return _fake_pixels(data, max(width, 1), max(height, 1))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        feats = []
        ow, oh = self.out_size
        for data, w, h in zip(payloads, widths, heights):
            px = self.decode(data or b"", w or 1, h or 1)
            # "resize": deterministic block-mean downsample to out_size
            ys = np.linspace(0, px.shape[0], oh + 1, dtype=int)
            xs = np.linspace(0, px.shape[1], ow + 1, dtype=int)
            small = np.zeros((oh, ow), dtype=np.float32)
            gray = px.mean(axis=2)
            for i in range(oh):
                for j in range(ow):
                    blockm = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                  xs[j]:max(xs[j + 1], xs[j] + 1)]
                    small[i, j] = float(blockm.mean())
            feats.append(small.flatten().tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class SampleFrames:
    """Video frame sampling stub: emits every-N 'frame' payload slices
    with deterministic offsets (real impl would call ffmpeg)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        out_id, out_ts, out_bytes = [], [], []
        for mid, data, dur in zip(ids, payloads, durs):
            data = data or b""
            for ts in range(0, max(dur or 0, 1), self.every_ms):
                lo = (ts * 31) % max(len(data), 1)
                out_id.append(mid)
                out_ts.append(ts)
                out_bytes.append(data[lo:lo + 64])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.string()),
                "frame_ts_ms": pa.array(out_ts, pa.int32()),
                "frame": pa.array(out_bytes, pa.binary()),
            }
        )


def decode_images(ds, concurrency: int = 2, batch_size: int = 64,
                  out_size: tuple[int, int] = (8, 8)):
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"out_size": out_size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds, concurrency: int = 2, batch_size: int = 32,
                  every_ms: int = 1000):
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def build_media_fixture(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media table for tests (binary payloads derived
    from sha256, typed metadata)."""
    ids, kinds, payloads, mimes, ws, hs, durs = [], [], [], [], [], [], []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ("image", "audio", "video")[i % 3]
        ids.append(f"m{i}")
        kinds.append(kind)
        payloads.append(h * (8 + i % 5))
        mimes.append({"image": "image/png", "audio": "audio/wav",
                      "video": "video/mp4"}[kind])
        ws.append(32 + (i % 4) * 16 if kind == "image" else 0)
        hs.append(24 + (i % 3) * 16 if kind == "image" else 0)
        durs.append(3000 + 500 * (i % 7) if kind != "image" else 0)
    return pa.table(
        {
            "media_id": pa.array(ids), "kind": pa.array(kinds),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )
