"""Deduplication operators over a documents table — the large-scale
training-data-pipeline extensions (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

All stages follow the Ray-Data-first pattern: per-batch vectorized
signature computation in ``map_batches``, explode to (bucket, id) rows,
shuffle once via ``groupby``, verify candidates, resolve clusters.
The reference only has exact/keyed dedup (scripts/clean_and_parse.py:
264-273) and a sampled notebook Jaccard (SURVEY §2.7 D4); these
generalize it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------------
# shingling / hashing helpers (pure, deterministic)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _stable64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def char_shingles(text: str, k: int = 3) -> set[str]:
    t = " ".join((text or "").lower().split())
    if len(t) < k:
        return {t} if t else set()
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = char_shingles(a, k), char_shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, num_perm: int, params, k: int = 3) -> np.ndarray:
    """num_perm minima of (a*h+b) mod p over the shingle hashes."""
    a, b = params
    sh = char_shingles(text, k)
    if not sh:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    hv = np.array([_stable64(s) % _MERSENNE for s in sorted(sh)],
                  dtype=np.uint64)
    # (num_perm, n) without materializing python loops
    prod = (np.outer(a, hv) + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weight 1)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in (text or "").lower().split():
        h = _stable64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------

def dedup_exact_text(ds, text_col: str, id_col: str):
    """Exact dedup: keep the min-id row per identical text. Shuffle is
    on a sha1 of the text (short key), not the text itself."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = [hashlib.sha1((t or "").encode("utf-8")).hexdigest()
              for t in texts]
        return batch.append_column("_text_sha", pa.array(hs, pa.string()))

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1).drop(columns=["_text_sha"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_text_sha")
        .map_groups(first, batch_format="pandas")
    )


def minhash_lsh_pairs(ds, text_col: str, id_col: str,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8,
                      seed: int = 42):
    """MinHash + LSH near-duplicate candidate generation + exact-Jaccard
    verification. Returns a Dataset of (left_id, right_id, jaccard).

    shingle -> minhash (per batch, vectorized) -> explode to
    (band, band_hash, id, text) -> groupby band bucket -> within-bucket
    pairs verified with exact n-gram Jaccard (dedup vs threshold).
    """
    rows_per_band = num_perm // bands
    params = _minhash_params(num_perm, seed)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_band, out_hash, out_id, out_text, out_all = [], [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(t, num_perm, params, shingle_k)
            hashes = [
                hashlib.blake2b(
                    sig[b * rows_per_band:(b + 1) * rows_per_band].tobytes(),
                    digest_size=8).hexdigest()
                for b in range(bands)
            ]
            for b in range(bands):
                out_band.append(b)
                out_hash.append(hashes[b])
                out_id.append(str(i))
                out_text.append(t)
                out_all.append(hashes)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_id, pa.string()),
                "text": pa.array(out_text, pa.string()),
                "all_hashes": pa.array(out_all, pa.list_(pa.string())),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    # One shuffle; each pair is verified exactly once globally: a pair
    # agreeing in several bands is emitted only by its FIRST agreeing
    # band (checked against the carried per-doc band-hash lists).
    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").drop_duplicates("doc_id")
        band = int(g["band"].iloc[0])
        ids = list(g["doc_id"])
        texts = list(g["text"])
        allh = [list(h) for h in g["all_hashes"]]
        shingles = [None] * len(ids)

        def sh(i):
            if shingles[i] is None:
                shingles[i] = char_shingles(texts[i], shingle_k)
            return shingles[i]

        left, right, jac = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if any(allh[i][b] == allh[j][b] for b in range(band)):
                    continue  # an earlier band already owns this pair
                a, b = sh(i), sh(j)
                la, lb = len(a), len(b)
                if la and lb and min(la, lb) / max(la, lb) < jaccard_threshold:
                    continue  # size-ratio upper bound on Jaccard
                inter = len(a & b)
                union = la + lb - inter
                v = 1.0 if union == 0 else inter / union
                if v >= jaccard_threshold:
                    left.append(ids[i])
                    right.append(ids[j])
                    jac.append(v)
        return pd.DataFrame(
            {
                "left_id": pd.Series(left, dtype="object"),
                "right_id": pd.Series(right, dtype="object"),
                "jaccard": pd.Series(jac, dtype="float64"),
            }
        )

    return banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )


def simhash_pairs(ds, text_col: str, id_col: str,
                  max_hamming: int = 3, prefix_bits: int = 16):
    """SimHash near-dup: bucket on each of 4 16-bit bands (any band
    equal -> candidate, standard Charikar blocking), verify Hamming
    distance <= max_hamming."""

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        ob, oh, oi, osim = [], [], [], []
        for i, t in zip(ids, texts):
            sh = simhash64(t or "")
            for b in range(4):
                ob.append(b)
                oh.append((sh >> (16 * b)) & 0xFFFF)
                oi.append(str(i))
                osim.append(sh)
        return pa.table(
            {
                "band": pa.array(ob, pa.int32()),
                "band_val": pa.array(oh, pa.int64()),
                "doc_id": pa.array(oi, pa.string()),
                "simhash": pa.array(osim, pa.uint64()),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").drop_duplicates("doc_id")
        ids = list(g["doc_id"])
        sims = [int(s) for s in g["simhash"]]
        left, right, ham = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = hamming64(sims[i], sims[j])
                if d <= max_hamming:
                    left.append(ids[i])
                    right.append(ids[j])
                    ham.append(d)
        return pd.DataFrame(
            {
                "left_id": pd.Series(left, dtype="object"),
                "right_id": pd.Series(right, dtype="object"),
                "hamming": pd.Series(ham, dtype="int64"),
            }
        )

    pairs = banded.groupby(["band", "band_val"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    def pick_one(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    return pairs.groupby(["left_id", "right_id"]).map_groups(
        pick_one, batch_format="pandas"
    )


def embedding_near_dup_pairs(ds, vec_col: str, id_col: str,
                             cos_threshold: float = 0.95,
                             num_buckets: int = 16, seed: int = 42,
                             dim: int | None = None):
    """Embedding-cosine near-dup via random-hyperplane LSH bucketing
    (sign of r·v picks the bucket bits) + exact cosine verification
    inside each bucket. Neighbouring docs land in the same bucket with
    probability (1 - theta/pi)^bits."""
    bits = max(1, int(np.log2(num_buckets)))

    def infer_dim() -> int:
        first = ds.take(1)[0]
        return len(first[vec_col])

    d = dim or infer_dim()
    rng = np.random.RandomState(seed)
    planes = rng.randn(bits, d)

    def to_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        signs = (vecs @ planes.T) > 0
        bucket = signs @ (1 << np.arange(bits))
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                "doc_id": pa.array([str(i) for i in ids], pa.string()),
                "vec": pa.array([list(map(float, v)) for v in vecs],
                                pa.list_(pa.float64())),
            }
        )

    bucketed = ds.map_batches(to_bucket, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").drop_duplicates("doc_id")
        ids = list(g["doc_id"])
        mat = np.array(list(g["vec"]), dtype=np.float64)
        if len(ids) < 2:
            return pd.DataFrame({
                "left_id": pd.Series([], dtype="object"),
                "right_id": pd.Series([], dtype="object"),
                "cosine": pd.Series([], dtype="float64"),
            })
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        sim = unit @ unit.T
        left, right, cos = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sim[i, j] >= cos_threshold:
                    left.append(ids[i])
                    right.append(ids[j])
                    cos.append(float(sim[i, j]))
        return pd.DataFrame(
            {
                "left_id": pd.Series(left, dtype="object"),
                "right_id": pd.Series(right, dtype="object"),
                "cosine": pd.Series(cos, dtype="float64"),
            }
        )

    return bucketed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    )
