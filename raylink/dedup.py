"""Deduplication operators over a documents table — the large-scale
training-data-pipeline extensions (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

All stages follow the Ray-Data-first pattern: per-batch vectorized
signature computation in ``map_batches``, explode to SMALL
(bucket, id, signature) rows — never the document payload — shuffle
once via a hash-bucketed ``groupby``, derive candidate pairs with
first-agreeing-band ownership (each pair emitted exactly once, no
pair-dedup shuffle), then fetch payloads for the (much smaller)
candidate set via ONE hash join and verify exactly.

The reference only has exact/keyed dedup (scripts/clean_and_parse.py:
264-273) and a sampled notebook Jaccard (SURVEY §2.7 D4); these
generalize it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# shingling / hashing helpers (pure, deterministic)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _stable64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    )


def _md5_64(s: str) -> int:
    """First 8 bytes (big-endian) of md5 — chosen over blake2b for the
    SimHash token hash because DuckDB can replicate it exactly:
    ``('0x' || substr(md5(tok), 1, 16))::UBIGINT`` — which makes the
    whole SimHash operator SQL-oracle-checkable."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


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


_FNV_PRIME = np.uint64(1099511628211)
_FNV_BASIS = np.uint64(0xCBF29CE484222325)


def _avalanche64(x: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer — vectorized 64-bit avalanche (public mixing
    constants; uint64 arithmetic wraps, which is the intent)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Unique 64-bit hashes (mod Mersenne-61) of the k-char shingles of
    the whitespace-normalized lowercased text — the vectorized
    replacement for the round-2 per-shingle ``blake2b`` Python loop
    (VERDICT r2 #1): codepoints via one utf-32 decode, shingles as a
    sliding polynomial over a numpy window, one avalanche pass.
    Hash IDENTITY differs from round 2; only LSH recall depends on it
    (the exact-Jaccard verify and the SQL oracle hash nothing)."""
    t = " ".join((text or "").lower().split())
    if not t:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if len(cp) < k:
        code = _FNV_BASIS
        for c in cp.tolist():
            code = np.uint64((int(code) ^ c) * int(_FNV_PRIME)
                             & 0xFFFFFFFFFFFFFFFF)
        codes = np.array([code], dtype=np.uint64)
    else:
        w = np.lib.stride_tricks.sliding_window_view(cp, k)
        codes = np.full(len(w), _FNV_BASIS, dtype=np.uint64)
        for j in range(k):
            codes = (codes ^ w[:, j]) * _FNV_PRIME
        codes = np.unique(codes)
    return _avalanche64(codes) % _MERSENNE


def minhash_signature(text: str, num_perm: int, params, k: int = 3) -> np.ndarray:
    """num_perm minima of (a*h+b) mod p over the shingle hashes."""
    a, b = params
    hv = _shingle_hashes(text, k)
    if hv.size == 0:
        return np.full(num_perm, _MERSENNE, dtype=np.uint64)
    prod = (np.outer(a, hv) + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def minhash_signatures_batch(texts: list, num_perm: int, params,
                             k: int = 3, perm_chunk: int = 8):
    """Signatures for a whole batch: one concatenated shingle-hash
    array, permutations applied ``perm_chunk`` at a time (bounds peak
    memory at perm_chunk x total-shingles x 8 B), per-document minima
    via ``np.minimum.reduceat`` — no per-document permutation loop.
    Returns (sigs (n, num_perm) uint64, n_shingles (n,) int64)."""
    a, b = params
    n = len(texts)
    per_doc = [_shingle_hashes(t, k) for t in texts]
    lens = np.array([len(h) for h in per_doc], dtype=np.int64)
    sigs = np.full((n, num_perm), _MERSENNE, dtype=np.uint64)
    nonempty = np.flatnonzero(lens > 0)
    if nonempty.size:
        allh = np.concatenate([per_doc[i] for i in nonempty])
        offsets = np.zeros(nonempty.size, dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=offsets[1:])
        for p0 in range(0, num_perm, perm_chunk):
            p1 = min(p0 + perm_chunk, num_perm)
            prod = (a[p0:p1, None] * allh[None, :] + b[p0:p1, None]) \
                % _MERSENNE
            mins = np.minimum.reduceat(prod, offsets, axis=1)
            sigs[nonempty, p0:p1] = mins.T
    return sigs, lens


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens, weight = occurrence count.
    Token hash is md5-derived (see :func:`_md5_64`) so the operator has
    an exact DuckDB SQL oracle."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    from collections import Counter

    cnt = Counter(toks)
    hs = np.array([_md5_64(t) for t in cnt], dtype=np.uint64)
    w = np.array(list(cnt.values()), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts[None, :]) & 1).astype(np.int64)
    acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    packed = np.left_shift((acc > 0).astype(np.uint64), shifts)
    return int(packed.sum(dtype=np.uint64))


def simhash64_batch(texts) -> np.ndarray:
    """Batched :func:`simhash64` (VERDICT r3 #9): md5 runs ONCE per
    UNIQUE token of the whole batch (the same fold
    ``minhash_signatures_batch`` does for shingles) instead of once per
    token per document; the bit accumulation is a numpy ``reduceat``
    over per-doc occurrence runs, chunked 16 bits at a time to bound
    peak memory at ~occurrences x 16 x 4 B. Bit-identical to the scalar
    kernel (weight-by-count == sum over occurrences; tested)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    tok_all: list[str] = []
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        lens[i] = len(toks)
        tok_all.extend(toks)
    if not tok_all:
        return out
    uniq, inv = np.unique(np.asarray(tok_all, dtype=object),
                          return_inverse=True)
    uhash = np.fromiter((_md5_64(t) for t in uniq), dtype=np.uint64,
                        count=len(uniq))
    hs = uhash[inv]
    nonempty = np.flatnonzero(lens > 0)
    offsets = np.zeros(nonempty.size, dtype=np.int64)
    np.cumsum(lens[nonempty][:-1], out=offsets[1:])
    packed = np.zeros(nonempty.size, dtype=np.uint64)
    for s0 in range(0, 64, 16):
        shifts = np.arange(s0, s0 + 16, dtype=np.uint64)
        bits = ((hs[:, None] >> shifts[None, :]) & 1).astype(np.int32)
        acc = np.add.reduceat(bits * 2 - 1, offsets, axis=0)
        packed |= ((acc > 0).astype(np.uint64)
                   << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------------------
# Dataset-level operators
# ---------------------------------------------------------------------------

def dedup_exact_text(ds, text_col: str, id_col: str,
                     num_group_buckets: int = 512):
    """Exact dedup: keep the min-id row per identical text. Shuffle is
    on a sha1 of the text (short key); groups are hash BUCKETS of shas
    (bounded count), resolved with one vectorized sort +
    drop_duplicates per bucket — not one pandas group per distinct
    text."""

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = [hashlib.sha1((t or "").encode("utf-8")).hexdigest()
              for t in texts]
        tb = [int(h[:8], 16) % num_group_buckets for h in hs]
        return batch.append_column(
            "_text_sha", pa.array(hs, pa.string())
        ).append_column("_tb", pa.array(tb, pa.int32()))

    def first_per_sha(bucket: pa.Table) -> pa.Table:
        if "_text_sha" not in bucket.column_names or bucket.num_rows == 0:
            return (bucket.drop_columns(
                [c for c in ("_text_sha", "_tb")
                 if c in bucket.column_names]))
        # pandas sees ONLY (row index, id, sha); the winning rows are
        # reassembled with Arrow take so a genuinely-null int64 payload
        # column can't float64-promote (lossy past 2^53) and empty
        # buckets can't emit a different schema (code-review r5)
        import numpy as np
        import pandas as pd

        df = pd.DataFrame({
            "_i": np.arange(bucket.num_rows, dtype=np.int64),
            "_id": np.asarray(bucket.column(id_col)),
            "_sha": np.asarray(bucket.column("_text_sha")),
        })
        keep = (df.sort_values("_id").drop_duplicates("_sha", keep="first")
                ["_i"].to_numpy())
        keep.sort()
        return bucket.take(pa.array(keep)).drop_columns(
            ["_text_sha", "_tb"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("_tb")
        .map_groups(first_per_sha, batch_format="pyarrow")
    )


def _join_partitions(requested: int | None) -> int:
    from .joins import join_partitions

    return join_partitions(requested)


def _pairs_via_payload_join(cands, ds, id_col: str, payload_col: str,
                            pair_fn, out_col: str,
                            out_type: pa.DataType = None,
                            num_partitions: int | None = None,
                            payload_to_binary: bool = False,
                            max_broadcast_pairs: int = 2_000_000,
                            max_broadcast_bytes: int = 1 << 30):
    """Fetch per-candidate-pair payloads with TWO id-keyed hash joins
    (left payload, then right payload) and verify in a streaming
    ``map_batches``.

    r3 redesign: the round-2 shape (explode each pair x2 -> one join ->
    groupby(pair-bucket) -> reassemble the two halves) spent ~40 s of
    orchestration at sf0.1 for ~1 s of verify compute — the
    pair-reassembly groupby is a second all-to-all carrying payload
    bytes, plus a per-row halves dict. Two joins keyed directly on the
    doc id move comparable bytes (the corpus (id, payload) projection
    is scanned once per side; cheaper at scale than materializing it),
    need no reassembly shuffle, and end in a stateless streaming
    verify.

    ``payload_to_binary``: Acero hash joins reject list-typed non-key
    columns, so vector payloads are shipped as float64 little-endian
    bytes (decode with ``np.frombuffer``) — also a denser wire format
    than list<double>.

    Null payloads are coalesced to empty ("" / b"") so a null-text doc
    behaves exactly like an empty-text doc (two null-text docs emit
    jaccard 1.0, matching the SQL oracle's trim()-based prep — ADVICE
    r2 #2); ids absent from the corpus still drop via the inner join.

    ``pair_fn(left_id, left_payload, right_id, right_payload, cache)``
    returns the verified score or None to reject; ``cache`` is a
    per-batch dict for memoizing per-doc derived state (e.g. shingle
    sets).

    Adaptive broadcast fast path: when the candidate set is small
    (``<= max_broadcast_pairs`` pairs AND the candidate docs' payloads
    fit in ``max_broadcast_bytes``), payloads are fetched with ONE
    streaming filtered scan of the corpus (no shuffle at all),
    ``ray.put`` once, and verified in a single map over the pairs —
    measured 15.4 s (two joins) -> ~4 s at sf0.1. Larger candidate sets
    fall back to the two-join shuffle path automatically; both paths
    share identical null/absent-id semantics.

    CONTRACT (ADVICE r3): ``id_col`` must be unique in ``ds``. A
    duplicate id would make the two paths diverge (the joins emit one
    verified row per payload COMBINATION; the broadcast keeps one
    payload per id). The broadcast path detects duplicates during its
    payload scan and raises; the join path cannot check for free and
    trusts the contract."""
    import pyarrow.compute as pc

    out_type = out_type or pa.float64()
    nparts = _join_partitions(num_partitions)

    def proj(doc_name: str, pay_name: str):
        def f(t: pa.Table) -> pa.Table:
            col = t.column(payload_col)
            if payload_to_binary:
                col = pa.array(
                    [b"" if v is None else
                     np.asarray(v, dtype=np.float64).tobytes()
                     for v in col.to_pylist()], pa.binary())
            else:
                col = pc.fill_null(col.combine_chunks().cast(pa.string()),
                                   "")
            return pa.table({
                doc_name: t.column(id_col).cast(pa.string()),
                pay_name: col,
            })
        return f

    # ensure_arrow: empty candidate blocks skip upstream UDFs (Ray
    # passes empty blocks through) and would reach the join with a
    # mismatched schema; rebuild the (small) candidate set from
    # non-empty blocks with a pinned schema
    from .blocks import ensure_arrow

    cand_schema = pa.schema([("left_id", pa.string()),
                             ("right_id", pa.string())])
    cands = ensure_arrow(cands, schema=cand_schema)

    def verify_rows(lids, rids, lpays, rpays):
        cache: dict = {}
        ol, orr, ov = [], [], []
        for lid, rid, pl, pr in zip(lids, rids, lpays, rpays):
            v = pair_fn(lid, pl, rid, pr, cache)
            if v is not None:
                ol.append(lid)
                orr.append(rid)
                ov.append(v)
        return pa.table({"left_id": pa.array(ol, pa.string()),
                         "right_id": pa.array(orr, pa.string()),
                         out_col: pa.array(ov, out_type)})

    broadcast = _broadcast_payload_map(
        cands, ds, id_col, payload_col, payload_to_binary,
        max_pairs=max_broadcast_pairs, max_bytes=max_broadcast_bytes)
    if broadcast is not None:
        import ray

        payref = ray.put(broadcast)

        def verify_b(t: pa.Table) -> pa.Table:
            m = ray.get(payref)
            lids, rids, lp, rp = [], [], [], []
            for lid, rid in zip(t.column("left_id").to_pylist(),
                                t.column("right_id").to_pylist()):
                pl = m.get(lid)
                pr = m.get(rid)
                if pl is None or pr is None:
                    continue  # id absent from the corpus projection
                lids.append(lid)
                rids.append(rid)
                lp.append(pl)
                rp.append(pr)
            return verify_rows(lids, rids, lp, rp)

        return cands.map_batches(verify_b, batch_format="pyarrow")

    left_pay = ds.map_batches(proj("_ldoc", "_lpay"),
                              batch_format="pyarrow")
    right_pay = ds.map_batches(proj("_rdoc", "_rpay"),
                               batch_format="pyarrow")
    j = cands.join(left_pay, join_type="inner", num_partitions=nparts,
                   on=("left_id",), right_on=("_ldoc",))
    j = j.join(right_pay, join_type="inner", num_partitions=nparts,
               on=("right_id",), right_on=("_rdoc",))

    def verify(t: pa.Table) -> pa.Table:
        return verify_rows(t.column("left_id").to_pylist(),
                           t.column("right_id").to_pylist(),
                           t.column("_lpay").to_pylist(),
                           t.column("_rpay").to_pylist())

    return j.map_batches(verify, batch_format="pyarrow")


def _broadcast_payload_map(cands, ds, id_col: str, payload_col: str,
                           payload_to_binary: bool,
                           max_pairs: int, max_bytes: int):
    """Payload dict {doc_id: payload} for the candidate docs, or None
    when the candidate set is too large to broadcast (caller falls back
    to the shuffle-join path). Null payloads are coalesced to ""/b"" so
    a missing dict entry means exactly "id absent from the corpus".
    Driver memory is bounded: at most ``max_pairs`` pair rows are
    scanned for ids, and the payload collect aborts (returns None) the
    moment it exceeds ``max_bytes``."""
    import pyarrow.compute as pc
    import ray

    n_pairs = cands.count()
    if n_pairs > max_pairs:
        return None
    ids: set = set()
    for b in cands.iter_batches(batch_format="pyarrow"):
        ids.update(b.column("left_id").to_pylist())
        ids.update(b.column("right_id").to_pylist())
    if not ids:
        return {}
    idref = ray.put(pa.array(sorted(ids), pa.string()))

    def filt(t: pa.Table) -> pa.Table:
        key = t.column(id_col).cast(pa.string())
        mask = pc.fill_null(pc.is_in(key, value_set=ray.get(idref)), False)
        t = t.filter(mask)
        col = t.column(payload_col)
        if payload_to_binary:
            col = pa.array(
                [b"" if v is None else
                 np.asarray(v, dtype=np.float64).tobytes()
                 for v in col.to_pylist()], pa.binary())
        else:
            col = pc.fill_null(col.combine_chunks().cast(pa.string()), "")
        return pa.table({"_doc": t.column(id_col).cast(pa.string()),
                         "_pay": col})

    mapping: dict = {}
    total = 0
    for b in ds.map_batches(filt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        total += b.nbytes
        if total > max_bytes:
            return None
        for d, p in zip(b.column("_doc").to_pylist(),
                        b.column("_pay").to_pylist()):
            if d in mapping:
                # id-uniqueness contract violation (ADVICE r3): a
                # duplicate id would silently pick one payload here but
                # one row per combination on the join path
                raise ValueError(
                    f"duplicate id {d!r} in corpus — near-dup "
                    f"verification requires unique ids")
            mapping[d] = p
    return mapping


def minhash_lsh_pairs(ds, text_col: str, id_col: str,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8,
                      seed: int = 42, num_group_buckets: int = 1024,
                      join_partitions: int | None = None):
    """MinHash + LSH near-duplicate candidate generation + exact-Jaccard
    verification. Returns a Dataset of (left_id, right_id, jaccard).

    Scale shape (VERDICT r1 #3): the banded explode ships ONLY
    (band, band_hash, doc_id, signature bytes, shingle count) — ~550
    bytes per doc per band independent of document size; round 1
    carried the full text once per band (bands x corpus shuffle bytes).
    Candidate pairs are derived signature-only: a pair is OWNED by its
    first agreeing band (band slices compared directly on the carried
    signature — no pair-dedup shuffle), pregated on the shingle-count
    size ratio AND on the unbiased signature estimate of Jaccard
    (fraction of agreeing components, sigma = sqrt(j(1-j)/num_perm));
    pairs estimated more than ``sig_margin_sigmas`` sigmas below the
    threshold are dropped before the join. Texts for the surviving
    candidates are fetched via ONE hash join (corpus shuffled once) and
    exact char-shingle Jaccard decides at the threshold. Measured at
    sf0.1 (5000 synthetic docs whose background similarity ~0.5 sits
    near the 0.85 threshold — worst case for the 16x4 S-curve): 78s
    unpregated (2.9M candidate pairs through the join) -> 29s with the
    signature pregate (~40k pairs); round-1 text-carrying version was
    9.7s at this toy scale but shipped 16x corpus bytes.
    """
    rows_per_band = num_perm // bands
    params = _minhash_params(num_perm, seed)
    sig_margin_sigmas = 4.0
    est_cutoff = max(0.0, jaccard_threshold - sig_margin_sigmas * float(
        np.sqrt(jaccard_threshold * (1 - jaccard_threshold) / num_perm)))

    def to_bands(batch: pa.Table) -> pa.Table:
        """Vectorized band explode (VERDICT r2 #1): batch signatures via
        ``minhash_signatures_batch``, band hashes as an avalanched
        polynomial fold of each band's components (numpy, no per-band
        blake2b), output arrays built with repeat/tile + one take."""
        import pyarrow.compute as pc

        ids = batch.column(id_col).cast(pa.string()).combine_chunks()
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        sigs, nsh = minhash_signatures_batch(texts, num_perm, params,
                                             shingle_k)
        sigr = sigs.reshape(n, bands, rows_per_band)
        bh = np.zeros((n, bands), dtype=np.uint64)
        for j in range(rows_per_band):
            bh = bh * np.uint64(0x9E3779B97F4A7C15) + sigr[:, :, j]
        bh = _avalanche64(bh.ravel()).reshape(n, bands)
        band_ids = np.arange(bands, dtype=np.uint64)
        cb = ((bh ^ (band_ids[None, :] * np.uint64(0x9E3779B97F4A7C15)))
              % np.uint64(num_group_buckets)).astype(np.int32)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
        rowbytes = np.array([sigs[i].tobytes() for i in range(n)],
                            dtype=object)
        return pa.table(
            {
                "band": pa.array(np.tile(band_ids.astype(np.int32), n)),
                "band_hash": pa.array(bh.ravel()),
                "doc_id": pc.take(ids, pa.array(doc_idx)),
                "sig": pa.array(rowbytes[doc_idx], pa.binary()),
                "n_sh": pa.array(np.repeat(nsh, bands)),
                "_cb": pa.array(cb.ravel()),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    # one shuffle into <= num_group_buckets groups; (band, band_hash)
    # sub-buckets are dict-grouped inside the function (per-group pandas
    # overhead at one group per band hash was the round-1 pitfall)
    def _sub_bucket_pairs(ids, sigs: np.ndarray, nsh: np.ndarray,
                          band: int, left: list, right: list,
                          chunk: int = 128):
        """Vectorized pair scan for one (band, band_hash) sub-bucket:
        component equality, band ownership, size-ratio and estimate
        pregates all evaluated as numpy masks — no per-pair Python.
        Row-chunked so peak memory is chunk x n x num_perm bools."""
        n = len(ids)
        sigr = sigs.reshape(n, bands, rows_per_band)
        nsh_min = np.minimum(nsh[:, None], nsh[None, :])
        nsh_max = np.maximum(nsh[:, None], nsh[None, :])
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio_ok = np.where(
                nsh_min > 0, nsh_min / np.maximum(nsh_max, 1)
                >= jaccard_threshold, True)
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            cmp = sigr[i0:i1, None, :, :] == sigr[None, :, :, :]
            band_eq = cmp.all(axis=3)                    # (c, n, bands)
            est = cmp.reshape(i1 - i0, n, num_perm).mean(axis=2)
            first_band = np.argmax(band_eq, axis=2)      # first True index
            own = band_eq.any(axis=2) & (first_band == band)
            mask = (own & (est >= est_cutoff) & ratio_ok[i0:i1]
                    & (np.arange(n)[None, :] > np.arange(i0, i1)[:, None]))
            for x, y in np.argwhere(mask):
                left.append(ids[i0 + x])
                right.append(ids[y])

    def bucket_candidates(g: pa.Table) -> pa.Table:
        empty = pa.table({"left_id": pa.array([], pa.string()),
                          "right_id": pa.array([], pa.string())})
        if "band_hash" not in g.column_names or g.num_rows == 0:
            return empty
        bandv = g.column("band").to_pylist()
        hashv = g.column("band_hash").to_pylist()
        idv = g.column("doc_id").to_pylist()
        sigv = g.column("sig").to_pylist()
        nshv = g.column("n_sh").to_pylist()
        subs: dict[tuple, dict] = {}
        for b, h, i, sg, ns in zip(bandv, hashv, idv, sigv, nshv):
            subs.setdefault((b, h), {})[i] = (sg, ns)
        left: list = []
        right: list = []
        for (band, _h), docs in subs.items():
            if len(docs) < 2:
                continue
            ids = sorted(docs)
            sigs = np.stack([np.frombuffer(docs[i][0], dtype=np.uint64)
                             for i in ids])
            nsh = np.array([docs[i][1] for i in ids], dtype=np.float64)
            _sub_bucket_pairs(ids, sigs, nsh, band, left, right)
        return pa.table({"left_id": pa.array(left, pa.string()),
                         "right_id": pa.array(right, pa.string())})

    cands = banded.groupby("_cb").map_groups(
        bucket_candidates, batch_format="pyarrow")

    def verify(lid, ltext, rid, rtext, cache):
        sa = cache.get(lid)
        if sa is None:
            sa = cache[lid] = char_shingles(ltext, shingle_k)
        sb = cache.get(rid)
        if sb is None:
            sb = cache[rid] = char_shingles(rtext, shingle_k)
        if not sa and not sb:
            v = 1.0
        elif not sa or not sb:
            v = 0.0
        else:
            inter = len(sa & sb)
            v = inter / (len(sa) + len(sb) - inter)
        return v if v >= jaccard_threshold else None

    return _pairs_via_payload_join(
        cands, ds, id_col, text_col, verify, "jaccard",
        num_partitions=join_partitions)


def simhash_pairs(ds, text_col: str, id_col: str,
                  max_hamming: int = 3, num_group_buckets: int = 1024):
    """SimHash near-dup: bucket on each of 4 16-bit bands (any band
    equal -> candidate, standard Charikar blocking), verify Hamming
    distance <= max_hamming. With max_hamming <= 3 < 4 bands, the
    pigeonhole principle makes recall exactly 1.0: three differing bits
    can touch at most three bands, so one band always agrees — the
    operator has an exact SQL oracle (bit_count(xor(a,b)) <= 3).

    Pair ownership (VERDICT r1 #4): a pair agreeing in several bands is
    emitted only by its FIRST agreeing band — decided locally from the
    two simhashes (xor has a zero 16-bit chunk iff that band agrees),
    so the round-1 per-pair dedup shuffle (one pandas group per
    candidate pair) is gone entirely."""

    def to_bands(batch: pa.Table) -> pa.Table:
        # batched signature kernel (md5 once per unique batch token)
        # + fully vectorized 4-way band explode; the shuffle bucket _cb
        # is an internal placement key (free to change as long as equal
        # (band, band_val) collide), so it uses a C-level hash instead
        # of the old per-row Python fnv
        import pandas as pd

        ids = np.asarray(batch.column(id_col).cast(pa.string()))
        sh = simhash64_batch(batch.column(text_col).to_pylist())
        n = len(sh)
        bands = np.repeat(np.arange(4, dtype=np.int32), n)
        sh4 = np.tile(sh, 4)
        band_val = ((sh4 >> (16 * bands.astype(np.uint64)))
                    & np.uint64(0xFFFF)).astype(np.int64)
        mix = (band_val.astype(np.uint64) << np.uint64(2)) \
            | bands.astype(np.uint64)
        cb = (pd.util.hash_array(mix)
              % np.uint64(num_group_buckets)).astype(np.int32)
        return pa.table(
            {
                "band": pa.array(bands),
                "band_val": pa.array(band_val),
                "doc_id": pa.array(np.tile(ids, 4), pa.string()),
                "simhash": pa.array(sh4),
                "_cb": pa.array(cb),
            }
        )

    banded = ds.map_batches(to_bands, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"left_id": pa.array([], pa.string()),
                          "right_id": pa.array([], pa.string()),
                          "hamming": pa.array([], pa.int64())})
        if "band_val" not in g.column_names or g.num_rows == 0:
            return empty
        bandv = g.column("band").to_pylist()
        valv = g.column("band_val").to_pylist()
        idv = g.column("doc_id").to_pylist()
        simv = g.column("simhash").to_pylist()
        subs: dict[tuple, dict] = {}
        for b, v, i, s in zip(bandv, valv, idv, simv):
            subs.setdefault((b, v), {})[i] = int(s)
        left, right, ham = [], [], []
        for (band, _v), docs in subs.items():
            if len(docs) < 2:
                continue
            ids = sorted(docs)
            for x in range(len(ids)):
                sx = docs[ids[x]]
                for y in range(x + 1, len(ids)):
                    xo = sx ^ docs[ids[y]]
                    if any((xo >> (16 * bp)) & 0xFFFF == 0
                           for bp in range(band)):
                        continue  # an earlier band owns this pair
                    d = bin(xo).count("1")
                    if d <= max_hamming:
                        left.append(ids[x])
                        right.append(ids[y])
                        ham.append(d)
        return pa.table({"left_id": pa.array(left, pa.string()),
                         "right_id": pa.array(right, pa.string()),
                         "hamming": pa.array(ham, pa.int64())})

    return banded.groupby("_cb").map_groups(
        bucket_pairs, batch_format="pyarrow")


def embedding_near_dup_pairs(ds, vec_col: str, id_col: str,
                             cos_threshold: float = 0.95,
                             num_hyperplanes: int = 8,
                             num_tables: int = 8, seed: int = 42,
                             dim: int | None = None,
                             max_bucket_rows: int = 200_000,
                             num_group_buckets: int = 1024,
                             join_partitions: int | None = None):
    """Embedding-cosine near-dup via multi-table random-hyperplane LSH
    + exact cosine verification of the candidate set.

    Recall math: a pair at angle theta lands in the same bucket of one
    table with p = (1 - theta/pi)^num_hyperplanes; across T
    OR-amplified tables the pair is found with 1 - (1-p)^T. At the
    defaults (8 planes x 8 tables) a cos>=0.95 pair (theta=0.101*pi)
    is found with probability ~0.99; raise num_tables for tighter
    recall, num_hyperplanes for smaller buckets. Measured recall on the
    embeddings fixture is asserted in
    tests/test_operators.py::test_embedding_near_dup_recall.

    Scale shape (VERDICT r1 #9): vectors are NOT carried through the
    LSH shuffle — only (table, bucket, doc_id, per-doc bucket list)
    rows; candidates use first-agreeing-table ownership; vectors for
    the candidate set are fetched via one hash join. Any (table,
    bucket) group larger than ``max_bucket_rows`` raises instead of
    silently going quadratic (same contract as match.max_block_pairs).
    """
    bits = num_hyperplanes

    def infer_dim() -> int:
        first = ds.take(1)[0]
        return len(first[vec_col])

    d = dim or infer_dim()
    rng = np.random.RandomState(seed)
    planes = rng.randn(num_tables, bits, d)

    def to_tables(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(id_col).cast(pa.string())
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        # (T, n) bucket per table: sign bits packed little-endian
        powers = 1 << np.arange(bits)
        allb = np.empty((num_tables, n), dtype=np.int64)
        for t in range(num_tables):
            signs = (vecs @ planes[t].T) > 0
            allb[t] = signs @ powers
        # vectorized table-major explode (code-review r5: this ran an
        # n x T Python loop with a per-cell f-string FNV — the defect
        # class VERDICT r2 #1 fixed everywhere else). The shuffle
        # bucket only needs identical (table, bucket) rows co-located,
        # so any deterministic mix works: golden-ratio multiply of the
        # table id xor the bucket, finished with fmix64's xor-shifts
        # (candidate-pair OUTPUT is unchanged by construction — the
        # first-agreeing-table ownership reads all_buckets, not _cb).
        ot = np.repeat(np.arange(num_tables, dtype=np.int32), n)
        ob = allb.reshape(-1)
        z = ((ot.astype(np.uint64)
              * np.uint64(0x9E3779B97F4A7C15))
             ^ ob.astype(np.uint64))
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(33)
        ocb = (z % np.uint64(num_group_buckets)).astype(np.int32)
        per_doc = allb.T.tolist()             # one list per doc
        idx = np.tile(np.arange(n, dtype=np.int64), num_tables)
        return pa.table(
            {
                "table": pa.array(ot),
                "bucket": pa.array(ob),
                "doc_id": ids.take(pa.array(idx)),
                "all_buckets": pa.array(per_doc * num_tables,
                                        pa.list_(pa.int64())),
                "_cb": pa.array(ocb),
            }
        )

    tabled = ds.map_batches(to_tables, batch_format="pyarrow")

    def bucket_candidates(g: pa.Table) -> pa.Table:
        empty = pa.table({"left_id": pa.array([], pa.string()),
                          "right_id": pa.array([], pa.string())})
        if "bucket" not in g.column_names or g.num_rows == 0:
            return empty
        tv = g.column("table").to_pylist()
        bv = g.column("bucket").to_pylist()
        iv = g.column("doc_id").to_pylist()
        av = g.column("all_buckets").to_pylist()
        subs: dict[tuple, dict] = {}
        for t, b, i, ab in zip(tv, bv, iv, av):
            subs.setdefault((t, b), {})[i] = ab
        left, right = [], []
        for (t, _b), docs in subs.items():
            if len(docs) < 2:
                continue
            if len(docs) > max_bucket_rows:
                raise ValueError(
                    f"LSH bucket (table={t}) holds {len(docs)} rows "
                    f"> max_bucket_rows={max_bucket_rows}; raise "
                    f"num_hyperplanes or the cap")
            ids = sorted(docs)
            n = len(ids)
            allb = np.array([docs[i] for i in ids], dtype=np.int64)
            # vectorized first-agreeing-table ownership (row-chunked):
            # pair owned here iff no earlier table's buckets agree
            chunk = 256
            for i0 in range(0, n, chunk):
                i1 = min(i0 + chunk, n)
                if t > 0:
                    earlier = (allb[i0:i1, None, :t]
                               == allb[None, :, :t]).any(axis=2)
                else:
                    earlier = np.zeros((i1 - i0, n), dtype=bool)
                mask = (~earlier) & (
                    np.arange(n)[None, :] > np.arange(i0, i1)[:, None])
                for x, y in np.argwhere(mask):
                    left.append(ids[i0 + x])
                    right.append(ids[y])
        return pa.table({"left_id": pa.array(left, pa.string()),
                         "right_id": pa.array(right, pa.string())})

    cands = tabled.groupby("_cb").map_groups(
        bucket_candidates, batch_format="pyarrow")

    def verify(lid, lvec, rid, rvec, cache):
        ua = cache.get(lid)
        if ua is None:
            a = np.frombuffer(lvec, dtype=np.float64)
            na = np.linalg.norm(a)
            ua = cache[lid] = a / na if na else a
        ub = cache.get(rid)
        if ub is None:
            b = np.frombuffer(rvec, dtype=np.float64)
            nb = np.linalg.norm(b)
            ub = cache[rid] = b / nb if nb else b
        v = float(ua @ ub)
        return v if v >= cos_threshold else None

    return _pairs_via_payload_join(
        cands, ds, id_col, vec_col, verify, "cosine",
        num_partitions=join_partitions,
        payload_to_binary=True)


def near_dup_dedup(ds, text_col: str, id_col: str,
                   jaccard_threshold: float = 0.85, **minhash_kwargs):
    """End-to-end near-duplicate REMOVAL — the operator a training-data
    pipeline actually runs: MinHash-LSH candidate pairs (exact-Jaccard
    verified) -> generic distributed connected components over the
    duplicate graph -> keep ONE canonical doc per cluster (the minimum
    id in the engine's string order; zero-pad numeric ids upstream if
    numeric order is wanted) -> broadcast anti-join drops the rest.
    Returns the deduplicated dataset with all original columns."""
    import pyarrow.compute as pc

    from .cluster import connected_components
    from .joins import broadcast_anti_join

    pairs = minhash_lsh_pairs(ds, text_col, id_col,
                              jaccard_threshold=jaccard_threshold,
                              **minhash_kwargs)
    cc = connected_components(pairs)

    def losers(t: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(t["id"], t["cluster_id"]))
        return t.filter(keep).select(["id"])

    non_canonical = cc.map_batches(losers, batch_format="pyarrow")
    return broadcast_anti_join(ds, non_canonical, key=id_col,
                               keys_key="id")


# ---------------------------------------------------------------------------
# zero-copy broadcast membership over 128-bit keys
# ---------------------------------------------------------------------------
#
# Shared by paragraph_dedup's removal broadcast and
# dedup_exact_against's confirmed-dup broadcast: two LEXSORTED uint64
# numpy arrays (high/low key halves) map zero-copy from the object
# store into every worker, where a python set/frozenset would
# deserialize + heap-build per task/actor (measured 86-213 s at 4.3M
# entries for paragraph_dedup's tuple set; the same regression
# reappeared in dedup_exact_against at 1M confirmed shas: 35.1 s vs
# 14.9 s). Probe = searchsorted on hi, then lo within the (tiny)
# hi-equal range.


def _pairset_build(hi: np.ndarray, lo: np.ndarray):
    order = np.lexsort((lo, hi))
    return (np.ascontiguousarray(hi[order]),
            np.ascontiguousarray(lo[order]))


_POS_SALT_HI = np.uint64(0x9E3779B97F4A7C15)
_POS_SALT_LO = np.uint64(0xC2B2AE3D27D4EB4F)


def _fmix64(x: np.ndarray) -> np.ndarray:
    """murmur3 finalizer — a BIJECTION on uint64 (every step is
    invertible), so mixing a value through it never loses identity."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xC4CEB9FE1A85EC53)
        x = x ^ (x >> np.uint64(33))
    return x


def _doc_digests(id_arr) -> tuple[np.ndarray, np.ndarray]:
    """One blake2b-128 per DOC id — the only per-item Python hashing
    left in the (id, pos) slot identity; positions mix in vectorized
    (:func:`_idpos_digest`, VERDICT r4 #4)."""
    vals = id_arr.to_pylist()
    hi = np.empty(len(vals), np.uint64)
    lo = np.empty(len(vals), np.uint64)
    for i, v in enumerate(vals):
        d = hashlib.blake2b(f"{v}".encode("utf-8"),
                            digest_size=16).digest()
        hi[i] = int.from_bytes(d[:8], "big")
        lo[i] = int.from_bytes(d[8:], "big")
    return hi, lo


def _idpos_digest(doc_hi: np.ndarray, doc_lo: np.ndarray,
                  row_idx: np.ndarray, pos) -> tuple[np.ndarray,
                                                     np.ndarray]:
    """(hi, lo) u64 identity of each (id, pos) paragraph slot. For a
    FIXED id the map pos -> hi is injective (pos enters through
    bijective fmix64 steps xor'd onto the id-digest half), so same-doc
    slots can never collide; cross-id slots carry the id's full
    128-bit blake2b digest (birthday odds ~2^-90 at 10^9 slots, the
    same bar as the sha1 paragraph identity). This replaces one
    blake2b per PARAGRAPH on both the ownership and the rebuild side
    with one blake2b per DOC + numpy mixing (VERDICT r4 #4: the two
    per-row hash loops over the same exploded rows are gone)."""
    p = np.asarray(pos, np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        hi = _fmix64(doc_hi[row_idx] ^ _fmix64(p ^ _POS_SALT_HI))
        lo = _fmix64(doc_lo[row_idx] ^ _fmix64(p ^ _POS_SALT_LO))
    return hi, lo


def _pairset_contains(shi: np.ndarray, slo: np.ndarray,
                      hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    left = np.searchsorted(shi, hi, side="left")
    right = np.searchsorted(shi, hi, side="right")
    mask = np.zeros(len(hi), bool)
    for i in np.flatnonzero(right > left):
        s, e = left[i], right[i]
        j = np.searchsorted(slo[s:e], lo[i])
        mask[i] = j < e - s and slo[s + j] == lo[i]
    return mask


# ---------------------------------------------------------------------------
# cross-document paragraph dedup (Dolma / RefinedWeb style)
# ---------------------------------------------------------------------------

def _explode_paragraphs(batch: pa.Table, text_col: str, id_col: str):
    """(ids, pos, paras, row_idx) arrays: text split on '\\n', each
    paragraph trimmed of ' \\t\\r', empties dropped; pos is the 1-based
    index among the SURVIVING paragraphs of its doc (matching the SQL
    twin's ``range(1, len(arr) + 1)`` over the filtered list); row_idx
    is the batch row each paragraph came from."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
    split = pc.split_pattern(s, "\n")
    flat = pc.utf8_trim(pc.list_flatten(split), " \t\r")
    parent = pc.list_parent_indices(split)
    mask = pc.greater(pc.utf8_length(flat), 0)
    paras = flat.filter(mask)
    par = np.asarray(parent.filter(mask)).astype(np.int64)
    pos = (pd.Series(par).groupby(par, sort=False).cumcount()
           .to_numpy() + 1).astype(np.int32)
    ids = batch.column(id_col).take(pa.array(par))
    return ids, pos, paras, par


def paragraph_dedup(ds, text_col: str, id_col: str,
                    num_group_buckets: int = 512,
                    out_text_col: str = "text",
                    max_broadcast_removals: int = 10_000_000,
                    rebuild_concurrency: int | None = None):
    """Cross-document paragraph dedup — the Dolma / RefinedWeb curation
    step the reference has no analogue for: every paragraph that occurs
    more than once ACROSS the corpus is kept only at its globally first
    occurrence (ordered by (id, position)); all later occurrences are
    removed and each doc's text is rebuilt from its surviving
    paragraphs in original order. Returns one row per input doc:
    (id, out_text_col, n_paras, n_removed) — docs whose every paragraph
    was removed (or that had none) come back with text ''.

    Paragraph identity is the first 128 bits of the sha1 of the
    trimmed paragraph (the same sha1-prefix convention as
    :func:`dedup_exact_against`'s confirmed-dup broadcast — birthday
    odds ~2^-68 at 10^9 distinct paragraphs); the SQL twin
    (:func:`paragraph_dedup_sql`) compares the strings themselves.

    CONTRACT: ``id_col`` values must be unique across the corpus (the
    same id-uniqueness contract as the near-dup operators' payload
    join). With duplicated ids the broadcast path cannot tell the kept
    occurrence from the removed one — both rows share the (id, pos)
    digest — and would drop the paragraph from EVERY copy
    (code-review r4); run :func:`dedup_exact_text` on the id first if
    uniqueness is not guaranteed.

    Scale shape — the KEY property is that a doc's paragraphs are
    already co-located (a doc is one row), so only the REMOVAL
    DECISIONS are remote, never the text:
    1. ownership — ships only (id, pos, sha1, slot-digest) rows
       (~76 B/paragraph), co-shuffled into ``num_group_buckets`` sha
       buckets; inside each bucket one vectorized sort + duplicated()
       marks every non-first occurrence. Only the REMOVED rows come
       back — a small fraction for real corpora — already carrying
       their broadcastable (hi, lo) slot digest (r4 #4).
    2. reassembly — the removal rows are broadcast once per actor
       (``ray.put``; bounded by ``max_broadcast_removals``, measured
       ~150 B/row as id-tuple set entries) and each ORIGINAL batch
       rebuilds its own docs in place: zero text shuffle. Past the
       bound it falls back to one id-keyed co-shuffle of (paragraphs ∪
       removals), with the doc universe fused into the paragraph UDF —
       measured 6x slower than the broadcast path at 4.88M docs / 9.8M
       paragraphs / 4.3M removals (a worst-case 44% dup rate), so the
       fallback is for removal sets too big to hold per actor, not a
       peer path.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from .blocks import dataset_schema, stable_hash_array

    sch = dataset_schema(ds)
    if id_col not in sch.names:
        raise ValueError(f"paragraph_dedup: no column {id_col!r}")
    id_type = sch.field(id_col).type
    nb = np.uint64(num_group_buckets)

    # every UDF below emits this exact schema, so 0-row outputs (a
    # batch of paragraph-free docs, a duplicate-free sha bucket) can
    # never poison the union (see raylink/blocks.py module note)
    union_schema = pa.schema([
        (id_col, id_type), ("_pos", pa.int32()),
        ("_para", pa.string()), ("_tag", pa.int8()),
        ("_b", pa.int32())])

    def _tagged(ids, pos, paras, tag_val: int) -> pa.Table:
        n = len(pos)
        b = (stable_hash_array(ids) % nb).astype(np.int32)
        return pa.table({
            id_col: ids,
            "_pos": pa.array(np.asarray(pos, np.int32)),
            "_para": (paras if paras is not None
                      else pa.nulls(n, pa.string())),
            "_tag": pa.array(np.full(n, tag_val, np.int8)),
            "_b": pa.array(b),
        }, schema=union_schema)

    def para_rows(batch: pa.Table) -> pa.Table:
        ids, pos, paras, _ = _explode_paragraphs(batch, text_col,
                                                 id_col)
        return _tagged(ids, pos, paras, 0)

    # -- 1. ownership: (id, pos, sha-prefix, slot-digest, local-first)
    # rows. r5 redesign, measured on the 4.88M-doc / 8.9M-paragraph /
    # 4.1M-removal dup-injected corpus at 32 CPUs:
    #   * the sha travels as its first 128 bits split into two u64
    #     columns (the same sha1-prefix identity convention as
    #     dedup_exact_against's confirmed-dup broadcast) — 24 B/row
    #     less than the 40-char hex AND a numeric per-bucket sort in
    #     resolve instead of a string sort (0.39 s vs 0.64 s / 365k);
    #   * each (id, pos) slot digest is precomputed HERE and carried
    #     through resolve, so neither the removed stream nor the
    #     rebuild pass re-hashes per paragraph — one blake2b per DOC,
    #     positions mixed in vectorized (r4 #4; digest kernel 0.33 s
    #     vs 0.61 s / 365k);
    #   * BATCH-LOCAL PRE-DEDUP: an occurrence that is not its sha's
    #     batch-local (id, pos) minimum can never be the GLOBAL first,
    #     so it is a removal with certainty and bypasses the global
    #     shuffle entirely (`_first` false). Only batch-local firsts
    #     shuffle; the global first among local firsts is the global
    #     first, and non-winning local firsts are the remaining
    #     removals — an exact partition of the removal set. Ownership
    #     phase 30.3 s -> 7.7 s (the shuffle was the whole cost; the
    #     44%-dup corpus halves its input).
    # The tagged stream is materialized ONCE (~100 B/paragraph —
    # digests, never text) so the firsts/definite branches see the
    # SAME batch boundaries; two lazy passes could batch differently
    # and break the local-first invariant.
    sha_schema = pa.schema([
        (id_col, id_type), ("_pos", pa.int32()),
        ("_sh1", pa.uint64()), ("_sh2", pa.uint64()),
        ("_sb", pa.int32()),
        ("_hi", pa.uint64()), ("_lo", pa.uint64()),
        ("_first", pa.bool_())])
    rem_schema = pa.schema(
        list(union_schema)
        + [pa.field("_hi", pa.uint64()), pa.field("_lo", pa.uint64())])

    def sha_rows(batch: pa.Table) -> pa.Table:
        ids, pos, paras, row_idx = _explode_paragraphs(
            batch, text_col, id_col)
        n = len(pos)
        if n:
            raw = b"".join(
                hashlib.sha1(p.encode("utf-8")).digest()[:16]
                for p in paras.to_pylist())
            half = (np.frombuffer(raw, dtype=">u8")
                    .astype(np.uint64).reshape(-1, 2))
            sh1 = np.ascontiguousarray(half[:, 0])
            sh2 = np.ascontiguousarray(half[:, 1])
            loc = pd.DataFrame({"s1": sh1, "s2": sh2,
                                "i": ids.to_pylist(), "p": pos})
            o = loc.sort_values(["s1", "s2", "i", "p"],
                                kind="mergesort")
            first = np.empty(n, bool)
            first[o.index.to_numpy()] = ~o.duplicated(
                ["s1", "s2"], keep="first").to_numpy()
        else:
            sh1 = sh2 = np.empty(0, np.uint64)
            first = np.empty(0, bool)
        sb = (sh1 % nb).astype(np.int32)
        doc_hi, doc_lo = _doc_digests(batch.column(id_col))
        hi, lo = _idpos_digest(doc_hi, doc_lo, row_idx, pos)
        return pa.table({
            id_col: ids, "_pos": pa.array(np.asarray(pos, np.int32)),
            "_sh1": pa.array(sh1), "_sh2": pa.array(sh2),
            "_sb": pa.array(sb, pa.int32()),
            "_hi": pa.array(hi), "_lo": pa.array(lo),
            "_first": pa.array(first),
        }, schema=sha_schema)

    def _removed_table(ids, pos_arr, hi_arr, lo_arr) -> pa.Table:
        n = len(ids)
        b = ((stable_hash_array(ids) % nb).astype(np.int32)
             if n else np.empty(0, np.int32))
        return pa.table({
            id_col: ids,
            "_pos": pos_arr,
            "_para": pa.nulls(n, pa.string()),
            "_tag": pa.array(np.full(n, 1, np.int8)),
            "_b": pa.array(b),
            "_hi": hi_arr, "_lo": lo_arr,
        }, schema=rem_schema)

    def resolve(g: pa.Table) -> pa.Table:
        if "_sh1" not in g.column_names or g.num_rows == 0:
            return rem_schema.empty_table()
        df = g.select([id_col, "_pos", "_sh1", "_sh2",
                       "_hi", "_lo"]).to_pandas()
        df = df.sort_values(["_sh1", "_sh2", id_col, "_pos"],
                            kind="mergesort")
        gone = df[df.duplicated(["_sh1", "_sh2"], keep="first")]
        return _removed_table(
            pa.array(gone[id_col].tolist(), id_type),
            pa.array(gone["_pos"].to_numpy(np.int32)),
            pa.array(gone["_hi"].to_numpy(np.uint64)),
            pa.array(gone["_lo"].to_numpy(np.uint64)))

    def definite(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("_first")))
        return _removed_table(t.column(id_col), t.column("_pos"),
                              t.column("_hi"), t.column("_lo"))

    shas = ds.map_batches(sha_rows,
                          batch_format="pyarrow").materialize()
    resolved = (shas.filter(expr="_first")
                .groupby("_sb")
                .map_groups(resolve, batch_format="pyarrow"))
    removed = (resolved
               .union(shas.map_batches(definite,
                                       batch_format="pyarrow"))
               .materialize())
    n_removed_total = removed.count()

    out_schema = pa.schema([
        (id_col, id_type), (out_text_col, pa.string()),
        ("n_paras", pa.int64()), ("n_removed", pa.int64())])

    # -- 2a. reassembly, broadcast path (default): removal decisions
    # travel to the text, so the text never shuffles ------------------
    if n_removed_total <= max_broadcast_removals:
        import ray

        # The broadcast is two SORTED uint64 numpy arrays (the
        # (id, pos) slot digests from _idpos_digest, precomputed in
        # the ownership pass) — ray.get maps them zero-copy from the
        # object store, so N rebuild workers share ONE copy instead of
        # each building a ~150 B/row tuple set (the tuple-set variant
        # measured 86.6 s at 8 actors and 213 s at 28 — per-actor
        # deserialize + heap build dominated; this layout is 16 B/row
        # shared).
        if n_removed_total:
            dd = removed.select_columns(["_hi", "_lo"]).to_pandas()
            gone_ref = ray.put(_pairset_build(
                dd["_hi"].to_numpy(np.uint64),
                dd["_lo"].to_numpy(np.uint64)))
        else:
            gone_ref = ray.put((np.empty(0, np.uint64),
                                np.empty(0, np.uint64)))

        class RebuildInPlace:
            def __init__(self, ref):
                self.hi, self.lo = (ray.get(ref) if isinstance(
                    ref, ray.ObjectRef) else ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                _, pos, paras, row_idx = _explode_paragraphs(
                    batch, text_col, id_col)
                texts: list[str] = [""] * batch.num_rows
                n_paras = np.zeros(batch.num_rows, np.int64)
                n_gone = np.zeros(batch.num_rows, np.int64)
                if len(pos):
                    np.add.at(n_paras, row_idx, 1)
                    if self.hi.size:
                        # one blake2b per DOC, positions mixed
                        # vectorized
                        doc_hi, doc_lo = _doc_digests(
                            batch.column(id_col))
                        ph, pl = _idpos_digest(doc_hi, doc_lo,
                                               row_idx, pos)
                        gone = _pairset_contains(self.hi, self.lo,
                                                 ph, pl)
                        np.add.at(n_gone, row_idx[gone], 1)
                        keep = ~gone
                        kept_idx = row_idx[keep]
                        kept_paras = paras.take(
                            pa.array(np.flatnonzero(keep)))
                    else:
                        # empty removal set: nothing can be gone —
                        # skip the per-doc hashing entirely
                        kept_idx = row_idx
                        kept_paras = paras
                    parts: dict[int, list[str]] = {}
                    for i, para in zip(kept_idx.tolist(),
                                       kept_paras.to_pylist()):
                        parts.setdefault(i, []).append(para)
                    for i, ps in parts.items():
                        texts[i] = "\n".join(ps)
                return pa.table({
                    id_col: batch.column(id_col),
                    out_text_col: pa.array(texts, pa.string()),
                    "n_paras": pa.array(n_paras),
                    "n_removed": pa.array(n_gone),
                }, schema=out_schema)

        if rebuild_concurrency is None:
            cpus = (int(ray.cluster_resources().get("CPU", 8))
                    if ray.is_initialized() else 8)
            rebuild_concurrency = max(2, cpus - 4)
        return ds.map_batches(
            RebuildInPlace, fn_constructor_args=(gone_ref,),
            batch_format="pyarrow",
            concurrency=(1, rebuild_concurrency), num_cpus=1)

    # -- 2b. reassembly fallback: one id-keyed co-shuffle of
    # (paragraphs + fused doc universe) ∪ removal rows ---------------
    def para_and_universe(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.concat_tables([
            para_rows(batch),
            _tagged(batch.column(id_col),
                    np.full(n, -1, np.int32), None, 2)])

    tagged = (
        ds.map_batches(para_and_universe, batch_format="pyarrow")
        .union(removed.select_columns(list(union_schema.names))
               .repartition(_join_partitions(None)))
    )

    def rebuild(g: pa.Table) -> pa.Table:
        if "_tag" not in g.column_names or g.num_rows == 0:
            return out_schema.empty_table()
        df = g.select([id_col, "_pos", "_para", "_tag"]).to_pandas()
        p = df[df["_tag"] == 0]
        r = df[df["_tag"] == 1][[id_col, "_pos"]]
        base = df[df["_tag"] == 2][[id_col]].drop_duplicates()
        if len(r):
            p = p.merge(r.assign(_gone=True), on=[id_col, "_pos"],
                        how="left")
            surv = p[p["_gone"].isna()]
        else:
            surv = p
        surv = surv.sort_values([id_col, "_pos"], kind="mergesort")
        text = (surv.groupby(id_col, sort=False)["_para"]
                .agg("\n".join))
        n_paras = p.groupby(id_col, sort=False).size()
        n_removed = (r.groupby(id_col, sort=False).size()
                     if len(r) else pd.Series(dtype=np.int64))
        out = base.set_index(id_col)
        out[out_text_col] = text
        out["n_paras"] = n_paras
        out["n_removed"] = n_removed
        out = out.reset_index()
        return pa.table({
            id_col: pa.array(out[id_col].tolist(), id_type),
            out_text_col: pa.array(
                out[out_text_col].fillna("").tolist(), pa.string()),
            "n_paras": pa.array(out["n_paras"].fillna(0)
                                .to_numpy(np.int64)),
            "n_removed": pa.array(out["n_removed"].fillna(0)
                                  .to_numpy(np.int64)),
        }, schema=out_schema)

    return tagged.groupby("_b").map_groups(
        rebuild, batch_format="pyarrow")


def paragraph_dedup_sql(table: str, text_col: str, id_col: str,
                        out_text_col: str = "text") -> str:
    """DuckDB twin of :func:`paragraph_dedup` (string-equality
    identity; bit-identical output on sha1-collision-free input)."""
    return rf"""
    WITH lst AS (
      SELECT {id_col},
        list_filter(list_transform(string_split({text_col}, chr(10)),
                    x -> trim(x, ' ' || chr(9) || chr(13))),
                    x -> x <> '') AS arr
      FROM {table}
    ), paras AS (
      SELECT {id_col}, unnest(arr) AS p,
             unnest(range(1, len(arr) + 1)) AS i
      FROM lst
    ), marked AS (
      SELECT {id_col}, i, p,
        row_number() OVER (PARTITION BY p ORDER BY {id_col}, i) AS rn
      FROM paras
    ), kept AS (
      SELECT {id_col}, string_agg(p, chr(10) ORDER BY i) AS t,
             COUNT(*) AS kept_n
      FROM marked WHERE rn = 1 GROUP BY {id_col}
    ), np_ AS (
      SELECT {id_col}, COUNT(*) AS n FROM paras GROUP BY {id_col}
    )
    SELECT l.{id_col},
      coalesce(k.t, '') AS {out_text_col},
      CAST(coalesce(np_.n, 0) AS BIGINT) AS n_paras,
      CAST(coalesce(np_.n, 0) - coalesce(k.kept_n, 0) AS BIGINT)
        AS n_removed
    FROM lst l
    LEFT JOIN kept k USING ({id_col})
    LEFT JOIN np_ USING ({id_col})
    """


# ---------------------------------------------------------------------------
# cross-snapshot incremental dedup
# ---------------------------------------------------------------------------

MAX_CONFIRMED_DUP_SHAS = 20_000_000


def dedup_exact_against(new_ds, old_ds, text_col: str,
                        old_text_col: str | None = None,
                        fpp: float = 0.01, use_bloom: bool = True,
                        num_partitions: int | None = None,
                        max_confirmed: int = MAX_CONFIRMED_DUP_SHAS):
    """Incremental-snapshot dedup: drop every row of ``new_ds`` whose
    exact text already appears in ``old_ds`` — the "process only what
    yesterday's crawl didn't have" workflow. Exactness contract: text
    identity is sha1 (the repo-wide convention); the DuckDB twin is a
    plain ANTI JOIN on the text (tests/test_paragraph_dedup.py).
    Dedup is purely text-keyed (no id column, no tie-breaking — every
    matching NEW row drops).

    Scale shape (neither corpus is ever collected as text):
    1. the OLD corpus reduces to a ~10-bits/key Bloom bitmap
       (HLL-sized, OR tree-merge) broadcast once;
    2. one streaming pass over ``new_ds`` projects the sha1 of each
       bloom-POSITIVE row — a tiny (sha,) stream, since bloom
       negatives are definite keeps (no false negatives);
    3. those candidate shas semi-join the old shas (distinct, sha-
       keyed) and the CONFIRMED duplicate shas — true dups only, the
       fpp sliver dies here — broadcast back (bounded by
       ``max_confirmed``, ~40 B/sha) to one final streaming filter
       over ``new_ds``. Text never shuffles; the corpus is read
       twice (sha1 per row per pass), never materialized — the
       earlier split-and-union variant probed the bloom twice and
       union-merged two full streams instead (code-review r4)."""
    import ray

    from .joins import hash_join, shuffle_anti_join
    from .sketch import bloom_build, bloom_contains, hll_count_distinct

    old_text_col = old_text_col or text_col

    def add_sha(col):
        def f(t: pa.Table) -> pa.Table:
            texts = t.column(col).to_pylist()
            shas = [hashlib.sha1((x or "").encode("utf-8")).hexdigest()
                    for x in texts]
            if "_sha" in t.column_names:
                t = t.drop_columns(["_sha"])
            return t.append_column("_sha", pa.array(shas, pa.string()))
        return f

    old_shas = (old_ds.select_columns([old_text_col])
                .map_batches(add_sha(old_text_col),
                             batch_format="pyarrow")
                .select_columns(["_sha"]))

    if not use_bloom:
        new_sha = new_ds.map_batches(add_sha(text_col),
                                     batch_format="pyarrow")
        return (shuffle_anti_join(new_sha, old_shas, on="_sha",
                                  num_partitions=num_partitions)
                .drop_columns(["_sha"]))

    old_shas = old_shas.materialize()  # feeds HLL + bloom + join
    est = max(16, int(1.2 * hll_count_distinct(old_shas, "_sha")))
    bitmap, k = bloom_build(old_shas, "_sha", est, fpp=fpp)
    bm_ref = ray.put(bitmap)

    def candidate_shas(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        texts = t.column(text_col).to_pylist()
        shas = np.array(
            [hashlib.sha1((x or "").encode("utf-8")).hexdigest()
             for x in texts], dtype=object)
        if not len(shas):
            return pa.table({"_sha": pa.array([], pa.string())})
        mask = bloom_contains(bm, shas, k)
        return pa.table({"_sha": pa.array(
            np.unique(shas[mask]).tolist(), pa.string())})

    cands = new_ds.select_columns([text_col]).map_batches(
        candidate_shas, batch_format="pyarrow")
    # distinct candidate shas ∩ old shas = the CONFIRMED duplicates
    # (exact; the fpp sliver fails the join). Both sides are sha-only.
    from ray.data.aggregate import Count

    cand_distinct = (cands.groupby("_sha").aggregate(
        Count(alias_name="_n")).select_columns(["_sha"])
        .materialize())  # small by design; also guards the join below
    if cand_distinct.count() == 0:
        # nothing bloom-positive: an all-empty left would reach the
        # Acero join as schema-less empty partitions and crash it
        confirmed: list[str] = []
    else:
        confirmed_ds = hash_join(
            cand_distinct, old_shas.groupby("_sha").aggregate(
                Count(alias_name="_n")).select_columns(["_sha"]),
            on="_sha", num_partitions=num_partitions)
        # to_pandas, NOT take_all: a million dict rows cost seconds
        confirmed = confirmed_ds.to_pandas()["_sha"].tolist()
    if len(confirmed) > max_confirmed:
        raise ValueError(
            f"dedup_exact_against: {len(confirmed)} confirmed "
            f"duplicate shas > max_confirmed={max_confirmed}; raise "
            f"the bound or run with use_bloom=False (all-shuffle)")
    # zero-copy broadcast (see _pairset_build): 128-bit sha1 prefixes
    # as sorted u64 pairs — a frozenset of 1M hex strings deserialized
    # per task and measured 35.1 s where this layout runs in ~15 s
    if confirmed:
        chi = np.array([int(h[:16], 16) for h in confirmed], np.uint64)
        clo = np.array([int(h[16:32], 16) for h in confirmed],
                       np.uint64)
        conf_ref = ray.put(_pairset_build(chi, clo))
    else:
        conf_ref = ray.put((np.empty(0, np.uint64),
                            np.empty(0, np.uint64)))

    def drop_confirmed(t: pa.Table) -> pa.Table:
        shi, slo = ray.get(conf_ref)
        if not len(shi):
            return t
        texts = t.column(text_col).to_pylist()
        n = len(texts)
        hi = np.empty(n, np.uint64)
        lo = np.empty(n, np.uint64)
        for i, x in enumerate(texts):
            d = hashlib.sha1((x or "").encode("utf-8")).digest()
            hi[i] = int.from_bytes(d[:8], "big")
            lo[i] = int.from_bytes(d[8:16], "big")
        gone = _pairset_contains(shi, slo, hi, lo)
        return t.filter(pa.array(~gone))

    return new_ds.map_batches(drop_confirmed, batch_format="pyarrow")
