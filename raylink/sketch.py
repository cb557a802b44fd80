"""Distributed sketches over Ray Data: HyperLogLog cardinality
(overall + per-group) and a Bloom membership filter with a
join-prefilter helper. Both reduce each block to a fixed-size blob
inside ``map_batches`` and tree-merge with an associative,
commutative, IDEMPOTENT operation (max / OR), so results are
bit-identical under any partitioning, merge order or task retry.

Beyond-reference LLM-pipeline operator (the "novel sketch" class):
estimate COUNT(DISTINCT col) — overall or per group — without ever
shuffling the values themselves. Each input block reduces to a fixed
``2^p``-byte register blob inside ``map_batches``; blobs tree-merge
with elementwise max, which is associative, commutative and
IDEMPOTENT, so the estimate is bit-identical under any partitioning,
merge order, task retry or duplicate delivery (pytest asserts the
repartition(2) == repartition(16) equality exactly). Only
``O(2^p)`` bytes ever reach the driver — at 100 TB the value column
never leaves its block.

Algorithm: Flajolet et al., "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007), 64-bit
hash variant (no 32-bit large-range correction needed; small-range
linear counting kept). Standard error ~ 1.04 / sqrt(2^p).

Hashing is ``pd.util.hash_array`` (deterministic, fixed key, any
dtype) — the same primitive every co-shuffle in this repo keys on —
applied through ``blocks.stable_hash_array`` wherever a batch could
contain nulls (a null-containing int batch otherwise hashes its
values through a float64 view, splitting one value across registers
or buckets; code-review r4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .blocks import dataset_schema as _pa_schema  # noqa: F401  (API parity)


def hll_error_bound(p: int) -> float:
    """Relative standard error of a precision-``p`` sketch."""
    return 1.04 / float(np.sqrt(1 << p))


def _check_p(p: int) -> None:
    if not 4 <= p <= 18:
        raise ValueError(f"hll: precision p={p} outside [4, 18]")


def _rho(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash: idx = top ``p`` bits; rank =
    1 + count of leading zeros of the remaining ``64-p`` bits.

    The leading-zero count is exact integer work (binary search by
    shifting) — a float64 ``log2`` would round values near ``2^64``
    across a power of two and mis-rank them."""
    h = hashes.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # suffix bits moved to the top, mod 2^64
    # floor(log2(w)) via branchless binary descent; w == 0 handled after
    bl = np.zeros(w.shape, np.uint64)  # bit_length - 1 for w > 0
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        s64 = np.uint64(s)
        big = (v >> s64) != 0
        v[big] >>= s64
        bl[big] += s64
    rank = np.where(w == 0, np.uint64(64 - p + 1),
                    np.uint64(63) - bl + np.uint64(1)).astype(np.uint8)
    return idx, rank


def _registers_for(values: np.ndarray, p: int) -> np.ndarray:
    reg = np.zeros(1 << p, np.uint8)
    if values.size:
        h = np.asarray(pd.util.hash_array(values, categorize=False),
                       dtype=np.uint64)
        idx, rank = _rho(h, p)
        np.maximum.at(reg, idx, rank)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL estimate from a register array."""
    m = reg.size
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    est = alpha * m * m / float(np.sum(np.exp2(-reg.astype(np.float64))))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros:  # small-range linear counting
        est = m * float(np.log(m / zeros))
    return est


def hll_merge(blobs, p: int) -> np.ndarray:
    """Elementwise-max merge of register blobs (bytes or arrays)."""
    out = np.zeros(1 << p, np.uint8)
    for b in blobs:
        a = np.frombuffer(b, np.uint8) if isinstance(b, (bytes, bytearray)) \
            else np.asarray(b, np.uint8)
        if a.size != out.size:
            raise ValueError(
                f"hll_merge: blob has {a.size} registers, expected "
                f"{out.size} — sketches built at different precisions "
                f"cannot merge")
        np.maximum(out, a, out=out)
    return out


def hll_count_distinct(ds, col: str, p: int = 12,
                       combine_size: int = 64) -> float:
    """Distinct-count estimate for ``ds[col]``.

    Plan: map_batches partial (one ``2^p``-byte blob per block) ->
    map_batches tree-combine level (``combine_size`` blobs -> 1) ->
    driver merges the surviving handful. Same two-level shape as
    learned.fit_classifier_distributed's df pass; add combine levels
    before the driver merge if block counts grow past that."""
    _check_p(p)

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(col).drop_null().to_numpy(zero_copy_only=False)
        return pa.table({"reg": pa.array(
            [_registers_for(vals, p).tobytes()], pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        return pa.table({"reg": pa.array(
            [hll_merge(t.column("reg").to_pylist(), p).tobytes()],
            pa.binary())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=combine_size)
            .take_all())
    reg = hll_merge([r["reg"] for r in rows], p)
    return hll_estimate(reg)


def _estimate_sparse(nnz: np.ndarray, pow_sum: np.ndarray,
                     m: int) -> np.ndarray:
    """Vectorized :func:`hll_estimate` from sparse register stats:
    ``nnz`` non-zero registers per group, ``pow_sum`` = sum of
    ``2^-rank`` over them (the ``m - nnz`` zero registers contribute
    ``2^0 = 1`` each). Matches the dense path exactly while every
    ``2^-rank`` term stays summable inside float64's 53-bit exact
    window (ranks below ~42, i.e. below ~2^42 distinct values at
    p=12 — pytest asserts group-for-group equality there); beyond
    that the two accumulation orders may differ in the last ulp,
    both remaining valid estimates (code-review r4)."""
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    else:
        alpha = {16: 0.673, 32: 0.697, 64: 0.709}[m]
    zeros = (m - nnz).astype(np.float64)
    est = alpha * m * m / (pow_sum + zeros)
    with np.errstate(divide="ignore"):
        lc = m * np.log(np.where(zeros > 0, m / zeros, 1.0))
    return np.where((est <= 2.5 * m) & (zeros > 0), lc, est)


def hll_count_distinct_by(ds, col: str, by: str, p: int = 12,
                          num_buckets: int = 64):
    """Per-group distinct-count estimates as a Dataset
    ``(by, approx_distinct)``.

    Plan: map_batches partial reduces each block to SPARSE register
    triples ``(by, register idx, max rank)`` — at most one row per
    (group, touched register), never a dense ``2^p`` blob per group,
    so high-cardinality ``by`` columns cost ``O(min(rows,
    groups x 2^p))`` shuffle rows instead of ``O(groups x 2^p)``
    bytes per block (the first, dense-blob version took 292 s for
    500k groups x 10M rows at 32 CPUs; this one takes ~4 s) -> ONE
    hash-bucket co-shuffle keyed on ``by`` (ranking.py's ``_rb``
    pattern: <= ``num_buckets`` shuffle groups) -> per-bucket C-level
    pandas max-merge + the vectorized estimate.

    Null handling: null VALUES are ignored (SQL COUNT(DISTINCT)
    semantics); a null GROUP key is a group like any other (the
    repo-wide ranking.py convention). Value hashing and the per-batch
    pre-aggregation stay on the Arrow side — a pandas round-trip
    would promote a null-containing int64 batch to float64 and hash
    the same value into two different registers (code-review r4)."""
    _check_p(p)
    import pyarrow.compute as pc

    from .blocks import stable_hash_array

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(col)))
        h = stable_hash_array(t.column(col))
        idx, rank = _rho(h, p)
        sp = pa.table({by: t.column(by),
                       "_hidx": pa.array(idx.astype(np.int32)),
                       "_hrank": pa.array(rank, pa.uint8())})
        agg = sp.group_by([by, "_hidx"]).aggregate([("_hrank", "max")])
        return agg.rename_columns([by, "_hidx", "_hrank"])

    by_field = _pa_schema(ds).field(by)
    out_schema = pa.schema([by_field,
                            ("approx_distinct", pa.float64())])

    def merge_bucket(g: pa.Table) -> pa.Table:
        # resolved on the ARROW side: the previous pandas round-trip
        # float64-promoted a nullable int64 GROUP column, colliding
        # distinct keys above 2^53 into one merged estimate and
        # corrupting the emitted keys — the exact promotion the
        # docstring warns about for VALUES (code-review r5, reproduced)
        m = 1 << p
        if "_hidx" not in g.column_names or g.num_rows == 0:
            return out_schema.empty_table()
        sp = (g.select([by, "_hidx", "_hrank"])
              .group_by([by, "_hidx"])
              .aggregate([("_hrank", "max")]))
        w = np.exp2(-np.asarray(sp.column("_hrank_max"),
                                dtype=np.float64))
        agg = (pa.table({by: sp.column(by), "_w": pa.array(w)})
               .group_by(by)
               .aggregate([("_w", "sum"), ("_w", "count")]))
        est = _estimate_sparse(
            np.asarray(agg.column("_w_count"), dtype=np.float64),
            np.asarray(agg.column("_w_sum"), dtype=np.float64), m)
        return pa.table({by: agg.column(by),
                         "approx_distinct": pa.array(est, pa.float64())},
                        schema=out_schema)

    from .ranking import _with_group_bucket

    triples = ds.map_batches(partial, batch_format="pyarrow")
    return (_with_group_bucket(triples, by, num_buckets)
            .groupby("_rb")
            .map_groups(merge_bucket, batch_format="pyarrow"))


# ----------------------------------------------------------------------
# Bloom filter: the membership sketch of the same family — per-block
# bitmaps OR-merge (associative, commutative, idempotent, so the built
# filter is bit-identical under any partitioning or retry). Primary
# use at scale: PREFILTER the big side of an equi-join before the
# all-to-all shuffle. joins.broadcast_semi_join ships the exact key
# set (bounded by what fits in ray.put); a Bloom bitmap is ~10 bits
# per key at 1% false positives, extending the broadcast regime ~10x.
# False positives only ever KEEP extra rows (superset guarantee), so
# composing prefilter -> exact hash join is exactly the plain join.
# ----------------------------------------------------------------------

def bloom_params(expected_distinct: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for the target false-positive rate."""
    if not expected_distinct > 0:
        raise ValueError("bloom: expected_distinct must be > 0")
    if not 0 < fpp < 1:
        raise ValueError("bloom: fpp must be in (0, 1)")
    ln2 = float(np.log(2.0))
    m = int(np.ceil(-expected_distinct * np.log(fpp) / (ln2 * ln2)))
    m = max(64, (m + 7) // 8 * 8)  # whole bytes
    k = max(1, int(round(m / expected_distinct * ln2)))
    return m, min(k, 16)


def _odd_stride_h2(h1: np.ndarray) -> np.ndarray:
    """Second hash stream for double hashing: h1 through a murmur3
    fmix64 step — NOT a second pd.util.hash_array call with a
    different hash_key, because hash_key only feeds the string/object
    path and numeric keys would get h2 == h1, collapsing the k probes
    onto one stride. Forced odd so the stride never collapses to a
    fixed point. Shared by the Bloom and Count-Min sketches
    (code-review r5: the derivation lived in both)."""
    with np.errstate(over="ignore"):
        h2 = h1 ^ (h1 >> np.uint64(33))
        h2 = h2 * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)
    return h2


def _bloom_hashes(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two 64-bit hash streams for double hashing (position i =
    h1 + i*h2 mod m)."""
    h1 = np.asarray(pd.util.hash_array(vals, categorize=False),
                    dtype=np.uint64)
    return h1, _odd_stride_h2(h1)


def bloom_add(bitmap: np.ndarray, vals: np.ndarray, k: int) -> None:
    m = np.uint64(bitmap.size * 8)
    h1, h2 = _bloom_hashes(vals)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint64(1) << (pos & np.uint64(7)))
                         .astype(np.uint8))


def bloom_contains(bitmap: np.ndarray, vals: np.ndarray,
                   k: int) -> np.ndarray:
    """Vectorized maybe-membership mask (false positives possible,
    false negatives impossible)."""
    m = np.uint64(bitmap.size * 8)
    h1, h2 = _bloom_hashes(vals)
    out = np.ones(vals.shape, bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        bit = (bitmap[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        out &= bit.astype(bool)
    return out


def bloom_build(ds, col: str, expected_distinct: int, fpp: float = 0.01,
                combine_size: int = 64) -> tuple[np.ndarray, int]:
    """(bitmap, k) over the non-null values of ``ds[col]`` — per-block
    partial bitmaps, OR tree-combine, tiny driver OR (same shape as
    hll_count_distinct)."""
    m, k = bloom_params(expected_distinct, fpp)
    nbytes = m // 8

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        vals = t.column(col).drop_null().to_numpy(zero_copy_only=False)
        if vals.size:
            bloom_add(bm, vals, k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def combine(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, np.uint8)
        for b in t.column("bm").to_pylist():
            np.bitwise_or(acc, np.frombuffer(b, np.uint8), out=acc)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=combine_size)
            .take_all())
    bm = np.zeros(nbytes, np.uint8)
    for r in rows:
        np.bitwise_or(bm, np.frombuffer(r["bm"], np.uint8), out=bm)
    return bm, k


def bloom_prefilter(left, right, on: str, right_on: str | None = None,
                    expected_distinct: int | None = None,
                    fpp: float = 0.01):
    """Drop left rows whose ``on`` key cannot possibly join ``right``
    (inner/semi equi-join prefilter — null keys are dropped too, as
    an equi-join would). The surviving rows are a SUPERSET of the
    exact semi-join (false positives keep extras, never drop matches),
    so ``bloom_prefilter(L, R, on) |> hash_join(R)`` equals
    ``hash_join(L, R)`` row-for-row while shuffling only the ~matching
    fraction of L. When ``expected_distinct`` is omitted the filter is
    sized by the HLL sketch over the same column (one extra pass over
    R's key column only). The bitmap broadcasts via ray.put once —
    ~10 bits/key at fpp=0.01 vs the full key set
    broadcast_semi_join ships."""
    import pyarrow.compute as pc
    import ray

    rk = right_on or on
    if expected_distinct is None:
        expected_distinct = max(64, int(
            hll_count_distinct(right.select_columns([rk]), rk, p=14)))
    bm, k = bloom_build(right.select_columns([rk]), rk,
                        expected_distinct, fpp)
    ref = ray.put(bm.tobytes())

    def _filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(on)))
        if t.num_rows == 0:
            return t
        bitmap = np.frombuffer(ray.get(ref), np.uint8)
        vals = t.column(on).to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bloom_contains(bitmap, vals, k)))

    return left.map_batches(_filter, batch_format="pyarrow")

# ----------------------------------------------------------------------
# Frequent items (heavy hitters): the FREQUENCY member of the sketch
# family (cardinality = HLL, membership = Bloom). A distributed
# Misra-Gries summary — per-block exact counts trimmed to k, additive
# tree-merge + re-trim (mergeable with total error <= n/(k+1):
# Agarwal et al., "Mergeable Summaries", PODS 2012) — plus a two-pass
# EXACT top-m that recounts only the candidates and refuses loudly
# when the bound cannot certify completeness.
# ----------------------------------------------------------------------

def _mg_trim(items: np.ndarray, counts: np.ndarray,
             k: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Misra-Gries decrement: reduce an (item, count) table to at most
    ``k`` items by subtracting the (k+1)-th largest count from every
    count and keeping the strictly-positive remainder. Returns
    (items, residual counts, subtracted) — ``subtracted`` is the new
    error this trim introduced (every surviving estimate dropped by it,
    every dropped item had true-so-far <= it)."""
    if len(items) <= k:
        return items, counts, 0
    kth = int(np.partition(counts, len(counts) - (k + 1))
              [len(counts) - (k + 1)])
    keep = counts > kth
    return items[keep], counts[keep] - kth, kth


def _mg_split(t: pa.Table, col: str) -> tuple[pa.Table, int]:
    """Split a summary table into (item rows, accumulated error).
    Error rides as sentinel rows with a NULL item — split on the Arrow
    side so an int64 item column never round-trips through a
    nullable-float numpy view (which would corrupt ids above 2^53)."""
    import pyarrow.compute as pc

    valid = pc.is_valid(t.column(col))
    err = pc.sum(t.filter(pc.invert(valid)).column("_mg_est")).as_py() or 0
    return t.filter(valid), int(err)


def _mg_combine(t: pa.Table, col: str, k: int,
                item_type: pa.DataType) -> pa.Table:
    """Additive union of summary rows -> trim -> summary rows again
    (items + one null-item sentinel carrying the total error). Valid
    for ANY subset of summary rows — a summary split across two
    batches combines piecewise without losing the error accounting —
    so tree-combine batching needs no alignment."""
    data, err = _mg_split(t, col)
    g = (pd.DataFrame({
        "i": data.column(col).to_numpy(zero_copy_only=False),
        "c": data.column("_mg_est").to_numpy(zero_copy_only=False),
    }).groupby("i", sort=False)["c"].sum())
    items, cnts, sub = _mg_trim(
        g.index.to_numpy(), g.to_numpy().astype(np.int64), k)
    item_arr = pa.concat_arrays([
        pa.array(items, type=item_type), pa.nulls(1, item_type)])
    est_arr = pa.array(np.append(cnts, err + sub), pa.int64())
    return pa.table({col: item_arr, "_mg_est": est_arr})


def frequent_items(ds, col: str, k: int = 256, combine_size: int = 64
                   ) -> tuple[pd.DataFrame, int]:
    """Heavy hitters via a distributed Misra-Gries summary — the
    frequency member of the sketch family (cardinality = HLL,
    membership = Bloom). Returns ``(df, err)``: ``df`` has columns
    ``(col, est_count)`` sorted by estimate descending, and for every
    item ``est_count <= true count <= est_count + err``; any item the
    table OMITS has true count ``<= err``; ``err <= n / (k + 1)``
    (mergeable-summaries bound — Agarwal, Cormode, Huang, Phillips,
    Wei, Yi, "Mergeable Summaries", PODS 2012, §3.1: MG summaries
    merge by additive union + decrement with total error n/(k+1)).

    Plan (same shape as hll_count_distinct): map_batches partial —
    exact per-batch value_counts trimmed to ``k`` (C-level) — then a
    tree-combine level, then a tiny driver merge; only O(k) rows per
    summary ever move, the values themselves are never shuffled.
    Nulls are ignored (they ride the summaries as the error sentinel).
    NOT bit-deterministic across partitionings (trim points differ);
    the BOUNDS hold under every partitioning, and
    :func:`top_frequent_exact` is deterministic where it matters."""
    if k < 1:
        raise ValueError("frequent_items: k must be >= 1")
    item_type = _pa_schema(ds).field(col).type

    def partial(t: pa.Table) -> pa.Table:
        # drop nulls on the ARROW side: a null-containing int64 batch
        # otherwise converts to float64, corrupting ids above 2^53 and
        # merging float-colliding ids (code-review r4)
        vc = pd.Series(
            t.column(col).drop_null().to_numpy(
                zero_copy_only=False)).value_counts(sort=False)
        items, cnts, sub = _mg_trim(
            vc.index.to_numpy(), vc.to_numpy().astype(np.int64), k)
        item_arr = pa.concat_arrays([
            pa.array(items, type=item_type), pa.nulls(1, item_type)])
        return pa.table({col: item_arr,
                         "_mg_est": pa.array(np.append(cnts, sub),
                                             pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        return _mg_combine(t, col, k, item_type)

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=combine_size * (k + 1))
            .take_all())
    final = _mg_combine(
        pa.Table.from_pylist(rows, schema=pa.schema(
            [(col, item_type), ("_mg_est", pa.int64())])), col, k,
        item_type)
    data, err = _mg_split(final, col)
    df = (data.to_pandas()
          .rename(columns={"_mg_est": "est_count"})
          .sort_values(["est_count", col], ascending=[False, True],
                       kind="mergesort")
          .reset_index(drop=True))
    return df, err


def top_frequent_exact(ds, col: str, m: int, k: int | None = None,
                       combine_size: int = 64) -> pd.DataFrame:
    """EXACT top-``m`` most frequent values of ``ds[col]`` (count
    descending, value ascending on ties — DuckDB's
    ``GROUP BY col ORDER BY count(*) DESC, col LIMIT m``), computed
    without ever shuffling the full distinct-value set:

    pass 1 — :func:`frequent_items` finds <= ``k`` candidates (default
    ``k = max(64, 8m)``) with error bound ``err``;
    pass 2 — the candidate set broadcasts via ``ray.put`` and each
    batch counts ONLY candidate hits (one vectorized ``isin`` +
    value_counts), tree-combined to exact totals — O(k) rows per
    block regardless of input cardinality.

    Completeness guard: every non-candidate's true count is <= err,
    so if the m-th candidate count is > err the result is provably
    the exact global top-m; otherwise this raises (increase ``k``)
    instead of returning a silently-maybe-wrong answer."""
    if m < 1:
        raise ValueError("top_frequent_exact: m must be >= 1")
    k = k if k is not None else max(64, 8 * m)
    if k < m:
        raise ValueError(f"top_frequent_exact: k={k} < m={m}")
    import ray

    cand_df, err = frequent_items(ds, col, k, combine_size)
    item_type = _pa_schema(ds).field(col).type
    ref = ray.put(cand_df[col].to_numpy())

    def count_part(t: pa.Table) -> pa.Table:
        # drop_null BEFORE to_numpy — same float64-promotion hazard
        # as frequent_items.partial (code-review r4)
        s = pd.Series(t.column(col).drop_null().to_numpy(
            zero_copy_only=False))
        vc = s[s.isin(ray.get(ref))].value_counts(sort=False)
        return pa.table({
            col: pa.array(vc.index.to_numpy(), type=item_type),
            "_cnt": pa.array(vc.to_numpy().astype(np.int64), pa.int64())})

    def sum_combine(t: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
            "i": t.column(col).to_numpy(zero_copy_only=False),
            "c": t.column("_cnt").to_numpy(zero_copy_only=False),
        }).groupby("i", sort=False)["c"].sum())
        return pa.table({col: pa.array(g.index.to_numpy(), type=item_type),
                         "_cnt": pa.array(g.to_numpy(), pa.int64())})

    rows = (ds.map_batches(count_part, batch_format="pyarrow")
            .map_batches(sum_combine, batch_format="pyarrow",
                         batch_size=combine_size * k)
            .take_all())
    if not rows:
        if err > 0:  # values existed but every candidate trimmed away
            raise ValueError(
                f"top_frequent_exact: cannot certify top-{m} — the "
                f"summary kept no candidate above the error bound {err} "
                f"(near-uniform data); re-run with a larger k "
                f"(current k={k})")
        return pd.DataFrame({col: pd.Series(dtype=object),
                             "count": pd.Series(dtype="int64")})
    exact = (pd.DataFrame(rows).groupby(col, sort=False)["_cnt"].sum()
             .reset_index().rename(columns={"_cnt": "count"})
             .sort_values(["count", col], ascending=[False, True],
                          kind="mergesort")
             .reset_index(drop=True))
    out = exact.head(m).reset_index(drop=True)
    # Certify: every NON-candidate's true count is <= err. The result
    # is provably complete iff the weakest returned row still beats
    # err; with fewer than m candidates, any dropped value (count >= 1)
    # could belong in the top-m unless the summary never trimmed.
    floor = int(out["count"].iloc[m - 1]) if len(exact) >= m else 0
    if err > 0 and floor <= err:
        raise ValueError(
            f"top_frequent_exact: cannot certify top-{m} — the weakest "
            f"returned count {floor} is within the summary error bound "
            f"{err}; re-run with a larger k (current k={k})")
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch: approximate frequencies with a certified overcount
# bound — the point-query companion to Misra-Gries' heavy hitters
# ---------------------------------------------------------------------------
#
# Cormode & Muthukrishnan, "An improved data stream summary: the
# count-min sketch and its applications" (J. Algorithms 2005). Depth d
# = ceil(ln(1/delta)) rows of width w = ceil(e/eps) counters; row j
# counts values at position (h1 + j*h2) mod w (the Kirsch-Mitzenmacher
# double-hashing trick shared with the Bloom filter, so row hashes
# never collapse for numeric dtypes). Per-block partials are d x w
# int64 matrices that merge by elementwise SUM — associative and
# commutative, so any tree-merge order gives the bit-identical sketch
# (pytest pins repartition(2) == repartition(16)). Guarantees:
# estimate(x) >= true(x) always, and estimate(x) <= true(x) + eps*N
# with probability >= 1 - delta. Only O(d*w) bytes reach the driver.


def cm_params(eps: float, delta: float) -> tuple[int, int]:
    """(depth, width) for an eps*N overcount bound at confidence
    1 - delta."""
    if not (0 < eps < 1 and 0 < delta < 1):
        raise ValueError("cm_params: need 0 < eps,delta < 1")
    d = int(np.ceil(np.log(1.0 / delta)))
    w = int(np.ceil(np.e / eps))
    return max(d, 1), max(w, 1)


def _cm_positions(vals, depth: int, width: int) -> np.ndarray:
    """(depth, n) counter positions via double hashing over the
    null-stable hash (blocks.stable_hash_array when given an Arrow
    column, pd.util.hash_array path for raw numpy)."""
    from .blocks import stable_hash_array

    if isinstance(vals, (pa.Array, pa.ChunkedArray)):
        h1 = stable_hash_array(vals)
    else:
        arr = np.asarray(vals)
        if arr.dtype.kind in "US":
            # pd.util.hash_array rejects numpy fixed-width unicode /
            # bytes dtypes ("does not understand character buffer");
            # plain lists of strings land here (code-review r4)
            arr = arr.astype(object)
        h1 = np.asarray(pd.util.hash_array(
            arr, categorize=False), dtype=np.uint64)
    h2 = _odd_stride_h2(h1)
    with np.errstate(over="ignore"):
        js = np.arange(depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + js * h2[None, :])
                % np.uint64(width)).astype(np.int64)


def cm_build(ds, col: str, eps: float = 0.001, delta: float = 0.01,
             combine_size: int = 64):
    """Build the sketch over ``ds[col]`` -> dict with the (d, w) int64
    counter matrix, total row count N, and the parameters. Same
    two-level partial -> tree-combine -> driver-merge shape as
    hll_count_distinct; nulls are skipped (they are not a value)."""
    import pyarrow.compute as pc

    depth, width = cm_params(eps, delta)

    def partial(t: pa.Table) -> pa.Table:
        counts = np.zeros((depth, width), np.int64)
        colv = t.column(col).drop_null()
        n = len(colv)
        if n:
            pos = _cm_positions(colv, depth, width)
            for j in range(depth):
                np.add.at(counts[j], pos[j], 1)
        return pa.table({
            "cm": pa.array([counts.tobytes()], pa.binary()),
            "n": pa.array([n], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        acc = np.zeros((depth, width), np.int64)
        for b in t.column("cm").to_pylist():
            acc += np.frombuffer(b, np.int64).reshape(depth, width)
        n = int(pc.sum(t.column("n")).as_py() or 0)
        return pa.table({
            "cm": pa.array([acc.tobytes()], pa.binary()),
            "n": pa.array([n], pa.int64())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow",
                         batch_size=combine_size)
            .take_all())
    acc = np.zeros((depth, width), np.int64)
    n = 0
    for r in rows:
        acc += np.frombuffer(r["cm"], np.int64).reshape(depth, width)
        n += int(r["n"])
    return {"counts": acc, "n": n, "depth": depth, "width": width,
            "eps": eps, "delta": delta}


def cm_query(sketch: dict, values) -> np.ndarray:
    """Vectorized point estimates: min over rows of the value's
    counter. Always >= the true count; <= true + eps*N w.p. 1-delta."""
    counts = sketch["counts"]
    depth, width = sketch["depth"], sketch["width"]
    vals = np.asarray(values)
    pos = _cm_positions(vals, depth, width)
    est = counts[0][pos[0]]
    for j in range(1, depth):
        est = np.minimum(est, counts[j][pos[j]])
    return est


# ---------------------------------------------------------------------------
# quantile sketch (deterministic bottom-k sample + exact sample quantiles)
# ---------------------------------------------------------------------------

def _qs_bottom_k(t: pa.Table, k: int) -> pa.Table:
    """Keep the k smallest (h, v) rows — one lexsort per summary block.
    Bottom-k is associative, commutative and IDEMPOTENT as a set op,
    so partials tree-combine in any order / batching / retry pattern
    and the FINAL sample is bit-identical under every partitioning.
    The v tiebreak makes the kept VALUE multiset deterministic even
    when distinct rows share an id (hence a hash)."""
    h = np.asarray(t.column("_qs_h"))
    v = np.asarray(t.column("_qs_v"))
    order = np.lexsort((v, h))[:k]
    return t.take(pa.array(order, pa.int64()))


def quantile_sketch(ds, col: str, id_col: str, qs, k: int = 4096,
                    seed: int = 42, combine_size: int = 64
                    ) -> tuple[pd.DataFrame, int]:
    """Approximate quantiles of ``ds[col]`` — the quantile member of
    the sketch family (cardinality = HLL, membership = Bloom,
    frequency = Misra-Gries / Count-Min) — via a DETERMINISTIC
    uniform sample: the k rows whose seed-keyed id hash
    (``ranking.sample_hash[_str]``, the repo's pinned
    SQL-reproducible rank key) is smallest. Bottom-k-by-keyed-hash is
    a uniform sample without replacement AND a mergeable summary
    (set-minimum is associative/commutative/idempotent), so unlike
    t-digest or KLL the result is bit-identical under any
    partitioning, merge order or task retry — and unlike both, it has
    an EXACT SQL twin (:func:`quantile_sketch_sql`): DuckDB selects
    the identical sample with ``ORDER BY h, v LIMIT k`` and
    ``quantile_cont`` applies the identical linear interpolation.

    Returns ``(df, m)``: ``df`` has columns ``(q, value)`` (one row
    per requested quantile, in the given order) and ``m`` is the
    realized sample size (``min(k, rows with non-null col)``). With
    m = k the estimated quantile's RANK error obeys the DKW bound
    ``P(|rank_err| > eps) <= 2 exp(-2 k eps^2)`` — k = 4096 gives
    eps ~ 0.03 at 99.9% — and sampling WITHOUT replacement is
    strictly more concentrated. For m <= k the quantiles are exact.

    Scale shape (the ``frequent_items`` plan): each block reduces to
    <= k (hash, value) pairs — 16 bytes/row — inside ``map_batches``,
    partials tree-combine, and only O(k) pairs ever reach the driver;
    the value column itself never shuffles. Nulls in ``col`` are
    ignored (quantile_cont semantics); null ids raise loudly; values
    are compared and interpolated as float64 (``CAST(col AS
    DOUBLE)``) on both engines."""
    from .ranking import (_require_hashable_id, sample_hash,
                          sample_hash_str)

    qs = [float(q) for q in qs]
    if not qs or any(q < 0.0 or q > 1.0 for q in qs):
        raise ValueError("quantile_sketch: qs must be within [0, 1]")
    if k < 1:
        raise ValueError("quantile_sketch: k must be >= 1")
    use_str = _require_hashable_id(ds, id_col, "quantile_sketch")

    def partial(t: pa.Table) -> pa.Table:
        mask = t.column(col).is_valid()
        t = t.filter(mask)
        ids = t.column(id_col).to_pandas()
        if ids.isna().any():
            raise ValueError(
                f"quantile_sketch: {id_col!r} contains nulls")
        h = (sample_hash_str(ids.to_numpy(), seed) if use_str
             else sample_hash(ids.to_numpy(), seed))
        pair = pa.table({
            "_qs_h": pa.array(h, pa.uint64()),
            "_qs_v": t.column(col).cast(pa.float64()),
        })
        return _qs_bottom_k(pair, k)

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(lambda t: _qs_bottom_k(t, k),
                         batch_format="pyarrow",
                         batch_size=combine_size * k)
            .take_all())
    final = _qs_bottom_k(pa.Table.from_pylist(rows, schema=pa.schema(
        [("_qs_h", pa.uint64()), ("_qs_v", pa.float64())])), k)
    v = np.sort(np.asarray(final.column("_qs_v")))
    m = len(v)
    if m == 0:
        return (pd.DataFrame({"q": qs,
                              "value": [np.nan] * len(qs)}), 0)
    vals = []
    for q in qs:
        # quantile_cont's interpolation, reproduced term-for-term:
        # RN = q*(m-1); lo + frac*(hi - lo)
        rn = q * (m - 1)
        lo = int(np.floor(rn))
        hi = min(lo + 1, m - 1)
        vals.append(float(v[lo] + (rn - lo) * (v[hi] - v[lo])))
    return pd.DataFrame({"q": qs, "value": vals}), m


def quantile_sketch_sql(table_expr: str, col: str, id_col: str, qs,
                        k: int = 4096, seed: int = 42,
                        string_id: bool = False) -> str:
    """SELECT producing :func:`quantile_sketch`'s ``df`` bit-for-bit:
    the identical bottom-k sample (same hash, same (h, v) order, same
    null handling) fed to ``quantile_cont`` per requested q."""
    from .ranking import (sample_hash_sql_expr,
                          sample_hash_str_sql_expr)

    h = (sample_hash_str_sql_expr(id_col, seed) if string_id
         else sample_hash_sql_expr(id_col, seed))
    sample = (f"SELECT CAST({col} AS DOUBLE) AS v, {h} AS h "
              f"FROM {table_expr} WHERE {col} IS NOT NULL "
              f"ORDER BY h, v LIMIT {int(k)}")
    arms = " UNION ALL ".join(
        f"SELECT {float(q)!r} AS q, quantile_cont(v, {float(q)!r}) "
        f"AS value FROM s" for q in qs)
    return f"WITH s AS ({sample}) {arms}"


def filter_by_quantile(ds, col: str, id_col: str,
                       lo: float | None = None,
                       hi: float | None = None, k: int = 4096,
                       seed: int = 42):
    """Percentile-gate a corpus: keep rows whose ``col`` lies within
    the [lo, hi] QUANTILES of the column's distribution — the
    downstream consumer of :func:`quantile_sketch` a training-data
    pipeline actually runs ("drop documents below the 10th percentile
    of the quality score / above the 99th of the repetition signal").
    At 100 TB an exact global percentile needs a full sort; here the
    thresholds come from the deterministic bottom-k-hash sketch
    (O(k) rows to the driver, DKW rank-error bound in
    :func:`quantile_sketch`) and the gate itself is ONE shuffle-free
    vectorized ``map_batches`` pass against the two broadcast
    threshold doubles.

    Pinned semantics, mirrored bit-for-bit by
    :func:`filter_by_quantile_sql`: bounds are INCLUSIVE, compared in
    the float64 domain (``CAST(col AS DOUBLE)``); rows with a NULL
    ``col`` are dropped (SQL comparison semantics — a NULL never
    satisfies ``>=``); at least one bound is required. Returns
    ``(filtered_ds, thresholds)`` where ``thresholds`` is the small
    ``{q: value}`` dict so callers can log/checkpoint the realized
    cut points.

    COST NOTE (stated loudly, per the repo's no-silent-costs rule):
    the sketch pass and the gate pass each execute ``ds``'s upstream
    lineage once — two executions total, the unavoidable shape of any
    data-dependent threshold over a lazy stream. When the upstream is
    an expensive chain (extract/parse), checkpoint or
    ``materialize()`` it first; when it is a bare ``read_parquet``,
    the sketch pass costs only an ``(id_col, col)`` read and the
    double read is cheaper than any materialization."""
    if lo is None and hi is None:
        raise ValueError(
            "filter_by_quantile: provide lo and/or hi in [0, 1]")
    qs = [q for q in (lo, hi) if q is not None]
    qdf, _m = quantile_sketch(ds, col, id_col, qs, k=k, seed=seed)
    if _m == 0:
        raise ValueError(
            f"filter_by_quantile: column {col!r} has no non-null "
            "values; thresholds are undefined")
    thresholds = dict(zip(qdf["q"], qdf["value"]))
    lo_v = thresholds[float(lo)] if lo is not None else None
    hi_v = thresholds[float(hi)] if hi is not None else None

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t.column(col).cast(pa.float64())
        mask = v.is_valid()
        if lo_v is not None:
            mask = pc.and_(mask, pc.greater_equal(v, lo_v))
        if hi_v is not None:
            mask = pc.and_(mask, pc.less_equal(v, hi_v))
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(gate, batch_format="pyarrow"), thresholds


def filter_by_quantile_sql(table_expr: str, col: str, id_col: str,
                           lo: float | None = None,
                           hi: float | None = None, k: int = 4096,
                           seed: int = 42,
                           string_id: bool = False) -> str:
    """SELECT mirroring :func:`filter_by_quantile` row-for-row: the
    thresholds come from the identical :func:`quantile_sketch_sql`
    sample and the gate applies the identical inclusive float64
    comparisons (NULL ``col`` rows fail them, matching the Ray side's
    explicit drop)."""
    if lo is None and hi is None:
        raise ValueError(
            "filter_by_quantile_sql: provide lo and/or hi in [0, 1]")
    qs = [q for q in (lo, hi) if q is not None]
    twin = quantile_sketch_sql(table_expr, col, id_col, qs, k=k,
                               seed=seed, string_id=string_id)
    conds = []
    if lo is not None:
        conds.append(
            f"CAST({col} AS DOUBLE) >= (SELECT value FROM thr "
            f"WHERE q = {float(lo)!r})")
    if hi is not None:
        conds.append(
            f"CAST({col} AS DOUBLE) <= (SELECT value FROM thr "
            f"WHERE q = {float(hi)!r})")
    return (f"WITH thr AS ({twin}) SELECT * FROM {table_expr} "
            f"WHERE {' AND '.join(conds)}")
