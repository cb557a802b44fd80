"""Distributed cardinality sketches: HyperLogLog over Ray Data.

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
dtype) — the same primitive every co-shuffle in this repo keys on.
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


def hll_count_distinct_by(ds, col: str, by: str, p: int = 12,
                          num_buckets: int = 64):
    """Per-group distinct-count estimates as a Dataset
    ``(by, approx_distinct)``.

    Plan: map_batches partial (one blob per (block, group) — the
    values never leave their block) -> ONE hash-bucket co-shuffle of
    the blobs keyed on ``by`` (ranking.py's ``_rb`` pattern: <=
    ``num_buckets`` groups, never one shuffle group per distinct key)
    -> vectorized per-bucket pandas merge. Shuffled bytes are
    ``O(groups x blocks x 2^p)`` — independent of row count."""
    _check_p(p)

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": t.column(by).to_numpy(zero_copy_only=False),
            "v": t.column(col).to_numpy(zero_copy_only=False),
        }).dropna()
        groups, blobs = [], []
        for g, sub in df.groupby("g", sort=False):
            groups.append(g)
            blobs.append(_registers_for(sub["v"].to_numpy(), p).tobytes())
        return pa.table({by: pa.array(groups),
                         "reg": pa.array(blobs, pa.binary())})

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(by, sort=False)["reg"]
                .apply(lambda s: hll_estimate(hll_merge(s.to_list(), p)))
                .rename("approx_distinct").reset_index())

    from .ranking import _with_group_bucket

    blobs = ds.map_batches(partial, batch_format="pyarrow")
    return (_with_group_bucket(blobs, by, num_buckets)
            .groupby("_rb")
            .map_groups(merge_bucket, batch_format="pandas"))
