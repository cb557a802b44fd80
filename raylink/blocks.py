"""Block-level utilities: uniform-Arrow dataset rebuild.

Ray Data's ``map_batches`` passes EMPTY input blocks through without
calling the UDF or converting the batch format (see
ray/data/_internal/planner/plan_udf_map_op.py, "For empty input blocks,
we directly output them without calling the UDF"). A pandas-origin
empty block — e.g. from ``groupby().map_groups(fn,
batch_format="pandas")`` where some groups return an empty DataFrame —
therefore survives any number of ``batch_format="pyarrow"`` stages and
later poisons ``Dataset.join`` / ``union``, whose
DelegatingBlockBuilder asserts a single uniform block type per output
(``AssertionError: (BlockType.PANDAS, BlockType.ARROW)``).

``ensure_arrow`` rebuilds a dataset from its blocks: empty blocks are
dropped using metadata only (no data fetch), the rest are converted to
Arrow in tiny per-block tasks — near-zero cost for blocks that are
already Arrow-backed, and no driver-side materialization (block refs
stay in the object store).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


@ray.remote(num_cpus=0.25)
def _block_to_arrow(block) -> "pa.Table":
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_arrow()


def ensure_arrow(ds, schema: pa.Schema | None = None):
    """Return ``ds`` rebuilt with uniformly Arrow-backed, non-empty
    blocks. Triggers execution of ``ds`` (callers that follow with an
    iterative algorithm — e.g. connected components — materialize
    anyway). ``schema`` supplies the result schema when every block is
    empty (otherwise an empty zero-column dataset is returned)."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows == 0:
                continue
            refs.append(_block_to_arrow.remote(block_ref))
    if not refs:
        empty = pa.table({}) if schema is None else schema.empty_table()
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(refs)


_NULL_HASH = 0x9E3779B97F4A7C15  # fixed hash for NULL, any dtype


def stable_hash_array(col) -> "np.ndarray":
    """Deterministic uint64 hash per element of an Arrow array /
    chunked array, INVARIANT to which other elements share the batch.

    The naive ``pd.util.hash_array(col.to_numpy())`` is not: an int64
    batch containing any NULL converts to float64 (NaN) on the way to
    numpy, and pandas hashes 5 (int64) and 5.0 (float64) differently —
    so the same key lands in different hash buckets depending on its
    batch-mates, silently splitting one group across bucket resolves
    (code-review r4; reproduced on pandas 2.x / pyarrow 16).
    Canonicalization: integers/bools hash from a null-FILLED array of
    their native width (pandas widens any int width to the same u8
    value-hash, so int32 and int64 agree); temporals hash their int64
    view; floats hash their own dtype (null->NaN is deterministic and
    width-stable); everything else hashes as objects. NULL positions
    are then overwritten with one fixed constant so NULL hashes
    identically in every dtype and every batch."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = (col.combine_chunks() if col.num_chunks != 1
               else col.chunk(0))
    if isinstance(col, pa.ChunkedArray):  # combine_chunks kept the type
        col = (col.chunk(0) if col.num_chunks
               else pa.array([], type=col.type))
    if len(col) == 0:
        return np.empty(0, np.uint64)
    t = col.type
    null_mask = (pc.is_null(col).to_numpy(zero_copy_only=False)
                 if col.null_count else None)
    if pa.types.is_boolean(t):
        vals = col.fill_null(False).to_numpy(zero_copy_only=False)
    elif pa.types.is_integer(t):
        vals = col.fill_null(0).to_numpy(zero_copy_only=False)
    elif pa.types.is_temporal(t):
        vals = (col.cast(pa.int64()).fill_null(0)
                .to_numpy(zero_copy_only=False))
    elif pa.types.is_floating(t):
        # nulls become NaN WITHOUT width promotion; NaN hashes
        # deterministically (and is overwritten below anyway)
        vals = col.to_numpy(zero_copy_only=False)
    else:
        # string / binary / decimal / nested -> object array; pandas
        # object hashing handles None deterministically
        vals = col.to_numpy(zero_copy_only=False)
        if vals.dtype != np.dtype(object):
            vals = vals.astype(object)
    h = np.asarray(pd.util.hash_array(vals, categorize=False),
                   dtype=np.uint64)
    if null_mask is not None:
        h[null_mask] = np.uint64(_NULL_HASH)
    return h


def stable_hash_columns(tbl: pa.Table, cols: list[str]) -> "np.ndarray":
    """Combined uint64 hash over several columns of ``tbl`` (FNV-style
    fold of :func:`stable_hash_array` per column)."""
    import numpy as np

    h = np.zeros(tbl.num_rows, np.uint64)
    fnv = np.uint64(1099511628211)
    for c in cols:
        h = h * fnv + stable_hash_array(tbl.column(c))
    return h


def dataset_schema(ds) -> pa.Schema:
    """pyarrow schema of a Dataset, robust to block origin: Arrow-origin
    datasets report pa.DataType entries, but pandas-origin ones report
    numpy dtypes / Python classes (``object`` for strings). Used by
    operators that must pin an output schema before execution.

    ``object`` dtype is ambiguous (str / bytes / list all report it);
    mapping it blindly to ``pa.string()`` poisons downstream casts far
    from the cause (ADVICE r3). When any object column exists, a few
    rows are sniffed (``limit(16).take``) and each object column is
    resolved from its FIRST NON-NULL value — a null first row must not
    silently pin pa.string() on a list-typed column (code-review r4).
    All-null sample (or empty dataset) falls back to string. NOTE:
    the sniff executes a small prefix of a lazy pandas-origin
    pipeline — the unavoidable price of pinning an Arrow type the
    pandas schema does not carry; Arrow-origin datasets never pay it."""
    import numpy as np

    s = ds.schema()
    if s is None:
        # empty dataset whose blocks carry no schema (e.g. zero-edge
        # clusters): behave as a zero-column schema so callers emit an
        # empty result instead of crashing
        return pa.schema([])
    object_cols = []
    resolved: list[tuple[str, pa.DataType | None]] = []
    for n, t in zip(s.names, s.types):
        if isinstance(t, pa.DataType):
            resolved.append((n, t))
            continue
        try:
            dt = np.dtype(t)
        except TypeError:
            dt = np.dtype(object)
        if dt == np.dtype(object):
            resolved.append((n, None))
            object_cols.append(n)
        else:
            resolved.append((n, pa.from_numpy_dtype(dt)))
    if object_cols:
        rows = ds.limit(16).take(16)
        sniffed = {}
        for n in object_cols:
            v = next((r.get(n) for r in rows if r.get(n) is not None),
                     None)
            if isinstance(v, (bytes, bytearray)):
                sniffed[n] = pa.binary()
            elif isinstance(v, (list, tuple, np.ndarray)):
                sniffed[n] = pa.list_(
                    pa.array(list(v)).type if len(v) else pa.string())
            else:
                sniffed[n] = pa.string()
        resolved = [(n, sniffed[n] if t is None else t)
                    for n, t in resolved]
    return pa.schema([pa.field(n, t) for n, t in resolved])
