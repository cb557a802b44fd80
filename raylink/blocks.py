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
