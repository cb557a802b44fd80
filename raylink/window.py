"""Per-key windowed analytics: lag / lead / cumulative aggregates
over an ordering column — SQL's ``f(x) OVER (PARTITION BY key ORDER
BY ts)`` family, which the event-time windows in ``__ray_entry__``
(tumbling / sliding / sessions) don't cover.

Scale shape (same as ranking.top_k_per_group): ONE hash-bucket
co-shuffle keyed on the partition column into <= ``num_buckets``
shuffle groups — never one group per distinct key — then a vectorized
pandas sort + groupby shift/cumsum per bucket. Partitioning
assumption: all rows of one key fit a bucket worker's heap (raise
``num_buckets`` for bigger inputs); keys are hash-spread so only a
single pathological key can skew a bucket.

Determinism: callers should pass a ``tiebreak_col`` making
(key, order, tiebreak) a total order — otherwise rows tying on the
order column take input order (stable mergesort), which SQL leaves
unspecified too (tests pin a tiebreak to compare bit-for-bit with
DuckDB window functions)."""

from __future__ import annotations

import numpy as np  # noqa: F401  (callers' lambdas routinely need it)
import pandas as pd

from .blocks import dataset_schema as _pa_schema
from .ranking import _with_group_bucket

_AGGS = ("cumsum", "cumcount", "cummax", "cummin")
_RANKS = ("row_number", "rank", "dense_rank", "percent_rank")


def windowed(ds, key_col: str, order_col: str,
             lag_cols: dict[str, str] | None = None,
             lead_cols: dict[str, str] | None = None,
             cum_aggs: dict[str, tuple[str, str]] | None = None,
             rank_aggs: dict[str, str] | None = None,
             tiebreak_col: str | None = None,
             num_buckets: int = 64):
    """Append windowed columns per ``key_col`` partition ordered by
    ``order_col``.

    - ``lag_cols``  {out_name: src_col}: previous row's value (null
      on the first row of a partition) — SQL ``LAG(src) OVER (...)``.
    - ``lead_cols`` {out_name: src_col}: next row's value — ``LEAD``.
    - ``cum_aggs``  {out_name: (src_col, agg)} with agg in
      ``cumsum | cumcount | cummax | cummin`` — SQL running aggregates
      over ``ROWS UNBOUNDED PRECEDING`` (cumcount is ``row_number()-1``
      and ignores ``src_col``).
    - ``rank_aggs`` {out_name: kind} with kind in ``row_number | rank
      | dense_rank | percent_rank`` over ``order_col`` — SQL ranking
      functions. Ties follow SQL semantics (shared rank; gaps for
      ``rank``, none for ``dense_rank``); ``row_number`` needs a
      ``tiebreak_col`` to be deterministic under ties. ``order_col``
      values must be non-null for rank parity with SQL.

    Output: input columns + the requested columns; row order is
    unspecified (a set, like every shuffle output here)."""
    lag_cols = dict(lag_cols or {})
    lead_cols = dict(lead_cols or {})
    cum_aggs = dict(cum_aggs or {})
    rank_aggs = dict(rank_aggs or {})
    if not (lag_cols or lead_cols or cum_aggs or rank_aggs):
        raise ValueError("windowed: nothing requested")
    for out, kind in rank_aggs.items():
        if kind not in _RANKS:
            raise ValueError(
                f"windowed: unknown rank kind {kind!r} for {out!r} "
                f"(supported: {', '.join(_RANKS)})")
    for out, (_src, agg) in cum_aggs.items():
        if agg not in _AGGS:
            raise ValueError(
                f"windowed: unknown agg {agg!r} for {out!r} "
                f"(supported: {', '.join(_AGGS)})")
    schema = _pa_schema(ds)
    cols = list(schema.names)
    clash = (set(lag_cols) | set(lead_cols) | set(cum_aggs)
             | set(rank_aggs)) & set(cols)
    if clash:
        raise ValueError(
            f"windowed: output column(s) {sorted(clash)} already exist "
            f"in the input — pick different out names")
    out_names = (list(lag_cols) + list(lead_cols) + list(cum_aggs)
                 + list(rank_aggs))
    dup_outs = sorted({n for n in out_names if out_names.count(n) > 1})
    if dup_outs:
        # a name reused across the four request dicts was silently
        # overwritten by loop order (code-review r5)
        raise ValueError(
            f"windowed: output name(s) {dup_outs} requested more than "
            f"once across lag/lead/cum/rank")
    sort_cols = [key_col, order_col] + (
        [tiebreak_col] if tiebreak_col else [])

    def _added_dtype(name: str):
        """Dtype a REAL (non-empty) bucket emits for an added column,
        so the empty-bucket guard cannot poison the block schema with
        float64 rank columns next to int64 ones (code-review r4).
        lag/lead introduce a null per partition head/tail, so numeric
        sources surface as float64 (pandas shift semantics); cum_aggs
        keep the source dtype (null-free sources — nullable sources
        already vary by bucket in plain pandas, documented caveat);
        ranks are int64 except percent_rank."""
        empty = schema.empty_table().to_pandas()
        if name in rank_aggs:
            return ("float64" if rank_aggs[name] == "percent_rank"
                    else "int64")
        if name in cum_aggs:
            src, agg = cum_aggs[name]
            return "int64" if agg == "cumcount" else empty[src].dtype
        src = lag_cols.get(name, lead_cols.get(name))
        d = empty[src].dtype
        if pd.api.types.is_bool_dtype(d):
            return object
        if pd.api.types.is_integer_dtype(d):
            return "float64"
        return d

    def resolve_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if key_col not in g.columns or len(g) == 0:
            out = schema.empty_table().to_pandas()
            # SAME deterministic column order as the real branch below
            # — a set union iterated in per-process hash order emitted
            # blocks whose Arrow schemas had mismatched field orders
            # (code-review r5)
            for name in (list(lag_cols) + list(lead_cols)
                         + list(cum_aggs) + list(rank_aggs)):
                out[name] = pd.Series(dtype=_added_dtype(name))
            return out
        if (any(k != "row_number" for k in rank_aggs.values())
                and g[order_col].isna().any()):
            # rank/dense_rank .astype('int64') crashed on NaN deep in
            # the worker and percent_rank silently emitted NaN — make
            # the unsupported case loud instead (code-review r5)
            raise ValueError(
                f"windowed: order column {order_col!r} contains nulls; "
                "rank/dense_rank/percent_rank need non-null order "
                "values (SQL ranks NULLs, this kernel does not)")
        g = g.sort_values(sort_cols, kind="mergesort")
        # dropna=False: a null key is a partition like any other
        grp = g.groupby(key_col, sort=False, dropna=False)
        for out, src in lag_cols.items():
            g[out] = grp[src].shift(1)
        for out, src in lead_cols.items():
            g[out] = grp[src].shift(-1)
        for out, (src, agg) in cum_aggs.items():
            if agg == "cumcount":
                g[out] = grp.cumcount()
            else:
                g[out] = getattr(grp[src], agg)()
        for out, kind in rank_aggs.items():
            if kind == "row_number":
                g[out] = (grp.cumcount() + 1).astype("int64")
            elif kind == "rank":
                g[out] = grp[order_col].rank(method="min").astype(
                    "int64")
            elif kind == "dense_rank":
                g[out] = grp[order_col].rank(method="dense").astype(
                    "int64")
            else:  # percent_rank = (rank - 1) / (n - 1), 0 if n == 1
                r = grp[order_col].rank(method="min").to_numpy()
                n = grp[order_col].transform("size").to_numpy()
                g[out] = np.where(n > 1, (r - 1) / np.maximum(n - 1, 1),
                                  0.0)
        return g.drop(columns=["_rb"], errors="ignore")

    return (
        _with_group_bucket(ds, key_col, num_buckets)
        .groupby("_rb")
        .map_groups(resolve_bucket, batch_format="pandas")
    )
