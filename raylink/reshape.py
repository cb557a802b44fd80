"""Arrow-native table reshaping: explode a list column into rows and
unnest a struct column into flat columns — SQL's ``UNNEST`` in both
flavors (tests/test_reshape.py compares against DuckDB UNNEST).

Both are pure per-batch Arrow kernel work inside ``map_batches`` —
``pc.list_flatten`` / ``pc.list_parent_indices`` / ``Table.flatten``,
no Python row loop, no shuffle — so they stream at any scale."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def explode_table(batch: pa.Table, col: str,
                  out_col: str | None = None,
                  keep_empty: bool = False) -> pa.Table:
    """One output row per element of ``batch[col]`` (a list column);
    the other columns repeat. Empty and null lists drop their row
    (DuckDB/Spark UNNEST semantics) unless ``keep_empty`` — then they
    keep one row with a null element (LEFT JOIN UNNEST semantics)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
        raise ValueError(
            f"explode: column {col!r} is {arr.type}, not a list type")
    if out_col and out_col != col and out_col in batch.column_names:
        # Arrow happily builds duplicate-named columns; fail here like
        # unnest_struct does, not at some downstream select (r4 review)
        raise ValueError(
            f"explode: output column {out_col!r} already exists "
            f"— pass a different out_col")
    if keep_empty:
        # null/empty lists -> [null], so every input row survives once
        lens = pc.fill_null(pc.list_value_length(arr), 0)
        empty = pc.equal(lens, 0)
        one_null = pa.array([[None]] * batch.num_rows, type=arr.type)
        arr = pc.if_else(empty, one_null, arr)
    flat = pc.list_flatten(arr)
    parents = pc.list_parent_indices(arr)
    out = batch.drop_columns([col]).take(parents)
    return out.append_column(out_col or col, flat)


def explode(ds, col: str, out_col: str | None = None,
            keep_empty: bool = False):
    """Dataset wrapper over :func:`explode_table`."""
    def fn(batch: pa.Table) -> pa.Table:
        return explode_table(batch, col, out_col, keep_empty)

    return ds.map_batches(fn, batch_format="pyarrow")


def unnest_struct_table(batch: pa.Table, col: str,
                        prefix: str | None = None) -> pa.Table:
    """Replace struct column ``col`` with one flat column per field
    (named ``{prefix}{field}``; default prefix ``{col}_``). A null
    struct yields nulls in every field column — same as DuckDB
    ``UNNEST(s)`` in the SELECT list."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_struct(arr.type):
        raise ValueError(
            f"unnest_struct: column {col!r} is {arr.type}, not a struct")
    pre = f"{col}_" if prefix is None else prefix
    out = batch.drop_columns([col])
    for field in arr.type:
        name = f"{pre}{field.name}"
        if name in out.column_names:
            raise ValueError(
                f"unnest_struct: output column {name!r} already exists "
                f"— pass a different prefix")
        # struct-level nulls mask the child values (combine_chunks
        # pushed validity down is NOT guaranteed; apply explicitly)
        child = arr.field(field.name)
        if arr.null_count:
            child = pc.if_else(pc.is_valid(arr), child,
                               pa.scalar(None, type=field.type))
        out = out.append_column(name, child)
    return out


def unnest_struct(ds, col: str, prefix: str | None = None):
    """Dataset wrapper over :func:`unnest_struct_table`."""
    def fn(batch: pa.Table) -> pa.Table:
        return unnest_struct_table(batch, col, prefix)

    return ds.map_batches(fn, batch_format="pyarrow")


def crosstab_counts(ds, row_col: str, col_col: str,
                    col_values: list | None = None,
                    margins: bool = False, all_label: str = "__all__"):
    """Distributed contingency table (pandas ``crosstab`` / SQL
    conditional-aggregation PIVOT): one row per ``row_col`` value,
    one ``n_<v>`` int64 column per ``col_col`` value, plus ``total``;
    ``margins=True`` appends an ``all_label`` row of column sums.

    Shape at scale: per-batch Arrow hash pre-aggregation (the shuffle
    moves one row per (row, col) pair per batch, never raw rows), one
    global two-key groupby-Sum, then a driver pivot of the AGGREGATED
    result — which is exactly the operator's own output size
    (distinct(row) x distinct(col)), so collecting it is the contract,
    not a scale leak. Pass ``col_values`` to pin the output schema
    independent of which values a given input happens to contain
    (unseen values become all-zero columns; extra values error).
    Returns a pandas DataFrame sorted by ``row_col``.

    NULL keys are rejected up front: Ray's sort-based groupby cannot
    order NULL string keys and pandas pivot_table silently drops NaN
    index/column groups — either way the result would diverge from a
    SQL GROUP BY twin, so fill or filter nulls upstream (r4 review)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        agg = (batch.select([row_col, col_col])
               .group_by([row_col, col_col])
               .aggregate([([], "count_all")]))
        for c in (row_col, col_col):
            if agg.column(c).null_count:
                raise ValueError(
                    f"crosstab_counts: NULL values in key column "
                    f"{c!r} — fill_null or filter upstream (NULL "
                    f"pivot keys have no stable column name and "
                    f"pandas pivot_table drops them silently)")
        return agg.rename_columns([row_col, col_col, "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([row_col, col_col]).sum("n")
        .to_pandas()
    )
    ncol = "sum(n)" if "sum(n)" in agg.columns else "n"
    pivot = agg.pivot_table(index=row_col, columns=col_col,
                            values=ncol, aggfunc="sum", fill_value=0)
    seen = list(pivot.columns)
    if col_values is None:
        col_values = sorted(seen)
    else:
        extra = set(seen) - set(col_values)
        if extra:
            raise ValueError(
                f"crosstab_counts: input contains {col_col} values not "
                f"in col_values: {sorted(extra)}")
    out = pd.DataFrame({row_col: pivot.index.to_list()})
    for v in col_values:
        out[f"n_{v}"] = (
            pivot[v].to_numpy() if v in pivot.columns else 0)
        out[f"n_{v}"] = out[f"n_{v}"].astype("int64")
    out["total"] = out[[f"n_{v}" for v in col_values]].sum(axis=1)
    out = out.sort_values(row_col, kind="mergesort").reset_index(
        drop=True)
    if margins:
        sums = {row_col: all_label}
        for c in out.columns[1:]:
            sums[c] = int(out[c].sum())
        out = pd.concat([out, pd.DataFrame([sums])],
                        ignore_index=True)
    return out


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """Wide-to-long unpivot (SQL UNPIVOT / pandas ``melt``), the
    inverse reshape of :func:`crosstab_counts`: each input row emits
    one output row per entry in ``value_cols``, carrying ``id_cols``,
    the source column name in ``var_name`` and its value in
    ``value_name``. Pure per-batch Arrow concat — no shuffle, no
    Python row loop; streams at any scale. Value columns must share
    one Arrow type (cast upstream otherwise — silent casts here would
    hide precision loss)."""

    clash = {var_name, value_name} & set(id_cols)
    if clash:
        # explode/unnest_struct raise on output-name collisions; melt
        # silently overwrote the id column via dict-key collision
        # (code-review r5)
        raise ValueError(
            f"melt: var_name/value_name {sorted(clash)} collide with "
            f"id_cols — pick different output names")

    def fn(batch: pa.Table) -> pa.Table:
        types = {str(batch.schema.field(c).type) for c in value_cols}
        if len(types) > 1:
            raise ValueError(
                f"melt: value_cols mix Arrow types {sorted(types)}; "
                f"cast them to one type first")
        pieces = []
        for c in value_cols:
            cols = {k: batch.column(k) for k in id_cols}
            cols[var_name] = pa.array([c] * len(batch), pa.string())
            cols[value_name] = batch.column(c)
            pieces.append(pa.table(cols))
        if not pieces:
            return pa.table({k: batch.column(k) for k in id_cols})
        return pa.concat_tables(pieces)

    return ds.map_batches(fn, batch_format="pyarrow")
