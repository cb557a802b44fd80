"""EDA / report aggregations re-expressed as Ray Data pipelines
(reference: addresskit/DeepEDA.py — G2-G6 in SURVEY §2.5).

All wide steps pre-aggregate inside ``map_batches`` (one row per key per
batch via Arrow hash aggregation) before the global ``groupby`` — the
shuffle moves partial counts, not raw rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum


def token_frequencies(ds, text_col: str, lowercase: bool = True):
    """Token -> count over the corpus (DeepEDA.py:196-226 n-gram counts,
    unigram case). Partial per-batch counts, then Sum-shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        if lowercase:
            s = pc.utf8_lower(s)
        toks = pc.list_flatten(pc.utf8_split_whitespace(s))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"token": toks})
        agg = t.group_by("token").aggregate([("token", "count")])
        return agg.rename_columns(["token", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("token").aggregate(Sum("n", alias_name="count"))


def ngram_frequencies(ds, text_col: str, n: int = 2):
    """Word n-gram counts (DeepEDA.py:196-226)."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        grams: list[str] = []
        for t in texts:
            toks = (t or "").lower().split()
            grams.extend(
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
        if not grams:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"ngram": pa.array(grams, pa.string())})
        agg = t.group_by("ngram").aggregate([("ngram", "count")])
        return agg.rename_columns(["ngram", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("ngram").aggregate(Sum("n", alias_name="count"))


def value_distribution(ds, col: str):
    """value_counts (DeepEDA.py:106-121 label distribution)."""
    return ds.groupby(col).aggregate(Count(alias_name="count"))


def gini_diversity(ds, col: str) -> float:
    """1 - sum(p^2) over the value distribution (DeepEDA.py:117-121).
    Small-result driver reduce over the aggregated counts."""
    dist = value_distribution(ds, col).to_pandas()
    total = dist["count"].sum()
    if total == 0:
        return 0.0
    p = dist["count"] / total
    return float(1.0 - (p * p).sum())


def missing_report(ds, cols: list[str] | None = None):
    """Per-column null counts (DeepEDA.py:67-72): partial sums per
    batch, single global Sum."""

    def partial(batch: pa.Table) -> pa.Table:
        names = cols or batch.column_names
        out = {"column": pa.array(names, pa.string())}
        nulls = [batch.column(c).null_count for c in names]
        rows = [batch.num_rows] * len(names)
        out["nulls"] = pa.array(nulls, pa.int64())
        out["rows"] = pa.array(rows, pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("column").aggregate(
        Sum("nulls", alias_name="null_count"),
        Sum("rows", alias_name="row_count"),
    )


def numeric_profile(ds, col: str, by: str | None = None):
    """mean/std/min/max (+count) of a numeric column, optionally per
    group (DeepEDA.py:77-101 describe)."""
    aggs = (
        Mean(col, alias_name="mean"),
        Std(col, alias_name="std"),
        Min(col, alias_name="min"),
        Max(col, alias_name="max"),
        Count(alias_name="count"),
    )
    if by:
        return ds.groupby(by).aggregate(*aggs)
    return ds.aggregate(*aggs)


def approx_quantiles(ds, col: str, qs: list[float],
                     sample_per_block: int = 1024,
                     combine_size: int = 64) -> list[float]:
    """Approximate quantiles via a deterministic per-block systematic
    sample (every ceil(n/sample_per_block)-th value of the sorted
    block) — the sample/sketch pattern for G5 (DeepEDA.py:77-101
    describe quantiles). Error shrinks with sample_per_block; exact
    when blocks are smaller than it.

    Scale shape: a tree-combine level re-compresses ~``combine_size``
    block samples back down to ``sample_per_block`` values (sort +
    systematic re-sample — each retained point represents ~step points
    of the level below), so the driver merge sees
    ``O(blocks / combine_size)`` samples instead of one per block (the
    same two-level recipe as learned.fit_classifier_distributed; add
    levels if block counts grow past that). Unequal block sizes weight
    the merge slightly toward small blocks — inherent to the
    unweighted systematic sample, documented since round 1."""
    import numpy as np

    def sampler(in_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            # drop nulls FIRST (group_percentiles' documented
            # exclusion): null -> NaN sorts last, survives the
            # systematic sample, and np.quantile then returns NaN for
            # EVERY quantile off a single null row (code-review r5)
            col = batch.column(in_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = np.sort(
                col.drop_null().to_numpy(zero_copy_only=False))
            n = len(vals)
            if n == 0:
                return pa.table({"v": pa.array([], pa.float64())})
            step = max(1, int(np.ceil(n / sample_per_block)))
            return pa.table({"v": pa.array(vals[::step].astype("float64"))})
        return fn

    sampled = ds.map_batches(sampler(col), batch_format="pyarrow")
    combined = sampled.map_batches(
        sampler("v"), batch_format="pyarrow",
        batch_size=combine_size * sample_per_block)

    merged: list[float] = []
    for b in combined.iter_batches(batch_format="pyarrow"):
        merged.extend(b.column("v").to_pylist())
    if not merged:
        return [float("nan")] * len(qs)
    arr = np.sort(np.asarray(merged))
    return [float(np.quantile(arr, q)) for q in qs]


def histogram(ds, col: str, bins: list[float]):
    """Bucketed counts (pd.cut-style, DeepEDA.py:181-191): vectorized
    bucket assignment per batch + count shuffle. Bin i covers
    [bins[i], bins[i+1]); values outside range are dropped."""
    edges = list(bins)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch.column(col).to_numpy(zero_copy_only=False)
        idx = np.digitize(vals, edges) - 1
        mask = (idx >= 0) & (idx < len(edges) - 1)
        t = pa.table({"bin": pa.array(idx[mask].astype("int32"))})
        if t.num_rows == 0:
            return pa.table({"bin": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        agg = t.group_by("bin").aggregate([("bin", "count")])
        return agg.rename_columns(["bin", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("bin").aggregate(Sum("n", alias_name="count"))


def keyword_presence(ds, text_col: str, keywords: list[str]):
    """Per-keyword total hit counts (DeepEDA.py:143-176 token/variant
    presence sums): vectorized count_substring_regex + global Sum."""

    def partial(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        import re as _re

        kws, hits = [], []
        for kw in keywords:
            # escape: a keyword like 'c++' is an invalid RE2 pattern
            # (ArrowInvalid kills the job) and 'a.b' silently matches
            # 'aXb' (code-review r5). \b only anchors against a WORD
            # edge — applied conditionally so 'c++' (non-word tail)
            # still matches before a space.
            pat = _re.escape(kw)
            if kw and (kw[0].isalnum() or kw[0] == "_"):
                pat = r"\b" + pat
            if kw and (kw[-1].isalnum() or kw[-1] == "_"):
                pat = pat + r"\b"
            kws.append(kw)
            hits.append(
                int(pc.sum(pc.count_substring_regex(s, pat)).as_py() or 0))
        return pa.table({"keyword": pa.array(kws, pa.string()),
                         "hits": pa.array(hits, pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("keyword").aggregate(
        Sum("hits", alias_name="hits"))


def group_percentiles(ds, group_col: str, value_col: str,
                      qs: tuple = (0.25, 0.5, 0.75),
                      num_buckets: int = 64):
    """EXACT per-group order statistics (discrete-percentile
    semantics: the k-th smallest value with k = ceil(q * n), nulls
    excluded) — the exact complement to :func:`approx_quantiles`.

    One hash-bucket co-shuffle (groups -> <= num_buckets buckets, the
    same shape as ranking.top_k_per_group), then a vectorized
    sort+take per bucket; the selected value is an order statistic,
    so tie order inside a group cannot change the result. Output: one
    row per group with a ``p<q>`` column per requested quantile.
    The SQL twin is a row_number() window over (group, value) picking
    rn = CEIL(q * n) — bit-identical by construction."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from raylink.blocks import dataset_schema
    from raylink.ranking import _with_group_bucket

    # "%g" formatting, NOT int(q*100): binary floats truncate
    # (int(0.29*100) == 28) and distinct quantiles collide
    # (0.99 / 0.999 both -> "p99") — code-review r4
    cols = {f"p{float(q * 100):g}".replace(".", "_"): q for q in qs}
    if len(cols) != len(qs):
        raise ValueError(
            f"group_percentiles: duplicate quantiles in {qs!r}")

    schema = dataset_schema(ds)
    # empty guard pinned to the REAL output dtypes (group col and the
    # order-statistic columns keep the input value dtype) — an
    # object/float64 guard block would conflict with non-empty buckets
    empty_schema = pa.schema(
        [schema.field(group_col)]
        + [schema.field(value_col).with_name(c) for c in cols])

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if group_col not in g.columns or len(g) == 0:
            return empty_schema.empty_table().to_pandas()
        g = g[g[value_col].notna()]
        if len(g) == 0:
            return empty_schema.empty_table().to_pandas()
        g = g.sort_values([group_col, value_col], kind="mergesort")
        grp = g.groupby(group_col, sort=False, dropna=False)
        sizes = grp.size()
        starts = np.concatenate(
            ([0], np.cumsum(sizes.to_numpy())[:-1]))
        vals = g[value_col].to_numpy()
        out = {group_col: sizes.index.to_numpy()}
        for name, q in cols.items():
            # NOTE: the float CEIL(q*n) can overshoot by one for some
            # (q, n) pairs (0.07*100 -> 7.000000000000001 -> 8); the
            # SQL twin computes the SAME double expression so parity
            # holds bit-for-bit. The clamp below only prevents the
            # pathological k = n+1 from reading the FIRST VALUE OF THE
            # NEXT GROUP via starts + k - 1 (code-review r5).
            n_g = sizes.to_numpy()
            k = np.ceil(q * n_g).astype(np.int64)
            k = np.minimum(np.maximum(k, 1), n_g)
            out[name] = vals[starts + k - 1]
        return pd.DataFrame(out)

    return (
        _with_group_bucket(ds, group_col, num_buckets)
        .groupby("_rb")
        .map_groups(bucket, batch_format="pandas")
    )
