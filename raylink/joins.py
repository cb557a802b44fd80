"""Join helpers on ray.data.Dataset: hash equi-join wrapper,
broadcast semi/anti joins, positional (index) join.

Patterns per the Ray Data guide: big-big -> ``Dataset.join`` (hash
shuffle, Ray >= 2.46); small side -> broadcast via ``ray.put`` and filter
inside ``map_batches`` (no shuffle). The reference's anti-joins
(unmatched_left/right, addresskit/match.py:233-260) and id equi-joins
(scripts/eval.py:21, make_match_preview.py:15-30) map onto these.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

from .blocks import dataset_schema as _pa_schema


def join_partitions(requested: int | None = None) -> int:
    """Session-sized hash-join partition count.

    Each partition gets a HashShuffleAggregator ACTOR that pins a CPU
    for the whole join; aggregators compete with the map tasks feeding
    them, so partitions ~ CPUs starves the upstream stages. Measured on
    a 32-CPU node (345k-row candidate join, sf0.1): num_partitions=32
    -> 21.7 s, num_partitions=8 -> 3.8 s. cpus//4 keeps 3/4 of the node
    free for producers; callers joining very large inputs (where a
    partition must fit in one aggregator's heap) should pass
    ``num_partitions`` explicitly."""
    if requested is not None:
        return requested
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(2, min(64, cpus // 4))


def hash_join(left, right, on: str, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int | None = None):
    """Hash-partitioned equi-join (wraps Dataset.join)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=join_partitions(num_partitions),
        on=(on,),
        right_on=(right_on,) if right_on else None,
    )


def _collect_key_set(keys_ds_or_iterable, key: str | None = None) -> set:
    if hasattr(keys_ds_or_iterable, "iter_batches"):
        out: set = set()
        for b in keys_ds_or_iterable.select_columns([key]).iter_batches(
            batch_format="pyarrow"
        ):
            out.update(b.column(key).to_pylist())
        return out
    return set(keys_ds_or_iterable)


def _make_membership_mask_fn(key: str, ref, has_null: bool):
    """Vectorized membership via pc.is_in (VERDICT r1 #8 replaced a
    per-row Python loop). Nulls match iff the key set contains None —
    same semantics as ``v in key_set``. The typed Arrow value-set is
    built once per worker process (closure cache), not per batch."""
    cache: dict = {}

    def mask_fn(batch: pa.Table) -> pa.Array:
        col = batch.column(key)
        if col.type not in cache:
            ks = ray.get(ref)
            try:
                cache[col.type] = pa.array(ks, type=col.type)
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError):
                cache[col.type] = set(ks)
        vs = cache[col.type]
        if isinstance(vs, set):
            return pa.array([v in vs or (v is None and has_null)
                             for v in col.to_pylist()])
        mask = pc.fill_null(pc.is_in(col, value_set=vs), False)
        if has_null:
            mask = pc.or_(mask, pc.is_null(col))
        return mask

    return mask_fn


def broadcast_semi_join(ds, keys, key: str, keys_key: str | None = None):
    """Keep rows whose ``key`` is in the (small) key set. The set is
    ray.put once and read per worker — broadcast, not re-shipped per
    batch."""
    key_set = _collect_key_set(keys, keys_key or key)
    has_null = None in key_set
    ref = ray.put(sorted((k for k in key_set if k is not None), key=str))
    mask_fn = _make_membership_mask_fn(key, ref, has_null)

    def _filter(batch: pa.Table) -> pa.Table:
        return batch.filter(mask_fn(batch))

    return ds.map_batches(_filter, batch_format="pyarrow")


def broadcast_anti_join(ds, keys, key: str, keys_key: str | None = None):
    """Keep rows whose ``key`` is NOT in the (small) key set — the
    reference's unmatched_left/right anti-join (match.py:233-260)."""
    key_set = _collect_key_set(keys, keys_key or key)
    has_null = None in key_set
    ref = ray.put(sorted((k for k in key_set if k is not None), key=str))
    mask_fn = _make_membership_mask_fn(key, ref, has_null)

    def _filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(mask_fn(batch)))

    return ds.map_batches(_filter, batch_format="pyarrow")


def shuffle_anti_join(left, right, on: str, num_partitions: int | None = None):
    """Scale path for anti-join when the right key set is NOT small:
    distinct right keys get a marker column, left-outer hash join, keep
    marker-null rows. All-shuffle; prefer broadcast_anti_join when the
    key set fits in memory.

    NULL semantics match broadcast_anti_join (the reference's Python
    ``v in key_set``): a null key MATCHES a null key, so null-keyed
    left rows are dropped iff the right side contains a null key. A
    plain left-outer hash join never matches nulls, so without the
    explicit null handling below the two paths silently diverged on
    null-keyed rows (code-review r5)."""
    marker = "_aj_marker"
    # distinct right keys as a Dataset (Dataset.unique returns a Python
    # list): per-batch arrow distinct pre-aggregation, then ONE
    # vectorized Count aggregate — no per-distinct-key pandas groups
    # (VERDICT r1 #6)
    from ray.data.aggregate import Count

    def _distinct(batch: pa.Table) -> pa.Table:
        return batch.select([on]).group_by(on).aggregate([])

    rk = (
        right.map_batches(_distinct, batch_format="pyarrow")
        .groupby(on)
        .aggregate(Count(alias_name="_aj_cnt"))
    )

    def _mark(batch: pa.Table) -> pa.Table:
        keep = batch.drop_columns(["_aj_cnt"]) \
            if "_aj_cnt" in batch.column_names else batch
        return keep.append_column(
            marker, pa.array([1] * keep.num_rows, pa.int8())
        )

    # materialized: consumed twice (null-key probe + the join); rk is
    # one row per DISTINCT right key, the small shape by construction
    rk = rk.map_batches(_mark, batch_format="pyarrow").materialize()

    def _null_count(batch: pa.Table) -> pa.Table:
        n = batch.filter(pc.is_null(batch.column(on))).num_rows
        return pa.table({"n": pa.array([n], pa.int64())})

    has_null = bool(rk.map_batches(
        _null_count, batch_format="pyarrow").sum("n") or 0)

    joined = left.join(rk, join_type="left_outer",
                       num_partitions=join_partitions(num_partitions),
                       on=(on,))

    def _keep_unmatched(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch.column(marker))
        if has_null:
            # a null right key matches null left keys: drop them too
            mask = pc.and_(mask, pc.is_valid(batch.column(on)))
        return batch.filter(mask).drop_columns([marker])

    return joined.map_batches(_keep_unmatched, batch_format="pyarrow")


def positional_join(left, right, left_id: str, right_id: str,
                    score: float = 1.0):
    """Index (positional) join: zip rows 0..min(n,m) with fixed score —
    the reference's fast-test ``method: index`` (match.py:155-164).
    Driver-side zip on collected ids (debug-only mode, small inputs)."""
    lids = [r[left_id] for r in left.select_columns([left_id]).take_all()]
    rids = [r[right_id] for r in right.select_columns([right_id]).take_all()]
    n = min(len(lids), len(rids))
    import ray.data as rd

    return rd.from_items(
        [
            {"left_id": lids[i], "right_id": rids[i], "score": score}
            for i in range(n)
        ]
    )


def _check_name_collisions(op: str, lcols, renamed_rcols, helpers):
    """Fail fast (ADVICE r3): the co-shuffle injects helper columns and
    suffix-renamed right columns into one pinned union schema — a left
    column named like a helper, or a renamed right column colliding
    with a left column, would silently corrupt that schema or surface
    as a confusing Arrow error mid-shuffle."""
    lset = set(lcols)
    bad_helpers = [h for h in helpers if h in lset or h in renamed_rcols]
    if bad_helpers:
        raise ValueError(
            f"{op}: column name(s) {bad_helpers} are reserved internal "
            f"helper names — rename those input columns")
    clash = sorted(set(renamed_rcols) & lset)
    if clash:
        raise ValueError(
            f"{op}: suffix-renamed right column(s) {clash} collide with "
            f"left columns — pick a different suffix")


def asof_join(left, right, on: str, by: str,
              suffix: str = "_r", direction: str = "backward",
              num_buckets: int = 64, keep_unmatched: bool = False):
    """Distributed as-of join (Ray Data has no native one): for each
    left row, attach the nearest right row with ``right.on <= left.on``
    (direction="backward"; "forward" flips the inequality) among rows
    sharing the same ``by`` key — the streaming/point-in-time join
    DuckDB spells ``ASOF JOIN`` and pandas ``merge_asof``.

    Scale shape: ONE co-shuffle. Both sides are tagged and hash-bucketed
    on ``by`` into <= ``num_buckets`` groups (same bounded-bucket
    pattern as the session/topk operators — never one pandas frame per
    key), then each bucket is resolved with a single C-level
    ``pd.merge_asof`` over the sorted bucket. Partitioning assumption:
    each bucket (sum of both sides for its key range) fits one worker's
    heap; raise ``num_buckets`` for bigger inputs or saltier keys.

    Right columns (except ``by``) are renamed with ``suffix``. Ties on
    (by, on) pick the LAST right row in (on, original order) — callers
    needing a deterministic tiebreak should pre-dedupe the right side.
    With ``keep_unmatched=False`` (default) unmatched left rows are
    dropped (DuckDB's inner ``ASOF JOIN``); True keeps them with null
    right columns (``ASOF LEFT JOIN``) at their DECLARED Arrow types —
    no pandas float64/NaN upcast (value columns never round-trip
    through pandas, so int64 beyond 2^53, e.g. epoch-ns, stays exact).

    Nulls: right rows with a null ``on`` are dropped up front (never
    selectable). A null ``by`` matches nothing (SQL semantics) —
    null-keyed rows are split out on the Arrow side before the pandas
    merge, so an int ``by`` column with nulls never NaN-promotes (keys
    beyond 2^53 stay exact) and under ``keep_unmatched`` the null-key
    left rows come back with null right columns. Null LEFT ``on``
    values are not supported — merge_asof raises on unsortable keys
    (loud, not silent); filter them upstream."""
    import numpy as np
    import pandas as pd

    left_schema = _pa_schema(left)
    right_schema = _pa_schema(right)
    lcols = list(left_schema.names)
    rcols = [c for c in right_schema.names if c != by]
    ren = {c: c + suffix for c in rcols}
    _check_name_collisions("asof_join", lcols, list(ren.values()),
                           ["_ab", "_aside"])
    out_on_r = ren[on] if on in ren else on
    # ONE pinned union schema (both sides null-pad the other's columns
    # — unioning two different schemas breaks the groupby shuffle)
    full = pa.schema(
        [left_schema.field(by)]
        + [left_schema.field(c) for c in lcols if c != by]
        + [right_schema.field(c).with_name(ren[c]) for c in rcols]
        + [pa.field("_ab", pa.int32()), pa.field("_aside", pa.int8())]
    )

    def tag(side: int, renames):
        def fn(t: pa.Table) -> pa.Table:
            if renames:
                t = t.rename_columns(
                    [renames.get(c, c) for c in t.column_names])
            if side == 1:
                # a right row with a null `on` is never selectable
                # (SQL: the asof inequality is non-true on NULL);
                # dropping it here also keeps a null-containing int64
                # `on` batch from reaching merge_asof as float64
                t = t.filter(pc.is_valid(t.column(out_on_r)))
            n = t.num_rows
            # stable_hash_array, not hash_array(to_numpy()): an int
            # `by` batch containing a NULL would otherwise hash its
            # keys through float64 and split one key across buckets,
            # silently dropping asof matches (code-review r4)
            from .blocks import stable_hash_array

            hb = (stable_hash_array(t.column(by))
                  % np.uint64(num_buckets)).astype(np.int32)
            t = t.append_column("_ab", pa.array(hb))
            t = t.append_column(
                "_aside", pa.array(np.full(n, side, dtype=np.int8)))
            cols = [
                t.column(f.name) if f.name in t.column_names
                else pa.nulls(n, f.type)
                for f in full
            ]
            return pa.Table.from_arrays(cols, schema=full)
        return fn

    tagged = left.map_batches(tag(0, None), batch_format="pyarrow") \
        .union(right.map_batches(tag(1, ren), batch_format="pyarrow"))

    out_schema = pa.schema(
        [left_schema.field(c) for c in lcols]
        + [right_schema.field(c).with_name(ren[c]) for c in rcols]
    )
    out_cols = [f.name for f in out_schema]

    rcols_ren = [ren[c] for c in rcols]

    def merge_bucket(g: pa.Table) -> pa.Table:
        # The asof itself runs on a NARROW (by, on, row-index) frame and
        # the output is assembled with Arrow ``take`` on the original
        # exact columns — the union-padded bucket never round-trips
        # value columns through pandas float64, which is lossy beyond
        # 2^53 (epoch-ns int64 timestamps). Row indices are always
        # < 2^53, so they survive the float NaN-upcast unharmed, and a
        # MASKED take index yields null rows for unmatched lefts.
        if "_aside" not in g.column_names or g.num_rows == 0:
            return out_schema.empty_table()
        side = g.column("_aside")
        lt = g.filter(pc.equal(side, 0)).select(lcols)
        rt = g.filter(pc.equal(side, 1)).select([by] + rcols_ren)
        # SQL: a NULL by-key matches nothing — split those rows out on
        # the ARROW side before the narrow frame, so the pandas `by`
        # column never NaN-promotes (an int64 by stays int64: exact
        # beyond 2^53, and merge_asof's same-dtype check passes
        # instead of rejecting the whole bucket) (code-review r4)
        null_lt = None
        if lt.num_rows and lt.column(by).null_count:
            lmask = pc.is_valid(lt.column(by))
            null_lt = lt.filter(pc.invert(lmask))
            lt = lt.filter(lmask)
        if rt.num_rows and rt.column(by).null_count:
            rt = rt.filter(pc.is_valid(rt.column(by)))
        import numpy as np

        lk = lt.select([by, on]).to_pandas()
        lk["_li"] = np.arange(len(lk), dtype=np.int64)
        lk = lk.sort_values(on, kind="mergesort")
        if rt.num_rows == 0:
            ri = np.full(len(lk), np.nan)
            li = lk["_li"].to_numpy()
        else:
            rk = rt.select([by, out_on_r]).to_pandas()
            rk["_ri"] = np.arange(len(rk), dtype=np.int64)
            rk = rk.sort_values(out_on_r, kind="mergesort")
            m = pd.merge_asof(lk, rk, left_on=on, right_on=out_on_r,
                              by=by, direction=direction)
            li = m["_li"].to_numpy()
            ri = m["_ri"].to_numpy(dtype=np.float64, na_value=np.nan)
        valid = ~np.isnan(ri)
        if not keep_unmatched:
            li = li[valid]
            ri = ri[valid]
            valid = np.ones(len(li), dtype=bool)
        ltab = lt.take(pa.array(li, pa.int64()))
        ridx = pa.array(np.where(valid, ri, 0).astype(np.int64),
                        mask=~valid)
        rtab = rt.select(rcols_ren).take(ridx)
        out = pa.Table.from_arrays(
            [ltab.column(c) for c in lcols]
            + [rtab.column(c) for c in rcols_ren],
            schema=out_schema)
        if keep_unmatched and null_lt is not None and null_lt.num_rows:
            # left rows with a NULL by-key are unmatched by definition
            pad = pa.Table.from_arrays(
                [null_lt.column(c) for c in lcols]
                + [pa.nulls(null_lt.num_rows, out_schema.field(c).type)
                   for c in rcols_ren],
                schema=out_schema)
            out = pa.concat_tables([out, pad])
        return out

    return (
        tagged.groupby("_ab")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def band_join(left, right, on: str, delta, by: str | None = None,
              suffix: str = "_r", num_buckets: int = 64):
    """Distributed band (range) join: all pairs (l, r) with
    ``|l.on - r.on| <= delta``, optionally restricted to rows sharing a
    ``by`` key — the range predicate DuckDB spells
    ``JOIN ... ON abs(l.x - r.x) <= d`` (Ray Data has no native
    inequality join). ``on`` must be numeric on both sides (cast
    timestamps to epoch integers first); ``delta`` must be > 0.

    Scale shape: ONE co-shuffle, bounded replication. Values are binned
    at width ``delta``; a qualifying pair's bins differ by at most 1,
    so the RIGHT side is replicated to its 3 adjacent bins (x3, one
    side only) and an equi-join on ([by,] bin) meets every qualifying
    pair EXACTLY once (the left row's own bin picks one replica), then
    the exact ``|diff| <= delta`` filter runs vectorized per bucket.
    (bin, by) pairs are hash-bucketed into <= ``num_buckets`` shuffle
    groups; each bucket resolves with one C-level pandas merge — never
    one frame per key. Partitioning assumption: the rows of any single
    bucket (x3 right replicas included) fit one worker's heap; raise
    ``num_buckets`` for bigger inputs, and note a band much wider than
    the value spread degenerates to a cross join by construction.

    ALL right columns (including ``on``) are renamed with ``suffix``;
    ``by`` is kept once. Inner join: left rows with no partner are
    dropped."""
    import numpy as np
    import pandas as pd

    if not delta > 0:
        raise ValueError("band_join: delta must be > 0")

    left_schema = _pa_schema(left)
    right_schema = _pa_schema(right)
    lcols = list(left_schema.names)
    rcols = [c for c in right_schema.names if c != by]
    ren = {c: c + suffix for c in rcols}
    _check_name_collisions("band_join", lcols, list(ren.values()),
                           ["_bin", "_bb", "_bside"])
    keycols = ([by] if by else [])

    full = pa.schema(
        ([left_schema.field(by)] if by else [])
        + [left_schema.field(c) for c in lcols if c != by]
        + [right_schema.field(c).with_name(ren[c]) for c in rcols]
        + [pa.field("_bin", pa.int64()), pa.field("_bb", pa.int32()),
           pa.field("_bside", pa.int8())]
    )

    def bucket_of(bins: "np.ndarray", t: pa.Table) -> "np.ndarray":
        h = bins.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        if by:
            # stable vs null-driven float64 promotion (code-review r4)
            from .blocks import stable_hash_array

            h = h + stable_hash_array(t.column(by))
        return (h % np.uint64(num_buckets)).astype(np.int32)

    def pad(t: pa.Table, bins, side: int) -> pa.Table:
        n = t.num_rows
        t = t.append_column("_bin", pa.array(bins, pa.int64()))
        t = t.append_column("_bb", pa.array(bucket_of(bins, t)))
        t = t.append_column(
            "_bside", pa.array(np.full(n, side, dtype=np.int8)))
        cols = [
            t.column(f.name) if f.name in t.column_names
            else pa.nulls(n, f.type)
            for f in full
        ]
        return pa.Table.from_arrays(cols, schema=full)

    def binned(v: "np.ndarray") -> "np.ndarray":
        # int64 epochs exceed float64's 2^53 exact range — keep the
        # integer path integer (exact), floats use float floor-div
        if v.dtype.kind in "iu" and float(delta) == int(delta):
            return np.floor_divide(v.astype(np.int64), int(delta))
        return np.floor_divide(v.astype(np.float64),
                               float(delta)).astype(np.int64)

    def drop_null_keys(t: pa.Table, on_name: str) -> pa.Table:
        """SQL semantics: a NULL in the band column or the equi-key
        makes the join predicate non-true, so the row cannot match —
        drop it HERE, on the Arrow side. Letting nulls through would
        (a) wrongly pair NULL by-keys in the pandas merge (NaN == NaN
        there), and (b) promote a null-containing int64 band column to
        float64, corrupting bins beyond 2^53 for the whole batch
        (code-review r4)."""
        mask = pc.is_valid(t.column(on_name))
        if by:
            mask = pc.and_(mask, pc.is_valid(t.column(by)))
        return t.filter(mask)

    def tag_left(t: pa.Table) -> pa.Table:
        t = drop_null_keys(t, on)
        v = t.column(on).to_numpy(zero_copy_only=False)
        return pad(t, binned(v), 0)

    def tag_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([ren.get(c, c) for c in t.column_names])
        t = drop_null_keys(t, ren[on])
        v = t.column(ren[on]).to_numpy(zero_copy_only=False)
        b = binned(v)
        reps = [pad(t, b + off, 1) for off in (-1, 0, 1)]
        return pa.concat_tables(reps)

    tagged = left.map_batches(tag_left, batch_format="pyarrow") \
        .union(right.map_batches(tag_right, batch_format="pyarrow"))

    out_schema = pa.schema(
        [left_schema.field(c) for c in lcols]
        + [right_schema.field(c).with_name(ren[c]) for c in rcols]
    )
    out_cols = [f.name for f in out_schema]

    def merge_bucket(g: pa.Table) -> pa.Table:
        # pandas sees ONLY the key/band/bin columns (null-free by
        # drop_null_keys) plus positional indices; payload columns are
        # reassembled with Arrow take. Converting whole sides promoted
        # any GENUINELY-null int64 payload column (e.g. epoch-ns with
        # missing rows) to float64, and the cast back to int64 silently
        # corrupted values beyond 2^53 (code-review r5; same
        # reassembly pattern as asof_join).
        if "_bside" not in g.column_names or g.num_rows == 0:
            return out_schema.empty_table()
        side = g.column("_bside")
        lt = g.filter(pc.equal(side, 0))
        rt = g.filter(pc.equal(side, 1))
        if lt.num_rows == 0 or rt.num_rows == 0:
            return out_schema.empty_table()
        lf = lt.select(keycols + [on, "_bin"]).to_pandas()
        lf["_li"] = np.arange(len(lf), dtype=np.int64)
        rf = rt.select(keycols + [ren[on], "_bin"]).to_pandas()
        rf["_ri"] = np.arange(len(rf), dtype=np.int64)
        out = lf.merge(rf, on=keycols + ["_bin"], how="inner")
        keep = ((out[on] - out[ren[on]]).abs() <= delta).to_numpy()
        li = pa.array(out["_li"].to_numpy()[keep])
        ri = pa.array(out["_ri"].to_numpy()[keep])
        lsel = lt.select(lcols).take(li)
        rsel = rt.select([ren[c] for c in rcols]).take(ri)
        cols = [lsel.column(c) if c in lsel.column_names
                else rsel.column(c) for c in out_cols]
        return pa.Table.from_arrays(cols, schema=out_schema)

    return (
        tagged.groupby("_bb")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


_EARTH_R_KM = 6371.0088  # same sphere as raylink.scoring.haversine_km_vec


def spatial_precision_for_radius(radius_km: float,
                                 max_abs_lat: float = 75.0) -> int:
    """Finest geohash precision whose cell spans the maximum possible
    coordinate difference of any point pair within ``radius_km``
    haversine km inside the band ``|lat| <= max_abs_lat`` — the EXACT
    spherical bounds (same R as the verify kernel), not km-per-degree
    approximations, so the 3x3-neighbor cover is sound at the boundary:

    - ``|dlat| <= radius / R`` (a meridian is the shortest path
      realizing a latitude difference);
    - ``sin(|dlon|/2) <= sin(radius/2R) / cos(max_abs_lat)`` (the
      haversine lon term carries ``cos(lat1)cos(lat2) >=
      cos^2(max_abs_lat)`` inside the band)."""
    import math

    if not radius_km > 0:
        raise ValueError("spatial join: radius_km must be > 0")
    if not 0 < max_abs_lat < 90:
        raise ValueError("spatial join: max_abs_lat must be in (0, 90)")
    max_dlat_deg = math.degrees(radius_km / _EARTH_R_KM)
    s = (math.sin(radius_km / (2.0 * _EARTH_R_KM))
         / math.cos(math.radians(max_abs_lat)))
    max_dlon_deg = 360.0 if s >= 1.0 else math.degrees(2.0 * math.asin(s))
    best = None
    for p in range(1, 13):
        nbits = 5 * p
        cell_lat_deg = 180.0 / (1 << (nbits // 2))
        cell_lon_deg = 360.0 / (1 << ((nbits + 1) // 2))
        if cell_lat_deg >= max_dlat_deg and cell_lon_deg >= max_dlon_deg:
            best = p
        else:
            break
    if best is None:
        raise ValueError(
            f"spatial join: radius {radius_km} km exceeds the coarsest "
            f"geohash cell inside |lat| <= {max_abs_lat}")
    return best


def spatial_self_join(ds, id_col: str, radius_km: float,
                      lat_col: str = "lat", lon_col: str = "lon",
                      max_abs_lat: float = 75.0,
                      precision: int | None = None,
                      num_buckets: int = 64):
    """Distributed spatial near-self-join: all pairs of rows within
    ``radius_km`` great-circle km (haversine, same kernel/constants as
    raylink.scoring), emitted once each as (left_id, right_id, dist_km)
    with ``left_id < right_id``. The geo analogue of
    ``band_join`` — the predicate DuckDB spells
    ``JOIN ... ON haversine(a, b) <= r`` (tests/test_spatial_join.py
    checks pair-set equality against exactly that oracle).

    Scale shape: ONE co-shuffle, bounded x10 replication of a 4-column
    projection (id, lat, lon, cell) — never the payload. Points are
    quantized to geohash cells (:func:`raylink.blocking.geo_cell_coords`)
    at the finest precision whose cell spans >= radius in both axes
    within ``|lat| <= max_abs_lat``; each point ships once as the
    ANCHOR of its own cell and 9x as a REPLICA into its 3x3 neighbor
    cells (ix wraps at the antimeridian, iy skips past the poles — skip,
    not clamp, so no duplicate replicas). Any qualifying pair differs by
    <= 1 cell per axis, so anchor a meets b's unique replica in a's
    cell; ``left_id < right_id`` keeps exactly one of the two symmetric
    meetings. Cells are hash-bucketed into <= ``num_buckets`` shuffle
    groups; each bucket resolves with one C-level pandas merge on the
    cell id plus a vectorized haversine filter. Partitioning
    assumptions: one bucket (x10 replicas) fits a worker's heap (raise
    ``num_buckets`` for bigger inputs), and cells are small relative to
    the data spread — a radius comparable to the whole extent
    degenerates to a cross join by construction, same as band_join.

    Rows with NaN / out-of-world coordinates or ``|lat| > max_abs_lat``
    raise (loud, like every bound in this repo) — filter first. Pass
    ``precision`` to override the radius-derived cell size (finer cells
    = more cells = better balance, but the >= radius cover bound must
    hold: values finer than the derived one are rejected)."""
    import numpy as np
    import pandas as pd

    derived = spatial_precision_for_radius(radius_km, max_abs_lat)
    if precision is None:
        precision = derived
    elif precision > derived:
        raise ValueError(
            f"spatial join: precision {precision} has cells narrower "
            f"than radius {radius_km} km at |lat| <= {max_abs_lat} "
            f"(finest sound precision: {derived})")
    from .blocking import geo_cell_coords

    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    nx = 1 << lon_bits
    ny = 1 << lat_bits

    in_schema = _pa_schema(ds)
    id_field = in_schema.field(id_col)
    tag_schema = pa.schema([
        pa.field("_sid", id_field.type),
        pa.field("_slat", pa.float64()),
        pa.field("_slon", pa.float64()),
        pa.field("_scell", pa.int64()),
        pa.field("_sb", pa.int32()),
        pa.field("_sside", pa.int8()),
    ])
    out_schema = pa.schema([
        pa.field("left_id", id_field.type),
        pa.field("right_id", id_field.type),
        pa.field("dist_km", pa.float64()),
    ])

    def tag(t: pa.Table) -> pa.Table:
        lat = t.column(lat_col).to_numpy(zero_copy_only=False).astype(
            "float64", copy=False)
        lon = t.column(lon_col).to_numpy(zero_copy_only=False).astype(
            "float64", copy=False)
        ix, iy, valid = geo_cell_coords(lat, lon, precision)
        bad = int((~valid).sum())
        if bad:
            raise ValueError(
                f"spatial join: {bad} row(s) with NaN/out-of-world "
                f"coordinates — filter before joining")
        band = int((np.abs(lat) > max_abs_lat).sum())
        if band:
            raise ValueError(
                f"spatial join: {band} row(s) outside |lat| <= "
                f"{max_abs_lat}; raise max_abs_lat (coarser cells) or "
                f"filter them")
        ids = t.column(id_col)
        ix = ix.astype(np.int64)
        iy = iy.astype(np.int64)

        def part(jx, jy, keep, side):
            if keep is not None:
                jx, jy = jx[keep], jy[keep]
            cell = jx * np.int64(ny) + jy
            h = pd.util.hash_array(cell.astype(np.uint64),
                                   categorize=False)
            cols = [
                ids.filter(pa.array(keep)) if keep is not None else ids,
                pa.array(lat[keep] if keep is not None else lat),
                pa.array(lon[keep] if keep is not None else lon),
                pa.array(cell),
                pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                pa.array(np.full(len(cell), side, dtype=np.int8)),
            ]
            return pa.Table.from_arrays(cols, schema=tag_schema)

        parts = [part(ix, iy, None, 0)]
        for dx in (-1, 0, 1):
            jx = (ix + dx) % np.int64(nx)  # antimeridian wrap
            for dy in (-1, 0, 1):
                jy = iy + dy
                keep = (jy >= 0) & (jy < ny)  # poles: skip, not clamp
                parts.append(part(jx, jy, None if keep.all() else keep, 1))
        return pa.concat_tables(parts)

    from .scoring import haversine_km_vec

    def merge_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_sside" not in g.column_names:
            return out_schema.empty_table()
        side = g.column("_sside")
        af = g.filter(pc.equal(side, 0)).to_pandas()
        rf = g.filter(pc.equal(side, 1)).to_pandas()
        cand = af.merge(rf, on="_scell", suffixes=("", "_r"))
        if not len(cand):
            return out_schema.empty_table()
        d = haversine_km_vec(
            cand["_slat"].to_numpy(), cand["_slon"].to_numpy(),
            cand["_slat_r"].to_numpy(), cand["_slon_r"].to_numpy())
        keep = (d <= radius_km) & (cand["_sid"] < cand["_sid_r"])
        out = pd.DataFrame({
            "left_id": cand["_sid"][keep],
            "right_id": cand["_sid_r"][keep],
            "dist_km": d[keep.to_numpy()],
        })
        return pa.Table.from_pandas(
            out, preserve_index=False).cast(out_schema)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby("_sb").map_groups(
        merge_bucket, batch_format="pyarrow")


def _setop(left, right, keep_l: int, keep_r: int,
           on: list[str] | None = None, num_buckets: int = 64):
    """Shared engine for SQL set operations with DISTINCT semantics.
    Tags each side, pre-aggregates DISTINCT rows + side flags per
    batch (the shuffle moves at most one row per distinct key per
    batch per side), hash-buckets on the combined key (Ray's
    sort-based multi-key groupby cannot order NULL string keys), then
    resolves per-side presence per bucket with an Arrow hash group-by
    — NEVER through pandas, whose int64->float64 null promotion would
    corrupt key values above 2^53 (code-review r4). The bucket hash is
    blocks.stable_hash_columns for the same reason: hashing a
    ``to_numpy()`` view sent the same int key to different buckets
    depending on whether its batch held a NULL, silently breaking
    INTERSECT/EXCEPT. NULL keys compare equal, as in SQL set
    operations. ``keep_l``/``keep_r`` are the required presence flags
    (1 = must be present on that side, 0 = must be absent)."""
    import numpy as np
    import pyarrow.compute as pc

    from .blocks import stable_hash_columns

    cols = on or [c for c in _pa_schema(left).names
                  if c in set(_pa_schema(right).names)]
    if not cols:
        raise ValueError("set operation: no common columns")
    lschema = _pa_schema(left)
    # one pinned key schema (the left side's types); the right side
    # casts into it so int32-vs-int64 sides union cleanly instead of
    # poisoning the shuffle with mixed block schemas
    key_schema = pa.schema([lschema.field(c) for c in cols])

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            d = (batch.select(cols).cast(key_schema)
                 .group_by(cols).aggregate([]))
            hb = (stable_hash_columns(d, cols)
                  % np.uint64(num_buckets)).astype(np.int32)
            out = d.append_column(
                "_sl", pa.array([1 - side] * len(d), pa.int8())
            ).append_column(
                "_sr", pa.array([side] * len(d), pa.int8()))
            return out.append_column("_sb", pa.array(hb))
        return f

    both = (left.map_batches(tag(0), batch_format="pyarrow")
            .union(right.map_batches(tag(1), batch_format="pyarrow")))

    def resolve(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or cols[0] not in g.column_names:
            return key_schema.empty_table()
        agg = g.group_by(cols).aggregate(
            [("_sl", "max"), ("_sr", "max")])
        mask = pc.and_(pc.equal(agg.column("_sl_max"), keep_l),
                       pc.equal(agg.column("_sr_max"), keep_r))
        return agg.filter(mask).select(cols).cast(key_schema)

    return (both.groupby("_sb")
            .map_groups(resolve, batch_format="pyarrow"))


def intersect_distinct(left, right, on: list[str] | None = None):
    """SQL INTERSECT: distinct rows present on BOTH sides (over ``on``
    columns, default = the common columns)."""
    return _setop(left, right, keep_l=1, keep_r=1, on=on)


def except_distinct(left, right, on: list[str] | None = None):
    """SQL EXCEPT: distinct left rows absent from the right side."""
    return _setop(left, right, keep_l=1, keep_r=0, on=on)
