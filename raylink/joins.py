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


def hash_join(left, right, on: str, right_on: str | None = None,
              join_type: str = "inner", num_partitions: int = 16):
    """Hash-partitioned equi-join (wraps Dataset.join)."""
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
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


def broadcast_semi_join(ds, keys, key: str, keys_key: str | None = None):
    """Keep rows whose ``key`` is in the (small) key set. The set is
    ray.put once and read per worker — broadcast, not re-shipped per
    batch."""
    key_set = _collect_key_set(keys, keys_key or key)
    ref = ray.put(key_set)

    def _filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([v in ks for v in batch.column(key).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def broadcast_anti_join(ds, keys, key: str, keys_key: str | None = None):
    """Keep rows whose ``key`` is NOT in the (small) key set — the
    reference's unmatched_left/right anti-join (match.py:233-260)."""
    key_set = _collect_key_set(keys, keys_key or key)
    ref = ray.put(key_set)

    def _filter(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([v not in ks for v in batch.column(key).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def shuffle_anti_join(left, right, on: str, num_partitions: int = 16):
    """Scale path for anti-join when the right key set is NOT small:
    distinct right keys get a marker column, left-outer hash join, keep
    marker-null rows. All-shuffle; prefer broadcast_anti_join when the
    key set fits in memory."""
    marker = "_aj_marker"
    # distinct right keys as a Dataset (Dataset.unique returns a Python
    # list, so dedup via per-batch distinct + groupby instead)
    def _distinct(batch: pa.Table) -> pa.Table:
        t = batch.select([on]).group_by(on).aggregate([])
        return t

    import pandas as pd

    def _first(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    rk = (
        right.map_batches(_distinct, batch_format="pyarrow")
        .groupby(on)
        .map_groups(_first, batch_format="pandas")
    )

    def _mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            marker, pa.array([1] * batch.num_rows, pa.int8())
        )

    rk = rk.map_batches(_mark, batch_format="pyarrow")
    joined = left.join(rk, join_type="left_outer",
                       num_partitions=num_partitions, on=(on,))

    def _keep_unmatched(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch.column(marker))
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
