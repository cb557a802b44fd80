"""Regression tests for code-review r4's dtype-stable hashing fixes.

Root cause under test: ``pd.util.hash_array(col.to_numpy())`` hashes
an int64 Arrow batch through a float64 view whenever THAT BATCH holds
a null — pandas hashes 5 (int64) and 5.0 (float64) differently, so
the same key landed in different hash buckets depending on its
batch-mates, silently splitting one group/key across bucket resolves
(set ops dropped INTERSECT keys, grouped HLL double-registered
values, per-group top-k could emit 2k rows for one group) and
corrupting int ids above 2^53 via the float round-trip
(frequent-items candidates). ``blocks.stable_hash_array`` is the fix;
every operator that keys a co-shuffle on a user column goes through
it now."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.blocks import stable_hash_array, stable_hash_columns


def test_stable_hash_invariant_to_null_batchmates():
    clean = pa.array([5, 6, 7], pa.int64())
    dirty = pa.array([5, None, 6, 7], pa.int64())
    hc = stable_hash_array(clean)
    hd = stable_hash_array(dirty)
    assert hc[0] == hd[0] and hc[1] == hd[2] and hc[2] == hd[3]
    # the naive path really is unstable (the bug this guards against)
    naive_c = pd.util.hash_array(
        clean.to_numpy(zero_copy_only=False), categorize=False)
    naive_d = pd.util.hash_array(
        dirty.to_numpy(zero_copy_only=False), categorize=False)
    assert naive_c[0] != naive_d[0]


def test_stable_hash_dtype_canonicalization():
    h64 = stable_hash_array(pa.array([5], pa.int64()))[0]
    assert stable_hash_array(pa.array([5], pa.int32()))[0] == h64
    assert stable_hash_array(pa.array([5], pa.uint16()))[0] == h64
    # NULL hashes to ONE constant in every dtype
    nulls = [pa.array([None], t)
             for t in (pa.int64(), pa.float64(), pa.string(),
                       pa.bool_(), pa.timestamp("us"))]
    hs = {stable_hash_array(a)[0] for a in nulls}
    assert len(hs) == 1
    # chunked arrays (multi-chunk and zero-chunk) work
    ch = pa.chunked_array([pa.array([5, None], pa.int64()),
                           pa.array([6], pa.int64())])
    hch = stable_hash_array(ch)
    assert hch[0] == h64 and hch[2] == stable_hash_array(
        pa.array([6], pa.int64()))[0]
    empty = pa.chunked_array([], type=pa.int64())
    assert stable_hash_array(empty).shape == (0,)
    # strings with null batch-mates: stable too
    s1 = stable_hash_array(pa.array(["x", "y"]))
    s2 = stable_hash_array(pa.array(["x", None, "y"]))
    assert s1[0] == s2[0] and s1[1] == s2[2]
    # combined-key fold
    t = pa.table({"a": pa.array([1, 1], pa.int64()),
                  "b": pa.array(["p", "q"])})
    hcols = stable_hash_columns(t, ["a", "b"])
    assert hcols[0] != hcols[1]


def test_set_ops_int_keys_with_scattered_nulls(ray_session):
    """INTERSECT/EXCEPT over an int64 key where one batch holds a
    NULL: the old float64-promoted hash bucketed key 5 differently on
    the two sides, silently dropping it from INTERSECT."""
    import duckdb

    from raylink.joins import except_distinct, intersect_distinct

    lt = [pa.table({"k": pa.array([5, 6, None], pa.int64())}),
          pa.table({"k": pa.array([7, 8], pa.int64())})]
    rt = [pa.table({"k": pa.array([5, None], pa.int64())}),
          pa.table({"k": pa.array([8, 9], pa.int64())})]
    lds, rds = rd.from_arrow(lt), rd.from_arrow(rt)
    con = duckdb.connect()
    con.register("l", pa.concat_tables(lt))
    con.register("r", pa.concat_tables(rt))
    for fn, op in ((intersect_distinct, "INTERSECT"),
                   (except_distinct, "EXCEPT")):
        got = sorted(
            (-1 if v is None else v)
            for b in fn(lds, rds).iter_batches(batch_format="pyarrow")
            for v in b.column("k").to_pylist())
        exp = sorted(
            (-1 if v is None else int(v)) for (v,) in con.execute(
                f"SELECT k FROM l {op} SELECT k FROM r").fetchall())
        assert got == exp, (op, got, exp)


def test_set_ops_bigint_keys_exact(ray_session):
    """Key values above 2^53 must come back bit-exact — the old
    pandas resolve stage rounded them through float64."""
    from raylink.joins import intersect_distinct

    big = (1 << 53) + 1
    lds = rd.from_arrow(
        pa.table({"k": pa.array([big, big + 2, None], pa.int64())}))
    rds = rd.from_arrow(pa.table({"k": pa.array([big], pa.int64())}))
    got = [v for b in intersect_distinct(lds, rds)
           .iter_batches(batch_format="pyarrow")
           for v in b.column("k").to_pylist()]
    assert got == [big]


def test_hll_grouped_null_values_ignored_and_invariant(ray_session):
    """Null VALUES must not register; scattered nulls must not change
    the estimate (old path: a null batch-mate re-hashed every value in
    the batch as float64, inflating per-group estimates and breaking
    the partitioning invariance)."""
    from raylink.sketch import hll_count_distinct_by

    rows = [{"g": "ab"[i % 2],
             "v": None if i % 11 == 0 else int(i % 300)}
            for i in range(3000)]

    def got(ds):
        return (hll_count_distinct_by(ds, "v", "g", p=12).to_pandas()
                .sort_values("g").reset_index(drop=True))

    a = got(rd.from_items(rows).repartition(2))
    b = got(rd.from_items(rows).repartition(16))
    pd.testing.assert_frame_equal(a, b)
    clean = [r for r in rows if r["v"] is not None]
    c = got(rd.from_items(clean).repartition(5))
    pd.testing.assert_frame_equal(a, c)


def test_frequent_items_bigint_ids_with_nulls(ray_session):
    """A heavy-hitter id above 2^53 sharing a batch with a NULL must
    be returned bit-exact (old path: float64 value_counts merged
    float-colliding ids and certified a rounded id as exact)."""
    from raylink.sketch import top_frequent_exact

    big = (1 << 53) + 1
    rows = ([{"v": big}] * 10 + [{"v": big + 2}] * 6
            + [{"v": None}] * 3 + [{"v": big + 4}] * 2)
    out = top_frequent_exact(rd.from_items(rows).repartition(3), "v",
                             m=2)
    assert out["v"].tolist() == [big, big + 2]
    assert out["count"].tolist() == [10, 6]


def test_top_k_int_group_keys_with_scattered_nulls(ray_session):
    """One int group must never split across two buckets (the old
    hash sent group 2 to different buckets depending on whether its
    batch held a null key, letting top-k emit up to 2k rows)."""
    from raylink.ranking import top_k_per_group

    rows = [{"g": None if i % 37 == 0 else i % 5, "x": float(i)}
            for i in range(200)]
    out = top_k_per_group(rd.from_items(rows).repartition(7),
                          "g", "x", k=3).to_pandas()
    sizes = out.groupby("g", dropna=False).size()
    assert len(out) == 18 and (sizes == 3).all()  # 5 int groups + null


def test_asof_join_int_by_with_scattered_nulls(ray_session):
    """asof matches must survive a NULL by-key elsewhere in the batch
    (old path: the batch's non-null uids hashed as float64 and missed
    the right side's buckets); null-`on` right rows are dropped."""
    from raylink.joins import asof_join

    left = [pa.table({"uid": pa.array([1, None, 2], pa.int64()),
                      "t": pa.array([10, 20, 30], pa.int64())}),
            pa.table({"uid": pa.array([1], pa.int64()),
                      "t": pa.array([40], pa.int64())})]
    right = pa.table({"uid": pa.array([1, 2, 1], pa.int64()),
                      "t": pa.array([5, 25, None], pa.int64()),
                      "r": pa.array([100, 200, 300], pa.int64())})
    got = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="t", by="uid", num_buckets=4)
           .to_pandas().sort_values(["uid", "t"])
           .reset_index(drop=True))
    # uid1 t=10 -> right t=5; uid1 t=40 -> t=5 (null right t dropped);
    # uid2 t=30 -> t=25; the null-uid left row matches nothing
    assert got["r_r"].tolist() == [100, 100, 200]
    # keep_unmatched: the null-by left row comes back, right cols null
    kept = (asof_join(rd.from_arrow(left), rd.from_arrow(right),
                      on="t", by="uid", num_buckets=4,
                      keep_unmatched=True).to_pandas())
    assert len(kept) == 4
    nullrow = kept[kept["uid"].isna()]
    assert len(nullrow) == 1 and nullrow["r_r"].isna().all()


def test_band_join_null_keys_never_match(ray_session):
    """SQL semantics: NULL by-keys and NULL band values match nothing
    (pandas merge would pair NaN == NaN)."""
    from raylink.joins import band_join

    left = pa.table({"k": pa.array(["a", None, "b"], pa.string()),
                     "v": pa.array([10, 20, None], pa.int64()),
                     "lid": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([None, "a"], pa.string()),
                      "v": pa.array([21, 12], pa.int64()),
                      "rid": pa.array([7, 8], pa.int64())})
    got = (band_join(rd.from_arrow(left), rd.from_arrow(right),
                     on="v", delta=5, by="k", num_buckets=4)
           .to_pandas())
    # only (lid=1, rid=8) qualifies: same key "a", |10-12| <= 5
    assert got["lid"].tolist() == [1] and got["rid_r"].tolist() == [8]


def test_group_percentiles_label_precision(ray_session):
    from raylink.eda import group_percentiles

    rows = [{"g": "a", "v": float(i)} for i in range(1, 101)]
    out = group_percentiles(rd.from_items(rows), "g", "v",
                            qs=(0.29, 0.99, 0.999)).to_pandas()
    # int(q*100) truncated 0.29 to p28 and collapsed 0.99/0.999 to
    # one p99 column; %g formatting keeps all three distinct
    assert {"p29", "p99", "p99_9"} <= set(out.columns)
    assert out.loc[0, "p29"] == 29.0
    assert out.loc[0, "p99"] == 99.0
    assert out.loc[0, "p99_9"] == 100.0
    with pytest.raises(ValueError, match="duplicate"):
        group_percentiles(rd.from_items(rows), "g", "v", qs=(0.5, 0.5))


def test_explode_out_col_collision():
    from raylink.reshape import explode_table

    t = pa.table({"id": pa.array([1], pa.int64()),
                  "tags": pa.array([["a", "b"]],
                                   pa.list_(pa.string()))})
    with pytest.raises(ValueError, match="already exists"):
        explode_table(t, "tags", out_col="id")
    # renaming to a fresh name still works
    out = explode_table(t, "tags", out_col="tag")
    assert out.column("tag").to_pylist() == ["a", "b"]


def test_crosstab_null_keys_rejected(ray_session):
    from raylink.reshape import crosstab_counts

    rows = [{"r": "x", "c": "m"}, {"r": None, "c": "m"}]
    with pytest.raises(Exception, match="NULL values in key column"):
        crosstab_counts(rd.from_items(rows), "r", "c")
