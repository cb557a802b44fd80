"""HyperLogLog distinct-count sketch: exact rank arithmetic vs a
scalar reference, error bounds vs true cardinality, bit-exact
partitioning invariance, union-merge semantics, grouped variant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.sketch import (
    _registers_for,
    _rho,
    hll_count_distinct,
    hll_count_distinct_by,
    hll_error_bound,
    hll_estimate,
    hll_merge,
)


def test_rho_matches_scalar_reference():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, 5000, dtype=np.uint64)
    # adversarial values for the integer clz: all-ones suffixes near
    # 2^64 (a float64 log2 would round these across a power of two),
    # zero suffix, single trailing bit
    p = 12
    h = np.concatenate([h, np.array(
        [0, 1, 2**63, 2**64 - 1, (2**52 - 1) << 12, (1 << p) - 1,
         1 << (64 - p)], dtype=np.uint64)])
    idx, rank = _rho(h, p)
    for hv, i, r in zip(h.tolist(), idx.tolist(), rank.tolist()):
        assert i == hv >> (64 - p)
        w = (hv << p) & (2**64 - 1)
        want = (64 - p + 1) if w == 0 else (64 - w.bit_length() + 1)
        assert r == want, hex(hv)


@pytest.mark.parametrize("true_n", [10, 1000, 200_000])
def test_hll_error_within_bound(ray_session, true_n):
    rng = np.random.default_rng(42)
    vals = rng.integers(0, true_n, true_n * 3)  # duplicates on purpose
    truth = len(np.unique(vals))
    ds = rd.from_arrow(pa.table({"v": vals}))
    est = hll_count_distinct(ds, "v", p=12)
    assert abs(est - truth) / truth <= 4 * hll_error_bound(12)


def test_hll_partitioning_invariant_bit_for_bit(ray_session):
    vals = np.arange(50_000, dtype=np.int64) % 7919
    tbl = pa.table({"v": vals})
    a = hll_count_distinct(rd.from_arrow(tbl).repartition(2), "v", p=10)
    b = hll_count_distinct(rd.from_arrow(tbl).repartition(16), "v", p=10,
                           combine_size=3)
    assert a == b  # max-merge is order/partitioning independent


def test_hll_merge_is_union():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 10**9, 20_000)
    b = rng.integers(0, 10**9, 20_000)
    p = 11
    ra, rb = _registers_for(a, p), _registers_for(b, p)
    runion = _registers_for(np.concatenate([a, b]), p)
    assert np.array_equal(hll_merge([ra.tobytes(), rb.tobytes()], p),
                          runion)
    # idempotence: merging a sketch with itself changes nothing
    assert np.array_equal(hll_merge([ra, ra], p), ra)
    with pytest.raises(ValueError, match="different precisions"):
        hll_merge([ra.tobytes()], p + 1)


def test_hll_grouped_matches_exact_within_bound(ray_session):
    rng = np.random.default_rng(5)
    n = 60_000
    groups = rng.choice(["a", "b", "c", "d"], n,
                        p=[0.5, 0.3, 0.15, 0.05])
    vals = rng.integers(0, 5000, n)
    df = pd.DataFrame({"g": groups, "v": vals})
    got = (hll_count_distinct_by(
        rd.from_pandas(df).repartition(8), "v", "g", p=12, num_buckets=4)
        .to_pandas().set_index("g")["approx_distinct"])
    truth = df.groupby("g")["v"].nunique()
    assert set(got.index) == set(truth.index)
    for g in truth.index:
        assert abs(got[g] - truth[g]) / truth[g] <= 4 * hll_error_bound(12)


def test_hll_grouped_sparse_equals_dense_estimate(ray_session):
    """The sparse per-group path must reproduce hll_estimate of the
    dense per-group registers EXACTLY (same formula, same corrections)."""
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y", "z"], 9000),
        "v": rng.integers(0, 800, 9000),
    })
    got = (hll_count_distinct_by(
        rd.from_pandas(df).repartition(5), "v", "g", p=10, num_buckets=2)
        .to_pandas().set_index("g")["approx_distinct"])
    for g, sub in df.groupby("g"):
        dense = hll_estimate(_registers_for(sub["v"].to_numpy(), 10))
        assert got[g] == pytest.approx(dense, rel=0, abs=1e-9), g


def test_hll_small_range_linear_counting():
    reg = _registers_for(np.arange(25, dtype=np.int64), 12)
    est = hll_estimate(reg)
    assert abs(est - 25) <= 1  # linear counting is near-exact here


# ---------------------------------------------------------------- bloom

from raylink.sketch import (  # noqa: E402
    bloom_add,
    bloom_build,
    bloom_contains,
    bloom_params,
    bloom_prefilter,
)


def test_bloom_no_false_negatives_and_fpp_bound():
    n = 20_000
    members = np.arange(n, dtype=np.int64)
    outsiders = np.arange(n, 3 * n, dtype=np.int64)
    m, k = bloom_params(n, 0.01)
    bm = np.zeros(m // 8, np.uint8)
    bloom_add(bm, members, k)
    assert bloom_contains(bm, members, k).all()  # never a false negative
    fp = bloom_contains(bm, outsiders, k).mean()
    assert fp <= 0.03  # design 1%, allow 3x slack


def test_bloom_build_partitioning_invariant(ray_session):
    vals = pa.table({"key": np.arange(5000, dtype=np.int64) % 1777})
    a, ka = bloom_build(rd.from_arrow(vals).repartition(2), "key", 1777)
    b, kb = bloom_build(rd.from_arrow(vals).repartition(13), "key", 1777,
                        combine_size=3)
    assert ka == kb and np.array_equal(a, b)  # OR-merge is order-free


def test_bloom_prefilter_superset_and_exact_composition(ray_session):
    left = pa.table({
        "key": np.arange(0, 9000, dtype=np.int64) % 600,
        "payload": np.arange(9000, dtype=np.int64),
    })
    right = pa.table({
        "key": np.arange(0, 120, dtype=np.int64) * 3,  # 0,3,...,357
        "tag": [f"t{i}" for i in range(120)],
    })
    lds, rds = rd.from_arrow(left), rd.from_arrow(right)
    # expected_distinct omitted -> HLL sizes the filter
    surv = bloom_prefilter(lds, rds, "key").to_pandas()
    match_keys = set(right.column("key").to_pylist())
    truly = {k for k in left.column("key").to_pylist() if k in match_keys}
    surv_keys = set(surv["key"])
    assert truly <= surv_keys  # superset guarantee
    # composition: prefilter -> exact join == plain exact join
    from raylink.joins import hash_join

    a = (hash_join(bloom_prefilter(lds, rds, "key"), rds, "key")
         .to_pandas().sort_values(["payload"]).reset_index(drop=True))
    b = (hash_join(lds, rds, "key")
         .to_pandas().sort_values(["payload"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_bloom_string_keys_and_params_contracts():
    vals = np.array([f"url{i}" for i in range(3000)], dtype=object)
    m, k = bloom_params(3000, 0.01)
    bm = np.zeros(m // 8, np.uint8)
    bloom_add(bm, vals, k)
    assert bloom_contains(bm, vals, k).all()
    out = np.array([f"other{i}" for i in range(3000)], dtype=object)
    assert bloom_contains(bm, out, k).mean() <= 0.03
    with pytest.raises(ValueError, match="expected_distinct"):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError, match="fpp"):
        bloom_params(10, 1.5)


# ------------------------------------------------- frequent items (MG)

import duckdb  # noqa: E402

from raylink.sketch import frequent_items, top_frequent_exact  # noqa: E402


def _zipf_frame(n=60_000, n_distinct=4000, seed=17):
    rng = np.random.default_rng(seed)
    vals = rng.zipf(1.3, n) % n_distinct
    return pd.DataFrame({"v": vals.astype(np.int64)})


def test_frequent_items_bounds_hold(ray_session):
    df = _zipf_frame()
    truth = df["v"].value_counts()
    k = 128
    got, err = frequent_items(rd.from_pandas(df).repartition(9), "v", k=k)
    assert err <= len(df) // (k + 1)  # mergeable-summaries bound
    est = got.set_index("v")["est_count"]
    for item, e in est.items():
        t = int(truth[item])
        assert e <= t <= e + err, (item, e, t, err)
    # every item the table omits has true count <= err
    omitted = truth[~truth.index.isin(est.index)]
    assert (omitted <= err).all()
    # hence every TRUE heavy hitter (count > err) is present
    heavy = truth[truth > err]
    assert set(heavy.index) <= set(est.index)


def test_frequent_items_bounds_partitioning_invariant(ray_session):
    """Estimates may shift with partitioning; the CONTRACT may not."""
    df = _zipf_frame(n=20_000, n_distinct=900, seed=3)
    truth = df["v"].value_counts()
    for parts in (1, 4, 13):
        got, err = frequent_items(
            rd.from_pandas(df).repartition(parts), "v", k=64,
            combine_size=3)
        assert err <= len(df) // 65
        for item, e in got.set_index("v")["est_count"].items():
            assert e <= int(truth[item]) <= e + err


def test_frequent_items_exact_when_k_exceeds_distinct(ray_session):
    """No trim ever fires -> err == 0 and counts are exact."""
    df = pd.DataFrame({"v": np.arange(5000, dtype=np.int64) % 37})
    got, err = frequent_items(rd.from_pandas(df).repartition(6), "v",
                              k=100)
    assert err == 0
    truth = df["v"].value_counts()
    assert dict(zip(got["v"], got["est_count"])) == truth.to_dict()


def test_top_frequent_exact_matches_duckdb_int_and_str(ray_session):
    df = _zipf_frame(n=40_000, n_distinct=2500, seed=29)
    df["s"] = "tok" + df["v"].astype(str)
    for col in ("v", "s"):
        got = top_frequent_exact(rd.from_pandas(df).repartition(7),
                                 col, m=20)
        want = duckdb.sql(
            f"SELECT {col}, count(*)::BIGINT AS count FROM df "
            f"GROUP BY {col} ORDER BY count DESC, {col} LIMIT 20"
        ).df()
        pd.testing.assert_frame_equal(
            got.astype({"count": "int64"}), want.astype({"count": "int64"}))


def test_top_frequent_exact_nulls_ignored(ray_session):
    df = pd.DataFrame({"v": pd.array(
        [1, 1, 1, 2, 2, None, None, None, None, 3], dtype="Int64")})
    got = top_frequent_exact(rd.from_pandas(df), "v", m=2)
    assert got["v"].tolist() == [1, 2]
    assert got["count"].tolist() == [3, 2]


def test_top_frequent_exact_refuses_uncertifiable(ray_session):
    # near-uniform data + tiny k: the m-th count cannot beat the bound
    df = pd.DataFrame({"v": np.arange(30_000, dtype=np.int64) % 9000})
    with pytest.raises(ValueError, match="cannot certify"):
        top_frequent_exact(rd.from_pandas(df).repartition(8), "v",
                           m=5, k=8)


def test_top_frequent_exact_fewer_distinct_than_m(ray_session):
    df = pd.DataFrame({"v": np.array([5, 5, 7, 7, 7, 9], np.int64)})
    got = top_frequent_exact(rd.from_pandas(df), "v", m=10, k=50)
    assert got["v"].tolist() == [7, 5, 9]
    assert got["count"].tolist() == [3, 2, 1]


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_count_min_never_undercounts_and_bound_holds():
    import numpy as np
    import duckdb

    rng = np.random.default_rng(4)
    vals = rng.zipf(1.6, 40_000)
    vals = vals[vals < 10_000].astype("int64")
    df = pd.DataFrame({"v": vals})
    from raylink.sketch import cm_build, cm_query

    sk = cm_build(rd.from_pandas(df), "v", eps=0.005, delta=0.01)
    assert sk["n"] == len(df)
    con = duckdb.connect()
    con.register("t", df)
    truth = con.execute(
        "SELECT v, COUNT(*) n FROM t GROUP BY v").fetchdf()
    est = cm_query(sk, truth["v"].to_numpy())
    true_n = truth["n"].to_numpy()
    assert (est >= true_n).all()                      # never undercounts
    bound = sk["eps"] * sk["n"]
    frac_ok = ((est - true_n) <= bound).mean()
    assert frac_ok >= 1 - sk["delta"]                 # eps*N bound
    # heavy hitters are estimated nearly exactly
    top = truth.sort_values("n", ascending=False).head(5)
    assert (cm_query(sk, top["v"].to_numpy())
            <= top["n"].to_numpy() + bound).all()


def test_count_min_partitioning_invariance():
    import numpy as np

    from raylink.sketch import cm_build

    df = pd.DataFrame({"v": (np.arange(5000) % 97).astype("int64")})
    a = cm_build(rd.from_pandas(df).repartition(2), "v",
                 eps=0.01, delta=0.05)
    b = cm_build(rd.from_pandas(df).repartition(16), "v",
                 eps=0.01, delta=0.05)
    assert a["n"] == b["n"] == 5000
    assert (a["counts"] == b["counts"]).all()         # bit-identical


def test_count_min_string_values_and_nulls():
    from raylink.sketch import cm_build, cm_query

    df = pd.DataFrame({"v": (["alpha"] * 30 + ["beta"] * 7
                             + [None] * 5 + ["gamma"] * 1)})
    sk = cm_build(rd.from_pandas(df), "v", eps=0.01, delta=0.01)
    assert sk["n"] == 38                               # nulls skipped
    import numpy as np
    est = cm_query(sk, np.array(["alpha", "beta", "gamma"],
                                dtype=object))
    assert (est >= np.array([30, 7, 1])).all()
    assert (est <= np.array([30, 7, 1]) + sk["eps"] * sk["n"]).all()


def test_count_min_accepts_plain_string_lists():
    from raylink.sketch import cm_build, cm_query

    df = pd.DataFrame({"v": ["a"] * 5 + ["b"] * 2})
    sk = cm_build(rd.from_pandas(df), "v", eps=0.01, delta=0.01)
    import numpy as np
    # a plain list and a numpy '<U' array both work (code-review r4)
    assert (cm_query(sk, ["a", "b"]) >= np.array([5, 2])).all()
    assert (cm_query(sk, np.array(["a", "b"]))
            >= np.array([5, 2])).all()


def test_hll_by_bigint_group_keys_stay_distinct():
    """Group keys above 2^53 (nullable int64) must not merge in the
    bucket resolve: the old pandas round-trip float64-promoted the by
    column and collided distinct keys (code-review r5, reproduced)."""
    import pyarrow as pa
    import ray.data as rd

    from raylink.sketch import hll_count_distinct_by

    g1, g2 = (1 << 60) + 1, (1 << 60) + 3
    rows = ([{"by": g1, "v": i} for i in range(50)]
            + [{"by": g2, "v": i} for i in range(20)]
            + [{"by": None, "v": i} for i in range(5)])
    t = pa.table({
        "by": pa.array([r["by"] for r in rows], pa.int64()),
        "v": pa.array([r["v"] for r in rows], pa.int64()),
    })
    out = hll_count_distinct_by(rd.from_arrow(t), "v", "by", p=12)
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert got.column("by").type == pa.int64()
    est = dict(zip(got.column("by").to_pylist(),
                   got.column("approx_distinct").to_pylist()))
    assert set(est) == {g1, g2, None}
    assert abs(est[g1] - 50) / 50 < 0.15
    assert abs(est[g2] - 20) / 20 < 0.15


# ---------------------------------------------------------------------------
# quantile sketch
# ---------------------------------------------------------------------------

def _qs_frame(n=5000, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "v": rng.lognormal(mean=2.0, sigma=1.5, size=n),
    })


def test_quantile_sketch_matches_duckdb_twin_bitwise():
    from raylink.sketch import quantile_sketch, quantile_sketch_sql

    df = _qs_frame()
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got, m = quantile_sketch(
        rd.from_pandas(df).repartition(7), "v", "doc_id", qs, k=512)
    assert m == 512
    want = duckdb.sql(
        quantile_sketch_sql("df", "v", "doc_id", qs, k=512)).df()
    pd.testing.assert_frame_equal(got, want)  # exact, incl. float bits


def test_quantile_sketch_partitioning_invariance():
    from raylink.sketch import quantile_sketch

    df = _qs_frame(3000)
    qs = [0.25, 0.5, 0.75]
    a, ma = quantile_sketch(rd.from_pandas(df).repartition(2),
                            "v", "doc_id", qs, k=256, combine_size=2)
    b, mb = quantile_sketch(rd.from_pandas(df).repartition(16),
                            "v", "doc_id", qs, k=256, combine_size=64)
    assert ma == mb == 256
    pd.testing.assert_frame_equal(a, b)


def test_quantile_sketch_rank_error_within_dkw():
    from raylink.sketch import quantile_sketch

    df = _qs_frame(20000, seed=3)
    k = 2048
    qs = [0.1, 0.5, 0.9]
    got, m = quantile_sketch(rd.from_pandas(df).repartition(8),
                             "v", "doc_id", qs, k=k)
    assert m == k
    # eps at delta=1e-3 by DKW: sqrt(ln(2/delta) / (2k)) ~ 0.0431
    eps = float(np.sqrt(np.log(2 / 1e-3) / (2 * k)))
    v_sorted = np.sort(df["v"].to_numpy())
    for q, est in zip(got["q"], got["value"]):
        rank = np.searchsorted(v_sorted, est) / len(v_sorted)
        assert abs(rank - q) <= eps, (q, est, rank, eps)


def test_quantile_sketch_exact_when_k_covers_input():
    from raylink.sketch import quantile_sketch

    df = _qs_frame(300)
    qs = [0.0, 0.37, 0.5, 1.0]
    got, m = quantile_sketch(rd.from_pandas(df).repartition(5),
                             "v", "doc_id", qs, k=1000)
    assert m == 300
    want = duckdb.sql(
        "SELECT * FROM (" + " UNION ALL ".join(
            f"SELECT {q!r} AS q, quantile_cont(CAST(v AS DOUBLE), "
            f"{q!r}) AS value FROM df" for q in qs) + ")").df()
    pd.testing.assert_frame_equal(got, want)


def test_quantile_sketch_nulls_ignored_and_string_ids():
    from raylink.sketch import quantile_sketch, quantile_sketch_sql

    df = pd.DataFrame({
        "sid": [f"d{i}" for i in range(400)],
        "v": [float(i) if i % 3 else None for i in range(400)],
    })
    got, m = quantile_sketch(rd.from_pandas(df).repartition(3),
                             "v", "sid", [0.5], k=64)
    assert m == 64
    want = duckdb.sql(quantile_sketch_sql(
        "df", "v", "sid", [0.5], k=64, string_id=True)).df()
    pd.testing.assert_frame_equal(got, want)


def test_quantile_sketch_guards():
    from raylink.sketch import quantile_sketch

    # null STRING ids pass the dtype guard and hit the null-id check
    df = pd.DataFrame({"doc_id": ["a", None], "v": [1.0, 2.0]})
    with pytest.raises(Exception, match="contains nulls"):
        quantile_sketch(rd.from_pandas(df), "v", "doc_id", [0.5], k=4)
    ok = pd.DataFrame({"doc_id": [1, 2], "v": [1.0, 2.0]})
    with pytest.raises(ValueError, match="within"):
        quantile_sketch(rd.from_pandas(ok), "v", "doc_id", [1.5], k=4)
    with pytest.raises(ValueError, match="k must be"):
        quantile_sketch(rd.from_pandas(ok), "v", "doc_id", [0.5], k=0)


def test_quantile_sketch_empty_and_all_null_input():
    from raylink.sketch import quantile_sketch

    df = pd.DataFrame({"doc_id": pd.array([1, 2], dtype="int64"),
                       "v": pd.array([None, None], dtype="float64")})
    got, m = quantile_sketch(rd.from_pandas(df), "v", "doc_id",
                             [0.5], k=8)
    assert m == 0
    assert got["value"].isna().all()


def test_filter_by_quantile_matches_duckdb_twin_bitwise():
    from raylink.sketch import filter_by_quantile, filter_by_quantile_sql

    df = _qs_frame()
    got_ds, thr = filter_by_quantile(
        rd.from_pandas(df).repartition(7), "v", "doc_id",
        lo=0.1, hi=0.9, k=512)
    got = (got_ds.to_pandas().sort_values("doc_id")
           .reset_index(drop=True))
    want = (duckdb.sql(filter_by_quantile_sql(
        "df", "v", "doc_id", lo=0.1, hi=0.9, k=512)).df()
        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # the realized cut fraction is near 80% (DKW-bounded rank error)
    assert abs(len(got) / len(df) - 0.8) < 0.08
    assert set(thr) == {0.1, 0.9} and thr[0.1] < thr[0.9]


def test_filter_by_quantile_single_bound_and_nulls_dropped():
    from raylink.sketch import filter_by_quantile, filter_by_quantile_sql

    df = _qs_frame(600)
    df.loc[df.index % 5 == 0, "v"] = None
    got_ds, thr = filter_by_quantile(
        rd.from_pandas(df).repartition(3), "v", "doc_id", lo=0.25)
    got = (got_ds.to_pandas().sort_values("doc_id")
           .reset_index(drop=True))
    assert got["v"].notna().all()  # NULL col rows dropped
    want = (duckdb.sql(filter_by_quantile_sql(
        "df", "v", "doc_id", lo=0.25)).df()
        .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_filter_by_quantile_guards():
    from raylink.sketch import filter_by_quantile, filter_by_quantile_sql

    df = _qs_frame(20)
    with pytest.raises(ValueError, match="lo and/or hi"):
        filter_by_quantile(rd.from_pandas(df), "v", "doc_id")
    with pytest.raises(ValueError, match="lo and/or hi"):
        filter_by_quantile_sql("df", "v", "doc_id")
    allnull = pd.DataFrame({"doc_id": [1, 2],
                            "v": [None, None]}).astype(
        {"v": "float64"})
    with pytest.raises(ValueError, match="no non-null"):
        filter_by_quantile(rd.from_pandas(allnull), "v", "doc_id",
                           lo=0.5)
