"""raylink.ranking: per-group top-k and deterministic stratified
sampling, each hash-checked against an in-test DuckDB window-function
oracle (the driver gate is at its 50-query cap, so these beyond-
reference operators carry their oracle here instead)."""

import pytest
import duckdb
import numpy as np
import pandas as pd
import ray.data as rd

from raylink.ranking import (
    sample_hash,
    sample_hash_sql_expr,
    stratified_sample,
    top_k_per_group,
)


def _frame(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["tr", "en", "de", "fr"], size=n),
        "score": rng.integers(0, 50, size=n).astype("int64"),
    })


def _sorted(df):
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True))


def test_top_k_per_group_matches_duckdb():
    df = _frame()
    got = top_k_per_group(
        rd.from_pandas(df).repartition(6), "lang", "score", k=5,
        descending=True, tiebreak_col="doc_id", num_buckets=8,
    ).to_pandas()
    want = duckdb.sql("""
        SELECT doc_id, lang, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY score DESC, doc_id) AS rn
          FROM df) WHERE rn <= 5
    """).df()
    pd.testing.assert_frame_equal(_sorted(got[want.columns.tolist()]),
                                  _sorted(want))
    # every group contributes exactly k (all groups have >= 5 rows)
    assert got.groupby("lang").size().eq(5).all()


def test_top_k_per_group_ascending_small_groups():
    df = pd.DataFrame({"g": ["a", "a", "b"], "v": [3, 1, 9],
                       "id": [0, 1, 2]})
    got = top_k_per_group(rd.from_pandas(df), "g", "v", k=2,
                          descending=False, tiebreak_col="id",
                          num_buckets=4).to_pandas()
    want = df.iloc[[0, 1, 2]]  # both 'a' rows, the lone 'b' row
    pd.testing.assert_frame_equal(_sorted(got), _sorted(want))


def test_sample_hash_sql_parity():
    # id + seed < 0 exercises the non-negative-modulo path (SQL % is
    # C-style signed; a negative remainder would fail the UBIGINT cast)
    ids = np.array([0, 1, 2, 10**12, 2**62, -5, -100, -(2**40)],
                   dtype=np.int64)
    py = sample_hash(ids, seed=42)
    expr = sample_hash_sql_expr("i", 42)
    tbl = pd.DataFrame({"rn": np.arange(len(ids)), "i": ids})
    sql = duckdb.sql(
        f"SELECT {expr} AS h FROM tbl ORDER BY rn").df()["h"]
    assert [int(x) for x in sql] == [int(x) for x in py]


def test_top_k_per_group_null_group_matches_duckdb():
    """Null group keys form their own partition (SQL row_number keeps
    a NULL partition; silently dropping those rows would diverge)."""
    df = pd.DataFrame({"g": ["a", "a", None, None, None],
                       "v": [3, 1, 9, 7, 8],
                       "id": [0, 1, 2, 3, 4]})
    got = top_k_per_group(rd.from_pandas(df), "g", "v", k=2,
                          descending=True, tiebreak_col="id",
                          num_buckets=4).to_pandas()
    want = duckdb.sql("""
        SELECT g, v, id FROM (
          SELECT *, row_number() OVER (
            PARTITION BY g ORDER BY v DESC, id) rn FROM df)
        WHERE rn <= 2
    """).df()
    key = ["v", "id"]
    pd.testing.assert_frame_equal(
        _sorted(got[key]), _sorted(want[key]))
    assert len(got) == 4  # 2 from 'a', 2 from the null group


def test_stratified_sample_null_ids_raise():
    import pytest

    # pandas nullable Int64 surfaces as a float (double) schema through
    # Ray — the dtype guard (ADVICE r3) rejects it BEFORE the hash
    # could silently truncate
    df = pd.DataFrame({"g": ["a", "b"], "i": pd.array([1, None],
                                                      dtype="Int64")})
    with pytest.raises(Exception,
                       match="integer- or string-typed"):
        stratified_sample(rd.from_pandas(df), "g", "i", k=1).to_pandas()

    # null STRING ids pass the dtype guard and hit the null-id check
    df2 = pd.DataFrame({"g": ["a", "b"], "i": ["x", None]})
    with pytest.raises(Exception, match="contains nulls"):
        stratified_sample(rd.from_pandas(df2), "g", "i", k=1).to_pandas()


def test_stratified_sample_float_ids_raise():
    import pytest

    df = pd.DataFrame({"g": ["a", "b"], "i": [1.5, 2.5]})
    with pytest.raises(Exception,
                       match="integer- or string-typed"):
        stratified_sample(rd.from_pandas(df), "g", "i", k=1).to_pandas()


def test_stratified_sample_matches_duckdb():
    df = _frame()
    got = stratified_sample(
        rd.from_pandas(df).repartition(5), "lang", "doc_id", k=20,
        seed=42, num_buckets=8).to_pandas()
    expr = sample_hash_sql_expr("doc_id", 42)
    want = duckdb.sql(f"""
        SELECT doc_id, lang, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY {expr}, doc_id) AS rn
          FROM df) WHERE rn <= 20
    """).df()
    pd.testing.assert_frame_equal(_sorted(got[want.columns.tolist()]),
                                  _sorted(want))
    assert got.groupby("lang").size().eq(20).all()


def test_stratified_sample_parallelism_invariant():
    df = _frame(n=300, seed=3)
    a = stratified_sample(rd.from_pandas(df).repartition(1),
                          "lang", "doc_id", k=7, seed=9).to_pandas()
    b = stratified_sample(rd.from_pandas(df).repartition(8),
                          "lang", "doc_id", k=7, seed=9,
                          num_buckets=16).to_pandas()
    pd.testing.assert_frame_equal(_sorted(a), _sorted(b))
    # a different seed picks a different subset
    c = stratified_sample(rd.from_pandas(df).repartition(8),
                          "lang", "doc_id", k=7, seed=10).to_pandas()
    assert not _sorted(a).equals(_sorted(c))


def test_stratified_sample_string_ids_matches_duckdb():
    """String ids (urls) rank by the md5-prefix hash; DuckDB twin is
    sample_hash_str_sql_expr."""
    from raylink.ranking import sample_hash_str, sample_hash_str_sql_expr

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "url": [f"https://site{s}.example/p/{i}"
                for i, s in enumerate(rng.choice(["L", "R"], size=300))],
        "lang": rng.choice(["tr", "en", "de"], size=300),
    })
    # hash parity first (incl. non-ascii)
    ids = np.array(["a", "ü-ğ", "https://x/1"], dtype=object)
    py = sample_hash_str(ids, seed=9)
    tbl = pd.DataFrame({"rn": range(len(ids)), "i": ids})
    sql = duckdb.sql(
        f"SELECT {sample_hash_str_sql_expr('i', 9)} AS h FROM tbl "
        "ORDER BY rn").df()["h"]
    assert [int(x) for x in sql] == [int(x) for x in py]

    got = stratified_sample(rd.from_pandas(df).repartition(4),
                            "lang", "url", k=15, seed=9,
                            num_buckets=8).to_pandas()
    expr = sample_hash_str_sql_expr("url", 9)
    want = duckdb.sql(f"""
        SELECT url, lang FROM (
          SELECT *, row_number() OVER (
            PARTITION BY lang ORDER BY {expr}, url) rn FROM df)
        WHERE rn <= 15
    """).df()
    pd.testing.assert_frame_equal(_sorted(got[want.columns.tolist()]),
                                  _sorted(want))
    assert got.groupby("lang").size().eq(15).all()


def test_top_k_per_group_bigint_and_null_groups():
    """Nullable int64 group keys above 2^53 must stay DISTINCT groups:
    the old pandas bucket resolve float64-promoted the key column,
    collided the groups, and corrupted the emitted keys
    (code-review r5, reproduced)."""
    import pyarrow as pa

    from raylink.ranking import top_k_per_group

    g1, g2 = (1 << 60) + 1, (1 << 60) + 3
    t = pa.table({
        "g": pa.array([g1, g1, g2, g2, None, None], pa.int64()),
        "v": pa.array([5.0, 7.0, 1.0, 9.0, 2.0, 3.0]),
        "id": pa.array(list("abcdef")),
    })
    out = top_k_per_group(rd.from_arrow(t), "g", "v", k=1,
                          tiebreak_col="id")
    got = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert got.column("g").type == pa.int64()
    rows = sorted(zip(got.column("id").to_pylist(),
                      got.column("g").to_pylist()))
    assert rows == [("b", g1), ("d", g2), ("f", None)]


# ---------------------------------------------------------------------------
# weighted sampling without replacement (A-Res)
# ---------------------------------------------------------------------------

def _ws_frame(n=2000, seed=19):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "domain": rng.choice(["a.com", "b.org", "c.net"], size=n),
        "w": rng.choice([0.5, 1.0, 4.0, 25.0], size=n),
    })


def test_weighted_sample_matches_duckdb_twin_bitwise():
    from raylink.ranking import weighted_sample, weighted_sample_sql

    df = _ws_frame()
    got = weighted_sample(
        rd.from_pandas(df).repartition(6), "doc_id", "w",
        k=100).to_pandas()
    want = duckdb.sql(
        weighted_sample_sql("df", "doc_id", "w", k=100)).df()
    pd.testing.assert_frame_equal(got, want)  # row order included


def test_weighted_sample_string_ids_and_partition_invariance():
    from raylink.ranking import weighted_sample, weighted_sample_sql

    df = _ws_frame(800)
    df["sid"] = "u" + df["doc_id"].astype(str)
    df = df.drop(columns=["doc_id"])
    a = weighted_sample(rd.from_pandas(df).repartition(2), "sid", "w",
                        k=50, combine_size=2).to_pandas()
    b = weighted_sample(rd.from_pandas(df).repartition(13), "sid", "w",
                        k=50).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    want = duckdb.sql(weighted_sample_sql(
        "df", "sid", "w", k=50, string_id=True)).df()
    pd.testing.assert_frame_equal(a[want.columns.tolist()], want)


def test_weighted_sample_k_covers_input_returns_all_rows():
    from raylink.ranking import weighted_sample

    df = _ws_frame(40)
    got = weighted_sample(rd.from_pandas(df).repartition(3),
                          "doc_id", "w", k=100).to_pandas()
    assert len(got) == 40
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])


def test_weighted_sample_heavy_weights_dominate():
    from raylink.ranking import weighted_sample

    # 100 heavy rows (w=200) among 2000 light ones (w=1): expected
    # heavy share of a k=200 sample is ~0.91; the draw is
    # deterministic for the fixed seed, so assert the realized share
    n = 2100
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "w": np.where(np.arange(n) < 100, 200.0, 1.0),
    })
    got = weighted_sample(rd.from_pandas(df).repartition(5),
                          "doc_id", "w", k=200).to_pandas()
    heavy = (got["doc_id"] < 100).sum()
    assert heavy >= 80  # vs ~9.5 expected under uniform sampling


def test_weighted_sample_guards():
    from raylink.ranking import weighted_sample

    base = pd.DataFrame({"doc_id": [1, 2, 3],
                         "w": [1.0, 2.0, 3.0]})
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(rd.from_pandas(base), "doc_id", "w", k=0)
    for bad in ([1.0, None, 2.0], [1.0, float("nan"), 2.0],
                [1.0, 0.0, 2.0], [1.0, -3.0, 2.0],
                [1.0, float("inf"), 2.0]):
        df = pd.DataFrame({"doc_id": [1, 2, 3], "w": bad})
        with pytest.raises(Exception,
                           match="null|non-finite or <= 0"):
            weighted_sample(rd.from_pandas(df), "doc_id", "w", k=2)
    # null STRING ids pass the dtype guard and hit the null-id check
    nid = pd.DataFrame({"doc_id": ["a", None, "c"],
                        "w": [1.0, 2.0, 3.0]})
    with pytest.raises(Exception, match="contains nulls"):
        weighted_sample(rd.from_pandas(nid), "doc_id", "w", k=2)
