"""explode / unnest_struct vs DuckDB UNNEST."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.reshape import (
    explode,
    explode_table,
    unnest_struct,
    unnest_struct_table,
)


def _list_fixture() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "lang": ["tr", "en", "tr", "de", "en"],
        "tokens": pa.array(
            [["a", "b"], [], ["c"], None, ["d", "e", "f"]],
            pa.list_(pa.string())),
    })


def test_explode_matches_duckdb_unnest(ray_session):
    tbl = _list_fixture()
    got = (explode(rd.from_arrow(tbl).repartition(3), "tokens",
                   out_col="token")
           .to_pandas().sort_values(["doc_id", "token"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT doc_id, lang, UNNEST(tokens) AS token FROM t
        ORDER BY doc_id, token
    """).fetch_df()
    pd.testing.assert_frame_equal(got[list(want.columns)], want)
    # empty + null list rows (2 and 4) dropped, like UNNEST
    assert set(got["doc_id"]) == {1, 3, 5}


def test_explode_keep_empty_left_join_semantics():
    out = explode_table(_list_fixture(), "tokens", out_col="token",
                        keep_empty=True)
    df = out.to_pandas()
    assert sorted(df["doc_id"].unique()) == [1, 2, 3, 4, 5]
    assert df.loc[df["doc_id"] == 2, "token"].isna().all()
    assert df.loc[df["doc_id"] == 4, "token"].isna().all()
    assert len(df) == 2 + 1 + 1 + 1 + 3


def test_unnest_struct_matches_duckdb(ray_session):
    st = pa.array(
        [{"il": "ankara", "no": 7}, None, {"il": "izmir", "no": None}],
        pa.struct([("il", pa.string()), ("no", pa.int64())]))
    tbl = pa.table({"rid": pa.array([0, 1, 2], pa.int64()), "parts": st})
    got = (unnest_struct(rd.from_arrow(tbl), "parts")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT rid, parts.il AS parts_il, parts.no AS parts_no
        FROM t ORDER BY rid
    """).fetch_df()
    pd.testing.assert_frame_equal(got[list(want.columns)], want)
    # the null struct row is null in EVERY child column
    assert got.loc[1, ["parts_il", "parts_no"]].isna().all()


def test_reshape_contracts():
    tbl = _list_fixture()
    with pytest.raises(ValueError, match="not a list"):
        explode_table(tbl, "lang")
    st_tbl = pa.table({
        "parts": pa.array([{"a": 1}], pa.struct([("a", pa.int64())])),
        "parts_a": [9],
    })
    with pytest.raises(ValueError, match="already exists"):
        unnest_struct_table(st_tbl, "parts")
    with pytest.raises(ValueError, match="not a struct"):
        unnest_struct_table(tbl, "tokens")
