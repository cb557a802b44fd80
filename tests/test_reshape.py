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


def test_crosstab_counts_matches_duckdb():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from raylink.reshape import crosstab_counts

    rows = [{"lang": ["en", "de", "fr"][i % 3],
             "source": f"s{i % 4}"} for i in range(97)]
    ds = rd.from_items(rows).repartition(5)
    vals = [f"s{i}" for i in range(4)]
    got = crosstab_counts(ds, "lang", "source", col_values=vals,
                          margins=True)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    cols = ", ".join(
        f"CAST(SUM(CASE WHEN source='{v}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{v}" for v in vals)
    names = ", ".join(f"n_{v}" for v in vals)
    sums = ", ".join(f"CAST(SUM(n_{v}) AS BIGINT) AS n_{v}"
                     for v in vals)
    sql = f"""
    WITH base AS (
      SELECT lang, {cols}, COUNT(*) AS total FROM t GROUP BY lang
    )
    SELECT lang, {names}, CAST(total AS BIGINT) AS total FROM base
    UNION ALL
    SELECT '__all__' AS lang, {sums}, CAST(SUM(total) AS BIGINT) AS total
    FROM base
    """
    sql = f"SELECT * FROM ({sql}) ORDER BY (lang = '__all__'), lang"

    exp = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)


def test_crosstab_counts_pinned_schema_and_errors():
    import pytest
    import ray.data as rd

    from raylink.reshape import crosstab_counts

    ds = rd.from_items([{"a": "x", "b": "p"}, {"a": "y", "b": "p"}])
    # pinned col_values add an all-zero column for an unseen value
    out = crosstab_counts(ds, "a", "b", col_values=["p", "q"])
    assert list(out.columns) == ["a", "n_p", "n_q", "total"]
    assert out["n_q"].tolist() == [0, 0]
    assert out["total"].tolist() == [1, 1]
    # a value outside the pinned schema fails loudly
    ds2 = rd.from_items([{"a": "x", "b": "p"}, {"a": "y", "b": "q"}])
    with pytest.raises(ValueError, match="not\\s+in col_values"):
        crosstab_counts(ds2, "a", "b", col_values=["p"])


def test_melt_matches_duckdb_unpivot():
    import duckdb
    import pandas as pd
    import pytest
    import ray.data as rd

    from raylink.reshape import melt

    rows = [{"id": i, "a": float(i), "b": float(i * 2),
             "c": None if i % 3 == 0 else float(i * 3)}
            for i in range(40)]
    ds = rd.from_items(rows).repartition(4)
    got = (melt(ds, ["id"], ["a", "b", "c"])
           .to_pandas()
           .sort_values(["id", "variable"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    exp = con.execute("""
    SELECT id, variable, value
    FROM t UNPIVOT INCLUDE NULLS (value FOR variable IN (a, b, c))
    ORDER BY id, variable
    """).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # mixed-type value columns fail loudly instead of silently casting
    ds2 = rd.from_items([{"id": 1, "x": 1, "y": "s"}])
    with pytest.raises(Exception, match="mix Arrow types"):
        melt(ds2, ["id"], ["x", "y"]).materialize()
