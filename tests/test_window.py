"""Per-key windowed analytics (lag/lead/cumulative) vs DuckDB window
functions, bit-for-bit on a totally ordered fixture."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.window import windowed


def _fixture(n=4000, keys=37, seed=9) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "rid": pa.array(np.arange(n), pa.int64()),
        "user": pa.array(rng.integers(0, keys, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()),  # many ties
        "value": pa.array(rng.normal(0, 10, n).round(3)),
    })


def test_windowed_matches_duckdb(ray_session):
    tbl = _fixture()
    got = (windowed(
        rd.from_arrow(tbl).repartition(8), "user", "ts",
        lag_cols={"prev_value": "value"},
        lead_cols={"next_ts": "ts"},
        cum_aggs={"running_sum": ("value", "cumsum"),
                  "row_idx": ("value", "cumcount"),
                  "running_max": ("value", "cummax")},
        tiebreak_col="rid", num_buckets=4)
        .to_pandas().sort_values("rid").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT rid, user, ts, value,
          LAG(value)  OVER w AS prev_value,
          LEAD(ts)    OVER w AS next_ts,
          SUM(value)  OVER (w ROWS UNBOUNDED PRECEDING) AS running_sum,
          ROW_NUMBER() OVER w - 1 AS row_idx,
          MAX(value)  OVER (w ROWS UNBOUNDED PRECEDING) AS running_max
        FROM t
        WINDOW w AS (PARTITION BY user ORDER BY ts, rid)
        ORDER BY rid
    """).fetch_df()
    got = got[list(want.columns)]
    for c in ("prev_value", "running_sum", "running_max"):
        assert np.allclose(got[c].to_numpy(dtype=float),
                           want[c].to_numpy(dtype=float),
                           atol=1e-9, equal_nan=True), c
    for c in ("rid", "user", "ts", "row_idx"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    # LEAD null on each partition's last row
    assert (got["next_ts"].isna().to_numpy()
            == want["next_ts"].isna().to_numpy()).all()
    nn = ~got["next_ts"].isna().to_numpy()
    assert (got["next_ts"].to_numpy()[nn]
            == want["next_ts"].to_numpy()[nn]).all()


def test_windowed_null_keys_are_a_partition(ray_session):
    df = pd.DataFrame({
        "rid": [0, 1, 2, 3],
        "user": pd.array([None, None, 5, 5], dtype="Int64"),
        "ts": [1, 2, 1, 2],
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    got = (windowed(rd.from_pandas(df), "user", "ts",
                    cum_aggs={"s": ("value", "cumsum")},
                    tiebreak_col="rid", num_buckets=2)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    assert got["s"].tolist() == [1.0, 3.0, 3.0, 7.0]


def test_windowed_contracts(ray_session):
    ds = rd.from_arrow(_fixture(50))
    with pytest.raises(ValueError, match="nothing requested"):
        windowed(ds, "user", "ts")
    with pytest.raises(ValueError, match="unknown agg"):
        windowed(ds, "user", "ts", cum_aggs={"x": ("value", "cummean")})
    with pytest.raises(ValueError, match="already exist"):
        windowed(ds, "user", "ts", lag_cols={"value": "value"})


def test_rank_functions_match_duckdb():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from raylink.window import windowed

    rows = [{"k": f"k{i % 4}", "ts": (i * 7) % 10, "id": i}
            for i in range(80)]  # ts collides -> real tie coverage
    ds = rd.from_items(rows).repartition(5)
    got = (
        windowed(ds, "k", "ts",
                 rank_aggs={"rn": "row_number", "rk": "rank",
                            "dr": "dense_rank", "pr": "percent_rank"},
                 tiebreak_col="id")
        .to_pandas().sort_values(["k", "ts", "id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    exp = con.execute("""
    SELECT k, ts, id,
      row_number()  OVER w2 AS rn,
      rank()         OVER w AS rk,
      dense_rank()   OVER w AS dr,
      percent_rank() OVER w AS pr
    FROM t
    WINDOW w  AS (PARTITION BY k ORDER BY ts),
           w2 AS (PARTITION BY k ORDER BY ts, id)
    ORDER BY k, ts, id
    """).fetchdf()
    pd.testing.assert_frame_equal(
        got[["k", "ts", "id", "rn", "rk", "dr", "pr"]], exp,
        check_dtype=False)


def test_rank_kind_validation():
    import pytest
    import ray.data as rd

    from raylink.window import windowed

    ds = rd.from_items([{"k": 1, "ts": 1}])
    with pytest.raises(ValueError, match="unknown rank kind"):
        windowed(ds, "k", "ts", rank_aggs={"x": "ntile"})


def test_windowed_duplicate_out_name_rejected():
    """A name reused across the request dicts was silently overwritten
    by loop order (code-review r5) — now rejected loudly."""
    import pytest
    import ray.data as rd

    from raylink.window import windowed

    ds = rd.from_items([{"k": 1, "o": 1, "a": 1.0}])
    with pytest.raises(ValueError, match="more than once"):
        windowed(ds, "k", "o", lag_cols={"x": "a"},
                 rank_aggs={"x": "rank"})


def test_windowed_rank_null_order_raises_loudly():
    """rank/dense_rank crashed with an obscure astype error on a null
    order value; percent_rank silently emitted NaN (code-review r5) —
    now a loud ValueError naming the column."""
    import pytest
    import ray.data as rd

    from raylink.window import windowed

    ds = rd.from_items([{"k": 1, "o": 1.0}, {"k": 1, "o": None}])
    with pytest.raises(Exception, match="contains nulls"):
        windowed(ds, "k", "o", rank_aggs={"rk": "rank"}).to_pandas()
    # row_number and lag/cum still work with null order values
    out = windowed(ds, "k", "o", rank_aggs={"rn": "row_number"},
                   cum_aggs={"cs": ("o", "cumsum")}).to_pandas()
    assert sorted(out["rn"].tolist()) == [1, 2]
