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
