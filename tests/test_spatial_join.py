"""Distributed spatial near-self-join (geohash-cell co-shuffle + 3x3
neighbor replication + exact haversine verify) vs the DuckDB all-pairs
oracle ``a.id < b.id AND haversine(a,b) <= r``."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raylink.joins import spatial_precision_for_radius, spatial_self_join

_HAV_SQL = """
    2*6371.0088*asin(sqrt(
      sin(radians(b.lat-a.lat)/2)*sin(radians(b.lat-a.lat)/2)
      + cos(radians(a.lat))*cos(radians(b.lat))
        *sin(radians(b.lon-a.lon)/2)*sin(radians(b.lon-a.lon)/2)))
"""


def _fixture(n_clusters=60, per=3, noise=80, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    clat = rng.uniform(36.0, 41.0, n_clusters)
    clon = rng.uniform(26.0, 44.0, n_clusters)
    lat = np.repeat(clat, per) + rng.normal(0, 0.02, n_clusters * per)
    lon = np.repeat(clon, per) + rng.normal(0, 0.02, n_clusters * per)
    lat = np.concatenate([lat, rng.uniform(36.0, 41.0, noise),
                          [0.0, 0.0]])
    lon = np.concatenate([lon, rng.uniform(26.0, 44.0, noise),
                          [179.99, -179.99]])  # antimeridian neighbors
    return pa.table({
        "id": pa.array(np.arange(lat.size), pa.int64()),
        "lat": lat, "lon": lon,
    })


def test_spatial_self_join_matches_duckdb_all_pairs():
    tbl = _fixture()
    got = (spatial_self_join(rd.from_arrow(tbl), "id", radius_km=10.0,
                             num_buckets=16)
           .to_pandas().sort_values(["left_id", "right_id"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("pts", tbl)
    want = con.execute(f"""
        SELECT a.id AS left_id, b.id AS right_id, {_HAV_SQL} AS dist_km
        FROM pts a JOIN pts b ON a.id < b.id
        WHERE {_HAV_SQL} <= 10.0
        ORDER BY left_id, right_id
    """).fetch_df()
    assert len(got) == len(want) > 100
    pd.testing.assert_frame_equal(
        got[["left_id", "right_id"]], want[["left_id", "right_id"]])
    assert np.allclose(got["dist_km"], want["dist_km"], atol=1e-9)
    # exactly-once + ordering contract
    assert not got.duplicated(["left_id", "right_id"]).any()
    assert (got["left_id"] < got["right_id"]).all()
    # the antimeridian pair (last two ids) must be present: the cell
    # grid wraps ix, a plain lon-band scheme would miss it
    last = tbl.num_rows - 1
    assert ((got["left_id"] == last - 1) & (got["right_id"] == last)).any()


def test_spatial_join_string_ids_and_precision_override():
    tbl = _fixture(n_clusters=10, per=2, noise=10, seed=3)
    tbl = tbl.set_column(0, "id", pa.array(
        [f"p{i:04d}" for i in range(tbl.num_rows)], pa.string()))
    fine = spatial_precision_for_radius(10.0)
    got = (spatial_self_join(rd.from_arrow(tbl), "id", radius_km=10.0,
                             precision=fine - 1, num_buckets=4)
           .to_pandas())
    con = duckdb.connect()
    con.register("pts", tbl)
    want = con.execute(f"""
        SELECT a.id AS l, b.id AS r FROM pts a JOIN pts b ON a.id < b.id
        WHERE {_HAV_SQL} <= 10.0
    """).fetch_df()
    assert (set(map(tuple, got[["left_id", "right_id"]].to_numpy()))
            == set(map(tuple, want.to_numpy())))


def test_spatial_cover_sound_at_radius_cell_boundary():
    """Round-4 review finding 1 regression: with the old km-per-degree
    cover bound, radius 1.26613 km at max_abs_lat=75 accepted
    precision 5, whose lon cells are NARROWER than the max lon span of
    an in-radius pair at lat 75 — this pair (1.26472 km apart, 2 lon
    cells apart at precision 5) was silently dropped. The exact
    spherical bound must derive a coarser precision that covers it."""
    w = 360.0 / (1 << 13)  # precision-5 lon cell width in degrees
    tbl = pa.table({
        "id": pa.array([0, 1], pa.int64()),
        "lat": [75.0, 75.0],
        "lon": [-180.0 + 100 * w - 1e-9, -180.0 + 101 * w + 1e-9],
    })
    radius = 1.26613
    derived = spatial_precision_for_radius(radius, max_abs_lat=75.0)
    assert derived < 5  # the unsound old answer was 5
    got = spatial_self_join(rd.from_arrow(tbl), "id", radius_km=radius,
                            num_buckets=2).to_pandas()
    assert len(got) == 1
    assert (got.loc[0, "left_id"], got.loc[0, "right_id"]) == (0, 1)
    assert got.loc[0, "dist_km"] <= radius
    # forcing the old precision is now rejected as unsound
    with pytest.raises(ValueError, match="finest sound"):
        spatial_self_join(rd.from_arrow(tbl), "id", radius_km=radius,
                          precision=5)


def test_spatial_join_contracts():
    with pytest.raises(ValueError, match="coarsest"):
        spatial_precision_for_radius(2000.0, max_abs_lat=75.0)
    p10 = spatial_precision_for_radius(10.0)
    with pytest.raises(ValueError, match="finest sound"):
        spatial_self_join(rd.from_arrow(_fixture(2, 1, 0)), "id", 10.0,
                          precision=p10 + 1)
    bad = pa.table({"id": [1, 2], "lat": [1.0, float("nan")],
                    "lon": [1.0, 2.0]})
    with pytest.raises(Exception, match="NaN/out-of-world"):
        spatial_self_join(rd.from_arrow(bad), "id", 5.0).materialize()
    polar = pa.table({"id": [1, 2], "lat": [80.0, 10.0],
                      "lon": [1.0, 2.0]})
    with pytest.raises(Exception, match="outside"):
        spatial_self_join(rd.from_arrow(polar), "id", 5.0).materialize()


# --- set operations (INTERSECT / EXCEPT) ---------------------------

def test_set_ops_match_duckdb():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from raylink.joins import except_distinct, intersect_distinct

    lrows = [{"a": i % 7, "b": ["x", "y", None][i % 3]}
             for i in range(50)]
    rrows = [{"a": i % 5, "b": ["x", None][i % 2]}
             for i in range(30)]
    lds = rd.from_items(lrows).repartition(4)
    rds = rd.from_items(rrows).repartition(3)

    def canon(df):
        df = df.copy()
        df["b"] = df["b"].fillna("<null>")
        return (df.sort_values(["a", "b"]).reset_index(drop=True)
                [["a", "b"]])

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows))
    con.register("r", pd.DataFrame(rrows))
    for fn, op in ((intersect_distinct, "INTERSECT"),
                   (except_distinct, "EXCEPT")):
        got = canon(fn(lds, rds).to_pandas())
        exp = canon(con.execute(
            f"SELECT a, b FROM l {op} SELECT a, b FROM r").fetchdf())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_set_ops_key_subset_and_errors():
    import pytest
    import ray.data as rd

    from raylink.joins import _setop, intersect_distinct

    lds = rd.from_items([{"k": 1, "extra": "a"}, {"k": 2, "extra": "b"}])
    rds = rd.from_items([{"k": 2, "other": 9}])
    out = intersect_distinct(lds, rds, on=["k"]).to_pandas()
    assert out["k"].tolist() == [2]
    with pytest.raises(ValueError, match="no common columns"):
        intersect_distinct(
            rd.from_items([{"x": 1}]), rd.from_items([{"y": 1}]))
