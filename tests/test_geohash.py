"""Geohash blocking key (north-star: "phonetic street token +
zip/geo-hash prefix" composite blocking) — encoder vs known public
values, prefix nesting, DSL wiring, and the generated DuckDB SQL twin
bit-for-bit on a dense lat/lon grid including edge/invalid rows."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from raylink.blocking import (
    geohash_encode,
    geohash_sql_parts,
    make_block_key,
    make_block_key_batch_fn,
)


def test_geohash_known_values():
    # canonical public test vector (geohash.org / Wikipedia)
    assert geohash_encode(np.array([57.64911]),
                          np.array([10.40744]), 11)[0] == "u4pruydqqvj"
    # corners and origin
    got = geohash_encode(np.array([0.0, 90.0, -90.0]),
                         np.array([0.0, 180.0, -180.0]), 5)
    assert list(got) == ["s0000", "zzzzz", "00000"]


def test_geohash_prefix_nesting_and_invalid():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-180, 180, 500)
    fine = geohash_encode(lat, lon, 9)
    for p in (1, 4, 6):
        coarse = geohash_encode(lat, lon, p)
        assert all(f[:p] == c for f, c in zip(fine, coarse))
    bad = geohash_encode(np.array([np.nan, 91.0, 0.0]),
                         np.array([0.0, 0.0, 181.0]), 5)
    assert list(bad) == ["", "", ""]
    with pytest.raises(ValueError):
        geohash_encode(lat, lon, 13)


def test_geohash_dsl_row_and_batch_agree():
    batch = pa.table({
        "t": ["istanbul cadde", "ankara sokak", "x"],
        "lat": [41.0123, 39.92077, None],
        "lon": [28.976, 32.85411, 29.0],
    })
    fn = make_block_key_batch_fn("t", "phonetic+geohash4")
    keys = fn(batch).column("block_key").to_pylist()
    for i, row in enumerate(batch.to_pylist()):
        assert keys[i] == make_block_key(row, "t", "phonetic+geohash4")
    # null lat -> empty geohash component, phonetic part still present
    assert keys[2].endswith("|")
    plain = make_block_key_batch_fn("t", "geohash5")(batch)
    assert plain.column("block_key").to_pylist()[:2] == [
        geohash_encode(np.array([41.0123]), np.array([28.976]), 5)[0],
        geohash_encode(np.array([39.92077]), np.array([32.85411]), 5)[0],
    ]


@pytest.mark.parametrize("precision", [1, 5, 7])
def test_geohash_sql_twin_bit_for_bit(precision):
    rng = np.random.default_rng(42)
    lat = np.concatenate([
        rng.uniform(-90, 90, 2000),
        [0.0, 90.0, -90.0, 89.999999, 41.0, np.nan, 95.0, 1.0],
    ])
    lon = np.concatenate([
        rng.uniform(-180, 180, 2000),
        [0.0, 180.0, -180.0, 179.999999, 29.0, 1.0, 1.0, np.nan],
    ])
    expect = geohash_encode(lat, lon, precision).tolist()
    p = geohash_sql_parts(precision)
    con = duckdb.connect()
    con.register("pts", pa.table({"lat": lat, "lon": lon}))
    got = [r[0] for r in con.execute(f"""
        WITH v AS (SELECT lat, lon, {p['valid']} AS gvalid FROM pts),
        q AS (SELECT *, {p['ix']} AS ix, {p['iy']} AS iy FROM v),
        b AS (SELECT *, {p['code']} AS code FROM q)
        SELECT {p['key']} FROM b
    """).fetchall()]
    assert got == expect
