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


def test_geohash_null_lat_column_shadows_latitude():
    """Round-4 review finding 2 regression: a present-but-null 'lat'
    column must NOT fall through to 'latitude' in the row path — both
    paths pick the first column NAME present, so the reuse spot check
    never flags keys its own batch kernel produced."""
    import ray.data as rd

    from raylink.blocking import add_block_keys

    batch = pa.table({
        "t": ["istanbul"],
        "lat": pa.array([None], pa.float64()),
        "latitude": [41.0123],
        "lon": [28.976],
    })
    keys = (make_block_key_batch_fn("t", "geohash5")(batch)
            .column("block_key").to_pylist())
    row_key = make_block_key(batch.to_pylist()[0], "t", "geohash5")
    assert keys[0] == row_key == ""  # null lat -> invalid -> empty key
    # reuse=True re-derives row 0 via the ROW path; it must agree
    keyed = add_block_keys(rd.from_arrow(batch), "t", "geohash5")
    out = add_block_keys(keyed, "t", "geohash5", reuse=True).take_all()
    assert out[0]["block_key"] == ""


def _geohash_bisect(lat: float, lon: float, precision: int) -> str:
    """Textbook interval-bisection geohash (independent derivation —
    shares no code or op order with the vectorized quantizer)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(alphabet[ch])
            bits, ch = 0, 0
    return "".join(out)


@pytest.mark.parametrize("precision", [2, 6, 12])
def test_geohash_matches_textbook_bisection(precision):
    # interval bisection and MSB-aligned quantization agree except
    # possibly on exact cell boundaries where / 2 midpoints round
    # differently than the closed-form quantizer; random uniform
    # doubles never land there
    rng = np.random.default_rng(precision)
    lat = rng.uniform(-90, 90, 300)
    lon = rng.uniform(-180, 180, 300)
    got = geohash_encode(lat, lon, precision)
    for i in range(lat.size):
        assert got[i] == _geohash_bisect(lat[i], lon[i], precision)


def test_geohash_sql_twin_boundary_floats():
    """Adversarial boundary inputs: coordinates that are EXACT cell
    edges at precision 5 (quantizer input hits an integer), plus
    nextafter neighbors on each side — the rounding-sensitive spots
    where numpy and DuckDB could disagree if op order differed."""
    edges_lon = np.array([(-180.0 + 360.0 * k / 8192.0) for k in
                          range(0, 8192, 511)])
    edges_lat = np.array([(-90.0 + 180.0 * k / 4096.0) for k in
                          range(0, 4096, 255)])
    lon = np.concatenate([edges_lon, np.nextafter(edges_lon, -200.0),
                          np.nextafter(edges_lon, 200.0)])
    lat = np.concatenate([edges_lat, np.nextafter(edges_lat, -100.0),
                          np.nextafter(edges_lat, 100.0)])
    n = min(lat.size, lon.size)
    lat, lon = lat[:n], lon[:n]
    lat = np.clip(lat, -90.0, 90.0)
    lon = np.clip(lon, -180.0, 180.0)
    expect = geohash_encode(lat, lon, 5).tolist()
    p = geohash_sql_parts(5)
    con = duckdb.connect()
    con.register("pts", pa.table({"lat": lat, "lon": lon}))
    got = [r[0] for r in con.execute(f"""
        WITH v AS (SELECT lat, lon, {p['valid']} AS gvalid FROM pts),
        q AS (SELECT *, {p['ix']} AS ix, {p['iy']} AS iy FROM v),
        b AS (SELECT *, {p['code']} AS code FROM q)
        SELECT {p['key']} FROM b
    """).fetchall()]
    assert got == expect


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
