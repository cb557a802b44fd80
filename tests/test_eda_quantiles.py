import numpy as np

import ray.data as rd

from raylink.eda import approx_quantiles


def test_approx_quantiles():
    vals = list(range(10000))
    ds = rd.from_items([{"v": float(x)} for x in vals])
    got = approx_quantiles(ds, "v", [0.0, 0.5, 0.9, 1.0])
    want = [np.quantile(vals, q) for q in (0.0, 0.5, 0.9, 1.0)]
    for g, w in zip(got, want):
        assert abs(g - w) <= 200  # within sampling error at 10k values
    assert got == sorted(got)


def test_approx_quantiles_combine_level_accuracy():
    # force the tree-combine level to do real merging: 32 blocks,
    # small per-block samples, combine groups of 4 -> driver sees
    # ~blocks/4 samples, accuracy stays inside the widened tolerance
    vals = np.arange(20000, dtype=np.float64)
    ds = rd.from_items([{"v": float(x)} for x in vals]).repartition(32)
    got = approx_quantiles(ds, "v", [0.1, 0.5, 0.9],
                           sample_per_block=64, combine_size=4)
    want = [np.quantile(vals, q) for q in (0.1, 0.5, 0.9)]
    for g, w in zip(got, want):
        # 2 compression levels at 64 samples: allow ~2/64 per level
        assert abs(g - w) <= 0.07 * len(vals)
    assert got == sorted(got)


def test_group_percentiles_exact_vs_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raylink.eda import group_percentiles

    rng = np.random.default_rng(7)
    rows = [{"g": f"g{i % 5}" if i % 17 else None,
             "v": (float(rng.integers(0, 1000)) / 8.0
                   if i % 13 else None)}
            for i in range(400)]
    ds = rd.from_items(rows).repartition(6)
    got = (group_percentiles(ds, "g", "v", qs=(0.25, 0.5, 0.75, 0.9))
           .to_pandas())
    got["g"] = got["g"].fillna("<null>")
    got = got.sort_values("g").reset_index(drop=True)

    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    exp = con.execute("""
    WITH r AS (
      SELECT g, v,
        row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        COUNT(*) OVER (PARTITION BY g) AS n
      FROM t WHERE v IS NOT NULL
    )
    SELECT COALESCE(g, '<null>') AS g,
      MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1)
               THEN v END) AS p25,
      MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.5  * n) AS BIGINT), 1)
               THEN v END) AS p50,
      MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1)
               THEN v END) AS p75,
      MAX(CASE WHEN rn = GREATEST(CAST(CEIL(0.9  * n) AS BIGINT), 1)
               THEN v END) AS p90
    FROM r GROUP BY g ORDER BY g
    """).fetchdf()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_approx_quantiles_ignores_nulls():
    """One null among valid values must not poison every quantile with
    NaN (code-review r5)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raylink.eda import approx_quantiles

    vals = list(np.arange(1.0, 101.0)) + [None]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())}))
    got = approx_quantiles(ds, "v", [0.5])
    assert not np.isnan(got[0])
    assert 40 <= got[0] <= 60
