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
