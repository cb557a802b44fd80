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
