"""Geo-aware matching: lat/lon columns flow through the blocked scorer
and the haversine/geo-decay/combine path matches the single-process
oracle (weight renormalization exercised both with and without geo)."""

import pyarrow as pa

import ray.data as rd

from oracle import oracle_match
from raylink.config import MatchConfig
from raylink.match import match_datasets

CFG = MatchConfig(threshold=55.0, topk=3, scorer="token_set_ratio",
                  block_by="prefix4", w_text=0.6, w_digits=0.2, w_geo=0.2,
                  geo_max_km=2.0, left_id="id", right_id="id")


def _mk(rows):
    return rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lat": pa.array([r[2] for r in rows], pa.float64()),
        "lon": pa.array([r[3] for r in rows], pa.float64()),
    }))


LEFT = [
    ("l1", "akasya mahalle guven cadde no 12", 36.85, 28.27),
    ("l2", "akasya mahalle guven cadde no 13", 36.86, 28.28),
    ("l3", "yildiz mahalle millet sokak no 4", 41.00, 29.00),
    ("l4", "yildiz mahalle millet sokak no 5", None, None),  # no geo
]
RIGHT = [
    ("r1", "akasya mah guven cad no 12", 36.8501, 28.2701),   # ~15 m
    ("r2", "akasya mahalle guven cadde no 12", 39.90, 32.80), # far away
    ("r3", "yildiz mah millet sok no 4", 41.0003, 29.0004),
    ("r4", "yildiz mahalle millet sokak no 5", 41.0, 29.0),
]


def test_alternate_scorers_parity_with_oracle():
    """Registry scorers beyond the default: ratio / levenshtein /
    jaro_winkler all reproduce the single-process oracle."""
    for scorer in ("ratio", "levenshtein", "jaro_winkler",
                   "partial_ratio", "token_sort_ratio"):
        cfg = MatchConfig(threshold=40.0, topk=2, scorer=scorer,
                          block_by="prefix4", w_text=0.9, w_digits=0.1,
                          w_geo=0.0, left_id="id", right_id="id")
        got = match_datasets(_mk(LEFT), _mk(RIGHT), cfg,
                             left_text_col="text",
                             right_text_col="text").to_pandas()
        got_set = {(l, r, s) for l, r, s in
                   zip(got["left_id"], got["right_id"], got["score"])}
        lrows = [{"id": i, "text": t, "lat": la, "lon": lo}
                 for i, t, la, lo in LEFT]
        rrows = [{"id": i, "text": t, "lat": la, "lon": lo}
                 for i, t, la, lo in RIGHT]
        want = set(oracle_match(lrows, rrows, cfg))
        assert got_set == want, scorer


def test_geo_match_parity_with_oracle():
    got = match_datasets(_mk(LEFT), _mk(RIGHT), CFG,
                         left_text_col="text", right_text_col="text")
    gdf = got.to_pandas()
    got_set = {(l, r, s) for l, r, s in
               zip(gdf["left_id"], gdf["right_id"], gdf["score"])}

    lrows = [{"id": i, "text": t, "lat": la, "lon": lo}
             for i, t, la, lo in LEFT]
    rrows = [{"id": i, "text": t, "lat": la, "lon": lo}
             for i, t, la, lo in RIGHT]
    want = set(oracle_match(lrows, rrows, CFG))
    assert got_set == want
    # geo must have mattered: l1-r1 (near) outranks l1-r2 (far) despite
    # r2 being the closer text match
    scores = {(l, r): s for l, r, s in got_set}
    assert ("l1", "r1") in scores
    if ("l1", "r2") in scores:
        assert scores[("l1", "r1")] >= scores[("l1", "r2")] - 1e-9
    # absent-geo pair (l4) still matches via weight renormalization
    assert any(l == "l4" for (l, r) in scores)
