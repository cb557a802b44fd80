"""Index (positional) match mode — the reference's fast-test mode
(addresskit/match.py:155-164, tests/test_match.py:12-29) — and
keep_best_per_right (K2, documented-but-unimplemented in the
reference)."""

import pyarrow as pa

import ray.data as rd

from raylink.config import MatchConfig
from raylink.match import keep_best_per_right, match_datasets


def _ds(rows):
    return rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_index_mode_positional_pairs():
    # replicates the reference's e2e test shape (tests/test_match.py):
    # positional zip with score 1.0, truncated to the shorter side
    left = _ds([("l1", "a"), ("l2", "b"), ("l3", "c")])
    right = _ds([("r1", "x"), ("r2", "y")])
    cfg = MatchConfig(method="index", left_id="id", right_id="id")
    edges = match_datasets(left, right, cfg).to_pandas()
    got = set(zip(edges["left_id"], edges["right_id"], edges["score"]))
    assert got == {("l1", "r1", 1.0), ("l2", "r2", 1.0)}


def test_keep_best_per_right():
    edges = rd.from_arrow(pa.table({
        "left_id": pa.array(["a", "b", "c", "a"], pa.string()),
        "right_id": pa.array(["r", "r", "s", "s"], pa.string()),
        "score": pa.array([90.0, 95.0, 80.0, 80.0], pa.float64()),
    }))
    best = keep_best_per_right(edges).to_pandas()
    got = {(r.right_id): (r.left_id, r.score) for r in best.itertuples()}
    assert got["r"] == ("b", 95.0)
    # tie on score -> left_id asc wins (deterministic)
    assert got["s"] == ("a", 80.0)


def test_fuzzy_mode_keep_best_config():
    left = _ds([("l1", "akasya mahalle no 7"),
                ("l2", "akasya mahalle no 7 kat 2")])
    right = _ds([("r1", "akasya mah no 7")])
    cfg = MatchConfig(method="fuzzy", threshold=50, topk=3,
                      block_by="prefix4", left_id="id", right_id="id",
                      keep_best_per_right=True)
    edges = match_datasets(left, right, cfg,
                           left_text_col="text",
                           right_text_col="text").to_pandas()
    # both lefts match r1, but only the best survives
    assert len(edges) == 1
    assert edges["left_id"].iloc[0] == "l1"
