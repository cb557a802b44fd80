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


def test_threshold_prune_invariance():
    """The monotone text-score prune inside score_bucket must emit
    EXACTLY the edges that scoring every pair and thresholding after
    would: run the scorer at thr~0 (where t_min <= 0 disables every
    prune) with an unbounded top-k, re-apply threshold + per-left top-k
    in the test, and compare against the pruned thr=85 run — with and
    without geo, for both the token-set and levenshtein scorers."""
    import random

    from raylink.match import _make_bucket_scorer

    rng = random.Random(5)
    words = ["mah", "cad", "sok", "no", "akasya", "guven", "bodrum",
             "mugla", "12", "3", "45", "apt", "b"]
    n = 400
    ids, texts, lats, lons, keys, sides, salts = [], [], [], [], [], [], []
    for i in range(n):
        bk = f"bk{rng.randrange(30)}"
        toks = rng.sample(words, rng.randint(2, 6))
        ids.append(f"id{i}")
        texts.append(" ".join(toks))
        with_geo = rng.random() < 0.5
        lats.append(39.0 + rng.random() * 0.02 if with_geo else None)
        lons.append(32.0 + rng.random() * 0.02 if with_geo else None)
        keys.append(bk)
        sides.append(rng.randint(0, 1))
        salts.append(0)
    bucket = pa.table({
        "_id": pa.array(ids, pa.string()),
        "_text": pa.array(texts, pa.string()),
        "_lat": pa.array(lats, pa.float64()),
        "_lon": pa.array(lons, pa.float64()),
        "block_key": pa.array(keys, pa.string()),
        "_side": pa.array(sides, pa.int8()),
        "_salt": pa.array(salts, pa.int32()),
    })

    for scorer in ("token_set_ratio", "levenshtein"):
        for thr in (70.0, 85.0):
            kw = dict(scorer=scorer, w_text=0.8, w_digits=0.15,
                      w_geo=0.05, left_id="id", right_id="id")
            pruned = _make_bucket_scorer(
                MatchConfig(threshold=thr, topk=3, **kw))(bucket)
            full = _make_bucket_scorer(
                MatchConfig(threshold=0.01, topk=10**6, **kw))(bucket)
            # reference semantics from the unpruned run: threshold
            # first, then per-left top-3 by (score desc, right_id asc)
            byleft: dict[str, list] = {}
            for l, r, s, k in zip(full["left_id"].to_pylist(),
                                  full["right_id"].to_pylist(),
                                  full["score"].to_pylist(),
                                  full["block_key"].to_pylist()):
                if s >= thr:
                    byleft.setdefault(l, []).append((-s, r, k))
            want = set()
            for l, cands in byleft.items():
                for negs, r, k in sorted(cands)[:3]:
                    want.add((l, r, -negs, k))
            got = set(zip(pruned["left_id"].to_pylist(),
                          pruned["right_id"].to_pylist(),
                          pruned["score"].to_pylist(),
                          pruned["block_key"].to_pylist()))
            assert got == want, (scorer, thr, got ^ want)


def test_fuzzy_match_null_text_does_not_crash():
    """A null text row reaches the bucket scorer (make_block_key maps
    it to a non-null key), which used to crash on None.split(); it is
    scored as "" like the reference's csv rows would be."""
    left = rd.from_arrow(pa.table({
        "id": pa.array(["l1", "l2"], pa.string()),
        "text": pa.array(["akasya mahalle no 12", None], pa.string()),
    }))
    right = rd.from_arrow(pa.table({
        "id": pa.array(["r1", "r2"], pa.string()),
        "text": pa.array(["akasya mah no 12", None], pa.string()),
    }))
    cfg = MatchConfig(threshold=80.0, topk=1, left_id="id",
                      right_id="id", block_by="digits+prefix6",
                      text_col="text")
    edges = match_datasets(left, right, cfg,
                           left_text_col="text",
                           right_text_col="text").to_pandas()
    # the real pair matches; the null-null pair is scored as two
    # IDENTICAL empty strings (text_s=100, rapidfuzz's empty-equal
    # semantics) and so also clears the threshold — pinned, not
    # accidental
    assert set(zip(edges["left_id"], edges["right_id"])) == \
        {("l1", "r1"), ("l2", "r2")}
