"""Learned field-weighted pair matcher (north_star: candidate pairs
scored by JW/Levenshtein channels plus a learned field-weighted
classifier; reference trains with sklearn SGD-logistic,
scripts/train_baseline.py:64-150):

1. the logistic fit is deterministic (bit-identical weights across
   fits) and refuses single-class input,
2. feature-level holdout F1 on the fixture's labeled pairs clears the
   north-rule bar,
3. the DISTRIBUTED matcher (same salted block co-shuffle as the
   flagship) reproduces the gold edge set, and its probabilities agree
   with the driver-side model on the same features,
4. the learned weights are genuinely per-field (one per
   PAIR_FEATURE_NAMES entry).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raylink.config import MatchConfig
from raylink.fixtures import build_labeled_pairs, build_pages
from raylink.pairmatcher import (
    PAIR_FEATURE_NAMES,
    PairMatcher,
    collect_pair_training,
    fit_pair_matcher,
    match_pairs_learned,
    pair_feature_row,
    pairwise_f1,
)
from raylink.pipeline import prepare_pages

N_ENTITIES = 150


@pytest.fixture(scope="module")
def trained(ray_session):
    pages, truth = build_pages(N_ENTITIES, seed=42)
    labeled = build_labeled_pairs(pages, truth)
    prepared = prepare_pages(rd.from_arrow(pages), with_parse=True,
                             block_by="digits+prefix6").materialize()
    x, y, kept = collect_pair_training(prepared, labeled)

    def ent_of(url: str) -> int:
        return int(url.rsplit("/", 2)[-2])

    parity = np.array([ent_of(l) % 2 for l, _ in kept])
    tr = parity == 0
    model = fit_pair_matcher(x[tr], y[tr])
    return prepared, labeled, x, y, kept, parity, model


def test_fit_deterministic_and_field_weighted(trained):
    _, _, x, y, _, parity, model = trained
    again = fit_pair_matcher(x[parity == 0], y[parity == 0])
    assert np.array_equal(model.w, again.w) and model.b == again.b
    assert model.w.shape == (len(PAIR_FEATURE_NAMES),)
    assert set(model.weights_by_field()) == set(PAIR_FEATURE_NAMES)
    with pytest.raises(ValueError):
        fit_pair_matcher(x[:4], np.ones(4))


def test_holdout_f1(trained):
    _, _, x, y, kept, parity, model = trained
    te = parity == 1
    pred = model.predict_proba(x[te]) >= 0.5
    te_pairs = [kept[i] for i in np.flatnonzero(te)]
    got = {p for p, hit in zip(te_pairs, pred) if hit}
    labeled_te = pa.table({
        "left_id": pa.array([p[0] for p in te_pairs]),
        "right_id": pa.array([p[1] for p in te_pairs]),
        "is_match": pa.array([bool(v) for v in y[te]], pa.bool_()),
    })
    assert pairwise_f1(got, labeled_te) >= 0.95


def test_distributed_edges_match_gold_and_driver_probs(trained):
    prepared, labeled, _, _, _, _, model = trained
    cfg = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                      block_by="digits+prefix6",
                      left_id="url", right_id="url")
    edges = match_pairs_learned(prepared, model, cfg).to_pandas()
    got = set(zip(edges["left_id"], edges["right_id"]))
    assert pairwise_f1(got, labeled) >= 0.99

    # distributed probabilities == driver-side model on the same
    # features (no train/serve skew): recompute for a sample of edges
    df = prepared.to_pandas().set_index("url")
    for _, e in edges.head(50).iterrows():
        l, r = df.loc[e["left_id"]], df.loc[e["right_id"]]

        def fields(row):
            p = row["parts"]
            return tuple((p.get(f) or "") if isinstance(p, dict) else ""
                         for f in ("mahalle", "cadde", "sokak", "no"))

        feat = pair_feature_row(l["addr_norm"], r["addr_norm"],
                                fields(l), fields(r))
        want = PairMatcher(model.w, model.b).predict_proba(
            np.asarray([feat]))[0]
        assert e["score"] == pytest.approx(round(want, 6), abs=1e-9)


def test_learned_matcher_salting_invariance(trained):
    """Salting every block must preserve the learned matcher's edge
    set exactly (extra part columns replicate with the hot rows
    through match_tagged's salted projection)."""
    from raylink.blocking import make_block_key

    prepared, _, _, _, _, _, model = trained
    cfg = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                      block_by="digits+prefix6",
                      left_id="url", right_id="url")

    def edge_set(hot):
        e = match_pairs_learned(prepared, model, cfg,
                                hot_keys=hot).to_pandas()
        return set(zip(e["left_id"], e["right_id"], e["score"]))

    all_keys = {
        make_block_key({"t": t}, "t", cfg.block_by)
        for t in prepared.to_pandas()["addr_norm"]
    }
    assert edge_set(None) == edge_set(all_keys)


def test_learned_matcher_rejects_hard_twins(trained):
    """Every 5th fixture entity has a same-block 'hard twin' (same
    mahalle prefix + same no). The labeled negatives are exactly those
    twin cross-pairs; a model that only thresholds whole-string
    similarity keeps them. Verify the learned matcher drops every
    labeled negative at the gate threshold."""
    prepared, labeled, _, _, _, _, model = trained
    cfg = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                      block_by="digits+prefix6",
                      left_id="url", right_id="url")
    edges = match_pairs_learned(prepared, model, cfg).to_pandas()
    got = set(zip(edges["left_id"], edges["right_id"]))
    negatives = {
        (l, r)
        for l, r, m in zip(labeled["left_id"].to_pylist(),
                           labeled["right_id"].to_pylist(),
                           labeled["is_match"].to_pylist())
        if not m
    }
    assert not (got & negatives)


def test_collect_pair_training_skips_null_ids(trained):
    """A labeled row with a null id can never resolve against
    prepared; it must be skipped like a quality-dropped url, not crash
    sorted() with a str-vs-None TypeError."""
    prepared, labeled, x, y, kept, _, _ = trained
    with_null = pa.table({
        "left_id": pa.array(
            labeled["left_id"].to_pylist() + [None, "u"]),
        "right_id": pa.array(
            labeled["right_id"].to_pylist() + ["u", None]),
        "is_match": pa.array(
            labeled["is_match"].to_pylist() + [True, False]),
    })
    x2, y2, kept2 = collect_pair_training(prepared, with_null)
    assert kept2 == kept
    assert np.array_equal(x2, x) and np.array_equal(y2, y)
