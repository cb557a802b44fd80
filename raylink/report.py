"""Match preview + pairwise evaluation — the reference's
``make_match_preview.py:15-30`` (join edges back to the source texts
for human inspection) and ``scripts/eval.py:21-27`` (gold-vs-pred
metrics), re-expressed over Datasets.

Preview is a debug/inspection op over a bounded head of the edge set
(``n`` rows): the two text lookups broadcast the preview's id set and
semi-filter each side with one scan — no corpus shuffle. Evaluation
compares bounded pair sets (precision/recall/F1 over unordered pairs,
the F13 metric); both guard their driver-side collection with an
explicit row cap.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def match_preview(edges, left, right, left_id: str = "url",
                  right_id: str = "url", text_col: str = "addr_norm",
                  n: int = 1000):
    """First ``n`` edges joined back to both side texts ->
    Dataset (left_id, right_id, score, left_text, right_text)."""
    head = edges.limit(n).take_all()
    if not head:
        return rd.from_arrow(pa.table({
            "left_id": pa.array([], pa.string()),
            "right_id": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "left_text": pa.array([], pa.string()),
            "right_text": pa.array([], pa.string())}))
    lids = {str(r["left_id"]) for r in head}
    rids = {str(r["right_id"]) for r in head}

    def lookup(side, ids, id_col):
        from .joins import broadcast_semi_join

        sub = broadcast_semi_join(
            side.map_batches(
                lambda t, c=id_col: pa.table(
                    {id_col: t.column(c).cast(pa.string()),
                     text_col: t.column(text_col)}),
                batch_format="pyarrow"),
            sorted(ids), key=id_col)
        return {r[id_col]: r[text_col] for r in sub.take_all()}

    ltext = lookup(left, lids, left_id)
    rtext = lookup(right, rids, right_id)
    return rd.from_arrow(pa.table({
        "left_id": pa.array([str(r["left_id"]) for r in head], pa.string()),
        "right_id": pa.array([str(r["right_id"]) for r in head],
                             pa.string()),
        "score": pa.array([float(r.get("score", 0.0)) for r in head],
                          pa.float64()),
        "left_text": pa.array([ltext.get(str(r["left_id"])) for r in head],
                              pa.string()),
        "right_text": pa.array([rtext.get(str(r["right_id"]))
                                for r in head], pa.string()),
    }))


def pairwise_eval(pred_edges, gold_edges, max_pairs: int = 5_000_000) -> dict:
    """Pairwise precision/recall/F1 of predicted vs gold edge pairs
    (unordered; reference scripts/eval.py semantics, F13). Collects
    both pair sets to the driver — guarded by ``max_pairs``; edge sets
    are already the small output of a blocked matcher.

    A gold table carrying an ``is_match`` (or ``match``) boolean
    column is a LABELED pair set — e.g. the repo's own
    labeled_pairs.parquet, whose in-block NEGATIVES would otherwise be
    counted as gold positives (inflating fn and crediting predicted
    negatives as tp). Only true rows enter the gold set; null labels
    count as negatives."""

    def pair_set(ds, label_cols: tuple = ()) -> set:
        cols = ds.schema().names if ds.schema() is not None else []
        label = next((c for c in label_cols if c in cols), None)
        keep = ["left_id", "right_id"] + ([label] if label else [])
        out = set()
        for b in ds.select_columns(keep).iter_batches(
                batch_format="pyarrow"):
            if label is not None:
                mask = pc.fill_null(
                    b.column(label).cast(pa.bool_()), False)
                b = b.filter(mask)
            for l, r in zip(b.column("left_id").to_pylist(),
                            b.column("right_id").to_pylist()):
                a, bb = str(l), str(r)
                out.add((a, bb) if a <= bb else (bb, a))
                if len(out) > max_pairs:
                    raise ValueError(
                        f"edge set exceeds max_pairs={max_pairs}; "
                        "evaluate on a sample")
        return out

    pred = pair_set(pred_edges)
    gold = pair_set(gold_edges, label_cols=("is_match", "match"))
    tp = len(pred & gold)
    fp = len(pred - gold)
    fn = len(gold - pred)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision,
            "recall": recall, "f1": f1}
