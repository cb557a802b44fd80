"""Single-process oracle mirroring the reference's match loop control
flow (addresskit/match.py:167-231): dict-of-lists blocking, per-left
candidate loop, gate -> score -> combine -> threshold -> topk. Used to
check the distributed Ray pipeline reproduces identical edges
(pairwise parity at the same blocking key)."""

from __future__ import annotations

from raylink.blocking import make_block_key
from raylink.config import MatchConfig
from raylink.scoring import (
    combine_scores,
    extract_numbers,
    geo_score_km,
    haversine_km,
    tokenize_without_stops,
)
from raylink.textkernels import get_scorer


def oracle_match(left_rows, right_rows, cfg: MatchConfig):
    """left/right_rows: list[dict] with 'id', 'text' (+optional
    lat/lon). Returns list of (left_id, right_id, score)."""
    scorer = get_scorer(cfg.scorer)
    stops = set(cfg.semantic_stopwords)

    def bucketize(rows):
        buckets = {}
        for r in rows:
            k = make_block_key({"t": r["text"]}, "t", cfg.block_by)
            buckets.setdefault(k, []).append(r)
        return buckets

    lb = bucketize(left_rows)
    rb = bucketize(right_rows)
    edges = []
    for key, lbucket in lb.items():
        rbucket = rb.get(key, [])
        if not rbucket:
            continue
        r_pre = [
            (
                rr,
                tokenize_without_stops(rr["text"], stops),
                extract_numbers(rr["text"]),
            )
            for rr in rbucket
        ]
        for lrow in lbucket:
            ltok = tokenize_without_stops(lrow["text"], stops)
            lnum = extract_numbers(lrow["text"])
            best = []
            for rr, rtok, rnum in r_pre:
                if stops and not (ltok & rtok):
                    continue
                text_s = float(scorer(lrow["text"], rr["text"]))
                d_s = 100.0 if (lnum and rnum and lnum & rnum) else 0.0
                g_s = None
                if (
                    lrow.get("lat") is not None
                    and lrow.get("lon") is not None
                    and rr.get("lat") is not None
                    and rr.get("lon") is not None
                ):
                    g_s = geo_score_km(
                        haversine_km(lrow["lat"], lrow["lon"],
                                     rr["lat"], rr["lon"]),
                        max_km=cfg.geo_max_km,
                    )
                conf = combine_scores(
                    text_s, d_s, g_s,
                    w_text=cfg.w_text, w_digits=cfg.w_digits,
                    w_geo=cfg.w_geo,
                )
                if conf >= cfg.threshold:
                    best.append((conf, rr["id"]))
            best.sort(key=lambda x: (-x[0], x[1]))
            for conf, rid in best[: cfg.topk]:
                edges.append((lrow["id"], rid, round(conf, 2)))
    return edges
