"""Pairwise confidence scoring: text similarity + digit overlap +
geo proximity combined with present-component weight renormalization.

Semantics mirror the reference exactly (addresskit/scoring/confidence.py):
``digits_score`` (:12-17), ``haversine_km`` (:20-29), ``geo_score_km``
(:32-37) and ``combine_scores`` (:40-60) including the subtle weight
renormalization over only the *present* components and the round(2).
"""

from __future__ import annotations

import math
import re

import numpy as np

_RE_DIGITS = re.compile(r"\d+")


def extract_numbers(s: str) -> set[str]:
    """Digit runs as a set (confidence.py:8-9)."""
    return set(_RE_DIGITS.findall(s or ""))


def digits_score(left: str, right: str) -> float:
    """100 iff digit sets intersect, else 0; 0 when either empty
    (confidence.py:12-17)."""
    left_set, right_set = extract_numbers(left), extract_numbers(right)
    if not left_set or not right_set:
        return 0.0
    return 100.0 if (left_set & right_set) else 0.0


def haversine_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Great-circle distance, R=6371.0088 (confidence.py:20-29)."""
    r = 6371.0088
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    dphi = phi2 - phi1
    dl = math.radians(lon2 - lon1)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(phi1) * math.cos(phi2) * math.sin(dl / 2) ** 2
    )
    return 2 * r * math.asin(math.sqrt(a))


def haversine_km_vec(lat1, lon1, lat2, lon2):
    """Vectorized haversine over numpy arrays (same formula/constant)."""
    r = 6371.0088
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    dphi = phi2 - phi1
    dl = np.radians(np.asarray(lon2) - np.asarray(lon1))
    a = (
        np.sin(dphi / 2) ** 2
        + np.cos(phi1) * np.cos(phi2) * np.sin(dl / 2) ** 2
    )
    return 2 * r * np.arcsin(np.sqrt(a))


def geo_score_km(distance_km: float | None, max_km: float = 1.5) -> float:
    """Linear decay 100 -> 0 over max_km (confidence.py:32-37)."""
    if distance_km is None:
        return 0.0
    d = max(0.0, min(distance_km, max_km))
    return 100.0 * (1.0 - d / max_km)


def combine_scores(
    text_score: float,
    digits: float | None = None,
    geo: float | None = None,
    w_text: float = 0.8,
    w_digits: float = 0.2,
    w_geo: float = 0.2,
) -> float:
    """Weighted mean over the PRESENT components, weights renormalized to
    sum 1 over those components, rounded to 2 decimals
    (confidence.py:40-60). An absent geo means text/digits weights are
    rescaled — this renormalization is load-bearing for F1 parity."""
    parts = [text_score]
    weights = [w_text]
    if digits is not None:
        parts.append(digits)
        weights.append(w_digits)
    if geo is not None:
        parts.append(geo)
        weights.append(w_geo)
    total = sum(weights) if weights else 1.0
    return round(sum(p * (w / total) for p, w in zip(parts, weights)), 2)


def tokenize_without_stops(text: str, stops: set[str]) -> set[str]:
    """Non-stopword token set (reference addresskit/match.py:81-84)."""
    if not text:
        return set()
    return {t for t in text.split() if t and t not in stops}
