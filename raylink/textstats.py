"""Text-analysis operators for training-data pipelines: language ID
(marker-token heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling hash). All vectorized per batch; all
deterministic; each has an exactly-matching SQL formulation used as the
DuckDB oracle in __ray_entry__.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# fixed priority order — ties resolve to the earliest language
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "with", "is")),
    ("de", ("der", "die", "das", "und", "mit")),
    ("fr", ("le", "la", "les", "et", "avec")),
    ("es", ("el", "los", "las", "y", "con")),
    ("tr", ("ve", "bir", "bu", "için", "ile")),
]

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is")

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space marks
# (the GPT-2-style pre-tokenization regex family, simplified to ASCII)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def detect_lang(text: str) -> str:
    toks = (text or "").lower().split()
    counts = []
    for lang, markers in LANG_MARKERS:
        ms = set(markers)
        counts.append((lang, sum(1 for t in toks if t in ms)))
    best_lang, best_n = "und", 0
    for lang, n in counts:
        if n > best_n:
            best_lang, best_n = lang, n
    return best_lang


def add_lang_id(ds, text_col: str, out_col: str = "lang_pred",
                batch_size: int = 8192):
    def f(batch: pa.Table) -> pa.Table:
        preds = [detect_lang(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(preds, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def add_token_counts(ds, text_col: str, batch_size: int = 8192):
    """ws_tokens: whitespace token count; bpe_tokens: BPE-ish piece
    count (letters runs, digit runs, single marks)."""

    def f(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        ws = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int32())
        bpe = pc.cast(
            pc.count_substring_regex(s, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"),
            pa.int32())
        for name, arr in (("ws_tokens", ws), ("bpe_tokens", bpe)):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, arr)
        return batch

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def add_quality_score(ds, text_col: str, out_col: str = "quality",
                      batch_size: int = 8192):
    """Composite quality in [0,1]:
    0.4 * length_ok(20..2000 chars) + 0.3 * (1 - punct_ratio)
    + 0.3 * stopword_ratio_capped   (all computed vectorized).
    Expressible 1:1 in SQL for the oracle."""

    def f(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        n = pc.cast(pc.utf8_length(s), pa.float64())
        words = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.float64())
        punct = pc.cast(pc.count_substring_regex(s, r"[^\w\s]"),
                        pa.float64())
        stop_pat = r"\b(?:" + "|".join(STOPWORDS_EN) + r")\b"
        stops = pc.cast(pc.count_substring_regex(s, stop_pat), pa.float64())
        len_ok = pc.cast(
            pc.and_(pc.greater_equal(n, 20.0), pc.less_equal(n, 2000.0)),
            pa.float64())
        denom = pc.max_element_wise(n, 1.0)
        wdenom = pc.max_element_wise(words, 1.0)
        punct_ratio = pc.divide(punct, denom)
        stop_ratio = pc.min_element_wise(
            pc.divide(stops, wdenom), 1.0)
        q = pc.add(
            pc.add(pc.multiply(len_ok, 0.4),
                   pc.multiply(pc.subtract(1.0, punct_ratio), 0.3)),
            pc.multiply(stop_ratio, 0.3),
        )
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, q)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


_FP_BASE = 257
_FP_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Document fingerprint: min of a polynomial rolling hash over
    byte windows (winnowing-lite, deterministic)."""
    data = (text or "").encode("utf-8")
    if not data:
        return 0
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * _FP_BASE + b) % _FP_MOD
        return h
    h = 0
    power = pow(_FP_BASE, window - 1, _FP_MOD)
    best = None
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * power) % _FP_MOD
        h = (h * _FP_BASE + b) % _FP_MOD
        if i >= window - 1:
            best = h if best is None or h < best else best
    return best


def add_fingerprint(ds, text_col: str, out_col: str = "fingerprint",
                    window: int = 16, batch_size: int = 8192):
    def f(batch: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(t, window)
               for t in batch.column(text_col).to_pylist()]
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(
            out_col, pa.array(fps, pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
