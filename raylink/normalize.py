"""Canonical config-driven text normalization as a Ray Data stage.

Reproduces the ordered-step semantics of the reference's
``normalize_text`` (addresskit/normalize.py:85-136): mojibake repair ->
TR-safe lowercase -> diacritic folding -> ordered regex rules -> literal
replaces -> word-boundary abbreviation expansion -> stopword removal ->
punctuation strip -> space collapse. Broken regex rules are silently
skipped, exactly like the reference (normalize.py:104-110).

The compiled rule set is built once per worker process (module-level
cache keyed by config fingerprint), so the per-batch path only runs the
compiled steps.
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa

from .config import DEFAULT_NORMALIZE_CFG, fingerprint
from .textkernels import fold_tr_diacritics, maybe_unmojibake, tr_safe_lower

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


class CompiledNormalizer:
    """Pre-compiled normalize_text steps. Safe to construct on the driver
    and ship to workers (regex objects pickle fine), but typically built
    lazily per worker via :func:`get_normalizer`."""

    def __init__(self, cfg: dict | None = None):
        cfg = dict(DEFAULT_NORMALIZE_CFG if cfg is None else cfg)
        self.cfg = cfg
        self.fix_mojibake = bool(cfg.get("fix_mojibake", False))
        self.lowercase = bool(cfg.get("lowercase", True))
        self.fold_diacritics = bool(cfg.get("fold_diacritics", False))
        self.strip_punctuation = bool(cfg.get("strip_punctuation", False))
        self.strip_extra_spaces = bool(cfg.get("strip_extra_spaces", True))

        self.regex_rules: list[tuple[re.Pattern, str]] = []
        for rule in cfg.get("regex") or []:
            try:
                pat = rule.get("pattern")
                repl = rule.get("repl", "")
                if pat:
                    self.regex_rules.append((re.compile(pat, re.UNICODE), repl))
            except re.error:
                # broken patterns silently skipped (normalize.py:104-110)
                continue

        self.replaces: list[tuple[str, str]] = [
            (k, v if isinstance(v, str) else "")
            for k, v in (cfg.get("replace") or {}).items()
            if isinstance(k, str)
        ]

        # (needle, pattern, target): the pattern is the ESCAPED literal
        # between word boundaries, so `needle in addr` is a necessary
        # condition for a match — a C-level substring precheck that
        # skips the regex scan on the ~75-100% of rows a given
        # abbreviation is absent from (exact; measured parse/normalize
        # chains are the dominant prepare cost)
        self.abbrev_rules: list[tuple[str, re.Pattern, str]] = [
            (src,
             re.compile(rf"\b{re.escape(src)}\b", re.UNICODE), str(tgt))
            for src, tgt in (cfg.get("abbreviations") or {}).items()
            if isinstance(src, str)
        ]

        self.stopwords = set(cfg.get("stopwords") or [])

    def __call__(self, addr: str | None) -> str:
        addr = addr or ""
        if self.fix_mojibake:
            addr = maybe_unmojibake(addr)
        if self.lowercase:
            addr = tr_safe_lower(addr)
        if self.fold_diacritics:
            addr = fold_tr_diacritics(addr)
        for pat, repl in self.regex_rules:
            addr = pat.sub(repl, addr)
        for k, v in self.replaces:
            addr = addr.replace(k, v)
        for src, pat, tgt in self.abbrev_rules:
            if src in addr:
                addr = pat.sub(tgt, addr)
        if self.stopwords:
            addr = " ".join(
                t for t in addr.split() if t not in self.stopwords
            )
        if self.strip_punctuation:
            addr = _PUNCT_RE.sub(" ", addr)
        if self.strip_extra_spaces:
            addr = " ".join(addr.split())
        return addr


_NORMALIZER_CACHE: dict[str, CompiledNormalizer] = {}


def get_normalizer(cfg: dict | None = None) -> CompiledNormalizer:
    """Per-process compiled-normalizer cache (compile once per worker)."""
    key = fingerprint(cfg if cfg is not None else DEFAULT_NORMALIZE_CFG)
    norm = _NORMALIZER_CACHE.get(key)
    if norm is None:
        norm = CompiledNormalizer(cfg)
        _NORMALIZER_CACHE[key] = norm
    return norm


def normalize_text(addr: str, cfg: dict | None = None) -> str:
    """Single-value convenience wrapper (tests / oracles)."""
    return get_normalizer(cfg)(addr)


def make_normalize_batch_fn(
    text_col: str,
    out_col: str = "addr_norm",
    cfg: dict | None = None,
) -> Callable[[pa.Table], pa.Table]:
    """Batch kernel factory for ``ds.map_batches(fn,
    batch_format="pyarrow")``. The config dict (plain data) is captured
    in the closure; compilation happens lazily once per worker process.
    """

    def normalize_batch(batch: pa.Table) -> pa.Table:
        norm = get_normalizer(cfg)
        values = batch.column(text_col).to_pylist()
        out = pa.array(
            [norm(v) for v in values], type=pa.string()
        )
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, out)

    return normalize_batch


def normalize_dataset(
    ds,
    text_col: str,
    out_col: str = "addr_norm",
    cfg: dict | None = None,
    batch_size: int | None = None,
):
    """``pages.map_batches(normalize)`` stage — stateless tasks; rule
    compilation amortized per worker via the module cache.
    batch_size=None => one batch per upstream block, which keeps task
    granularity equal to the read parallelism (a fixed batch_size lets
    Ray bundle several blocks into one task and starves the CPUs)."""
    return ds.map_batches(
        make_normalize_batch_fn(text_col, out_col, cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
