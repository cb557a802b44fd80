"""Config layer: YAML-driven normalize / match / pipeline configs.

Mirrors the reference's three config surfaces (configs/normalize.yaml,
configs/match.yaml, configs/pipeline.yaml; loader semantics from
addresskit/normalize.py:30-34 — missing file -> {}) with validation of
the quirks the reference enforces in code (threshold 0-1 -> percent,
addresskit/match.py:96-103).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml


def load_cfg(cfg_path: str | Path | None) -> dict:
    """YAML -> dict; missing/None path -> {} (reference
    addresskit/normalize.py:30-34)."""
    if cfg_path is None:
        return {}
    p = Path(cfg_path)
    if not p.exists():
        return {}
    return yaml.safe_load(p.read_text(encoding="utf-8")) or {}


def fingerprint(obj: Any) -> str:
    """Stable sha256 of a JSON-serializable object — used for checkpoint
    manifests (replaces the reference's md5 file cache keys,
    scripts/baseline_submission.py:51-56)."""
    blob = json.dumps(obj, sort_keys=True, ensure_ascii=False, default=str)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:16]


# Default normalize config reproducing the reference's canonical
# normalize_text behavior (addresskit/normalize.py:85-136) with the
# rule tables of configs/normalize.yaml adapted to the ordered-step model.
DEFAULT_NORMALIZE_CFG: dict = {
    "fix_mojibake": True,
    "lowercase": True,
    "fold_diacritics": True,
    "regex": [
        # no:15 / no-15 / no15 -> "no 15" (normalize_and_parse.py:66-67)
        {"pattern": r"\bno\s*[:\-]?\s*(\d+)", "repl": r"no \1"},
        # 864.sokak -> 864 sokak (normalize_and_parse.py:70)
        {"pattern": r"(\d+)\.(sokak|cadde|mahalle)\b", "repl": r"\1 \2"},
    ],
    "replace": {},
    "abbreviations": {
        # expand_abbr families from configs/normalize.yaml:5-12 inverted
        # to src->target word-boundary replacements.
        # NOTE (PARITY #12): keys ending in '.' compile to
        # \b<src>\.\b in BOTH engines (reference
        # addresskit/normalize.py:118-122 builds the same pattern);
        # \b after '.' needs a following WORD char, so the rule is
        # dead before a space/end ("mah. x" — the dotless twin does
        # the work) but fires when the dot abuts a word char
        # ("mah.5" -> "mahalle5").
        "mah.": "mahalle", "mah": "mahalle", "mh.": "mahalle",
        "mh": "mahalle", "mahallesi": "mahalle",
        "cad.": "cadde", "cad": "cadde", "cd.": "cadde", "caddesi": "cadde",
        "sok.": "sokak", "sok": "sokak", "sk.": "sokak", "sk": "sokak",
        "sokagi": "sokak",
        "blv.": "bulvar", "blv": "bulvar", "bulv.": "bulvar",
        "bulv": "bulvar", "bulvari": "bulvar",
        "apt.": "apartman", "apt": "apartman",
    },
    "stopwords": [],
    "strip_punctuation": True,
    "strip_extra_spaces": True,
}


@dataclass
class MatchConfig:
    """Matcher configuration (reference configs/match.yaml +
    addresskit/match.py:91-129 defaults)."""

    method: str = "fuzzy"                  # "index" | "fuzzy"
    text_col: str | None = "addr_norm"
    scorer: str = "token_set_ratio"
    threshold: float = 60.0                # 0-100; <=1.0 coerced to percent
    topk: int = 3
    left_id: str = "id"
    right_id: str = "id"
    block_by: str = "digits+prefix6"
    w_text: float = 0.8
    w_digits: float = 0.15
    w_geo: float = 0.05
    geo_max_km: float = 1.5
    semantic_stopwords: list[str] = field(default_factory=list)
    write_unmatched: bool = True
    keep_best_per_right: bool = False      # documented-but-missing in ref (K2)
    # scale controls (new engine — not in reference)
    max_block_pairs: int = 2_000_000       # cap L*R pairs per block
    salt_over: int = 512                   # salt blocks bigger than this
    num_salts: int = 8
    num_buckets: int = 0                   # co-shuffle hash buckets; 0 = session-sized (match._effective_buckets)
    shuffle_partitions: int = 64           # coalesce before wide groupbys

    def __post_init__(self) -> None:
        # threshold 0-1 -> percent (addresskit/match.py:96-103)
        try:
            t = float(self.threshold)
        except (TypeError, ValueError):
            t = 80.0
        if t <= 1.0:
            t *= 100.0
        self.threshold = t
        self.topk = int(self.topk)

    @classmethod
    def from_dict(cls, cfg: dict) -> "MatchConfig":
        w = cfg.get("weights") or {}
        return cls(
            method=str(cfg.get("method", "fuzzy")).lower(),
            text_col=cfg.get("text_col"),
            scorer=str(cfg.get("scorer", "token_set_ratio")).lower(),
            threshold=cfg.get("threshold", 80),
            topk=cfg.get("topk", 1),
            left_id=cfg.get("left_id", "id"),
            right_id=cfg.get("right_id", "id"),
            block_by=cfg.get("block_by", ""),
            w_text=float(w.get("text", 0.8)),
            w_digits=float(w.get("digits", 0.2)),
            w_geo=float(w.get("geo", 0.2)),
            geo_max_km=float(cfg.get("geo_max_km", 1.5)),
            semantic_stopwords=[
                t.strip() for t in (cfg.get("semantic_stopwords") or [])
                if t and isinstance(t, str)
            ],
            write_unmatched=bool(cfg.get("write_unmatched", True)),
            keep_best_per_right=bool(cfg.get("keep_best_per_right", False)),
            max_block_pairs=int(cfg.get("max_block_pairs", 2_000_000)),
            salt_over=int(cfg.get("salt_over", 512)),
            num_salts=int(cfg.get("num_salts", 8)),
            num_buckets=int(cfg.get("num_buckets", 0)),
            shuffle_partitions=int(cfg.get("shuffle_partitions", 64)),
        )

    @classmethod
    def from_yaml(cls, path: str | Path | None) -> "MatchConfig":
        return cls.from_dict(load_cfg(path))

    def to_dict(self) -> dict:
        return dict(self.__dict__)
