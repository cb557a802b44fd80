"""Weak labeling: token-level BIO-ish gazetteer tags (B-MAHALLE / B-IL /
B-ILCE, else O) over normalized address text.

Mirrors the reference's ``weak_label_address``
(addresskit/preprocessing/weak_labeling.py:15-43) as an actor-pool
map_batches stage: the gazetteers (possibly large JSON dicts in the
reference) are ``ray.put`` once on the driver and loaded per actor in
__init__ — broadcast, never re-shipped per batch.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from .normalize import get_normalizer
from .parse import CITY_HINTS, DISTRICT_HINTS, IL_SET


def default_gazetteers() -> dict:
    """Built-in stand-ins for the reference's posta hierarchy JSONs
    (which are not shipped in the reference repo either)."""
    return {
        "mahalle_index": set(),            # neighborhood index
        "il": set(IL_SET) | set(CITY_HINTS),
        "ilce": set(DISTRICT_HINTS),
    }


class WeakLabel:
    def __init__(self, gazetteer_ref=None, normalize_cfg: dict | None = None,
                 text_col: str = "text"):
        gaz = (ray.get(gazetteer_ref) if gazetteer_ref is not None
               else default_gazetteers())
        self.mah = set(gaz.get("mahalle_index") or ())
        self.il = set(gaz.get("il") or ())
        self.ilce = set(gaz.get("ilce") or ())
        self.norm = get_normalizer(normalize_cfg)
        self.text_col = text_col

    def label_one(self, text: str) -> tuple[list[str], list[str]]:
        tokens = self.norm(text or "").split()
        labels = []
        for tok in tokens:
            if tok in self.mah:
                labels.append("B-MAHALLE")
            elif tok in self.il:
                labels.append("B-IL")
            elif tok in self.ilce:
                labels.append("B-ILCE")
            else:
                labels.append("O")
        return tokens, labels

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        toks, labs = [], []
        for t in texts:
            tk, lb = self.label_one(t)
            toks.append(tk)
            labs.append(lb)
        batch = batch.append_column(
            "tokens", pa.array(toks, pa.list_(pa.string())))
        return batch.append_column(
            "bio_labels", pa.array(labs, pa.list_(pa.string())))


def weak_label_dataset(ds, text_col: str = "text", gazetteers: dict | None = None,
                       normalize_cfg: dict | None = None,
                       concurrency: int = 2, batch_size: int = 2048):
    ref = ray.put(gazetteers or default_gazetteers())
    return ds.map_batches(
        WeakLabel,
        fn_constructor_kwargs={"gazetteer_ref": ref,
                               "normalize_cfg": normalize_cfg,
                               "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
