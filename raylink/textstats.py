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


# --- TF-IDF top-k keyword extraction -------------------------------
#
# Per-doc keyword extraction with the same exactness contract as
# raylink/lm.py: idf_e6 = floor(1e6 * ln(N / df)) is precomputed ONCE
# over the document-frequency table with math.log (bit-equal to DuckDB
# ln, measured), per-term score = tf * idf_e6 is exact int64, and the
# per-doc top-k orders by (score DESC, term ASC) — fully deterministic
# and hash-checkable against a SQL window-function twin.
#
# Shape at scale: the df table is one pre-aggregated count shuffle
# (per-batch per-DOC distinct, so the shuffle moves (term, partial
# distinct-doc count) rows); the collect is bounded by MAX_DF_ENTRIES
# and prunable with min_df (mirrored as a HAVING clause in the twin);
# scoring broadcasts the idf dict via ray.put and runs per batch as
# C-level pandas groupby/map/sort — a doc's rows never leave their
# batch, so no second shuffle.

MAX_DF_ENTRIES = 2_000_000


def document_frequencies(ds, text_col: str, min_df: int = 1):
    """(token, df) Dataset: df = number of distinct docs containing
    the token (lowercase whitespace tokens, empties dropped)."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        s = pc.utf8_lower(s)
        split = pc.utf8_split_whitespace(s)
        toks = pc.list_flatten(split)
        parent = pc.list_parent_indices(split)
        mask = pc.greater(pc.utf8_length(toks), 0)
        t = pa.table({"token": toks.filter(mask),
                      "doc": parent.filter(mask)})
        # distinct (token, doc) within the batch == distinct within
        # each doc (a doc is one row, never split across batches)
        dd = t.group_by(["token", "doc"]).aggregate([])
        agg = dd.group_by("token").aggregate([([], "count_all")])
        return agg.rename_columns(["token", "n"])

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="df")))
    if min_df > 1:
        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["df"],
                                             pa.scalar(min_df)))
        out = out.map_batches(prune, batch_format="pyarrow")
    return out


def fit_idf(ds, text_col: str, min_df: int = 1):
    """Bounded driver collect of the df table -> broadcast-ready
    {token: idf_e6} dict plus the doc count N."""
    import math

    import ray

    n_docs = ds.count()
    m = document_frequencies(ds, text_col, min_df=min_df).materialize()
    n = m.count()
    if n > MAX_DF_ENTRIES:
        raise ValueError(
            f"fit_idf: df table has {n} entries > MAX_DF_ENTRIES="
            f"{MAX_DF_ENTRIES}; raise min_df (mirrored as HAVING in "
            f"the SQL twin)")
    df = m.to_pandas()
    idf = {
        t: math.floor(1e6 * math.log(n_docs / int(d)))
        for t, d in zip(df["token"].tolist(), df["df"].tolist())
    }
    return ray.put({"idf_e6": idf, "n_docs": n_docs})


class TopKeywords:
    """Actor-pool stage: per-doc top-k TF-IDF keywords. idf table
    loads once per actor from the object store."""

    def __init__(self, idf_ref, text_col: str, id_col: str, k: int):
        import ray

        bundle = ray.get(idf_ref) if isinstance(
            idf_ref, ray.ObjectRef) else idf_ref
        self.idf = bundle["idf_e6"]
        self.text_col = text_col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        doc_idx: list[int] = []
        toks: list[str] = []
        for i, t in enumerate(texts):
            for w in (t or "").lower().split():
                doc_idx.append(i)
                toks.append(w)
        id_type = batch.schema.field(self.id_col).type
        if not toks:
            return pa.table({
                self.id_col: pa.array([], id_type),
                "rank": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "score_e6": pa.array([], pa.int64()),
            })
        df = pd.DataFrame({"d": np.asarray(doc_idx, np.int64),
                           "w": pd.Series(toks, dtype=object)})
        tf = df.groupby(["d", "w"], sort=False).size().reset_index(
            name="tf")
        idf = tf["w"].map(self.idf)
        keep = idf.notna().to_numpy()
        tf = tf[keep]
        score = (tf["tf"].to_numpy(dtype=np.int64)
                 * idf.to_numpy(dtype=np.float64)[keep].astype(np.int64))
        tf = tf.assign(score_e6=score)
        tf = tf.sort_values(["d", "score_e6", "w"],
                            ascending=[True, False, True],
                            kind="mergesort")
        rank = tf.groupby("d", sort=False).cumcount() + 1
        tf = tf[rank.to_numpy() <= self.k]
        rank = rank[rank <= self.k]
        out_ids = pa.array([ids[i] for i in tf["d"]], id_type)
        return pa.table({
            self.id_col: out_ids,
            "rank": pa.array(rank.to_numpy(dtype=np.int64)),
            "term": pa.array(tf["w"].tolist(), pa.string()),
            "score_e6": pa.array(tf["score_e6"].to_numpy(
                dtype=np.int64)),
        })


def top_keywords(ds, text_col: str, id_col: str, k: int = 5,
                 min_df: int = 1, concurrency: int = 4,
                 batch_size: int = 4096):
    """Per-doc top-k TF-IDF keywords: (id, rank, term, score_e6)."""
    ref = fit_idf(ds, text_col, min_df=min_df)
    return ds.map_batches(
        TopKeywords,
        fn_constructor_args=(ref, text_col, id_col, k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
