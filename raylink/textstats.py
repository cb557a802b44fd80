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
# (the GPT-2-style pre-tokenization regex family, simplified to ASCII).
# Kept as the STRING Arrow's RE2 consumes — a compiled Python copy
# drifted from the operator's literal (code-review r5).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"

# ASCII whitespace split matching RE2 \s (= [\t\n\v\f\r ]) — what the
# DuckDB twins' string_split_regex('\s+') does; Python's default \s is
# Unicode-aware and diverges on U+00A0/U+2028 in web text
_WS_ASCII_RE = re.compile(r"\s+", re.ASCII)


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
        if out_col in batch.column_names:
            # overwrite-on-rerun, like every sibling add_* operator —
            # appending blindly created a duplicate column
            # (code-review r5)
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, pa.array(preds, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def add_token_counts(ds, text_col: str, batch_size: int = 8192):
    """ws_tokens: whitespace token count; bpe_tokens: BPE-ish piece
    count (letters runs, digit runs, single marks)."""

    def f(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
        ws = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int32())
        bpe = pc.cast(
            pc.count_substring_regex(s, BPE_PATTERN),
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
        # counted over the LOWERCASED text (twin: lower(text)) — the
        # lowercase stopword list never matched sentence-initial 'The'
        # etc., silently understating stop_ratio on normal prose
        # (code-review r5; every other tokenizing op lowercases first)
        stops = pc.cast(
            pc.count_substring_regex(pc.utf8_lower(s), stop_pat),
            pa.float64())
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
        # RE2 \s+ (ASCII), NOT utf8_split_whitespace (Unicode classes):
        # the DuckDB twin splits with string_split_regex('\s+'), and a
        # U+00A0/U+2028 in web text would silently diverge the df table
        # — the exact r4 bug class _explode_tokens already fixed
        # (code-review r5)
        split = pc.split_pattern_regex(s, r"\s+")
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
            # ASCII \s+ split to match the df table / SQL twin (RE2);
            # str.split() is Unicode-aware and diverges on U+00A0 etc.
            # (code-review r5)
            for w in _WS_ASCII_RE.split((t or "").lower()):
                if not w:
                    continue
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


# --- Gopher-style repetition signals --------------------------------
#
# The repetition heuristics used by web-corpus curation (Gopher
# appendix A1; also RefinedWeb / Dolma): fraction of duplicate lines,
# fraction of characters inside duplicate lines, fraction of
# characters covered by the single most frequent word n-gram, and
# fraction of characters covered by word n-grams that occur more than
# once. Every formula below is pinned EXACTLY (tie-breaks, denominators,
# integerization) so a DuckDB SQL twin reproduces it bit-for-bit —
# verified in tests/test_repetition.py.
#
# Definitions (per document):
#   lines    = text split on '\n', each trimmed of ' \t\r', empties
#              dropped; line comparisons are on the RAW (case-kept)
#              trimmed line.
#   tokens   = lowercase whitespace tokens (the corpus-wide tokenizer
#              shared with top_keywords / document_frequencies).
#   tok_chars = sum(len(token)) over all tokens — the char denominator
#              (whitespace never counts, so overlapping-gram numerators
#              are comparable across formulas).
#   ngram(n) = n consecutive tokens of ONE doc joined by ' '; its char
#              weight is the sum of its token lengths (no separator).
#
#   dup_line_frac       = (n_lines - n_distinct_lines) / n_lines
#   dup_line_char_frac  = (line_chars - distinct_line_chars) / line_chars
#   top{n}gram_char_frac = count(g*) * chars(g*) / tok_chars, where g*
#       is the most frequent n-gram, ties to the lexicographically
#       smallest; may exceed 1 for self-overlapping grams (documented
#       Gopher behavior; not clamped so the SQL twin stays trivial).
#   dup{n}gram_char_frac = sum over distinct n-grams with count >= 2 of
#       count * chars / tok_chars.
#
# All emitted as floor(1e6 * value) int64 (0 when the denominator is
# 0), matching the repo-wide *_e6 exactness convention.
#
# Scale shape: one pass of map_batches; each doc's lines/tokens explode
# and re-aggregate INSIDE its batch (C-level pandas groupby) — nothing
# shuffles, nothing leaves the batch, so the stage streams at 100 TB.


def _ngram_concat(toks: "np.ndarray", lens: "np.ndarray",
                  parent: "np.ndarray", n: int):
    """Vectorized word-ngram build over an exploded token array:
    (doc_idx, ngram_string, ngram_char_len) for every window of n
    consecutive tokens that stays inside one doc. ``toks`` is an
    object ndarray (elementwise ``+`` is a C loop over PyUnicode
    concat — the same trade top_keywords makes)."""
    import numpy as np

    if len(toks) < n:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64))
    m = len(toks) - n + 1
    valid = parent[:m] == parent[n - 1:]
    grams = toks[:m].copy()
    glens = lens[:m].astype(np.int64).copy()
    for j in range(1, n):
        grams = grams + " "
        grams = grams + toks[j:m + j]
        glens += lens[j:m + j]
    return parent[:m][valid], grams[valid], glens[valid]


def _explode_tokens(batch: pa.Table, text_col: str, lower: bool = True):
    """(toks, lens, parent, tok_chars_per_row) for a batch —
    whitespace tokens (lowercased unless ``lower=False``) via Arrow
    kernels, then numpy views.

    Tokenization is ``split_pattern_regex(r'\\s+')`` — Arrow's regex
    engine is RE2, the SAME engine DuckDB uses for the twins'
    ``string_split_regex('\\s+')``, so both sides split on ASCII
    whitespace only. ``utf8_split_whitespace`` (Unicode classes) would
    silently diverge on U+00A0/U+2028 etc., ubiquitous in web text
    (code-review r4: NBSP doc measured 666666 vs 315789 on
    top2gram_char_frac_e6)."""
    import numpy as np

    s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")
    if lower:
        s = pc.utf8_lower(s)
    split = pc.split_pattern_regex(s, r"\s+")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split)
    mask = pc.greater(pc.utf8_length(flat), 0)
    toks = np.asarray(flat.filter(mask).to_pylist(), dtype=object)
    parent = np.asarray(parent.filter(mask)).astype(np.int64)
    lens = np.fromiter((len(t) for t in toks), np.int64, len(toks))
    tok_chars = np.zeros(batch.num_rows, np.int64)
    np.add.at(tok_chars, parent, lens)
    return toks, lens, parent, tok_chars


def add_repetition_signals(ds, text_col: str,
                           top_ns: tuple[int, ...] = (2, 3),
                           dup_ns: tuple[int, ...] = (5,),
                           batch_size: int = 4096):
    """Append the Gopher-style repetition columns (see module note for
    the exact pinned formulas): n_lines, dup_line_frac_e6,
    dup_line_char_frac_e6, top{n}gram_char_frac_e6 per ``top_ns``,
    dup{n}gram_char_frac_e6 per ``dup_ns``."""
    import numpy as np
    import pandas as pd

    def f(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        s = pc.fill_null(batch.column(text_col).cast(pa.string()), "")

        # ---- lines (raw case, trimmed, empties dropped) ----
        lsplit = pc.split_pattern(s, "\n")
        lflat = pc.utf8_trim(pc.list_flatten(lsplit), " \t\r")
        lparent = pc.list_parent_indices(lsplit)
        lmask = pc.greater(pc.utf8_length(lflat), 0)
        ldf = pd.DataFrame({
            "d": np.asarray(lparent.filter(lmask)).astype(np.int64),
            "ln": lflat.filter(lmask).to_pandas(),
        })
        n_lines = np.zeros(nrows, np.int64)
        dup_line = np.zeros(nrows, np.int64)
        dup_line_char = np.zeros(nrows, np.int64)
        if len(ldf):
            ldf["chars"] = ldf["ln"].str.len().astype(np.int64)
            per_doc = ldf.groupby("d", sort=False)
            tot = per_doc.size()
            tot_chars = per_doc["chars"].sum()
            firsts = ldf.drop_duplicates(["d", "ln"])
            dg = firsts.groupby("d", sort=False)
            distinct = dg.size()
            distinct_chars = dg["chars"].sum()
            idx = tot.index.to_numpy()
            n_lines[idx] = tot.to_numpy()
            # float expressions evaluate LEFT-TO-RIGHT, exactly like the
            # SQL twin's `1e6 * a / b` — same ulp, same floor
            dup_line[idx] = np.floor(
                1e6 * (tot - distinct).to_numpy()
                / tot.to_numpy()).astype(np.int64)
            tc = tot_chars.to_numpy().astype(np.float64)
            dup_line_char[idx] = np.where(
                tc > 0,
                np.floor(1e6 * (tot_chars - distinct_chars).to_numpy()
                         / np.maximum(tc, 1.0)),
                0).astype(np.int64)

        # ---- word n-grams ----
        toks, lens, parent, tok_chars = _explode_tokens(batch, text_col)
        denom = np.maximum(tok_chars.astype(np.float64), 1.0)
        has = tok_chars > 0
        out_cols: dict[str, np.ndarray] = {}
        for n in sorted(set(top_ns) | set(dup_ns)):
            d_idx, grams, glens = _ngram_concat(toks, lens, parent, n)
            cnt = (pd.DataFrame({"d": d_idx, "g": grams, "c": glens})
                   .groupby(["d", "g"], sort=False)
                   .agg(n=("g", "size"), chars=("c", "first"))
                   .reset_index()) if len(d_idx) else pd.DataFrame(
                       columns=["d", "g", "n", "chars"])
            if n in top_ns:
                top = np.zeros(nrows, np.int64)
                if len(cnt):
                    best = (cnt.sort_values(
                        ["d", "n", "g"],
                        ascending=[True, False, True],
                        kind="mergesort").drop_duplicates("d"))
                    bi = best["d"].to_numpy()
                    val = np.floor(
                        1e6 * best["n"].to_numpy(np.float64)
                        * best["chars"].to_numpy(np.float64)
                        / denom[bi])
                    top[bi] = np.where(has[bi], val, 0).astype(np.int64)
                out_cols[f"top{n}gram_char_frac_e6"] = top
            if n in dup_ns:
                dup = np.zeros(nrows, np.int64)
                if len(cnt):
                    reps = cnt[cnt["n"] >= 2]
                    if len(reps):
                        cov = (reps["n"].to_numpy(np.float64)
                               * reps["chars"].to_numpy(np.float64))
                        tot_cov = (pd.Series(cov)
                                   .groupby(reps["d"].to_numpy(),
                                            sort=False).sum())
                        di = tot_cov.index.to_numpy().astype(np.int64)
                        dup[di] = np.where(
                            has[di],
                            np.floor(1e6 * tot_cov.to_numpy()
                                     / denom[di]),
                            0).astype(np.int64)
                out_cols[f"dup{n}gram_char_frac_e6"] = dup

        cols = {"n_lines": n_lines, "dup_line_frac_e6": dup_line,
                "dup_line_char_frac_e6": dup_line_char, **out_cols}
        for name, arr in cols.items():
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(arr, pa.int64()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


# --- benchmark decontamination --------------------------------------
#
# The train/test-overlap check every LLM data pipeline runs before
# training: flag (don't silently drop) every training document that
# contains any word n-gram from a benchmark/eval set. Identity is the
# exact lowercase whitespace-token n-gram (the corpus tokenizer shared
# with top_keywords / add_repetition_signals), so the operator has an
# exact DuckDB twin (tests/test_decontaminate.py).
#
# Scale shape: the benchmark side is SMALL (eval sets are thousands of
# rows) — its distinct n-grams are collected once under a loud bound
# and broadcast via ray.put; the corpus side is one streaming
# map_batches pass over an actor pool (the set loads once per actor,
# never per batch). Nothing shuffles; no corpus byte leaves its batch.

MAX_BENCH_NGRAMS = 5_000_000


def benchmark_ngrams(bench_ds, text_col: str, n: int,
                     max_entries: int = MAX_BENCH_NGRAMS):
    """Distinct word n-grams of the benchmark set -> broadcast-ready
    ObjectRef of a frozenset. Per-batch distinct happens distributed;
    the driver unions the (already deduplicated) batch sets and fails
    loudly past ``max_entries`` instead of going quiet-quadratic."""
    import ray

    def distinct(batch: pa.Table) -> pa.Table:
        toks, lens, parent, _ = _explode_tokens(batch, text_col)
        _, grams, _ = _ngram_concat(toks, lens, parent, n)
        import numpy as np
        return pa.table({"g": pa.array(np.unique(grams).tolist()
                                       if len(grams) else [],
                                       pa.string())})

    out: set[str] = set()
    for b in bench_ds.map_batches(
            distinct, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        out.update(b.column("g").to_pylist())
        if len(out) > max_entries:
            raise ValueError(
                f"benchmark_ngrams: > {max_entries} distinct "
                f"{n}-grams; raise max_entries or shrink the benchmark")
    return ray.put(frozenset(out))


class ContaminationCheck:
    """Actor-pool stage: per-doc benchmark-overlap counters. The
    benchmark n-gram set loads ONCE per actor from the object store."""

    def __init__(self, ngrams_ref, text_col: str, n: int):
        import ray

        self.ngrams = (ray.get(ngrams_ref)
                       if isinstance(ngrams_ref, ray.ObjectRef)
                       else ngrams_ref)
        self.text_col = text_col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        nrows = batch.num_rows
        toks, lens, parent, _ = _explode_tokens(batch, self.text_col)
        d_idx, grams, _ = _ngram_concat(toks, lens, parent, self.n)
        n_ngrams = np.zeros(nrows, np.int64)
        hits = np.zeros(nrows, np.int64)
        distinct_hits = np.zeros(nrows, np.int64)
        if len(d_idx):
            np.add.at(n_ngrams, d_idx, 1)
            # per-gram set probes: Series.isin(frozenset) would rebuild
            # an O(|benchmark|) hashtable EVERY batch (code-review r4 —
            # ~1200 rebuilds of a 5M-entry table across a 4.88M-page
            # run); the frozenset built once in __init__ is already the
            # right structure, so probe it directly
            s = self.ngrams
            hit = np.fromiter((g in s for g in grams), bool,
                              len(grams))
            np.add.at(hits, d_idx[hit], 1)
            if hit.any():
                hp = pd.DataFrame({"d": d_idx[hit], "g": grams[hit]})
                dh = hp.groupby("d", sort=False)["g"].nunique()
                distinct_hits[dh.index.to_numpy()] = dh.to_numpy()
        for name, arr, t in (
                ("n_ngrams", n_ngrams, pa.int64()),
                ("contam_hits", hits, pa.int64()),
                ("contam_distinct", distinct_hits, pa.int64()),
                ("contaminated", hits > 0, pa.bool_())):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(arr, t))
        return batch


def flag_contaminated(ds, text_col: str, bench_ds, bench_text_col: str,
                      n: int = 8, concurrency: int | None = None,
                      batch_size: int = 4096,
                      max_bench_entries: int = MAX_BENCH_NGRAMS):
    """Append per-doc benchmark-overlap columns: n_ngrams (total
    ``n``-gram occurrences), contam_hits (occurrences found in the
    benchmark), contam_distinct (distinct matched grams), contaminated
    (any hit). Flagging, not dropping — the downstream filter stays a
    one-line ``ds.filter`` the pipeline owner controls."""
    ref = benchmark_ngrams(bench_ds, bench_text_col, n,
                           max_entries=max_bench_entries)
    if concurrency is None:
        # The stage is embarrassingly parallel and the probe set is
        # small by contract (eval sets; loud MAX_BENCH_NGRAMS bound),
        # so size the pool to the session like paragraph_dedup's
        # rebuild pool does — the old fixed cap of 4 left 28 of 32
        # CPUs idle and was the whole stage wall (24.2 s -> measured
        # with cpus-4 below). A few CPUs stay headroom for the
        # upstream read tasks.
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, cpus - 4)
    return ds.map_batches(
        ContaminationCheck,
        fn_constructor_args=(ref, text_col, n),
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling (1, N): a FIXED pool waits for its full CPU
        # reservation and deadlocks small sessions when an all-to-all
        # op (e.g. an upstream repartition) holds CPUs — the measured
        # two-reserved-pools pitfall
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def contamination_sql(doc_table: str, bench_table: str, text_col: str,
                      bench_text_col: str, id_col: str = "doc_id",
                      n: int = 8) -> str:
    """DuckDB twin of :func:`flag_contaminated` (exact string-equality
    n-gram semi-join)."""

    def grams(table, col):
        return rf"""
      SELECT *, unnest(list_transform(range(1, len(arr) - {n} + 2),
               i -> array_to_string(arr[i : i + {n - 1}], ' '))) AS g
      FROM (SELECT {'%s' % (id_col if table == doc_table else "1 AS _x")},
              list_filter(string_split_regex(lower({col}), '\s+'),
                          t -> t <> '') AS arr
            FROM {table})"""

    return rf"""
    WITH dg AS ({grams(doc_table, text_col)}
    ), bg AS (
      SELECT DISTINCT g FROM ({grams(bench_table, bench_text_col)})
    ), joined AS (
      SELECT dg.{id_col}, dg.g, (bg.g IS NOT NULL) AS hit
      FROM dg LEFT JOIN bg USING (g)
    ), agg AS (
      SELECT {id_col}, COUNT(*) AS n_ngrams,
        COUNT(*) FILTER (hit) AS contam_hits,
        COUNT(DISTINCT g) FILTER (hit) AS contam_distinct
      FROM joined GROUP BY {id_col}
    )
    SELECT d.{id_col},
      CAST(coalesce(a.n_ngrams, 0) AS BIGINT) AS n_ngrams,
      CAST(coalesce(a.contam_hits, 0) AS BIGINT) AS contam_hits,
      CAST(coalesce(a.contam_distinct, 0) AS BIGINT) AS contam_distinct,
      coalesce(a.contam_hits, 0) > 0 AS contaminated
    FROM {doc_table} d LEFT JOIN agg a USING ({id_col})
    """


def repetition_signals_sql(table: str, text_col: str,
                           top_ns: tuple[int, ...] = (2, 3),
                           dup_ns: tuple[int, ...] = (5,),
                           id_col: str = "doc_id") -> str:
    """Generated DuckDB twin of :func:`add_repetition_signals` — built
    from the same (top_ns, dup_ns) so the two can never drift apart."""
    gram_ctes, gram_selects = [], []
    for n in sorted(set(top_ns) | set(dup_ns)):
        gram_ctes.append(f"""
    g{n} AS (
      SELECT {id_col}, g, length(replace(g, ' ', '')) AS chars
      FROM (SELECT {id_col},
              unnest(list_transform(range(1, len(arr) - {n} + 2),
                i -> array_to_string(arr[i : i + {n - 1}], ' '))) AS g
            FROM toks)
    ), c{n} AS (
      SELECT {id_col}, g, chars, COUNT(*) AS n FROM g{n}
      GROUP BY {id_col}, g, chars
    )""")
        if n in top_ns:
            gram_ctes.append(f"""
    t{n} AS (
      SELECT {id_col},
        CAST(FLOOR(1e6 * n * chars / greatest(tok_chars, 1.0)) AS BIGINT)
          AS v
      FROM (SELECT c.*, b.tok_chars,
              row_number() OVER (PARTITION BY c.{id_col}
                                 ORDER BY n DESC, g ASC) AS rk
            FROM c{n} c JOIN base b USING ({id_col}))
      WHERE rk = 1 AND tok_chars > 0
    )""")
            gram_selects.append(
                f"coalesce(t{n}.v, 0) AS top{n}gram_char_frac_e6")
        if n in dup_ns:
            gram_ctes.append(f"""
    d{n} AS (
      SELECT c.{id_col},
        CAST(FLOOR(1e6 * SUM(n * chars) / greatest(b.tok_chars, 1.0))
             AS BIGINT) AS v
      FROM c{n} c JOIN base b USING ({id_col})
      WHERE n >= 2 AND b.tok_chars > 0
      GROUP BY c.{id_col}, b.tok_chars
    )""")
            gram_selects.append(
                f"coalesce(d{n}.v, 0) AS dup{n}gram_char_frac_e6")

    joins = "".join(
        f"\n    LEFT JOIN t{n} USING ({id_col})" for n in sorted(top_ns)
    ) + "".join(
        f"\n    LEFT JOIN d{n} USING ({id_col})" for n in sorted(dup_ns))

    return rf"""
    WITH base AS (
      SELECT {id_col},
        length(regexp_replace(lower({text_col}), '\s+', '', 'g'))
          AS tok_chars
      FROM {table}
    ), toks AS (
      SELECT {id_col},
        list_filter(string_split_regex(lower({text_col}), '\s+'),
                    t -> t <> '') AS arr
      FROM {table}
    ), lines AS (
      SELECT {id_col}, ln FROM (
        SELECT {id_col},
          unnest(list_filter(
            list_transform(string_split({text_col}, chr(10)),
                           x -> trim(x, ' ' || chr(9) || chr(13))),
            x -> x <> '')) AS ln
        FROM {table})
    ), lstats AS (
      SELECT {id_col}, COUNT(*) AS n_lines,
        COUNT(DISTINCT ln) AS n_distinct,
        SUM(length(ln)) AS line_chars
      FROM lines
      GROUP BY {id_col}
    ), ldist AS (
      SELECT {id_col}, SUM(length(ln)) AS distinct_chars
      FROM (SELECT DISTINCT {id_col}, ln FROM lines)
      GROUP BY {id_col}
    ),{",".join(gram_ctes)}
    SELECT b.{id_col},
      coalesce(ls.n_lines, 0) AS n_lines,
      CASE WHEN coalesce(ls.n_lines, 0) = 0 THEN 0
        ELSE CAST(FLOOR(1e6 * (ls.n_lines - ls.n_distinct)
                        / ls.n_lines) AS BIGINT) END AS dup_line_frac_e6,
      CASE WHEN coalesce(ls.line_chars, 0) = 0 THEN 0
        ELSE CAST(FLOOR(1e6 * (ls.line_chars - ld.distinct_chars)
                        / greatest(ls.line_chars, 1.0)) AS BIGINT)
        END AS dup_line_char_frac_e6,
      {", ".join(gram_selects)}
    FROM base b
    LEFT JOIN lstats ls USING ({id_col})
    LEFT JOIN ldist ld USING ({id_col}){joins}
    """


# --- token-window document chunking ----------------------------------
#
# The context-window preparation stage of an LLM training pipeline:
# split each document into fixed-size token windows with optional
# overlap. Pinned semantics (mirrored exactly by chunk_documents_sql):
# tokens are the RAW (case-kept) whitespace tokens, empties dropped;
# stride = chunk_tokens - overlap; chunk i (1-based) covers tokens
# [(i-1)*stride + 1 .. min((i-1)*stride + chunk_tokens, n)]; the chunk
# count is 1 when n <= chunk_tokens, else ceil((n - chunk_tokens) /
# stride) + 1 (the first chunk that reaches the last token is the last
# chunk — no fully-contained trailing chunk); token-free docs emit no
# chunks. Chunk text joins its tokens with a single space.
#
# Scale shape: one shuffle-free map_batches pass; each doc's chunks are
# built inside its batch (string assembly is the work — per-chunk
# Python join over C-built token arrays, the same trade as
# TopKeywords). Row expansion is bounded by ~n/stride per doc, so
# batch_size should shrink as chunk overlap grows.


def chunk_documents(ds, text_col: str, id_col: str,
                    chunk_tokens: int = 512, overlap: int = 0,
                    batch_size: int = 1024):
    """(id, chunk_idx, chunk_text, n_tokens) rows — see module note
    for the pinned window semantics."""
    import numpy as np

    if not (0 <= overlap < chunk_tokens):
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < chunk_tokens, got "
            f"overlap={overlap}, chunk_tokens={chunk_tokens}")
    stride = chunk_tokens - overlap

    def f(batch: pa.Table) -> pa.Table:
        toks, _, parent, _ = _explode_tokens(batch, text_col,
                                             lower=False)
        ids_all = batch.column(id_col)
        id_type = batch.schema.field(id_col).type
        out_schema = pa.schema([
            (id_col, id_type), ("chunk_idx", pa.int32()),
            ("chunk_text", pa.string()), ("n_tokens", pa.int64())])
        if not len(toks):
            return out_schema.empty_table()
        rows, starts = np.unique(parent, return_index=True)
        counts = np.diff(np.append(starts, len(toks)))
        out_rows, out_idx, out_text, out_n = [], [], [], []
        for r, st, n in zip(rows, starts, counts):
            n = int(n)
            arr = toks[st:st + n]
            n_chunks = (1 if n <= chunk_tokens
                        else -(-(n - chunk_tokens) // stride) + 1)
            for i in range(1, n_chunks + 1):
                s0 = (i - 1) * stride
                e0 = min(s0 + chunk_tokens, n)
                out_rows.append(int(r))
                out_idx.append(i)
                out_text.append(" ".join(arr[s0:e0]))
                out_n.append(e0 - s0)
        return pa.table({
            id_col: ids_all.take(pa.array(out_rows, pa.int64())),
            "chunk_idx": pa.array(out_idx, pa.int32()),
            "chunk_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        }, schema=out_schema)

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=batch_size)


def chunk_documents_sql(table: str, text_col: str, id_col: str,
                        chunk_tokens: int = 512,
                        overlap: int = 0) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    c = int(chunk_tokens)
    s = c - int(overlap)
    return rf"""
    WITH toks AS (
      SELECT {id_col},
        list_filter(string_split_regex({text_col}, '\s+'),
                    t -> t <> '') AS arr
      FROM {table}
    ), meta AS (
      SELECT {id_col}, arr, len(arr) AS n,
        CASE WHEN len(arr) <= {c} THEN 1
             ELSE CAST(CEIL((len(arr) - {c}) / CAST({s} AS DOUBLE))
                       AS BIGINT) + 1 END AS n_chunks
      FROM toks WHERE len(arr) > 0
    ), chunks AS (
      SELECT {id_col}, arr, n,
        unnest(range(1, n_chunks + 1)) AS chunk_idx
      FROM meta
    )
    SELECT {id_col}, CAST(chunk_idx AS INTEGER) AS chunk_idx,
      array_to_string(
        arr[(chunk_idx - 1) * {s} + 1 :
            least((chunk_idx - 1) * {s} + {c}, n)], ' ') AS chunk_text,
      CAST(least((chunk_idx - 1) * {s} + {c}, n)
           - (chunk_idx - 1) * {s} AS BIGINT) AS n_tokens
    FROM chunks
    """


# --- corpus-level repeated n-gram flagging (ExactSubstr-lite) --------
#
# The middle ground between paragraph dedup (exact lines) and
# MinHash (whole-doc near-dup): per doc, what fraction of its DISTINCT
# word n-grams also occurs in at least one OTHER document. High
# fractions mark boilerplate/templated docs that survive whole-doc
# dedup (the signal Lee et al.'s exact-substring dedup thresholds on).
#
# Exactness: gram identity is the full md5 hex of the gram string (the
# repo's sha-style convention — collision odds negligible); the SQL
# twin compares gram strings directly. Pinned formula:
#   distinct_ngrams = COUNT(DISTINCT gram) within the doc
#   repeated_ngrams = COUNT(DISTINCT gram occurring in >= 2 docs)
#   rep_frac_e6     = floor(1e6 * repeated / distinct)
# Docs with no tokens emit no row (mirrored by the twin's WHERE).
#
# Scale shape: ONE hash shuffle of (doc_id, md5(gram)) rows — grams
# are doc-distinct BEFORE the shuffle (a doc is one row, so per-batch
# distinct == global distinct) and every copy of a gram lands in one
# bucket, where a vectorized value_counts marks the >=2-doc grams and
# per-doc partials come back; a native Sum groupby folds the partials.
# Gram text never shuffles — 32-byte hashes do.


def corpus_ngram_repetition(ds, text_col: str, id_col: str, n: int = 8,
                            num_group_buckets: int = 512):
    """(id, distinct_ngrams, repeated_ngrams, rep_frac_e6) — see
    module note; SQL twin :func:`corpus_ngram_repetition_sql`.

    CONTRACT (code-review r4): ``id_col`` values must be NON-NULL and
    UNIQUE across the corpus — the same id-keyed-operator convention
    as bernoulli_sample/hash_split (nulls) and paragraph_dedup
    (uniqueness). A second row with the same id would count as
    "another document" and flip the >= 2-docs semantics to >= 2-rows.
    Nulls and within-batch duplicates raise loudly; cross-batch
    duplicates are the caller's contract."""
    import hashlib

    import numpy as np
    import pandas as pd

    nb = np.uint64(num_group_buckets)

    def gram_rows(batch: pa.Table) -> pa.Table:
        idcol = batch.column(id_col)
        if idcol.null_count:
            raise ValueError(
                f"corpus_ngram_repetition: {id_col!r} contains nulls")
        if batch.num_rows and (
                idcol.to_pandas().duplicated().any()):
            raise ValueError(
                f"corpus_ngram_repetition: duplicate {id_col!r} "
                f"values — ids must be corpus-unique")
        toks, lens, parent, _ = _explode_tokens(batch, text_col)
        d_idx, grams, _ = _ngram_concat(toks, lens, parent, n)
        id_type = batch.schema.field(id_col).type
        # the full 128-bit md5 rides as TWO uint64 columns — half the
        # shuffle bytes of the 32-char hex string and a numeric (not
        # object) groupby key in the buckets; identity is unchanged
        schema = pa.schema([(id_col, id_type), ("_gh", pa.uint64()),
                            ("_gl", pa.uint64()), ("_gb", pa.int32())])
        if not len(d_idx):
            return schema.empty_table()
        df = pd.DataFrame({"d": d_idx, "g": grams}).drop_duplicates()
        uniq, inv = np.unique(df["g"].to_numpy(), return_inverse=True)
        uhi = np.empty(len(uniq), np.uint64)
        ulo = np.empty(len(uniq), np.uint64)
        for i, g in enumerate(uniq):
            dg = hashlib.md5(g.encode("utf-8")).digest()
            uhi[i] = int.from_bytes(dg[:8], "big")
            ulo[i] = int.from_bytes(dg[8:], "big")
        gb = ((uhi % nb).astype(np.int32))[inv]
        ids = batch.column(id_col).take(
            pa.array(df["d"].to_numpy(np.int64)))
        return pa.table({id_col: ids,
                         "_gh": pa.array(uhi[inv]),
                         "_gl": pa.array(ulo[inv]),
                         "_gb": pa.array(gb)}, schema=schema)

    rows = ds.map_batches(gram_rows, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        id_type = (g.schema.field(id_col).type
                   if id_col in g.column_names else pa.string())
        schema = pa.schema([(id_col, id_type), ("tot", pa.int64()),
                            ("rep", pa.int64())])
        if "_gh" not in g.column_names or g.num_rows == 0:
            return schema.empty_table()
        df = g.select([id_col, "_gh", "_gl"]).to_pandas()
        repeated = (df.groupby(["_gh", "_gl"], sort=False)["_gh"]
                    .transform("size").to_numpy() >= 2)
        agg = (df.assign(rep=repeated.astype(np.int64))
               .groupby(id_col, sort=False)
               .agg(tot=("_gh", "size"), rep=("rep", "sum"))
               .reset_index())
        return pa.table({
            id_col: pa.array(agg[id_col].tolist(), id_type),
            "tot": pa.array(agg["tot"].to_numpy(np.int64)),
            "rep": pa.array(agg["rep"].to_numpy(np.int64)),
        }, schema=schema)

    partials = (rows.groupby("_gb")
                .map_groups(per_bucket, batch_format="pyarrow"))

    # fold partials by id with the repo's hash-bucket co-shuffle
    # (ranking._with_group_bucket — code-review r5 deduplicated a
    # hand-rolled copy), NOT Dataset.groupby(id).aggregate — the
    # native string-key aggregate measured 110 s on 11.7M partial rows
    # where this path takes seconds (same pitfall class as the
    # per-tiny-group map_groups)
    from .ranking import _with_group_bucket

    def fold(g: pa.Table) -> pa.Table:
        id_type = (g.schema.field(id_col).type
                   if id_col in g.column_names else pa.string())
        schema = pa.schema([
            (id_col, id_type), ("distinct_ngrams", pa.int64()),
            ("repeated_ngrams", pa.int64()),
            ("rep_frac_e6", pa.int64())])
        if "tot" not in g.column_names or g.num_rows == 0:
            return schema.empty_table()
        df = (g.select([id_col, "tot", "rep"]).to_pandas()
              .groupby(id_col, sort=False).sum().reset_index())
        tot = df["tot"].to_numpy(np.float64)
        rep = df["rep"].to_numpy(np.float64)
        frac = np.floor(1e6 * rep / np.maximum(tot, 1.0)).astype(
            np.int64)
        return pa.table({
            id_col: pa.array(df[id_col].tolist(), id_type),
            "distinct_ngrams": pa.array(df["tot"].to_numpy(np.int64)),
            "repeated_ngrams": pa.array(df["rep"].to_numpy(np.int64)),
            "rep_frac_e6": pa.array(frac),
        }, schema=schema)

    return (_with_group_bucket(partials, id_col, int(nb))
            .groupby("_rb")
            .map_groups(fold, batch_format="pyarrow"))


def corpus_ngram_repetition_sql(table: str, text_col: str,
                                id_col: str, n: int = 8) -> str:
    """DuckDB twin of :func:`corpus_ngram_repetition` (string-equality
    gram identity)."""
    return rf"""
    WITH toks AS (
      SELECT {id_col},
        list_filter(string_split_regex(lower({text_col}), '\s+'),
                    t -> t <> '') AS arr
      FROM {table}
    ), grams AS (
      SELECT DISTINCT {id_col}, g FROM (
        SELECT {id_col},
          unnest(list_transform(range(1, len(arr) - {n} + 2),
            i -> array_to_string(arr[i : i + {n - 1}], ' '))) AS g
        FROM toks)
    ), rep AS (
      SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2
    )
    SELECT g.{id_col},
      CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
      CAST(COUNT(r.g) AS BIGINT) AS repeated_ngrams,
      CAST(FLOOR(1e6 * COUNT(r.g)
                 / greatest(COUNT(*), 1.0)) AS BIGINT) AS rep_frac_e6
    FROM grams g LEFT JOIN rep r USING (g)
    GROUP BY g.{id_col}
    """
