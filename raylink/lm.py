"""Bigram language-model perplexity scoring — the CCNet-style
"LM quality" signal for training-data curation (Wenzek et al. 2019
filter Common Crawl by LM perplexity; here the LM is a from-scratch
add-one-smoothed bigram model fit on the corpus itself, so the whole
operator has an exact DuckDB twin).

Shape at scale:
- FIT is two count-shuffles (unigrams, bigrams) with per-batch Arrow
  pre-aggregation (reuses raylink.eda), a distributed ``count >=
  min_count`` prune BEFORE the collect, and a bounded driver collect
  (loud ``max_model_entries`` guard, same contract style as
  learned.MAX_TRAIN_ROWS). At 100 TB you raise ``min_count`` — the SQL
  twin keeps parity by construction because the prune is mirrored as a
  HAVING clause.
- SCORE is an actor-pool ``map_batches`` stage: the model's log-prob
  tables are precomputed ONCE at broadcast time (``ray.put``) and each
  actor reads them zero-copy from the object store in ``__init__``;
  per batch the work is one C-level ``pd.Series.map`` + int64
  scatter-add. Vectors of e6-integerized log-probs sum as exact
  integers, so the per-doc result is independent of batch boundaries,
  block order, and summation order — the property that makes the
  DuckDB hash-oracle possible.

Exactness contract (why ``math.log`` and not ``np.log``): measured on
this box, Python ``math.log`` is bit-identical to DuckDB ``ln`` on
20k random rationals (both call libm), while ``np.log``'s SIMD path
differs in the last ulp on ~20% of values. Log-probs are therefore
computed with ``math.log`` over the model's UNIQUE entries (bounded,
once at broadcast time), never per row.

Smoothing: add-one over the corpus vocabulary ``V``;
``p(w2|w1) = (c12_kept + 1) / (c1 + V)`` with ``c12_kept`` the bigram
count if it survived the ``min_count`` prune else 0, and ``c1`` the
unigram count of ``w1`` (0 for out-of-vocabulary ``w1``). A pruned
model is not a normalized distribution — fine for a quality SCORE,
documented here for the record.

Tokenization matches the repo convention (lowercase + whitespace split
+ drop empties), whose SQL pairing
``list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')``
is already hash-green in the ngram_frequencies gate row.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

# model-size bound for the driver collect (unigrams + kept bigrams).
# ~2M entries ~ a few hundred MB of Python dict — loud failure beyond,
# with the documented remedy (raise min_count) in the message.
MAX_MODEL_ENTRIES = 2_000_000


@dataclass
class BigramLM:
    """Fitted model: raw counts + vocabulary size (picklable), plus
    the precomputed e6-integerized log-prob tables used for scoring.

    lp(gram)        = floor(1e6 * ln((c12 + 1) / (c1 + V)))   kept bigram
    lp_oov_w1(w1)   = floor(1e6 * ln( 1        / (c1 + V)))   known w1
    lp_default      = floor(1e6 * ln( 1        /       V ))   unknown w1
    """

    vocab_size: int
    min_count: int
    uni: dict[str, int]
    bi: dict[str, int]  # "w1 w2" -> count (only counts >= min_count)
    lp_bi: dict[str, int] = field(default_factory=dict, repr=False)
    lp_oov: dict[str, int] = field(default_factory=dict, repr=False)
    lp_default: int = 0

    def build_lp_tables(self) -> "BigramLM":
        v = self.vocab_size
        self.lp_oov = {
            w: math.floor(1e6 * math.log(1 / (c + v)))
            for w, c in self.uni.items()
        }
        lp_bi = {}
        for gram, c12 in self.bi.items():
            w1 = gram.split(" ", 1)[0]
            c1 = self.uni.get(w1, 0)
            lp_bi[gram] = math.floor(1e6 * math.log((c12 + 1) / (c1 + v)))
        self.lp_bi = lp_bi
        self.lp_default = math.floor(1e6 * math.log(1 / v)) if v else 0
        return self


def fit_bigram_lm(ds, text_col: str, min_count: int = 2) -> BigramLM:
    """Distributed fit in ONE pre-aggregated count shuffle: per batch,
    unigram (kind 1) and bigram (kind 2) partial counts are emitted
    tagged into the same (kind, gram, n) table, so a single two-key
    groupby-Sum resolves both (measured: the original two serial
    count pipelines spent most of doc_perplexity's wall on duplicated
    executor/shuffle fixed costs at micro scale). The min_count prune
    (kind 2 only) runs distributed BEFORE the bounded driver
    collect."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        kinds: list[int] = []
        grams: list[str] = []
        for t in texts:
            toks = (t or "").lower().split()
            kinds.extend([1] * len(toks))
            grams.extend(toks)
            kinds.extend([2] * max(len(toks) - 1, 0))
            grams.extend(toks[j] + " " + toks[j + 1]
                         for j in range(len(toks) - 1))
        if not grams:
            return pa.table({"kind": pa.array([], pa.int8()),
                             "gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"kind": pa.array(kinds, pa.int8()),
                      "gram": pa.array(grams, pa.string())})
        agg = t.group_by(["kind", "gram"]).aggregate(
            [([], "count_all")])
        # rename BY NAME, not position: older pyarrow ordered
        # aggregate columns before keys, and a positional rename would
        # silently make 'kind' the count (code-review r5)
        return pa.table({"kind": agg.column("kind"),
                         "gram": agg.column("gram"),
                         "n": agg.column("count_all")})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["kind", "gram"])
              .aggregate(Sum("n", alias_name="count")))

    def prune(t: pa.Table) -> pa.Table:
        if min_count <= 1:
            return t
        keep = pc.or_(pc.equal(t["kind"], pa.scalar(1, pa.int8())),
                      pc.greater_equal(t["count"],
                                       pa.scalar(min_count)))
        return t.filter(keep)

    m = counts.map_batches(prune, batch_format="pyarrow").materialize()
    n = m.count()
    if n > MAX_MODEL_ENTRIES:
        raise ValueError(
            f"bigram-LM fit: count table has {n} entries > "
            f"MAX_MODEL_ENTRIES={MAX_MODEL_ENTRIES}; raise min_count "
            f"(the SQL twin mirrors it as a HAVING clause) or shard "
            f"the model")
    df = m.to_pandas()
    is_uni = (df["kind"] == 1).to_numpy()
    uni = dict(zip(df["gram"][is_uni].tolist(),
                   (int(c) for c in df["count"][is_uni].tolist())))
    bi = dict(zip(df["gram"][~is_uni].tolist(),
                  (int(c) for c in df["count"][~is_uni].tolist())))
    return BigramLM(vocab_size=len(uni), min_count=min_count,
                    uni=uni, bi=bi).build_lp_tables()


def broadcast_lm(model: BigramLM):
    """ray.put the fitted model ONCE; every scoring actor reads it
    from the object store instead of re-shipping it per batch."""
    if not model.lp_oov and model.uni:
        model.build_lp_tables()
    return ray.put(model)


class PerplexityScore:
    """Actor-pool stage: per-doc bigram NLL (exact e6 integer) and
    perplexity. Model tables load once per actor in ``__init__``."""

    def __init__(self, model_ref, text_col: str, id_cols: list[str],
                 with_ppl: bool = True):
        model = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        self.lp_bi = model.lp_bi
        self.lp_oov = model.lp_oov
        self.lp_default = model.lp_default
        self.text_col = text_col
        self.id_cols = list(id_cols)
        self.with_ppl = with_ppl

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        grams: list[str] = []
        w1s: list[str] = []
        doc_idx: list[int] = []
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            for j in range(len(toks) - 1):
                grams.append(toks[j] + " " + toks[j + 1])
                w1s.append(toks[j])
                doc_idx.append(i)
        n_docs = len(texts)
        nll = np.zeros(n_docs, np.int64)
        nb = np.zeros(n_docs, np.int64)
        if grams:
            # C-level hash lookups; log-prob magnitudes (~1e7) are
            # exact in the NaN-capable float64 staging array
            lp = pd.Series(grams, dtype=object).map(self.lp_bi)
            lp_np = lp.to_numpy(dtype=np.float64, na_value=np.nan)
            missidx = np.flatnonzero(np.isnan(lp_np))
            if len(missidx):
                fb = pd.Series([w1s[k] for k in missidx],
                               dtype=object).map(self.lp_oov)
                lp_np[missidx] = fb.fillna(self.lp_default).to_numpy(
                    dtype=np.float64)
            lp_arr = lp_np.astype(np.int64)
            idx = np.asarray(doc_idx, np.int64)
            np.subtract.at(nll, idx, lp_arr)        # nll = -sum(lp)
            nb += np.bincount(idx, minlength=n_docs).astype(np.int64)
        cols = {c: batch.column(c) for c in self.id_cols}
        cols["n_bigrams"] = pa.array(nb, pa.int64())
        cols["nll_e6"] = pa.array(nll, pa.int64())
        if self.with_ppl:
            with np.errstate(over="ignore"):
                ppl = np.where(
                    nb > 0,
                    np.exp(nll / 1e6 / np.maximum(nb, 1)), np.nan)
            cols["ppl"] = pa.array(ppl, pa.float64())
        return pa.table(cols)


def score_perplexity(ds, model_ref, text_col: str,
                     id_cols: list[str], with_ppl: bool = True,
                     concurrency: int = 4, batch_size: int = 4096):
    """Per-doc bigram perplexity over a Dataset. ``nll_e6``/
    ``n_bigrams`` are exact integers (hash-oracle-safe); ``ppl`` is
    the human-facing float exp(nll_e6 / 1e6 / n_bigrams)."""
    return ds.map_batches(
        PerplexityScore,
        fn_constructor_args=(model_ref, text_col, id_cols, with_ppl),
        batch_format="pyarrow",
        batch_size=batch_size,
        # autoscaling (1, N): a FIXED pool of N 1-CPU actors reserves
        # the whole session when N == session CPUs and starves the
        # upstream read — a race-dependent deadlock that hung the
        # 4-CPU bench --scaling leg (pool 4.0 CPU reserved, ReadParquet
        # backpressured forever)
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def doc_perplexity(ds, text_col: str, id_cols: list[str],
                   min_count: int = 2, with_ppl: bool = True,
                   concurrency: int = 4):
    """Self-perplexity convenience: fit on ``ds``, score ``ds``."""
    model = fit_bigram_lm(ds, text_col, min_count=min_count)
    ref = broadcast_lm(model)
    return score_perplexity(ds, ref, text_col, id_cols,
                            with_ppl=with_ppl, concurrency=concurrency)
