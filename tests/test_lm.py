"""Bigram-LM perplexity: pure-Python reference parity, DuckDB oracle
parity (the gate's exactness contract), batch/partition invariance,
and edge cases (empty / one-token docs, OOV at score time)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raylink.lm import (
    BigramLM,
    broadcast_lm,
    doc_perplexity,
    fit_bigram_lm,
    score_perplexity,
)

DOCS = [
    "the cat sat on the mat",
    "the cat ate the fish",
    "a dog sat on a log",
    "the dog ate the cat",
    "",                     # empty -> 0 bigrams
    "single",               # one token -> 0 bigrams
    "THE CAT SAT",          # case folding
    "the   cat\tsat",       # whitespace runs
]


def _reference_scores(docs, min_count):
    """Slow dict-and-loop reference implementation."""
    toks = [d.lower().split() for d in docs]
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    for ts in toks:
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
    bi = {g: c for g, c in bi.items() if c >= min_count}
    v = len(uni)
    out = []
    for ts in toks:
        nll, n = 0, 0
        for a, b in zip(ts, ts[1:]):
            c12 = bi.get(f"{a} {b}", 0)
            c1 = uni.get(a, 0)
            nll -= math.floor(1e6 * math.log((c12 + 1) / (c1 + v)))
            n += 1
        out.append((n, nll))
    return out


@pytest.mark.parametrize("min_count", [1, 2])
def test_matches_pure_python_reference(min_count):
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)])
    res = (
        doc_perplexity(ds, "text", ["doc_id"], min_count=min_count,
                       concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ref = _reference_scores(DOCS, min_count)
    assert list(res["n_bigrams"]) == [n for n, _ in ref]
    assert list(res["nll_e6"]) == [nll for _, nll in ref]
    # ppl agrees with the integerized nll definition
    for _, row in res.iterrows():
        if row["n_bigrams"] > 0:
            assert row["ppl"] == pytest.approx(
                math.exp(row["nll_e6"] / 1e6 / row["n_bigrams"]))
        else:
            assert np.isnan(row["ppl"])


def test_matches_duckdb_oracle():
    """The exactness contract: bit-identical integers vs the SQL twin
    (same tokenization, HAVING prune, add-one smoothing, e6-floored
    libm ln, exact integer sums)."""
    min_count = 2
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)])
    res = (
        doc_perplexity(ds, "text", ["doc_id"], min_count=min_count,
                       with_ppl=False, concurrency=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(DOCS)), "text": DOCS}))
    sql = rf"""
    WITH arrs AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'),
                    t -> t <> '') AS arr
      FROM documents
    ), uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(arr) AS w FROM arrs) GROUP BY w
    ), v AS (SELECT COUNT(*) AS v FROM uni),
    grams AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(arr)),
                              i -> arr[i] || ' ' || arr[i+1])) AS gram,
        unnest(list_transform(range(1, len(arr)), i -> arr[i])) AS w1
      FROM arrs WHERE len(arr) >= 2
    ), bi AS (
      SELECT gram, COUNT(*) AS c12 FROM grams GROUP BY gram
      HAVING COUNT(*) >= {min_count}
    ), scored AS (
      SELECT g.doc_id,
        CAST(FLOOR(1e6 * ln(
          (COALESCE(b.c12, 0) + 1) / (COALESCE(u.c, 0) + v.v)
        )) AS BIGINT) AS lp
      FROM grams g
      LEFT JOIN bi b ON g.gram = b.gram
      LEFT JOIN uni u ON g.w1 = u.w
      CROSS JOIN v
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             -SUM(lp) AS nll_e6
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(a.nll_e6, 0) AS BIGINT) AS nll_e6
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY d.doc_id
    """
    oracle = con.execute(sql).fetchdf()
    assert list(res["n_bigrams"]) == list(oracle["n_bigrams"])
    assert list(res["nll_e6"]) == list(oracle["nll_e6"])


def test_partition_and_batch_invariance():
    """Exact integer sums make the result independent of block layout
    and batch size."""
    rows = [{"doc_id": i, "text": DOCS[i % len(DOCS)] + f" extra{i % 7}"}
            for i in range(100)]
    model = fit_bigram_lm(
        rd.from_items(rows), "text", min_count=2)
    ref = broadcast_lm(model)

    def run(nparts, bs):
        ds = rd.from_items(rows).repartition(nparts)
        return (
            score_perplexity(ds, ref, "text", ["doc_id"],
                             with_ppl=False, batch_size=bs,
                             concurrency=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )

    a = run(1, 4096)
    b = run(7, 13)
    assert list(a["nll_e6"]) == list(b["nll_e6"])
    assert list(a["n_bigrams"]) == list(b["n_bigrams"])


def test_oov_scoring_uses_fallbacks():
    """Score a corpus the model never saw: known-w1 fallback and
    unknown-w1 default both exercised, matching hand computation."""
    model = BigramLM(vocab_size=0, min_count=1, uni={}, bi={})
    model.uni = {"the": 3, "cat": 2}
    model.bi = {"the cat": 2}
    model.vocab_size = 2
    model.build_lp_tables()
    ref = broadcast_lm(model)
    ds = rd.from_items([{"doc_id": 0, "text": "the cat"},
                        {"doc_id": 1, "text": "the dog"},
                        {"doc_id": 2, "text": "zz yy"}])
    res = (score_perplexity(ds, ref, "text", ["doc_id"],
                            with_ppl=False, concurrency=2)
           .to_pandas().sort_values("doc_id"))
    v = 2
    exp = [
        -math.floor(1e6 * math.log((2 + 1) / (3 + v))),   # kept bigram
        -math.floor(1e6 * math.log(1 / (3 + v))),         # known w1
        -math.floor(1e6 * math.log(1 / v)),               # unknown w1
    ]
    assert list(res["nll_e6"]) == exp


def test_min_count_prunes_model():
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)])
    m1 = fit_bigram_lm(ds, "text", min_count=1)
    m2 = fit_bigram_lm(ds, "text", min_count=2)
    assert set(m2.bi) < set(m1.bi)
    assert all(c >= 2 for c in m2.bi.values())
    assert m1.vocab_size == m2.vocab_size
