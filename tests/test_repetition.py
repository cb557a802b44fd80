"""Gopher-style repetition signals: bit-exact DuckDB parity (the
generated SQL twin), partition invariance, and edge cases (empty docs,
single-token docs, self-overlapping grams, case-sensitive lines)."""

import duckdb
import pandas as pd

import ray.data as rd

from raylink.textstats import add_repetition_signals, repetition_signals_sql

DOCS = [
    "the cat sat on the mat the cat sat again",
    "hello world\nhello world\nsomething else\nhello world",
    "a a a a a a a a",          # self-overlapping grams: frac > 1e6
    "",                          # no tokens, no lines
    "one two three four five six seven one two three four five six",
    "x y\n\n  x y  \n\tz\t",    # trim ' \t\r', drop empty lines
    "Mixed CASE line\nmixed case line",  # lines compare RAW case
    "solo",                      # fewer tokens than any n
]

COLS = ["doc_id", "n_lines", "dup_line_frac_e6", "dup_line_char_frac_e6",
        "top2gram_char_frac_e6", "top3gram_char_frac_e6",
        "dup5gram_char_frac_e6"]


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", df)
    sql = repetition_signals_sql("docs", "text")
    return con.execute(
        f"SELECT {', '.join(COLS)} FROM ({sql}) ORDER BY doc_id"
    ).fetchdf()


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    ds = rd.from_pandas(df)
    got = (add_repetition_signals(ds, "text", **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return got[COLS]


def test_repetition_signals_match_duckdb():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    got = _run(df)
    want = _oracle(df)
    for c in COLS:
        assert (got[c].to_numpy().astype("int64")
                == want[c].to_numpy().astype("int64")).all(), c


def test_repetition_signals_partition_invariance():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    one = _run(df, batch_size=1024)
    tiny = (add_repetition_signals(
        rd.from_pandas(df).repartition(5), "text", batch_size=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))[COLS]
    pd.testing.assert_frame_equal(one, tiny)


def test_repetition_overlap_exceeds_one():
    # 'a a a a a a a a': top 2-gram 'a a' occurs 7x, chars 2, tok_chars
    # 8 -> 7*2/8 = 1.75 — documented (Gopher) unclamped behavior
    df = pd.DataFrame({"doc_id": [0], "text": ["a a a a a a a a"]})
    got = _run(df)
    assert int(got["top2gram_char_frac_e6"].iloc[0]) == 1_750_000
    assert int(got["dup5gram_char_frac_e6"].iloc[0]) == 2_500_000


def test_repetition_custom_ns():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    ds = rd.from_pandas(df)
    got = (add_repetition_signals(ds, "text", top_ns=(4,), dup_ns=(2, 6))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    cols = ["doc_id", "top4gram_char_frac_e6", "dup2gram_char_frac_e6",
            "dup6gram_char_frac_e6"]
    con = duckdb.connect()
    con.register("docs", df)
    sql = repetition_signals_sql("docs", "text", top_ns=(4,),
                                 dup_ns=(2, 6))
    want = con.execute(
        f"SELECT {', '.join(cols)} FROM ({sql}) ORDER BY doc_id"
    ).fetchdf()
    for c in cols:
        assert (got[c].to_numpy().astype("int64")
                == want[c].to_numpy().astype("int64")).all(), c


def test_corpus_ngram_repetition_matches_duckdb():
    from raylink.textstats import (corpus_ngram_repetition,
                                   corpus_ngram_repetition_sql)

    docs = [
        "the quick brown fox jumps over the lazy dog",
        "a quick brown fox jumps over a fence today",
        "totally different content here with nothing shared at all",
        "the quick brown fox jumps over the lazy dog",   # exact dup
        "",
        "short one",
    ]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    got = (corpus_ngram_repetition(
        rd.from_pandas(df).repartition(3), "text", "doc_id", n=3,
        num_group_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", df)
    want = con.execute(
        "SELECT * FROM ("
        + corpus_ngram_repetition_sql("docs", "text", "doc_id", n=3)
        + ") ORDER BY doc_id").fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    for c in ("distinct_ngrams", "repeated_ngrams", "rep_frac_e6"):
        assert (got[c].to_numpy().astype("int64")
                == want[c].to_numpy().astype("int64")).all(), c
    # the two identical docs are 100% repeated; the unique doc 0%
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "rep_frac_e6"] == 1_000_000
    assert by_id.loc[3, "rep_frac_e6"] == 1_000_000
    assert by_id.loc[2, "rep_frac_e6"] == 0
    # token-free doc emits no row on either side
    assert 4 not in by_id.index


def test_corpus_ngram_repetition_rejects_null_and_duplicate_ids():
    import pytest as _pytest

    from raylink.textstats import corpus_ngram_repetition

    nulls = pd.DataFrame({"doc_id": [0, None], "text": ["a b c", "a b c"]})
    with _pytest.raises(Exception, match="nulls"):
        (corpus_ngram_repetition(rd.from_pandas(nulls), "text",
                                 "doc_id", n=2).to_pandas())
    dups = pd.DataFrame({"doc_id": [7, 7], "text": ["a b c", "a b c"]})
    with _pytest.raises(Exception, match="duplicate"):
        (corpus_ngram_repetition(rd.from_pandas(dups), "text",
                                 "doc_id", n=2).to_pandas())
