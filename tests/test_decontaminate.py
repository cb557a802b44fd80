"""Benchmark decontamination: exact DuckDB n-gram semi-join parity,
repeated-hit counting, the loud benchmark-size bound, and partition
invariance."""

import duckdb
import pandas as pd
import pytest

import ray.data as rd

from raylink.textstats import (benchmark_ngrams, contamination_sql,
                               flag_contaminated)

DOCS = pd.DataFrame({"doc_id": range(6), "text": [
    "the quick brown fox jumps over the lazy dog today",
    "quick brown fox jumps over something else entirely here now",
    "completely unrelated content with no overlap at all whatsoever",
    "",
    # same benchmark trigram twice -> contam_hits 2, contam_distinct 1
    "alpha beta gamma filler words alpha beta gamma trailing bits",
    "short doc",
]})
BENCH = pd.DataFrame({"q": [
    "The QUICK brown fox Jumps over",   # case-folds into doc 0
    "alpha beta gamma",
    "no match here",
]})
COLS = ["doc_id", "n_ngrams", "contam_hits", "contam_distinct",
        "contaminated"]


def _run(n, **kw):
    got = (flag_contaminated(rd.from_pandas(DOCS), "text",
                             rd.from_pandas(BENCH), "q", n=n, **kw)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return got[COLS]


def _oracle(n):
    con = duckdb.connect()
    con.register("docs", DOCS)
    con.register("bench", BENCH)
    sql = contamination_sql("docs", "bench", "text", "q", n=n)
    return con.execute(
        f"SELECT {','.join(COLS)} FROM ({sql}) ORDER BY doc_id"
    ).fetchdf()


@pytest.mark.parametrize("n", [3, 6])
def test_contamination_matches_duckdb(n):
    got, want = _run(n), _oracle(n)
    for c in COLS:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), (n, c)


def test_contamination_counts_repeats():
    got = _run(3).set_index("doc_id")
    assert int(got.loc[4, "contam_hits"]) == 2
    assert int(got.loc[4, "contam_distinct"]) == 1
    assert bool(got.loc[4, "contaminated"])
    assert not bool(got.loc[5, "contaminated"])


def test_contamination_partition_invariance():
    one = _run(3)
    many = (flag_contaminated(
        rd.from_pandas(DOCS).repartition(4), "text",
        rd.from_pandas(BENCH), "q", n=3, batch_size=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))[COLS]
    pd.testing.assert_frame_equal(one, many)


def test_benchmark_ngrams_bound_is_loud():
    with pytest.raises(ValueError, match="distinct"):
        benchmark_ngrams(rd.from_pandas(BENCH), "q", n=2, max_entries=1)
