"""Token-window chunking + deterministic Bernoulli sampling: DuckDB
twin parity over overlap configurations, window-coverage invariants,
rate-column and string-id variants, and loud guards."""

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raylink.ranking import bernoulli_sample, bernoulli_sample_sql_where
from raylink.textstats import chunk_documents, chunk_documents_sql

rng = random.Random(3)
DOCS = [" ".join(f"T{j}" for j in range(rng.randint(0, 23)))
        for _ in range(40)]
DF = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})


@pytest.mark.parametrize("c,o", [(8, 0), (8, 3), (5, 4), (1, 0)])
def test_chunk_documents_matches_duckdb(c, o):
    got = (chunk_documents(rd.from_pandas(DF), "text", "doc_id",
                           chunk_tokens=c, overlap=o, batch_size=7)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", DF)
    want = con.execute(
        "SELECT * FROM ("
        + chunk_documents_sql("docs", "text", "doc_id", c, o)
        + ") ORDER BY doc_id, chunk_idx").fetchdf()
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()))


def test_chunk_coverage_and_overlap_invariants():
    c, o = 8, 3
    got = (chunk_documents(rd.from_pandas(DF), "text", "doc_id",
                           chunk_tokens=c, overlap=o)
           .to_pandas())
    stride = c - o
    for doc_id, g in got.groupby("doc_id"):
        n = len(DOCS[doc_id].split())
        g = g.sort_values("chunk_idx")
        # every token covered: last chunk reaches n, stride spacing
        assert g["chunk_idx"].tolist() == list(range(1, len(g) + 1))
        ends = (g["chunk_idx"] - 1) * stride + g["n_tokens"]
        assert ends.iloc[-1] == n
        assert (g["n_tokens"] <= c).all()
        # chunk text round-trips its token slice
        toks = DOCS[doc_id].split()
        for _, row in g.iterrows():
            s0 = (row["chunk_idx"] - 1) * stride
            assert row["chunk_text"] == " ".join(
                toks[s0:s0 + row["n_tokens"]])


def test_chunk_documents_rejects_bad_overlap():
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_pandas(DF), "text", "doc_id",
                        chunk_tokens=4, overlap=4)


def test_bernoulli_sample_matches_duckdb_int_ids():
    got = (bernoulli_sample(rd.from_pandas(DF), "doc_id", 0.4, seed=11)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", DF)
    want = con.execute(
        "SELECT * FROM docs WHERE "
        + bernoulli_sample_sql_where("doc_id", "0.4", seed=11)
        + " ORDER BY doc_id").fetchdf()
    assert (got["doc_id"].to_numpy()
            == want["doc_id"].to_numpy()).all()
    assert 0 < len(got) < len(DF)


def test_bernoulli_sample_string_ids_and_rate_column():
    df2 = DF.assign(url=[f"u{i}" for i in range(len(DF))],
                    w=np.linspace(0, 1, len(DF)))
    got = (bernoulli_sample(rd.from_pandas(df2), "url", "w", seed=5)
           .to_pandas().sort_values("url").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs2", df2)
    want = con.execute(
        "SELECT * FROM docs2 WHERE "
        + bernoulli_sample_sql_where("url", "w", seed=5,
                                     string_id=True)
        + " ORDER BY url").fetchdf()
    assert (got["url"].to_numpy() == want["url"].to_numpy()).all()
    # w=0 rows can never survive; w=1 rows always do
    assert "u0" not in set(got["url"])
    assert f"u{len(DF)-1}" in set(got["url"])


def test_bernoulli_sample_parallelism_invariance():
    one = (bernoulli_sample(rd.from_pandas(DF), "doc_id", 0.5, seed=9)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = (bernoulli_sample(rd.from_pandas(DF).repartition(7),
                             "doc_id", 0.5, seed=9)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)


def test_bernoulli_sample_rejects_float_ids():
    df = DF.assign(fid=DF["doc_id"].astype("float64"))
    with pytest.raises(TypeError, match="integer- or"):
        bernoulli_sample(rd.from_pandas(df), "fid", 0.5)


def test_bernoulli_sample_rejects_null_rates():
    # a NULL rate would silently read as "sampled out" (NaN < u is
    # False), masking an upstream join bug as sampling loss (ADVICE r4)
    df = DF.assign(w=[0.5] * (len(DF) - 1) + [None])
    with pytest.raises(Exception, match="null"):
        bernoulli_sample(rd.from_pandas(df), "doc_id", "w",
                         seed=3).to_pandas()


def test_hash_split_matches_duckdb_and_partitions_everything():
    from raylink.ranking import hash_split, hash_split_sql_case

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = (hash_split(rd.from_pandas(DF), "doc_id", fr, seed=13)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", DF)
    want = con.execute(
        "SELECT doc_id, "
        + hash_split_sql_case("doc_id", fr, seed=13)
        + " AS split FROM docs ORDER BY doc_id").fetchdf()
    assert (got["split"].to_numpy() == want["split"].to_numpy()).all()
    assert set(got["split"]) <= set(fr)
    assert len(got) == len(DF)            # every row assigned
    # string-id variant agrees with its twin too
    df2 = DF.assign(url=[f"u{i}" for i in range(len(DF))])
    gs = (hash_split(rd.from_pandas(df2), "url", fr, seed=13)
          .to_pandas().sort_values("url").reset_index(drop=True))
    con.register("docs2", df2)
    ws = con.execute(
        "SELECT url, "
        + hash_split_sql_case("url", fr, seed=13, string_id=True)
        + " AS split FROM docs2 ORDER BY url").fetchdf()
    assert (gs["split"].to_numpy() == ws["split"].to_numpy()).all()


def test_hash_split_is_stable_under_corpus_growth():
    from raylink.ranking import hash_split

    fr = {"train": 0.75, "test": 0.25}
    small = (hash_split(rd.from_pandas(DF.head(20)), "doc_id", fr)
             .to_pandas().set_index("doc_id")["split"])
    grown = (hash_split(rd.from_pandas(DF), "doc_id", fr)
             .to_pandas().set_index("doc_id")["split"])
    # docs present in both corpora keep their assignment
    assert (grown.loc[small.index] == small).all()


def test_hash_split_rejects_bad_fractions():
    from raylink.ranking import hash_split

    with pytest.raises(ValueError, match="sum"):
        hash_split(rd.from_pandas(DF), "doc_id",
                   {"a": 0.5, "b": 0.4})


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def _pack_df(n=300, seed=8):
    r = random.Random(seed)
    return pd.DataFrame({
        "doc_id": range(n),
        "tok": [r.randint(1, 900) for _ in range(n)]})


def test_pack_sequences_invariants():
    from raylink.ranking import pack_sequences

    df = _pack_df()
    budget = 1024
    got = (pack_sequences(rd.from_pandas(df), "doc_id", "tok", budget,
                          num_partitions=8)
           .to_pandas())
    # every doc assigned exactly once
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])
    merged = got.merge(df, on="doc_id")
    # per-bin sums respect the budget (no oversize docs here)
    sums = merged.groupby(["pack_partition", "bin"])["tok"].sum()
    assert (sums <= budget).all()
    assert not merged["oversize"].any()
    # bin_tokens column reports the final bin load
    lookup = sums.to_dict()
    assert all(lookup[(p, b)] == bt for p, b, bt in zip(
        merged["pack_partition"], merged["bin"],
        merged["bin_tokens"]))
    # FFD quality: per partition, bins <= ceil(11/9 * LB) + 1
    import math
    for p, part in merged.groupby("pack_partition"):
        lb = math.ceil(part["tok"].sum() / budget)
        nbins = part["bin"].nunique()
        assert nbins <= math.ceil(11 / 9 * lb) + 1, (p, nbins, lb)


def test_pack_sequences_oversize_and_determinism():
    from raylink.ranking import pack_sequences

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "tok": [5000, 10, 20, 30]})
    got = (pack_sequences(rd.from_pandas(df), "doc_id", "tok", 100,
                          num_partitions=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["oversize"].tolist() == [True, False, False, False]
    solo = got[got["doc_id"] == 1]
    others = got[got["doc_id"] != 1]
    assert not set(solo["bin"]) & set(others["bin"])  # solo bin
    # parallelism invariance: identical assignment under re-blocking
    again = (pack_sequences(rd.from_pandas(df).repartition(3),
                            "doc_id", "tok", 100, num_partitions=1)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)


def test_first_fit_segment_tree_equals_linear_scan():
    from raylink.ranking import _first_fit

    rng = random.Random(12)
    for budget in (50, 1024):
        toks = np.array(sorted(
            (rng.randint(1, int(budget * 1.4)) for _ in range(800)),
            reverse=True), dtype=np.int64)
        got_bins, got_loads = _first_fit(toks, budget)
        # reference linear first-fit
        loads: list[int] = []
        ref = []
        for t in toks:
            placed = -1
            if t <= budget:
                for bi, ld in enumerate(loads):
                    if ld + t <= budget:
                        placed = bi
                        break
            if placed < 0:
                placed = len(loads)
                loads.append(0)
            loads[placed] += int(t)
            ref.append(placed)
        assert got_bins.tolist() == ref
        assert got_loads == loads


def test_pack_sequences_rejects_null_tokens():
    from raylink.ranking import pack_sequences

    df = pd.DataFrame({"doc_id": [1, 2], "tok": [10.0, np.nan]})
    with pytest.raises(Exception, match="nulls"):
        (pack_sequences(rd.from_pandas(df), "doc_id", "tok", 100,
                        num_partitions=1).to_pandas())
