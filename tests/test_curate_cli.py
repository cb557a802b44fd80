"""End-to-end curation CLI: gates + decontamination + paragraph dedup
+ chunking + hash split, written as hive-partitioned Parquet."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from raylink.curate_cli import main


def test_curate_cli_end_to_end(tmp_path, capsys):
    docs = pd.DataFrame({
        "doc_id": range(30),
        "text": [
            ("dup line\ndup line\ndup line" if i % 10 == 0 else
             "held out eval question" if i % 10 == 1 else
             f"unique body {i} with words\nshared boilerplate")
            for i in range(30)],
    })
    bench = pd.DataFrame({"text": ["held out eval question"]})
    import pyarrow as pa

    docs_p = str(tmp_path / "docs.parquet")
    bench_p = str(tmp_path / "bench.parquet")
    pq.write_table(pa.Table.from_pandas(docs), docs_p)
    pq.write_table(pa.Table.from_pandas(bench), bench_p)
    out = str(tmp_path / "curated")

    rc = main([
        "--docs", docs_p, "--out", out,
        "--max-dup-line-frac", "0.5",
        "--benchmark", bench_p, "--ngram", "3",
        "--dedup-paragraphs",
        "--chunk", "4", "--overlap", "1",
        "--split", "train=0.8,val=0.2",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_in"] == 30
    # the 3 all-dup-line docs and 3 contaminated docs are gone; the
    # rest chunk and split
    total = report["train"] + report["val"]
    assert total > 0
    got = rd.read_parquet(out).to_pandas()
    assert len(got) == total
    # chunk ids are "<doc>#<idx>"; every chunk fits the window
    assert got["doc_id"].str.contains("#").all()
    assert (got["n_tokens"] <= 4).all()
    # the shared boilerplate paragraph survived in exactly one doc's
    # chunks
    boiler_docs = (got[got["chunk_text"].str.contains("boilerplate")]
                   ["doc_id"].str.split("#").str[0].nunique())
    assert boiler_docs == 1
    # split assignment hashes the BASE doc id, so every chunk of a doc
    # lands in the same split — with overlap > 0, per-chunk splitting
    # would leak overlapping token spans across train/val (ADVICE r4)
    got["base_id"] = got["doc_id"].str.split("#").str[0]
    per_doc = got.groupby("base_id")["split"].nunique()
    assert (per_doc == 1).all()
    # and it is the deterministic hash split of the base id
    from raylink.ranking import hash_split

    # the CLI hashed the base id while it was still int64 — match it
    redo = (hash_split(rd.from_pandas(
        got[["base_id"]].drop_duplicates().astype({"base_id": "int64"})
        .assign(x=1)), "base_id",
        {"train": 0.8, "val": 0.2}).to_pandas())
    redo["base_id"] = redo["base_id"].astype(str)
    merged = got.merge(redo[["base_id", "split"]], on="base_id",
                       suffixes=("", "_redo"))
    assert (merged["split"] == merged["split_redo"]).all()


def test_curate_cli_refuses_stale_out(tmp_path):
    """Rerunning into a non-empty --out silently mixed stale files
    into the dataset and double-counted the report (code-review r5,
    reproduced 31 -> 64 rows); now it refuses without --overwrite and
    clears with it."""
    import pyarrow as pa
    import pytest

    docs = pd.DataFrame({
        "doc_id": range(20),
        "text": [f"document body {i} with several words" for i in range(20)],
    })
    docs_p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(docs), docs_p)
    out = str(tmp_path / "out")
    argv = ["--docs", docs_p, "--out", out,
            "--split", "train=0.8,val=0.2"]
    assert main(argv) == 0
    with pytest.raises(SystemExit):
        main(argv)                       # non-empty out -> refuse
    n_first = rd.read_parquet(out).count()
    assert main(argv + ["--overwrite"]) == 0
    n_second = rd.read_parquet(out).count()
    assert n_first == n_second == 20     # no stale mixing


def test_curate_cli_quality_quantile_gate(tmp_path, capsys):
    """--min-quality-quantile drops the low-quality tail at the
    sketch-derived threshold and reports the realized cut point."""
    import pyarrow as pa

    # 10 junk docs (too short + pure punctuation => quality ~0) among
    # 40 normal prose docs
    docs = pd.DataFrame({
        "doc_id": range(50),
        "text": [("!!! ???" if i < 10 else
                  f"this is a normal document {i} with the usual "
                  "words and a readable body of prose")
                 for i in range(50)],
    })
    docs_p = str(tmp_path / "docs.parquet")
    pq.write_table(pa.Table.from_pandas(docs), docs_p)
    out = str(tmp_path / "curated")

    rc = main(["--docs", docs_p, "--out", out,
               "--min-quality-quantile", "0.2"])
    assert rc == 0
    report = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_in"] == 50
    got = rd.read_parquet(out).to_pandas()
    # every junk doc is below the P20 threshold; survivors carry the
    # quality column and all clear the reported cut point
    assert report["all"] == len(got) < 50
    assert (got["doc_id"] >= 10).all()
    assert (got["quality"] >= report["quality_threshold"]).all()
