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
    # split assignment is the deterministic hash split
    from raylink.ranking import hash_split

    redo = (hash_split(rd.from_pandas(
        got[["doc_id"]].assign(x=1)), "doc_id",
        {"train": 0.8, "val": 0.2}).to_pandas())
    merged = got.merge(redo[["doc_id", "split"]], on="doc_id",
                       suffixes=("", "_redo"))
    assert (merged["split"] == merged["split_redo"]).all()
