"""Sinks / scrubs / side outputs (S4-S9, M9) and empty-input edge
cases."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from raylink.config import MatchConfig
from raylink.match import match_datasets
from raylink.quality import add_quality_flags, scrub_newlines
from raylink.sources import write_json_records, write_side_outputs


def test_scrub_newlines():
    ds = rd.from_items([{"a": "x\r\ny ", "b": 1}, {"a": " z\n", "b": 2}])
    out = scrub_newlines(ds).to_pandas().sort_values("b")
    assert list(out["a"]) == ["x y", "z"]


def test_side_outputs_split(tmp_path):
    ds = rd.from_items(
        [{"text": "good address no 12 with digits etc"},
         {"text": "bad"}])
    flagged = add_quality_flags(ds, "text")
    good_dir, bad_dir = write_side_outputs(flagged, "text", str(tmp_path))
    good = pq.read_table(good_dir)
    bad = pq.read_table(bad_dir)
    assert good.num_rows == 1
    assert bad.num_rows == 1
    assert "good" in good.column("text").to_pylist()[0]


def test_write_json(tmp_path):
    ds = rd.from_items([{"x": 1}, {"x": 2}])
    out = write_json_records(ds, str(tmp_path / "j"))
    files = os.listdir(out)
    assert files
    import json

    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows.extend(json.loads(line) for line in fh if line.strip())
    assert sorted(r["x"] for r in rows) == [1, 2]


def test_match_empty_side():
    left = rd.from_arrow(pa.table({
        "id": pa.array(["a"], pa.string()),
        "text": pa.array(["akasya mahalle no 3"], pa.string())}))
    right = rd.from_arrow(pa.table({
        "id": pa.array([], pa.string()),
        "text": pa.array([], pa.string())}))
    cfg = MatchConfig(threshold=50, block_by="prefix4",
                      left_id="id", right_id="id")
    edges = match_datasets(left, right, cfg, left_text_col="text",
                           right_text_col="text").to_pandas()
    assert len(edges) == 0


def test_extract_vectorized_matches_per_row():
    """The whole-batch fast path must be byte-identical to the per-row
    decode chain — including entity unescape, article-less docs, a
    UTF-8 BOM, and the cp1254 fallback (which forces the slow path)."""
    import pyarrow as pa

    from raylink.extract import ExtractText

    ex = ExtractText()
    docs = [
        "<html><body><article>caf&amp; ok &lt;x&gt;</article></body></html>"
        .encode("utf-8"),
        "<html><body>no article &amp; tags</body></html>".encode("utf-8"),
        "﻿<html><body>bom no article</body></html>".encode("utf-8"),
        None,
        "<html><article>çğış UTF</article></html>".encode("utf-8"),
    ]
    want = [ex.extract_one(d) for d in docs]
    batch = pa.table({"html": pa.array(docs, pa.binary())})
    got = ex(batch).column("text_extracted").to_pylist()
    assert got == want

    # cp1254 page in the batch -> utf-8 cast fails -> per-row fallback
    docs2 = docs + ["<html><article>Çınarlı Muğla</article></html>"
                    .encode("cp1254")]
    want2 = [ex.extract_one(d) for d in docs2]
    batch2 = pa.table({"html": pa.array(docs2, pa.binary())})
    got2 = ex(batch2).column("text_extracted").to_pylist()
    assert got2 == want2


def test_side_outputs_partition_null_flags(tmp_path):
    """A NULL suspicious flag must land in exactly one side (the
    suspicious quarantine) — filtering on the raw flag dropped such
    rows from BOTH outputs (code-review r5)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "text": ["clean", "bad", "unknown"],
        "is_suspicious": pa.array([False, True, None], pa.bool_()),
    }))
    good_dir, bad_dir = write_side_outputs(ds, "text", str(tmp_path))
    import os

    def rows(d):
        out = []
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                out += pq.read_table(os.path.join(d, f))["text"].to_pylist()
        return sorted(out)

    assert rows(good_dir) == ["clean"]
    assert rows(bad_dir) == ["bad", "unknown"]


def test_read_csv_tolerant_undecodable_byte(tmp_path):
    """cp1254 is not a total codec: byte 0x9D used to crash the
    last-resort decode of the 'tolerant' reader (code-review r5)."""
    from raylink.sources import read_csv_tolerant

    p = tmp_path / "weird.csv"
    p.write_bytes(b"id,txt\n1,ab\x9dcd\n")
    got = read_csv_tolerant(str(p)).to_pandas()
    assert got["id"].tolist() == [1]
    assert got["txt"].iloc[0].startswith("ab")
