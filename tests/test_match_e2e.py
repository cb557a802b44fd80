"""End-to-end linkage tests on the deterministic pages fixture:

1. byte-identical HTML->text extraction per url (the input_hint
   per-row invariant),
2. edge parity between the Ray pipeline and the single-process oracle
   mirroring the reference loop (pairwise F1 == 1.0 at the same
   blocking key),
3. pairwise F1 >= 0.99 against the generator's entity gold labels,
4. clusters == union-find transitive closure of the edges,
5. invariance under partitioning and under salting.
"""

import pyarrow as pa
import pytest

import ray.data as rd

from oracle import oracle_match
from raylink.cluster import connected_components, connected_components_local
from raylink.config import MatchConfig
from raylink.extract import extract_dataset
from raylink.fixtures import build_labeled_pairs, build_pages
from raylink.match import match_datasets
from raylink.pipeline import prepare_pages, run_linkage, split_left_right

N_ENTITIES = 150

FIXTURE_CFG = MatchConfig(threshold=85.0, topk=3, scorer="token_set_ratio",
                          block_by="digits+prefix6",
                          w_text=0.8, w_digits=0.15, w_geo=0.05,
                          left_id="url", right_id="url")


@pytest.fixture(scope="module")
def fixture_data():
    pages, truth = build_pages(N_ENTITIES, seed=42)
    labeled = build_labeled_pairs(pages, truth)
    return pages, truth, labeled


@pytest.fixture(scope="module")
def edges_result(fixture_data):
    pages, _, _ = fixture_data
    ds = rd.from_arrow(pages)
    out = run_linkage(ds, match_cfg=FIXTURE_CFG, with_clusters=False,
                      with_unmatched=False)
    edges = out["edges"].to_pandas()
    prepared = out["prepared"].to_pandas()
    return edges, prepared


def test_extract_byte_identical(fixture_data):
    pages, _, _ = fixture_data
    ds = extract_dataset(rd.from_arrow(pages), concurrency=2)
    df = ds.to_pandas()
    assert (df["text_extracted"] == df["text"]).all()


def test_edges_match_reference_oracle(edges_result, fixture_data):
    pages, _, _ = fixture_data
    edges, prepared = edges_result
    rows = [
        {"id": u, "text": t}
        for u, t in zip(prepared["url"], prepared["addr_norm"])
    ]
    left = [r for r in rows if r["id"].startswith("https://siteL")]
    right = [r for r in rows if r["id"].startswith("https://siteR")]
    want = {(l, r): s for l, r, s in oracle_match(left, right, FIXTURE_CFG)}
    got = {
        (l, r): s
        for l, r, s in zip(edges["left_id"], edges["right_id"],
                           edges["score"])
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def test_pairwise_f1_vs_gold(edges_result, fixture_data):
    _, _, labeled = fixture_data
    edges, _ = edges_result
    predicted = set(zip(edges["left_id"], edges["right_id"]))
    tp = fp = fn = 0
    for l, r, m in zip(
        labeled["left_id"].to_pylist(),
        labeled["right_id"].to_pylist(),
        labeled["is_match"].to_pylist(),
    ):
        hit = (l, r) in predicted
        if m and hit:
            tp += 1
        elif m and not hit:
            fn += 1
        elif not m and hit:
            fp += 1
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (tp, fp, fn)


def test_clusters_are_transitive_closure(edges_result):
    edges, _ = edges_result
    pairs = list(zip(edges["left_id"], edges["right_id"]))
    want = connected_components_local(pairs)
    edge_tbl = pa.table(
        {
            "left_id": pa.array(edges["left_id"], pa.string()),
            "right_id": pa.array(edges["right_id"], pa.string()),
        }
    )
    got_df = connected_components(rd.from_arrow(edge_tbl)).to_pandas()
    got = dict(zip(got_df["id"], got_df["cluster_id"]))
    assert got == want


def test_connected_components_pandas_origin_edges():
    """Regression (VERDICT r1 #1): edges produced by map_groups with
    batch_format="pandas" include EMPTY pandas blocks (groups returning
    an empty DataFrame) that Ray's map_batches passes through without
    Arrow conversion — generic CC must not crash on mixed block types
    inside its joins (AssertionError BlockType.PANDAS/BlockType.ARROW).
    """
    import pandas as pd

    # chain 0-1-2-3 in group "a", pair 10-11 in group "b", singleton 20
    # in group "c" (the singleton group yields an EMPTY pandas block)
    src = rd.from_items(
        [{"g": "a", "n": i} for i in range(4)]
        + [{"g": "b", "n": i} for i in (10, 11)]
        + [{"g": "c", "n": 20}]
    )

    def chain(g: pd.DataFrame) -> pd.DataFrame:
        ns = sorted(f"{int(v):04d}" for v in g["n"])
        return pd.DataFrame(
            {"left_id": pd.Series(ns[:-1], dtype="object"),
             "right_id": pd.Series(ns[1:], dtype="object")})

    edges = src.groupby("g").map_groups(chain, batch_format="pandas")
    got_df = connected_components(edges).to_pandas()
    got = dict(zip(got_df["id"], got_df["cluster_id"]))
    pairs = [("0000", "0001"), ("0001", "0002"), ("0002", "0003"),
             ("0010", "0011")]
    assert got == connected_components_local(pairs)


def test_partitioning_and_salting_invariance(fixture_data):
    pages, _, _ = fixture_data
    ds = rd.from_arrow(pages)
    prepared = prepare_pages(ds, extract_concurrency=2)
    left, right = split_left_right(prepared)

    def edge_set(lds, rds, hot):
        e = match_datasets(
            lds, rds, FIXTURE_CFG,
            left_text_col="addr_norm", right_text_col="addr_norm",
            hot_keys=hot,
        ).to_pandas()
        return set(zip(e["left_id"], e["right_id"], e["score"]))

    base = edge_set(left, right, set())
    repart = edge_set(left.repartition(7), right.repartition(3), set())
    assert base == repart

    # salt EVERY block: pair coverage must be exactly preserved
    all_keys = set()
    from raylink.blocking import make_block_key
    from raylink.normalize import normalize_text

    for t in pages.column("text").to_pylist():
        all_keys.add(
            make_block_key({"t": normalize_text(t)}, "t",
                           FIXTURE_CFG.block_by))
    salted = edge_set(left, right, all_keys)
    assert base == salted


def test_unmatched_antijoin(fixture_data):
    pages, truth, _ = fixture_data
    ds = rd.from_arrow(pages)
    out = run_linkage(ds, match_cfg=FIXTURE_CFG, with_clusters=False,
                      with_unmatched=True)
    edges = out["edges"].to_pandas()
    un_left = out["unmatched_left"].to_pandas()
    matched_left = set(edges["left_id"])
    un_urls = set(un_left["url"]) if "url" in un_left.columns else set()
    assert un_urls.isdisjoint(matched_left)
    prepared_left = {
        u for u in out["prepared"].to_pandas()["url"]
        if u.startswith("https://siteL")
    }
    assert un_urls | matched_left == prepared_left


def test_hot_block_sample_layout_probe():
    """VERDICT r3 #8: a key-SORTED input must not inherit the block
    sample's hot-key miss probability — the adjacency probe detects the
    clustered layout and find_hot_blocks switches to the positional
    stride sample (r5; previously the exact full scan), which thins
    every contiguous key run at exactly rate 1/k: the 400-row hot run
    samples ~40 against the scaled cutoff 3.2, each 10-row cold key
    samples exactly 1 — so the sampled scan returns the same hot set
    as the full one, with neither the block sample's miss risk nor its
    cold-key over-flagging. Also unit-checks the probe's two verdicts
    directly."""
    import ray

    from raylink.match import _layout_probe_clustered, find_hot_blocks

    cfg = MatchConfig(block_by="prefix4", salt_over=64)
    # one hot prefix4 key ('hotk', 400 rows) + 1600 distinct cold keys
    rows = [{"url": f"u{i}", "addr_norm": f"hotkey variant {i} 12"}
            for i in range(400)]
    rows += [{"url": f"c{i}", "addr_norm": f"c{i:04d} sokak {i}"}
             for i in range(1600)]
    rows.sort(key=lambda r: r["addr_norm"])  # key-clustered layout

    # materialize WITHOUT pre-derived keys: 40 x 50-row blocks survive
    # (add_block_keys' map_batches would coalesce them into one block
    # and the block-sample path would never engage); find_hot_blocks
    # derives keys after sampling, the probe via its key_fn
    ds = rd.from_items(rows).repartition(40).materialize()
    hot_full = find_hot_blocks(ds, "addr_norm", cfg,
                               sample_fraction=1.0)
    hot_sampled = find_hot_blocks(ds, "addr_norm", cfg,
                                  sample_fraction=0.1)
    assert hot_full == {"hotk"}
    # the probe must detect the sorted layout and force the full scan,
    # so the sampled call returns EXACTLY the full-scan hot set (a
    # trusted sample would both risk missing 'hotk' and over-flag
    # 10-row cold keys against the fraction-scaled cutoff)
    assert hot_sampled == hot_full

    # probe unit checks: sorted chunks fire, interleaved chunks don't
    import random

    def chunk_refs(ordered_rows):
        tabs = []
        for i in range(0, len(ordered_rows), 500):
            chunk = ordered_rows[i:i + 500]
            tabs.append(pa.table({
                "addr_norm": [r["addr_norm"] for r in chunk]}))
        return [ray.put(t) for t in tabs[:4]]

    assert _layout_probe_clustered(chunk_refs(rows), "addr_norm", cfg)
    shuffled = list(rows)
    random.Random(7).shuffle(shuffled)
    assert not _layout_probe_clustered(chunk_refs(shuffled),
                                       "addr_norm", cfg)


def test_run_linkage_sorted_input_matches_crawl_order(fixture_data):
    """Pipeline-level VERDICT r3 #8 check: run_linkage with
    salt_hot_blocks=True over KEY-SORTED pages produces the same edge
    set as over crawl-ordered pages (the probe may force the full scan
    but never changes pair coverage)."""
    pages, _, _ = fixture_data

    def edge_set(tbl):
        out = run_linkage(rd.from_arrow(tbl), match_cfg=FIXTURE_CFG,
                          with_clusters=False, with_unmatched=False,
                          salt_hot_blocks=True)
        e = out["edges"].to_pandas()
        return set(zip(e["left_id"], e["right_id"], e["score"]))

    assert edge_set(pages) == edge_set(pages.sort_by("text"))


def test_match_empty_side_no_crash():
    """An empty side (e.g. a split that matched no urls) has
    Dataset.schema() == None; _prepare_side must treat that as no-geo
    instead of dying on None.names (code-review r5), and the match
    must return zero edges, not raise."""
    left = rd.from_items([])
    right = rd.from_items([{"url": "r1",
                            "addr_norm": "mimoza sk no 12 kadikoy"}])
    cfg = MatchConfig(threshold=50.0, block_by="prefix4",
                      left_id="url", right_id="url")
    edges = match_datasets(left, right, cfg,
                           left_text_col="addr_norm",
                           right_text_col="addr_norm")
    assert edges.count() == 0


def test_extract_empty_batch_and_undecodable_bytes():
    """code-review r5: a zero-row batch crashed the vectorized extract
    path (append_column length mismatch) and a byte undefined in
    cp1254 crashed the LAST-RESORT decode tier."""
    from raylink.extract import ExtractText, decode_bytes

    ex = ExtractText(html_col="html", out_col="text")
    empty = pa.table({"html": pa.array([], pa.binary())})
    out = ex(empty)
    assert out.num_rows == 0 and "text" in out.column_names
    # 0x81 is undefined in cp1254 and invalid UTF-8
    assert "junk" in decode_bytes(b"\x81 junk")
    got = ex(pa.table({"html": pa.array(
        [b"<article>ok \x81 here</article>"], pa.binary())}))
    assert "ok" in got.column("text")[0].as_py()


def test_ensure_fixture_dir_atomic_publish(tmp_path):
    """The fixture cache publishes via ONE atomic rename: concurrent
    generators can never interleave writes into the served directory,
    a stale partial dir (crash of the old in-place scheme) is cleared
    and regenerated, and the marker implies complete files."""
    import os

    import pyarrow.parquet as pq

    from raylink.fixtures import ensure_fixture_dir

    base = str(tmp_path / "fx")
    out = ensure_fixture_dir(12, seed=5, base=base)
    assert os.path.exists(os.path.join(out, "_DONE"))
    n = pq.read_table(os.path.join(out, "pages.parquet")).num_rows
    assert n > 0
    # cached second call: same dir, file untouched
    mtime = os.path.getmtime(os.path.join(out, "pages.parquet"))
    assert ensure_fixture_dir(12, seed=5, base=base) == out
    assert os.path.getmtime(os.path.join(out, "pages.parquet")) == mtime

    # stale partial dir without the marker -> cleared and regenerated
    import shutil

    shutil.rmtree(out)
    os.makedirs(out)
    with open(os.path.join(out, "pages.parquet"), "w") as f:
        f.write("truncated garbage")
    out2 = ensure_fixture_dir(12, seed=5, base=base)
    assert out2 == out
    assert pq.read_table(
        os.path.join(out2, "pages.parquet")).num_rows == n
