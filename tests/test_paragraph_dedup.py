"""Cross-document paragraph dedup: DuckDB window-function parity,
globally-first ownership, partition invariance, string ids, and the
no-duplicates corpus (every sha bucket resolves empty)."""

import duckdb
import pandas as pd

import ray.data as rd

from raylink.dedup import paragraph_dedup, paragraph_dedup_sql

DOCS = [
    "keep me\nshared boilerplate\nunique tail",
    "shared boilerplate\nanother para\nshared boilerplate",
    "totally unique\n\n  shared boilerplate  ",   # trim before compare
    "",                                            # no paragraphs
    "only here",
    "shared boilerplate",                          # doc = one dup para
]


def _oracle(df: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", df)
    return con.execute(
        "SELECT * FROM ("
        + paragraph_dedup_sql("docs", "text", id_col)
        + f") ORDER BY {id_col}").fetchdf()


def _run(df: pd.DataFrame, id_col: str = "doc_id", **kw) -> pd.DataFrame:
    return (paragraph_dedup(rd.from_pandas(df), "text", id_col, **kw)
            .to_pandas().sort_values(id_col).reset_index(drop=True))


def test_paragraph_dedup_matches_duckdb():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    got = _run(df, num_group_buckets=8)
    want = _oracle(df)
    for c in ("text", "n_paras", "n_removed"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_paragraph_dedup_keeps_global_first():
    # the winner is the (id, position)-smallest occurrence, across docs
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["b\na", "a\nb"]})
    got = _run(df, num_group_buckets=4)
    assert got["text"].tolist() == ["b\na", ""]
    assert got["n_removed"].tolist() == [0, 2]


def test_paragraph_dedup_partition_invariance():
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    one = _run(df, num_group_buckets=8)
    many = (paragraph_dedup(rd.from_pandas(df).repartition(5),
                            "text", "doc_id", num_group_buckets=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)


def test_paragraph_dedup_string_ids():
    df = pd.DataFrame({"url": [f"u{i:02d}" for i in range(len(DOCS))],
                       "text": DOCS})
    got = _run(df, id_col="url", num_group_buckets=8)
    want = _oracle(df, id_col="url")
    for c in ("text", "n_paras", "n_removed"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_paragraph_dedup_fallback_shuffle_path_agrees():
    # max_broadcast_removals=0 forces the co-shuffle fallback; the two
    # automatically-selected paths must be bit-identical
    df = pd.DataFrame({"doc_id": range(len(DOCS)), "text": DOCS})
    fast = _run(df, num_group_buckets=8)
    slow = _run(df, num_group_buckets=8, max_broadcast_removals=0)
    pd.testing.assert_frame_equal(fast, slow)


def test_paragraph_dedup_no_duplicates_is_identity_modulo_trim():
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["alpha\nbeta", "gamma\ndelta"]})
    got = _run(df, num_group_buckets=4)
    assert got["text"].tolist() == ["alpha\nbeta", "gamma\ndelta"]
    assert got["n_removed"].sum() == 0


# ---------------------------------------------------------------------------
# cross-snapshot incremental dedup
# ---------------------------------------------------------------------------

def test_dedup_exact_against_matches_anti_join():
    from raylink.dedup import dedup_exact_against

    old = pd.DataFrame({"text": ["seen one", "seen two", None]})
    new = pd.DataFrame({
        "doc_id": range(6),
        "text": ["fresh a", "seen one", "fresh b", "seen two",
                 None,          # null == '' identity, matches old null
                 "fresh c"]})
    got = (dedup_exact_against(rd.from_pandas(new),
                               rd.from_pandas(old), "text",
                               num_partitions=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("newt", new)
    con.register("oldt", old)
    want = con.execute("""
        SELECT n.* FROM newt n ANTI JOIN oldt o
        ON coalesce(n.text, '') = coalesce(o.text, '')
        ORDER BY doc_id""").fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert list(got.columns) == ["doc_id", "text"]

    # bloom path and plain anti-join path agree
    plain = (dedup_exact_against(rd.from_pandas(new),
                                 rd.from_pandas(old), "text",
                                 use_bloom=False, num_partitions=2)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert plain["doc_id"].tolist() == got["doc_id"].tolist()


def test_dedup_exact_against_disjoint_and_total_overlap():
    from raylink.dedup import dedup_exact_against

    old = pd.DataFrame({"text": ["a", "b"]})
    disjoint = pd.DataFrame({"doc_id": [1, 2], "text": ["x", "y"]})
    kept = (dedup_exact_against(rd.from_pandas(disjoint),
                                rd.from_pandas(old), "text",
                                num_partitions=2).to_pandas())
    assert sorted(kept["doc_id"]) == [1, 2]
    total = pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]})
    none = (dedup_exact_against(rd.from_pandas(total),
                                rd.from_pandas(old), "text",
                                num_partitions=2).to_pandas())
    assert len(none) == 0


def test_dedup_exact_against_high_fpp_false_positives_verified():
    # fpp=0.6 forces bloom false positives through the exact verify:
    # non-duplicates must STILL survive (code-review r4 — the verify
    # branch was otherwise never exercised)
    from raylink.dedup import dedup_exact_against

    old = pd.DataFrame({"text": [f"old {i}" for i in range(50)]})
    new = pd.DataFrame({
        "doc_id": range(60),
        "text": [f"old {i}" if i < 20 else f"new {i}"
                 for i in range(60)]})
    got = (dedup_exact_against(rd.from_pandas(new),
                               rd.from_pandas(old), "text",
                               fpp=0.6, num_partitions=2)
           .to_pandas())
    assert sorted(got["doc_id"]) == list(range(20, 60))


def test_dedup_exact_against_confirmed_bound_is_loud():
    import pytest as _pytest

    from raylink.dedup import dedup_exact_against

    old = pd.DataFrame({"text": [f"t {i}" for i in range(10)]})
    new = pd.DataFrame({"doc_id": range(10),
                        "text": [f"t {i}" for i in range(10)]})
    with _pytest.raises(ValueError, match="max_confirmed"):
        dedup_exact_against(rd.from_pandas(new), rd.from_pandas(old),
                            "text", max_confirmed=2)
