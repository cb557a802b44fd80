"""TF-IDF top-k keyword extraction: DuckDB window-function parity
(exact int64 scores), determinism across partitions, min_df prune."""

import duckdb
import pandas as pd

import ray.data as rd

from raylink.textstats import top_keywords

DOCS = [
    "apple banana apple cherry",
    "banana cherry cherry date",
    "apple apple apple banana banana",
    "date elderberry",
    "",
    "fig",
]


def _oracle(docs, k, min_df):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}))
    return con.execute(rf"""
    WITH arrs AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'),
                    t -> t <> '') AS arr
      FROM documents
    ), toks AS (
      SELECT doc_id, unnest(arr) AS w FROM arrs
    ), tf AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY doc_id, w
    ), df AS (
      SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY w
      HAVING COUNT(DISTINCT doc_id) >= {min_df}
    ), n AS (SELECT COUNT(*) AS n FROM documents),
    sc AS (
      SELECT tf.doc_id, tf.w,
        tf.tf * CAST(FLOOR(1e6 * ln(n.n / df.df)) AS BIGINT) AS score_e6
      FROM tf JOIN df USING (w) CROSS JOIN n
    ), rk AS (
      SELECT doc_id, w, score_e6,
        row_number() OVER (PARTITION BY doc_id
                           ORDER BY score_e6 DESC, w ASC) AS rank
      FROM sc
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS term, score_e6
    FROM rk WHERE rank <= {k}
    ORDER BY doc_id, rank
    """).fetchdf()


def test_top_keywords_matches_duckdb():
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)])
    got = (
        top_keywords(ds, "text", "doc_id", k=2, min_df=1,
                     concurrency=2)
        .to_pandas().sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    exp = _oracle(DOCS, 2, 1)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_top_keywords_min_df_and_partitions():
    rows = [{"doc_id": i, "text": DOCS[i % len(DOCS)] + f" uniq{i}"}
            for i in range(60)]
    a = (top_keywords(rd.from_items(rows), "text", "doc_id", k=3,
                      min_df=2, concurrency=2)
         .to_pandas().sort_values(["doc_id", "rank"])
         .reset_index(drop=True))
    b = (top_keywords(rd.from_items(rows).repartition(7), "text",
                      "doc_id", k=3, min_df=2, concurrency=2,
                      batch_size=11)
         .to_pandas().sort_values(["doc_id", "rank"])
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # min_df=2 prunes the uniq{i} singletons from every result
    assert not a["term"].str.startswith("uniq").any()
    # and the oracle agrees end-to-end
    con = duckdb.connect()
    exp = _oracle([r["text"] for r in rows], 3, 2)
    pd.testing.assert_frame_equal(a, exp, check_dtype=False)


def test_top_keywords_nbsp_matches_duckdb():
    """U+00A0/U+2028 web-text whitespace: the operator must tokenize
    exactly like the twin's RE2 string_split_regex('\\s+') — Unicode
    splits (utf8_split_whitespace / str.split) silently produced a
    different df table on NBSP-bearing docs (code-review r5)."""
    docs = ["apple banana apple",
            "banana cherry banana",
            "apple banana cherry",
            "delta delta delta"]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)])
    got = (top_keywords(ds, "text", "doc_id", k=3, min_df=1,
                        concurrency=2)
           .to_pandas()
           .sort_values(["doc_id", "rank"]).reset_index(drop=True))
    want = _oracle(docs, 3, 1)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), want.astype({"doc_id": "int64"}))
