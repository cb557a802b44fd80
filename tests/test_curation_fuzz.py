"""Seeded fuzz parity for the round-4 curation operators: hundreds of
adversarial random inputs, one bulk Ray run vs one bulk DuckDB run.
Catches Python-re vs RE2 drift and formula-order float drift that
hand-picked cases miss."""

import random

import duckdb
import pandas as pd

import ray.data as rd

from raylink.textstats import add_repetition_signals, repetition_signals_sql
from raylink.urltools import add_url_columns, url_canon_sql

_TOKENS = ["a", "b", "ab", "the", "x1", "9", "kat", "çok", "ışık",
           "word", "w", "zz"]
_SCHEMES = ["http", "HTTP", "https", "HTTPS", "ftp", "s3+x.y"]
_HOSTS = ["Example.COM", "WWW.Example.com", "sub.host.co.uk",
          "news.site.com.tr", "a.b.c.d.e", "xn--bcher-kva.example",
          "[::1]", "127.0.0.1", "www.w", "host"]
_PORTS = ["", ":80", ":443", ":8080", ":0"]
_PATHS = ["", "/", "/A/b/", "/p//q", "/%20x", "/a.b", "///"]
_QUERIES = ["", "?x=1", "?utm_source=a", "?utm_a=1&utm_b=2",
            "?a=1&utm_x=2&b=3", "?utm_x=2&b=3", "?gclid=1&fbclid=2",
            "?a=&b", "?&", "?a=1&&b=2"]
_FRAGS = ["", "#f", "#a?b=1", "#"]


def _rand_doc(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(0, 5)):
        n = rng.randint(0, 9)
        line = " ".join(rng.choice(_TOKENS) for _ in range(n))
        pad = rng.choice(["", " ", "\t", "  "])
        lines.append(pad + line + rng.choice(["", " ", "\r"]))
    # duplicate a line sometimes to exercise the dup-line path
    if lines and rng.random() < 0.5:
        lines.append(rng.choice(lines))
    return "\n".join(lines)


def test_repetition_signals_fuzz_parity():
    rng = random.Random(42)
    docs = [_rand_doc(rng) for _ in range(300)]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    cols = ["n_lines", "dup_line_frac_e6", "dup_line_char_frac_e6",
            "top2gram_char_frac_e6", "top3gram_char_frac_e6",
            "dup5gram_char_frac_e6"]
    got = (add_repetition_signals(rd.from_pandas(df), "text",
                                  batch_size=64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", df)
    want = con.execute(
        "SELECT doc_id, " + ", ".join(cols) + " FROM ("
        + repetition_signals_sql("docs", "text")
        + ") ORDER BY doc_id").fetchdf()
    for c in cols:
        bad = (got[c].to_numpy().astype("int64")
               != want[c].to_numpy().astype("int64"))
        assert not bad.any(), (
            c, [(docs[i], int(got[c][i]), int(want[c][i]))
                for i in bad.nonzero()[0][:3]])


def _rand_url(rng: random.Random) -> str:
    u = ""
    if rng.random() < 0.9:
        u += rng.choice(_SCHEMES) + "://"
    if rng.random() < 0.2:
        u += rng.choice(["user@", "u:p@", "@"])
    u += rng.choice(_HOSTS) + rng.choice(_PORTS)
    u += rng.choice(_PATHS) + rng.choice(_QUERIES) + rng.choice(_FRAGS)
    return rng.choice(["", " ", "\t"]) + u + rng.choice(["", " ", "\n"])


def test_url_canonicalization_fuzz_parity():
    rng = random.Random(7)
    urls = [_rand_url(rng) for _ in range(400)]
    df = pd.DataFrame({"url": urls})
    got = add_url_columns(rd.from_pandas(df), "url").to_pandas()
    con = duckdb.connect()
    con.register("pages", df)
    want = con.execute(url_canon_sql("pages", "url")).fetchdf()
    for c in ("url_canon", "host", "domain"):
        bad = got[c].to_numpy() != want[c].to_numpy()
        assert not bad.any(), (
            c, [(urls[i], got[c][i], want[c][i])
                for i in bad.nonzero()[0][:3]])


def test_repetition_signals_unicode_whitespace_parity():
    # NBSP/U+2028 must tokenize identically on both sides: the Ray
    # side splits with Arrow's RE2 '\s+' exactly like DuckDB's
    # string_split_regex (code-review r4: utf8_split_whitespace gave
    # 666666 vs 315789 on the NBSP doc below)
    docs = ["foo\u00a0bar foo bar baz qux",
            "a\u2028b a b c d",
            "x\u00a0y\nx\u00a0y\nz"]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    cols = ["n_lines", "dup_line_frac_e6", "dup_line_char_frac_e6",
            "top2gram_char_frac_e6", "top3gram_char_frac_e6",
            "dup5gram_char_frac_e6"]
    got = (add_repetition_signals(rd.from_pandas(df), "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", df)
    want = con.execute(
        "SELECT doc_id, " + ", ".join(cols) + " FROM ("
        + repetition_signals_sql("docs", "text")
        + ") ORDER BY doc_id").fetchdf()
    for c in cols:
        assert (got[c].to_numpy().astype("int64")
                == want[c].to_numpy().astype("int64")).all(), c


def test_url_null_propagates_like_sql():
    df = pd.DataFrame({"url": ["https://a.example/x", None,
                               "https://b.example/y", None]})
    got = add_url_columns(rd.from_pandas(df), "url").to_pandas()
    con = duckdb.connect()
    con.register("pages", df)
    want = con.execute(url_canon_sql("pages", "url")).fetchdf()
    for c in ("url_canon", "host", "domain"):
        assert got[c].isna().tolist() == want[c].isna().tolist(), c
    # domain_stats excludes null urls on both sides
    from raylink.urltools import domain_stats, domain_stats_sql
    gs = (domain_stats(rd.from_pandas(df), "url")
          .to_pandas().sort_values("domain").reset_index(drop=True))
    ws = con.execute("SELECT * FROM ("
                     + domain_stats_sql("pages", "url")
                     + ") ORDER BY domain").fetchdf()
    pd.testing.assert_frame_equal(gs, ws[gs.columns])
    assert gs["n_pages"].sum() == 2
