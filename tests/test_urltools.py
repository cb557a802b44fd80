"""URL canonicalization + domain stats: bit-exact parity with the
generated DuckDB twin (RE2-safe pinned regex chain), scalar kernel
golden vectors, and the pre-aggregated distinct-host counts."""

import duckdb
import pandas as pd

import ray.data as rd

from raylink.urltools import (add_url_columns, canonicalize_one,
                              domain_stats, domain_stats_sql,
                              url_canon_sql)

URLS = [
    "  HTTPS://WWW.Example.COM:443/Path/To/Page/?utm_source=x&id=7&fbclid=z#frag  ",
    "http://user:pw@Sub.Host.co.uk:80/a/b/",
    "http://example.com:8080/x?utm_a=1&utm_b=2&q=3",
    "https://news.site.com.tr/haber/1?gclid=abc",
    "ftp://Files.Example.org/pub/",
    "not a url at all",
    "",
    "https://example.com/?utm_only=1",
    "http://[::1]:8080/x",
    "https://a.b.c.d.example.com/deep",
    "http://example.com",
    "https://www.example.com/",
    "http://host.com/a&b",
    "http://host.com/p?utm_source=x&q=1",
]


def test_canonicalize_one_golden():
    assert canonicalize_one(URLS[0]) == (
        "https://example.com/Path/To/Page/?id=7",
        "example.com", "example.com")
    # userinfo + default port dropped; second-level suffix -> 3 labels
    assert canonicalize_one(URLS[1]) == (
        "http://sub.host.co.uk/a/b", "sub.host.co.uk", "host.co.uk")
    # non-default port kept; tracking removed mid-query
    assert canonicalize_one(URLS[2]) == (
        "http://example.com:8080/x?q=3", "example.com", "example.com")
    # schemeless input passes through with empty host/domain
    assert canonicalize_one("not a url at all") == (
        "not a url at all", "", "")
    # tracking-only query leaves no dangling '?'
    assert canonicalize_one(URLS[7]) == (
        "https://example.com", "example.com", "example.com")
    # literal '&' in a query-less path is NOT rewritten to '?'
    # (ADVICE r4: the repair fires only when tracking removal consumed
    # the real '?')
    assert canonicalize_one("http://host.com/a&b") == (
        "http://host.com/a&b", "host.com", "host.com")
    # ... but a leading '?utm_..' removal still promotes the next '&'
    assert canonicalize_one("http://host.com/p?utm_source=x&q=1") == (
        "http://host.com/p?q=1", "host.com", "host.com")


def test_add_url_columns_matches_duckdb():
    df = pd.DataFrame({"url": URLS})
    got = add_url_columns(rd.from_pandas(df), "url").to_pandas()
    con = duckdb.connect()
    con.register("pages", df)
    want = con.execute(url_canon_sql("pages", "url")).fetchdf()
    for c in ("url_canon", "host", "domain"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_domain_stats_matches_duckdb():
    df = pd.DataFrame({"url": URLS})
    got = (domain_stats(rd.from_pandas(df).repartition(3), "url")
           .to_pandas().sort_values("domain").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", df)
    want = con.execute(
        "SELECT * FROM (" + domain_stats_sql("pages", "url")
        + ") ORDER BY domain").fetchdf()
    pd.testing.assert_frame_equal(got, want[got.columns])
    row = got.set_index("domain").loc["example.com"]
    # example.com spans two hosts (example.com + a.b.c.d.example.com)
    assert int(row["n_hosts"]) == 2
