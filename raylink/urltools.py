"""URL canonicalization + per-domain aggregation for web-page corpora
(the Common-Crawl-style `url` column of the pages table,
BASELINE.json input_hint).

Canonical form is a PINNED sequence of ASCII regex steps — chosen so
Python `re` and DuckDB's RE2 produce byte-identical results (no `\\b`,
no unicode classes; verified in tests/test_urltools.py against the
generated SQL twin):

1.  trim surrounding whitespace (' \\t\\r\\n')
2.  no '://' -> canonical = trimmed input, host = domain = ''
3.  scheme and authority lowercase; userinfo ('user:pw@') dropped
4.  default ports dropped (':80' for http, ':443' for https); other
    ports kept
5.  leading 'www.' dropped from the host
6.  fragment ('#...') dropped
7.  tracking query params removed (utm_*, gclid, fbclid), with the
    '?'/'&' separators repaired and a dangling '?'/'&' dropped
8.  trailing '/'s stripped

``domain`` is a registrable-domain HEURISTIC (last two host labels,
or three when the last two are a common second-level suffix like
co.uk / com.tr) — a public-suffix list is deliberately out of scope;
the pinned suffix set below is part of the operator contract.

Scale shape: canonicalization is one map_batches pass (pure per-row
string kernels, no state, no shuffle); ``domain_stats`` pre-aggregates
(domain, host) counts inside each batch so the shuffle moves one row
per distinct (domain, host) per batch — never one row per page.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# pinned second-level suffixes (operator contract, NOT a full PSL)
SECOND_LEVEL = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.tr", "gov.tr", "edu.tr", "org.tr",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.ar",
)

_TRACKING = r"(utm_[^=&#]*|gclid|fbclid)"

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://")
_AUTH_RE = re.compile(r"^[^/?#]*")
_USERINFO_RE = re.compile(r"^[^@]*@")
_PORT_RE = re.compile(r":([0-9]+)$")
_FRAG_RE = re.compile(r"#.*$")
_TRACK_RE = re.compile(r"[?&]" + _TRACKING + r"=[^&#]*")
_TRAIL_RE = re.compile(r"/+$")


def canonicalize_one(url: str) -> tuple[str, str, str]:
    """(url_canon, host, domain) for one url — the scalar reference
    kernel the batch stage maps (URLs are short; the regex chain is the
    work either way)."""
    t = (url or "").strip(" \t\r\n")
    m = _SCHEME_RE.match(t)
    if not m:
        return t, "", ""
    scheme = m.group(1).lower()
    rest = t[m.end():]
    auth = _AUTH_RE.match(rest).group(0)
    tail = rest[len(auth):]
    auth = _USERINFO_RE.sub("", auth.lower(), count=1)
    pm = _PORT_RE.search(auth)
    port = pm.group(1) if pm else ""
    host = auth[:pm.start()] if pm else auth
    keep_port = port != "" and not (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443"))
    if host.startswith("www."):
        host = host[4:]
    tail = _FRAG_RE.sub("", tail)
    had_query = "?" in tail
    tail = _TRACK_RE.sub("", tail)
    # Repair '&'->'?' ONLY when the tracking removal consumed the real
    # '?' (a '?utm_..=..' match): a URL that never had a query string
    # but holds a literal '&' in its path ('http://h/a&b') must not be
    # rewritten to 'http://h/a?b' (ADVICE r4). Mirrored in
    # _canon_sql_expr's tail3. KNOWN LIMIT (code-review r5, pinned):
    # when a path ALSO contains a literal '&' AND the removed tracking
    # param led the query ('/a&b?utm=1&c=2'), the repair targets the
    # path '&' — the canon can collide with a genuinely different URL.
    # Fixing it needs the removed-'?' POSITION, which the RE2-only SQL
    # twin cannot express; both sides agree (4000-case fuzz), so this
    # is a canonical-value nuance on pathological URLs, not a parity
    # or dedup-correctness break.
    if had_query and "?" not in tail and "&" in tail:
        tail = tail.replace("&", "?", 1)
    tail = re.sub(r"[?&]+$", "", tail)
    tail = _TRAIL_RE.sub("", tail)
    labels = host.split(".") if host else []
    if len(labels) <= 2:
        domain = host
    else:
        last2 = ".".join(labels[-2:])
        domain = (".".join(labels[-3:]) if last2 in SECOND_LEVEL
                  else last2)
    canon = scheme + "://" + host + (f":{port}" if keep_port else "") \
        + tail
    return canon, host, domain


def add_url_columns(ds, url_col: str, batch_size: int = 8192):
    """Append url_canon / host / domain columns (one streaming
    map_batches pass)."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        canon, hosts, doms = [], [], []
        for u in urls:
            if u is None:
                # NULL propagates, matching the SQL twin (every DuckDB
                # function returns NULL on NULL input; '' would fold
                # missing urls into the schemeless-url group,
                # code-review r4)
                canon.append(None)
                hosts.append(None)
                doms.append(None)
                continue
            c, h, d = canonicalize_one(u)
            canon.append(c)
            hosts.append(h)
            doms.append(d)
        for name, vals in (("url_canon", canon), ("host", hosts),
                           ("domain", doms)):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(vals, pa.string()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow",
                          batch_size=batch_size)


def domain_stats(ds, url_col: str, batch_size: int = 8192):
    """(domain, n_pages, n_hosts) — pages per registrable domain and
    distinct hosts per domain. Pre-aggregates (domain, host, n) inside
    every batch, so the shuffle moves one row per distinct (domain,
    host) per batch; a second tiny groupby folds hosts per domain."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        # NULL urls carry no domain — excluded here AND by the twin's
        # WHERE url IS NOT NULL (code-review r4)
        rows = [canonicalize_one(u) for u in urls if u is not None]
        df = pd.DataFrame({"domain": [r[2] for r in rows],
                           "host": [r[1] for r in rows]})
        agg = (df.groupby(["domain", "host"], sort=False)
               .size().reset_index(name="n"))
        return pa.table({
            "domain": pa.array(agg["domain"].tolist(), pa.string()),
            "host": pa.array(agg["host"].tolist(), pa.string()),
            "n": pa.array(agg["n"].to_numpy(np.int64)),
        })

    per_host = (ds.map_batches(partial, batch_format="pyarrow",
                               batch_size=batch_size)
                .groupby(["domain", "host"])
                .aggregate(Sum("n", alias_name="n_pages_h")))

    def fold(batch: pa.Table) -> pa.Table:
        # one (domain, host) row per group survives the global groupby,
        # so a per-batch re-aggregate + a final Sum groupby is exact
        df = batch.to_pandas()
        agg = (df.groupby("domain", sort=False)
               .agg(n_pages=("n_pages_h", "sum"),
                    n_hosts=("host", "size")).reset_index())
        return pa.table({
            "domain": pa.array(agg["domain"].tolist(), pa.string()),
            "n_pages": pa.array(agg["n_pages"].to_numpy(np.int64)),
            "n_hosts": pa.array(agg["n_hosts"].to_numpy(np.int64)),
        })

    return (per_host.map_batches(fold, batch_format="pyarrow")
            .groupby("domain")
            .aggregate(Sum("n_pages", alias_name="n_pages"),
                       Sum("n_hosts", alias_name="n_hosts")))


def _canon_sql_expr(col: str) -> dict[str, str]:
    """DuckDB expression fragments mirroring canonicalize_one, step by
    step (same regexes; RE2-safe by construction)."""
    t = f"trim({col}, ' ' || chr(9) || chr(13) || chr(10))"
    scheme = f"lower(regexp_extract({t}, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1))"
    rest = f"substr({t}, length({scheme}) + 4)"
    auth0 = f"regexp_extract({rest}, '^[^/?#]*')"
    tail0 = f"substr({rest}, length({auth0}) + 1)"
    auth = f"regexp_replace(lower({auth0}), '^[^@]*@', '')"
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    host0 = f"regexp_replace({auth}, ':[0-9]+$', '')"
    host = f"regexp_replace({host0}, '^www\\.', '')"
    keep_port = (f"({port} <> '' AND NOT (({scheme} = 'http' AND {port} = '80')"
                 f" OR ({scheme} = 'https' AND {port} = '443')))")
    tail1 = f"regexp_replace({tail0}, '#.*$', '')"
    tail2 = f"regexp_replace({tail1}, '[?&]{_TRACKING}=[^&#]*', '', 'g')"
    tail3 = (f"CASE WHEN strpos({tail1}, '?') > 0 "
             f"AND strpos({tail2}, '?') = 0 AND strpos({tail2}, '&') > 0 "
             f"THEN regexp_replace({tail2}, '&', '?') ELSE {tail2} END")
    tail4 = f"regexp_replace({tail3}, '[?&]+$', '')"
    tail = f"regexp_replace({tail4}, '/+$', '')"
    labels = f"string_split({host}, '.')"
    last2 = f"array_to_string({labels}[-2:], '.')"
    last3 = f"array_to_string({labels}[-3:], '.')"
    sl = ", ".join(f"'{s}'" for s in SECOND_LEVEL)
    domain = (f"CASE WHEN len({labels}) <= 2 THEN {host} "
              f"WHEN list_contains([{sl}], {last2}) THEN {last3} "
              f"ELSE {last2} END")
    canon = (f"{scheme} || '://' || {host} || "
             f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END)"
             f" || {tail}")
    no_scheme = f"({scheme} = '')"
    return {
        "url_canon": f"CASE WHEN {no_scheme} THEN {t} ELSE {canon} END",
        "host": f"CASE WHEN {no_scheme} THEN '' ELSE {host} END",
        "domain": f"CASE WHEN {no_scheme} THEN '' ELSE {domain} END",
    }


def url_canon_sql(table: str, url_col: str, extra_cols: str = "") -> str:
    """SELECT mirroring :func:`add_url_columns` over ``table``."""
    e = _canon_sql_expr(url_col)
    extra = f"{extra_cols}, " if extra_cols else ""
    return (f"SELECT {extra}{url_col}, {e['url_canon']} AS url_canon, "
            f"{e['host']} AS host, {e['domain']} AS domain FROM {table}")


def domain_stats_sql(table: str, url_col: str) -> str:
    """SQL twin of :func:`domain_stats` (NULL urls carry no domain —
    excluded on both sides)."""
    return (f"SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_pages, "
            f"CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts "
            f"FROM ({url_canon_sql(table, url_col)}) "
            f"WHERE {url_col} IS NOT NULL GROUP BY domain")
