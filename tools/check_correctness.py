"""Local emulation of the driver's correctness gate: run each
queries() entry and its oracle_sql() side by side on a testdata sf dir,
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

import ray

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        try:
            return res.to_pandas()
        except TypeError:
            pass
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("int64").astype("float64")
        elif col.dtype.kind in "fiub":
            # numeric columns compared as rounded doubles so int64 vs
            # float64 schema drift (duckdb HUGEINT sums) doesn't matter
            df[c] = col.astype("float64").round(6)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    blob = df.to_csv(index=False).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            # a misspelled name used to be silently skipped -> the
            # tool printed "0 failures" without running anything
            print(f"FAIL unknown query name(s): {sorted(unknown)}; "
                  f"known: {sorted(qs)[:8]}...")
            failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(got)} ({wall:.1f}s, rows-only)")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        problems = []
        if len(g) != len(w):
            problems.append(f"rows {len(g)} != {len(w)}")
        if list(g.columns) != list(w.columns):
            problems.append(f"cols {list(g.columns)} != {list(w.columns)}")
        elif value_hash(g) != value_hash(w):
            problems.append("value hash mismatch")
            diff = g.compare(w) if len(g) == len(w) else None
            if diff is not None and not diff.empty:
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok   {name}: rows={len(g)} hash={value_hash(g)} "
                  f"({wall:.1f}s)")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    ray.shutdown()
    sys.exit(code)
