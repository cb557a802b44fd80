"""Sources, sinks and schema-resolution conveniences.

Covers the reference's I/O surface (SURVEY §2.1/§2.2): the
encoding-fallback CSV reader (S1/S2), JSON debug sink (S6), side-output
writers (S9), column auto-pickers (M13), NaN normalization (M14), parts
stringifiers (M16) and the matcher signature-text builder (M17).
"""

from __future__ import annotations

import io
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

import ray.data as rd


def read_csv_tolerant(path: str, **kwargs):
    """Encoding-fallback CSV source: UTF-8-SIG -> UTF-8 -> cp1254, BOM
    and header whitespace cleaned (reference addresskit/normalize.py:
    19-27,152-154). Decodes driver-side (fixture-scale shim; Parquet is
    the scale path per input_hint) then hands Arrow to Ray."""
    with open(path, "rb") as f:
        data = f.read()
    text = None
    for enc in ("utf-8-sig", "utf-8"):
        try:
            text = data.decode(enc)
            break
        except UnicodeDecodeError:
            continue
    if text is None:
        # errors='replace': cp1254 is not a total codec (0x9D, 0x81,
        # ... are undefined), so the strict last-resort decode could
        # itself raise — defeating "tolerant" (code-review r5)
        text = data.decode("cp1254", errors="replace")
    tbl = pacsv.read_csv(io.BytesIO(text.encode("utf-8")), **kwargs)
    tbl = tbl.rename_columns(
        [c.lstrip("﻿").strip() for c in tbl.column_names])
    return rd.from_arrow(tbl)


def write_json_records(ds, out_dir: str):
    """Debug-only JSON sink (reference run_normalize.py:61-62)."""
    ds.write_json(out_dir)
    return out_dir


def write_side_outputs(ds, text_col: str, out_root: str,
                       suspicious_col: str = "is_suspicious"):
    """Quarantine side-output split (reference clean_and_parse.py:280-287
    *_suspicious.csv): two partitioned Parquet dirs, one per class.
    The two outputs PARTITION the input: a NULL flag routes to the
    suspicious side (quarantine semantics — unknown is not clean);
    filtering on the raw flag dropped null-flag rows from BOTH outputs
    (code-review r5)."""
    good = ds.map_batches(
        lambda t: t.filter(pc.invert(pc.fill_null(
            t.column(suspicious_col), True))),
        batch_format="pyarrow")
    bad = ds.map_batches(
        lambda t: t.filter(pc.fill_null(t.column(suspicious_col), True)),
        batch_format="pyarrow")
    good_dir = os.path.join(out_root, "clean")
    bad_dir = os.path.join(out_root, "suspicious")
    good.write_parquet(good_dir)
    bad.write_parquet(bad_dir)
    return good_dir, bad_dir


# --- column auto-pickers (M13; reference addresskit/match.py:50-59,
# run_normalize.py:16-24, baseline_submission.py:33-44) ---------------

TEXT_COL_PRIORITY = ("address_norm", "addr_norm", "address", "adres",
                     "full_address", "text")
LABEL_COL_CANDIDATES = ("label", "labels", "target")
LAT_KEYS = ("lat", "latitude", "enlem")
LON_KEYS = ("lon", "lng", "longitude", "boylam")


def pick_text_col(schema: pa.Schema | list[str]) -> str:
    names = schema.names if isinstance(schema, pa.Schema) else list(schema)
    for cand in TEXT_COL_PRIORITY:
        if cand in names:
            return cand
    if isinstance(schema, pa.Schema):
        for f in schema:
            if pa.types.is_string(f.type):
                return f.name
    return names[0]


def pick_label_col(names: list[str]) -> str:
    for cand in LABEL_COL_CANDIDATES:
        if cand in names:
            return cand
    return names[-1]


def pick_latlon_cols(names: list[str]) -> tuple[str | None, str | None]:
    lat = next((k for k in LAT_KEYS if k in names), None)
    lon = next((k for k in LON_KEYS if k in names), None)
    return lat, lon


def normalize_nan_strings(ds, cols: list[str] | None = None):
    """NaN/'nan'/'None' -> '' (M14; reference make_submission.py:44-49)."""

    def f(batch: pa.Table) -> pa.Table:
        names = cols or [
            fld.name for fld in batch.schema
            if pa.types.is_string(fld.type) or pa.types.is_null(fld.type)]
        for name in names:
            # all-null blocks arrive typed `null`, not `string`
            col = pc.fill_null(
                pc.cast(batch.column(name), pa.string()), "")
            mask = pc.is_in(col, value_set=pa.array(["nan", "None", "NaN"]))
            col = pc.if_else(mask, "", col)
            batch = batch.set_column(
                batch.column_names.index(name), name, col)
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


# --- parts stringifiers (M16; reference make_submission.py:52-60,
# 109-122) and signature builder (M17; baseline_submission.py:61-66) --

_PART_ORDER = ("mahalle", "cadde", "sokak", "bulvar", "no", "daire",
               "kat", "bina_adi", "mevkii", "il", "ilce")


def stringify_parts(ds, parts_col: str = "parts", mode: str = "kv"):
    """struct parts -> one string column ``parts_str``.
    mode: 'kv' -> "k:v | k:v" ordered; 'json' -> JSON object."""

    def f(batch: pa.Table) -> pa.Table:
        rows = batch.column(parts_col).to_pylist()
        out = []
        for d in rows:
            d = {k: v for k, v in (d or {}).items()
                 if v not in (None, "") and k != "confidence"}
            if mode == "json":
                out.append(json.dumps(
                    {k: d[k] for k in _PART_ORDER if k in d},
                    ensure_ascii=False))
            else:
                out.append(" | ".join(
                    f"{k}:{d[k]}" for k in _PART_ORDER if k in d))
        return batch.append_column("parts_str", pa.array(out, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def build_signature_text(ds, norm_col: str = "addr_norm",
                         parts_str_col: str = "parts_str",
                         out_col: str = "signature"):
    """norm + ' | ' + parts string — the learned matcher's input channel
    (M17; reference baseline_submission.py:61-66)."""

    def f(batch: pa.Table) -> pa.Table:
        sig = pc.binary_join_element_wise(
            pc.fill_null(batch.column(norm_col), ""),
            pc.fill_null(batch.column(parts_str_col), ""),
            " | ")
        return batch.append_column(out_col, sig)

    return ds.map_batches(f, batch_format="pyarrow")
