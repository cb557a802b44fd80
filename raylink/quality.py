"""Quality flags, row filters and exact dedup as vectorized stages.

Mirrors the reference's quality gate (scripts/clean_and_parse.py:203-216
``add_quality_flags``: char_len / word_len / digit_count / punct_count /
is_suspicious) and its row filters (:244-247 — null/empty address,
punctuation-only, len <= 5), re-expressed over Arrow batches with
pyarrow.compute kernels — no Python loop in the hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# "no letter or number anywhere" — Unicode classes, because RE2's \W
# is ASCII-only and the old [\s\W_]+ classified every non-ASCII letter
# as punctuation, silently dropping e.g. an all-Turkish-uppercase row
# as punctuation-only (code-review r5; the SQL twin uses the same RE2
# class so both sides moved together)
ONLY_PUNCT_RE = r"^[^\p{L}\p{N}]+$"


def add_quality_flags(ds, text_col: str, batch_size: int | None = None):
    """char_len, word_len, digit_count, punct_count, is_suspicious
    (clean_and_parse.py:203-214). is_suspicious:
    char_len<10 | word_len<2 | char_len>180 | digit_count==0."""

    def flags(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col).cast(pa.string())
        s = pc.fill_null(s, "")
        char_len = pc.utf8_length(s)
        # count non-whitespace runs (utf8_split_whitespace keeps empty
        # edge tokens, so it can't be used for word counts)
        word_len = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int32())
        digit_count = pc.count_substring_regex(s, r"\d")
        # Unicode-aware: RE2 \w is ASCII, so [^\w\s] counted every
        # non-ASCII letter as punctuation (code-review r5; twin moved
        # in lockstep)
        punct_count = pc.count_substring_regex(s, r"[^\p{L}\p{N}_\s]")
        suspicious = pc.or_(
            pc.or_(pc.less(char_len, 10), pc.less(word_len, 2)),
            pc.or_(pc.greater(char_len, 180), pc.equal(digit_count, 0)),
        )
        for name, arr in (
            ("char_len", pc.cast(char_len, pa.int32())),
            ("word_len", word_len),
            ("digit_count", pc.cast(digit_count, pa.int32())),
            ("punct_count", pc.cast(punct_count, pa.int32())),
            ("is_suspicious", suspicious),
        ):
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, arr)
        return batch

    return ds.map_batches(flags, batch_format="pyarrow",
                          batch_size=batch_size)


def filter_valid_text(ds, text_col: str, min_len: int = 5,
                      batch_size: int | None = None):
    """Drop null/empty/punctuation-only/too-short rows
    (clean_and_parse.py:244-247: notna, strip != "", not only-punct,
    len > 5)."""

    def keep(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col)
        stripped = pc.utf8_trim_whitespace(pc.fill_null(
            pc.cast(s, pa.string()), ""))
        mask = pc.and_(
            pc.and_(
                pc.is_valid(s),
                pc.greater(pc.utf8_length(stripped), 0),
            ),
            pc.and_(
                pc.invert(pc.match_substring_regex(stripped, ONLY_PUNCT_RE)),
                # length of the STRIPPED text: whitespace-padded junk
                # ('  ab  ') passed the unstripped gate while the
                # reference length check runs on cleaned text
                # (code-review r5; twin: length(trim(text)) > 5)
                pc.greater(pc.utf8_length(stripped), min_len),
            ),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow",
                          batch_size=batch_size)


def scrub_newlines(ds, cols: list[str] | None = None,
                   batch_size: int = 16384):
    """Global string scrub: \\r?\\n -> ' ' + trim on string columns
    (clean_and_parse.py:235-236)."""

    def scrub(batch: pa.Table) -> pa.Table:
        names = cols or [
            f.name for f in batch.schema if pa.types.is_string(f.type)
        ]
        for name in names:
            # nulls PROPAGATE (replace/trim are null-safe): the old
            # fill_null('') silently converted NULL to '' — destroying
            # null tracking for downstream missing_report /
            # filter_valid_text / join keys (code-review r5)
            cleaned = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(
                    batch.column(name), r"\r?\n", " "
                )
            )
            idx = batch.column_names.index(name)
            batch = batch.set_column(idx, name, cleaned)
        return batch

    return ds.map_batches(scrub, batch_format="pyarrow",
                          batch_size=batch_size)


def flag_duplicates(ds, key_col: str, out_col: str = "is_duplicate",
                    num_partitions: int = 16):
    """Mark (not drop) rows whose key occurs more than once —
    ``duplicated(keep=False)`` (clean_and_parse.py:215, DeepEDA.py:126-137).
    Counts per key via partial aggregation, then hash-joined back.

    NULL keys form one group like pandas duplicated / SQL
    ``COUNT(*) OVER (PARTITION BY key)``: the hash join can't match
    them (and the old per-batch count counted the key column itself,
    giving the null group 0), so null-keyed rows take a separate
    broadcast-scalar path and union back in (code-review r5)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_col]).group_by(key_col).aggregate(
            [([], "count_all")])
        return t.rename_columns([key_col, "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="_key_count"))
    ).materialize()  # consumed twice: null-row probe + the join

    def _null_rows(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(key_col)))

    null_count_rows = counts.map_batches(
        _null_rows, batch_format="pyarrow").take_all()
    n_null = int(null_count_rows[0]["_key_count"]) \
        if null_count_rows else 0

    out_cols = None

    def _valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(key_col)))

    joined = ds.map_batches(_valid, batch_format="pyarrow").join(
        counts.map_batches(
            lambda t: t.filter(pc.is_valid(t.column(key_col))),
            batch_format="pyarrow"),
        join_type="inner", num_partitions=num_partitions,
        on=(key_col,))

    def mark(batch: pa.Table) -> pa.Table:
        dup = pc.greater(batch.column("_key_count"), 1)
        out = (batch.drop_columns(["_key_count"])
               .append_column(out_col, dup))
        return out.select(out_cols) if out_cols else out

    from .blocks import dataset_schema

    out_cols = list(dataset_schema(ds).names) + [out_col]

    def mark_null(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_null(batch.column(key_col)))
        flag = pa.array([n_null > 1] * t.num_rows, pa.bool_())
        return t.append_column(out_col, flag).select(out_cols)

    marked = joined.map_batches(mark, batch_format="pyarrow")
    if n_null == 0:
        return marked
    nulls_marked = ds.map_batches(mark_null, batch_format="pyarrow")
    return marked.union(nulls_marked)
