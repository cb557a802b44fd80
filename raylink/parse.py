"""Address field parsing: clean -> regex/token field extraction ->
postprocess repair, fused into one Ray Data ``map_batches`` stage that
emits an Arrow struct column.

Reproduces the semantics of the reference chain
``clean_text`` + ``normalize_and_parse``
(addresskit/preprocessing/normalize_and_parse.py:43-168) followed by
``postprocess_parts`` (addresskit/preprocessing/postprocess.py:26-149),
with ASCII field names per the reference's flattened PART_COLS
(scripts/clean_and_parse.py:219). All regexes are compiled at module
import (once per worker process).
"""

from __future__ import annotations

import re
import unicodedata

import pyarrow as pa

# --- gazetteers (reference postprocess.py:5-16, normalize_and_parse.py:34-41)
IL_SET = {
    "adana", "adiyaman", "afyonkarahisar", "ağrı", "amasya", "ankara",
    "antalya", "artvin", "aydın", "aydin", "balıkesir", "bilecik", "bingöl",
    "bitlis", "bolu", "burdur", "bursa", "çanakkale", "canakkale", "çankırı",
    "cankiri", "çorum", "corum", "denizli", "diyarbakır", "diyarbakir",
    "edirne", "elazığ", "elazig", "erzincan", "erzurum", "eskişehir",
    "eskisehir", "gaziantep", "giresun", "gümüşhane", "gumushane", "hakkari",
    "hatay", "ısparta", "isparta", "mersin", "istanbul", "izmir", "kars",
    "kastamonu", "kayseri", "kırklareli", "kirklareli", "kırşehir",
    "kirsehir", "kocaeli", "konya", "kütahya", "kutahya", "malatya",
    "manisa", "kahramanmaraş", "kahramanmaras", "mardin", "muğla", "mugla",
    "muş", "mus", "nevşehir", "nevsehir", "niğde", "nigde", "ordu", "rize",
    "sakarya", "samsun", "siirt", "sinop", "sivas", "tekirdağ", "tekirdag",
    "tokat", "trabzon", "tunceli", "şanlıurfa", "sanliurfa", "uşak", "usak",
    "van", "yalova", "yozgat", "zonguldak", "karabük", "karabuk", "kilis",
    "osmaniye", "düzce", "duzce", "bayburt", "ardahan", "iğdır", "igdir",
    "karaman", "kırıkkale", "kirikkale", "bartın", "bartin",
}

CITY_HINTS = {
    "istanbul", "ankara", "izmir", "bursa", "antalya", "muğla", "aydın",
    "tekirdağ", "kocaeli", "konya", "adana", "mersin", "samsun",
    "eskişehir", "trabzon", "kayseri", "gaziantep",
}
DISTRICT_HINTS = {
    "fethiye", "çeşme", "bodrum", "kartal", "kadıköy", "üsküdar",
    "ataşehir", "bornova", "konak", "mamak", "keçiören", "tepebaşı",
    "odunpazarı", "tarsus", "tekkeköy",
}

TRIGGERS_BUILDING = {
    "apartman", "residence", "rezidans", "işhanı", "iş", "hanı", "otel",
    "hotel", "site", "blok", "plaza", "tower",
}
CUT_WORDS = {"no", "daire", "kat", "mevkii", "il", "ilçe", "ilce"}
_LABEL_WORDS = {"mahalle", "cadde", "sokak", "bulvar"}

# --- abbreviation expansions (normalize_and_parse.py:11-32)
# (needle, pattern, repl): the needle is a literal whose presence is a
# NECESSARY condition for the pattern to match (the pattern contains it
# verbatim outside any optional part) — `needle in s` is a C-level
# precheck that skips the regex scan on rows the abbreviation is absent
# from. Exact: a skipped sub is an identity sub.
_ABBR = [
    ("mah", re.compile(r"\bmah\.?\b"), "mahalle"),
    ("mahallesi", re.compile(r"\bmahallesi\b"), "mahalle"),
    ("mh", re.compile(r"\bmh\.?\b"), "mahalle"),
    ("cad", re.compile(r"\bcad\.?\b"), "cadde"),
    ("caddesi", re.compile(r"\bcaddesi\b"), "cadde"),
    ("cd", re.compile(r"\bcd\.?\b"), "cadde"),
    ("sok", re.compile(r"\bsok\.?\b"), "sokak"),
    ("sokağı", re.compile(r"\bsokağı\b"), "sokak"),
    ("sk", re.compile(r"\bsk\.?\b"), "sokak"),
    ("bul", re.compile(r"\bbulv?\.?\b"), "bulvar"),
    ("bulvarı", re.compile(r"\bbulvarı\b"), "bulvar"),
    ("no", re.compile(r"\bno:?"), "no "),
    ("kapı no", re.compile(r"\bkapı no:?"), "no "),
    ("d", re.compile(r"\bd[.:]\B"), "daire "),
    ("daire", re.compile(r"\bdaire:?"), "daire "),
    ("kat", re.compile(r"\bkat:?"), "kat "),
    ("apt", re.compile(r"\bapt\.?\b"), "apartman"),
    ("ap", re.compile(r"\bap\b"), "apartman"),
]

_RE_SPACES = re.compile(r"\s+")
_RE_PUNCT_DD = re.compile(r"(?<=\D)[\.,](?=\D)")
_RE_PUNCT_DN = re.compile(r"(?<=\D)[\.,](?=\d)")
_RE_PUNCT_ND = re.compile(r"(?<=\d)[,](?=\D)")
_RE_SEP = re.compile(r"[;:|]+")
_RE_D_NUM = re.compile(r"\bd\s+(?=\d)")
_RE_NO_FIX = re.compile(r"\bno\s*[:\-]?\s*(\d+)")
_RE_DOT_STREET = re.compile(r"(\d+)\.(sokak|cadde|mahalle)\b")
_RE_SLASH = re.compile(r"(?<!\d)/(?!\d)")

_RE_NO = re.compile(r"\bno\s*([0-9]+[a-z]?(?:/[0-9a-z]+)?)\b")
_RE_DAIRE = re.compile(r"\bdaire\s*([0-9a-z]+)\b")
_RE_KAT = re.compile(r"\bkat\s*([0-9a-z]+)\b")
_RE_NUM_SOK = re.compile(r"\b(\d+)\s+sokak\b", re.IGNORECASE)
_RE_NUMVAL = re.compile(r"\d+[a-z]?")
_RE_MEVKII = re.compile(r"\b([a-zğüşiöç\-]+)\s+mevkii\b")
_RE_BUILDING = re.compile(
    r"\b(apartman|residence|rezidans|blok|işhanı|iş hanı|plaza|hotel|otel)\b"
)
_RE_WORD = re.compile(r"[a-zğüşiöç\-]+")
_RE_NAME_NO_PREFIX = re.compile(r"^\bno\b\s*\d+[a-z]?\/?\d*\s*")
_RE_NAME_NUM_PREFIX = re.compile(r"^\d+[a-z]?\s*")
_RE_TRAILING_NO = re.compile(r"\bno\b.*$")
_RE_ALPHA_TOKEN = re.compile(r"[a-zçğıöşü\-]+")
_RE_ALPHA_FULL = re.compile(r"[a-zçğıöşü]+")
_RE_ILCE_IL = re.compile(r"[a-zçğıöşü]+/[a-zçğıöşü]+")
_RE_NUMERIC_SOKAK = re.compile(r"\b(\d+)\s+sokak\b")
_RE_MEVKII_BEFORE = re.compile(r"\b([a-zçğıöşü\-]+)\s+mevkii\b")
_RE_MULTISPACE = re.compile(r"\s{2,}")

PART_FIELDS = [
    "mahalle", "cadde", "sokak", "bulvar", "no", "daire", "kat",
    "bina_adi", "mevkii", "il", "ilce",
]

PARTS_TYPE = pa.struct(
    [pa.field(f, pa.string()) for f in PART_FIELDS]
    + [pa.field("confidence", pa.float32())]
)


def _normalize_spaces(text: str) -> str:
    return _RE_SPACES.sub(" ", text).strip()


def clean_text(s: str | None) -> str:
    """Parse-side cleanup mirroring reference
    normalize_and_parse.py:43-77 (NFKC TR-lower, punctuation handling
    that preserves 10/3, abbreviation expansion, no:/d:/kat: repairs)."""
    if s is None:
        s = ""
    s = str(s).replace("İ", "i").replace("I", "ı")
    s = unicodedata.normalize("NFKC", s).lower().replace("̇", "")
    s = _RE_PUNCT_DD.sub(" ", s)
    s = _RE_PUNCT_DN.sub(" ", s)
    s = _RE_PUNCT_ND.sub(" ", s)
    s = _RE_SEP.sub(" ", s)
    for needle, pat, repl in _ABBR:
        if needle in s:
            s = pat.sub(repl, s)
    s = _RE_D_NUM.sub("daire ", s)
    s = _RE_NO_FIX.sub(r"no \1", s)
    s = _RE_DOT_STREET.sub(r"\1 \2", s)
    s = _RE_SLASH.sub(" / ", s)
    return _normalize_spaces(s)


def _following_name_pattern(anchor: str) -> "re.Pattern":
    return re.compile(
        rf"{anchor}\s+([a-zğüşiöç0-9 \-]+?)\s+"
        r"(?=(mahalle|cadde|sokak|bulvar|no|daire|kat|mevkii|apartman"
        r"|hotel|otel|plaza|blok|işhanı|iş hanı|$))"
    )


# the four fixed anchors parse_fields uses, precompiled once — the
# f-string pattern was rebuilt (and re-cache-probed) per row per anchor
_FOLLOWING_NAME_RES = {
    a: _following_name_pattern(a)
    for a in ("mahalle", "cadde", "sokak", "bulvar")
}


def _extract_following_name(text: str, anchor: str) -> str:
    pat = _FOLLOWING_NAME_RES.get(anchor)
    if pat is None:
        pat = _following_name_pattern(anchor)
    m = pat.search(text)
    return _normalize_spaces(m.group(1)) if m else ""


def _guess_city_district(text: str) -> dict[str, str]:
    il = ilce = ""
    pieces = [_normalize_spaces(x) for x in text.split("/")]
    for p in reversed(pieces):
        toks = set(p.split())
        if not il and toks & CITY_HINTS:
            il = sorted(toks & CITY_HINTS)[0]
        if not ilce and toks & DISTRICT_HINTS:
            ilce = sorted(toks & DISTRICT_HINTS)[0]
    out: dict[str, str] = {}
    if il:
        out["il"] = il
    if ilce:
        out["ilce"] = ilce
    return out


def parse_fields(txt: str) -> dict[str, str]:
    """Field extraction over cleaned text (reference
    normalize_and_parse.py:102-158), ASCII keys."""
    parts: dict[str, str] = {}

    m = _RE_NO.search(txt)
    if m:
        parts["no"] = m.group(1).strip()
        if "/" in parts["no"]:
            n, d = parts["no"].split("/", 1)
            if n.isdigit() and d.isdigit():
                parts["no"], parts["daire"] = n, d

    m = _RE_DAIRE.search(txt)
    if m and _RE_NUMVAL.fullmatch(m.group(1)):
        parts.setdefault("daire", m.group(1).strip())

    m = _RE_KAT.search(txt)
    if m and _RE_NUMVAL.fullmatch(m.group(1)):
        parts["kat"] = m.group(1).strip()

    mah = _extract_following_name(txt, "mahalle")
    if mah:
        parts["mahalle"] = mah
    cad = _extract_following_name(txt, "cadde")
    if cad:
        parts["cadde"] = cad

    m = _RE_NUM_SOK.search(txt)
    if m:
        parts["sokak"] = m.group(1)
    else:
        sok = _extract_following_name(txt, "sokak")
        if sok:
            parts["sokak"] = sok

    blv = _extract_following_name(txt, "bulvar")
    if blv:
        parts["bulvar"] = blv

    m = _RE_MEVKII.search(txt)
    if m:
        parts["mevkii"] = m.group(1)

    m = _RE_BUILDING.search(txt)
    if m:
        trigger = m.group(1)
        left = _RE_WORD.findall(txt[: m.start()])
        name = " ".join(left[-2:] + [trigger]).strip()
        name = _RE_NAME_NO_PREFIX.sub("", name).strip()
        name = _RE_NAME_NUM_PREFIX.sub("", name).strip()
        if name:
            parts["bina_adi"] = name

    parts.update(_guess_city_district(txt))
    return parts


# --- postprocess repair pass (reference postprocess.py:26-149) ---------


def _get_before_after(
    label: str, toks: list[str], max_tokens: int = 3, allow_numeric: bool = False
) -> tuple[str, str]:
    if label not in toks:
        return "", ""
    i = toks.index(label)
    b: list[str] = []
    j = i - 1
    while j >= 0 and len(b) < max_tokens:
        w = toks[j]
        if w in CUT_WORDS or w in _LABEL_WORDS:
            break
        if not allow_numeric and any(ch.isdigit() for ch in w):
            break
        b.append(w)
        j -= 1
    before = " ".join(reversed(b)).strip()
    a: list[str] = []
    k = i + 1
    while k < len(toks) and len(a) < max_tokens:
        w = toks[k]
        if w in CUT_WORDS or w in _LABEL_WORDS:
            break
        if not allow_numeric and any(ch.isdigit() for ch in w):
            break
        a.append(w)
        k += 1
    return before, " ".join(a).strip()


def postprocess_parts(normalized: str, parts: dict[str, str]) -> dict[str, str]:
    parts = dict(parts)

    # no "n/d" split + alphabetic daire/kat dropped (postprocess.py:49-60)
    if "no" in parts and "/" in parts["no"]:
        n, d = parts["no"].split("/", 1)
        if n.isdigit() and d.isdigit():
            parts["no"], parts["daire"] = n, d
    if "daire" in parts and not _RE_NUMVAL.fullmatch(str(parts["daire"])):
        parts.pop("daire", None)
    if "kat" in parts and not _RE_NUMVAL.fullmatch(str(parts["kat"])):
        parts.pop("kat", None)

    # sokak starting with "no" (postprocess.py:62-67)
    if parts.get("sokak", "").startswith("no"):
        m = _RE_NUMERIC_SOKAK.search(normalized)
        if m:
            parts["sokak"] = m.group(1)
        else:
            parts.pop("sokak", None)

    # re-extract mahalle/cadde/sokak by token windows (postprocess.py:69-81)
    toks = normalized.split()
    b, a = _get_before_after("mahalle", toks, allow_numeric=False)
    if b:
        parts["mahalle"] = b
    elif a:
        parts["mahalle"] = a
    b, a = _get_before_after("cadde", toks, allow_numeric=False)
    if b:
        parts["cadde"] = b
    elif a:
        parts["cadde"] = a
    b, a = _get_before_after("sokak", toks, allow_numeric=True)
    if b and b.replace("/", "").isdigit():
        parts["sokak"] = b
    elif a and not any(tok.isdigit() for tok in a.split()[:1]):
        # per reference postprocess.py:79-81 the guard is on the whole
        # first token being numeric, not per-character
        parts["sokak"] = a

    # building name with 2-token left context (postprocess.py:83-101)
    for i, t in enumerate(toks):
        if t in TRIGGERS_BUILDING:
            name_tokens = [
                toks[j]
                for j in range(i - 2, i)
                if j >= 0
                and _RE_ALPHA_TOKEN.fullmatch(toks[j])
                and toks[j] not in CUT_WORDS
            ]
            name_tokens.append(t)
            cand = " ".join(name_tokens).strip()
            cand = _RE_NAME_NO_PREFIX.sub("", cand).strip()
            cand = _RE_NAME_NUM_PREFIX.sub("", cand).strip()
            prev = parts.get("bina_adi", "")
            if cand and (
                prev in ("", t)
                or prev.startswith(("no", "0", "1", "2", "3", "4", "5",
                                    "6", "7", "8", "9"))
            ):
                parts["bina_adi"] = cand
            break

    m = _RE_MEVKII_BEFORE.search(normalized)
    if m:
        parts["mevkii"] = m.group(1)

    # province/district from trailing 8 tokens (postprocess.py:107-122)
    tail = toks[-8:]
    found = False
    for w in reversed(tail):
        if "/" in w and _RE_ILCE_IL.fullmatch(w):
            x, y = w.split("/", 1)
            if y in IL_SET and x not in IL_SET:
                parts["il"], parts["ilce"] = y, x
                found = True
                break
            if x in IL_SET and y not in IL_SET:
                parts["il"], parts["ilce"] = x, y
                found = True
                break
    if not found:
        for k in range(len(tail) - 1, 0, -1):
            x, y = tail[k - 1], tail[k]
            if _RE_ALPHA_FULL.fullmatch(x) and _RE_ALPHA_FULL.fullmatch(y):
                if y in IL_SET and x not in IL_SET:
                    parts["il"], parts["ilce"] = y, x
                    break

    # trailing-"no" trim in name fields (postprocess.py:144-147)
    for key in ("mahalle", "cadde", "sokak"):
        if parts.get(key):
            parts[key] = _RE_TRAILING_NO.sub("", parts[key]).strip()
            parts[key] = _RE_MULTISPACE.sub(" ", parts[key])

    # confidence weights .22/.06 (postprocess.py:124-132)
    score = 0.22 * sum(bool(parts.get(k)) for k in
                       ("mahalle", "cadde", "sokak", "no"))
    if parts.get("daire"):
        score += 0.06
    if parts.get("kat"):
        score += 0.06
    if parts.get("bina_adi") or parts.get("mevkii"):
        score += 0.06
    if parts.get("il"):
        score += 0.06
    out = {k: v for k, v in parts.items() if v}
    out["_confidence"] = round(min(1.0, score), 2)
    return out


def normalize_and_parse(raw: str | None) -> tuple[str, dict]:
    """clean -> parse -> postprocess; returns (cleaned_text, parts)."""
    txt = clean_text(raw)
    parts = parse_fields(txt)
    parts = postprocess_parts(txt, parts)
    return txt, parts


def make_parse_batch_fn(text_col: str, clean_col: str = "addr_clean",
                        parts_col: str = "parts"):
    """Batch kernel: adds the cleaned-text column and an Arrow struct
    column of parsed fields (+confidence). Struct stays packed until a
    sink flattens it (SURVEY §1.3)."""

    def parse_batch(batch: pa.Table) -> pa.Table:
        values = batch.column(text_col).to_pylist()
        cleaned: list[str] = []
        structs: list[dict] = []
        for v in values:
            txt, parts = normalize_and_parse(v)
            cleaned.append(txt)
            structs.append(
                {f: parts.get(f) for f in PART_FIELDS}
                | {"confidence": float(parts.get("_confidence", 0.0))}
            )
        for col in (clean_col, parts_col):
            if col in batch.column_names:
                batch = batch.drop_columns([col])
        batch = batch.append_column(clean_col, pa.array(cleaned, pa.string()))
        batch = batch.append_column(parts_col, pa.array(structs, PARTS_TYPE))
        return batch

    return parse_batch


def parse_dataset(ds, text_col: str, clean_col: str = "addr_clean",
                  parts_col: str = "parts", batch_size: int | None = None):
    return ds.map_batches(
        make_parse_batch_fn(text_col, clean_col, parts_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def flatten_parts(ds, parts_col: str = "parts"):
    """Struct -> loose columns (sink-side flattening, reference
    scripts/clean_and_parse.py:249-262 keeps them as columns)."""

    def _flat(batch: pa.Table) -> pa.Table:
        st = batch.column(parts_col)
        flat = pa.Table.from_arrays(
            st.combine_chunks().flatten(),
            names=[f.name for f in PARTS_TYPE],
        )
        batch = batch.drop_columns([parts_col])
        for name in flat.column_names:
            batch = batch.append_column(name, flat.column(name))
        return batch

    return ds.map_batches(_flat, batch_format="pyarrow")
