"""Low-level text kernels: Turkish-safe casefolding, mojibake repair,
diacritic folding, and string-similarity scorers.

Semantics mirror the reference implementations (cited per function) but
are re-implemented from scratch; the similarity scorers reproduce the
public RapidFuzz definitions (Indel/LCS-based ``ratio``,
``token_set_ratio``, ``partial_ratio``) with pure-Python bit-parallel
algorithms (Hyyrö 2004 / Myers 1999), since rapidfuzz itself is not
available in this environment.
"""

from __future__ import annotations

import unicodedata

__all__ = [
    "tr_safe_lower",
    "maybe_unmojibake",
    "fold_tr_diacritics",
    "lcs_length",
    "indel_ratio",
    "ratio",
    "token_set_ratio",
    "token_sort_ratio",
    "partial_ratio",
    "levenshtein",
    "levenshtein_ratio",
    "jaro_similarity",
    "jaro_winkler_similarity",
    "SCORERS",
    "get_scorer",
]


# ---------------------------------------------------------------------------
# Casefolding / encoding repair (reference: addresskit/normalize.py:40-79)
# ---------------------------------------------------------------------------

def tr_safe_lower(s: str) -> str:
    """Turkish-safe lowercase: İ->I before .lower() (so İ->i, not i̇),
    strip combining dot U+0307, NFC-normalize.

    Mirrors ``tr_safe_lower`` (reference addresskit/normalize.py:40-46).
    Generic ``str.lower``/``pc.utf8_lower`` is NOT equivalent for dotted-I.
    """
    if not s:
        return s
    if s.isascii():
        # exact fast path: no İ/U+0307 possible, NFC is identity
        return s.lower()
    s = s.replace("İ", "I").replace("̇", "")
    return unicodedata.normalize("NFC", s.lower())


def maybe_unmojibake(s: str) -> str:
    """Repair UTF-8 text mis-decoded as latin-1/cp1252 (telltale Ã/Ä/Å),
    mirroring reference addresskit/normalize.py:49-58."""
    if s and ("Ã" in s or "Ä" in s or "Å" in s):
        try:
            return s.encode("latin1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return s
    return s


_TR_FOLD = str.maketrans(
    {
        "ç": "c", "ğ": "g", "ı": "i", "ş": "s", "ö": "o", "ü": "u",
        "Ç": "c", "Ğ": "g", "İ": "i", "Ö": "o", "Ş": "s", "Ü": "u",
    }
)


def fold_tr_diacritics(s: str) -> str:
    """çğışöü (and uppercase) -> ASCII, mirroring reference
    addresskit/normalize.py:61-79."""
    return s.translate(_TR_FOLD)


# ---------------------------------------------------------------------------
# Bit-parallel sequence kernels.
#
# Python's unbounded ints double as arbitrary-width bit-vectors, so the
# 64-bit-block algorithms work for any string length with explicit masking.
# ---------------------------------------------------------------------------

def _pattern_masks(a: str) -> dict[str, int]:
    pm: dict[str, int] = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    return pm


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence (bit-parallel,
    Hyyrö-style: S' = (S + u) | (S - u) with u = S & M)."""
    if not a or not b:
        return 0
    if len(a) > len(b):  # fewer bits when the mask side is the shorter one
        a, b = b, a
    m = len(a)
    mask = (1 << m) - 1
    pm = _pattern_masks(a)
    s = mask
    for ch in b:
        mch = pm.get(ch)
        if mch is None:
            continue
        u = s & mch
        s = ((s + u) | (s - u)) & mask
    # zero bits of S mark matched pattern positions
    return m - bin(s).count("1")


def indel_ratio(a: str, b: str) -> float:
    """Normalized Indel similarity in [0, 1]:
    1 - indel_distance/(len(a)+len(b)) == 2*LCS/(len(a)+len(b))."""
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 1.0
    return 2.0 * lcs_length(a, b) / (la + lb)


def ratio(a: str, b: str) -> float:
    """``fuzz.ratio`` semantics: 100 * normalized Indel similarity
    (reference uses rapidfuzz.fuzz.ratio, addresskit/match.py:109-115)."""
    return 100.0 * indel_ratio(a, b)


def _split_tokens(s: str) -> list[str]:
    return s.split()


def token_set_ratio(a: str, b: str) -> float:
    """RapidFuzz ``token_set_ratio``: compare sorted-unique token
    intersection against each side's (intersection + difference) join and
    the two joins against each other; best of the three Indel ratios.

    This is the reference's default scorer (configs/match.yaml:5,
    addresskit/match.py:110-115).
    """
    return token_set_ratio_from_sets(set(_split_tokens(a)),
                                     set(_split_tokens(b)))


def token_set_ratio_from_sets(ta: set, tb: set,
                              score_cutoff: float | None = None):
    """``token_set_ratio`` over PRE-TOKENIZED unique-token sets — the
    hot-path variant for pairwise scoring where each row is compared
    against many others (avoids re-splitting/re-hashing per pair).
    Identical result to joining the sorted sets and comparing.

    Two exact accelerations over the naive three-join formulation:

    - COMMON-PREFIX TRIM: the two cross joins share the sorted
      intersection as a literal prefix, and ``LCS(P+x, P+y) =
      len(P) + LCS(x, y)``, so the bit-parallel LCS runs over only the
      difference tokens instead of the full joined strings.
    - ``score_cutoff``: when set, returns ``None`` if the UPPER BOUND
      ``LCS <= prefix + min(len(da), len(db))`` already caps the score
      below the cutoff — the LCS is skipped entirely. ``None`` is
      returned ONLY when the exact score is provably < score_cutoff;
      otherwise the exact score is returned (never approximated).
    """
    if not ta and not tb:
        return 100.0
    inter = ta & tb
    diff_ab = ta - tb
    diff_ba = tb - ta
    if inter and (not diff_ab or not diff_ba):
        return 100.0
    sect = " ".join(sorted(inter))
    da = " ".join(sorted(diff_ab))
    db = " ".join(sorted(diff_ba))
    ls = len(sect)
    # at this point either inter is empty (ls == 0) or BOTH diffs are
    # non-empty (the subset case returned 100 above), so the joined
    # strings are sect[ + " " + diff] with no dangling separator
    pref = ls + 1 if ls else 0
    lab = pref + len(da)
    lba = pref + len(db)
    best = 0.0
    if ls:
        # sect vs each join has a closed form: indel dist = len - ls
        best = max(
            1.0 - (lab - ls) / (ls + lab),
            1.0 - (lba - ls) / (ls + lba),
        )
    if score_cutoff is not None:
        ub = 100.0 * max(
            best, 2.0 * (pref + min(len(da), len(db))) / (lab + lba))
        if ub < score_cutoff:
            return None
    lcs = pref + lcs_length(da, db)
    best = max(best, 2.0 * lcs / (lab + lba))
    return 100.0 * best


def token_sort_ratio(a: str, b: str) -> float:
    """RapidFuzz ``token_sort_ratio``: Indel ratio of the
    whitespace-sorted token joins."""
    return ratio(" ".join(sorted(_split_tokens(a))),
                 " ".join(sorted(_split_tokens(b))))


def partial_ratio(a: str, b: str) -> float:
    """Best ``ratio`` between the shorter string and any same-length
    substring window of the longer one (plus the trailing shorter
    windows), approximating rapidfuzz ``fuzz.partial_ratio``."""
    if len(a) > len(b):
        a, b = b, a
    m, n = len(a), len(b)
    if m == 0:
        return 100.0 if n == 0 else 0.0
    if m == n:
        return ratio(a, b)
    best = 0.0
    for start in range(0, n - m + 1):
        r = indel_ratio(a, b[start:start + m])
        if r > best:
            best = r
            if best == 1.0:
                return 100.0
    return 100.0 * best


def levenshtein(a: str, b: str) -> int:
    """Edit distance (unit costs), Myers 1999 bit-parallel algorithm with
    arbitrary-precision masks."""
    if not a:
        return len(b)
    if not b:
        return len(a)
    m = len(a)
    mask = (1 << m) - 1
    high = 1 << (m - 1)
    pm = _pattern_masks(a)
    vp = mask
    vn = 0
    dist = m
    for ch in b:
        x = pm.get(ch, 0) | vn
        d0 = (((x & vp) + vp) ^ vp) | x
        hp = vn | (~(d0 | vp) & mask)
        hn = d0 & vp
        if hp & high:
            dist += 1
        if hn & high:
            dist -= 1
        hp = ((hp << 1) | 1) & mask
        hn = (hn << 1) & mask
        vp = hn | (~(d0 | hp) & mask)
        vn = hp & d0
    return dist


def levenshtein_ratio(a: str, b: str) -> float:
    """100 * (1 - lev/max(len)) — the SQL-friendly normalized form
    (DuckDB: ``(1 - levenshtein(a,b)/greatest(len(a),len(b))) * 100``)."""
    la, lb = len(a), len(b)
    longest = la if la > lb else lb
    if longest == 0:
        return 100.0
    return (1.0 - levenshtein(a, b) / longest) * 100.0


def jaro_similarity(a: str, b: str) -> float:
    """Standard Jaro similarity in [0, 1]."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_matched = [False] * lb
    a_matched = [False] * la
    matches = 0
    for i, ch in enumerate(a):
        lo = i - window if i - window > 0 else 0
        hi = i + window + 1 if i + window + 1 < lb else lb
        for j in range(lo, hi):
            if not b_matched[j] and b[j] == ch:
                a_matched[i] = True
                b_matched[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_matched[i]:
            while not b_matched[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    t = transpositions // 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler_similarity(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler in [0, 1]: common-prefix (<=4) boost applied when the
    Jaro score exceeds 0.7 (the RapidFuzz/DuckDB convention)."""
    sim = jaro_similarity(a, b)
    if sim > 0.7:
        prefix = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            prefix += 1
        sim += prefix * prefix_weight * (1.0 - sim)
    return sim


def _jw_100(a: str, b: str) -> float:
    return 100.0 * jaro_winkler_similarity(a, b)


# Scorer registry with default fallback, mirroring the reference's
# registry-with-fallback (addresskit/match.py:109-115); extended with the
# Jaro-Winkler / Levenshtein family per the north-star spec.
SCORERS = {
    "token_set_ratio": token_set_ratio,
    "token_sort_ratio": token_sort_ratio,
    "ratio": ratio,
    "partial_ratio": partial_ratio,
    "levenshtein": levenshtein_ratio,
    "jaro_winkler": _jw_100,
}


def get_scorer(name: str):
    """Name -> scorer fn; unknown names fall back to token_set_ratio
    (reference addresskit/match.py:115)."""
    return SCORERS.get(str(name).lower(), token_set_ratio)
