"""Property-based (hypothesis) tests for the pure kernels: metric and
algebraic invariants that example-based golden vectors cannot cover —
symmetry, identity, triangle-style bounds, oracle equality against
independent brute-force implementations, and idempotence of the text
normalizers. All deterministic (hypothesis derandomized via explicit
settings) so CI never flakes on example discovery."""

from __future__ import annotations

import re

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st

from raylink import textkernels as tk
from raylink.blocking import alnum_lower, first_digits, geohash_encode

_SETTINGS = dict(max_examples=300, deadline=None, derandomize=True,
                 suppress_health_check=[HealthCheck.filter_too_much])

# Turkish-flavoured alphabet keeps the search space where the engine
# actually operates (casing/diacritic edge cases), plus separators
_ALPHA = "abcçdefgğhıijklmnoöprsştuüvyzABCÇDEFGĞHIİJKLMNOÖPRSŞTUÜVYZ0123456789 .-:/"
_texts = st.text(alphabet=_ALPHA, max_size=40)


def _lev_brute(a: str, b: str) -> int:
    # classic O(mn) DP — independent of the bit-parallel kernel
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _lcs_brute(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb
                       else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


@given(_texts, _texts)
@settings(**_SETTINGS)
def test_levenshtein_matches_dp_and_metric_axioms(a, b):
    d = tk.levenshtein(a, b)
    assert d == _lev_brute(a, b)
    assert d == tk.levenshtein(b, a)                       # symmetry
    assert (d == 0) == (a == b)                            # identity
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))  # bounds


@given(_texts, _texts, _texts)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_levenshtein_triangle_inequality(a, b, c):
    assert tk.levenshtein(a, c) <= tk.levenshtein(a, b) + \
        tk.levenshtein(b, c)


@given(_texts, _texts)
@settings(**_SETTINGS)
def test_lcs_matches_dp(a, b):
    got = tk.lcs_length(a, b)
    assert got == _lcs_brute(a, b)
    assert got == tk.lcs_length(b, a)
    assert got <= min(len(a), len(b))


@given(_texts, _texts)
@settings(**_SETTINGS)
def test_token_set_ratio_set_semantics_and_range(a, b):
    s = tk.token_set_ratio(a, b)
    assert 0.0 <= s <= 100.0
    assert s == tk.token_set_ratio(b, a)                   # symmetry
    # set semantics: duplicate tokens and token order are irrelevant
    toks = a.split()
    if toks:
        shuffled = " ".join(reversed(toks + toks[:1]))
        assert tk.token_set_ratio(shuffled, b) == s
    # equal token SETS score a perfect 100 regardless of surface form
    if set(a.split()) == set(b.split()) and a.split():
        assert s == 100.0


@given(_texts, _texts, st.floats(min_value=0, max_value=100))
@settings(**_SETTINGS)
def test_token_set_ratio_cutoff_is_exact(a, b, cutoff):
    """score_cutoff prunes IFF the true score is below the cutoff —
    the monotone-prune invariant the flagship's threshold push-down
    relies on (match.py score_cutoff=t_min)."""
    ta, tb = set(a.split()), set(b.split())
    full = tk.token_set_ratio_from_sets(ta, tb)
    pruned = tk.token_set_ratio_from_sets(ta, tb, score_cutoff=cutoff)
    if full >= cutoff:
        assert pruned == full
    else:
        assert pruned is None or pruned == full


@given(_texts)
@settings(**_SETTINGS)
def test_ratio_identity_and_empty(a):
    assert tk.ratio(a, a) == 100.0
    if a:
        assert tk.ratio(a, "") == 0.0


@given(_texts, _texts)
@settings(**_SETTINGS)
def test_jaro_winkler_range_symmetry_identity(a, b):
    s = tk.jaro_winkler_similarity(a, b)
    assert 0.0 <= s <= 1.0
    assert s == tk.jaro_winkler_similarity(b, a)
    assert tk.jaro_winkler_similarity(a, a) == 1.0


@given(_texts)
@settings(**_SETTINGS)
def test_tr_safe_lower_idempotent(s):
    once = tk.tr_safe_lower(s)
    assert tk.tr_safe_lower(once) == once
    # the reference's pinned semantics: no dotted-İ or combining dot
    # survives (addresskit/match.py:42-47)
    assert "İ" not in once and "̇" not in once


@given(_texts)
@settings(**_SETTINGS)
def test_fold_tr_diacritics_idempotent_and_ascii_letters(s):
    once = tk.fold_tr_diacritics(tk.tr_safe_lower(s))
    assert tk.fold_tr_diacritics(once) == once
    assert not set(once) & set("çğışöü")


@given(_texts)
@settings(**_SETTINGS)
def test_alnum_lower_idempotent_and_charset(s):
    once = alnum_lower(s)
    assert alnum_lower(once) == once
    assert re.fullmatch(r"[a-z0-9ğüşöçı]*", once)


@given(_texts)
@settings(**_SETTINGS)
def test_first_digits_matches_spec(s):
    got = first_digits(s)
    runs = re.findall(r"\d+", s)
    assert got == (runs[0] if runs else "")


@given(st.floats(min_value=-90, max_value=90),
       st.floats(min_value=-180, max_value=180),
       st.integers(min_value=1, max_value=12))
@settings(**_SETTINGS)
def test_geohash_prefix_nesting(lat, lon, p):
    """Truncating a precision-(p+1) geohash to p chars equals encoding
    at p — the MSB-aligned quantizer property coarser blocking keys
    rely on (raylink/blocking.py geohash_encode docstring)."""
    import numpy as np

    la, lo = np.array([lat]), np.array([lon])
    fine = geohash_encode(la, lo, min(12, p + 1))[0]
    coarse = geohash_encode(la, lo, p)[0]
    assert fine[:p] == coarse
    assert len(coarse) == p


@given(st.text(alphabet=_ALPHA, max_size=60))
@settings(**_SETTINGS)
def test_normalize_text_idempotent(s):
    """normalize(normalize(x)) == normalize(x): the canonical form is
    a fixpoint (stopword/abbreviation/punct passes cannot reintroduce
    material they remove)."""
    from raylink.normalize import normalize_text

    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.text(max_size=30))
@settings(**_SETTINGS)
def test_unmojibake_idempotent_on_arbitrary_unicode(s):
    once = tk.maybe_unmojibake(s)
    assert isinstance(once, str)
    assert tk.maybe_unmojibake(once) == once
