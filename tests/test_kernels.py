"""Unit tests for the pure kernels: similarity scorers (vs brute-force
DP and vs DuckDB's implementations), TR casefolding, normalizer step
order, parser golden vectors, blocking DSL, confidence combination."""

import math
import random
import re

import duckdb
import pytest

from raylink import textkernels as tk
from raylink.blocking import alnum_lower, first_digits, make_block_key, phonetic_token
from raylink.normalize import normalize_text
from raylink.parse import clean_text, normalize_and_parse
from raylink.scoring import (
    combine_scores,
    digits_score,
    extract_numbers,
    geo_score_km,
    haversine_km,
)


def _lcs_brute(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[-1][-1]


def _lev_brute(a, b):
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[-1]


def test_bitparallel_vs_bruteforce():
    rng = random.Random(7)
    alpha = "abcdeğüş 0123"
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 90)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 90)))
        assert tk.lcs_length(a, b) == _lcs_brute(a, b)
        assert tk.levenshtein(a, b) == _lev_brute(a, b)


def test_levenshtein_and_jw_match_duckdb():
    con = duckdb.connect()
    rng = random.Random(11)
    alpha = "abcdef 123"
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 25)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(1, 25)))
        lev, jw = con.execute(
            "SELECT levenshtein(?, ?), jaro_winkler_similarity(?, ?)",
            [a, b, a, b],
        ).fetchone()
        assert tk.levenshtein(a, b) == lev
        assert tk.jaro_winkler_similarity(a, b) == pytest.approx(jw, abs=1e-12)


def test_ratio_identities():
    assert tk.ratio("", "") == 100.0
    assert tk.ratio("abc", "abc") == 100.0
    assert tk.ratio("abc", "") == 0.0
    assert tk.token_set_ratio("a b c", "c b a") == 100.0
    # intersection non-empty + one diff empty -> 100 (rapidfuzz rule)
    assert tk.token_set_ratio("a b", "a b extra") == 100.0
    assert tk.partial_ratio("abc", "xxabcxx") == 100.0


def _token_set_ratio_naive(ta: set, tb: set) -> float:
    """Three-join token_set_ratio with NO trim/cutoff — the definition
    the accelerated kernel must reproduce bit-for-bit."""
    if not ta and not tb:
        return 100.0
    inter, dab, dba = ta & tb, ta - tb, tb - ta
    if inter and (not dab or not dba):
        return 100.0
    sect = " ".join(sorted(inter))
    jab = (sect + " " + " ".join(sorted(dab))).strip()
    jba = (sect + " " + " ".join(sorted(dba))).strip()
    ls, lab, lba = len(sect), len(jab), len(jba)
    best = 0.0
    if ls:
        best = max(1.0 - (lab - ls) / (ls + lab),
                   1.0 - (lba - ls) / (ls + lba))
    best = max(best, tk.indel_ratio(jab, jba))
    return 100.0 * best


def test_token_set_ratio_trim_and_cutoff():
    """The prefix-trimmed kernel is bit-equal to the naive three-join
    formulation, and score_cutoff returns None ONLY when the exact
    score is provably below the cutoff (never a wrong value)."""
    rng = random.Random(31)
    words = ["mahallesi", "caddesi", "sokak", "no", "daire", "kat",
             "akasya", "güven", "bodrum", "muğla", "12", "3", "45a",
             "apt", "sitesi", "b", "yolu", "çınar"]
    cases = [(set(), set()), ({"a"}, set()), ({"a"}, {"a"}),
             ({"a", "b"}, {"b", "c"})]
    for _ in range(3000):
        ta = set(rng.sample(words, rng.randint(0, 8)))
        tb = set(ta)
        for w in list(tb):
            if rng.random() < 0.35:
                tb.discard(w)
        tb.update(rng.sample(words, rng.randint(0, 3)))
        cases.append((ta, tb))
    for ta, tb in cases:
        exact = _token_set_ratio_naive(ta, tb)
        assert tk.token_set_ratio_from_sets(ta, tb) == exact
        assert tk.token_set_ratio(" ".join(sorted(ta)),
                                  " ".join(sorted(tb))) == exact
        for cut in (30.0, 70.0, 90.0):
            got = tk.token_set_ratio_from_sets(ta, tb, score_cutoff=cut)
            if got is None:
                assert exact < cut
            else:
                assert got == exact


def test_tr_safe_lower():
    # reference addresskit/normalize.py:40-46 behavior
    assert tk.tr_safe_lower("İSTANBUL") == "istanbul"
    assert tk.tr_safe_lower("IĞDIR") == "iğdir"
    assert tk.tr_safe_lower("") == ""
    assert tk.fold_tr_diacritics("çğışöüÇĞİÖŞÜ") == "cgisoucgiosu"


def test_unmojibake_roundtrip():
    s = "muğla çınarlı"
    broken = s.encode("utf-8").decode("latin1")
    assert tk.maybe_unmojibake(broken) == s
    assert tk.maybe_unmojibake("clean text") == "clean text"


def test_normalize_text_pipeline():
    # abbreviation expansion + punctuation strip + collapse
    assert (
        normalize_text("Akasya MAH., Güven CAD. No: 12/3")
        == "akasya mahalle guven cadde no 12 3"
    )
    # mojibake repaired then normalized
    broken = "Akasya Mahallesi Çınar".encode("utf-8").decode("latin1")
    assert normalize_text(broken) == "akasya mahalle cinar"
    # stopword removal honors config
    cfg = {"lowercase": True, "stopwords": ["ve"], "strip_extra_spaces": True}
    assert normalize_text("a ve b", cfg) == "a b"
    # broken regex silently skipped (reference normalize.py:104-110)
    cfg = {"regex": [{"pattern": "([", "repl": "x"}], "lowercase": True}
    assert normalize_text("ABC", cfg) == "abc"


def test_parser_golden_vectors():
    # no 12/3 split (normalize_and_parse.py:108-114)
    _, p = normalize_and_parse("Akasya mah. Güven cad. no 12/3 kat 2 Bodrum/Muğla")
    assert p["no"] == "12"
    assert p["daire"] == "3"
    assert p["kat"] == "2"
    assert p["mahalle"] == "akasya"
    assert p["cadde"] == "güven"
    assert p["il"] == "muğla"
    assert p["ilce"] == "bodrum"
    # numeric street priority (normalize_and_parse.py:131-136)
    _, p = normalize_and_parse("yali mah 864.sokak no:5")
    assert p["sokak"] == "864"
    assert p["no"] == "5"
    # alphabetic daire dropped (postprocess.py:54-56)
    _, p = normalize_and_parse("x mahalle y sokak no 3 daire oria")
    assert "daire" not in p
    # building trigger with left context (postprocess.py:86-101)
    _, p = normalize_and_parse("akasya mahalle defne apartman no 7 istanbul")
    assert "apartman" in p.get("bina_adi", "")
    # province from trailing tokens (postprocess.py:108-122)
    _, p = normalize_and_parse("guzel mahalle deniz sokak no 4 fethiye mugla")
    assert p["il"] == "mugla"
    assert p["ilce"] == "fethiye"
    assert 0.0 <= p["_confidence"] <= 1.0


def test_clean_text_repairs():
    assert clean_text("No:15") == "no 15"
    assert clean_text("864.sokak") == "864 sokak"
    assert clean_text("d 1") == "daire 1"
    assert clean_text("İstanbul") == "istanbul"


def test_clean_text_reference_deviations():
    """PARITY.md deviations #10/#11 (VERDICT r3 #4): pin the two
    deliberate divergences from the reference's ABBR table
    (normalize_and_parse.py:26-28) with the reference's LITERAL rules
    reproduced inline, so the deviation is visible in the diff of
    expected values, not just prose."""
    import re

    def ref_abbr(s: str) -> str:
        # the two reference rules the repo deviates from, verbatim
        s = re.sub(r"\bd[.:]\b", "daire ", s)
        s = re.sub(r"\bk:?", "kat ", s)
        return re.sub(r"\s+", " ", s).strip()

    # 1) the reference's \bk:? rule mangles every k-initial word —
    #    including its own 'kat' keyword — which is why we omit it
    assert ref_abbr("kartal k 3") == "kat artal kat 3"
    assert ref_abbr("kat 2") == "kat at 2"
    assert clean_text("kartal k 3") == "kartal k 3"
    # cost of omitting it: a bare floor marker stays unexpanded
    assert clean_text("k:2") == "k 2"

    # 2) d[.:] — the punctuation pass both pipelines run FIRST already
    #    rewrites the attached/detached forms identically; the only
    #    reachable difference is a trailing "d." (EOS), where the
    #    repo's \B expands and the reference's \b does not
    for same in ("d.5 apt", "d. 5 apt", "d:3", "d: 3"):
        assert clean_text(same).startswith("daire ")
    assert clean_text("d.") == "daire"          # repo: \B fires at EOS
    assert ref_abbr("d.") == "d."               # reference: \b cannot


def test_blocking_dsl():
    assert alnum_lower("Ak-as YA12!") == "akasya12"
    assert first_digits("no 12 d 3") == "12"
    assert first_digits("abc") == ""
    row = {"t": "akasya mahalle no 12"}
    assert make_block_key(row, "t", "prefix8") == "akasyama"
    assert make_block_key(row, "t", "digits+prefix6") == "12|akasya"
    assert (
        make_block_key({"il": "Muğla", "ilce": "Bodrum", "t": "x"}, "t",
                       "province+district")
        == "muğla|bodrum"
    )
    # empty mode = single global bucket, allowed only when explicit
    assert make_block_key(row, "t", "") == ""
    with pytest.raises(ValueError):
        make_block_key(row, "t", "", allow_single_bucket=False)
    assert phonetic_token("akasya mahalle") == "aksy"


def test_confidence_kernels():
    assert extract_numbers("no 12 d 3") == {"12", "3"}
    assert digits_score("no 12", "blok 12") == 100.0
    assert digits_score("no 12", "no 13") == 0.0
    assert digits_score("abc", "no 13") == 0.0
    # haversine: Istanbul -> Ankara ~ 349-352 km
    d = haversine_km(41.0082, 28.9784, 39.9334, 32.8597)
    assert 340 < d < 360
    assert geo_score_km(0.0) == 100.0
    assert geo_score_km(1.5) == 0.0
    assert geo_score_km(0.75) == pytest.approx(50.0)
    assert geo_score_km(None) == 0.0
    # weight renormalization over PRESENT components (confidence.py:40-60)
    assert combine_scores(80.0) == 80.0
    assert combine_scores(80.0, 100.0, None, 0.8, 0.2, 0.2) == pytest.approx(
        round((80 * 0.8 + 100 * 0.2) / 1.0, 2))
    # absent geo: text/digits weights rescale to .8/.15 of .95
    got = combine_scores(90.0, 100.0, None, 0.8, 0.15, 0.05)
    want = round(90.0 * (0.8 / 0.95) + 100.0 * (0.15 / 0.95), 2)
    assert got == want
    got = combine_scores(90.0, 100.0, 50.0, 0.8, 0.15, 0.05)
    assert got == round(90 * 0.8 + 100 * 0.15 + 50 * 0.05, 2)


def test_abbr_needle_precheck_is_necessary_condition():
    """The literal-needle precheck added in round 4 skips a regex sub
    when ``needle not in s``. That is an identity skip ONLY if needle
    presence is a necessary condition for the pattern to match — the
    needle must appear verbatim in the pattern outside any optional
    part. Verify the implication pat.search(s) => needle in s over an
    adversarial corpus (needles at word boundaries, glued, with
    dots/colons, Turkish letters, partial prefixes) and random fuzz."""
    import itertools
    import random as _random

    from raylink.normalize import get_normalizer
    from raylink.parse import _ABBR

    rules = list(_ABBR) + list(get_normalizer().abbrev_rules)
    assert rules, "no abbreviation rules compiled"

    pieces = [
        "mah", "mah.", "mahx", "xmah", "mahallesi", "mh", "cad", "cad.",
        "caddesi", "cd", "sok", "sok.", "sokağı", "sk", "sk.", "bul",
        "bulv", "bulv.", "bulvarı", "no", "no:", "kapı no:", "kapı",
        "d", "d.", "d:", "daire", "daire:", "kat", "kat:", "k:", "apt",
        "apt.", "ap", "apx", "1", "a", "ğ", "ı", ".", ":", "",
    ]
    corpus = [" ".join(p) for p in itertools.product(pieces, repeat=2)]
    corpus += ["".join(p) for p in itertools.product(pieces, repeat=2)]
    rng = _random.Random(42)
    alphabet = "mahcdsokbulvrıtğpn .:x1"
    corpus += ["".join(rng.choice(alphabet) for _ in range(20))
               for _ in range(2000)]

    for s in corpus:
        for needle, pat, _repl in rules:
            if pat.search(s):
                assert needle in s, (needle, pat.pattern, s)


def test_blocking_mode_missing_n_raises_config_error():
    """Modes spelled without their size suffix crash the reference
    with a bare IndexError (blocking.py:28,32); we raise a ValueError
    that names the mode — in the row builder AND the batch kernel."""
    import pyarrow as pa

    from raylink.blocking import make_block_key_batch_fn

    row = {"t": "akasya mahalle no 12"}
    for mode in ("prefix", "digits+prefix", "geohash",
                 "phonetic+prefix"):
        with pytest.raises(ValueError, match="size suffix"):
            make_block_key(row, "t", mode)
    fn = make_block_key_batch_fn("t", "digits+prefix")
    with pytest.raises(ValueError, match="size suffix"):
        fn(pa.table({"t": ["abc 12"]}))


def test_dead_dotted_abbreviation_keys_parity():
    """PARITY #12: abbreviation keys ending in '.' compile to
    \\b<src>\\.\\b, and \\b after the dot needs a following WORD char —
    so 'cd. ' / 'mah. ' (before space/end) never match, but 'mah.5'
    DOES, in BOTH engines (the reference builds the identical pattern,
    addresskit/normalize.py:118-122)."""
    # the reference's literal rule, reproduced inline: no expansion
    # before a space, expansion when the dot abuts a word char
    assert (re.sub(r"\bcd\.\b", "cadde", "istiklal cd. no 5")
            == "istiklal cd. no 5")
    assert (re.sub(r"\bmah\.\b", "mahalle", "akasya mah.5 x")
            == "akasya mahalle5 x")
    # ours behaves identically: 'cd.' has no dotless twin in the
    # default config, so the token survives (punct-stripped to 'cd')
    assert normalize_text("istiklal cd. no:5") == "istiklal cd no 5"
    # dotted keys WITH a dotless twin are rescued by the twin
    assert normalize_text("akasya mah. guven") == "akasya mahalle guven"
    # the abutting case: the DOTTED rule itself fires
    assert normalize_text("akasya mah.5 guven") == "akasya mahalle5 guven"
    # and the generated SQL twin agrees on both cases (its dotted
    # patterns were double-escaped — matching a literal backslash,
    # never the text — until code-review r5)
    import duckdb

    from __ray_entry__ import _norm_sql_expr

    for s in ("akasya mah.5 guven", "akasya mah. guven",
              "istiklal cd. no:5", "yildiz cad.7 sk. 2"):
        got = duckdb.sql(
            f"SELECT {_norm_sql_expr(repr(s))}").fetchone()[0]
        assert got == normalize_text(s), s


def test_parse_word_class_dotless_i_parity():
    """PARITY #13: the reference's bina_adi/mevkii word classes are
    [a-zğüşiöç\\-] — they omit dotless 'ı'
    (addresskit/preprocessing/normalize_and_parse.py:86,139,146), so
    'yalı' splits into 'yal' + nothing. We reproduce that bit-for-bit
    (parse F1 parity beats linguistic correctness here)."""
    # the reference's literal left-context rule
    assert re.findall(r"[a-zğüşiöç\-]+", "yalı apartman") == \
        ["yal", "apartman"]
    _, parts = normalize_and_parse("yalı apartman no 3")
    assert parts["bina_adi"] == "yal apartman"
    assert parts["no"] == "3"
