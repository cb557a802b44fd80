"""Deterministic synthetic fixtures: Common-Crawl-style ``pages`` table
(url, warc_ts, html, text, lang — exactly the BASELINE.json input_hint
shape) plus ``labeled_pairs`` gold for pairwise-F1 evaluation.

Everything is a pure function of (seed, n_entities) — no RNG state, no
wall clock, no external data (FIXTURES.md §1-§3). Address text mirrors
the variation families the reference normalizes away
(abbreviation/casing/punctuation/diacritics/mojibake;
/root/reference/addresskit/normalize.py:85-136,
normalize_and_parse.py:11-32). Every 5th entity has a "hard twin":
same blocking key (digits+prefix6: same house number + same 6-char
mahalle prefix) but a different real-world entity — the in-block
negatives the pairwise F1 is graded on.
"""

from __future__ import annotations

import hashlib
import html as html_mod
import os
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

from .blocking import make_block_key
from .normalize import normalize_text

# mahalle roots are composed from two 3-letter syllables (exactly 6
# chars, so a twin's "+lik" suffix keeps the same prefix6). Root space
# = 30*30 = 900; with 398 house numbers that is ~358k distinct
# digits+prefix6 blocks, so block sizes stay bounded as the fixture
# scales (real corpora add streets as they add pages; a fixed root
# list would make blocks grow quadratically with n_entities).
SYL_A = ["aka", "bel", "cam", "der", "efe", "fer", "gok", "han", "ince",
         "kar", "lal", "mer", "nil", "ova", "pin", "ras", "sel", "tas",
         "ulu", "ver", "yak", "zum", "bos", "cin", "dag", "eren", "fid",
         "gul", "huz", "irm"][:30]
SYL_B = ["bas", "cik", "dam", "eli", "fen", "gar", "hat", "ist", "koy",
         "lik", "mes", "nar", "oba", "pek", "ray", "soy", "tep", "urt",
         "vad", "yol", "zen", "bag", "cev", "dor", "ege", "flu", "gun",
         "his", "kum", "lar"][:30]
CAD_NAMES = [
    "guven", "istiklal", "ataturk", "inonu", "millet", "vatan", "gazi",
    "fevzipasa", "mithatpasa", "ordu", "sakarya", "talatpasa", "ulubatli",
    "yavuzselim", "ziyagokalp", "kazimkarabekir", "dumlupinar", "fatih",
]
BINA_WORDS = ["palmiye", "defne", "sedir", "ihlamur", "akasyalar", "begonya"]
ILCE_IL = [
    ("bodrum", "mugla"), ("fethiye", "mugla"), ("kadikoy", "istanbul"),
    ("kartal", "istanbul"), ("bornova", "izmir"), ("konak", "izmir"),
    ("kecioren", "ankara"), ("mamak", "ankara"), ("tarsus", "mersin"),
    ("tepebasi", "eskisehir"), ("odunpazari", "eskisehir"),
    ("tekkekoy", "samsun"),
]

MAH_KW = ["mahalle", "mah.", "mh", "mahallesi"]
CAD_KW = ["cadde", "cad.", "caddesi"]
SOK_KW = ["sokak", "sok.", "sk"]
NO_KW = ["no: ", "no ", "kapı no: "]

_EPOCH = datetime(2024, 1, 1)


def _h(*xs) -> int:
    """Deterministic 64-bit hash of the arguments (pure, cross-process
    stable — not Python's seeded hash())."""
    blob = "\x1f".join(str(x) for x in xs).encode("utf-8")
    return int.from_bytes(hashlib.sha256(blob).digest()[:8], "big")


def _mojibake(s: str) -> str:
    try:
        return s.encode("utf-8").decode("latin1")
    except UnicodeDecodeError:
        return s


class Entity:
    __slots__ = ("idx", "mah", "cad", "use_sokak", "no", "daire", "kat",
                 "bina", "ilce", "il")

    def __init__(self, idx: int, seed: int):
        h = _h(seed, "entity", idx)
        self.idx = idx
        if idx % 5 == 4:
            # hard twin of entity idx-1: same mahalle prefix6 + same no
            # (same digits+prefix6 block key), everything else disjoint
            prev = Entity(idx - 1, seed)
            self.mah = prev.mah + "lik"
            self.no = prev.no
            cad_pool = [c for c in CAD_NAMES if c != prev.cad]
            self.cad = cad_pool[(h >> 8) % len(cad_pool)]
            self.use_sokak = not prev.use_sokak
            self.daire = None
            self.kat = (h >> 16) % 5 + 1 if prev.kat is None else None
            self.bina = None
            il_pool = [p for p in ILCE_IL if p[1] != prev.il]
            self.ilce, self.il = il_pool[(h >> 24) % len(il_pool)]
        else:
            self.mah = (SYL_A[(h >> 40) % len(SYL_A)]
                        + SYL_B[(h >> 48) % len(SYL_B)])
            self.cad = CAD_NAMES[h % len(CAD_NAMES)]
            self.use_sokak = (h >> 4) % 3 == 0
            self.no = (h >> 54) % 398 + 1
            self.daire = (h >> 12) % 9 + 1 if (h >> 8) % 2 else None
            self.kat = (h >> 20) % 6 + 1 if (h >> 16) % 3 == 0 else None
            self.bina = (
                BINA_WORDS[(h >> 28) % len(BINA_WORDS)] + " apartman"
                if (h >> 24) % 4 == 0
                else None
            )
            self.ilce, self.il = ILCE_IL[(h >> 32) % len(ILCE_IL)]


def render_variant(ent: Entity, variant: int, seed: int) -> str:
    """Deterministic surface form #variant of an entity's address."""
    h = _h(seed, "variant", ent.idx, variant)
    mah_kw = MAH_KW[h % len(MAH_KW)]
    street_kw = (SOK_KW if ent.use_sokak else CAD_KW)[(h >> 4) % 3]
    no_kw = NO_KW[(h >> 8) % len(NO_KW)]

    # field PRESENCE is an entity property; variants only change surface
    # forms, so same-entity variants normalize to near-identical strings
    segs = [f"{ent.mah} {mah_kw}", f"{ent.cad} {street_kw}"]
    if ent.daire is not None:
        if (h >> 14) % 2:
            segs.append(f"{no_kw}{ent.no}/{ent.daire}")
        else:
            segs.append(f"{no_kw}{ent.no} daire {ent.daire}")
    else:
        segs.append(f"{no_kw}{ent.no}")
    if ent.kat is not None:
        segs.append(f"kat {ent.kat}")
    if ent.bina is not None:
        segs.append(ent.bina)

    if (h >> 20) % 2:
        segs.append(f"{ent.ilce}/{ent.il}")
    else:
        segs.append(f"{ent.ilce} {ent.il}")

    sep = ", " if (h >> 24) % 2 else " "
    text = sep.join(segs)

    # casing family: upper / title / mixed dotted-İ
    case_mode = (h >> 26) % 4
    if case_mode == 0:
        text = text.upper().replace("I", "İ") if (h >> 30) % 2 else text.upper()
    elif case_mode == 1:
        text = text.title()
    # diacritics: some variants carry Turkish characters
    if (h >> 32) % 3 == 0:
        text = (
            text.replace("mugla", "muğla").replace("kadikoy", "kadıköy")
            .replace("kecioren", "keçiören").replace("cinarli", "çınarlı")
            .replace("gulbahar", "gülbahar").replace("yesilyurt", "yeşilyurt")
        )
    if (h >> 36) % 16 == 0:
        text = text.replace(", ", ",\n", 1)
    if (h >> 40) % 8 == 0:
        text = text.replace(" ", "  ", 1)
    if (h >> 44) % 50 == 0:
        text = _mojibake(text)
    return text


def _noise_text(i: int, seed: int) -> str:
    h = _h(seed, "noise", i)
    mode = h % 4
    if mode == 0:
        return ""
    if mode == 1:
        return "!!! ... ---"
    if mode == 2:
        return "kisa"
    return "sokak mahalle cadde bulvar"  # digit-free -> suspicious


def page_html(text: str, title: str) -> bytes:
    """Deterministic HTML wrapper; extract.extract_text inverts it
    byte-identically (the per-row invariant of BASELINE.json)."""
    body = html_mod.escape(text, quote=False)
    doc = (
        "<html><head><meta charset=\"utf-8\"/>"
        f"<title>{html_mod.escape(title, quote=False)}</title></head>"
        f"<body><nav>ana sayfa | iletisim</nav><article>{body}</article>"
        "<footer>&copy; 2024 example</footer></body></html>"
    )
    return doc.encode("utf-8")


def build_pages(n_entities: int, seed: int = 42,
                noise_fraction: float = 0.05,
                entity_lo: int = 0, entity_hi: int | None = None):
    """-> (pages: pa.Table, truth: dict url -> entity idx | None).

    Left pages live on site L (url .../L/...), right pages on site R —
    two disjoint views of the same entity universe (FIXTURES.md §1).
    ``entity_lo/hi`` select a shard of the entity range — output is a
    pure function of (seed, entity index), so shards generated in
    parallel concatenate to exactly the serial output."""
    urls: list[str] = []
    ts: list[datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    truth: dict[str, int | None] = {}

    def add(url: str, text: str, lang: str, ent_idx: int | None,
            ordinal: int):
        urls.append(url)
        # ts derived from a stable ordinal (not a running counter) so
        # sharded generation equals serial generation byte-for-byte
        ts.append(_EPOCH + timedelta(seconds=ordinal * 17))
        htmls.append(page_html(text, url))
        texts.append(text)
        langs.append(lang)
        truth[url] = ent_idx

    hi = n_entities if entity_hi is None else entity_hi
    for i in range(entity_lo, hi):
        ent = Entity(i, seed)
        h = _h(seed, "counts", i)
        n_left = 1 + (h % 2)
        n_right = 1 + ((h >> 4) % 2)
        for v in range(n_left):
            lang = "tr" if _h(seed, "lang", i, v) % 20 else "en"
            add(f"https://siteL.example/p/{i}/{v}",
                render_variant(ent, v, seed), lang, i, i * 8 + v)
        for v in range(n_right):
            lang = "tr" if _h(seed, "lang", i, 100 + v) % 20 else ""
            add(f"https://siteR.example/p/{i}/{v}",
                render_variant(ent, 100 + v, seed), lang, i, i * 8 + 4 + v)

    # noise rows are assigned to entity-index slots so sharded
    # generation emits each exactly once
    n_noise = int(n_entities * noise_fraction)
    per = max(1, n_entities // n_noise) if n_noise else 0
    for j in range(n_noise):
        owner = j * per
        if not (entity_lo <= owner < hi):
            continue
        side = "L" if j % 2 == 0 else "R"
        add(f"https://site{side}.example/noise/{j}",
            _noise_text(j, seed), "tr", None, n_entities * 8 + j)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    return pages, truth


def build_labeled_pairs(pages: pa.Table, truth: dict,
                        block_by: str = "digits+prefix6",
                        max_pairs_per_block: int = 400) -> pa.Table:
    """Within-block left x right pairs labeled is_match = same entity
    (FIXTURES.md §2 — pairs labeled at the same blocking key)."""
    urls = pages.column("url").to_pylist()
    texts = pages.column("text").to_pylist()
    blocks: dict[str, tuple[list, list]] = {}
    for url, text in zip(urls, texts):
        ent = truth.get(url)
        if ent is None:
            continue
        norm = normalize_text(text)
        key = make_block_key({"t": norm}, "t", block_by)
        side = 0 if url.startswith("https://siteL") else 1
        blocks.setdefault(key, ([], []))[side].append((url, ent))

    l_ids, r_ids, labels, keys = [], [], [], []
    for key, (lefts, rights) in sorted(blocks.items()):
        count = 0
        for lu, le in lefts:
            for ru, re_ in rights:
                if count >= max_pairs_per_block:
                    break
                l_ids.append(lu)
                r_ids.append(ru)
                labels.append(le == re_)
                keys.append(key)
                count += 1
    return pa.table(
        {
            "left_id": pa.array(l_ids, pa.string()),
            "right_id": pa.array(r_ids, pa.string()),
            "is_match": pa.array(labels, pa.bool_()),
            "block_key": pa.array(keys, pa.string()),
        }
    )


PARALLEL_GEN_THRESHOLD = 50_000


def ensure_fixture_dir(n_entities: int, seed: int = 42,
                       base: str = "/tmp/raylink_fixtures") -> str:
    """Write (once) pages.parquet + labeled_pairs.parquet for the given
    size; returns the directory. Cached by (n_entities, seed). Large
    sizes are generated as parallel Ray tasks over entity shards
    (pure-function sharding => identical rows to serial generation);
    labeled pairs are only materialized for small (test) sizes."""
    out = os.path.join(base, f"e{n_entities}_s{seed}_v2")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out

    # Build in a process-unique tmp dir and publish with ONE atomic
    # rename: the old write-in-place scheme let two concurrent callers
    # (pytest-xdist workers, bench subprocesses) interleave writes to
    # the same parquet path, and a third caller admitted by the _DONE
    # marker could read a file still being rewritten.
    import shutil

    tmp = f"{out}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    if n_entities <= PARALLEL_GEN_THRESHOLD:
        pages, truth = build_pages(n_entities, seed)
        pq.write_table(pages, os.path.join(tmp, "pages.parquet"))
        pq.write_table(build_labeled_pairs(pages, truth),
                       os.path.join(tmp, "labeled_pairs.parquet"))
    else:
        import ray

        @ray.remote(num_cpus=1)
        def gen_shard(lo: int, hi: int, path: str) -> int:
            tbl, _ = build_pages(n_entities, seed,
                                 entity_lo=lo, entity_hi=hi)
            pq.write_table(tbl, path)
            return tbl.num_rows

        pages_dir = os.path.join(tmp, "pages.parquet")
        os.makedirs(pages_dir, exist_ok=True)
        shard = 12_500
        refs = [
            gen_shard.remote(
                lo, min(lo + shard, n_entities),
                os.path.join(pages_dir, f"part-{lo // shard:05d}.parquet"))
            for lo in range(0, n_entities, shard)
        ]
        ray.get(refs)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")

    # a stale partial `out` (old-scheme crash: dir without marker) is
    # garbage — clear it so the rename can land
    if os.path.isdir(out) and not os.path.exists(marker):
        shutil.rmtree(out, ignore_errors=True)
    try:
        os.rename(tmp, out)
    except OSError:
        # a concurrent generator won the rename; its output is
        # byte-identical (pure function of (n_entities, seed)) — wait
        # for its marker and discard ours
        shutil.rmtree(tmp, ignore_errors=True)
        deadline = time.monotonic() + 600
        while not os.path.exists(marker):
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"fixture dir {out} exists but its _DONE marker "
                    f"never appeared — remove the directory and retry")
            time.sleep(0.2)
    return out


def entities_for_sf_dir(sf_dir: str) -> int:
    """Map a testdata sf dir onto a fixture size (used by __ray_entry__
    so pages-pipeline queries scale with the requested sf)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    # sf0.1 is the bench scale: large enough that compute (not
    # orchestration overhead) dominates, so throughput scales with CPUs
    table = {"sf0.001": 300, "sf0.01": 2000, "sf0.1": 1_600_000}
    return table.get(name, 2000)
