"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md F1/F2).

The driver ``input_hint`` table shape: ``(url: string, warc_ts:
timestamp[us], html: binary, text: string, lang: string)``.

Everything here is seeded and wall-clock-free so golden outputs are
stable. ``text`` is defined as ``extract_text_one(html)`` — the
canonical single-row extraction — so the pipeline's vectorized
extraction can be verified byte-identical per url (the graft analog of
the reference's deterministic patch loading, ``src/utils.rs:79-139``).

Degenerate rows (mirrors the reference's tolerance of bad records,
``src/utils.rs:110-126``, ``src/features/shape.rs:142-147``):

* empty ``html`` and malformed ``html`` -> unparseable, ``text`` null,
  dropped-and-counted by the pipeline;
* pages whose extraction is the empty string -> features NaN;
* exact duplicate ``(url, warc_ts)`` pairs -> dedup keeps a
  deterministic winner;
* one hot url with hundreds of snapshots and Zipf-hot domains ->
  exercises skew salting;
* per-url language flips -> exercises language-stability features.
"""

from __future__ import annotations

import html as _htmllib
import os
import re
import tempfile
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20240817
EPOCH = datetime(2024, 1, 1)

# ---------------------------------------------------------------------------
# Canonical HTML -> text extraction (single row). The pipeline's batched
# kernel (functions/text_extract.py) must match this byte-for-byte.
# ---------------------------------------------------------------------------

_RE_SCRIPT = re.compile(rb"<script\b.*?</script>", re.S | re.I)
_RE_STYLE = re.compile(rb"<style\b.*?</style>", re.S | re.I)
_RE_BLOCK = re.compile(rb"</(?:p|h[1-6]|li|title|div)>|<br\s*/?>", re.I)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_NL_SPACE = re.compile(r" ?\n ?")
_RE_MULTI_NL = re.compile(r"\n{2,}")


def extract_text_one(html_bytes: bytes | None) -> str | None:
    """Canonical extraction; returns None for unparseable input.

    Unparseable = empty, not valid UTF-8, or lacking an ``<html`` tag.
    """
    if html_bytes is None or len(html_bytes) == 0:
        return None
    if b"<html" not in html_bytes[:256].lower():
        return None
    raw = _RE_SCRIPT.sub(b"", html_bytes)
    raw = _RE_STYLE.sub(b"", raw)
    raw = _RE_BLOCK.sub(b"\n", raw)
    raw = _RE_TAG.sub(b"", raw)
    try:
        s = raw.decode("utf-8")
    except UnicodeDecodeError:
        return None
    s = _htmllib.unescape(s)
    s = _RE_SPACES.sub(" ", s)
    s = _RE_NL_SPACE.sub("\n", s)
    s = _RE_MULTI_NL.sub("\n", s)
    return s.strip()


# ---------------------------------------------------------------------------
# Vocab / templates
# ---------------------------------------------------------------------------

_VOCAB = {
    "en": ("the quick brown fox jumps over lazy dog data stream batch query "
           "join window feature vector page crawl index rank score token").split(),
    "de": ("der schnelle braune Fuchs springt über faule Hunde Daten Strom "
           "Abfrage Fenster Merkmal Vektor Seite Größe straße").split(),
    "fr": ("le rapide renard brun saute par-dessus chien paresseux données "
           "flux requête fenêtre caractéristique vecteur page été çà").split(),
    "zh": "数据 流 批 查询 连接 窗口 特征 向量 页面 抓取 索引 排名 分数 词元".split(),
    "ar": "بيانات تدفق دفعة استعلام نافذة ميزة متجه صفحة فهرس رتبة درجة".split(),
}
_LANGS = list(_VOCAB)

_TLDS = ["com", "org", "net", "io", "dev"]


def _words(rng: np.random.Generator, lang: str, n: int) -> str:
    v = _VOCAB[lang]
    return " ".join(v[i] for i in rng.integers(0, len(v), n))


def _render_html(rng: np.random.Generator, lang: str, snap_idx: int) -> bytes:
    """Deterministic page from the template set: title / headings /
    paragraphs / list / script+style noise / HTML entities / non-ASCII."""
    title = _words(rng, lang, int(rng.integers(2, 6)))
    parts = [
        "<html><head><title>%s</title>" % title,
        "<style>body { color: #123; margin: 0 }</style></head><body>",
        "<h1>%s</h1>" % title,
    ]
    for _ in range(int(rng.integers(1, 6))):
        n = int(rng.integers(5, 60))
        txt = _words(rng, lang, n)
        if rng.random() < 0.3:
            txt += " &amp; more &lt;v%d&gt;" % snap_idx
        parts.append("<p>%s</p>" % txt)
    if rng.random() < 0.4:
        parts.append("<ul>" + "".join(
            "<li>%s</li>" % _words(rng, lang, 3)
            for _ in range(int(rng.integers(1, 4)))) + "</ul>")
    parts.append("<script>var x = %d; track(x);</script>" % snap_idx)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


# ---------------------------------------------------------------------------
# Corpus generation
# ---------------------------------------------------------------------------

def generate_pages(n_pages: int, n_domains: int = 50,
                   seed: int = SEED) -> pa.Table:
    """Seeded pages table of ~n_pages rows (plus injected degenerates)."""
    rng = np.random.default_rng(seed)

    # Zipf-skewed domain popularity over a fixed pool -> hot domains.
    domains = ["site%03d.%s" % (i, _TLDS[i % len(_TLDS)])
               for i in range(n_domains)]
    dom_w = 1.0 / np.arange(1, n_domains + 1) ** 1.1
    dom_w /= dom_w.sum()

    urls: list[str] = []
    url_lang: list[str] = []
    snap_counts: list[int] = []
    budget = n_pages
    # One hot url with enough snapshots to overflow any single batch.
    hot_snaps = max(40, min(500, n_pages // 10))
    urls.append("https://%s/hot" % domains[0])
    url_lang.append("en")
    snap_counts.append(hot_snaps)
    budget -= hot_snaps
    u = 0
    while budget > 0:
        d = domains[int(rng.choice(n_domains, p=dom_w))]
        urls.append("https://%s/p/%04d" % (d, u))
        url_lang.append(_LANGS[int(rng.integers(0, len(_LANGS)))])
        k = min(budget, int(rng.geometric(0.45)))
        snap_counts.append(k)
        budget -= k
        u += 1

    year_us = 365 * 86400 * 1_000_000
    out_url, out_ts, out_html, out_text, out_lang = [], [], [], [], []
    for url, lang0, k in zip(urls, url_lang, snap_counts):
        # Strictly increasing timestamps; gaps from minutes to months so
        # a 30-day sessionize threshold splits some urls and not others.
        start = int(rng.integers(0, year_us // 2))
        gaps = np.where(
            rng.random(k) < 0.25,
            rng.integers(35 * 86400, 120 * 86400, k),  # above threshold
            rng.integers(60, 20 * 86400, k),           # below threshold
        ) * 1_000_000
        ts = start + np.cumsum(gaps)
        for i in range(k):
            lang = lang0
            if rng.random() < 0.08:  # occasional language flip
                lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
            h = _render_html(rng, lang, i)
            out_url.append(url)
            out_ts.append(int(ts[i]))
            out_html.append(h)
            out_text.append(extract_text_one(h))
            out_lang.append(lang)

    # Degenerate rows.
    def add(url, ts_us, h, lang):
        out_url.append(url)
        out_ts.append(ts_us)
        out_html.append(h)
        out_text.append(extract_text_one(h))
        out_lang.append(lang)

    base = year_us // 4
    dg = "https://%s/degenerate" % domains[1]
    add(dg, base, b"", "en")                                  # empty html
    add(dg, base + 1_000_000, b"\xff\xfe<html>broken", "en")  # bad utf-8
    add(dg, base + 2_000_000, b"not html at all", "en")       # malformed
    add(dg, base + 3_000_000,
        b"<html><body><script>only()</script></body></html>", "en")  # empty text
    # Exact-duplicate (url, warc_ts) pairs with differing html: dedup
    # must keep the deterministic winner (smallest html bytes).
    ddup = "https://%s/dup" % domains[2]
    h1 = _render_html(rng, "en", 0)
    h2 = _render_html(rng, "en", 1)
    add(ddup, base, h1, "en")
    add(ddup, base, h2, "en")
    add(ddup, base, h1, "en")

    order = np.lexsort((np.asarray(out_ts), np.asarray(out_url, dtype=object)))
    # Interleave deterministically (hash order) so input is NOT pre-sorted.
    mix = np.argsort((order * 2654435761) % (2**32 - 3), kind="stable")
    idx = order[mix]

    tbl = pa.table({
        "url": pa.array(np.asarray(out_url, dtype=object)[idx], pa.string()),
        "warc_ts": pa.array(np.asarray(out_ts)[idx], pa.timestamp("us")),
        "html": pa.array([out_html[i] for i in idx], pa.binary()),
        "text": pa.array([out_text[i] for i in idx], pa.string()),
        "lang": pa.array(np.asarray(out_lang, dtype=object)[idx], pa.string()),
    })
    return tbl


def generate_probes(pages: pa.Table, n_probes: int,
                    seed: int = SEED + 1) -> pa.Table:
    """As-of-join probe side (FIXTURES.md F2): (url, query_ts) mixture of
    before-first / exact-boundary / between / after-last / unknown url."""
    rng = np.random.default_rng(seed)
    url = pages["url"].to_numpy(zero_copy_only=False)
    ts = pages["warc_ts"].cast(pa.int64()).to_numpy()
    order = np.lexsort((ts, url.astype(str)))
    url_s, ts_s = url[order], ts[order]
    uniq, starts = np.unique(url_s, return_index=True)
    ends = np.append(starts[1:], len(url_s))
    p_url, p_ts = [], []
    for _ in range(n_probes):
        r = rng.random()
        if r < 0.05:
            p_url.append("https://unknown.example/%d" % rng.integers(0, 1 << 30))
            p_ts.append(int(rng.integers(ts.min(), ts.max())))
            continue
        g = int(rng.integers(0, len(uniq)))
        u = str(uniq[g])
        uts = ts_s[starts[g]:ends[g]]
        r2 = rng.random()
        if r2 < 0.15:      # before first snapshot -> no match
            p_ts.append(int(uts[0] - rng.integers(1, 10**9)))
        elif r2 < 0.35:    # exactly a snapshot ts -> boundary match
            p_ts.append(int(uts[int(rng.integers(0, len(uts)))]))
        elif r2 < 0.7 and len(uts) > 1:   # between snapshots
            i = int(rng.integers(0, len(uts) - 1))
            p_ts.append(int(rng.integers(uts[i], uts[i + 1] + 1)))
        else:              # after last
            p_ts.append(int(uts[-1] + rng.integers(1, 10**9)))
        p_url.append(u)
    return pa.table({
        "url": pa.array(p_url, pa.string()),
        "query_ts": pa.array(np.asarray(p_ts), pa.timestamp("us")),
    })


# ---------------------------------------------------------------------------
# On-disk cache (atomic; safe for concurrent bench processes)
# ---------------------------------------------------------------------------

SCALES = {"t1": 500, "t2": 50_000, "bench": 200_000,
          "scaling": 600_000}


def corpus_dir(scale: str, root: str = "/tmp/nfx_corpus") -> str:
    """Generate-and-cache the corpus for a named scale; returns its dir
    containing a sharded ``pages/`` parquet directory (so a Ray read
    parallelizes — one file reads as one task) plus probes.parquet."""
    n = SCALES[scale] if scale in SCALES else int(scale)
    d = os.path.join(root, "%s-%d-%d-v3" % (scale, n, SEED))
    if os.path.isdir(d):
        return d
    pages = generate_pages(n)
    probes = generate_probes(pages, max(50, n // 5))
    os.makedirs(root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=root)
    # enough shards that the fused read->extract tasks run several
    # waves per CPU (one-task-per-CPU packing makes the 32-CPU level
    # straggler-bound and wrecks measured scaling efficiency)
    shards = min(192, max(1, len(pages) // 2000))
    os.makedirs(os.path.join(tmp, "pages"))
    step = (len(pages) + shards - 1) // shards
    for i in range(shards):
        pq.write_table(pages.slice(i * step, step),
                       os.path.join(tmp, "pages",
                                    "part-%03d.parquet" % i))
    pq.write_table(probes, os.path.join(tmp, "probes.parquet"))
    try:
        os.rename(tmp, d)
    except OSError:   # lost the race; another process committed it
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)
    return d
