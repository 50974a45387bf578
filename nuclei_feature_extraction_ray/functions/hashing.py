"""Deterministic vectorized hashing / sketching kernels.

Used for: url-hash range partitioning (+salting), exact dedup keys,
shingle hashing, MinHash signatures (LSH near-dup), SimHash, and
winnowing fingerprints. All are seed-stable across processes (no
``PYTHONHASHSEED`` dependence) so Ray task retries are idempotent —
the determinism requirement the reference never had to meet
(cf. nondeterministic output order, ``src/main.rs:146-158``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def hash64(values) -> np.ndarray:
    """Stable 64-bit hash of a string/bytes array -> uint64.

    pandas' hash_array uses a fixed internal SipHash key, so the result
    is stable across processes, workers, and runs.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def partition_of(urls, num_partitions: int) -> np.ndarray:
    """url -> partition id in [0, num_partitions). One key never spans
    partitions — the invariant all window state relies on."""
    return (hash64(urls) % np.uint64(num_partitions)).astype(np.int64)


def _hash_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


#: odd 64-bit bases for the two independent polynomial rolling hashes
#: (odd -> invertible mod 2^64, so the cumsum-difference trick below
#: can renormalize every window with one vectorized multiply).
_RK_BASE1 = 0x100000001B3          # FNV-1a prime
_RK_BASE2 = 0x9E3779B97F4A7C15     # 2^64 / golden ratio
_rk_tables_cache: dict = {}


def _rk_tables(n: int, base: int) -> tuple[np.ndarray, np.ndarray]:
    """Cached (powers, inverse-powers) of ``base`` mod 2^64, length
    >= n. Grown geometrically; all arithmetic wraps in uint64."""
    pw_ipw = _rk_tables_cache.get(base)
    if pw_ipw is None or len(pw_ipw[0]) < n:
        size = max(n, 4096)
        if pw_ipw is not None:
            size = max(size, 2 * len(pw_ipw[0]))
        pw = np.full(size, np.uint64(base), np.uint64)
        pw[0] = 1
        np.multiply.accumulate(pw, out=pw)          # wraps mod 2^64
        inv = pow(base, -1, 1 << 64)
        ipw = np.full(size, np.uint64(inv), np.uint64)
        ipw[0] = 1
        np.multiply.accumulate(ipw, out=ipw)
        _rk_tables_cache[base] = pw_ipw = (pw, ipw)
    return pw_ipw


def rolling_kgram_hash128(text: str, k: int) -> tuple[np.ndarray,
                                                      np.ndarray]:
    """All character k-grams of ``text`` as two independent 64-bit
    polynomial hashes (128 bits total) — one vectorized pass, no
    per-gram Python. CHARACTER semantics (UTF-32 code points), so
    positions line up with SQL ``substring``/``length``. Returns
    ``(h1, h2)`` uint64 arrays of length ``len(text) - k + 1`` (empty
    when the text is shorter than ``k``).

    Rolling form: with S = cumsum(char[j] * base^j) mod 2^64,
    hash(i) = (S[i+k] - S[i]) * base^-i — equal to
    sum_j char[i+j] * base^j, the classic content-defined gram key
    (cf. Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL'22 — suffix-array ExactSubstr; this is the
    hashed-gram shuffle analog)."""
    cps = np.frombuffer(text.encode("utf-32-le"),
                        np.uint32).astype(np.uint64)
    n = len(cps)
    m = n - k + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    out = []
    for base in (_RK_BASE1, _RK_BASE2):
        pw, ipw = _rk_tables(n + 1, base)
        s = np.empty(n + 1, np.uint64)
        s[0] = 0
        np.cumsum(cps * pw[:n], out=s[1:])          # wraps mod 2^64
        out.append((s[k:] - s[:-k]) * ipw[:m])
    return out[0], out[1]


def word_shingles(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct hashed word n-grams of one document -> uint64 array."""
    if len(tokens) < n:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i:i + n])
                 for i in range(len(tokens) - n + 1)]
    if not grams:
        return np.empty(0, np.uint64)
    return np.unique(hash64(grams))


def word_shingles_batch(token_lists, n: int = 3) -> tuple[np.ndarray,
                                                          np.ndarray]:
    """``word_shingles`` across a whole batch of documents with ONE
    ``hash64`` kernel call over every gram of every document (values
    identical per doc — same gram strings, same SipHash). Returns the
    flat offsets form the posting-explode stages consume directly:
    ``(flat, lens)`` where ``flat`` is the per-doc-distinct shingle
    hashes concatenated in doc order and ``lens[i]`` is doc i's
    distinct-shingle count — so the caller builds posting rows with
    ``np.repeat`` instead of a per-doc ``np.full`` loop (the
    ``md5_*_flat`` pattern applied to the SipHash tier)."""
    grams = [_grams_of_tokens(t, n) for t in token_lists]
    flat_grams = [g for gs in grams for g in gs]
    hv = (hash64(flat_grams) if flat_grams
          else np.empty(0, np.uint64))
    ends = np.cumsum(np.fromiter((len(gs) for gs in grams),
                                 np.int64, len(grams)))
    starts = np.concatenate(([0], ends[:-1]))
    parts = [np.unique(hv[s:e]) for s, e in zip(starts, ends)]
    lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
    flat = (np.concatenate(parts) if parts else np.empty(0, np.uint64))
    return flat, lens


def md5_shingles(tokens: list[str], n: int = 3) -> np.ndarray:
    """``word_shingles`` with the PORTABLE md5 gram hash (first 16 hex
    chars as uint64) — reproducible in DuckDB, so MinHash built on
    these is SQL-oracle-able. Distinctness applies to the hash values,
    exactly like the SQL twin's list_distinct."""
    import hashlib
    if len(tokens) < n:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [" ".join(tokens[i:i + n])
                 for i in range(len(tokens) - n + 1)]
    if not grams:
        return np.empty(0, np.uint64)
    return np.unique(np.asarray(
        [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:16], 16)
         for g in grams], np.uint64))


def md5_upper64_flat(strs) -> np.ndarray:
    """``int(md5(s).hexdigest()[:16], 16)`` for EVERY string in one
    vectorized C kernel (DuckDB ``md5_number_upper`` = the first 8
    digest bytes little-endian; byteswap == hex order). Projection
    over an Arrow scan preserves row order. Replaces the per-string
    hashlib loops in the md5 oracle twins — same values bit-for-bit.
    """
    import duckdb
    import pyarrow as pa
    if len(strs) == 0:
        return np.empty(0, np.uint64)
    if isinstance(strs, (pa.Array, pa.ChunkedArray)):
        tb = pa.table({"s": strs})  # zero-copy into the kernel
    else:
        tb = pa.table({"s": pa.array(list(strs), pa.string())})  # noqa: F841
    out = duckdb.connect().execute(
        "SELECT md5_number_upper(s) AS h FROM tb").arrow()
    return out["h"].to_numpy(zero_copy_only=False).byteswap()


def md5_id64_flat(ids, suffix: str) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) big-endian uint64 halves of ``md5(str(id) + suffix)``
    for an int64 id array — string building AND hashing both inside
    one DuckDB kernel (no per-row Python). (hi, lo) order equals the
    md5 hex-string order, so rankings built on these match a SQL
    ``ORDER BY md5(...)`` bit-for-bit."""
    import duckdb
    import pyarrow as pa
    if len(ids) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    tb = pa.table({"i": pa.array(
        np.asarray(ids, np.int64), pa.int64())})  # noqa: F841
    out = duckdb.connect().execute(
        "SELECT md5_number_upper(CAST(i AS VARCHAR) || ?) AS hu,"
        " md5_number_lower(CAST(i AS VARCHAR) || ?) AS hl FROM tb",
        [suffix, suffix]).arrow()
    return (out["hu"].to_numpy(zero_copy_only=False).byteswap(),
            out["hl"].to_numpy(zero_copy_only=False).byteswap())


def md5_hex_flat(strs) -> np.ndarray:
    """``md5(s.encode()).hexdigest()`` for every string — one
    vectorized DuckDB kernel (order-preserving projection)."""
    import duckdb
    import pyarrow as pa
    if len(strs) == 0:
        return np.empty(0, dtype=object)
    tb = pa.table({"s": pa.array(list(strs), pa.string())})  # noqa: F841
    out = duckdb.connect().execute(
        "SELECT md5(s) AS h FROM tb").arrow()
    return np.asarray(out["h"].to_pylist(), dtype=object)


def md5_suffixed64_flat(strs, n_rows: int,
                        sep: str = "#") -> np.ndarray:
    """``md5_number_upper(s || sep || r)`` for every string x every
    row index r in ``range(n_rows)`` — one vectorized DuckDB kernel,
    shape ``(n_rows, len(strs))``. Values are in DuckDB's NUMERIC
    order (little-endian of the first 8 digest bytes, NOT hex order
    — unlike ``md5_upper64_flat``), so ``% m`` on the result equals
    SQL ``md5_number_upper(...) % m`` bit-for-bit: the shared hash
    family of the md5 oracle-twin sketches (CMS rows, Bloom probes)."""
    import duckdb
    import pyarrow as pa
    if len(strs) == 0:
        return np.empty((n_rows, 0), np.uint64)
    if isinstance(strs, (pa.Array, pa.ChunkedArray)):
        col = strs
    else:
        col = pa.array(list(strs), pa.string())
    tb = pa.table({"i": pa.array(np.arange(len(col), dtype=np.int64)),
                   "s": col})  # noqa: F841
    out = duckdb.connect().execute(
        "SELECT md5_number_upper(s || ? || CAST(r AS VARCHAR)) AS h"
        " FROM tb CROSS JOIN range(?) t(r) ORDER BY r, i",
        [sep, n_rows]).arrow()
    return out["h"].to_numpy(zero_copy_only=False) \
        .reshape(n_rows, len(col))


def _grams_of_tokens(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + n])
            for i in range(len(tokens) - n + 1)]


def md5_shingles_batch(token_lists, n: int = 3) -> list[np.ndarray]:
    """``md5_shingles`` across a whole batch of documents with ONE
    md5 kernel call for all grams (values identical per doc)."""
    grams = [_grams_of_tokens(t, n) for t in token_lists]
    hv = md5_upper64_flat([g for gs in grams for g in gs])
    out, pos = [], 0
    for gs in grams:
        out.append(np.unique(hv[pos:pos + len(gs)]))
        pos += len(gs)
    return out


def md5_token_hashes_batch(texts) -> list[np.ndarray]:
    """``md5_token_hashes`` across a batch — one md5 kernel for every
    token of every document (values identical per doc). Non-string /
    empty rows yield empty arrays (the drop_empty contract)."""
    toks = []
    for text in texts:
        t = text.strip(" \t\n\r\f") if isinstance(text, str) else ""
        toks.append(_WS_RUN.split(t) if t else [])
    hv = md5_upper64_flat([w for ws in toks for w in ws])
    out, pos = [], 0
    for ws in toks:
        out.append(hv[pos:pos + len(ws)].astype(np.uint64))
        pos += len(ws)
    return out


def winnow_fingerprint_md5_batch(texts, k: int = 8,
                                 window: int = 16) -> list[list[str]]:
    """``winnow_fingerprint_md5`` across a batch — all char k-grams
    hashed by one md5 kernel, per-doc window minima unchanged."""
    grams: list[list[str]] = []
    for text in texts:
        t = text if isinstance(text, str) else ""
        n = len(t)
        if n == 0:
            grams.append([])
        elif n < k:
            grams.append([t])
        else:
            grams.append([t[i:i + k] for i in range(n - k + 1)])
    hv = md5_upper64_flat([g for gs in grams for g in gs])
    out, pos = [], 0
    for gs in grams:
        h = hv[pos:pos + len(gs)]
        pos += len(gs)
        if not len(h):
            out.append([])
            continue
        if len(h) <= window:
            mins = h.min(keepdims=True)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(h, window)
            mins = np.unique(sw.min(axis=1))
        out.append(["%016x" % m for m in np.unique(mins)])
    return out


def minhash_signatures(shingle_sets: list[np.ndarray], k: int = 64,
                       seed: int = 7) -> np.ndarray:
    """MinHash signatures, shape (n_docs, k) uint64.

    Vectorized across the whole batch: all shingles are concatenated,
    each of the k universal hashes ``(a*h + b) mod M61`` is applied to
    the flat array, and per-doc minima come from ``minimum.reduceat``.
    Empty docs get all-max signatures (match nothing).
    """
    a, b = _hash_params(k, seed)
    sizes = np.asarray([len(s) for s in shingle_sets])
    out = np.full((len(shingle_sets), k), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    if sizes.sum() == 0:
        return out
    flat = np.concatenate([s for s in shingle_sets if len(s)])
    nonempty = sizes > 0
    offsets = np.concatenate([[0], np.cumsum(sizes[nonempty])[:-1]])
    with np.errstate(over="ignore"):
        for j in range(k):
            hv = (a[j] * flat + b[j]) % np.uint64(_MERSENNE)
            out[nonempty, j] = np.minimum.reduceat(hv, offsets)
    return out


def lsh_band_keys(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, k) signatures -> (n_docs, bands) uint64 band-bucket keys;
    docs sharing any (band_id, key) are LSH candidates."""
    n, k = sigs.shape
    r = k // bands
    keys = np.empty((n, bands), np.uint64)
    with np.errstate(over="ignore"):
        for bnd in range(bands):
            acc = np.full(n, np.uint64(1469598103934665603))  # FNV offset
            for j in range(bnd * r, (bnd + 1) * r):
                acc = (acc ^ sigs[:, j]) * np.uint64(1099511628211)
            keys[:, bnd] = acc
    return keys


def simhash64(token_hashes: list[np.ndarray]) -> np.ndarray:
    """64-bit SimHash per document from its (non-distinct) token hashes."""
    out = np.zeros(len(token_hashes), np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for i, th in enumerate(token_hashes):
        if len(th) == 0:
            continue
        bits = ((th[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.bitwise_or.reduce(
            (v > 0).astype(np.uint64) << bit_idx)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR for uint64 arrays (vectorized via byte view)."""
    x = (a ^ b).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1)


import re as _re

_WS_RUN = _re.compile(r"[ \t\n\r\f]+")


def md5_token_hashes(text: str) -> np.ndarray:
    """Per-token 64-bit hashes with the PORTABLE md5 hash (first 16
    hex chars as uint64) over the explicit whitespace-class
    tokenization (same class as text_stats) — both reproducible in
    DuckDB, so SimHash built on these is SQL-oracle-able."""
    import hashlib
    t = text.strip(" \t\n\r\f")
    if not t:
        return np.empty(0, np.uint64)
    return np.asarray(
        [int(hashlib.md5(w.encode("utf-8")).hexdigest()[:16], 16)
         for w in _WS_RUN.split(t)], np.uint64)


def winnow_fingerprint_md5(text: str, k: int = 8,
                           window: int = 16) -> list[str]:
    """Winnowing with a PORTABLE gram hash — the first 16 hex chars of
    md5 — so the whole op is reproducible in DuckDB SQL and therefore
    driver-oracled (``winnow_fingerprint``'s SipHash key lives inside
    pandas). Identical algorithm: hash char k-grams, keep each sliding
    window's minimum, deduplicate. Hex-string order == numeric order
    (fixed-width lowercase hex), so minima are computed on uint64 and
    formatted back. Returns the sorted fingerprint set as hex strings.
    """
    import hashlib
    h = lambda s: int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16)
    n = len(text)
    if n == 0:
        return []
    if n < k:
        mins = np.asarray([h(text)], np.uint64)
    else:
        hv = np.asarray([h(text[i:i + k]) for i in range(n - k + 1)],
                        np.uint64)
        if len(hv) <= window:
            mins = hv.min(keepdims=True)
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hv, window)
            mins = np.unique(sw.min(axis=1))
    return ["%016x" % m for m in np.unique(mins)]


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    hash all char k-grams, keep the min of each sliding window,
    deduplicate. Returns sorted uint64 fingerprint set."""
    n = len(text)
    if n < k:
        return hash64([text]) if n else np.empty(0, np.uint64)
    grams = [text[i:i + k] for i in range(n - k + 1)]
    hv = hash64(grams)
    if len(hv) <= window:
        return np.unique(hv.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(hv, window)
    return np.unique(sw.min(axis=1))


# ---------------------------------------------------------------------------
# Flat (offsets-form) shingle builders — zero per-doc Python
# ---------------------------------------------------------------------------

def _texts_as_arrow(texts):
    """Any text input (pa.Array / ChunkedArray / pandas / list) ->
    one combined ``pa.string()`` array, nulls preserved."""
    import pyarrow as pa
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        return texts.cast(pa.string())
    if isinstance(texts, pd.Series):
        return pa.Array.from_pandas(texts, type=pa.string())
    return pa.array(list(texts), pa.string())


def tokens_flat(texts) -> tuple:
    """Python ``str.split()`` across a whole batch with ZERO per-doc
    Python: Arrow ``utf8_trim_whitespace`` + ``utf8_split_whitespace``
    (whitespace charset verified identical to ``str.isspace`` over the
    full BMP+), null / whitespace-only docs -> 0 tokens. Returns
    ``(vals, k)``: every doc's tokens concatenated (pa.StringArray)
    and per-doc token counts (np.int64)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    arr = _texts_as_arrow(texts)
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(arr, ""))
    toks = pc.utf8_split_whitespace(trimmed)
    off = np.asarray(toks.offsets, dtype=np.int64)
    k = np.diff(off)
    vals = toks.values
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    if empty.any():
        # a trimmed-empty doc splits to [''] — drop the phantom token
        keep = np.ones(len(vals), bool)
        keep[off[:-1][empty & (k == 1)]] = False
        vals = vals.filter(pa.array(keep))
        k = np.where(empty, 0, k)
    return vals, k.astype(np.int64)


def gram_strings_flat(texts, n: int) -> tuple:
    """Word n-gram STRINGS of every doc in a batch, flat form:
    ``(grams: pa.StringArray, doc: np.int64 gram->doc index, n_docs)``.
    Per-doc gram SET identical to ``_grams_of_tokens`` (short docs
    0 < k < n contribute the full-doc join); within-doc order may
    differ — every consumer applies a per-doc distinct. Zero per-doc
    Python: full windows are n shifted Arrow slices fused by ONE
    ``binary_join_element_wise`` kernel; short docs by one
    ``binary_join`` kernel over a rebuilt ListArray."""
    import pyarrow as pa
    import pyarrow.compute as pc
    vals, k = tokens_flat(texts)
    D, T = len(k), len(vals)
    doc_of = np.repeat(np.arange(D, dtype=np.int64), k)
    parts, docs = [], []
    if n == 1:
        return vals, doc_of, D
    if T >= n and (k >= n).any():
        W = T - n + 1
        cols = [vals.slice(i, W) for i in range(n)]
        win = pc.binary_join_element_wise(*cols, " ")
        off = np.concatenate(([0], np.cumsum(k)))
        pos = np.arange(T, dtype=np.int64) - off[doc_of]
        valid = (pos + n <= k[doc_of])[:W]
        parts.append(win.filter(pa.array(valid)))
        docs.append(doc_of[:W][valid])
    short = (k > 0) & (k < n)
    if short.any():
        sd = np.nonzero(short)[0]
        kd = k[sd]
        off = np.concatenate(([0], np.cumsum(k)))[:-1]
        ends = np.cumsum(kd)
        starts = np.concatenate(([0], ends[:-1]))
        tot = int(ends[-1])
        idx = (np.repeat(off[sd], kd)
               + np.arange(tot, dtype=np.int64) - np.repeat(starts, kd))
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], ends)), pa.int32()),
            vals.take(pa.array(idx)))
        parts.append(pc.binary_join(la, " "))
        docs.append(sd)
    if not parts:
        return pa.array([], pa.string()), np.empty(0, np.int64), D
    grams = pa.concat_arrays([p.combine_chunks() if isinstance(
        p, pa.ChunkedArray) else p for p in parts])
    return grams, np.concatenate(docs), D


def _distinct_per_doc(hv: np.ndarray, doc: np.ndarray,
                      n_docs: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc sorted-distinct over flat (hash, doc) rows -> the
    ``(flat, lens)`` offsets form with ONE lexsort — replaces the
    per-doc ``np.unique`` loop (same values: np.unique also sorts)."""
    if len(hv) == 0:
        return np.empty(0, np.uint64), np.zeros(n_docs, np.int64)
    order = np.lexsort((hv, doc))
    h, d = hv[order], doc[order]
    keep = np.empty(len(h), bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
    return h[keep], np.bincount(
        d[keep], minlength=n_docs).astype(np.int64)


def word_shingles_flat(texts, n: int = 3) -> tuple[np.ndarray,
                                                   np.ndarray]:
    """``word_shingles_batch`` straight from the raw TEXT column —
    no per-doc tokenize / gram-window Python loops anywhere: Arrow
    split -> flat gram strings -> one SipHash kernel -> one-lexsort
    per-doc distinct. Values identical to the per-doc path."""
    grams, doc, D = gram_strings_flat(texts, n)
    hv = (hash64(grams.to_numpy(zero_copy_only=False))
          if len(grams) else np.empty(0, np.uint64))
    return _distinct_per_doc(hv, doc, D)


def md5_shingles_flat(texts, n: int = 3) -> tuple[np.ndarray,
                                                  np.ndarray]:
    """``md5_shingles_batch`` straight from the raw TEXT column in the
    flat offsets form — the gram strings never become Python objects:
    Arrow split -> gram StringArray -> DuckDB md5 kernel zero-copy ->
    one-lexsort per-doc distinct. Values identical to the per-doc
    path (same md5, same distinct sets)."""
    grams, doc, D = gram_strings_flat(texts, n)
    hv = md5_upper64_flat(grams)
    return _distinct_per_doc(hv, doc, D)


def minhash_signatures_flat(flat: np.ndarray, lens: np.ndarray,
                            k: int = 64, seed: int = 7) -> np.ndarray:
    """``minhash_signatures`` from the ``(flat, lens)`` offsets form
    (no list-of-arrays materialization). Empty docs get all-max
    sentinel rows, exactly like the list form."""
    a, b = _hash_params(k, seed)
    lens = np.asarray(lens, np.int64)
    out = np.full((len(lens), k), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    if len(flat) == 0:
        return out
    nonempty = lens > 0
    offsets = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
    with np.errstate(over="ignore"):
        for j in range(k):
            hv = (a[j] * flat + b[j]) % np.uint64(_MERSENNE)
            out[nonempty, j] = np.minimum.reduceat(hv, offsets)
    return out
