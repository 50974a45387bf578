"""Approximate sketches: HyperLogLog distinct counting, plus the
exact distinct-count op it approximates.

SURVEY.md §2.5/§2.6 mark distinct/sketches absent from the reference;
at 100 TB the manifest wants cheap per-partition cardinality metrics
(approx distinct urls) and audits want the exact count. Both are
combiner-style: per-batch partials (a 2^p-byte register array / a
deduplicated key set) merged associatively, so the shuffle moves
kilobytes regardless of corpus size.

HLL per Flajolet et al. (2007): register index = top p bits of a
64-bit hash, rank = leading-zero count of the remainder + 1, estimate
= alpha_m * m^2 / sum(2^-reg) with linear-counting small-range
correction. Standard error ~ 1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .hashing import hash64

HLL_P = 12
_M = 1 << HLL_P


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _lz_plus_one(rest: np.ndarray, width: int) -> np.ndarray:
    """Leading zeros of the top ``width`` bits of uint64 values, + 1
    (capped at width+1 for an all-zero remainder). Exact — no float
    log tricks (float64 conversion mis-rounds near powers of two)."""
    rank = np.full(len(rest), width + 1, np.uint8)
    v = rest.copy()
    found = v == 0
    mask = np.uint64(1) << np.uint64(63)
    r = 1
    while not found.all() and r <= width:
        top = (v & mask) != 0
        rank[top & ~found] = r
        found |= top
        v = v << np.uint64(1)
        r += 1
    return rank


def hll_partial(values) -> np.ndarray:
    """Register array (uint8, len 2^p) for one batch of values."""
    h = hash64(np.asarray(values, dtype=object))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rank = _lz_plus_one(h << np.uint64(HLL_P), 64 - HLL_P)
    regs = np.zeros(_M, np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    regs = np.zeros(_M, np.uint8)
    for p in parts:
        np.maximum(regs, p, out=regs)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = float(_M)
    est = _alpha(_M) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str) -> int:
    """Streaming HLL over a Dataset column: per-batch register
    partials (4 KiB each) are tree-merged by an intermediate combiner
    stage (256 partials -> 1) so the driver sees ~blocks/256 rows
    regardless of corpus size, then max-merged. No shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    def combine(batch: pa.Table) -> pa.Table:
        regs = hll_merge([np.frombuffer(b, np.uint8)
                          for b in batch["regs"].to_pylist()])
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          pa.binary())})

    parts = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .map_batches(combine, batch_format="pyarrow",
                     batch_size=256).to_pandas()
    regs = hll_merge([np.frombuffer(b, np.uint8)
                      for b in parts["regs"]])
    return int(round(hll_estimate(regs)))


def distinct_count(ds, col: str, num_partitions: int = 16) -> int:
    """EXACT distinct count: per-batch local dedup (so only unique
    values leave each block), hash partition by value, per-partition
    dedup + count, tiny driver sum."""
    from ..stages.partition import partition_map

    def local_unique(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({col: pc.unique(batch[col])})

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [np.int64(g[col].nunique())]})

    uniq = ds.select_columns([col]).map_batches(
        local_unique, batch_format="pyarrow")
    parts = partition_map(uniq, [col], count_part,
                          num_partitions).to_pandas()
    return int(parts["n"].sum())


# ---------------------------------------------------------------------------
# Histogram quantile sketch — the bounded-memory scale path for grouped
# quantiles. Exact quantiles need every value of a group in one task
# (fine for bounded values-per-group, see queries.lang_quantiles);
# this sketch keeps a FIXED nbins-long count vector per group instead:
# per-batch partial histograms merge by addition (associative,
# retry-idempotent), and the quantile interpolates inside the winning
# bin. Error is bounded by one bin width of the value range.
# ---------------------------------------------------------------------------

def hist_partial(values: np.ndarray, lo: float, hi: float,
                 nbins: int) -> np.ndarray:
    """int64[nbins] counts of ``values`` over [lo, hi] equal-width
    bins; out-of-range values clip into the edge bins."""
    idx = np.floor((np.asarray(values, np.float64) - lo)
                   * (nbins / (hi - lo))).astype(np.int64)
    np.clip(idx, 0, nbins - 1, out=idx)
    return np.bincount(idx, minlength=nbins).astype(np.int64)


def hist_quantile(counts: np.ndarray, lo: float, hi: float,
                  q: float) -> float:
    """Continuous quantile estimate from a histogram: find the bin
    holding rank q*(n-1), interpolate linearly within it."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    rank = q * (n - 1)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, rank, side="right"))
    b = min(b, len(counts) - 1)
    prev = cum[b - 1] if b > 0 else 0
    in_bin = counts[b]
    frac = (rank - prev) / in_bin if in_bin > 0 else 0.5
    w = (hi - lo) / len(counts)
    return float(lo + (b + frac) * w)


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership at fixed memory
# ---------------------------------------------------------------------------

def bloom_positions(h: np.ndarray, m_bits: int,
                    k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h1 + i*h2) mod m. h2 derives from h with a splitmix64
    finalizer so the two streams are independent; h2 is forced odd so
    it cycles the full (power-of-two) table."""
    h1 = np.asarray(h, np.uint64)
    z = (h1 + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits))


def bloom_partial(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """Bitmap partial (uint8 array of m_bits/8) for one batch of
    64-bit element hashes — OR-mergeable, so the distributed build is
    per-batch partials tree-merged exactly like the HLL registers."""
    bmp = np.zeros(m_bits >> 3, np.uint8)
    if len(h):
        pos = bloom_positions(h, m_bits, k).ravel()
        np.bitwise_or.at(bmp, (pos >> np.uint64(3)).astype(np.int64),
                         np.left_shift(
                             np.uint8(1),
                             (pos & np.uint64(7)).astype(np.uint8)))
    return bmp


def bloom_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        np.bitwise_or(out, p, out=out)
    return out


def bloom_contains(bmp: np.ndarray, h: np.ndarray,
                   k: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set
    (no false negatives; false-positive rate ~ (1 - e^{-kn/m})^k)."""
    if not len(h):
        return np.zeros(0, bool)
    m_bits = len(bmp) << 3
    pos = bloom_positions(h, m_bits, k)
    byte = (pos >> np.uint64(3)).astype(np.int64)
    bit = (pos & np.uint64(7)).astype(np.uint8)
    return ((bmp[byte] >> bit) & 1).all(axis=1)


# ---------------------------------------------------------------------------
# Count-min sketch — fixed-memory frequency estimation (Cormode &
# Muthukrishnan, J. Algorithms 2005). d independent hash rows of w
# counters; update adds 1 to one counter per row, query takes the MIN
# across rows. Estimates NEVER undercount (one-sided: est >= true),
# and overcount by at most eps*N with prob 1-delta for w = e/eps,
# d = ln(1/delta). Partials merge by ADDITION (associative,
# retry-idempotent), so the distributed build is per-batch partials
# tree-merged exactly like the HLL registers / Bloom bitmaps.
# ---------------------------------------------------------------------------

CMS_D = 4            # rows: delta = e^-4 ~ 1.8%
CMS_W_LOG2 = 12      # 4096 counters/row: eps = e/4096 ~ 0.066% of N
_CMS_W = 1 << CMS_W_LOG2

#: odd multipliers for the d row mixes (splitmix64-style finalizer
#: constants and variants — any fixed odd constants work)
_CMS_MULT = np.array([0xff51afd7ed558ccd, 0xc4ceb9fe1a85ec53,
                      0x9e3779b97f4a7c15, 0xbf58476d1ce4e5b9],
                     dtype=np.uint64)


def _cms_cols(h: np.ndarray) -> np.ndarray:
    """(d, n) column indices from pre-hashed uint64 keys:
    multiply-shift hashing (one odd multiplier per row, top
    CMS_W_LOG2 bits as the column) — 2-universal, which is all CMS
    needs. (A previous xor-shift here only touched bits BELOW the
    extracted top-12 window and was a no-op; removed.)"""
    with np.errstate(over="ignore"):
        mixed = h[None, :] * _CMS_MULT[:, None]
    return (mixed >> np.uint64(64 - CMS_W_LOG2)).astype(np.int64)


def cms_partial(h: np.ndarray) -> np.ndarray:
    """(d, w) int64 count matrix from a batch of pre-hashed keys
    (duplicates accumulate via np.add.at)."""
    sk = np.zeros((CMS_D, _CMS_W), np.int64)
    if len(h):
        cols = _cms_cols(h)
        rows = np.repeat(np.arange(CMS_D), cols.shape[1])
        np.add.at(sk, (rows, cols.ravel()), 1)
    return sk


def cms_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def cms_query(sk: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized point query: min across the d rows — always >= the
    true count, within eps*N of it with prob 1-delta."""
    if not len(h):
        return np.zeros(0, np.int64)
    cols = _cms_cols(h)
    return np.min(
        sk[np.arange(CMS_D)[:, None], cols], axis=0).astype(np.int64)
