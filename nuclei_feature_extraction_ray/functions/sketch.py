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
