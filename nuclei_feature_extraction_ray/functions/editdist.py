"""Vectorized pairwise Levenshtein distance.

Unit-cost insert/delete/substitute (no transposition) — the classic
Wagner-Fischer DP, matching DuckDB's ``levenshtein()`` — evaluated for
a whole LIST of (a, b) string pairs at once: the DP table rows are
numpy vectors over all pairs simultaneously, so the Python-level loop
is only max_len(a) x max_len(b) iterations regardless of how many
pairs are scored (record-linkage blocks score hundreds of pairs per
kernel call; a per-pair Python DP would be ~1000x more interpreter
iterations).
"""
from __future__ import annotations

import numpy as np


def _encode(strs, width: int) -> np.ndarray:
    """(n, width) uint32 codepoint matrix, 0-padded."""
    out = np.zeros((len(strs), width), np.uint32)
    for i, s in enumerate(strs):
        if s:
            out[i, :len(s)] = np.frombuffer(
                s.encode("utf-32-le"), np.uint32)
    return out


def levenshtein_pairs(a_strs, b_strs) -> np.ndarray:
    """Levenshtein distance for each aligned pair (a_strs[i],
    b_strs[i]); returns int64[n]."""
    a_strs = list(a_strs)
    b_strs = list(b_strs)
    n = len(a_strs)
    if n != len(b_strs):
        raise ValueError("levenshtein_pairs: length mismatch")
    if n == 0:
        return np.zeros(0, np.int64)
    la = np.asarray([len(s) for s in a_strs], np.int64)
    lb = np.asarray([len(s) for s in b_strs], np.int64)
    ma, mb = int(la.max()), int(lb.max())
    if ma == 0 or mb == 0:
        return np.where(la == 0, lb, np.where(lb == 0, la, 0))
    A = _encode(a_strs, ma)
    B = _encode(b_strs, mb)

    # prev[p, j] = D[i-1][j] for all pairs p; roll i over a's chars.
    BIG = np.int64(1) << 40
    cols = np.arange(mb + 1, dtype=np.int64)
    prev = np.broadcast_to(cols, (n, mb + 1)).copy()
    # columns beyond a pair's own b-length are masked out at the end
    # (they never flow back into valid cells: DP deps go left/up only).
    result = np.where(la == 0, lb, 0).astype(np.int64)
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        # rows where a is shorter than i are frozen (their result was
        # already captured); keep computing harmlessly.
        ai = A[:, i - 1][:, None]                     # (n, 1)
        sub_cost = (ai != B).astype(np.int64)         # (n, mb)
        dele = prev[:, 1:] + 1
        subst = prev[:, :-1] + sub_cost
        # insertions need a left-to-right scan: cur[j] depends on
        # cur[j-1]. Use the standard two-pass trick: first take
        # min(delete, substitute), then a running prefix pass for
        # insertions.
        best = np.minimum(dele, subst)
        cur[:, 1:] = best
        run = cur[:, 0]
        for j in range(1, mb + 1):
            run = np.minimum(cur[:, j], run + 1)
            cur[:, j] = run
        done = la == i
        if done.any():
            result[done] = cur[done, lb[done]]
        prev = cur
    result[la > ma] = BIG  # unreachable; defensive
    return result
