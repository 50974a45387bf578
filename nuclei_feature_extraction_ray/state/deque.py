"""Monotonic-deque window state (SURVEY.md §2.3 ST6).

Rolling extremes over a trailing window in amortized O(1) per element:
the deque holds indices whose values are strictly more extreme than
everything after them; the front is the current window's extremum and
expires when it leaves the window. Two forms:

* ``MonotonicDeque`` — the streaming data structure itself, usable when
  batches of one sorted partition are fed incrementally to an actor;
* ``sliding_extreme`` / ``sliding_extreme_time`` — vectorized batch
  versions of the same algorithm used inside the per-partition feature
  stage (the whole sorted partition is in hand, so the O(n) pass runs
  in one numpy-assisted sweep).

Both produce identical results; tests cross-check them and pandas.
"""

from __future__ import annotations

from collections import deque

import numpy as np


class MonotonicDeque:
    """Streaming rolling min/max over a count- or time-bounded trailing
    window. ``push(ts, value)`` then ``extreme()``; ``ts`` must be
    non-decreasing (sorted-partition precondition = watermark)."""

    def __init__(self, mode: str = "min",
                 window_rows: int | None = None,
                 window_span: float | None = None):
        assert mode in ("min", "max")
        assert (window_rows is None) != (window_span is None)
        self._better = (lambda a, b: a <= b) if mode == "min" else \
            (lambda a, b: a >= b)
        self.rows = window_rows
        self.span = window_span
        self.dq: deque[tuple[int, float, float]] = deque()  # (idx, ts, val)
        self.n = 0

    def push(self, ts: float, value: float) -> None:
        while self.dq and self._better(value, self.dq[-1][2]):
            self.dq.pop()
        self.dq.append((self.n, ts, value))
        self.n += 1
        if self.rows is not None:
            lo = self.n - self.rows
            while self.dq[0][0] < lo:
                self.dq.popleft()
        else:
            # Window is CLOSED on the left: [ts - span, ts], matching
            # SQL RANGE ... PRECEDING and window.time_window_lefts.
            while self.dq[0][1] < ts - self.span:
                self.dq.popleft()

    def extreme(self) -> float:
        return self.dq[0][2]


def sliding_extreme(values: np.ndarray, window: int,
                    mode: str = "min") -> np.ndarray:
    """Trailing row-window extremum for every position (window = current
    + window-1 preceding; partial windows at the start are allowed).
    One deque pass — O(n)."""
    out = np.empty(len(values), dtype=np.float64)
    dq = MonotonicDeque(mode, window_rows=window)
    for i, v in enumerate(values):
        dq.push(float(i), float(v))
        out[i] = dq.extreme()
    return out


def sliding_extreme_time(ts_us: np.ndarray, values: np.ndarray,
                         span_us: int, mode: str = "min") -> np.ndarray:
    """Trailing time-window extremum: rows j with
    ``ts_i - span <= ts_j <= ts_i``. ``ts_us`` must be sorted."""
    out = np.empty(len(values), dtype=np.float64)
    dq = MonotonicDeque(mode, window_span=float(span_us))
    for i in range(len(values)):
        dq.push(float(ts_us[i]), float(values[i]))
        out[i] = dq.extreme()
    return out


def trailing_time_window_bounds(ts_us: np.ndarray,
                                span_us: int) -> np.ndarray:
    """For sorted ``ts_us``, the left index of each row's trailing
    closed time window ``[ts - span, ts]`` — vectorized (searchsorted);
    used for windowed sums/counts via prefix sums without a Python loop.
    """
    return np.searchsorted(ts_us, ts_us - span_us, side="left")
