# round-5 session-2 additions, batch 5: 2-D Pareto skyline over the
# supplier census, equal-split multi-touch attribution through the
# session pair join, and LOCF resampling onto a dense hourly grid
# (the feature-store "backfill to grid" materialization).
from __future__ import annotations

from ._shared import (EVENTS_P, SESSION_GAP_SEC, _EVW,
                      _combine_partials, _events, _path, np, pa,
                      partition_map, partitioned_apply, pc, pd, ray,
                      rd, register)
from ...stages.window import add_session_ids, segment_codes

#: supplier_skyline: dominance check is a dense k x k numpy pass —
#: exact mirror of the oracle's NOT EXISTS; suppliers are a
#: dimension, so k is bounded (guard below)
_SKYLINE_MAX = 100_000

#: linear_attribution: micro-credit grid (1e6 of a cent-value unit)
_CREDIT_SCALE = 1_000_000.0


@register("supplier_skyline", sql="""
    WITH s AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY 1)
    SELECT a.l_suppkey AS suppkey, a.total_cents, a.n_items
    FROM s a
    WHERE NOT EXISTS (
      SELECT 1 FROM s b
      WHERE b.total_cents <= a.total_cents
        AND b.n_items >= a.n_items
        AND (b.total_cents < a.total_cents
             OR b.n_items > a.n_items))
    ORDER BY suppkey""")
def supplier_skyline(sf_dir: str):
    """2-D Pareto SKYLINE over the supplier census: suppliers no
    other supplier beats on BOTH low total billed cents and high
    item count (strictly on at least one) — the dominance frontier
    behind vendor shortlists and efficient-frontier reports, a
    different operator from part_pareto's cumulative-share ABC cut.
    Plan: lineitem collapses to per-batch (suppkey, cents, items)
    integer partials -> one dimension-bounded combine; the dominance
    test is ONE dense numpy k x k pass on the driver (bit-for-bit the
    oracle's NOT EXISTS, including tie semantics: equal points do not
    dominate each other), guarded at _SKYLINE_MAX suppliers — above
    it, the sort-scan skyline per partition + skyline-of-skylines
    merge is the scale path."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        g = pd.DataFrame({
            "suppkey": b["l_suppkey"].to_numpy(np.int64),
            "total_cents": cents,
            "n_items": np.ones(len(b), np.int64)}) \
            .groupby("suppkey", as_index=False).sum()
        for c in ("total_cents", "n_items"):
            g[c] = g[c].astype(np.int64)
        return g

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["suppkey"], ["total_cents", "n_items"])
    k = len(s)
    if k > _SKYLINE_MAX:
        raise ValueError("supplier_skyline: %d suppliers > %d guard"
                         % (k, _SKYLINE_MAX))
    c = s["total_cents"].to_numpy(np.int64)
    n = s["n_items"].to_numpy(np.int64)
    dom = ((c[:, None] <= c[None, :]) & (n[:, None] >= n[None, :])
           & ((c[:, None] < c[None, :]) | (n[:, None] > n[None, :])))
    keep = ~dom.any(axis=0)
    out = pd.DataFrame({
        "suppkey": s["suppkey"].to_numpy(np.int64)[keep],
        "total_cents": c[keep], "n_items": n[keep]})
    return out.sort_values("suppkey",
                           kind="mergesort").reset_index(drop=True)


@register("linear_attribution", sql="""
    WITH ev AS (
      SELECT event_id, user_id, ts, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS us,
             CAST(extract(hour FROM ts) AS BIGINT) AS hr
      FROM events),
    s AS (
      SELECT *, sum(CASE WHEN gap_sec IS NULL OR gap_sec > {gap}
                    THEN 1 ELSE 0 END)
                  OVER ({w} ROWS UNBOUNDED PRECEDING) AS sid
      FROM (SELECT ev.*, epoch(ts - lag(ts) OVER ({w})) AS gap_sec
            FROM ev) q),
    clicks AS (SELECT user_id, sid, us, hr FROM s
               WHERE event_type = 'click'),
    purch AS (SELECT user_id, sid, us, cents, event_id FROM s
              WHERE event_type = 'purchase'),
    pairs AS (
      SELECT c.hr, p.cents, p.event_id AS pid
      FROM purch p JOIN clicks c
        ON c.user_id = p.user_id AND c.sid = p.sid AND c.us < p.us),
    w AS (SELECT hr, cents,
                 count(*) OVER (PARTITION BY pid) AS n
          FROM pairs)
    SELECT hr AS hour, CAST(count(*) AS BIGINT) AS n_credits,
           CAST(sum(CAST(floor(cents * {sc} / n + 0.5) AS BIGINT))
                AS BIGINT) AS credit_micro
    FROM w GROUP BY hr ORDER BY hr""".format(
        gap=SESSION_GAP_SEC, w=_EVW, sc=_CREDIT_SCALE))
def linear_attribution(sf_dir: str):
    """Equal-split multi-touch attribution: every purchase's value is
    divided equally across ALL its same-session preceding clicks, and
    the credit is rolled up by the CLICK's hour of day — "which
    hours' engagement drives revenue", the linear model between
    last-touch (event_transitions) and position-decay. Per-click
    credit = floor(cents*1e6/n + 0.5) is the identical expression in
    both engines (exact-double regime: cents*1e6 <= 5e10 << 2^53)
    and folds as int64. Plan: one user exchange; inside a partition
    the click<purchase pair set is built with ZERO per-row Python —
    session-prefix click counts via cumsum + equal-ts run starts
    (strict us ordering), ragged-arange pair expansion, one groupby.
    Pair volume is bounded by clicks-per-session x purchases (the
    session gap bounds it; a pathological single session degrades to
    that session's quadratic, the oracle's own cost)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        out_empty = pd.DataFrame({
            "hour": pd.Series(dtype=np.int64),
            "n_credits": pd.Series(dtype=np.int64),
            "credit_micro": pd.Series(dtype=np.int64)})
        if g.empty:
            return out_empty
        g = add_session_ids(g, "user_id", "ts", SESSION_GAP_SEC)
        us = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        # sessions are contiguous in the (user, ts, event_id) sort
        uid = g["user_id"].to_numpy(np.int64)
        sid = g["session_id"].to_numpy(np.int64)
        first = np.ones(len(g), bool)
        first[1:] = (uid[1:] != uid[:-1]) | (sid[1:] != sid[:-1])
        starts = np.zeros(len(g), np.int64)
        starts[first] = np.arange(len(g))[first]
        starts = np.maximum.accumulate(starts)
        run_first = np.ones(len(g), bool)
        run_first[1:] = first[1:] | (us[1:] != us[:-1])
        run_start = np.zeros(len(g), np.int64)
        run_start[run_first] = np.arange(len(g))[run_first]
        run_start = np.maximum.accumulate(run_start)
        is_click = (g["event_type"].to_numpy(object)
                    == "click")
        pre = np.concatenate(([0], np.cumsum(is_click)))
        is_p = g["event_type"].to_numpy(object) == "purchase"
        p_idx = np.flatnonzero(is_p)
        nclk = pre[run_start[p_idx]] - pre[starts[p_idx]]
        has = nclk > 0
        p_idx, nclk = p_idx[has], nclk[has]
        if len(p_idx) == 0:
            return out_empty
        cents = np.floor(g["value"].to_numpy(np.float64)[p_idx]
                         * 100 + 0.5).astype(np.int64)
        credit = np.floor(cents * _CREDIT_SCALE / nclk
                          + 0.5).astype(np.int64)
        click_rows = np.flatnonzero(is_click)
        start_rank = pre[starts[p_idx]]
        total = int(nclk.sum())
        off = np.arange(total) - np.repeat(np.cumsum(nclk) - nclk,
                                           nclk)
        flat_rank = np.repeat(start_rank, nclk) + off
        hrs = ((us[click_rows[flat_rank]]
                // 3_600_000_000) % 24).astype(np.int64)
        out = pd.DataFrame({
            "hour": hrs,
            "n_credits": np.ones(total, np.int64),
            "credit_micro": np.repeat(credit, nclk)}) \
            .groupby("hour", as_index=False).sum()
        for c in ("n_credits", "credit_micro"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = partitioned_apply(ds, "user_id", fn, EVENTS_P,
                              sort_cols=["user_id", "ts", "event_id"])
    out = _combine_partials(parts, ["hour"],
                            ["n_credits", "credit_micro"])
    for c in ("hour", "n_credits", "credit_micro"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("hour",
                           kind="mergesort").reset_index(drop=True)


@register("resample_locf", sql="""
    WITH b AS (SELECT user_id, min(ts) AS mn, max(ts) AS mx
               FROM events GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(
                   date_trunc('hour', mn) + INTERVAL 1 HOUR,
                   date_trunc('hour', mx),
                   INTERVAL 1 HOUR)) AS hour_ts
          FROM b),
    v AS (SELECT user_id, epoch_us(ts) AS us, value,
                 lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events)
    SELECT g.user_id, g.hour_ts, v.value
    FROM g JOIN v ON g.user_id = v.user_id
       AND epoch_us(g.hour_ts) >= v.us
       AND (v.nxt IS NULL OR epoch_us(g.hour_ts) < v.nxt)""")
def resample_locf(sf_dir: str):
    """LOCF resample onto a dense HOURLY grid: for every full-hour
    mark inside each user's observation span, the value of their
    latest event at or before that mark — the "backfill to grid"
    materialization that turns an irregular event stream into the
    fixed-step matrix downstream models consume (the generative twin
    of `backfill`, which fills nulls at observed rows; here the grid
    ROWS are created). Grid semantics match the oracle exactly:
    marks in (trunc(min)+1h .. trunc(max)], LOCF picks the last
    event of an equal-timestamp run (searchsorted side='right' ==
    the oracle's lead-interval join). Row expansion is span-bounded
    (hours per user); the per-user loop is entity-grain, not
    row-grain."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    _HOUR = 3_600_000_000

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        users, hours, vals = [], [], []
        us_all = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v_all = g["value"].to_numpy(np.float64)
        uid_all = g["user_id"].to_numpy(np.int64)
        codes = segment_codes(uid_all)
        starts = np.flatnonzero(np.concatenate(
            ([True], codes[1:] != codes[:-1])))
        ends = np.append(starts[1:], len(g))
        for st, en in zip(starts, ends):
            us = us_all[st:en]
            lo = us[0] // _HOUR + 1
            hi = us[-1] // _HOUR
            if hi < lo:
                continue
            h_us = np.arange(lo, hi + 1, dtype=np.int64) * _HOUR
            idx = np.searchsorted(us, h_us, side="right") - 1
            users.append(np.full(len(h_us), uid_all[st], np.int64))
            hours.append(h_us)
            vals.append(v_all[st:en][idx])
        if not users:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "hour_ts": pd.Series(dtype="datetime64[us]"),
                "value": pd.Series(dtype=np.float64)})
        return pd.DataFrame({
            "user_id": np.concatenate(users),
            "hour_ts": np.concatenate(hours)
                .astype("datetime64[us]"),
            "value": np.concatenate(vals)})

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])
