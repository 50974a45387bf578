# round-5 session-2 additions, batch 13: clamped running balance
# (floor-at-zero stateful scan via its prefix-min closed form),
# T5-style deterministic span corruption, and linear-interpolation
# gap fill onto an hourly grid.
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat
from ...stages.window import segment_codes
from ._shared import (EVENTS_P, ORACLE, _events, _path, np, pa,
                      partitioned_apply, pc, pd, ray, rd, register)

_SPAN_LEN = 32  # span-corruption mask length (characters)


@register("clamped_balance", sql="""
    WITH d AS (SELECT user_id, event_id, ts,
                 CASE WHEN event_type IN ('purchase', 'signup')
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE -CAST(floor(value * 100 + 0.5) AS BIGINT)
                 END AS delta
               FROM events),
    s AS (SELECT user_id, event_id, ts,
            sum(delta) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS rs
          FROM d)
    SELECT user_id, event_id,
           CAST(rs - least(min(rs) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING),
                           0) AS BIGINT) AS balance_cents
    FROM s""")
def clamped_balance(sf_dir: str):
    """Floor-at-zero running balance: credits (purchase/signup cents)
    and debits (all other events) folded per user in time order with
    the balance clamped at zero after EVERY step — the inventory /
    wallet semantics (you can't spend below zero) that a naive window
    sum cannot express. Both engines use the closed form
    b_n = S_n − min(0, min_{k≤n} S_k) (provable by induction over the
    clamp recurrence), which turns the sequential stateful scan into
    two vectorized prefix passes: a groupby cumsum and a groupby
    cummin — C kernels across ALL users in a partition at once, after
    ONE hash exchange on user_id. The oracle evaluates the identical
    algebra with nested window sums; the inner ORDER BY event_id in
    the outer min() window is the same total order because the rs CTE
    already fixed each row's prefix. Integer cents throughout."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                          "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(g["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        credit = g["event_type"].isin(("purchase", "signup")) \
            .to_numpy()
        delta = np.where(credit, cents, -cents)
        uid = g["user_id"].to_numpy(np.int64)
        s = pd.Series(delta).groupby(uid, sort=False).cumsum() \
            .to_numpy(np.int64)
        m = pd.Series(s).groupby(uid, sort=False).cummin() \
            .to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": uid,
            "event_id": g["event_id"].to_numpy(np.int64),
            "balance_cents": s - np.minimum(m, 0)})

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])


@register("span_corruption", sql="""
    SELECT doc_id,
           CAST(s AS BIGINT) AS span_start,
           substr(text, 1, s) || '<extra_id_0>' ||
             substr(text, s + {L} + 1) AS masked,
           substr(text, s + 1, {L}) AS target
    FROM (SELECT doc_id, text,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                      1, 16))::UBIGINT
                      % CAST(length(text) - {L} AS UBIGINT)
                      AS BIGINT) AS s
          FROM documents WHERE length(text) > {L} + 1)""".format(
    L=_SPAN_LEN))
def span_corruption(sf_dir: str):
    """T5-style span corruption: a deterministic {L}-character span of
    each document replaced by a sentinel, with the removed span kept
    as the denoising target — the self-supervised pretraining pair
    generator. The span start is a content hash (md5 of the doc id mod
    the valid range), so the masking is reproducible across runs and
    engines with no RNG state; lengths are CHARACTER counts so CJK
    rows mask correctly. Map-only: each batch hashes its ids through
    the shared md5 C kernel and performs per-row string surgery (the
    only per-row Python — string splice is O(span) C either way);
    at 100 TB this is a pure streaming projection, zero exchange."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    L = _SPAN_LEN

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].fillna("").to_numpy(object)
        nch = np.fromiter((len(t) for t in texts), np.int64,
                          len(texts))
        keep = nch > L + 1
        ids = b["doc_id"].to_numpy(np.int64)[keep]
        texts = texts[keep]
        nch = nch[keep]
        h = md5_upper64_flat(pd.Series(ids).astype(str)
                             .to_numpy(object))
        s = (h % (nch - L).astype(np.uint64)).astype(np.int64)
        masked = np.fromiter(
            (t[:st] + "<extra_id_0>" + t[st + L:]
             for t, st in zip(texts, s)), object, len(texts))
        target = np.fromiter(
            (t[st:st + L] for t, st in zip(texts, s)), object,
            len(texts))
        return pd.DataFrame({
            "doc_id": ids, "span_start": s,
            "masked": masked, "target": target})

    return ds.map_batches(fn, batch_format="pandas")


@register("linear_interp_hours", sql="""
    WITH p AS (SELECT user_id, ts, value FROM (
             SELECT user_id, ts, value,
                    row_number() OVER (PARTITION BY user_id, ts
                                       ORDER BY event_id DESC) AS rn
             FROM events) WHERE rn = 1),
    b AS (SELECT user_id, min(ts) AS mn, max(ts) AS mx
          FROM p GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(
                   date_trunc('hour', mn) + INTERVAL 1 HOUR,
                   date_trunc('hour', mx),
                   INTERVAL 1 HOUR)) AS hour_ts,
                 epoch_us(mx) AS us_mx
          FROM b),
    v AS (SELECT user_id, epoch_us(ts) AS us, value,
                 lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts) AS nxt_us,
                 lead(value) OVER (
                   PARTITION BY user_id ORDER BY ts) AS nxt_v
          FROM p)
    SELECT g.user_id, g.hour_ts,
           v.value + (v.nxt_v - v.value)
             * (CAST(epoch_us(g.hour_ts) - v.us AS DOUBLE)
                / CAST(v.nxt_us - v.us AS DOUBLE)) AS value_interp
    FROM g JOIN v ON g.user_id = v.user_id
       AND epoch_us(g.hour_ts) >= v.us
       AND epoch_us(g.hour_ts) < v.nxt_us
    WHERE epoch_us(g.hour_ts) < g.us_mx""")
def linear_interp_hours(sf_dir: str):
    """Linear-interpolation gap fill onto the hourly grid: at every
    full-hour mark strictly inside a user's observation span, the
    value linearly interpolated between the neighboring events —
    resample_locf's continuous twin (LOCF holds the last value; this
    draws the line). Equal-timestamp runs collapse to their last
    event (row_number DESC == keep='last') so the series is a
    function of time; the interpolation expression
    v0 + (v1−v0)·((t−t0)/(t1−t0)) is evaluated in the identical
    double order in both engines. Same scale shape as resample_locf:
    one user_id exchange, entity-grain loop, span-bounded row
    expansion."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    _HOUR = 3_600_000_000

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "ts"], keep="last")
        us_all = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v_all = g["value"].to_numpy(np.float64)
        uid_all = g["user_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], uid_all[1:] != uid_all[:-1])))
        ends = np.append(starts[1:], len(g))
        users, hours, vals = [], [], []
        for st, en in zip(starts, ends):
            us = us_all[st:en]
            lo = us[0] // _HOUR + 1
            hi = us[-1] // _HOUR
            h_us = np.arange(lo, hi + 1, dtype=np.int64) * _HOUR
            h_us = h_us[h_us < us[-1]]
            if len(h_us) == 0:
                continue
            i0 = np.searchsorted(us, h_us, side="right") - 1
            t0 = us[i0]
            t1 = us[i0 + 1]
            v0 = v_all[st:en][i0]
            v1 = v_all[st:en][i0 + 1]
            frac = (h_us - t0).astype(np.float64) \
                / (t1 - t0).astype(np.float64)
            users.append(np.full(len(h_us), uid_all[st], np.int64))
            hours.append(h_us)
            vals.append(v0 + (v1 - v0) * frac)
        if not users:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "hour_ts": pd.Series(dtype="datetime64[us]"),
                "value_interp": pd.Series(dtype=np.float64)})
        return pd.DataFrame({
            "user_id": np.concatenate(users),
            "hour_ts": np.concatenate(hours)
                .astype("datetime64[us]"),
            "value_interp": np.concatenate(vals)})

    return partitioned_apply(ds, "user_id", fn, EVENTS_P,
                             sort_cols=["user_id", "ts", "event_id"])
