# round-5 session-5 additions, batch 66: the paired sign test on
# daily arm differences and the peak-hour shift between corpus
# halves.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)


@register("sign_test", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                               ELSE 0 END) AS BIGINT) AS t0,
                      CAST(sum(CASE WHEN user_id % 2 = 0
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s0,
                      CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1
                               ELSE 0 END) AS BIGINT) AS t1,
                      CAST(sum(CASE WHEN user_id % 2 = 1
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s1
               FROM events GROUP BY 1),
    v AS (SELECT CASE WHEN CAST(s1 AS HUGEINT) * t0
                           > CAST(s0 AS HUGEINT) * t1 THEN 1
                      WHEN CAST(s1 AS HUGEINT) * t0
                           < CAST(s0 AS HUGEINT) * t1 THEN -1
                      ELSE 0 END AS sgn
          FROM d WHERE t0 > 0 AND t1 > 0),
    s AS (SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS pos,
                 CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS neg,
                 CAST(sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS ties
          FROM v)
    SELECT pos AS n_positive, neg AS n_negative, ties AS n_ties,
           (CAST(pos AS DOUBLE) - CAST(neg AS DOUBLE))
           / sqrt(CAST(pos + neg AS DOUBLE)) AS sign_z
    FROM s""")
def sign_test(sf_dir: str):
    """PAIRED SIGN TEST on daily arm conversion-rate differences:
    which arm wins each day is decided by the EXACT integer
    cross-multiplication s1*t0 vs s0*t1 (exact ties counted
    separately and dropped from the statistic, the textbook rule),
    z = (pos - neg)/sqrt(pos + neg) — the assumption-free floor
    under paired_t: it needs NOTHING about the difference
    distribution, only day-level win/lose. Not one float exists
    before the final z. Scale plan: day-arm cells through the
    bounded day-domain combine; the sign census is O(days) driver
    work."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        arm = b["user_id"].to_numpy(np.int64) % 2
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "t0": (arm == 0).astype(np.int64),
            "s0": ((arm == 0) & (pur == 1)).astype(np.int64),
            "t1": (arm == 1).astype(np.int64),
            "s1": ((arm == 1) & (pur == 1)).astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        for c in ("t0", "s0", "t1", "s1"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["t0", "s0", "t1", "s1"], exact_int=True)
    pos = neg = ties = 0
    for _, r in d.iterrows():
        t0, s0 = int(r["t0"]), int(r["s0"])
        t1, s1 = int(r["t1"]), int(r["s1"])
        if t0 <= 0 or t1 <= 0:
            continue
        lhs, rhs = s1 * t0, s0 * t1
        if lhs > rhs:
            pos += 1
        elif lhs < rhs:
            neg += 1
        else:
            ties += 1
    return pd.DataFrame({
        "n_positive": [np.int64(pos)],
        "n_negative": [np.int64(neg)],
        "n_ties": [np.int64(ties)],
        "sign_z": [(np.float64(pos) - np.float64(neg))
                   / np.sqrt(np.float64(pos + neg))]})


@register("peak_shift", sql="""
    WITH b AS (SELECT CAST(floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400)
                           + CAST((floor(epoch((SELECT max(ts)
                                        FROM events)) / 86400)
                                   - floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400))
                                  // 2 AS BIGINT) AS BIGINT)
                        AS mid),
    e AS (SELECT CASE WHEN CAST(floor(epoch(ts) / 86400)
                           AS BIGINT) <= (SELECT mid FROM b)
                      THEN 0 ELSE 1 END AS era,
                 CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT)
                   AS hour
          FROM events),
    t AS (SELECT era, hour, CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY era, hour),
    c AS (SELECT era,
                 CAST(sum(n * CAST(floor(cos(CAST(hour AS DOUBLE)
                      * 2.0 * pi() / 24.0) * 1000000.0 + 0.5)
                      AS BIGINT)) AS BIGINT) AS sc,
                 CAST(sum(n * CAST(floor(sin(CAST(hour AS DOUBLE)
                      * 2.0 * pi() / 24.0) * 1000000.0 + 0.5)
                      AS BIGINT)) AS BIGINT) AS ss
          FROM t GROUP BY era),
    m AS (SELECT
        (SELECT atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
         FROM c WHERE era = 0) AS a0,
        (SELECT atan2(CAST(ss AS DOUBLE), CAST(sc AS DOUBLE))
         FROM c WHERE era = 1) AS a1)
    SELECT a0 * 24.0 / (2.0 * pi()) AS peak_hour_first,
           a1 * 24.0 / (2.0 * pi()) AS peak_hour_second,
           ((a1 - a0) * 24.0 / (2.0 * pi()) + 36.0)
           - floor((((a1 - a0) * 24.0 / (2.0 * pi()) + 36.0)
                    / 24.0)) * 24.0 - 12.0 AS shift_hours
    FROM m""")
def peak_shift(sf_dir: str):
    """PEAK-HOUR SHIFT between corpus halves: the circular mean
    hour of activity in the first half of the day span versus the
    second, and their wrapped angular difference in hours — did
    the daily rhythm MOVE (timezone mix change, audience shift)?
    The temporal-drift question circular_stats_by_type's static
    concentration cannot answer. Hour buckets and the 24 fixed
    cos/sin micro weights give exact integer resultants per era;
    the two atan2 angles and the [-12, 12) wrap are shared float
    expressions. Scale plan: the 2 x 24 grid census, map-only;
    angles are O(1) driver arithmetic."""
    ds = _events(sf_dir, ["ts"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        us = (b["ts"].astype("datetime64[us]").to_numpy()
              .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mn": [int(us.min())],
                             "mx": [int(us.max())]})

    bd = ds.map_batches(bounds, batch_format="pandas").to_pandas()
    mid = int(bd["mn"].min()) + (int(bd["mx"].max())
                                 - int(bd["mn"].min())) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        day = us // 86400000000
        era = (day > mid).astype(np.int64)
        hour = (us // 3600000000) % 24
        g = pd.DataFrame({"era": era,
                          "hour": hour.astype(np.int64),
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["era", "hour"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    t = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["era", "hour"], ["n"])
    ang = np.arange(24, dtype=np.float64) * 2.0 * np.pi / 24.0
    cosm = np.floor(np.cos(ang) * 1000000.0 + 0.5).astype(np.int64)
    sinm = np.floor(np.sin(ang) * 1000000.0 + 0.5).astype(np.int64)
    a = {}
    for era, g in t.groupby("era"):
        n = g["n"].to_numpy(np.int64)
        h = g["hour"].to_numpy(np.int64)
        sc = int((n * cosm[h]).sum())
        ss = int((n * sinm[h]).sum())
        a[int(era)] = np.arctan2(np.float64(ss), np.float64(sc))
    p0 = a[0] * 24.0 / (2.0 * np.pi)
    p1 = a[1] * 24.0 / (2.0 * np.pi)
    raw = (a[1] - a[0]) * 24.0 / (2.0 * np.pi) + 36.0
    shift = raw - np.floor(raw / 24.0) * 24.0 - 12.0
    return pd.DataFrame({
        "peak_hour_first": [np.float64(p0)],
        "peak_hour_second": [np.float64(p1)],
        "shift_hours": [np.float64(shift)]})
