# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (EVENTS_P, _combine_partials, _events, np, partitioned_apply, pd, register)

_MERGE_WINDOW_SEC = 3600


@register("user_streaks", sql="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
               FROM events),
    g AS (SELECT user_id, day,
                 day - CAST(row_number() OVER (
                     PARTITION BY user_id ORDER BY day)
                     AS INTEGER) AS anchor
          FROM d),
    s AS (SELECT user_id, anchor, count(*) AS streak
          FROM g GROUP BY user_id, anchor)
    SELECT user_id,
           CAST(max(streak) AS BIGINT) AS max_streak,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(sum(streak) AS BIGINT) AS active_days
    FROM s GROUP BY user_id ORDER BY user_id""")
def user_streaks(sf_dir: str):
    """Gaps-and-islands activity streaks: per user, the longest run of
    CONSECUTIVE active calendar days, how many distinct runs, and
    total active days — the classic engagement / freshness feature a
    training-data curator derives from event logs. Scale plan: each
    batch collapses to DISTINCT (user, day) rows first (bounded by
    users x days, not event count), ONE hash exchange on user_id
    co-locates each user's days, and the island arithmetic
    (day - rank) runs vectorized across ALL users in a partition via
    two numpy diffs + a C groupby — never a per-user Python loop."""
    ds = _events(sf_dir, columns=["user_id", "ts"])

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "day": b["ts"].dt.normalize().to_numpy()})
        return d.drop_duplicates(ignore_index=True)

    def islands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "day"])
        g = g.sort_values(["user_id", "day"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        days = g["day"].to_numpy("datetime64[D]").astype(np.int64)
        if not len(u):
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "max_streak": pd.Series(dtype=np.int64),
                "n_streaks": pd.Series(dtype=np.int64),
                "active_days": pd.Series(dtype=np.int64)})
        brk = np.r_[True, (u[1:] != u[:-1])
                    | ((days[1:] - days[:-1]) != 1)]
        grp = np.cumsum(brk)
        runs = pd.DataFrame({"user_id": u, "grp": grp}).groupby(
            ["user_id", "grp"], as_index=False).agg(
                streak=("grp", "size"))
        out = runs.groupby("user_id", as_index=False).agg(
            max_streak=("streak", "max"),
            n_streaks=("streak", "size"),
            active_days=("streak", "sum"))
        return out.astype({"user_id": np.int64, "max_streak": np.int64,
                           "n_streaks": np.int64,
                           "active_days": np.int64})

    out = partitioned_apply(
        ds.map_batches(day_partial, batch_format="pandas"),
        "user_id", islands, EVENTS_P).to_pandas()
    return out.sort_values("user_id",
                           kind="mergesort").reset_index(drop=True)


@register("interval_merge", sql="""
    WITH iv AS (SELECT user_id, ts AS s,
                       ts + INTERVAL 1 HOUR AS e FROM events),
    m AS (SELECT user_id, s, e,
                 CASE WHEN s > max(e) OVER (
                     PARTITION BY user_id ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_grp
          FROM iv),
    g AS (SELECT user_id, s, e,
                 sum(new_grp) OVER (
                     PARTITION BY user_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS grp
          FROM m)
    SELECT user_id, min(s) AS cover_start, max(e) AS cover_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, grp
    ORDER BY user_id, cover_start""")
def interval_merge(sf_dir: str):
    """Interval coalescing (gaps-and-islands over time ranges): each
    event claims a 1-hour window; overlapping windows per user merge
    into maximal covered intervals — the 'busy periods' primitive
    behind rate-limit audits and session coverage maps. Scale plan:
    ONE hash exchange on user_id, then a running 'max end so far'
    per user via a C-level groupby cummax + shift; a new island
    starts where the next start exceeds that watermark. No per-user
    Python loop; interval endpoints stay int64 microseconds on the
    wire."""
    ds = _events(sf_dir, columns=["user_id", "ts"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        s = g["ts"].to_numpy()
        e = s + np.timedelta64(_MERGE_WINDOW_SEC, "s")
        f = pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                          "s": s, "e": e})
        prev_max_e = f.groupby("user_id")["e"].transform(
            lambda col: col.cummax().shift(1))
        new_grp = (f["s"] > prev_max_e) | prev_max_e.isna()
        f["grp"] = new_grp.to_numpy().cumsum()
        out = f.groupby(["user_id", "grp"], as_index=False).agg(
            cover_start=("s", "min"), cover_end=("e", "max"),
            n_events=("s", "size"))
        out["n_events"] = out["n_events"].astype(np.int64)
        return out.drop(columns=["grp"])

    out = partitioned_apply(ds, "user_id", merge, EVENTS_P).to_pandas()
    return out.sort_values(["user_id", "cover_start"],
                           kind="mergesort").reset_index(drop=True)


@register("cumulative_users", sql="""
    WITH f AS (SELECT user_id, min(ts) AS first_ts
               FROM events GROUP BY user_id),
    m AS (SELECT CAST(first_ts AS DATE) AS day,
                 CAST(count(*) AS BIGINT) AS new_users
          FROM f GROUP BY 1)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT)
               AS cum_users
    FROM m ORDER BY day""")
def cumulative_users(sf_dir: str):
    """First-seen growth curve: per calendar day, how many users
    appeared for the FIRST time, and the running total — the corpus
    growth / contributor-accretion view. Scale plan: per-batch
    (user, min ts) partials, ONE hash exchange on user_id finishes
    the exact first-seen instant (user cardinality is fact-sized —
    never a driver combine), partitions re-collapse to the bounded
    calendar-day grid, and only that tiny grid reaches the driver
    for the cumulative sum."""
    ds = _events(sf_dir, columns=["user_id", "ts"])

    def first_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", as_index=False)["ts"].min()
        return pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                             "ts": g["ts"].to_numpy()})

    def day_grid(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby("user_id", as_index=False)["ts"].min()
        d = pd.DataFrame({"day": f["ts"].dt.normalize().to_numpy()})
        c = d.groupby("day", as_index=False).agg(n=("day", "size"))
        c["n"] = c["n"].astype(np.int64)
        return c

    grid = _combine_partials(
        partitioned_apply(
            ds.map_batches(first_partial, batch_format="pandas"),
            "user_id", day_grid, EVENTS_P),
        ["day"], ["n"]).rename(columns={"n": "new_users"})
    grid = grid.sort_values("day",
                            kind="mergesort").reset_index(drop=True)
    grid["new_users"] = grid["new_users"].astype(np.int64)
    grid["cum_users"] = grid["new_users"].cumsum().astype(np.int64)
    return grid
