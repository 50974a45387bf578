# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (EVENTS_P, _combine_partials, _events, np, partitioned_apply, pd, register)
from .q00_documents_per_row import (_vocab_top)

@register("dow_index", sql="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    a AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(n) AS BIGINT) AS n_events
          FROM d GROUP BY dow),
    t AS (SELECT CAST(sum(n_events) AS BIGINT) AS te,
                 CAST(sum(n_days) AS BIGINT) AS td FROM a)
    SELECT dow, n_days, n_events,
           (CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE))
             / (CAST(te AS DOUBLE) / CAST(td AS DOUBLE)) AS dow_index
    FROM a, t ORDER BY dow""")
def dow_index(sf_dir: str):
    """Day-of-week seasonality index: each weekday's mean daily event
    volume relative to the overall daily mean (1.0 = average day) —
    the multiplicative seasonal factor a load model or freshness
    monitor divides out. Bounded calendar-day grid partials, one
    combine, ratios composed identically on the driver."""
    ds = _events(sf_dir, columns=["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"day": b["ts"].dt.normalize().to_numpy()}) \
            .groupby("day", as_index=False).agg(n=("day", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"])
    grid["dow"] = pd.to_datetime(grid["day"]).dt.dayofweek \
        .to_numpy(np.int64) + 1
    a = grid.groupby("dow", as_index=False).agg(
        n_days=("n", "size"), n_events=("n", "sum"))
    te = np.float64(int(a["n_events"].sum()))
    td = np.float64(int(a["n_days"].sum()))
    a = a.astype({"dow": np.int64, "n_days": np.int64,
                  "n_events": np.int64})
    a["dow_index"] = (a["n_events"].to_numpy(np.float64)
                      / a["n_days"].to_numpy(np.float64)) / (te / td)
    return a.sort_values("dow", kind="mergesort").reset_index(drop=True)


@register("new_vs_returning", sql="""
    WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day
               FROM events GROUP BY user_id),
    e AS (SELECT e.user_id, CAST(ts AS DATE) AS day, f.first_day
          FROM events e JOIN f USING (user_id))
    SELECT day,
           CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_events,
           CAST(sum(CASE WHEN day > first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_events
    FROM e GROUP BY day ORDER BY day""")
def new_vs_returning(sf_dir: str):
    """New-vs-returning traffic split: per day, events from users on
    their FIRST active day vs users seen before — the acquisition/
    retention mix a growth dashboard leads with. ONE hash exchange
    on user_id co-locates each user's history; the partition derives
    first_day = min(day) per user and classifies every event
    locally, emitting bounded (day, new, returning) grid partials —
    no second pass, no broadcast of the user-grain first-seen
    table."""
    ds = _events(sf_dir, columns=["user_id", "ts"])

    def day_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "day": b["ts"].dt.normalize().to_numpy()})
        g = d.groupby(["user_id", "day"], as_index=False).agg(
            n=("day", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "day"], as_index=False).agg(
            n=("n", "sum"))
        first = g.groupby("user_id")["day"].transform("min")
        is_new = g["day"].to_numpy() == first.to_numpy()
        n = g["n"].to_numpy(np.int64)
        out = pd.DataFrame({
            "day": g["day"].to_numpy(),
            "new_events": np.where(is_new, n, 0),
            "returning_events": np.where(is_new, 0, n)})
        c = out.groupby("day", as_index=False).agg(
            new_events=("new_events", "sum"),
            returning_events=("returning_events", "sum"))
        return c.astype({"new_events": np.int64,
                         "returning_events": np.int64})

    out = _combine_partials(
        partitioned_apply(
            ds.map_batches(day_rows, batch_format="pandas"),
            "user_id", classify, EVENTS_P),
        ["day"], ["new_events", "returning_events"])
    out = out.astype({"new_events": np.int64,
                      "returning_events": np.int64})
    return out.sort_values("day",
                           kind="mergesort").reset_index(drop=True)


@register("zipf_fit", sql="""
    WITH toks AS (
      SELECT unnest(string_split_regex(
               trim(text, E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+'))
               AS token
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS freq
      FROM toks GROUP BY token
    ), top AS (
      SELECT freq, row_number() OVER (ORDER BY freq DESC, token)
                 AS rnk
      FROM c ORDER BY freq DESC, token LIMIT 100
    ), q AS (
      SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT) AS xq,
             CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT) AS yq
      FROM top
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(xq) AS HUGEINT) AS sx,
             CAST(sum(yq) AS HUGEINT) AS sy,
             CAST(sum(xq * yq) AS HUGEINT) AS sxy,
             CAST(sum(xq * xq) AS HUGEINT) AS sxx
      FROM q)
    SELECT CAST(n AS BIGINT) AS n_terms,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
    FROM s""")
def zipf_fit(sf_dir: str):
    """Zipf's-law fit: the log-log OLS slope of frequency vs rank
    over the top-100 vocabulary — the single-number corpus-health
    statistic (natural text ~ -1; template spam and boilerplate bend
    it). The top-100 table is the vocab_topk plan (token-count
    partials -> ONE token exchange -> partial top-k); both log
    coordinates quantize half-away to integer micro-units so the
    OLS sums are exact integers (order-free), and the slope is one
    double division of exact products."""
    top = _vocab_top(sf_dir, 100)
    rnk = np.arange(1, len(top) + 1, dtype=np.float64)
    freq = top["n"].to_numpy(np.int64).astype(np.float64)
    xq = np.floor(np.log(rnk) * 1e6 + 0.5).astype(np.int64)
    yq = np.floor(np.log(freq) * 1e6 + 0.5).astype(np.int64)
    n = len(xq)
    sx = int(xq.sum())
    sy = int(yq.sum())
    sxy = int((xq * yq).sum())
    sxx = int((xq * xq).sum())
    return pd.DataFrame({
        "n_terms": [np.int64(n)],
        "zipf_slope": [np.float64(n * sxy - sx * sy)
                       / np.float64(n * sxx - sx * sx)]})
