# round-5 session-2 additions, batch 21: exponential time-decay
# engagement scoring, rank-biased overlap of top-k lists, and
# temporal churn label generation.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (ORACLE, _combine_partials, _events, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)

_HALF_LIFE_D = 7.0     # decay half-life (days)
_RBO_P = 0.9           # rank-biased overlap persistence
_RBO_K = 20            # truncation depth
_CHURN_D = 7           # inactive days defining churn


@register("decay_score", sql="""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(pow(0.5, CAST(date_diff('microsecond', ts, m.mx)
                             AS DOUBLE)
                        / (86400000000.0 * {h}))) AS decay_score
    FROM events, m
    GROUP BY user_id ORDER BY user_id""".format(h=_HALF_LIFE_D))
def decay_score(sf_dir: str):
    """Recency-weighted engagement: each event contributes
    0.5^(age/half-life) (half-life 7 days, age measured from the
    corpus max timestamp), summed per user — the decayed counter
    behind freshness-aware popularity and user-activity features,
    where yesterday's click outweighs last month's. Needs the global
    max first (one tiny metadata-sized pass: per-batch max partials,
    driver max), then ONE map pass emits per-user partial decayed
    sums; the driver folds users × blocks partials. The pow/sum
    floats differ only in fold order (round-6 absorbs ~1e-15 on
    O(10) sums); the exponent expression is shared verbatim."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def mx_part(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mx": [b["ts"].max()]})

    mx = ds.map_batches(mx_part, batch_format="pandas") \
        .to_pandas()["mx"].max()
    mx_us = np.int64(pd.Timestamp(mx).value // 1000)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        age = (mx_us - us).astype(np.float64) \
            / (86400000000.0 * _HALF_LIFE_D)
        w = np.power(0.5, age)
        g = pd.DataFrame({"user_id": b["user_id"]
                          .to_numpy(np.int64),
                          "n_events": np.ones(len(b), np.int64),
                          "decay_score": w}) \
            .groupby("user_id", as_index=False).sum()
        g["n_events"] = g["n_events"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["n_events", "decay_score"])
    out["n_events"] = out["n_events"].astype(np.int64)
    out["decay_score"] = out["decay_score"].astype(np.float64)
    return out.sort_values("user_id").reset_index(drop=True)


@register("topk_rbo", sql="""
    WITH a AS (SELECT term,
                 row_number() OVER (ORDER BY count(*) DESC, term)
                   AS rk
               FROM (SELECT unnest(string_split_regex(
                       trim(text, E' \\t\\n\\r\\f'),
                       '[ \\t\\n\\r\\f]+')) AS term
                     FROM documents
                     WHERE doc_id % 2 = 0
                       AND trim(text, E' \\t\\n\\r\\f') <> '')
               GROUP BY term),
    b AS (SELECT term,
                 row_number() OVER (ORDER BY count(*) DESC, term)
                   AS rk
          FROM (SELECT unnest(string_split_regex(
                  trim(text, E' \\t\\n\\r\\f'),
                  '[ \\t\\n\\r\\f]+')) AS term
                FROM documents
                WHERE doc_id % 2 = 1
                  AND trim(text, E' \\t\\n\\r\\f') <> '')
          GROUP BY term),
    ov AS (SELECT g.d,
                  CAST((SELECT count(*) FROM a JOIN b USING (term)
                        WHERE a.rk <= g.d AND b.rk <= g.d)
                       AS DOUBLE) / CAST(g.d AS DOUBLE) AS agree
           FROM generate_series(1, {k}) g(d))
    SELECT CAST({k} AS BIGINT) AS depth,
           (1.0 - {p}) * sum(pow({p}, CAST(d - 1 AS DOUBLE))
                             * agree) AS rbo
    FROM ov""".format(k=_RBO_K, p=_RBO_P))
def topk_rbo(sf_dir: str):
    """Rank-biased overlap (RBO, p = 0.9, truncated at depth 20)
    between the top-term rankings of the two corpus halves (even vs
    odd doc ids) — the top-weighted rank-list similarity metric for
    comparing retrieval runs, trending lists, or vocabulary drift,
    where plain set overlap ignores order. Per-half (term, tf)
    partials collapse per batch before ONE term exchange finishes
    counts (tagged by half); only each half's top-20 reaches the
    driver, where the 20-term RBO series is summed in ascending
    depth order (round-6 absorbs the oracle's fold-order ulps).
    Deterministic ranking: ties break lexicographically."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        half = (b["doc_id"].to_numpy(np.int64) % 2)
        vals, k = tokens_flat(b["text"])
        if len(vals) == 0:
            return pd.DataFrame({
                "half": pd.Series(dtype=np.int64),
                "term": pd.Series(dtype=object),
                "n": pd.Series(dtype=np.int64)})
        g = pd.DataFrame({
            "half": np.repeat(half, k),
            "term": vals.to_numpy(zero_copy_only=False)}) \
            .groupby(["half", "term"], as_index=False).size()
        return pd.DataFrame({
            "half": g["half"].to_numpy(np.int64),
            "term": g["term"].to_numpy(object),
            "n": g["size"].to_numpy(np.int64)})

    # term-keyed exchange finishes counts; each partition emits its
    # local top-k candidates per half; the driver re-ranks the tiny
    # union (<= partitions x k rows per half) exactly
    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["half", "term"], as_index=False)["n"].sum()
        t = t.sort_values(["half", "n", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
        rk = t.groupby("half", sort=False).cumcount()
        return t[rk < _RBO_K]

    cand = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["term"], local_top, 16).to_pandas()
    t = cand.sort_values(["half", "n", "term"],
                         ascending=[True, False, True],
                         kind="mergesort")
    t["rk"] = t.groupby("half", sort=False).cumcount() + 1
    t = t[t["rk"] <= _RBO_K]
    a = t[t["half"] == 0].set_index("term")["rk"]
    b = t[t["half"] == 1].set_index("term")["rk"]
    common = a.index.intersection(b.index)
    ar = a.loc[common].to_numpy(np.int64)
    br = b.loc[common].to_numpy(np.int64)
    rbo = 0.0
    for d in range(1, _RBO_K + 1):
        agree = np.float64(int(((ar <= d) & (br <= d)).sum())) \
            / np.float64(d)
        rbo += np.power(_RBO_P, np.float64(d - 1)) * agree
    rbo *= (1.0 - _RBO_P)
    return pd.DataFrame({"depth": np.asarray([_RBO_K], np.int64),
                         "rbo": np.asarray([rbo], np.float64)})


@register("churn_labels", sql="""
    WITH m AS (SELECT max(ts) AS mx FROM events),
    u AS (SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
          FROM events GROUP BY user_id),
    l AS (SELECT user_id,
                 CAST(date_trunc('week', first_ts) AS TIMESTAMP)
                   AS signup_week,
                 CASE WHEN last_ts < m.mx - INTERVAL {d} DAY
                      THEN 1 ELSE 0 END AS churned
          FROM u, m)
    SELECT signup_week,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(churned) AS BIGINT) AS n_churned,
           CAST(sum(churned) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS churn_rate
    FROM l GROUP BY signup_week ORDER BY signup_week""".format(
    d=_CHURN_D))
def churn_labels(sf_dir: str):
    """Temporal churn label generation: a user is labeled churned iff
    their LAST event precedes the corpus horizon by more than 7 days
    — the leakage-safe label rule (defined purely by a time cutoff,
    never by future features) — aggregated into churn rates per
    signup (first-event) week. Per-batch (user, min_ts, max_ts)
    partials collapse before the driver fold (min-of-mins /
    max-of-maxs per user — users × blocks tiny rows); the label and
    the per-week rate are exact integer comparisons plus one
    division. The same two-extrema partial pattern as
    url_path_prefix, keyed by user."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        g = pd.DataFrame({"user_id": b["user_id"]
                          .to_numpy(np.int64), "us": us})
        a = g.groupby("user_id", as_index=False) \
            .agg(mn=("us", "min"), mx=("us", "max"))
        return a

    parts = ds.map_batches(partial, batch_format="pandas") \
        .limit(2_000_001).to_pandas()
    if len(parts) > 2_000_000:
        raise ValueError("churn_labels: user partials exceeded the "
                         "driver bound")
    u = parts.groupby("user_id").agg(mn=("mn", "min"),
                                     mx=("mx", "max"))
    horizon = np.int64(u["mx"].max())
    cutoff = horizon - np.int64(_CHURN_D) * 86_400_000_000
    churned = (u["mx"].to_numpy(np.int64) < cutoff) \
        .astype(np.int64)
    d = u["mn"].to_numpy(np.int64) // 86_400_000_000
    monday = ((d + 3) // 7) * 7 - 3
    out = pd.DataFrame({"signup_week": monday,
                        "n_users": np.ones(len(u), np.int64),
                        "n_churned": churned}) \
        .groupby("signup_week", as_index=False).sum()
    return pd.DataFrame({
        "signup_week": out["signup_week"].to_numpy(np.int64)
            .astype("datetime64[D]").astype("datetime64[us]"),
        "n_users": out["n_users"].to_numpy(np.int64),
        "n_churned": out["n_churned"].to_numpy(np.int64),
        "churn_rate": out["n_churned"].to_numpy(np.float64)
        / out["n_users"].to_numpy(np.float64)})
