# round-5 session-2 additions, batch 15: greedy throttle dedup (the
# rate-limit keep that windows cannot express), Theil–Sen robust
# slope, and consensus stopword discovery (per-group top-k
# intersection).
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (EVENTS_P, ORACLE, _events, _path, np, pa,
                      partition_map, partitioned_apply, pc, pd, ray,
                      rd, register)

_THROTTLE_US = 24 * 3600 * 1_000_000   # one kept event per 24 h
_STOP_TOPK = 50                        # per-source top-k vocabulary


@register("throttle_dedup", sql="""
    WITH RECURSIVE kept AS (
      SELECT user_id, min(ts) AS ts FROM events GROUP BY user_id
      UNION ALL
      SELECT k.user_id,
             (SELECT min(e.ts) FROM events e
              WHERE e.user_id = k.user_id
                AND e.ts > k.ts + INTERVAL 24 HOUR) AS ts
      FROM kept k
      WHERE (SELECT min(e.ts) FROM events e
             WHERE e.user_id = k.user_id
               AND e.ts > k.ts + INTERVAL 24 HOUR) IS NOT NULL)
    SELECT user_id, ts FROM kept ORDER BY user_id, ts""")
def throttle_dedup(sf_dir: str):
    """Greedy throttle dedup: per user, keep an event only if it is
    > 24 h after the LAST KEPT event — the rate-limiter / snapshot
    thinning rule (at most one record per key per window, measured
    from the kept chain, not the previous raw event). This is a true
    stateful scan: no window function expresses it (sessionize's
    gap-from-previous-event differs whenever events trickle at
    sub-threshold gaps — there the session never splits, here a new
    keep fires once 24 h from the last KEEP elapses), hence the
    recursive-CTE oracle. The engine walks each user's sorted
    timestamp array with searchsorted jumps — O(kept · log n) per
    user, entity-grain, after ONE user_id exchange; the 100-TB shape
    is identical to sessionize's (all state is one partition-local
    cursor)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        us_all = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid_all = g["user_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], uid_all[1:] != uid_all[:-1])))
        ends = np.append(starts[1:], len(g))
        users, times = [], []
        for st, en in zip(starts, ends):
            us = us_all[st:en]
            kept = []
            i = 0
            while i < len(us):
                kept.append(us[i])
                i = np.searchsorted(us, us[i] + _THROTTLE_US,
                                    side="right")
            users.append(np.full(len(kept), uid_all[st], np.int64))
            times.append(np.asarray(kept, np.int64))
        if not users:
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "ts": pd.Series(dtype="datetime64[us]")})
        return pd.DataFrame({
            "user_id": np.concatenate(users),
            "ts": np.concatenate(times).astype("datetime64[us]")})

    out = partitioned_apply(ds, "user_id", fn, EVENTS_P,
                            sort_cols=["user_id", "ts", "event_id"])
    return out.sort(["user_id", "ts"])


@register("theil_sen_slope", sql="""
    WITH p AS (SELECT user_id, epoch_us(ts) AS us, value
               FROM events),
    pairs AS (SELECT a.user_id,
                     (b.value - a.value)
                       / CAST(b.us - a.us AS DOUBLE) AS slope
              FROM p a JOIN p b
                ON a.user_id = b.user_id AND a.us < b.us)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)
             AS ts_slope
    FROM pairs GROUP BY user_id ORDER BY user_id""")
def theil_sen_slope(sf_dir: str):
    """Theil–Sen robust trend: per user, the median of all pairwise
    slopes (value per microsecond over every event pair with distinct
    timestamps) — the outlier-resistant alternative to
    user_value_trend's OLS fit (breakdown point 29% vs 0%). Slopes
    are the identical double divisions in both engines and the
    discrete median picks sorted element ceil(n/2)−1, exactly
    percentile_disc(0.5)'s cume_dist rule, so no float fold exists
    anywhere. The pair enumeration is per-ENTITY quadratic
    (C(events_per_user, 2) after one user_id exchange) — bounded by
    the same per-user event cap every window query in the registry
    assumes; hot users would be capped/sampled upstream, exactly as
    the reference's per-entity feature extractors bound their patch
    sizes."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        us_all = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        v_all = g["value"].to_numpy(np.float64)
        uid_all = g["user_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(
            ([True], uid_all[1:] != uid_all[:-1])))
        ends = np.append(starts[1:], len(g))
        uids, cnts, meds = [], [], []
        for st, en in zip(starts, ends):
            us = us_all[st:en]
            v = v_all[st:en]
            i, j = np.triu_indices(len(us), k=1)
            dt = us[j] - us[i]
            ok = dt > 0
            if not ok.any():
                continue
            slopes = (v[j][ok] - v[i][ok]) / dt[ok].astype(np.float64)
            slopes.sort()
            n = len(slopes)
            uids.append(uid_all[st])
            cnts.append(n)
            meds.append(slopes[(n + 1) // 2 - 1])
        return pd.DataFrame({
            "user_id": np.asarray(uids, np.int64),
            "n_pairs": np.asarray(cnts, np.int64),
            "ts_slope": np.asarray(meds, np.float64)})

    out = partitioned_apply(ds, "user_id", fn, EVENTS_P,
                            sort_cols=["user_id", "ts"])
    return out.sort("user_id")


@register("stopword_consensus", sql="""
    WITH docs AS (
      SELECT source,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    tf AS (SELECT source, unnest(w) AS term FROM docs),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
          FROM tf GROUP BY source, term),
    r AS (SELECT source, term, n,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n DESC, term) AS rk
          FROM c),
    t AS (SELECT source, term, n FROM r WHERE rk <= {k})
    SELECT term,
           CAST(count(*) AS BIGINT) AS n_sources,
           CAST(sum(n) AS BIGINT) AS total_tf
    FROM t
    GROUP BY term
    HAVING count(*) = (SELECT count(DISTINCT source) FROM t)
    ORDER BY term""".format(k=_STOP_TOPK))
def stopword_consensus(sf_dir: str):
    """Consensus stopword discovery: terms ranked in the top-{k} by
    raw frequency in EVERY source — the per-group top-k INTERSECTION
    shape (a term must win each group independently, unlike
    lang_top_terms' union). Deterministic rank ties break by term.
    Scale plan: per-batch (source, term) count partials collapse
    before ONE term+source-keyed exchange finishes the counts; the
    per-source top-k survivors are source-count-sized (k rows per
    source), so the intersection is a tiny second pass — the classic
    pre-aggregate → shuffle-small pattern, no full vocabulary ever
    crosses a second exchange."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        src = np.repeat(b["source"].to_numpy(object), k)
        g = pd.DataFrame({
            "source": src,
            "term": vals.to_numpy(zero_copy_only=False)})
        out = g.groupby(["source", "term"], as_index=False).size() \
            .rename(columns={"size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        # whole sources are co-located: finish counts, rank, cut
        t = g.groupby(["source", "term"], as_index=False)["n"].sum()
        t = t.sort_values(["source", "n", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
        rk = t.groupby("source", sort=False).cumcount()
        return t[rk < _STOP_TOPK]

    per_src = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], topk, 8).to_pandas()
    n_sources = np.int64(per_src["source"].nunique())
    c = per_src.groupby("term", as_index=False) \
        .agg(n_sources=("source", "size"), total_tf=("n", "sum"))
    c = c[c["n_sources"] == n_sources]
    return pd.DataFrame({
        "term": c["term"].to_numpy(object),
        "n_sources": c["n_sources"].to_numpy(np.int64),
        "total_tf": c["total_tf"].to_numpy(np.int64)}) \
        .sort_values("term", kind="mergesort").reset_index(drop=True)
