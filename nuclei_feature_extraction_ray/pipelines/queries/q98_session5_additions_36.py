# round-5 session-5 additions, batch 36: hash-seeded isolation-stump
# anomaly census, the sessionization threshold sensitivity sweep,
# and footrule-optimal median rank aggregation.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply
from ...stages.window import segment_codes

_ISO_K = 8             # stumps
_ISO_VOTE = 6          # minority votes to flag
_STS_HOURS = (1, 4, 8, 24)
_MRA_TOP = 10


@register("isolation_stumps", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    r AS (SELECT day, v, row_number() OVER (ORDER BY v, day) AS i
          FROM d),
    st AS (SELECT CAST(s AS BIGINT) AS s,
                  CAST(1 + ('0x' || substr(md5('iso' ||
                       CAST(s AS VARCHAR)), 1, 16))::UBIGINT
                       % CAST((SELECT n FROM n) - 1 AS UBIGINT)
                       AS BIGINT) AS cut
           FROM (SELECT unnest(generate_series(0, {k} - 1)) AS s)),
    f AS (SELECT r.day, r.v,
                 CAST(sum(CASE WHEN
                      (r.i <= st.cut
                       AND 2 * st.cut <= (SELECT n FROM n))
                      OR (r.i > st.cut
                          AND 2 * st.cut > (SELECT n FROM n))
                      THEN 1 ELSE 0 END) AS BIGINT) AS votes
          FROM r CROSS JOIN st GROUP BY r.day, r.v)
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_days,
           CAST({k} AS BIGINT) AS n_stumps,
           CAST(sum(CASE WHEN votes >= {vt} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           CAST(max(votes) AS BIGINT) AS max_votes
    FROM f""".format(k=_ISO_K, vt=_ISO_VOTE))
def isolation_stumps(sf_dir: str):
    """ISOLATION-STUMP ANOMALY census over daily revenue: {k}
    hash-seeded rank cuts each split the sorted days in two, a day
    votes 'isolated' when it falls on the SMALLER side, and days
    with >= {vt} minority votes are flagged — the depth-1
    isolation-forest idea with the replayable-randomness policy
    (md5-seeded cuts), catching BOTH tails at once where
    value_outliers' fences and xmr_control's limits are symmetric-
    center-based. Ranks, cuts, side sizes and votes are ALL exact
    integers — zero float boundaries anywhere. Scale plan: bounded
    day-domain combine; the {k}-cut vote census is O(k x days)
    driver work (ranks via the two-phase exchange at fleet
    scale)."""
    import hashlib
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    day = d["day"].to_numpy(np.int64)
    v = np.array([int(x) for x in d["v"]], np.int64)
    n = len(v)
    order = np.lexsort((day, v))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(1, n + 1)
    votes = np.zeros(n, np.int64)
    for s in range(_ISO_K):
        hx = hashlib.md5(("iso%d" % s).encode()).hexdigest()[:16]
        cut = 1 + int(hx, 16) % (n - 1)
        low_small = 2 * cut <= n
        votes += np.where(rank <= cut,
                          1 if low_small else 0,
                          0 if low_small else 1)
    return pd.DataFrame({
        "n_days": [np.int64(n)], "n_stumps": [np.int64(_ISO_K)],
        "n_flagged": [np.int64(int((votes >= _ISO_VOTE).sum()))],
        "max_votes": [np.int64(int(votes.max()))]})


@register("session_threshold_sweep", sql="""
    WITH s AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
               FROM events),
    g AS (SELECT CAST(epoch_us(ts) - epoch_us(prev_ts) AS BIGINT)
                   AS gap_us
          FROM s WHERE prev_ts IS NOT NULL),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT)
                   AS n_users
          FROM events),
    th AS (SELECT CAST(h AS BIGINT) AS hours FROM (
             SELECT unnest([{hrs}]) AS h))
    SELECT th.hours AS gap_hours,
           (SELECT n_users FROM u)
           + (SELECT CAST(count(*) AS BIGINT) FROM g
              WHERE gap_us > th.hours * 3600000000)
             AS n_sessions
    FROM th ORDER BY th.hours""".format(
    hrs=", ".join(str(h) for h in _STS_HOURS)))
def session_threshold_sweep(sf_dir: str):
    """SESSIONIZATION THRESHOLD SENSITIVITY sweep: the session
    count that each candidate inactivity gap (1/4/8/24 h) would
    produce — sessions = users + gaps-exceeding-threshold, an
    identity that turns the whole tuning curve into FOUR integer
    counters over the per-user gap stream (no re-sessionization
    per candidate). The knob-tuning companion to sessionize/
    gamma_fit_lag: pick the threshold at the curve's elbow. Exact
    microsecond gap comparisons, exact counts, no floats. Scale
    plan: gaps computed INSIDE the one user_id exchange's sorted
    partitions; partitions emit 4 counters plus a distinct-user
    cell."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        same = codes[1:] == codes[:-1] if len(us) > 1 \
            else np.zeros(0, bool)
        gaps = (us[1:] - us[:-1])[same] if len(us) > 1 \
            else np.zeros(0, np.int64)
        row = {"j": 0,
               "n_users": int(len(np.unique(
                   g["user_id"].to_numpy(np.int64))))}
        for h in _STS_HOURS:
            row["g%d" % h] = int((gaps
                                  > h * 3600000000).sum())
        return pd.DataFrame([row])

    s = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts", "event_id"]),
        ["j"], ["n_users"] + ["g%d" % h for h in _STS_HOURS])
    nu = int(s["n_users"].iloc[0])
    return pd.DataFrame({
        "gap_hours": pd.Series(_STS_HOURS, dtype=np.int64),
        "n_sessions": pd.Series(
            [nu + int(s["g%d" % h].iloc[0]) for h in _STS_HOURS],
            dtype=np.int64)})


@register("median_rank_agg", sql="""
    WITH m AS (SELECT l_partkey AS pk,
                      CAST(sum(CAST(floor(l_extendedprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS rev,
                      CAST(sum(l_quantity) AS BIGINT) AS qty,
                      CAST(count(DISTINCT l_orderkey) AS BIGINT)
                        AS ords
               FROM lineitem GROUP BY pk),
    r AS (SELECT pk,
                 row_number() OVER (ORDER BY rev DESC, pk) AS r1,
                 row_number() OVER (ORDER BY qty DESC, pk) AS r2,
                 row_number() OVER (ORDER BY ords DESC, pk) AS r3
          FROM m),
    md AS (SELECT pk, r1, r2, r3,
                  CAST(r1 + r2 + r3 - greatest(r1, r2, r3)
                       - least(r1, r2, r3) AS BIGINT) AS med
           FROM r)
    SELECT pk AS partkey, CAST(r1 AS BIGINT) AS rank_revenue,
           CAST(r2 AS BIGINT) AS rank_quantity,
           CAST(r3 AS BIGINT) AS rank_orders,
           med AS median_rank
    FROM md ORDER BY med, pk LIMIT {t}""".format(t=_MRA_TOP))
def median_rank_agg(sf_dir: str):
    """MEDIAN RANK AGGREGATION of three part rankings (revenue,
    quantity, distinct orders): each part's aggregate position is
    the MEDIAN of its three ranks — the Spearman-footrule-optimal
    aggregation for an odd number of voters (median minimizes sum
    |r_agg - r_k|), robust to one wild ranking where rrf_fusion's
    reciprocal sum and a Borda mean are not. Ranks are exact
    row_numbers with partkey tie-break, the median of three is the
    integer identity sum - max - min, and the top-{t} report
    orders by (median, partkey) — all integers. Scale plan:
    per-part cells fold through part-keyed partials; the three
    rankings are the two-phase rank exchange at fleet scale
    (dense-rank plan); top-{t} is a bounded merge."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_orderkey", "l_extendedprice",
                 "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                       * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "ok": b["l_orderkey"].to_numpy(np.int64),
            "rev": rev,
            "qty": b["l_quantity"].to_numpy(np.int64)})
        out = g.groupby("pk", as_index=False).agg(
            rev=("rev", "sum"), qty=("qty", "sum"))
        for c in ("rev", "qty"):
            out[c] = out[c].astype(np.int64)
        return out

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk"], ["rev", "qty"], exact_int=True)
    # distinct orders per part need a pair-keyed exchange (a
    # (pk, orderkey) pair may span batches)
    from ...stages.partition import partition_map
    ds2 = ds.map_batches(
        lambda b: pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "ok": b["l_orderkey"].to_numpy(np.int64)})
        .drop_duplicates(),
        batch_format="pandas")

    def dcount(g: pd.DataFrame) -> pd.DataFrame:
        a = g.drop_duplicates(["pk", "ok"]).groupby(
            "pk", as_index=False).agg(ords=("ok", "size"))
        a["ords"] = a["ords"].astype(np.int64)
        return a

    oc = _combine_partials(
        partition_map(ds2, ["pk", "ok"], dcount, 16),
        ["pk"], ["ords"])
    m = m.merge(oc, on="pk")
    pk = m["pk"].to_numpy(np.int64)
    rev = np.array([int(x) for x in m["rev"]], np.int64)
    qty = np.array([int(x) for x in m["qty"]], np.int64)
    ords = m["ords"].to_numpy(np.int64)

    def ranks(vals: np.ndarray) -> np.ndarray:
        order = np.lexsort((pk, -vals))
        r = np.empty(len(pk), np.int64)
        r[order] = np.arange(1, len(pk) + 1)
        return r

    r1, r2, r3 = ranks(rev), ranks(qty), ranks(ords)
    med = r1 + r2 + r3 - np.maximum(np.maximum(r1, r2), r3) \
        - np.minimum(np.minimum(r1, r2), r3)
    out = pd.DataFrame({
        "partkey": pk, "rank_revenue": r1, "rank_quantity": r2,
        "rank_orders": r3, "median_rank": med}).sort_values(
        ["median_rank", "partkey"], kind="mergesort") \
        .head(_MRA_TOP).reset_index(drop=True)
    return out
