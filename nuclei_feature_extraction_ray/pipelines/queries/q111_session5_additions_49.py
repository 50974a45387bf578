# round-5 session-5 additions, batch 49: the McNemar-Bowker 3x3
# symmetry test, circular time-of-day statistics per event type,
# and the Kupiec proportion-of-failures VaR backtest.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_BW_CH = (250, 350)
_BW_TK = (45, 60)
_KP_PCT = 95


@register("bowker_test", sql="""
    WITH lab AS (SELECT
        CASE WHEN n_chars < {c0} THEN 0
             WHEN n_chars < {c1} THEN 1 ELSE 2 END AS r1,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) < {t0}
             THEN 0
             WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) < {t1}
             THEN 1 ELSE 2 END AS r2
        FROM documents),
    o AS (SELECT r1, r2, CAST(count(*) AS BIGINT) AS n
          FROM lab GROUP BY r1, r2),
    p AS (SELECT a.r1 AS i, a.r2 AS j,
                 a.n AS nij, COALESCE(b.n, 0) AS nji
          FROM o a LEFT JOIN o b ON b.r1 = a.r2 AND b.r2 = a.r1
          WHERE a.r1 < a.r2),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                 CAST(sum(CASE WHEN nij + nji > 0 THEN
                      CAST(floor(CAST((nij - nji) * (nij - nji)
                                      AS DOUBLE)
                           / CAST(nij + nji AS DOUBLE)
                           * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS chi_micro
          FROM p)
    SELECT (SELECT CAST(sum(n) AS BIGINT) FROM o) AS n_docs,
           (SELECT n_pairs FROM s) AS n_cell_pairs,
           (SELECT chi_micro FROM s) AS chi_sum_micro,
           CAST((SELECT chi_micro FROM s) AS DOUBLE) / 1000000.0
             AS bowker_chi2""".format(c0=_BW_CH[0], c1=_BW_CH[1],
                                      t0=_BW_TK[0], t1=_BW_TK[1]))
def bowker_test(sf_dir: str):
    """MCNEMAR-BOWKER SYMMETRY TEST on the 3x3 char-bin vs
    token-bin confusion: for every off-diagonal cell pair,
    (n_ij - n_ji)^2 / (n_ij + n_ji) — do the two ordinal raters
    disagree SYMMETRICALLY, or does one systematically grade
    higher (the k-category generalization of mcnemar_test, the
    directional complement of qwk's agreement magnitude)? Cell
    counts are exact integer folds; each pair term is built from
    exact ints and quantizes to micro units half-up before the
    fold (empty pairs contribute 0 on both engines). Scale plan:
    map-only 3x3 confusion partials, O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def cat(vals: np.ndarray, lo: int, hi: int) -> np.ndarray:
        return np.where(vals < lo, 0,
                        np.where(vals < hi, 1, 2)).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        r1 = cat(b["n_chars"].to_numpy(np.int64), *_BW_CH)
        r2 = cat(k, *_BW_TK)
        g = pd.DataFrame({"r1": r1, "r2": r2,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["r1", "r2"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    o = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["r1", "r2"], ["n"])
    cell = {(int(r["r1"]), int(r["r2"])): int(r["n"])
            for _, r in o.iterrows()}
    n_docs = sum(cell.values())
    chi = 0
    n_pairs = 0
    for (i, j), nij in sorted(cell.items()):
        if i < j:
            n_pairs += 1
            nji = cell.get((j, i), 0)
            if nij + nji > 0:
                chi += int(np.floor(
                    np.float64((nij - nji) * (nij - nji))
                    / np.float64(nij + nji)
                    * 1000000.0 + 0.5))
    return pd.DataFrame({
        "n_docs": [np.int64(n_docs)],
        "n_cell_pairs": [np.int64(n_pairs)],
        "chi_sum_micro": [np.int64(chi)],
        "bowker_chi2": [np.float64(chi) / 1000000.0]})


@register("circular_stats_by_type", sql="""
    WITH e AS (SELECT event_type,
                      CAST(floor(epoch(ts) / 3600) % 24 AS BIGINT)
                        AS hour
               FROM events),
    t AS (SELECT e.event_type, e.hour,
                 CAST(count(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2),
    c AS (SELECT event_type,
                 CAST(sum(n) AS BIGINT) AS total,
                 CAST(sum(n * CAST(floor(cos(CAST(hour AS DOUBLE)
                      * 2.0 * pi() / 24.0) * 1000000.0 + 0.5)
                      AS BIGINT)) AS BIGINT) AS sc,
                 CAST(sum(n * CAST(floor(sin(CAST(hour AS DOUBLE)
                      * 2.0 * pi() / 24.0) * 1000000.0 + 0.5)
                      AS BIGINT)) AS BIGINT) AS ss
          FROM t GROUP BY event_type)
    SELECT event_type, total AS n_events,
           sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
             / 1000000.0 / CAST(total AS DOUBLE)
             AS resultant_length,
           1.0 - sqrt(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                      + CAST(ss AS DOUBLE)
                        * CAST(ss AS DOUBLE))
                 / 1000000.0 / CAST(total AS DOUBLE)
             AS circular_variance
    FROM c ORDER BY event_type""")
def circular_stats_by_type(sf_dir: str):
    """CIRCULAR TIME-OF-DAY STATISTICS per event type: the mean
    resultant length R of each type's hour-of-day distribution and
    its circular variance 1-R — R near 1 means the type fires at a
    sharp daily hour, near 0 means around-the-clock (the per-type
    concentration view on top of hourly_rate's single circular
    mean; the feature store's 'is this behavior diurnal' flag).
    Hours are exact integer buckets; each cos/sin value quantizes
    to micro units half-up (24 fixed values), so the resultant
    components are exact integer folds and R is one shared sqrt
    expression. Scale plan: the 24 x types grid census, map-only
    partials."""
    ds = _events(sf_dir, ["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hour = (b["ts"].astype("datetime64[us]").to_numpy()
                .astype(np.int64) // 3600000000) % 24
        g = pd.DataFrame({
            "event_type": b["event_type"].to_numpy(object),
            "hour": hour.astype(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby(["event_type", "hour"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    t = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour"], ["n"])
    ang = np.arange(24, dtype=np.float64) * 2.0 * np.pi / 24.0
    cosm = np.floor(np.cos(ang) * 1000000.0 + 0.5).astype(np.int64)
    sinm = np.floor(np.sin(ang) * 1000000.0 + 0.5).astype(np.int64)
    rows = []
    for et, g in t.groupby("event_type"):
        n = g["n"].to_numpy(np.int64)
        h = g["hour"].to_numpy(np.int64)
        total = int(n.sum())
        sc = int((n * cosm[h]).sum())
        ss = int((n * sinm[h]).sum())
        r = np.sqrt(np.float64(sc) * np.float64(sc)
                    + np.float64(ss) * np.float64(ss)) \
            / 1000000.0 / np.float64(total)
        rows.append({"event_type": et,
                     "n_events": np.int64(total),
                     "resultant_length": np.float64(r),
                     "circular_variance": 1.0 - r})
    return pd.DataFrame(rows).sort_values(
        "event_type", kind="mergesort").reset_index(drop=True)


@register("kupiec_pof", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT day, v - lag(v) OVER (ORDER BY day) AS chg
          FROM d),
    l AS (SELECT day, -chg AS loss FROM x WHERE chg IS NOT NULL),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM l),
    half AS (SELECT CAST(min(day) AS BIGINT)
                    + (CAST(max(day) AS BIGINT)
                       - CAST(min(day) AS BIGINT)) // 2 AS mid
             FROM l),
    tr AS (SELECT loss FROM l
           WHERE day <= (SELECT mid FROM half)),
    ntr AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tr),
    q AS (SELECT loss AS var_ FROM (
            SELECT loss, row_number() OVER (ORDER BY loss) AS i
            FROM tr)
          WHERE i = CAST(ceil({p} / 100.0
                               * (SELECT nt FROM ntr))
                         AS BIGINT)),
    te AS (SELECT loss FROM l
           WHERE day > (SELECT mid FROM half)),
    c AS (SELECT CAST(count(*) AS BIGINT) AS m,
                 CAST(sum(CASE WHEN loss > (SELECT var_ FROM q)
                          THEN 1 ELSE 0 END) AS BIGINT) AS x
          FROM te)
    SELECT (SELECT nt FROM ntr) AS n_train,
           (SELECT m FROM c) AS n_test,
           CAST((SELECT var_ FROM q) AS BIGINT)
             AS var_estimate_cents,
           (SELECT x FROM c) AS n_violations,
           CASE WHEN (SELECT x FROM c) > 0
                AND (SELECT x FROM c) < (SELECT m FROM c) THEN
           -2.0 * (CAST((SELECT m FROM c) - (SELECT x FROM c)
                        AS DOUBLE)
                   * ln((1.0 - {a}) * CAST((SELECT m FROM c)
                                           AS DOUBLE)
                        / CAST((SELECT m FROM c)
                               - (SELECT x FROM c) AS DOUBLE))
                   + CAST((SELECT x FROM c) AS DOUBLE)
                     * ln({a} * CAST((SELECT m FROM c) AS DOUBLE)
                          / CAST((SELECT x FROM c) AS DOUBLE)))
           ELSE NULL END AS kupiec_lr""".format(
    p=_KP_PCT, a=(100 - _KP_PCT) / 100.0))
def kupiec_pof(sf_dir: str):
    """KUPIEC PROPORTION-OF-FAILURES BACKTEST of the VaR model:
    estimate the {p}% loss quantile on the FIRST half of the day
    span, count violations on the held-out second half, and
    compare the realized violation rate to the nominal via the
    likelihood ratio -2[(m-x)ln((1-a)m/(m-x)) + x ln(am/x)] — the
    regulatory test that decides whether var_cvar's number can be
    trusted out of sample (NULL at 0 or m violations, matching the
    oracle CASE). The VaR is an exact order statistic; the
    violation census is exact integer comparisons; the LR is one
    shared float expression over exact counts. Scale plan: bounded
    day-domain combine; ranking and the census are O(days) driver
    work."""
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
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    days = d["day"].to_numpy(np.int64)[1:]
    loss = np.array([-(b - a) for a, b in zip(v, v[1:])],
                    np.int64)
    mid = int(days.min()) + (int(days.max())
                             - int(days.min())) // 2
    tr = np.sort(loss[days <= mid])
    te = loss[days > mid]
    nt = len(tr)
    k = int(np.ceil(_KP_PCT / 100.0 * np.float64(nt)))
    var_ = int(tr[k - 1])
    m = len(te)
    x = int((te > var_).sum())
    a = (100 - _KP_PCT) / 100.0
    if 0 < x < m:
        lr = -2.0 * (np.float64(m - x)
                     * np.log((1.0 - a) * np.float64(m)
                              / np.float64(m - x))
                     + np.float64(x)
                     * np.log(a * np.float64(m)
                              / np.float64(x)))
        lr = np.float64(lr)
    else:
        lr = np.nan
    return pd.DataFrame({
        "n_train": [np.int64(nt)], "n_test": [np.int64(m)],
        "var_estimate_cents": [np.int64(var_)],
        "n_violations": [np.int64(x)],
        "kupiec_lr": [lr]})
