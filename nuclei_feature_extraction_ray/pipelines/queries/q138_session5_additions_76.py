# round-5 session-5 additions, batch 76: the Youden-J optimal
# threshold, the Brier score with its Murphy decomposition plus ECE,
# and exact average precision over the activity ranking.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map


def _user_label_partial(b: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": b["user_id"].to_numpy(np.int64),
        "n": np.ones(len(b), np.int64),
        "p": (b["event_type"].to_numpy(object)
              == "purchase").astype(np.int64)}) \
        .groupby("user_id", as_index=False) \
        .agg({"n": "sum", "p": "max"})


def _user_label_cells(g: pd.DataFrame) -> pd.DataFrame:
    a = g.groupby("user_id", as_index=False) \
        .agg({"n": "sum", "p": "max"})
    for c in ("n", "p"):
        a[c] = a[c].astype(np.int64)
    return a


@register("youden_j", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                      CAST(max(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1),
    h AS (SELECT n, CAST(sum(p) AS BIGINT) AS pos,
                 CAST(count(*) - sum(p) AS BIGINT) AS neg
          FROM u GROUP BY n),
    t AS (SELECT CAST(sum(pos) AS BIGINT) AS tp_all,
                 CAST(sum(neg) AS BIGINT) AS fp_all FROM h),
    c AS (SELECT n AS thr,
                 CAST(sum(pos) OVER (ORDER BY n DESC) AS BIGINT)
                   AS tp,
                 CAST(sum(neg) OVER (ORDER BY n DESC) AS BIGINT)
                   AS fp
          FROM h),
    w AS (SELECT thr, tp, fp
          FROM c
          ORDER BY CAST(tp AS HUGEINT)
                   * (SELECT fp_all FROM t)
                   - CAST(fp AS HUGEINT)
                     * (SELECT tp_all FROM t) DESC, thr
          LIMIT 1)
    SELECT (SELECT thr FROM w) AS threshold,
           (SELECT tp FROM w) AS tp,
           (SELECT fp FROM w) AS fp,
           CAST((SELECT tp FROM w) AS DOUBLE)
             / CAST((SELECT tp_all FROM t) AS DOUBLE)
           - CAST((SELECT fp FROM w) AS DOUBLE)
             / CAST((SELECT fp_all FROM t) AS DOUBLE)
             AS youden_j""")
def youden_j(sf_dir: str):
    """YOUDEN'S J OPTIMAL THRESHOLD on the activity score: over
    all 'predict purchaser if event count >= T' rules, the T
    maximizing J = TPR - FPR — the threshold criterion that,
    unlike f1_threshold's, is prevalence-invariant (the screening
    standard: it picks the same cut whether purchasers are 1% or
    50%). The argmax is decided by the EXACT integer
    cross-multiplication tp*N - fp*P (smallest threshold
    tie-break) on suffix sums of the bounded count histogram; J
    itself is one shared float expression. Scale plan: per-user
    counts through one user exchange into a bounded histogram;
    the threshold scan is O(domain) driver work."""
    ds = _events(sf_dir, ["user_id", "event_type"])
    u = partition_map(
        ds.map_batches(_user_label_partial,
                       batch_format="pandas"),
        ["user_id"], _user_label_cells, 16).to_pandas()
    h = pd.DataFrame({
        "n": u["n"].to_numpy(np.int64),
        "pos": u["p"].to_numpy(np.int64),
        "neg": 1 - u["p"].to_numpy(np.int64)}) \
        .groupby("n", as_index=False).sum() \
        .sort_values("n", ascending=False)
    tp_all = int(h["pos"].sum())
    fp_all = int(h["neg"].sum())
    tp = fp = 0
    best = None
    rows = []
    for _, r in h.iterrows():
        tp += int(r["pos"])
        fp += int(r["neg"])
        rows.append((int(r["n"]), tp, fp))
    for thr, tp, fp in sorted(rows):
        score = tp * fp_all - fp * tp_all
        if best is None or score > best[0] \
                or (score == best[0] and thr < best[1]):
            best = (score, thr, tp, fp)
    return pd.DataFrame({
        "threshold": [np.int64(best[1])],
        "tp": [np.int64(best[2])], "fp": [np.int64(best[3])],
        "youden_j": [np.float64(best[2]) / np.float64(tp_all)
                     - np.float64(best[3])
                     / np.float64(fp_all)]})


@register("brier_murphy", sql="""
    WITH b AS (SELECT CAST(floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400)
                           + CAST((floor(epoch((SELECT max(ts)
                                        FROM events)) / 86400)
                                   - floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400))
                                  // 2 AS BIGINT) AS BIGINT)
                        AS mid),
    u AS (SELECT user_id,
                 CAST(sum(CASE WHEN CAST(floor(epoch(ts) / 86400)
                                    AS BIGINT)
                               <= (SELECT mid FROM b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN CAST(floor(epoch(ts) / 86400)
                                    AS BIGINT)
                               <= (SELECT mid FROM b)
                               AND event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS s1,
                 CAST(max(CASE WHEN CAST(floor(epoch(ts) / 86400)
                                    AS BIGINT)
                               > (SELECT mid FROM b)
                               AND event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS o
          FROM events GROUP BY user_id),
    q AS (SELECT 1000000 * s1 // n1 AS q, o,
                 least(10 * (1000000 * s1 // n1) // 1000000, 9)
                   AS bin
          FROM u WHERE n1 > 0),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(o) AS BIGINT) AS hh,
                 CAST(sum((q - 1000000 * o) * (q - 1000000 * o))
                      AS HUGEINT) AS bnum
          FROM q),
    g AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(q) AS HUGEINT) AS sq,
                 CAST(sum(o) AS BIGINT) AS h
          FROM q GROUP BY bin),
    d AS (SELECT
        CAST(sum((sq - 1000000 * CAST(h AS HUGEINT))
                 * (sq - 1000000 * CAST(h AS HUGEINT)) // cnt)
             AS HUGEINT) AS rel_s,
        CAST(sum((CAST(h AS HUGEINT) * (SELECT n FROM t)
                  - CAST((SELECT hh FROM t) AS HUGEINT) * cnt)
                 * (CAST(h AS HUGEINT) * (SELECT n FROM t)
                    - CAST((SELECT hh FROM t) AS HUGEINT) * cnt)
                 // cnt) AS HUGEINT) AS res_s,
        CAST(sum(abs(sq - 1000000 * CAST(h AS HUGEINT)))
             AS HUGEINT) AS ece_s
        FROM g)
    SELECT (SELECT n FROM t) AS n_users,
           CAST((SELECT bnum FROM t) AS DOUBLE)
           / (1000000000000.0
              * CAST((SELECT n FROM t) AS DOUBLE)) AS brier,
           CAST((SELECT rel_s FROM d) AS DOUBLE)
           / (1000000000000.0
              * CAST((SELECT n FROM t) AS DOUBLE))
             AS reliability,
           CAST((SELECT res_s FROM d) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * CAST((SELECT n FROM t) AS DOUBLE)
              * CAST((SELECT n FROM t) AS DOUBLE))
             AS resolution,
           (CAST((SELECT hh FROM t) AS DOUBLE)
            / CAST((SELECT n FROM t) AS DOUBLE))
           * (1.0 - CAST((SELECT hh FROM t) AS DOUBLE)
                    / CAST((SELECT n FROM t) AS DOUBLE))
             AS uncertainty,
           CAST((SELECT ece_s FROM d) AS DOUBLE)
           / (1000000.0 * CAST((SELECT n FROM t) AS DOUBLE))
             AS ece""")
def brier_murphy(sf_dir: str):
    """BRIER SCORE with the MURPHY DECOMPOSITION and ECE for the
    'first-half purchase rate predicts a second-half purchase'
    forecaster: Brier = REL - RES + UNC splits forecast error
    into miscalibration, discrimination and base-rate entropy —
    the diagnosis calibration_bins' reliability table eyeballs,
    here as auditable scalars plus the expected calibration error.
    Each user's confidence is the micro-quantized exact rational
    floor(1e6*s1/n1), so the Brier numerator sum (q - 1e6*o)^2 and
    ECE numerator sum|sq_b - 1e6*h_b| are EXACT integers; the
    per-bin REL/RES terms use exact integer floor-division by the
    bin count (identical both engines) before exact summation.
    Scale plan: one user exchange (half-split census is
    partition-local); bins are a bounded 10-cell combine."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mn": [int(day.min())],
                             "mx": [int(day.max())]})

    bd = ds.map_batches(bounds, batch_format="pandas").to_pandas()
    mid = int(bd["mn"].min()) + (int(bd["mx"].max())
                                 - int(bd["mn"].min())) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        first = (day <= mid).astype(np.int64)
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n1": first, "s1": first * pur,
            "o": (1 - first) * pur}) \
            .groupby("user_id", as_index=False) \
            .agg({"n1": "sum", "s1": "sum", "o": "max"})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False) \
            .agg({"n1": "sum", "s1": "sum", "o": "max"})
        for c in ("n1", "s1", "o"):
            a[c] = a[c].astype(np.int64)
        return a

    u = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], cells, 16).to_pandas()
    u = u[u["n1"] > 0]
    q = (1000000 * u["s1"].to_numpy(np.int64)
         // u["n1"].to_numpy(np.int64))
    o = u["o"].to_numpy(np.int64)
    bins = np.minimum(10 * q // 1000000, 9)
    n = len(u)
    hh = int(o.sum())
    bnum = int(((q - 1000000 * o) ** 2).sum())
    rel_s = res_s = ece_s = 0
    for b in range(10):
        m = bins == b
        cnt = int(m.sum())
        if cnt == 0:
            continue
        sq = int(q[m].sum())
        h = int(o[m].sum())
        rel_s += (sq - 1000000 * h) ** 2 // cnt
        res_s += (h * n - hh * cnt) ** 2 // cnt
        ece_s += abs(sq - 1000000 * h)
    return pd.DataFrame({
        "n_users": [np.int64(n)],
        "brier": [np.float64(bnum)
                  / (1.0e12 * np.float64(n))],
        "reliability": [np.float64(rel_s)
                        / (1.0e12 * np.float64(n))],
        "resolution": [np.float64(res_s)
                       / (np.float64(n) * np.float64(n)
                          * np.float64(n))],
        "uncertainty": [(np.float64(hh) / np.float64(n))
                        * (1.0 - np.float64(hh)
                           / np.float64(n))],
        "ece": [np.float64(ece_s)
                / (1.0e6 * np.float64(n))]})


@register("average_precision", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                      CAST(max(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1),
    r AS (SELECT p,
                 CAST(row_number() OVER (ORDER BY n DESC,
                                         user_id) AS BIGINT)
                   AS rk,
                 CAST(sum(p) OVER (ORDER BY n DESC, user_id)
                      AS BIGINT) AS tp
          FROM u),
    t AS (SELECT CAST(sum(p) AS BIGINT) AS pos FROM u),
    s AS (SELECT CAST(sum(1000000 * tp // rk) AS HUGEINT) AS acc
          FROM r WHERE p = 1)
    SELECT (SELECT pos FROM t) AS n_positives,
           CAST((SELECT acc FROM s) AS DOUBLE)
           / (1000000.0
              * CAST((SELECT pos FROM t) AS DOUBLE))
             AS average_precision""")
def average_precision(sf_dir: str):
    """AVERAGE PRECISION (exact PR-AUC) of the activity ranking
    against the purchaser label: AP = mean over positives of
    precision-at-their-rank — the precision-recall counterpart to
    rbp_eval / ndcg (which discount by POSITION; AP integrates
    PRECISION, making it the standard for imbalanced retrieval).
    Each positive's precision tp/rank is an exact rational,
    micro-quantized by integer floor-division (identical both
    engines) and summed exactly; AP is one final division. Scale
    plan: per-user counts through one user exchange; the global
    ranking is the two-phase rank exchange at fleet scale (here
    the guarded driver sort)."""
    ds = _events(sf_dir, ["user_id", "event_type"])
    u = partition_map(
        ds.map_batches(_user_label_partial,
                       batch_format="pandas"),
        ["user_id"], _user_label_cells, 16).to_pandas()
    u = u.sort_values(["n", "user_id"],
                      ascending=[False, True],
                      kind="mergesort").reset_index(drop=True)
    p = u["p"].to_numpy(np.int64)
    tp = np.cumsum(p)
    pos = int(p.sum())
    ranks = np.arange(1, len(u) + 1, dtype=np.int64)
    acc = int((1000000 * tp[p == 1] // ranks[p == 1]).sum())
    return pd.DataFrame({
        "n_positives": [np.int64(pos)],
        "average_precision": [np.float64(acc)
                              / (1.0e6 * np.float64(pos))]})
