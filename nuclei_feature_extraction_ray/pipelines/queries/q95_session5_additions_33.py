# round-5 session-5 additions, batch 33: Otsu two-class threshold
# on the daily revenue histogram, the Brunner-Munzel relative-effect
# test, and a greedy bandit offline replay as an integer recursion.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)


@register("otsu_threshold", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    c AS (SELECT v,
                 CAST(row_number() OVER (ORDER BY v, day)
                      AS BIGINT) AS nl,
                 CAST(sum(v) OVER (ORDER BY v, day
                      ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS sl
          FROM d),
    f AS (SELECT v, nl,
                 (CAST((SELECT s FROM t) AS DOUBLE)
                  * CAST(nl AS DOUBLE)
                  - CAST((SELECT n FROM t) AS DOUBLE)
                    * CAST(sl AS DOUBLE))
                 * (CAST((SELECT s FROM t) AS DOUBLE)
                    * CAST(nl AS DOUBLE)
                    - CAST((SELECT n FROM t) AS DOUBLE)
                      * CAST(sl AS DOUBLE))
                 / (CAST(nl AS DOUBLE)
                    * CAST((SELECT n FROM t) - nl AS DOUBLE))
                   AS bc
          FROM c WHERE nl < (SELECT n FROM t)),
    best AS (SELECT v, nl, bc,
                    row_number() OVER (ORDER BY bc DESC, v) AS r
             FROM f)
    SELECT (SELECT n FROM t) AS n_days,
           CAST(v AS BIGINT) AS threshold_cents,
           nl AS n_low, bc AS between_class_score
    FROM best WHERE r = 1""")
def otsu_threshold(sf_dir: str):
    """OTSU TWO-CLASS THRESHOLD on daily revenue: the split that
    maximizes between-class variance (equivalently (S*n_l -
    n*S_l)^2 / (n_l*n_r) over sorted prefixes) — the image-
    binarization classic reused to segment 'low days' from 'high
    days' with zero distributional assumptions, the unsupervised
    sibling of best_split_value's supervised stump. Prefix counts
    and sums are exact integers in (value, day) order; every
    candidate score is the SAME float expression on both engines
    and the argmax breaks ties by threshold value — deterministic.
    Scale plan: bounded day-domain combine; the prefix scan is
    O(days) on the driver."""
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
    vs = v[order]
    s = int(vs.sum())
    best = (np.float64(-1.0), None, None)
    sl = 0
    for i in range(n - 1):
        sl += int(vs[i])
        nl = i + 1
        num = np.float64(s) * np.float64(nl) \
            - np.float64(n) * np.float64(sl)
        bc = num * num / (np.float64(nl) * np.float64(n - nl))
        if bc > best[0] or (bc == best[0]
                            and int(vs[i]) < best[1]):
            best = (bc, int(vs[i]), nl)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "threshold_cents": [np.int64(best[1])],
        "n_low": [np.int64(best[2])],
        "between_class_score": [np.float64(best[0])]})


@register("brunner_munzel", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
                 CAST(sum(b) AS BIGINT) AS n2 FROM h),
    r AS (SELECT v, a, b,
                 CAST(2 * (sum(a + b) OVER (ORDER BY v) - (a + b))
                      + (a + b) + 1 AS BIGINT) AS pm2,
                 CAST(2 * (sum(a) OVER (ORDER BY v) - a) + a + 1
                      AS BIGINT) AS wm2a,
                 CAST(2 * (sum(b) OVER (ORDER BY v) - b) + b + 1
                      AS BIGINT) AS wm2b
          FROM h),
    m AS (SELECT
        CAST(sum(a * pm2) AS HUGEINT) AS ra,
        CAST(sum(b * pm2) AS HUGEINT) AS rb,
        CAST(sum(a * (pm2 - wm2a)) AS HUGEINT) AS da,
        CAST(sum(CAST(a AS HUGEINT) * (pm2 - wm2a)
                 * (pm2 - wm2a)) AS HUGEINT) AS da2,
        CAST(sum(b * (pm2 - wm2b)) AS HUGEINT) AS db,
        CAST(sum(CAST(b AS HUGEINT) * (pm2 - wm2b)
                 * (pm2 - wm2b)) AS HUGEINT) AS db2
      FROM r),
    f AS (SELECT (SELECT n1 FROM t) AS n1,
                 (SELECT n2 FROM t) AS n2,
                 (CAST(rb AS DOUBLE)
                  / CAST(2 * (SELECT n2 FROM t) AS DOUBLE)
                  - (CAST((SELECT n2 FROM t) AS DOUBLE) + 1.0)
                    / 2.0)
                 / CAST((SELECT n1 FROM t) AS DOUBLE) AS phat,
                 (CAST(da2 AS DOUBLE)
                  - CAST(da AS DOUBLE) * CAST(da AS DOUBLE)
                    / CAST((SELECT n1 FROM t) AS DOUBLE))
                 / (CAST((SELECT n1 FROM t) AS DOUBLE) - 1.0)
                 / 4.0
                 / (CAST((SELECT n2 FROM t) AS DOUBLE)
                    * CAST((SELECT n2 FROM t) AS DOUBLE)) AS v1,
                 (CAST(db2 AS DOUBLE)
                  - CAST(db AS DOUBLE) * CAST(db AS DOUBLE)
                    / CAST((SELECT n2 FROM t) AS DOUBLE))
                 / (CAST((SELECT n2 FROM t) AS DOUBLE) - 1.0)
                 / 4.0
                 / (CAST((SELECT n1 FROM t) AS DOUBLE)
                    * CAST((SELECT n1 FROM t) AS DOUBLE)) AS v2
          FROM m)
    SELECT n1 AS n_returned, n2 AS n_kept,
           phat AS relative_effect,
           (phat - 0.5) / sqrt(v1 / CAST(n1 AS DOUBLE)
                               + v2 / CAST(n2 AS DOUBLE))
             AS bm_w
    FROM f""")
def brunner_munzel(sf_dir: str):
    """BRUNNER-MUNZEL relative-effect test: the probability that a
    random kept line's quantity exceeds a random returned line's
    (with ties at half), studentized by the rank-based variance
    estimators (documented form: variances of pooled-minus-within
    midranks, scaled by the opposite group size) — the
    heteroscedasticity-robust replacement for mann_whitney when
    the two groups' spreads differ (levene_test's warning case).
    All midranks are EXACT 2-scaled integers from the bounded
    quantity histogram; rank sums and D-moments fold as exact big
    ints, and the effect and W are shared float expressions.
    Scale plan: per-batch (quantity, flag) histogram partials;
    the rank algebra is O(domain) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["l_quantity"].to_numpy(np.int64)
        r = (b["l_returnflag"].to_numpy(object)
             == "R").astype(np.int64)
        g = pd.DataFrame({"v": v, "a": r, "b": 1 - r}) \
            .groupby("v", as_index=False).sum()
        for c in ("a", "b"):
            g[c] = g[c].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["a", "b"]).sort_values("v").reset_index(drop=True)
    a = h["a"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    n1, n2 = int(a.sum()), int(b.sum())
    tot = a + b
    cump = np.cumsum(tot) - tot
    cuma = np.cumsum(a) - a
    cumb = np.cumsum(b) - b
    pm2 = 2 * cump + tot + 1
    wm2a = 2 * cuma + a + 1
    wm2b = 2 * cumb + b + 1
    rb = int((b * pm2).sum())
    da = int((a * (pm2 - wm2a)).sum())
    da2 = int((a.astype(object) * (pm2 - wm2a).astype(object)
               * (pm2 - wm2a).astype(object)).sum())
    db = int((b * (pm2 - wm2b)).sum())
    db2 = int((b.astype(object) * (pm2 - wm2b).astype(object)
               * (pm2 - wm2b).astype(object)).sum())
    phat = (np.float64(rb) / np.float64(2 * n2)
            - (np.float64(n2) + 1.0) / 2.0) / np.float64(n1)
    v1 = (np.float64(da2)
          - np.float64(da) * np.float64(da) / np.float64(n1)) \
        / (np.float64(n1) - 1.0) / 4.0 \
        / (np.float64(n2) * np.float64(n2))
    v2 = (np.float64(db2)
          - np.float64(db) * np.float64(db) / np.float64(n2)) \
        / (np.float64(n2) - 1.0) / 4.0 \
        / (np.float64(n1) * np.float64(n1))
    w = (phat - 0.5) / np.sqrt(v1 / np.float64(n1)
                               + v2 / np.float64(n2))
    return pd.DataFrame({
        "n_returned": [np.int64(n1)], "n_kept": [np.int64(n2)],
        "relative_effect": [np.float64(phat)],
        "bm_w": [np.float64(w)]})


@register("bandit_replay", sql="""
    WITH RECURSIVE d AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
                      END) AS BIGINT) AS t0,
             CAST(sum(CASE WHEN user_id % 2 = 0
                           AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0
                      END) AS BIGINT) AS t1,
             CAST(sum(CASE WHEN user_id % 2 = 1
                           AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS s1
      FROM events GROUP BY 1),
    x AS (SELECT *, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS i
          FROM d),
    rec AS (
      SELECT i, CAST(1 AS HUGEINT) + t0 * ch AS n0,
             CAST(0 AS HUGEINT) + s0 * ch AS w0,
             CAST(1 AS HUGEINT) + t1 * (1 - ch) AS n1,
             CAST(0 AS HUGEINT) + s1 * (1 - ch) AS w1,
             CAST(ch AS BIGINT) AS p0,
             CAST(s0 * ch + s1 * (1 - ch) AS HUGEINT) AS rew
      FROM (SELECT *, CASE WHEN 0 >= 0 THEN 1 ELSE 0 END AS ch
            FROM x WHERE i = 1)
      UNION ALL
      SELECT x.i,
             r.n0 + x.t0 * (CASE WHEN r.w0 * r.n1 >= r.w1 * r.n0
                            THEN 1 ELSE 0 END),
             r.w0 + x.s0 * (CASE WHEN r.w0 * r.n1 >= r.w1 * r.n0
                            THEN 1 ELSE 0 END),
             r.n1 + x.t1 * (1 - (CASE WHEN r.w0 * r.n1
                                      >= r.w1 * r.n0
                                 THEN 1 ELSE 0 END)),
             r.w1 + x.s1 * (1 - (CASE WHEN r.w0 * r.n1
                                      >= r.w1 * r.n0
                                 THEN 1 ELSE 0 END)),
             r.p0 + (CASE WHEN r.w0 * r.n1 >= r.w1 * r.n0
                     THEN 1 ELSE 0 END),
             r.rew + x.s0 * (CASE WHEN r.w0 * r.n1 >= r.w1 * r.n0
                             THEN 1 ELSE 0 END)
                   + x.s1 * (1 - (CASE WHEN r.w0 * r.n1
                                       >= r.w1 * r.n0
                                  THEN 1 ELSE 0 END))
      FROM rec r JOIN x ON x.i = r.i + 1),
    fin AS (SELECT *, row_number() OVER (ORDER BY i DESC) AS rn
            FROM rec)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           CAST(p0 AS BIGINT) AS arm0_pulls,
           CAST((SELECT count(*) FROM d) - p0 AS BIGINT)
             AS arm1_pulls,
           CAST(rew AS BIGINT) AS total_reward,
           CAST(w0 AS BIGINT) AS arm0_wins,
           CAST(w1 AS BIGINT) AS arm1_wins
    FROM fin WHERE rn = 1""")
def bandit_replay(sf_dir: str):
    """GREEDY BANDIT OFFLINE REPLAY over the daily two-arm log
    (users split by id parity; reward = purchases): each day the
    policy pulls the arm with the higher EXACT running mean
    (w0*n1 >= w1*n0 — integer cross-multiplication, arm-0
    tie-break; counts seeded at 1 trial / 0 wins), collects that
    arm's realized successes, and updates only the chosen arm —
    the counterfactual policy-evaluation primitive behind every
    'would the bandit have beaten the A/B split' analysis. The
    WHOLE replay is integer state (day-ordered recursion,
    bit-identical to the recursive-CTE oracle — the rsi/kleinberg
    policy). Scale plan: per-batch day-arm cells through the
    bounded day-domain combine; the inherently sequential replay
    is O(days) on the driver."""
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
        ["day"], ["t0", "s0", "t1", "s1"],
        exact_int=True).sort_values("day").reset_index(drop=True)
    n0 = n1 = 1
    w0 = w1 = 0
    p0 = rew = 0
    for _, r in d.iterrows():
        ch = 1 if w0 * n1 >= w1 * n0 else 0
        if ch:
            n0 += int(r["t0"])
            w0 += int(r["s0"])
            rew += int(r["s0"])
            p0 += 1
        else:
            n1 += int(r["t1"])
            w1 += int(r["s1"])
            rew += int(r["s1"])
    nd = len(d)
    return pd.DataFrame({
        "n_days": [np.int64(nd)], "arm0_pulls": [np.int64(p0)],
        "arm1_pulls": [np.int64(nd - p0)],
        "total_reward": [np.int64(rew)],
        "arm0_wins": [np.int64(w0)],
        "arm1_wins": [np.int64(w1)]})
