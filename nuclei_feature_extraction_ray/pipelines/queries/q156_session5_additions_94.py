# round-5 session-5 additions, batch 94: Cox proportional hazards
# with a binary covariate by two quantized Newton steps, and 2x2
# canonical correlation in closed form.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map


@register("cox_binary", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS x,
                      min(CAST(floor(epoch(ts) / 86400)
                               AS BIGINT)) AS fd,
                      min(CASE WHEN event_type = 'purchase'
                          THEN CAST(floor(epoch(ts) / 86400)
                                    AS BIGINT) END) AS fp,
                      max(CAST(floor(epoch(ts) / 86400)
                               AS BIGINT)) AS ld
               FROM events GROUP BY user_id),
    s AS (SELECT x,
                 CASE WHEN fp IS NOT NULL THEN fp - fd
                      ELSE ld - fd END AS t,
                 CAST(CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END
                      AS BIGINT) AS delta
          FROM u),
    tc AS (SELECT t,
                  CAST(sum(CASE WHEN x = 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS c0,
                  CAST(sum(CASE WHEN x = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS c1
           FROM s GROUP BY t),
    suf AS (SELECT t,
                   CAST(sum(c0) OVER (ORDER BY t DESC)
                        AS BIGINT) AS n0,
                   CAST(sum(c1) OVER (ORDER BY t DESC)
                        AS BIGINT) AS n1
            FROM tc),
    ev AS (SELECT s.x, s.t, suf.n0, suf.n1
           FROM s JOIN suf ON suf.t = s.t
           WHERE s.delta = 1),
    st1 AS (SELECT
        CAST(sum(CAST(floor((CAST(x AS DOUBLE)
             - CAST(n1 AS DOUBLE)
               / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
             * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT) AS sc,
        CAST(sum(CAST(floor((CAST(n0 AS DOUBLE)
             * CAST(n1 AS DOUBLE)
             / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
                * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))))
             * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT) AS info
        FROM ev),
    b1 AS (SELECT CASE WHEN sc >= 0
                  THEN sc * 1000000 // info
                  ELSE -((-sc) * 1000000 // info) END AS b
           FROM st1),
    st2 AS (SELECT
        CAST(sum(CAST(floor((CAST(x AS DOUBLE)
             - CAST(n1 AS DOUBLE)
               * exp(CAST((SELECT b FROM b1) AS DOUBLE)
                     / 1000000.0)
               / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)
                  * exp(CAST((SELECT b FROM b1) AS DOUBLE)
                        / 1000000.0)))
             * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT) AS sc,
        CAST(sum(CAST(floor((CAST(n0 AS DOUBLE)
             * CAST(n1 AS DOUBLE)
             * exp(CAST((SELECT b FROM b1) AS DOUBLE)
                   / 1000000.0)
             / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)
                 * exp(CAST((SELECT b FROM b1) AS DOUBLE)
                       / 1000000.0))
                * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)
                   * exp(CAST((SELECT b FROM b1) AS DOUBLE)
                         / 1000000.0))))
             * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT) AS info
        FROM ev),
    b2 AS (SELECT (SELECT b FROM b1)
                  + CASE WHEN sc >= 0
                    THEN sc * 1000000 // info
                    ELSE -((-sc) * 1000000 // info) END AS b
           FROM st2)
    SELECT CAST((SELECT count(*) FROM ev) AS BIGINT)
             AS n_events,
           CAST((SELECT count(*) FROM s) AS BIGINT) AS n_users,
           CAST((SELECT b FROM b2) AS DOUBLE) / 1000000.0
             AS cox_beta,
           exp(CAST((SELECT b FROM b2) AS DOUBLE) / 1000000.0)
             AS hazard_ratio""")
def cox_binary(sf_dir: str):
    """COX PROPORTIONAL HAZARDS for time-to-first-purchase with
    the binary arm covariate, fit by TWO Newton steps on the
    Breslow partial likelihood: score = sum over events of x_i -
    n1*e^b/(n0 + n1*e^b) over the at-risk counts, info its
    variance analogue — the semiparametric survival REGRESSION
    (logrank_test is exactly its score test at b = 0; this
    reports the hazard ratio itself, with censoring handled).
    At-risk counts are exact suffix integers; each event's
    score/info term is a shared float on exact ints,
    micro-quantized before the exact fold (the dp_noisy policy),
    and each Newton increment is a sign-magnitude exact floor
    division — the iterate is bit-identical across engines.
    Scale plan: one user exchange builds (time, arm, delta)
    rows; risk counts are a bounded time-domain suffix scan."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        pur = (b["event_type"].to_numpy(object)
               == "purchase")
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "fd": day, "ld": day,
            "fp": np.where(pur, day, np.iinfo(np.int64).max)})
        return g.groupby("user_id", as_index=False) \
            .agg({"fd": "min", "ld": "max", "fp": "min"})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False) \
            .agg({"fd": "min", "ld": "max", "fp": "min"})
        return a

    u = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], cells, 16).to_pandas()
    mx = np.iinfo(np.int64).max
    x = (u["user_id"].to_numpy(np.int64) % 2).astype(np.int64)
    fp = u["fp"].to_numpy(np.int64)
    fd = u["fd"].to_numpy(np.int64)
    ld = u["ld"].to_numpy(np.int64)
    delta = (fp != mx).astype(np.int64)
    t = np.where(delta == 1, fp - fd, ld - fd)
    # suffix at-risk counts per distinct time
    times = sorted(set(int(v) for v in t), reverse=True)
    c0 = {}
    c1 = {}
    for ti, xi in zip(t, x):
        d = c1 if xi else c0
        d[int(ti)] = d.get(int(ti), 0) + 1
    n0s = {}
    n1s = {}
    a0 = a1 = 0
    for ti in times:
        a0 += c0.get(ti, 0)
        a1 += c1.get(ti, 0)
        n0s[ti] = a0
        n1s[ti] = a1
    evs = [(int(xi), n0s[int(ti)], n1s[int(ti)])
           for xi, ti, dl in zip(x, t, delta) if dl == 1]

    def newton(b_micro):
        eb = np.exp(np.float64(b_micro) / 1000000.0) \
            if b_micro is not None else None
        sc = info = 0
        for xi, n0, n1 in evs:
            if eb is None:
                p = np.float64(n1) / (np.float64(n0)
                                      + np.float64(n1))
                w = np.float64(n0) * np.float64(n1) \
                    / ((np.float64(n0) + np.float64(n1))
                       * (np.float64(n0) + np.float64(n1)))
            else:
                p = np.float64(n1) * eb \
                    / (np.float64(n0) + np.float64(n1) * eb)
                w = np.float64(n0) * np.float64(n1) * eb \
                    / ((np.float64(n0) + np.float64(n1) * eb)
                       * (np.float64(n0)
                          + np.float64(n1) * eb))
            sc += int(np.floor((np.float64(xi) - p)
                               * 1000000.0 + 0.5))
            info += int(np.floor(w * 1000000.0 + 0.5))
        step = (sc * 1000000 // info) if sc >= 0 \
            else -((-sc) * 1000000 // info)
        return step

    b1 = newton(None)
    b2 = b1 + newton(b1)
    return pd.DataFrame({
        "n_events": [np.int64(len(evs))],
        "n_users": [np.int64(len(u))],
        "cox_beta": [np.float64(b2) / 1000000.0],
        "hazard_ratio": [np.exp(np.float64(b2) / 1000000.0)]})


@register("cca_2x2", sql="""
    WITH u AS (SELECT user_id,
                      CAST(count(*) AS BIGINT) AS x1,
                      CAST(count(DISTINCT CAST(floor(epoch(ts)
                           / 86400) AS BIGINT)) AS BIGINT) AS x2,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS y1,
                      CAST(count(*) FILTER (
                          event_type = 'click') AS BIGINT) AS y2
               FROM events GROUP BY user_id),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x1) AS HUGEINT) AS sx1,
                 CAST(sum(x2) AS HUGEINT) AS sx2,
                 CAST(sum(y1) AS HUGEINT) AS sy1,
                 CAST(sum(y2) AS HUGEINT) AS sy2,
                 CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT)
                   AS x11,
                 CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT)
                   AS x12,
                 CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT)
                   AS x22,
                 CAST(sum(CAST(y1 AS HUGEINT) * y1) AS HUGEINT)
                   AS y11,
                 CAST(sum(CAST(y1 AS HUGEINT) * y2) AS HUGEINT)
                   AS y12,
                 CAST(sum(CAST(y2 AS HUGEINT) * y2) AS HUGEINT)
                   AS y22,
                 CAST(sum(CAST(x1 AS HUGEINT) * y1) AS HUGEINT)
                   AS c11,
                 CAST(sum(CAST(x1 AS HUGEINT) * y2) AS HUGEINT)
                   AS c12,
                 CAST(sum(CAST(x2 AS HUGEINT) * y1) AS HUGEINT)
                   AS c21,
                 CAST(sum(CAST(x2 AS HUGEINT) * y2) AS HUGEINT)
                   AS c22
          FROM u),
    c AS (SELECT n,
                 CAST(n * x11 - sx1 * sx1 AS DOUBLE) AS a11,
                 CAST(n * x12 - sx1 * sx2 AS DOUBLE) AS a12,
                 CAST(n * x22 - sx2 * sx2 AS DOUBLE) AS a22,
                 CAST(n * y11 - sy1 * sy1 AS DOUBLE) AS b11,
                 CAST(n * y12 - sy1 * sy2 AS DOUBLE) AS b12,
                 CAST(n * y22 - sy2 * sy2 AS DOUBLE) AS b22,
                 CAST(n * c11 - sx1 * sy1 AS DOUBLE) AS g11,
                 CAST(n * c12 - sx1 * sy2 AS DOUBLE) AS g12,
                 CAST(n * c21 - sx2 * sy1 AS DOUBLE) AS g21,
                 CAST(n * c22 - sx2 * sy2 AS DOUBLE) AS g22
          FROM m),
    e AS (SELECT n,
                 a11 * a22 - a12 * a12 AS da,
                 b11 * b22 - b12 * b12 AS db,
                 g11 * g22 - g12 * g21 AS dg,
                 (g11 * b22 - g12 * b12) * g11
                 + (g12 * b11 - g11 * b12) * g12 AS e11,
                 (g11 * b22 - g12 * b12) * g21
                 + (g12 * b11 - g11 * b12) * g22 AS e12,
                 (g21 * b22 - g22 * b12) * g11
                 + (g22 * b11 - g21 * b12) * g12 AS e21,
                 (g21 * b22 - g22 * b12) * g21
                 + (g22 * b11 - g21 * b12) * g22 AS e22,
                 a11, a12, a22
          FROM c),
    f AS (SELECT n,
                 (a22 * e11 - a12 * e21
                  + a11 * e22 - a12 * e12) / (da * db) AS trm,
                 (dg * dg) / (da * db) AS detm
          FROM e)
    SELECT CAST(n AS BIGINT) AS n_users,
           sqrt((trm + sqrt(trm * trm - 4.0 * detm)) / 2.0)
             AS cca_rho1
    FROM f""")
def cca_2x2(sf_dir: str):
    """CANONICAL CORRELATION (2x2, closed form) between the
    activity block (total events, distinct active days) and the
    outcome block (purchases, clicks) per user: the largest
    canonical correlation is the sqrt of the dominant eigenvalue
    of Cxx^-1 Cxy Cyy^-1 Cyx, solved EXACTLY from the quadratic
    trace/determinant characteristic polynomial — the
    maximal-correlation-between-SUBSPACES question that no single
    pairwise correlation (or ridge_2d's one-response regression)
    can answer: how predictable is the best linear outcome index
    from the best linear activity index? All 14 raw moments fold
    as exact big ints inside the user exchange; the n-scaled
    central moments are exact, and the trace/det algebra is
    evaluated as IDENTICAL shared float expressions (the
    granger_1lag policy for beyond-INT128 products). Scale plan:
    one user exchange into a 14-cell moment combine; O(1)
    driver arithmetic."""
    from ...stages.partition import partitioned_apply
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        day = (g["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        et = g["event_type"].to_numpy(object)
        a = pd.DataFrame({
            "u": g["user_id"].to_numpy(np.int64), "d": day,
            "p": (et == "purchase").astype(np.int64),
            "k": (et == "click").astype(np.int64)})
        per = a.groupby("u").agg(
            x1=("d", "size"), x2=("d", "nunique"),
            y1=("p", "sum"), y2=("k", "sum"))
        cols = {}
        arrs = {c: per[c].to_numpy(np.int64).astype(object)
                for c in ("x1", "x2", "y1", "y2")}
        cols["n"] = np.array([len(per)], np.int64)
        for c in ("x1", "x2", "y1", "y2"):
            cols["s" + c] = [int(arrs[c].sum())]
        for nm, (a1, a2) in {
                "x11": ("x1", "x1"), "x12": ("x1", "x2"),
                "x22": ("x2", "x2"), "y11": ("y1", "y1"),
                "y12": ("y1", "y2"), "y22": ("y2", "y2"),
                "c11": ("x1", "y1"), "c12": ("x1", "y2"),
                "c21": ("x2", "y1"), "c22": ("x2", "y2")}.items():
            cols[nm] = [int((arrs[a1] * arrs[a2]).sum())]
        cols["j"] = np.zeros(1, np.int64)
        return pd.DataFrame(cols)

    keys = ["n", "sx1", "sx2", "sy1", "sy2", "x11", "x12",
            "x22", "y11", "y12", "y22", "c11", "c12", "c21",
            "c22"]
    m = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts"]),
        ["j"], keys, exact_int=True)
    g = {k: int(m[k].iloc[0]) for k in keys}
    n = g["n"]
    a11 = np.float64(n * g["x11"] - g["sx1"] * g["sx1"])
    a12 = np.float64(n * g["x12"] - g["sx1"] * g["sx2"])
    a22 = np.float64(n * g["x22"] - g["sx2"] * g["sx2"])
    b11 = np.float64(n * g["y11"] - g["sy1"] * g["sy1"])
    b12 = np.float64(n * g["y12"] - g["sy1"] * g["sy2"])
    b22 = np.float64(n * g["y22"] - g["sy2"] * g["sy2"])
    g11 = np.float64(n * g["c11"] - g["sx1"] * g["sy1"])
    g12 = np.float64(n * g["c12"] - g["sx1"] * g["sy2"])
    g21 = np.float64(n * g["c21"] - g["sx2"] * g["sy1"])
    g22 = np.float64(n * g["c22"] - g["sx2"] * g["sy2"])
    da = a11 * a22 - a12 * a12
    db = b11 * b22 - b12 * b12
    dg = g11 * g22 - g12 * g21
    e11 = (g11 * b22 - g12 * b12) * g11 \
        + (g12 * b11 - g11 * b12) * g12
    e12 = (g11 * b22 - g12 * b12) * g21 \
        + (g12 * b11 - g11 * b12) * g22
    e21 = (g21 * b22 - g22 * b12) * g11 \
        + (g22 * b11 - g21 * b12) * g12
    e22 = (g21 * b22 - g22 * b12) * g21 \
        + (g22 * b11 - g21 * b12) * g22
    trm = (a22 * e11 - a12 * e21 + a11 * e22 - a12 * e12) \
        / (da * db)
    detm = (dg * dg) / (da * db)
    rho = np.sqrt((trm + np.sqrt(trm * trm - 4.0 * detm)) / 2.0)
    return pd.DataFrame({
        "n_users": [np.int64(n)],
        "cca_rho1": [np.float64(rho)]})
