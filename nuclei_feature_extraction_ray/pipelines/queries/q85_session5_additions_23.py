# round-5 session-5 additions, batch 23: Kleinberg two-state burst
# detection as an integer Viterbi forward pass, a regression-
# discontinuity estimate at a spend cutoff, and Theil's U2 forecast
# quality ratio.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)

_KB_GAMMA = 1000000     # state-up transition cost, micro-nats
_RDD_CUT = 15000000     # cutoff: 150k$ in cents
_RDD_H = 5000000        # bandwidth: 50k$ in cents


@register("kleinberg_burst", sql="""
    WITH RECURSIVE d AS (
      SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(n) AS BIGINT) AS s FROM d),
    lam AS (SELECT CAST((SELECT s FROM m) AS DOUBLE)
                   / CAST((SELECT nd FROM m) AS DOUBLE) AS l0),
    x AS (SELECT n, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    cost AS (SELECT t, n,
                    CAST(floor(((SELECT l0 FROM lam)
                         - CAST(n AS DOUBLE)
                           * ln((SELECT l0 FROM lam)))
                         * 1000000.0 + 0.5) AS BIGINT) AS k0,
                    CAST(floor((2.0 * (SELECT l0 FROM lam)
                         - CAST(n AS DOUBLE)
                           * ln(2.0 * (SELECT l0 FROM lam)))
                         * 1000000.0 + 0.5) AS BIGINT) AS k1
             FROM x),
    rec AS (
      SELECT t, k0 AS c0, k1 + {g} AS c1,
             CASE WHEN k1 + {g} < k0 THEN 1 ELSE 0 END AS b
      FROM cost WHERE t = 1
      UNION ALL
      SELECT c.t,
             least(r.c0, r.c1) + c.k0,
             least(r.c0 + {g}, r.c1) + c.k1,
             r.b + CASE WHEN least(r.c0 + {g}, r.c1) + c.k1
                             < least(r.c0, r.c1) + c.k0
                        THEN 1 ELSE 0 END
      FROM rec r JOIN cost c ON c.t = r.t + 1),
    fin AS (SELECT *, row_number() OVER (ORDER BY t DESC) AS rn
            FROM rec)
    SELECT CAST((SELECT nd FROM m) AS BIGINT) AS n_days,
           CAST(least(c0, c1) AS BIGINT) AS min_cost_micro,
           CAST(b AS BIGINT) AS burst_days
    FROM fin WHERE rn = 1""".format(g=_KB_GAMMA))
def kleinberg_burst(sf_dir: str):
    """KLEINBERG TWO-STATE BURST DETECTION on the daily event
    stream: a Viterbi forward pass over states {{base rate,
    2x rate}} with Poisson-likelihood emission costs (the common
    ln n! term cancels between states and is dropped) and a 1-nat
    up-transition penalty; reports the optimal final cost and the
    forward-dominance burst-day census (days where the burst
    state's running cost beats the base state's — the documented
    deterministic definition). Emission costs quantize to micro-
    nats half-up, so the WHOLE dynamic program is integer min/plus
    — bit-identical to the recursive-CTE oracle (the holt/rsi
    recursion policy applied to a 2-state DP). Scale plan:
    per-batch (day, count) partials through the bounded day-domain
    combine; the DP is O(days) on the driver."""
    ds = _events(sf_dir, ["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        g = pd.DataFrame({"day": day,
                          "n": np.ones(len(b), np.int64)}) \
            .groupby("day", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    n = [int(x) for x in d["n"]]
    nd = len(n)
    s = sum(n)
    l0 = np.float64(s) / np.float64(nd)
    k0 = [int(np.floor((l0 - np.float64(v) * np.log(l0))
                       * 1000000.0 + 0.5)) for v in n]
    k1 = [int(np.floor((2.0 * l0 - np.float64(v)
                        * np.log(2.0 * l0))
                       * 1000000.0 + 0.5)) for v in n]
    c0, c1 = k0[0], k1[0] + _KB_GAMMA
    b = 1 if c1 < c0 else 0
    for t in range(1, nd):
        nc0 = min(c0, c1) + k0[t]
        nc1 = min(c0 + _KB_GAMMA, c1) + k1[t]
        if nc1 < nc0:
            b += 1
        c0, c1 = nc0, nc1
    return pd.DataFrame({
        "n_days": [np.int64(nd)],
        "min_cost_micro": [np.int64(min(c0, c1))],
        "burst_days": [np.int64(b)]})


@register("rdd_estimate", sql="""
    WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x,
                      CAST(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN 1 ELSE 0 END AS BIGINT) AS y
               FROM orders),
    lw AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(x) AS HUGEINT) AS sx,
                  CAST(sum(y) AS HUGEINT) AS sy,
                  CAST(sum(x * x) AS HUGEINT) AS sxx,
                  CAST(sum(x * y) AS HUGEINT) AS sxy
           FROM o WHERE x >= {c} - {h} AND x < {c}),
    rw AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                  CAST(sum(x) AS HUGEINT) AS sx,
                  CAST(sum(y) AS HUGEINT) AS sy,
                  CAST(sum(x * x) AS HUGEINT) AS sxx,
                  CAST(sum(x * y) AS HUGEINT) AS sxy
           FROM o WHERE x >= {c} AND x < {c} + {h}),
    p AS (SELECT
        CAST((SELECT n FROM lw) AS BIGINT) AS n_left,
        CAST((SELECT n FROM rw) AS BIGINT) AS n_right,
        CAST((SELECT sy FROM lw) * ((SELECT n FROM lw)
               * (SELECT sxx FROM lw)
               - (SELECT sx FROM lw) * (SELECT sx FROM lw))
             + ((SELECT n FROM lw) * (SELECT sxy FROM lw)
                - (SELECT sx FROM lw) * (SELECT sy FROM lw))
               * ((SELECT n FROM lw) * {c} - (SELECT sx FROM lw))
             AS DOUBLE)
        / CAST((SELECT n FROM lw)
               * ((SELECT n FROM lw) * (SELECT sxx FROM lw)
                  - (SELECT sx FROM lw) * (SELECT sx FROM lw))
               AS DOUBLE) AS pred_left,
        CAST((SELECT sy FROM rw) * ((SELECT n FROM rw)
               * (SELECT sxx FROM rw)
               - (SELECT sx FROM rw) * (SELECT sx FROM rw))
             + ((SELECT n FROM rw) * (SELECT sxy FROM rw)
                - (SELECT sx FROM rw) * (SELECT sy FROM rw))
               * ((SELECT n FROM rw) * {c} - (SELECT sx FROM rw))
             AS DOUBLE)
        / CAST((SELECT n FROM rw)
               * ((SELECT n FROM rw) * (SELECT sxx FROM rw)
                  - (SELECT sx FROM rw) * (SELECT sx FROM rw))
               AS DOUBLE) AS pred_right)
    SELECT n_left, n_right, pred_left, pred_right,
           pred_right - pred_left AS rdd_jump
    FROM p""".format(c=_RDD_CUT, h=_RDD_H))
def rdd_estimate(sf_dir: str):
    """REGRESSION DISCONTINUITY estimate of the urgent-priority
    rate at the 150k$ order-value cutoff: separate linear fits on
    the 50k$ bandwidth each side, both extrapolated TO the cutoff,
    jump = right - left — the quasi-experimental operator for
    threshold-triggered treatments (pricing tiers, eligibility
    cliffs) where diff_in_diff has no second period. Each side's
    prediction at the cutoff is a closed-form rational of EXACT
    integer moments (Sy*D + B*(nC - Sx)) / (n*D) — python int /
    HUGEINT throughout (terms reach ~1e25), ONE float division per
    side. Scale plan: two windowed 5-cell moment partials, map-only
    with the bandwidth predicate pushed into the batch filter."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice",
                                  "o_orderpriority"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        y = (b["o_orderpriority"].to_numpy(object)
             == "1-URGENT").astype(np.int64)
        rows = []
        for side, m in (
                (0, (x >= _RDD_CUT - _RDD_H) & (x < _RDD_CUT)),
                (1, (x >= _RDD_CUT) & (x < _RDD_CUT + _RDD_H))):
            xs = x[m].astype(object)
            ys = y[m].astype(object)
            rows.append({"side": side, "n": int(m.sum()),
                         "sx": int(xs.sum()), "sy": int(ys.sum()),
                         "sxx": int((xs * xs).sum()),
                         "sxy": int((xs * ys).sum())})
        return pd.DataFrame(rows)

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["side"], ["n", "sx", "sy", "sxx", "sxy"], exact_int=True)

    def pred(side: int) -> np.float64:
        r = s[s["side"] == side].iloc[0]
        n, sx, sy = int(r["n"]), int(r["sx"]), int(r["sy"])
        sxx, sxy = int(r["sxx"]), int(r["sxy"])
        dd = n * sxx - sx * sx
        bb = n * sxy - sx * sy
        num = sy * dd + bb * (n * _RDD_CUT - sx)
        return np.float64(num) / np.float64(n * dd)

    nl = int(s.loc[s["side"] == 0, "n"].iloc[0])
    nr = int(s.loc[s["side"] == 1, "n"].iloc[0])
    pl, pr = pred(0), pred(1)
    return pd.DataFrame({
        "n_left": [np.int64(nl)], "n_right": [np.int64(nr)],
        "pred_left": [np.float64(pl)],
        "pred_right": [np.float64(pr)],
        "rdd_jump": [np.float64(pr - pl)]})


@register("theil_u2", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    e AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum((a.v - b.v) * (a.v - b.v)) AS HUGEINT)
                   AS ss7
          FROM x a JOIN x b ON b.t = a.t - 7),
    f AS (SELECT CAST(sum((a.v - b.v) * (a.v - b.v)) AS HUGEINT)
                   AS ss1
          FROM x a JOIN x b ON b.t = a.t - 1
          WHERE a.t >= 8)
    SELECT (SELECT n FROM e) AS n_evaluated,
           CAST((SELECT ss7 FROM e) AS DOUBLE) AS sse_seasonal,
           CAST((SELECT ss1 FROM f) AS DOUBLE) AS sse_naive,
           sqrt(CAST((SELECT ss7 FROM e) AS DOUBLE)
                / CAST((SELECT ss1 FROM f) AS DOUBLE)) AS theil_u2
    FROM e""")
def theil_u2(sf_dir: str):
    """THEIL'S U2 forecast quality ratio: the seasonal-naive
    forecast (same weekday last week) against the naive benchmark
    (yesterday), on the same evaluation days — U2 < 1 means weekly
    seasonality genuinely helps prediction, the decision criterion
    forecast_backtest's raw MAPE cannot give without a baseline.
    Both squared-error sums are EXACT integer folds over the
    day-domain series (python int / HUGEINT); U2 is one shared
    sqrt-of-ratio. Scale plan: per-batch (day, cents) partials
    through the bounded day-domain combine; the two lagged scans
    are O(days) on the driver."""
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
    ss7 = sum((v[i] - v[i - 7]) ** 2 for i in range(7, len(v)))
    ss1 = sum((v[i] - v[i - 1]) ** 2 for i in range(7, len(v)))
    n = len(v) - 7
    return pd.DataFrame({
        "n_evaluated": [np.int64(n)],
        "sse_seasonal": [np.float64(ss7)],
        "sse_naive": [np.float64(ss1)],
        "theil_u2": [np.sqrt(np.float64(ss7)
                             / np.float64(ss1))]})
