# round-5 session-4 additions, batch 2: weight-of-evidence /
# information-value encoding, maximum drawdown of the cumulative
# revenue curve, and the Durbin-Watson residual-autocorrelation test.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map


@register("woe_iv", sql="""
    WITH t AS (SELECT c.c_mktsegment AS seg,
                      CAST(CASE WHEN o.o_custkey IS NULL
                           THEN 0 ELSE 1 END AS BIGINT) AS good
               FROM customer c
               LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
                          WHERE o_orderstatus = 'F') o
                 ON c.c_custkey = o.o_custkey),
    s AS (SELECT seg, CAST(sum(good) AS BIGINT) AS g,
                 CAST(count(*) - sum(good) AS BIGINT) AS b
          FROM t GROUP BY seg),
    tot AS (SELECT CAST(sum(g) AS HUGEINT) AS gt,
                   CAST(sum(b) AS HUGEINT) AS bt FROM s),
    w AS (SELECT seg, g, b,
                 ln((CAST(g AS DOUBLE) * CAST((SELECT bt FROM tot)
                                              AS DOUBLE))
                    / (CAST(b AS DOUBLE) * CAST((SELECT gt FROM tot)
                                                AS DOUBLE))) AS woe,
                 CAST(CAST(g AS HUGEINT) * (SELECT bt FROM tot)
                      - CAST(b AS HUGEINT) * (SELECT gt FROM tot)
                      AS DOUBLE)
                   / CAST((SELECT gt FROM tot)
                          * (SELECT bt FROM tot) AS DOUBLE) AS dp
          FROM s),
    q AS (SELECT seg, g, b, woe,
                 CAST(floor(dp * woe * 1000000.0 + 0.5) AS BIGINT)
                   AS iv_micro
          FROM w)
    SELECT seg, g AS n_finished, b AS n_unfinished, woe,
           iv_micro,
           CAST(sum(iv_micro) OVER () AS BIGINT) AS iv_total_micro
    FROM q ORDER BY seg""")
def woe_iv(sf_dir: str):
    """WEIGHT-OF-EVIDENCE encoding + INFORMATION VALUE of the market
    segment as a predictor of 'customer has a FINISHED order' — the
    standard credit-scoring categorical encoder. WoE_i =
    ln((g_i/G)/(b_i/B)) is computed as ONE ln of a ratio of exact-int
    products (the HLL-twin ln-portability pattern), the distribution
    gap (g_i/G - b_i/B) as one division of exact ints on the common
    denominator, and each IV contribution quantizes to micro units
    with the shared half-up formula BEFORE the cross-segment sum — so
    the total IV is an exact integer fold, immune to float sum order.
    Scale plan: the distinct-custkey probe rides the orders exchange;
    per-segment (g, b) cells are a bounded grid combined once on the
    driver."""
    cust = rd.read_parquet(_path(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderstatus"]) \
        .map_batches(
            lambda b: b.loc[b["o_orderstatus"] == "F",
                            ["o_custkey"]],
            batch_format="pandas")

    def dedup_cust(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["o_custkey"])[["o_custkey"]]

    have = _combine_partials(
        partition_map(orders, ["o_custkey"], dedup_cust, 16)
        .map_batches(lambda b: pd.DataFrame(
            {"o_custkey": b["o_custkey"].to_numpy(np.int64),
             "one": np.ones(len(b), np.int64)}),
            batch_format="pandas"),
        ["o_custkey"], ["one"])
    have_keys = np.sort(have["o_custkey"].to_numpy(np.int64))
    import ray as _ray
    have_ref = _ray.put(have_keys)

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        hk = _ray.get(have_ref)
        ck = b["c_custkey"].to_numpy(np.int64)
        pos = np.searchsorted(hk, ck)
        pos[pos == len(hk)] = max(len(hk) - 1, 0)
        good = (hk[pos] == ck).astype(np.int64) if len(hk) \
            else np.zeros(len(ck), np.int64)
        g = pd.DataFrame({"seg": b["c_mktsegment"], "g": good,
                          "b": 1 - good}) \
            .groupby("seg", as_index=False).sum()
        for c in ("g", "b"):
            g[c] = g[c].astype(np.int64)
        return g

    s = _combine_partials(
        cust.map_batches(cells, batch_format="pandas"),
        ["seg"], ["g", "b"], exact_int=True)
    gt = int(s["g"].sum())
    bt = int(s["b"].sum())
    rows = []
    for _, r in s.iterrows():
        g, b = int(r["g"]), int(r["b"])
        if g > 0 and b > 0 and gt > 0 and bt > 0:
            woe = np.log((np.float64(g) * np.float64(bt))
                         / (np.float64(b) * np.float64(gt)))
            dp = np.float64(g * bt - b * gt) / np.float64(gt * bt)
            iv = int(np.floor(dp * woe * 1000000.0 + 0.5))
        else:
            # a zero cell (all-good / all-bad segment) is undefined
            # WoE; DuckDB's ln(inf-ratio) path yields NULL -> NaN and
            # the windowed total sums only the defined contributions
            woe, iv = np.nan, np.nan
        rows.append({"seg": r["seg"], "n_finished": np.int64(g),
                     "n_unfinished": np.int64(b),
                     "woe": np.float64(woe), "iv_micro": iv})
    out = pd.DataFrame(rows).sort_values(
        "seg", kind="mergesort").reset_index(drop=True)
    tot = pd.Series([r["iv_micro"] for r in rows]).sum(skipna=True)
    out["iv_total_micro"] = np.int64(int(tot)) if not pd.isna(tot) \
        else np.nan
    return out


@register("max_drawdown", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS rev
               FROM orders GROUP BY 1),
    c AS (SELECT day, rev,
                 CAST(sum(rev) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM d),
    p AS (SELECT day, cum,
                 CAST(max(cum) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
          FROM c),
    dd AS (SELECT day, peak - cum AS draw FROM p)
    SELECT CAST((SELECT count(*) FROM dd) AS BIGINT) AS n_days,
           CAST(max(draw) AS BIGINT) AS max_drawdown_cents,
           CAST((SELECT min(day) FROM dd
                 WHERE draw = (SELECT max(draw) FROM dd))
                AS BIGINT) AS trough_epoch_day
    FROM dd""")
def max_drawdown(sf_dir: str):
    """MAXIMUM DRAWDOWN of the cumulative daily revenue curve —
    running peak minus running total, maximized over days, with the
    first trough day. The whole statistic is integer cents end to
    end (prefix sum, prefix max, difference, argmax) — bit-exact.
    Scale plan: per-batch (day, cents) partials collapse through the
    guarded driver combine (the day domain is bounded by the
    calendar); the cumulative scan runs on the driver's tiny day
    series — the canonical 'aggregate to a bounded grid, then do
    sequential math on the grid' shape."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        day = (b["o_orderdate"].to_numpy("datetime64[D]")
               .astype(np.int64))
        g = pd.DataFrame({"day": day, "rev": cents}) \
            .groupby("day", as_index=False).sum()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["rev"], exact_int=True)
    d = d.sort_values("day", kind="mergesort").reset_index(drop=True)
    cum = np.cumsum([int(x) for x in d["rev"]])
    peak = np.maximum.accumulate(cum)
    draw = peak - cum
    mx = int(draw.max())
    trough = int(d["day"].iloc[int(np.flatnonzero(draw == mx)[0])])
    return pd.DataFrame({
        "n_days": [np.int64(len(d))],
        "max_drawdown_cents": [np.int64(mx)],
        "trough_epoch_day": [np.int64(trough)]})


@register("durbin_watson", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM d),
    ab AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
                  n, sx, sy, sxx, sxy FROM m),
    r AS (SELECT x,
                 CAST(floor((CAST(y AS DOUBLE)
                        - (CAST((SELECT sy FROM ab) AS DOUBLE)
                           - (SELECT b FROM ab)
                             * CAST((SELECT sx FROM ab) AS DOUBLE))
                          / CAST((SELECT n FROM ab) AS DOUBLE)
                        - (SELECT b FROM ab) * CAST(x AS DOUBLE))
                       * 1000000.0 + 0.5) AS BIGINT) AS e
          FROM d),
    o AS (SELECT x, e, lag(e) OVER (ORDER BY x) AS ep FROM r),
    f AS (SELECT CAST(sum(CASE WHEN ep IS NULL THEN 0
                        ELSE (e - ep) * (e - ep) END) AS HUGEINT)
                   AS num,
                 CAST(sum(e * e) AS HUGEINT) AS den,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM o)
    SELECT n_days,
           (SELECT b FROM ab) AS slope_per_day,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS dw
    FROM f""")
def durbin_watson(sf_dir: str):
    """DURBIN-WATSON first-order autocorrelation test on the
    residuals of an OLS trend fit to the daily event count series —
    dw ~ 2 means uncorrelated residuals, << 2 positive serial
    correlation (the standard post-regression diagnostic before
    trusting a trend's standard errors). Slope and intercept come
    from exact integer moments with ONE float division each;
    residuals compose in the IDENTICAL expression order both sides
    and quantize to micro units half-up, so the DW numerator and
    denominator are exact integer folds over the day grid and dw is
    one final division — bit-exact, immune to float sum order.
    Scale plan: per-batch (day, count) partials to the bounded
    calendar grid, one driver combine, sequential lag math on the
    grid."""
    ds = rd.read_parquet(_path(sf_dir, "events"), columns=["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = (b["ts"].to_numpy("datetime64[s]").astype(np.int64)
             // 86400).astype(np.int64)
        g = pd.DataFrame({"x": x, "y": np.ones(len(b), np.int64)}) \
            .groupby("x", as_index=False).sum()
        g["y"] = g["y"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["x"], ["y"], exact_int=True)
    d = d.sort_values("x", kind="mergesort").reset_index(drop=True)
    x = np.array([int(v) for v in d["x"]], object)
    y = np.array([int(v) for v in d["y"]], object)
    n = len(d)
    sx, sy = int(sum(x)), int(sum(y))
    sxx = int(sum(v * v for v in x))
    sxy = int(sum(a * b for a, b in zip(x, y)))
    b_ = np.float64(n * sxy - sx * sy) / np.float64(n * sxx - sx * sx)
    xf = np.array([float(v) for v in x], np.float64)
    yf = np.array([float(v) for v in y], np.float64)
    resid = (yf - (np.float64(sy) - b_ * np.float64(sx))
             / np.float64(n) - b_ * xf)
    e = np.floor(resid * 1000000.0 + 0.5).astype(np.int64)
    num = int(np.sum(np.diff(e).astype(object) ** 2))
    den = int(sum(int(v) * int(v) for v in e))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "slope_per_day": [b_],
        "dw": [np.float64(num) / np.float64(den)]})
