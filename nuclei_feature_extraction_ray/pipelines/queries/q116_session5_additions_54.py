# round-5 session-5 additions, batch 54: winsorized correlation
# over the bounded grid, a Working-Leser Engel curve, and a
# systematic-sample bias audit.
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, np, pd,
                      rd, register)

_WC_PCT = 5
_EC_BRAND_PREF = "Brand#1"
_SB_K = 20                       # every-k systematic sample


@register("winsorized_corr", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS y,
                      CAST(count(*) AS BIGINT) AS c
               FROM lineitem GROUP BY 1, 2),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
    qx AS (SELECT
        (SELECT min(x) FROM (
           SELECT x, sum(c) OVER (ORDER BY x) AS cum FROM (
             SELECT x, CAST(sum(c) AS BIGINT) AS c FROM h
             GROUP BY x))
         WHERE cum >= CAST(ceil({p} / 100.0 * (SELECT n FROM n))
                           AS BIGINT)) AS lo,
        (SELECT min(x) FROM (
           SELECT x, sum(c) OVER (ORDER BY x) AS cum FROM (
             SELECT x, CAST(sum(c) AS BIGINT) AS c FROM h
             GROUP BY x))
         WHERE cum >= CAST(ceil((100 - {p}) / 100.0
                                * (SELECT n FROM n))
                           AS BIGINT)) AS hi),
    qy AS (SELECT
        (SELECT min(y) FROM (
           SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM (
             SELECT y, CAST(sum(c) AS BIGINT) AS c FROM h
             GROUP BY y))
         WHERE cum >= CAST(ceil({p} / 100.0 * (SELECT n FROM n))
                           AS BIGINT)) AS lo,
        (SELECT min(y) FROM (
           SELECT y, sum(c) OVER (ORDER BY y) AS cum FROM (
             SELECT y, CAST(sum(c) AS BIGINT) AS c FROM h
             GROUP BY y))
         WHERE cum >= CAST(ceil((100 - {p}) / 100.0
                                * (SELECT n FROM n))
                           AS BIGINT)) AS hi),
    w AS (SELECT greatest(least(x, (SELECT hi FROM qx)),
                          (SELECT lo FROM qx)) AS x,
                 greatest(least(y, (SELECT hi FROM qy)),
                          (SELECT lo FROM qy)) AS y,
                 c
          FROM h),
    m AS (SELECT CAST(sum(c) AS HUGEINT) AS n,
                 CAST(sum(c * x) AS HUGEINT) AS sx,
                 CAST(sum(c * y) AS HUGEINT) AS sy,
                 CAST(sum(CAST(c AS HUGEINT) * x * x) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(c AS HUGEINT) * y * y) AS HUGEINT)
                   AS syy,
                 CAST(sum(CAST(c AS HUGEINT) * x * y) AS HUGEINT)
                   AS sxy
          FROM w)
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST((SELECT lo FROM qx) AS BIGINT) AS x_lo,
           CAST((SELECT hi FROM qx) AS BIGINT) AS x_hi,
           CAST(n * sxy - sx * sy AS DOUBLE)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE))
             AS winsorized_corr
    FROM m""".format(p=_WC_PCT))
def winsorized_corr(sf_dir: str):
    """WINSORIZED CORRELATION between quantity and discount: both
    variables clamped at their exact {p}/{q} percentile order
    statistics (read off the bounded histograms — no sort), then
    Pearson on the clamped grid — the outlier-resistant
    correlation that keeps Pearson's interpretation where
    spearman_qty_discount switches to ranks (completing the
    winsorized_stats family into the bivariate case). Clamp
    bounds, clamped cells and all moments are exact integers; the
    correlation is one shared float expression. Scale plan: the
    bounded (quantity x discount) grid census; clamping and
    moments are O(cells) driver grid work."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": b["l_quantity"].to_numpy(np.int64),
            "y": np.floor(b["l_discount"].to_numpy(np.float64)
                          * 100 + 0.5).astype(np.int64),
            "c": np.ones(len(b), np.int64)}) \
            .groupby(["x", "y"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["x", "y"], ["c"])
    n = int(h["c"].sum())

    def bound(col: str, k: int) -> int:
        g = h.groupby(col)["c"].sum().sort_index()
        cum = g.cumsum()
        return int(g.index[(cum >= k).to_numpy().argmax()])

    klo = int(np.ceil(_WC_PCT / 100.0 * np.float64(n)))
    khi = int(np.ceil((100 - _WC_PCT) / 100.0 * np.float64(n)))
    xlo, xhi = bound("x", klo), bound("x", khi)
    ylo, yhi = bound("y", klo), bound("y", khi)
    x = np.clip(h["x"].to_numpy(np.int64), xlo, xhi)
    y = np.clip(h["y"].to_numpy(np.int64), ylo, yhi)
    c = h["c"].to_numpy(np.int64)
    sx = int((c * x).sum())
    sy = int((c * y).sum())
    sxx = int((c.astype(object) * x.astype(object)
               * x.astype(object)).sum())
    syy = int((c.astype(object) * y.astype(object)
               * y.astype(object)).sum())
    sxy = int((c.astype(object) * x.astype(object)
               * y.astype(object)).sum())
    r = np.float64(n * sxy - sx * sy) \
        / np.sqrt(np.float64(n * sxx - sx * sx)
                  * np.float64(n * syy - sy * sy))
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "x_lo": [np.int64(xlo)],
        "x_hi": [np.int64(xhi)],
        "winsorized_corr": [np.float64(r)]})


@register("engel_curve", sql="""
    WITH ol AS (SELECT l.l_orderkey AS ok,
                       CAST(floor(l.l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r,
                       CASE WHEN p.p_brand LIKE '{bp}%'
                            THEN 1 ELSE 0 END AS isb
                FROM lineitem l JOIN part p
                  ON l.l_partkey = p.p_partkey),
    o AS (SELECT ok, CAST(sum(r) AS BIGINT) AS tot,
                 CAST(sum(r * isb) AS BIGINT) AS bs
          FROM ol GROUP BY ok),
    p AS (SELECT CAST(floor(ln(CAST(tot AS DOUBLE)) * 1000000.0
                            + 0.5) AS BIGINT) AS x,
                 CAST(floor(CAST(bs AS DOUBLE)
                      / CAST(tot AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS w
          FROM o WHERE tot > 0),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(w) AS HUGEINT) AS sw,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(x AS HUGEINT) * w) AS HUGEINT)
                   AS sxw
          FROM p)
    SELECT CAST(n AS BIGINT) AS n_orders,
           CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             AS mean_budget_share,
           CAST(n * sxw - sx * sw AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS engel_slope,
           CAST(CASE WHEN n * sxw - sx * sw < 0 THEN 1 ELSE 0 END
                AS BIGINT) AS is_necessity
    FROM m""".format(bp=_EC_BRAND_PREF))
def engel_curve(sf_dir: str):
    """WORKING-LESER ENGEL CURVE for the Brand#1 family: each
    order's budget share spent on the brand group regressed on log
    order size — a negative slope marks the brand a NECESSITY
    (share falls as baskets grow), positive a luxury; the consumer-
    theory reading no raw share census gives. Budget shares and
    log sizes quantize to micro units from exact integer cents
    (the value_psi fold policy), regression moments fold exactly,
    and slope plus the exact-sign necessity verdict are shared
    expressions. Scale plan: per-order cells fold through one
    orderkey-grouped partial (brand labels via the guarded
    broadcast part dim); the regression is O(1) on 5 folded
    scalars."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    isb = np.array([1 if str(b).startswith(_EC_BRAND_PREF)
                    else 0 for b in part["p_brand"]
                    .to_numpy()[order_]], np.int64)

    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_partkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        flag = isb[np.searchsorted(
            pk, b["l_partkey"].to_numpy(np.int64))]
        g = pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(np.int64),
            "tot": r, "bs": r * flag}) \
            .groupby("ok", as_index=False).sum()
        for c in ("tot", "bs"):
            g[c] = g[c].astype(np.int64)
        return g

    from ...stages.partition import partition_map

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("ok", as_index=False)[["tot", "bs"]].sum()
        n = sxv = sw = sxx = sxw = 0
        for _, r in a.iterrows():
            tot, bs = int(r["tot"]), int(r["bs"])
            if tot <= 0:
                continue
            x = int(np.floor(np.log(np.float64(tot))
                             * 1000000.0 + 0.5))
            w = int(np.floor(np.float64(bs) / np.float64(tot)
                             * 1000000.0 + 0.5))
            n += 1
            sxv += x
            sw += w
            sxx += x * x
            sxw += x * w
        return pd.DataFrame({
            "j": np.zeros(1, np.int64), "n": [n], "sx": [sxv],
            "sw": [sw], "sxx": [sxx], "sxw": [sxw]})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["ok"], cells, 16),
        ["j"], ["n", "sx", "sw", "sxx", "sxw"], exact_int=True)
    n = int(s["n"].iloc[0])
    sx, sw = int(s["sx"].iloc[0]), int(s["sw"].iloc[0])
    sxx, sxw = int(s["sxx"].iloc[0]), int(s["sxw"].iloc[0])
    num = n * sxw - sx * sw
    return pd.DataFrame({
        "n_orders": [np.int64(n)],
        "mean_budget_share": [np.float64(sw) / np.float64(n)
                              / 1000000.0],
        "engel_slope": [np.float64(num)
                        / np.float64(n * sxx - sx * sx)],
        "is_necessity": [np.int64(1 if num < 0 else 0)]})


@register("sample_bias_audit", sql="""
    WITH r AS (SELECT o_orderkey,
                      CAST(isodow(o_orderdate) AS BIGINT) AS dow,
                      row_number() OVER (ORDER BY o_orderkey)
                        AS i
               FROM orders),
    pop AS (SELECT dow, CAST(count(*) AS BIGINT) AS np_
            FROM r GROUP BY dow),
    smp AS (SELECT dow, CAST(count(*) AS BIGINT) AS ns
            FROM r WHERE i % {k} = 1 GROUP BY dow),
    t AS (SELECT CAST(sum(np_) AS BIGINT) AS tn,
                 CAST((SELECT sum(ns) FROM smp) AS BIGINT) AS ts
          FROM pop),
    q AS (SELECT CAST(sum(CAST(floor(
                 (CAST(COALESCE(smp.ns, 0) AS DOUBLE)
                  - CAST((SELECT ts FROM t) AS DOUBLE)
                    * CAST(pop.np_ AS DOUBLE)
                    / CAST((SELECT tn FROM t) AS DOUBLE))
                 * (CAST(COALESCE(smp.ns, 0) AS DOUBLE)
                    - CAST((SELECT ts FROM t) AS DOUBLE)
                      * CAST(pop.np_ AS DOUBLE)
                      / CAST((SELECT tn FROM t) AS DOUBLE))
                 / (CAST((SELECT ts FROM t) AS DOUBLE)
                    * CAST(pop.np_ AS DOUBLE)
                    / CAST((SELECT tn FROM t) AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS chi_micro,
                 CAST(count(*) AS BIGINT) AS k_cells
          FROM pop LEFT JOIN smp ON smp.dow = pop.dow)
    SELECT (SELECT tn FROM t) AS n_population,
           (SELECT ts FROM t) AS n_sample,
           (SELECT k_cells FROM q) AS n_cells,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             AS bias_chi2""".format(k=_SB_K))
def sample_bias_audit(sf_dir: str):
    """SYSTEMATIC-SAMPLE BIAS AUDIT: take the every-{k}th order by
    key rank (systematic_sample's design) and chi-square its
    weekday distribution against the population's — the
    periodicity trap check every systematic design owes its users
    (if the frame ordering correlates with a weekly cycle, every-
    {k} sampling is silently biased). Ranks and censuses are exact
    integers; each (obs - expected)^2/expected term is built from
    identical doubles and quantizes to micro units half-up before
    the fold. Scale plan: the rank is the two-phase zipWithIndex
    exchange at fleet scale; here the bounded dow grid folds from
    one guarded pass."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderdate"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": b["o_orderkey"].to_numpy(np.int64),
            "dow": b["o_orderdate"].dt.dayofweek
            .to_numpy(np.int64) + 1})

    rows = ds.map_batches(partial, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(rows) > 1_000_000:
        raise ValueError("sample_bias_audit: order frame exceeds "
                         "the driver bound; use the two-phase "
                         "rank tier")
    rows = rows.sort_values("k", kind="mergesort") \
        .reset_index(drop=True)
    dow = rows["dow"].to_numpy(np.int64)
    i = np.arange(1, len(rows) + 1)
    in_smp = (i % _SB_K) == 1
    pop = pd.Series(dow).value_counts()
    smp = pd.Series(dow[in_smp]).value_counts()
    tn = int(pop.sum())
    ts = int(smp.sum())
    chi = 0
    for dw in pop.index:
        np_ = int(pop[dw])
        ns = int(smp.get(dw, 0))
        e = np.float64(ts) * np.float64(np_) / np.float64(tn)
        chi += int(np.floor(
            (np.float64(ns) - e) * (np.float64(ns) - e) / e
            * 1000000.0 + 0.5))
    return pd.DataFrame({
        "n_population": [np.int64(tn)],
        "n_sample": [np.int64(ts)],
        "n_cells": [np.int64(len(pop))],
        "bias_chi2": [np.float64(chi) / 1000000.0]})
