# round-5 session-5 additions, batch 96: AIC model selection
# (Poisson vs geometric), Cramer's V association, and the
# routineness index of user weekday habits.
from __future__ import annotations

import math

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map


@register("model_selection_aic", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY user_id),
    h AS (SELECT n AS c, CAST(count(*) AS BIGINT) AS m
          FROM u GROUP BY n),
    t AS (SELECT CAST(sum(m) AS BIGINT) AS nn,
                 CAST(sum(c * m) AS BIGINT) AS s FROM h),
    lf AS (SELECT CAST(sum(CAST(m AS HUGEINT) * CAST(floor(
                lgamma(CAST(c AS DOUBLE) + 1.0) * 1000000.0
                + 0.5) AS BIGINT)) AS HUGEINT) AS q
           FROM h),
    ll AS (SELECT
        CAST((SELECT s FROM t) AS DOUBLE)
        * ln(CAST((SELECT s FROM t) AS DOUBLE)
             / CAST((SELECT nn FROM t) AS DOUBLE))
        - CAST((SELECT s FROM t) AS DOUBLE)
        - CAST((SELECT q FROM lf) AS DOUBLE) / 1000000.0
          AS ll_pois,
        (CAST((SELECT s FROM t) AS DOUBLE)
         - CAST((SELECT nn FROM t) AS DOUBLE))
        * ln(1.0 - CAST((SELECT nn FROM t) AS DOUBLE)
                   / CAST((SELECT s FROM t) AS DOUBLE))
        + CAST((SELECT nn FROM t) AS DOUBLE)
          * ln(CAST((SELECT nn FROM t) AS DOUBLE)
               / CAST((SELECT s FROM t) AS DOUBLE)) AS ll_geom)
    SELECT (SELECT nn FROM t) AS n_users,
           2.0 - 2.0 * ll_pois AS aic_poisson,
           2.0 - 2.0 * ll_geom AS aic_geometric,
           (2.0 - 2.0 * ll_pois) - (2.0 - 2.0 * ll_geom)
             AS aic_delta
    FROM ll""")
def model_selection_aic(sf_dir: str):
    """AIC MODEL SELECTION between Poisson and (shifted)
    geometric for per-user event counts: both maximum likelihoods
    are CLOSED FORM (lambda = mean; p = N/S), so the comparison
    needs no optimizer — a positive delta says user activity is
    geometric-like (memoryless heavy tail) rather than
    Poisson-like (concentrated), the distributional referee
    standing between poisson_mixture_mom and negbin_fit. The
    count histogram folds exactly; each distinct count's
    log-factorial (lgamma) is micro-quantized once and weighted
    by its exact multiplicity; the remaining terms are shared
    float expressions on exact integer moments. Scale plan:
    per-user counts through one user exchange into a bounded
    histogram; O(distinct counts) driver work."""
    ds = _events(sf_dir, ["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["n"].sum()
        out = pd.DataFrame({"c": a["n"].to_numpy(np.int64),
                            "m": np.ones(len(a), np.int64)}) \
            .groupby("c", as_index=False).sum()
        out["m"] = out["m"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["c"], ["m"])
    cs = [int(x) for x in h["c"]]
    ms = [int(x) for x in h["m"]]
    nn = sum(ms)
    s = sum(c * m for c, m in zip(cs, ms))
    q = sum(m * int(np.floor(math.lgamma(np.float64(c) + 1.0)
                             * 1000000.0 + 0.5))
            for c, m in zip(cs, ms))
    ll_pois = np.float64(s) * np.log(np.float64(s)
                                     / np.float64(nn)) \
        - np.float64(s) - np.float64(q) / 1000000.0
    ll_geom = (np.float64(s) - np.float64(nn)) \
        * np.log(1.0 - np.float64(nn) / np.float64(s)) \
        + np.float64(nn) * np.log(np.float64(nn)
                                  / np.float64(s))
    return pd.DataFrame({
        "n_users": [np.int64(nn)],
        "aic_poisson": [2.0 - 2.0 * ll_pois],
        "aic_geometric": [2.0 - 2.0 * ll_geom],
        "aic_delta": [(2.0 - 2.0 * ll_pois)
                      - (2.0 - 2.0 * ll_geom)]})


@register("cramers_v", sql="""
    WITH e AS (SELECT event_type AS et,
                      CAST((CAST(floor(epoch(ts) / 86400)
                                 AS BIGINT) + 4) % 7 AS BIGINT)
                        AS wd
               FROM events),
    o AS (SELECT et, wd, CAST(count(*) AS BIGINT) AS o
          FROM e GROUP BY 1, 2),
    r AS (SELECT et, CAST(sum(o) AS BIGINT) AS rt
          FROM o GROUP BY et),
    c AS (SELECT wd, CAST(sum(o) AS BIGINT) AS ct
          FROM o GROUP BY wd),
    t AS (SELECT CAST(sum(o) AS HUGEINT) AS n FROM o),
    q AS (SELECT CAST(sum(CAST(floor(
                (CAST(o.o AS DOUBLE)
                 * CAST((SELECT n FROM t) AS DOUBLE)
                 - CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE))
                * (CAST(o.o AS DOUBLE)
                   * CAST((SELECT n FROM t) AS DOUBLE)
                   - CAST(r.rt AS DOUBLE)
                     * CAST(c.ct AS DOUBLE))
                / (CAST(r.rt AS DOUBLE) * CAST(c.ct AS DOUBLE)
                   * CAST((SELECT n FROM t) AS DOUBLE))
                * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT) AS s
          FROM o JOIN r ON r.et = o.et
                 JOIN c ON c.wd = o.wd)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_events,
           CAST((SELECT s FROM q) AS DOUBLE) / 1000000.0
             AS chi2,
           sqrt((CAST((SELECT s FROM q) AS DOUBLE) / 1000000.0)
                / (CAST((SELECT n FROM t) AS DOUBLE) * 4.0))
             AS cramers_v""")
def cramers_v(sf_dir: str):
    """CRAMER'S V association between event type and weekday:
    chi-square over the 5x7 contingency table converted to the
    [0,1] effect size V = sqrt(chi2 / (n * min(r-1, c-1))) — the
    scale-free answer to 'HOW MUCH does behavior depend on the
    day of week' that a raw chi-square (which grows with n,
    always 'significant' at this scale) cannot give. Each cell's
    chi-square term is one shared float on exact integers
    (O*n - r*c cross products), micro-quantized before the exact
    35-cell sum; V is a shared float expression. Scale plan:
    map-only census into the bounded 5x7 combine."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        g = pd.DataFrame({
            "et": b["event_type"].to_numpy(object),
            "wd": (day + 4) % 7,
            "o": np.ones(len(b), np.int64)}) \
            .groupby(["et", "wd"], as_index=False).sum()
        g["o"] = g["o"].astype(np.int64)
        return g

    o = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["et", "wd"], ["o"])
    cells = {(r["et"], int(r["wd"])): int(r["o"])
             for _, r in o.iterrows()}
    rt = {}
    ct = {}
    for (et, wd), v in cells.items():
        rt[et] = rt.get(et, 0) + v
        ct[wd] = ct.get(wd, 0) + v
    n = sum(cells.values())
    s = 0
    for (et, wd), ov in cells.items():
        num = np.float64(ov) * np.float64(n) \
            - np.float64(rt[et]) * np.float64(ct[wd])
        s += int(np.floor(num * num
                          / (np.float64(rt[et])
                             * np.float64(ct[wd])
                             * np.float64(n))
                          * 1000000.0 + 0.5))
    chi2 = np.float64(s) / 1000000.0
    return pd.DataFrame({
        "n_events": [np.int64(n)],
        "chi2": [chi2],
        "cramers_v": [np.sqrt(chi2 / (np.float64(n) * 4.0))]})


@register("routineness_index", sql="""
    WITH c AS (SELECT user_id,
                      CAST((CAST(floor(epoch(ts) / 86400)
                                 AS BIGINT) + 4) % 7 AS BIGINT)
                        AS wd,
                      CAST(count(*) AS BIGINT) AS k
               FROM events GROUP BY 1, 2),
    tu AS (SELECT user_id, CAST(sum(k) AS BIGINT) AS n
           FROM c GROUP BY user_id),
    q AS (SELECT CAST(sum(CAST(floor(
                -(CAST(c.k AS DOUBLE) / CAST(tu.n AS DOUBLE))
                * ln(CAST(c.k AS DOUBLE) / CAST(tu.n AS DOUBLE))
                / ln(7.0) * 1000000000.0 + 0.5) AS BIGINT))
                AS HUGEINT) AS s
          FROM c JOIN tu ON tu.user_id = c.user_id
          WHERE c.k < tu.n),
    t AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM tu)
    SELECT (SELECT nu FROM t) AS n_users,
           1.0 - CAST((SELECT s FROM q) AS DOUBLE)
                 / (1000000000.0
                    * CAST((SELECT nu FROM t) AS DOUBLE))
             AS routineness""")
def routineness_index(sf_dir: str):
    """ROUTINENESS INDEX of user weekday habits: one minus the
    mean normalized entropy of each user's weekday distribution —
    1 means everyone acts on a single fixed weekday (perfect
    routine), 0 means uniformly spread weeks — the
    behavioral-regularity aggregate (mobility-paper style) that
    peak_shift (population phase) and gap_burstiness (timing
    dispersion) both miss: it is PER-USER habit strength,
    averaged. Each user-weekday cell contributes ONE
    nano-quantized shared-float entropy term (cells with k = n
    contribute exactly zero and are excluded identically on both
    engines), so the cross-user total is an exact integer; the
    index is one shared float expression. Scale plan: (user,
    weekday) counts through one user exchange; the entropy fold
    is a single exact combine."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "wd": (day + 4) % 7,
            "k": np.ones(len(b), np.int64)}) \
            .groupby(["user_id", "wd"], as_index=False).sum()
        g["k"] = g["k"].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["user_id", "wd"], as_index=False)["k"] \
            .sum()
        tu = a.groupby("user_id")["k"].sum().rename("n")
        m = a.merge(tu, left_on="user_id", right_index=True)
        ks = m["k"].to_numpy(np.int64)
        ns = m["n"].to_numpy(np.int64)
        sel = ks < ns
        p = ks[sel].astype(np.float64) / ns[sel].astype(np.float64)
        terms = np.floor(-(p) * np.log(p) / np.log(7.0)
                         * 1000000000.0 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "s": [int(terms.astype(object).sum())],
            "nu": np.array([tu.shape[0]], np.int64)})

    t = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["j"], ["s", "nu"], exact_int=True)
    s = int(t["s"].iloc[0])
    nu = int(t["nu"].iloc[0])
    return pd.DataFrame({
        "n_users": [np.int64(nu)],
        "routineness": [1.0 - np.float64(s)
                        / (1000000000.0 * np.float64(nu))]})
