# round-5 session-5 additions, batch 19: Jarque-Bera normality test
# from exact power sums, the panel fixed-effects within estimator
# over part groups, and two cycles of IPF raking on the
# source x lang grid.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_IPF_CYCLES = 2


@register("jarque_bera", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s1,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS s2,
                 CAST(sum(CAST(v AS HUGEINT) * v * v) AS HUGEINT)
                   AS s3,
                 CAST(sum(CAST(v AS HUGEINT) * v * v * v)
                      AS HUGEINT) AS s4
          FROM d),
    c AS (SELECT CAST(n AS DOUBLE) AS fn,
                 CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 CAST(s1 AS DOUBLE) AS f1, CAST(s2 AS DOUBLE)
                   AS f2,
                 CAST(s3 AS DOUBLE) AS f3, CAST(s4 AS DOUBLE)
                   AS f4
          FROM m),
    k AS (SELECT fn,
                 f2 / fn - mu * mu AS m2,
                 f3 / fn - 3.0 * mu * (f2 / fn) + 2.0 * mu * mu
                   * mu AS m3,
                 f4 / fn - 4.0 * mu * (f3 / fn)
                   + 6.0 * mu * mu * (f2 / fn)
                   - 3.0 * mu * mu * mu * mu AS m4
          FROM c)
    SELECT CAST(fn AS BIGINT) AS n_days,
           m3 / sqrt(m2 * m2 * m2) AS skewness,
           m4 / (m2 * m2) - 3.0 AS excess_kurtosis,
           fn / 6.0 * ((m3 / sqrt(m2 * m2 * m2))
                       * (m3 / sqrt(m2 * m2 * m2))
                       + ((m4 / (m2 * m2) - 3.0)
                          * (m4 / (m2 * m2) - 3.0)) / 4.0)
             AS jarque_bera
    FROM k""")
def jarque_bera(sf_dir: str):
    """JARQUE-BERA normality test of daily revenue: skewness and
    excess kurtosis from the first four EXACT integer power sums
    (python-int / HUGEINT — fourth powers of cents reach ~1e31, far
    past int64), combined into JB = n/6 (S^2 + K^2/4) — the moment
    diagnostic that tells you whether xmr_control's normal-ish
    limits and gumbel/hill tail fits were even plausible. All float
    work is shared expressions over identically-cast exact
    integers, in the SAME central-moment expansion order on both
    engines. Scale plan: per-batch (day, cents) partials through
    the bounded day-domain combine; moments are O(days) driver
    arithmetic."""
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
    v = [int(x) for x in d["v"]]
    n = len(v)
    s1 = sum(v)
    s2 = sum(x * x for x in v)
    s3 = sum(x * x * x for x in v)
    s4 = sum(x * x * x * x for x in v)
    fn_ = np.float64(n)
    mu = np.float64(s1) / fn_
    f2, f3, f4 = np.float64(s2), np.float64(s3), np.float64(s4)
    m2 = f2 / fn_ - mu * mu
    m3 = f3 / fn_ - 3.0 * mu * (f2 / fn_) + 2.0 * mu * mu * mu
    m4 = f4 / fn_ - 4.0 * mu * (f3 / fn_) \
        + 6.0 * mu * mu * (f2 / fn_) - 3.0 * mu * mu * mu * mu
    sk = m3 / np.sqrt(m2 * m2 * m2)
    ek = m4 / (m2 * m2) - 3.0
    return pd.DataFrame({
        "n_days": [np.int64(n)], "skewness": [np.float64(sk)],
        "excess_kurtosis": [np.float64(ek)],
        "jarque_bera": [fn_ / 6.0 * (sk * sk
                                     + (ek * ek) / 4.0)]})


@register("fixed_effects_slope", sql="""
    WITH r AS (SELECT l_partkey AS pk,
                      CAST(l_quantity AS BIGINT) AS x,
                      CAST(floor(l_extendedprice * 100 + 0.5)
                           AS BIGINT) AS y
               FROM lineitem),
    g AS (SELECT pk, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(x) AS BIGINT) AS sx,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS sxx,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT)
                   AS sxy
          FROM r GROUP BY pk),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(CAST(sxy AS HUGEINT)
                      - CAST(floor(CAST(sx AS DOUBLE)
                             * CAST(sy AS DOUBLE)
                             / CAST(ng AS DOUBLE) + 0.5)
                             AS HUGEINT)) AS HUGEINT) AS num,
                 CAST(sum(CAST(sxx AS HUGEINT)
                      - CAST(floor(CAST(sx AS DOUBLE)
                             * CAST(sx AS DOUBLE)
                             / CAST(ng AS DOUBLE) + 0.5)
                             AS HUGEINT)) AS HUGEINT) AS den
          FROM g)
    SELECT n AS n_rows, k AS n_parts,
           CAST(num AS DOUBLE) AS within_sxy,
           CAST(den AS DOUBLE) AS within_sxx,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS fe_slope
    FROM t""")
def fixed_effects_slope(sf_dir: str):
    """PANEL FIXED-EFFECTS (within) estimator of the price-quantity
    slope with PART fixed effects: demeaning inside each part
    absorbs every time-invariant part attribute (brand, size, base
    price), so the slope uses only WITHIN-part variation — the
    econometric upgrade of multi_ols when entities differ in level
    (a part's price scale would otherwise confound the slope).
    Each group's cross/self products are exact ints; the demeaning
    corrections S_x S_y / n_g quantize to whole units half-up
    BEFORE the cross-group fold (HUGEINT / python int), and the
    slope is one shared float division. Scale plan: per-part cells
    fold through ONE partkey exchange whose partitions emit two
    scalars — entity cardinality never reaches the driver."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy(np.int64)
        y = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "ng": np.ones(len(b), np.int64), "sx": x, "sy": y,
            "sxx": (x.astype(object) * x.astype(object)),
            "sxy": (x.astype(object) * y.astype(object))}) \
            .groupby("pk", as_index=False).sum()
        for c in ("ng", "sx", "sy"):
            g[c] = g[c].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("pk", as_index=False).agg(
            ng=("ng", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxx=("sxx", "sum"), sxy=("sxy", "sum"))
        n = int(a["ng"].sum())
        k = len(a)
        num = den = 0
        for _, r in a.iterrows():
            ngf = np.float64(int(r["ng"]))
            sxf, syf = np.float64(int(r["sx"])), \
                np.float64(int(r["sy"]))
            num += int(r["sxy"]) - int(np.floor(
                sxf * syf / ngf + 0.5))
            den += int(r["sxx"]) - int(np.floor(
                sxf * sxf / ngf + 0.5))
        return pd.DataFrame({
            "j": np.zeros(1, np.int64), "n": [n], "k": [k],
            "num": [num], "den": [den]})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["pk"], cells, 16),
        ["j"], ["n", "k", "num", "den"], exact_int=True)
    n, k = int(s["n"].iloc[0]), int(s["k"].iloc[0])
    num, den = int(s["num"].iloc[0]), int(s["den"].iloc[0])
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "n_parts": [np.int64(k)],
        "within_sxy": [np.float64(num)],
        "within_sxx": [np.float64(den)],
        "fe_slope": [np.float64(num) / np.float64(den)]})


@register("ipf_raking", sql="""
    WITH cell AS (SELECT source, lang,
                         CAST(count(*) AS BIGINT) AS c
                  FROM documents GROUP BY 1, 2),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(DISTINCT source) AS BIGINT) AS nr,
                 CAST(count(DISTINCT lang) AS BIGINT) AS nc
          FROM cell),
    w0 AS (SELECT source, lang, CAST(c * 1000000 AS BIGINT) AS w
           FROM cell),
    r1 AS (SELECT w0.source, w0.lang,
                  CAST(floor(CAST(w0.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nr FROM t) AS DOUBLE))
                       / (CAST(rs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM w0 JOIN (SELECT source,
                                CAST(sum(w) AS BIGINT) AS s
                         FROM w0 GROUP BY source) rs
                ON rs.source = w0.source),
    c1 AS (SELECT r1.source, r1.lang,
                  CAST(floor(CAST(r1.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nc FROM t) AS DOUBLE))
                       / (CAST(cs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM r1 JOIN (SELECT lang, CAST(sum(w) AS BIGINT) AS s
                         FROM r1 GROUP BY lang) cs
                ON cs.lang = r1.lang),
    r2 AS (SELECT c1.source, c1.lang,
                  CAST(floor(CAST(c1.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nr FROM t) AS DOUBLE))
                       / (CAST(rs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM c1 JOIN (SELECT source,
                                CAST(sum(w) AS BIGINT) AS s
                         FROM c1 GROUP BY source) rs
                ON rs.source = c1.source),
    c2 AS (SELECT r2.source, r2.lang,
                  CAST(floor(CAST(r2.w AS DOUBLE)
                       * (CAST((SELECT n FROM t) AS DOUBLE)
                          / CAST((SELECT nc FROM t) AS DOUBLE))
                       / (CAST(cs.s AS DOUBLE) / 1000000.0)
                       + 0.5) AS BIGINT) AS w
           FROM r2 JOIN (SELECT lang, CAST(sum(w) AS BIGINT) AS s
                         FROM r2 GROUP BY lang) cs
                ON cs.lang = r2.lang)
    SELECT source, lang,
           (SELECT c FROM cell x WHERE x.source = c2.source
            AND x.lang = c2.lang) AS n_docs,
           w AS weight_micro,
           CAST(w AS DOUBLE) / 1000000.0 AS weight
    FROM c2 ORDER BY source, lang""")
def ipf_raking(sf_dir: str):
    """IPF RAKING (iterative proportional fitting) of the
    source x lang cell counts to UNIFORM row and column margins —
    two full row/column cycles of the survey-calibration scaling
    that reweights an unbalanced crawl so every source and every
    language carries equal total mass (the matrix-balancing
    operator behind Sinkhorn normalization and post-stratification
    weighting). Weights live as micro ints; every scale factor is
    target/current-margin computed from EXACT integer folds as one
    shared float, and each update re-quantizes half-up — four
    sweeps, bit-identical to the chained-CTE oracle. Scale plan:
    the cell grid is bounded (sources x langs); margins fold from
    map-only partials and the sweeps are driver grid arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "lang": b["lang"].to_numpy(object),
                          "c": np.ones(len(b), np.int64)}) \
            .groupby(["source", "lang"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    cell = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "lang"], ["c"])
    n = int(cell["c"].sum())
    nr = cell["source"].nunique()
    nc = cell["lang"].nunique()
    w = {(r["source"], r["lang"]): int(r["c"]) * 1000000
         for _, r in cell.iterrows()}
    for _ in range(_IPF_CYCLES):
        rs: dict = {}
        for (s_, l_), v in w.items():
            rs[s_] = rs.get(s_, 0) + v
        w = {k: int(np.floor(
            np.float64(v)
            * (np.float64(n) / np.float64(nr))
            / (np.float64(rs[k[0]]) / 1000000.0) + 0.5))
            for k, v in w.items()}
        cs: dict = {}
        for (s_, l_), v in w.items():
            cs[l_] = cs.get(l_, 0) + v
        w = {k: int(np.floor(
            np.float64(v)
            * (np.float64(n) / np.float64(nc))
            / (np.float64(cs[k[1]]) / 1000000.0) + 0.5))
            for k, v in w.items()}
    rows = []
    for _, r in cell.iterrows():
        key = (r["source"], r["lang"])
        rows.append({
            "source": r["source"], "lang": r["lang"],
            "n_docs": np.int64(int(r["c"])),
            "weight_micro": np.int64(w[key]),
            "weight": np.float64(w[key]) / 1000000.0})
    return pd.DataFrame(rows).sort_values(
        ["source", "lang"], kind="mergesort").reset_index(drop=True)
