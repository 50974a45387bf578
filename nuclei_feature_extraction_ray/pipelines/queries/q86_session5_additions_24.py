# round-5 session-5 additions, batch 24: split-half reliability with
# the Spearman-Brown correction, categorical attribute assortativity
# of the co-purchase graph, and the Ljung-Box portmanteau test.
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, np, pd,
                      rd, register)
from .q10_feature_engineering_readability import _basket_edges

_LB_LAGS = 7


@register("split_half_reliability", sql="""
    WITH h AS (SELECT source, doc_id % 2 AS half,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(n_chars) AS BIGINT) AS s
               FROM documents GROUP BY 1, 2),
    q AS (SELECT source, half,
                 CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS mm
          FROM h),
    p AS (SELECT a.source, a.mm AS me, b.mm AS mo
          FROM q a JOIN q b ON a.source = b.source
          WHERE a.half = 0 AND b.half = 1),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                 CAST(sum(me) AS HUGEINT) AS se,
                 CAST(sum(mo) AS HUGEINT) AS so,
                 CAST(sum(CAST(me AS HUGEINT) * me) AS HUGEINT)
                   AS see,
                 CAST(sum(CAST(mo AS HUGEINT) * mo) AS HUGEINT)
                   AS soo,
                 CAST(sum(CAST(me AS HUGEINT) * mo) AS HUGEINT)
                   AS seo
          FROM p),
    c AS (SELECT CAST(k AS BIGINT) AS k,
                 CAST(k * seo - se * so AS DOUBLE)
                 / sqrt(CAST(k * see - se * se AS DOUBLE)
                        * CAST(k * soo - so * so AS DOUBLE)) AS r
          FROM m)
    SELECT k AS n_sources, r AS half_corr,
           2.0 * r / (1.0 + r) AS spearman_brown
    FROM c""")
def split_half_reliability(sf_dir: str):
    """SPLIT-HALF RELIABILITY of the per-source mean-length metric:
    each source's documents split by doc_id parity, the two
    half-sample means correlate across sources, and Spearman-Brown
    2r/(1+r) projects full-length reliability — the psychometric
    answer to 'is this per-source metric STABLE or sampling noise?'
    that a drift monitor needs before alerting on it (the
    measurement-theory sibling of hash_replicate_se). Half-means
    quantize to micro units (exact ints), the cross-source
    correlation uses exact integer moments of those quantized
    means, and both outputs are shared float expressions. Scale
    plan: (source, half) cells are map-only partials into a bounded
    grid; the correlation is driver arithmetic over sources
    rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "half": b["doc_id"].to_numpy(np.int64) % 2,
            "n": np.ones(len(b), np.int64),
            "s": b["n_chars"].to_numpy(np.int64)}) \
            .groupby(["source", "half"], as_index=False).sum()
        for c in ("n", "s"):
            g[c] = g[c].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "half"], ["n", "s"])
    mm = {}
    for _, r in h.iterrows():
        mm[(r["source"], int(r["half"]))] = int(np.floor(
            np.float64(int(r["s"])) / np.float64(int(r["n"]))
            * 1000000.0 + 0.5))
    # sources missing a half drop out (the oracle's inner join)
    sources = sorted({k[0] for k in mm
                      if (k[0], 0) in mm and (k[0], 1) in mm})
    me = [mm[(s, 0)] for s in sources]
    mo = [mm[(s, 1)] for s in sources]
    k = len(sources)
    se, so = sum(me), sum(mo)
    see = sum(v * v for v in me)
    soo = sum(v * v for v in mo)
    seo = sum(a * b for a, b in zip(me, mo))
    r = np.float64(k * seo - se * so) \
        / np.sqrt(np.float64(k * see - se * se)
                  * np.float64(k * soo - so * so))
    return pd.DataFrame({
        "n_sources": [np.int64(k)], "half_corr": [np.float64(r)],
        "spearman_brown": [2.0 * r / (1.0 + r)]})


@register("attribute_assortativity", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
    lab AS (SELECT x.p_brand AS ba, y.p_brand AS bb
            FROM e0 JOIN part x ON e0.pa = x.p_partkey
                    JOIN part y ON e0.pb = y.p_partkey),
    dg AS (SELECT brand, CAST(sum(e_in) AS BIGINT) AS e_in,
                  CAST(sum(deg) AS BIGINT) AS deg
           FROM (SELECT ba AS brand,
                        CASE WHEN ba = bb THEN 1 ELSE 0 END AS e_in,
                        1 AS deg
                 FROM lab
                 UNION ALL SELECT bb, 0, 1 FROM lab)
           GROUP BY brand),
    s AS (SELECT CAST(sum(e_in) AS BIGINT) AS etot,
                 CAST(sum(CAST(floor(
                      (CAST(deg AS DOUBLE)
                       / CAST(2 * (SELECT m FROM mm) AS DOUBLE))
                      * (CAST(deg AS DOUBLE)
                         / CAST(2 * (SELECT m FROM mm) AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS sa2m
          FROM dg)
    SELECT (SELECT m FROM mm) AS n_edges,
           (SELECT etot FROM s) AS edges_within,
           (SELECT sa2m FROM s) AS sum_a2_micro,
           (CAST((SELECT etot FROM s) AS DOUBLE)
            / CAST((SELECT m FROM mm) AS DOUBLE)
            - CAST((SELECT sa2m FROM s) AS DOUBLE) / 1000000.0)
           / (1.0 - CAST((SELECT sa2m FROM s) AS DOUBLE)
                    / 1000000.0) AS assortativity""")
def attribute_assortativity(sf_dir: str):
    """CATEGORICAL ATTRIBUTE ASSORTATIVITY of the co-purchase graph
    by brand: Newman's r = (tr(e) - sum a_i^2) / (1 - sum a_i^2)
    over the brand mixing matrix — the normalized counterpart of
    graph_modularity (Q says 'more within-brand edges than
    chance'; r rescales that to the [-1, 1] mixing coefficient
    comparable across graphs), beside degree_assortativity's
    numeric version. Within-edge counts and degree sums are exact
    integer folds; each a_i^2 term quantizes to micro units
    half-up before the fold and r is one shared float expression.
    Scale plan: identical to graph_modularity — shared basket
    edges, guarded broadcast brand dim, bounded per-brand grid."""
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_brand"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brand = part["p_brand"].to_numpy()[order_]

    def label(b: pd.DataFrame) -> pd.DataFrame:
        pa = b["part_a"].to_numpy(np.int64)
        pb = b["part_b"].to_numpy(np.int64)
        ba = brand[np.searchsorted(pk, pa)]
        bb = brand[np.searchsorted(pk, pb)]
        same = (ba == bb).astype(np.int64)
        g = pd.concat([
            pd.DataFrame({"brand": ba, "e_in": same,
                          "deg": np.ones(len(b), np.int64),
                          "ec": np.ones(len(b), np.int64)}),
            pd.DataFrame({"brand": bb,
                          "e_in": np.zeros(len(b), np.int64),
                          "deg": np.ones(len(b), np.int64),
                          "ec": np.zeros(len(b), np.int64)})]) \
            .groupby("brand", as_index=False).sum()
        for c in ("e_in", "deg", "ec"):
            g[c] = g[c].astype(np.int64)
        return g

    s = _combine_partials(
        _basket_edges(sf_dir).map_batches(label,
                                          batch_format="pandas"),
        ["brand"], ["e_in", "deg", "ec"])
    m = int(s["ec"].sum())
    etot = int(s["e_in"].sum())
    deg = s["deg"].to_numpy(np.int64)
    f2m = np.float64(2 * m)
    sa2m = int(np.floor((deg.astype(np.float64) / f2m)
                        * (deg.astype(np.float64) / f2m)
                        * 1000000.0 + 0.5).astype(np.int64).sum())
    tr = np.float64(etot) / np.float64(m)
    a2 = np.float64(sa2m) / 1000000.0
    return pd.DataFrame({
        "n_edges": [np.int64(m)], "edges_within": [np.int64(etot)],
        "sum_a2_micro": [np.int64(sa2m)],
        "assortativity": [(tr - a2) / (1.0 - a2)]})


@register("ljung_box", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM x),
    g AS (SELECT CAST(k AS BIGINT) AS k,
                 CAST(count(*) AS BIGINT) AS nk,
                 CAST(sum(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT)
                   AS sxy,
                 CAST(sum(a.v) AS HUGEINT) AS sh,
                 CAST(sum(b.v) AS HUGEINT) AS st
          FROM (SELECT unnest(generate_series(0, {L})) AS k) lags
          JOIN x a ON TRUE JOIN x b ON b.t = a.t + lags.k
          GROUP BY k),
    c AS (SELECT k, nk,
                 CAST(sxy AS DOUBLE)
                 - (CAST((SELECT s FROM m) AS DOUBLE)
                    / CAST((SELECT n FROM m) AS DOUBLE))
                   * (CAST(sh AS DOUBLE) + CAST(st AS DOUBLE))
                 + CAST(nk AS DOUBLE)
                   * (CAST((SELECT s FROM m) AS DOUBLE)
                      / CAST((SELECT n FROM m) AS DOUBLE))
                   * (CAST((SELECT s FROM m) AS DOUBLE)
                      / CAST((SELECT n FROM m) AS DOUBLE)) AS ck
          FROM g),
    r AS (SELECT CAST(sum(CAST(floor(
                 (c.ck / (SELECT c0.ck FROM c c0 WHERE c0.k = 0))
                 * (c.ck / (SELECT c0.ck FROM c c0 WHERE c0.k = 0))
                 / CAST((SELECT n FROM m) - c.k AS DOUBLE)
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS tsum
          FROM c WHERE c.k > 0)
    SELECT CAST((SELECT n FROM m) AS BIGINT) AS n_days,
           CAST({L} AS BIGINT) AS n_lags,
           (SELECT tsum FROM r) AS term_sum_nano,
           CAST((SELECT n FROM m) AS DOUBLE)
           * (CAST((SELECT n FROM m) AS DOUBLE) + 2.0)
           * (CAST((SELECT tsum FROM r) AS DOUBLE)
              / 1000000000.0) AS ljung_box_q""".format(L=_LB_LAGS))
def ljung_box(sf_dir: str):
    """LJUNG-BOX PORTMANTEAU test over {L} lags of daily revenue:
    Q = n(n+2) sum r_k^2/(n-k) — the omnibus 'is there ANY serial
    correlation' gate that decides whether newey_west's HAC
    correction and the forecasting family (ses/holt/theil_u2) are
    even needed. Autocovariances come from exact integer lagged
    sums (demeaned by the expansion Sxy - mu(Sh+St) + nk mu^2 — no
    per-term float accumulation), each r_k^2/(n-k) term quantizes
    to nano units half-up before the {L}-term fold, and Q is one
    shared float expression. Scale plan: per-batch (day, cents)
    partials through the bounded day-domain combine; the lag scans
    are O(L x days) on the driver."""
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
    n = len(v)
    s = sum(v)
    mu = np.float64(s) / np.float64(n)
    cks = []
    for k in range(_LB_LAGS + 1):
        nk = n - k
        sxy = sum(v[i] * v[i + k] for i in range(nk))
        sh = sum(v[:nk])
        st = sum(v[k:])
        cks.append(np.float64(sxy)
                   - mu * (np.float64(sh) + np.float64(st))
                   + np.float64(nk) * mu * mu)
    tsum = sum(int(np.floor(
        (cks[k] / cks[0]) * (cks[k] / cks[0])
        / np.float64(n - k) * 1000000000.0 + 0.5))
        for k in range(1, _LB_LAGS + 1))
    q = np.float64(n) * (np.float64(n) + 2.0) \
        * (np.float64(tsum) / 1000000000.0)
    return pd.DataFrame({
        "n_days": [np.int64(n)], "n_lags": [np.int64(_LB_LAGS)],
        "term_sum_nano": [np.int64(tsum)],
        "ljung_box_q": [np.float64(q)]})
