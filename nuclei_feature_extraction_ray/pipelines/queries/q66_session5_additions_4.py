# round-5 session-5 additions, batch 4: Benjamini-Hochberg FDR
# step-up over per-source rate tests, HITS authority scores on the
# supplier->part bipartite graph (unrolled integer iterations), and
# Levene's variance-homogeneity test across weekday revenue groups.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_BH_CHARS = 300         # "long doc" indicator threshold
_BH_ALPHA_MICRO = 100000   # alpha = 0.1 in micro units
#: HITS driver-fold bound (the part_pagerank fast-tier policy)
_HITS_DRIVER_EDGES = 5_000_000
_HITS_TOP = 20


@register("benjamini_hochberg", sql="""
    WITH f AS (SELECT source, CAST(count(*) AS BIGINT) AS ns,
                      CAST(sum(CASE WHEN n_chars >= {ch}
                               THEN 1 ELSE 0 END) AS BIGINT) AS ls
               FROM documents GROUP BY source),
    g AS (SELECT CAST(sum(ns) AS BIGINT) AS ng,
                 CAST(sum(ls) AS BIGINT) AS lg,
                 CAST(count(*) AS BIGINT) AS m FROM f),
    z AS (SELECT source, ns, ls,
                 (CAST(ls AS DOUBLE) / CAST(ns AS DOUBLE)
                  - CAST((SELECT lg FROM g) AS DOUBLE)
                    / CAST((SELECT ng FROM g) AS DOUBLE))
                 / sqrt(CAST((SELECT lg FROM g) AS DOUBLE)
                        / CAST((SELECT ng FROM g) AS DOUBLE)
                        * (1.0 - CAST((SELECT lg FROM g) AS DOUBLE)
                           / CAST((SELECT ng FROM g) AS DOUBLE))
                        / CAST(ns AS DOUBLE)) AS zv
          FROM f),
    p AS (SELECT source, ns, ls, zv,
                 CAST(floor(exp(-(zv * zv) / 2.0) * 1000000.0 + 0.5)
                      AS BIGINT) AS p_micro
          FROM z),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY p_micro,
                                            source) AS BIGINT)
                      AS rnk
          FROM p),
    ks AS (SELECT COALESCE(max(rnk), 0) AS kstar FROM r
           WHERE p_micro * (SELECT m FROM g) <= rnk * {am})
    SELECT source, ns AS n_docs, ls AS n_long, zv AS z, p_micro,
           rnk, CAST(CASE WHEN rnk <= (SELECT kstar FROM ks)
                          THEN 1 ELSE 0 END AS BIGINT) AS rejected
    FROM r ORDER BY source""".format(ch=_BH_CHARS,
                                     am=_BH_ALPHA_MICRO))
def benjamini_hochberg(sf_dir: str):
    """BENJAMINI-HOCHBERG FDR step-up over per-source long-document
    rate tests: each source's two-proportion z vs the corpus rate
    turns into the one-sided Chernoff tail bound p <= exp(-z^2/2)
    (a deterministic closed form both engines evaluate identically —
    documented choice, the BH machinery is the operator), p-values
    quantize to micro units, and the step-up threshold test
    p_(k) <= k*alpha/m runs as the EXACT integer comparison
    p_micro*m <= k*alpha_micro — no float boundary can flip a
    rejection. The multiple-testing gate every per-slice anomaly
    census needs before alerting on 100k slices. Scale plan: one
    (source, count) partial pass; the rank/threshold scan is
    driver-side on m rows (source-bounded)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "ns": np.ones(len(b), np.int64),
            "ls": (b["n_chars"].to_numpy(np.int64)
                   >= _BH_CHARS).astype(np.int64)}) \
            .groupby("source", as_index=False).sum()
        for c in ("ns", "ls"):
            g[c] = g[c].astype(np.int64)
        return g

    f = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["ns", "ls"])
    ng, lg, m = int(f["ns"].sum()), int(f["ls"].sum()), len(f)
    pg = np.float64(lg) / np.float64(ng)
    ns = f["ns"].to_numpy(np.int64).astype(np.float64)
    ls = f["ls"].to_numpy(np.int64).astype(np.float64)
    z = (ls / ns - pg) / np.sqrt(pg * (1.0 - pg) / ns)
    p_micro = np.floor(np.exp(-(z * z) / 2.0) * 1000000.0
                       + 0.5).astype(np.int64)
    out = pd.DataFrame({
        "source": f["source"], "n_docs": f["ns"].astype(np.int64),
        "n_long": f["ls"].astype(np.int64), "z": z,
        "p_micro": p_micro}).sort_values(
        ["p_micro", "source"], kind="mergesort").reset_index(
        drop=True)
    out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
    ok = out["p_micro"].to_numpy(np.int64) * m \
        <= out["rnk"].to_numpy(np.int64) * _BH_ALPHA_MICRO
    kstar = int(out["rnk"].to_numpy(np.int64)[ok].max()) \
        if ok.any() else 0
    out["rejected"] = (out["rnk"] <= kstar).astype(np.int64)
    return out.sort_values("source",
                           kind="mergesort").reset_index(drop=True)


@register("hits_authority", sql="""
    WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p
               FROM lineitem),
    a1 AS (SELECT p, CAST(count(*) * 1000000 AS BIGINT) AS auth
           FROM e GROUP BY p),
    h1 AS (SELECT e.s, CAST(sum(a1.auth) AS BIGINT) AS hub
           FROM e JOIN a1 ON e.p = a1.p GROUP BY e.s),
    a2 AS (SELECT e.p, CAST(count(*) AS BIGINT) AS n_suppliers,
                  CAST(sum(h1.hub) AS BIGINT) AS authority
           FROM e JOIN h1 ON e.s = h1.s GROUP BY e.p)
    SELECT p AS partkey, n_suppliers, authority
    FROM a2 ORDER BY authority DESC, partkey LIMIT {k}""".format(
    k=_HITS_TOP))
def hits_authority(sf_dir: str):
    """HITS AUTHORITY scores on the supplier->part bipartite graph,
    two unrolled iterations in PURE INTEGER arithmetic (hub0 = 1e6
    for every supplier; auth = sum of supplier hubs; hub = sum of
    part authorities) — the mutually-reinforcing importance operator
    beside part_pagerank's damped random walk: a part is important
    when supplied by well-connected suppliers. No normalization means
    no division, so both engines are bit-identical with zero float
    concerns; magnitudes stay under int64 at any TPC-H scale
    (documented: <= suppliers x parts-per-supplier x 1e6 ~ 1e12 at
    sf1000). Top-{k} by authority, partkey tie-break. Scale plan:
    distinct (supplier, part) edges via one pair-keyed exchange; up
    to the repo's 5M-edge driver bound the two folds run as numpy
    group-sums on one pull (part_pagerank's fast tier); above it
    each iteration is one key exchange per side, never a broadcast
    of node state."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_partkey"])

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["s", "p"])

    edges = partition_map(
        ds.map_batches(
            lambda b: pd.DataFrame({
                "s": b["l_suppkey"].to_numpy(np.int64),
                "p": b["l_partkey"].to_numpy(np.int64)})
            .drop_duplicates(),
            batch_format="pandas"),
        ["s", "p"], dedup, 16).materialize()
    if edges.count() > _HITS_DRIVER_EDGES:
        raise ValueError(
            "hits_authority: edge list exceeds the driver fold "
            "bound; enable the per-iteration exchange tier")
    e = edges.to_pandas()
    a1 = e.groupby("p", as_index=False).agg(n=("s", "size"))
    a1["auth"] = a1["n"].astype(np.int64) * 1000000
    h1 = e.merge(a1[["p", "auth"]], on="p") \
        .groupby("s", as_index=False).agg(hub=("auth", "sum"))
    a2 = e.merge(h1, on="s").groupby("p", as_index=False).agg(
        n_suppliers=("s", "size"), authority=("hub", "sum"))
    out = a2.sort_values(["authority", "p"],
                         ascending=[False, True],
                         kind="mergesort").head(_HITS_TOP)
    return pd.DataFrame({
        "partkey": out["p"].to_numpy(np.int64),
        "n_suppliers": out["n_suppliers"].to_numpy(np.int64),
        "authority": out["authority"].to_numpy(np.int64)}) \
        .reset_index(drop=True)


@register("levene_test", sql="""
    WITH o AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow,
                      CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x
               FROM orders),
    g AS (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(x) AS BIGINT) AS sg
          FROM o GROUP BY dow),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k FROM g),
    z AS (SELECT o.dow,
                 CAST(floor(CAST(abs(CAST(o.x AS HUGEINT) * g.ng
                                     - g.sg) AS DOUBLE)
                            / CAST(g.ng AS DOUBLE) + 0.5)
                      AS BIGINT) AS zm
          FROM o JOIN g ON o.dow = g.dow),
    q AS (SELECT dow, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(zm) AS BIGINT) AS tg,
                 CAST(sum(CAST(zm AS HUGEINT) * zm) AS HUGEINT)
                   AS qg
          FROM z GROUP BY dow),
    tt AS (SELECT CAST(sum(tg) AS HUGEINT) AS tsum FROM q),
    e AS (SELECT dow, ng, tg,
                 CAST(floor(CAST(ng AS DOUBLE)
                      * ((CAST(tg AS DOUBLE) / CAST(ng AS DOUBLE)
                          - CAST((SELECT tsum FROM tt) AS DOUBLE)
                            / CAST((SELECT n FROM t) AS DOUBLE))
                         * (CAST(tg AS DOUBLE) / CAST(ng AS DOUBLE)
                            - CAST((SELECT tsum FROM tt) AS DOUBLE)
                              / CAST((SELECT n FROM t) AS DOUBLE)))
                      + 0.5) AS BIGINT) AS num_unit,
                 CAST(floor(CAST(qg AS DOUBLE)
                            - CAST(tg AS DOUBLE)
                              * CAST(tg AS DOUBLE)
                              / CAST(ng AS DOUBLE) + 0.5)
                      AS HUGEINT) AS den_unit
          FROM q),
    f AS (SELECT CAST(sum(num_unit) AS HUGEINT) AS num,
                 CAST(sum(den_unit) AS HUGEINT) AS den FROM e)
    SELECT dow, ng AS n_orders, tg AS absdev_sum_cents,
           num_unit AS num_term_unit,
           (CAST((SELECT n FROM t) - (SELECT k FROM t) AS DOUBLE)
            / CAST((SELECT k FROM t) - 1 AS DOUBLE))
           * (CAST((SELECT num FROM f) AS DOUBLE)
              / CAST((SELECT den FROM f) AS DOUBLE)) AS levene_w
    FROM e ORDER BY dow""")
def levene_test(sf_dir: str):
    """LEVENE'S TEST of variance homogeneity across weekday revenue
    groups (mean centers): is order-value SPREAD the same on every
    weekday, not just the level (dow_anova tests the level)? Each
    order's absolute deviation |x - mean_g| is the exact rational
    |x*n_g - S_g| / n_g quantized to whole cents with the shared
    half-up formula; per-group first/second moments of those
    deviations fold as exact ints (python-int / HUGEINT — the
    embedding_covariance overflow policy), per-group between terms
    quantize before the cross-group sum, and W is one shared float
    expression. Scale plan: pass 1 folds 7 (n_g, S_g) cells;
    pass 2 re-streams orders with the 7-entry stats broadcast in the
    closure and folds 7 moment cells — two map-only scans, zero
    row-grain exchanges."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def pass1(b: pd.DataFrame) -> pd.DataFrame:
        dow = b["o_orderdate"].dt.dayofweek.to_numpy(np.int64) + 1
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"dow": dow, "ng": np.ones(len(b),
                                                    np.int64),
                          "sg": x}) \
            .groupby("dow", as_index=False).sum()
        for c in ("ng", "sg"):
            g[c] = g[c].astype(np.int64)
        return g

    g = _combine_partials(
        ds.map_batches(pass1, batch_format="pandas"),
        ["dow"], ["ng", "sg"], exact_int=True)
    ng_of = {int(r["dow"]): int(r["ng"]) for _, r in g.iterrows()}
    sg_of = {int(r["dow"]): int(r["sg"]) for _, r in g.iterrows()}

    def pass2(b: pd.DataFrame) -> pd.DataFrame:
        dow = b["o_orderdate"].dt.dayofweek.to_numpy(np.int64) + 1
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        ngv = np.array([ng_of[d] for d in dow], np.int64)
        sgv = np.array([sg_of[d] for d in dow], np.int64)
        zm = np.floor(np.abs(x * ngv - sgv).astype(np.float64)
                      / ngv.astype(np.float64) + 0.5) \
            .astype(np.int64)
        out = pd.DataFrame({"dow": dow,
                            "ng": np.ones(len(b), np.int64),
                            "tg": zm, "qg": zm * zm}) \
            .groupby("dow", as_index=False).sum()
        for c in ("ng", "tg", "qg"):
            out[c] = out[c].astype(np.int64)
        return out

    q = _combine_partials(
        ds.map_batches(pass2, batch_format="pandas"),
        ["dow"], ["ng", "tg", "qg"],
        exact_int=True).sort_values("dow").reset_index(drop=True)
    n = sum(int(v) for v in q["ng"])
    k = len(q)
    tsum = sum(int(v) for v in q["tg"])
    num = den = 0
    num_units = []
    for _, r in q.iterrows():
        ngf = np.float64(int(r["ng"]))
        tgf = np.float64(int(r["tg"]))
        qgf = np.float64(int(r["qg"]))
        diff = tgf / ngf - np.float64(tsum) / np.float64(n)
        nu = int(np.floor(ngf * (diff * diff) + 0.5))
        du = int(np.floor(qgf - tgf * tgf / ngf + 0.5))
        num_units.append(nu)
        num += nu
        den += du
    w = (np.float64(n - k) / np.float64(k - 1)) \
        * (np.float64(num) / np.float64(den))
    return pd.DataFrame({
        "dow": q["dow"].astype(np.int64),
        "n_orders": q["ng"].map(int).astype(np.int64),
        "absdev_sum_cents": q["tg"].map(int).astype(np.int64),
        "num_term_unit": pd.Series(num_units, dtype=np.int64),
        "levene_w": np.full(k, np.float64(w))})
