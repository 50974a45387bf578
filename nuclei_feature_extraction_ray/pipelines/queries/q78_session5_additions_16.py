# round-5 session-5 additions, batch 16: Colley ratings by three
# unrolled Jacobi iterations over histogram win counts, Juilland's D
# lexical dispersion, and the intraclass correlation / design effect
# of order values clustered by customer.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_JD_TERM = "join"


def _colley_iter_sql(prev: str, nxt: str) -> str:
    """One Jacobi sweep: r'_i = (1 + (w_i - l_i)/2 + sum_j g_ij r_j)
    / (2 + t_i), with the complete-graph identity sum_j g_ij r_j =
    n_i (T_nr - n_i r_i) keeping the inner sum an EXACT integer."""
    return """
    {nxt} AS (SELECT b.source, b.n, b.w2, b.t,
                     CAST(floor((1.0 + CAST(b.w2 - b.t AS DOUBLE)
                          / 2.0
                          + CAST(b.n * (SELECT sum(n * r)
                                        FROM {prev})
                                 - b.n * b.n * p.r AS DOUBLE)
                            / 1000000.0)
                          / (2.0 + CAST(b.t AS DOUBLE))
                          * 1000000.0 + 0.5) AS BIGINT) AS r
              FROM base b JOIN {prev} p ON p.source = b.source)
    """.format(prev=prev, nxt=nxt)


@register("colley_ratings", sql="""
    WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
                      CAST(count(*) AS BIGINT) AS c
               FROM documents GROUP BY 1, 2),
    tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
            FROM h GROUP BY 1),
    nn AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM tot),
    vals AS (SELECT DISTINCT x FROM h),
    grid AS (SELECT t.source, v.x, COALESCE(h.c, 0) AS c
             FROM tot t CROSS JOIN vals v
             LEFT JOIN h ON h.source = t.source AND h.x = v.x),
    cum AS (SELECT source, x, c,
                   CAST(sum(c) OVER (PARTITION BY source
                        ORDER BY x) - c AS BIGINT) AS cl
            FROM grid),
    w AS (SELECT a.source,
                 CAST(sum(a.c * (2 * b.cl + b.c)) AS BIGINT) AS w2
          FROM h a JOIN cum b ON a.x = b.x
                             AND b.source <> a.source
          GROUP BY a.source),
    base AS (SELECT t.source, t.n, w.w2,
                    CAST(t.n * ((SELECT big_n FROM nn) - t.n)
                         AS BIGINT) AS t
             FROM tot t JOIN w ON w.source = t.source),
    r0 AS (SELECT source, n, w2, t,
                  CAST(500000 AS BIGINT) AS r FROM base),
    {i1}, {i2}, {i3}
    SELECT source, n AS n_docs, w2 AS wins2,
           r AS colley_micro,
           CAST(r AS DOUBLE) / 1000000.0 AS colley_rating
    FROM r3 ORDER BY source""".format(
    i1=_colley_iter_sql("r0", "r1"),
    i2=_colley_iter_sql("r1", "r2"),
    i3=_colley_iter_sql("r2", "r3")))
def colley_ratings(sf_dir: str):
    """COLLEY MATRIX ratings of sources by three unrolled Jacobi
    iterations — the bias-free 'wins-only tell you nothing about
    schedule strength' rating system (Laplace's rule of succession
    on match records), solved iteratively beside bt_strength's MM
    update: same histogram-exact win counts, different model.
    The complete-pairing identity sum_j g_ij r_j = n_i(T - n_i r_i)
    keeps the neighbor sum an EXACT integer product fold at every
    iteration (ratings live as micro ints), so three sweeps are
    bit-identical to the chained-CTE oracle. Scale plan: the win
    census is the bt_strength bounded-domain histogram plan; each
    Jacobi sweep is O(sources) driver arithmetic with one exact
    integer dot product."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "x": b["n_chars"].to_numpy(np.int64),
                          "c": np.ones(len(b), np.int64)}) \
            .groupby(["source", "x"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "x"], ["c"])
    sources = sorted(h["source"].unique())
    xs = np.sort(h["x"].unique())
    S = len(sources)
    H = np.zeros((S, len(xs)), np.int64)
    si = {s: i for i, s in enumerate(sources)}
    xi = {int(x): i for i, x in enumerate(xs)}
    for _, r in h.iterrows():
        H[si[r["source"]], xi[int(r["x"])]] = int(r["c"])
    CL = np.cumsum(H, axis=1) - H
    opp = 2 * CL + H
    opp_tot = opp.sum(axis=0)
    n = H.sum(axis=1)
    big_n = int(n.sum())
    w2 = [int((H[i] * (opp_tot - opp[i])).sum()) for i in range(S)]
    t = [int(n[i]) * (big_n - int(n[i])) for i in range(S)]
    r = [500000] * S
    for _ in range(3):
        tnr = sum(int(n[j]) * r[j] for j in range(S))
        r = [int(np.floor(
            (1.0 + np.float64(w2[i] - t[i]) / 2.0
             + np.float64(int(n[i]) * tnr
                          - int(n[i]) * int(n[i]) * r[i])
             / 1000000.0)
            / (2.0 + np.float64(t[i])) * 1000000.0 + 0.5))
            for i in range(S)]
    return pd.DataFrame({
        "source": sources,
        "n_docs": n.astype(np.int64),
        "wins2": np.array(w2, np.int64),
        "colley_micro": np.array(r, np.int64),
        "colley_rating": np.array(r, np.float64) / 1000000.0})


@register("juilland_d", sql="""
    WITH d AS (SELECT source, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT source, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t
            FROM w GROUP BY source),
    cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS c
            FROM w WHERE term = '{tm}' GROUP BY source),
    f AS (SELECT tot.source,
                 CAST(floor(CAST(COALESCE(cnt.c, 0) AS DOUBLE)
                      / CAST(tot.t AS DOUBLE) * 1000000000.0
                      + 0.5) AS BIGINT) AS fn
          FROM tot LEFT JOIN cnt ON cnt.source = tot.source),
    m AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(fn) AS HUGEINT) AS sf,
                 CAST(sum(CAST(fn AS HUGEINT) * fn) AS HUGEINT)
                   AS sf2
          FROM f)
    SELECT '{tm}' AS term, k AS n_sources,
           CAST(sf AS BIGINT) AS freq_nano_sum,
           sqrt(CAST(k * sf2 - sf * sf AS DOUBLE))
             / CAST(sf AS DOUBLE) AS cv,
           1.0 - (sqrt(CAST(k * sf2 - sf * sf AS DOUBLE))
                  / CAST(sf AS DOUBLE))
                 / sqrt(CAST(k AS DOUBLE) - 1.0) AS juilland_d
    FROM m""".format(tm=_JD_TERM))
def juilland_d(sf_dir: str):
    """JUILLAND'S D lexical dispersion of the term '{tm}' across
    sources: D = 1 - CV/sqrt(k-1) over per-source relative
    frequencies — 1.0 means the term spreads perfectly evenly, 0
    means it clusters in one source; THE corpus-linguistics check
    that a 'frequent' term isn't one sub-corpus shouting
    (term_burstiness is within-doc, this is across-corpus). Relative
    frequencies quantize to nano units (exact ints, the
    burrows_delta policy), moments fold exactly (HUGEINT / python
    int), and CV and D are shared float expressions. Scale plan:
    per-source token totals and term counts are map-only partials
    into a bounded source-grid combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        src = np.repeat(b["source"].to_numpy(object), k)
        hit = vals.to_numpy(zero_copy_only=False) == _JD_TERM
        tt = pd.DataFrame({"source": b["source"].to_numpy(object),
                           "t": k}).groupby("source",
                                            as_index=False).sum()
        ct = pd.DataFrame({"source": src[hit],
                           "c": np.ones(int(hit.sum()),
                                        np.int64)}) \
            .groupby("source", as_index=False).sum() \
            if hit.any() else pd.DataFrame(
                {"source": pd.Series(dtype=object),
                 "c": pd.Series(dtype=np.int64)})
        out = tt.merge(ct, on="source", how="left")
        out["c"] = out["c"].fillna(0).astype(np.int64)
        out["t"] = out["t"].astype(np.int64)
        return out

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["t", "c"])
    fn = [int(np.floor(np.float64(int(r["c"]))
                       / np.float64(int(r["t"])) * 1000000000.0
                       + 0.5)) for _, r in s.iterrows()]
    k = len(fn)
    sf = sum(fn)
    sf2 = sum(v * v for v in fn)
    cv = np.sqrt(np.float64(k * sf2 - sf * sf)) / np.float64(sf)
    return pd.DataFrame({
        "term": [_JD_TERM], "n_sources": [np.int64(k)],
        "freq_nano_sum": [np.int64(sf)], "cv": [np.float64(cv)],
        "juilland_d": [1.0 - cv
                       / np.sqrt(np.float64(k) - 1.0)]})


@register("icc_design_effect", sql="""
    WITH o AS (SELECT o_custkey AS cust,
                      CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x
               FROM orders),
    g AS (SELECT cust, CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(x) AS BIGINT) AS sg
          FROM o GROUP BY cust),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(sg) AS HUGEINT) AS tt,
                 CAST(sum(CAST(ng AS HUGEINT) * ng) AS HUGEINT)
                   AS sn2,
                 CAST(sum(CAST(floor(CAST(sg AS DOUBLE)
                      * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                      + 0.5) AS BIGINT)) AS HUGEINT) AS a
          FROM g),
    q AS (SELECT CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS qq FROM o),
    f AS (SELECT (SELECT n FROM t) AS n, (SELECT k FROM t) AS k,
                 (CAST((SELECT a FROM t) AS DOUBLE)
                  - CAST((SELECT tt FROM t) AS DOUBLE)
                    * CAST((SELECT tt FROM t) AS DOUBLE)
                    / CAST((SELECT n FROM t) AS DOUBLE))
                 / CAST((SELECT k FROM t) - 1 AS DOUBLE) AS msb,
                 (CAST((SELECT qq FROM q) AS DOUBLE)
                  - CAST((SELECT a FROM t) AS DOUBLE))
                 / CAST((SELECT n FROM t) - (SELECT k FROM t)
                        AS DOUBLE) AS msw,
                 (CAST((SELECT n FROM t) AS DOUBLE)
                  - CAST((SELECT sn2 FROM t) AS DOUBLE)
                    / CAST((SELECT n FROM t) AS DOUBLE))
                 / CAST((SELECT k FROM t) - 1 AS DOUBLE) AS n0)
    SELECT n AS n_orders, k AS n_customers, msb, msw, n0,
           (msb - msw) / (msb + (n0 - 1.0) * msw) AS icc,
           1.0 + (CAST(n AS DOUBLE) / CAST(k AS DOUBLE) - 1.0)
                 * ((msb - msw) / (msb + (n0 - 1.0) * msw))
             AS design_effect
    FROM f""")
def icc_design_effect(sf_dir: str):
    """INTRACLASS CORRELATION ICC(1) of order values clustered by
    customer, with the survey DESIGN EFFECT 1 + (m-1)*ICC: how much
    does within-customer correlation shrink the effective sample
    size of any order-level A/B test (the clustered-data reality
    check srm_check and ab_test silently assume away)? Between/
    within mean squares come from exact integer moments — each
    group's S_g^2/n_g rational quantizes to whole units half-up
    BEFORE the cross-group fold (HUGEINT / python int), the ANOVA
    n0 handles unequal cluster sizes, and every ratio is a shared
    float expression. Scale plan: per-customer cells fold through
    ONE custkey exchange whose partitions emit 5 scalars; the
    driver combine is O(partitions)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "ng": np.ones(len(b), np.int64), "sg": x}) \
            .groupby("cust", as_index=False).sum()
        for c in ("ng", "sg"):
            g[c] = g[c].astype(np.int64)
        qx = x.astype(object)
        g2 = pd.DataFrame({"cust": b["o_custkey"]
                           .to_numpy(np.int64),
                           "qg": qx * qx}) \
            .groupby("cust", as_index=False).sum()
        return g.merge(g2, on="cust")

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False).agg(
            ng=("ng", "sum"), sg=("sg", "sum"), qg=("qg", "sum"))
        n = int(a["ng"].sum())
        k = len(a)
        tt = int(a["sg"].sum())
        sn2 = sum(int(v) * int(v) for v in a["ng"])
        qq = sum(int(v) for v in a["qg"])
        aa = sum(int(np.floor(
            np.float64(int(r["sg"])) * np.float64(int(r["sg"]))
            / np.float64(int(r["ng"])) + 0.5))
            for _, r in a.iterrows())
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": [n], "k": [k], "tt": [tt], "sn2": [sn2],
            "qq": [qq], "a": [aa]})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["j"], ["n", "k", "tt", "sn2", "qq", "a"], exact_int=True)
    n = int(s["n"].iloc[0])
    k = int(s["k"].iloc[0])
    tt = int(s["tt"].iloc[0])
    sn2 = int(s["sn2"].iloc[0])
    qq = int(s["qq"].iloc[0])
    a = int(s["a"].iloc[0])
    msb = (np.float64(a) - np.float64(tt) * np.float64(tt)
           / np.float64(n)) / np.float64(k - 1)
    msw = (np.float64(qq) - np.float64(a)) / np.float64(n - k)
    n0 = (np.float64(n) - np.float64(sn2) / np.float64(n)) \
        / np.float64(k - 1)
    icc = (msb - msw) / (msb + (n0 - 1.0) * msw)
    deff = 1.0 + (np.float64(n) / np.float64(k) - 1.0) * icc
    return pd.DataFrame({
        "n_orders": [np.int64(n)], "n_customers": [np.int64(k)],
        "msb": [np.float64(msb)], "msw": [np.float64(msw)],
        "n0": [np.float64(n0)], "icc": [np.float64(icc)],
        "design_effect": [np.float64(deff)]})
