# round-5 session-5 additions, batch 32: polynomial-kernel MMD from
# exact moment matrices, Mood's median test across weekday groups,
# and a Mantel matrix-correlation test between brand distance
# matrices.
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, np, pd,
                      rd, register)
from .q10_feature_engineering_readability import _basket_edges


@register("mmd_poly", sql="""
    WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS y,
                      CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                           END AS grp
               FROM lineitem),
    m AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x * x) AS HUGEINT) AS s11,
                 CAST(sum(x * y) AS HUGEINT) AS s12,
                 CAST(sum(y * y) AS HUGEINT) AS s22
          FROM r GROUP BY grp),
    a AS (SELECT n, s11, s12, s22 FROM m WHERE grp = 1),
    b AS (SELECT n, s11, s12, s22 FROM m WHERE grp = 0)
    SELECT CAST((SELECT n FROM a) AS BIGINT) AS n_returned,
           CAST((SELECT n FROM b) AS BIGINT) AS n_kept,
           CAST((SELECT s11 FROM a) * (SELECT s11 FROM a)
                + 2 * (SELECT s12 FROM a) * (SELECT s12 FROM a)
                + (SELECT s22 FROM a) * (SELECT s22 FROM a)
                AS DOUBLE)
           / (CAST((SELECT n FROM a) AS DOUBLE)
              * CAST((SELECT n FROM a) AS DOUBLE))
           + CAST((SELECT s11 FROM b) * (SELECT s11 FROM b)
                  + 2 * (SELECT s12 FROM b) * (SELECT s12 FROM b)
                  + (SELECT s22 FROM b) * (SELECT s22 FROM b)
                  AS DOUBLE)
             / (CAST((SELECT n FROM b) AS DOUBLE)
                * CAST((SELECT n FROM b) AS DOUBLE))
           - 2.0 * CAST((SELECT s11 FROM a) * (SELECT s11 FROM b)
                        + 2 * (SELECT s12 FROM a)
                          * (SELECT s12 FROM b)
                        + (SELECT s22 FROM a)
                          * (SELECT s22 FROM b) AS DOUBLE)
             / (CAST((SELECT n FROM a) AS DOUBLE)
                * CAST((SELECT n FROM b) AS DOUBLE)) AS mmd2
    """)
def mmd_poly(sf_dir: str):
    """MAXIMUM MEAN DISCREPANCY with the degree-2 polynomial kernel
    between returned and kept (quantity, discount) point clouds:
    the kernel two-sample statistic that sees MULTIVARIATE
    differences (joint structure) the 1-D family (ks/cvm/energy/
    wasserstein) cannot. The V-statistic expectations collapse
    EXACTLY to second-moment matrices — E[(u.v)^2] = (S11^2 +
    2 S12^2 + S22^2)/n^2 — so MMD^2 is three exact big-integer
    quadratic forms in one shared float expression, with NO kernel
    matrix and NO pair ever materialized. Scale plan: per-batch
    3-cell moment partials per group, O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount",
                                  "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy(np.int64).astype(object)
        y = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64).astype(object)
        g = (b["l_returnflag"].to_numpy(object)
             == "R").astype(np.int64)
        rows = []
        for grp in (0, 1):
            m = g == grp
            rows.append({"grp": grp, "n": int(m.sum()),
                         "s11": int((x[m] * x[m]).sum()),
                         "s12": int((x[m] * y[m]).sum()),
                         "s22": int((y[m] * y[m]).sum())})
        return pd.DataFrame(rows)

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["grp"], ["n", "s11", "s12", "s22"], exact_int=True)

    def row(grp: int):
        r = s[s["grp"] == grp].iloc[0]
        return (int(r["n"]), int(r["s11"]), int(r["s12"]),
                int(r["s22"]))

    nb, b11, b12, b22 = row(0)
    na, a11, a12, a22 = row(1)
    mmd2 = np.float64(a11 * a11 + 2 * a12 * a12 + a22 * a22) \
        / (np.float64(na) * np.float64(na)) \
        + np.float64(b11 * b11 + 2 * b12 * b12 + b22 * b22) \
        / (np.float64(nb) * np.float64(nb)) \
        - 2.0 * np.float64(a11 * b11 + 2 * a12 * b12
                           + a22 * b22) \
        / (np.float64(na) * np.float64(nb))
    return pd.DataFrame({
        "n_returned": [np.int64(na)], "n_kept": [np.int64(nb)],
        "mmd2": [np.float64(mmd2)]})


@register("moods_median", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    med AS (SELECT v AS m FROM (
              SELECT v, row_number() OVER (ORDER BY v, day) AS i
              FROM d)
            WHERE i = ((SELECT n FROM n) + 1) // 2),
    g AS (SELECT ((day + 3) % 7) + 1 AS dow,
                 CAST(count(*) AS BIGINT) AS ng,
                 CAST(sum(CASE WHEN v > (SELECT m FROM med)
                          THEN 1 ELSE 0 END) AS BIGINT) AS o
          FROM d GROUP BY 1),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
                 CAST(sum(o) AS BIGINT) AS a FROM g),
    q AS (SELECT CAST(sum(CAST(floor(
                 CAST((o * (SELECT nn FROM t)
                       - ng * (SELECT a FROM t))
                      * (o * (SELECT nn FROM t)
                         - ng * (SELECT a FROM t)) AS DOUBLE)
                 / (CAST(ng AS DOUBLE)
                    * CAST((SELECT a FROM t) AS DOUBLE)
                    * CAST((SELECT nn FROM t)
                           - (SELECT a FROM t) AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS chi_micro
          FROM g)
    SELECT (SELECT n FROM n) AS n_days,
           (SELECT m FROM med) AS grand_median_cents,
           (SELECT a FROM t) AS n_above,
           (SELECT chi_micro FROM q) AS chi_sum_micro,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             AS moods_chi2""")
def moods_median(sf_dir: str):
    """MOOD'S MEDIAN TEST across weekday revenue groups: classify
    every day strictly above/at-or-below the EXACT grand lower
    median (an order statistic — no float median), then the 7-group
    chi-square on above-median counts — the crudest but most
    outlier-proof k-group location test, the triage sibling of
    kruskal_wallis (ranks) and dow_anova (means). Each group's
    (O*N - n_g*A)^2 / (n_g*A*(N-A)) term is built from exact
    integers and quantized to micro units half-up before the
    7-term fold (the integer dow key (day+3)%7+1 needs no calendar
    function). Scale plan: bounded day-domain combine; median and
    census are O(days) driver work."""
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
    med = int(v[order][(n + 1) // 2 - 1])
    dow = ((day + 3) % 7) + 1
    above = (v > med).astype(np.int64)
    g = pd.DataFrame({"dow": dow, "ng": 1, "o": above}) \
        .groupby("dow", as_index=False).sum()
    a = int(g["o"].sum())
    chi = 0
    for _, r in g.iterrows():
        ng, o = int(r["ng"]), int(r["o"])
        num = (o * n - ng * a)
        chi += int(np.floor(
            np.float64(num * num)
            / (np.float64(ng) * np.float64(a)
               * np.float64(n - a)) * 1000000.0 + 0.5))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "grand_median_cents": [np.int64(med)],
        "n_above": [np.int64(a)],
        "chi_sum_micro": [np.int64(chi)],
        "moods_chi2": [np.float64(chi) / 1000000.0]})


@register("mantel_test", sql="""
    WITH pr AS (SELECT p_partkey, p_brand,
                       CAST(floor(p_retailprice * 100 + 0.5)
                            AS BIGINT) AS pr
                FROM part),
    bp AS (SELECT p_brand AS brand,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(pr) AS BIGINT) AS s
           FROM pr GROUP BY 1),
    d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    be AS (SELECT x.p_brand AS ba, y.p_brand AS bb,
                  CAST(count(*) AS BIGINT) AS w
           FROM e0 JOIN pr x ON e0.pa = x.p_partkey
                   JOIN pr y ON e0.pb = y.p_partkey
           GROUP BY 1, 2),
    pair AS (SELECT a.brand AS b1, b.brand AS b2,
                    CAST(abs(CAST(floor(CAST(a.s AS DOUBLE)
                              / CAST(a.n AS DOUBLE) + 0.5)
                              AS BIGINT)
                             - CAST(floor(CAST(b.s AS DOUBLE)
                                / CAST(b.n AS DOUBLE) + 0.5)
                                AS BIGINT)) AS BIGINT) AS d1,
                    CAST(COALESCE((SELECT sum(w) FROM be
                          WHERE (be.ba = a.brand
                                 AND be.bb = b.brand)
                             OR (be.ba = b.brand
                                 AND be.bb = a.brand)), 0)
                         AS BIGINT) AS d2
             FROM bp a JOIN bp b ON a.brand < b.brand),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
                 CAST(sum(d1) AS HUGEINT) AS s1,
                 CAST(sum(d2) AS HUGEINT) AS s2,
                 CAST(sum(d1 * d1) AS HUGEINT) AS s11,
                 CAST(sum(d2 * d2) AS HUGEINT) AS s22,
                 CAST(sum(d1 * d2) AS HUGEINT) AS s12
          FROM pair)
    SELECT CAST(k AS BIGINT) AS n_pairs,
           CAST(k * s12 - s1 * s2 AS DOUBLE)
           / sqrt(CAST(k * s11 - s1 * s1 AS DOUBLE)
                  * CAST(k * s22 - s2 * s2 AS DOUBLE))
             AS mantel_r
    FROM m""")
def mantel_test(sf_dir: str):
    """MANTEL MATRIX-CORRELATION TEST: across all brand pairs, does
    PRICE distance (|mean retail price difference|, whole cents
    half-up) correlate with co-purchase CONNECTIVITY (support-
    filtered edge count between the brands)? The
    distance-matrix association operator from ecology, here asking
    whether similarly-priced brands are bought together — a
    question no single-matrix graph statistic (assortativity,
    modularity) can pose. Brand mean prices quantize to exact
    cents, both pairwise matrices are exact integers, and the
    Pearson correlation over the brand-pair cells uses exact
    integer moments with one shared float expression. Scale plan:
    brand price cells and the brand-pair edge census are both
    bounded grids (the basket machinery's exchange); the
    correlation is O(brands^2) driver work."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand", "p_retailprice"])
    pk = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk, kind="stable")
    pk = pk[order_]
    brand = part["p_brand"].to_numpy()[order_]
    price = np.floor(part["p_retailprice"].to_numpy(np.float64)
                     [order_] * 100 + 0.5).astype(np.int64)

    bp = pd.DataFrame({"brand": brand, "n": 1, "s": price}) \
        .groupby("brand", as_index=False).sum()
    mean_c = {r["brand"]: int(np.floor(
        np.float64(int(r["s"])) / np.float64(int(r["n"])) + 0.5))
        for _, r in bp.iterrows()}

    def label(b: pd.DataFrame) -> pd.DataFrame:
        pa = b["part_a"].to_numpy(np.int64)
        pb = b["part_b"].to_numpy(np.int64)
        ba = brand[np.searchsorted(pk, pa)]
        bb = brand[np.searchsorted(pk, pb)]
        lo = np.minimum(ba, bb)
        hi = np.maximum(ba, bb)
        g = pd.DataFrame({"b1": lo, "b2": hi,
                          "w": np.ones(len(b), np.int64)}) \
            .groupby(["b1", "b2"], as_index=False).sum()
        g["w"] = g["w"].astype(np.int64)
        return g

    be = _combine_partials(
        _basket_edges(sf_dir).map_batches(label,
                                          batch_format="pandas"),
        ["b1", "b2"], ["w"])
    wmap = {(r["b1"], r["b2"]): int(r["w"])
            for _, r in be.iterrows()}
    brands = sorted(mean_c)
    d1 = []
    d2 = []
    for i, a in enumerate(brands):
        for b2_ in brands[i + 1:]:
            d1.append(abs(mean_c[a] - mean_c[b2_]))
            d2.append(wmap.get((a, b2_), 0)
                      + wmap.get((b2_, a), 0))
    k = len(d1)
    s1, s2 = sum(d1), sum(d2)
    s11 = sum(x * x for x in d1)
    s22 = sum(x * x for x in d2)
    s12 = sum(x * y for x, y in zip(d1, d2))
    r = np.float64(k * s12 - s1 * s2) \
        / np.sqrt(np.float64(k * s11 - s1 * s1)
                  * np.float64(k * s22 - s2 * s2))
    return pd.DataFrame({
        "n_pairs": [np.int64(k)], "mantel_r": [np.float64(r)]})
