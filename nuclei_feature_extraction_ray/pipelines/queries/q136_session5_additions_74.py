# round-5 session-5 additions, batch 74: Moran's I / Geary's C
# spatial autocorrelation on the region adjacency, the Wilcoxon
# signed-rank test on daily arm differences, and black-white join
# counts for the binary spatial census.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, _read_dim,
                      np, pd, ray, rd, register)


def _nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Per-nation order revenue in exact cents (all nations, zero
    filled), via the q7_trade_flow broadcast-dim idiom: the
    customer key->nation array is ray.put once and searchsorted
    inside every batch."""
    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    co = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((cust["c_custkey"].to_numpy(np.int64)[co],
                   cust["c_nationkey"].to_numpy(np.int64)[co]))
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, nats = ray.get(ref)
        ck = b["o_custkey"].to_numpy(np.int64)
        nk = nats[np.searchsorted(keys, ck)]
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"nk": nk, "x": cents}) \
            .groupby("nk", as_index=False).sum()
        g["x"] = g["x"].astype(np.int64)
        return g

    rev = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["nk"], ["x"], exact_int=True)
    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_regionkey"])
    out = nat.rename(columns={"n_nationkey": "nk",
                              "n_regionkey": "rk"}) \
        .merge(rev, on="nk", how="left")
    out["x"] = out["x"].map(lambda v: 0 if pd.isna(v) else int(v))
    return out[["nk", "rk", "x"]]


_NREV_SQL = """
    cents AS (SELECT o_custkey,
                     CAST(floor(o_totalprice * 100 + 0.5)
                          AS BIGINT) AS v
              FROM orders),
    xn AS (SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
                  CAST(COALESCE(sum(ce.v), 0) AS HUGEINT) AS x
           FROM nation n
           LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
           LEFT JOIN cents ce ON ce.o_custkey = c.c_custkey
           GROUP BY 1, 2)"""


@register("spatial_autocorr", sql="""
    WITH """ + _NREV_SQL + """,
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS s FROM xn),
    z AS (SELECT rk,
                 (SELECT n FROM t) * x - (SELECT s FROM t) AS z
          FROM xn),
    reg AS (SELECT rk, CAST(count(*) AS HUGEINT) AS cnt,
                   CAST(sum(z) AS HUGEINT) AS zr,
                   CAST(sum(z * z) AS HUGEINT) AS z2r
            FROM z GROUP BY rk),
    agg AS (SELECT CAST(sum(cnt * (cnt - 1)) AS HUGEINT) AS w,
                   CAST(sum(zr * zr - z2r) AS HUGEINT) AS num_i,
                   CAST(sum(2 * (cnt * z2r - zr * zr))
                        AS HUGEINT) AS num_c,
                   CAST(sum(z2r) AS HUGEINT) AS den
            FROM reg)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_nations,
           CAST((SELECT w FROM agg) AS BIGINT) AS w_pairs,
           (CAST((SELECT n FROM t) AS DOUBLE)
            / CAST((SELECT w FROM agg) AS DOUBLE))
           * (CAST((SELECT num_i FROM agg) AS DOUBLE)
              / CAST((SELECT den FROM agg) AS DOUBLE))
             AS morans_i,
           ((CAST((SELECT n FROM t) AS DOUBLE) - 1.0)
            / (2.0 * CAST((SELECT w FROM agg) AS DOUBLE)))
           * (CAST((SELECT num_c FROM agg) AS DOUBLE)
              / CAST((SELECT den FROM agg) AS DOUBLE))
             AS gearys_c""")
def spatial_autocorr(sf_dir: str):
    """MORAN'S I and GEARY'S C over per-nation revenue on the
    same-region adjacency (w_ij = 1 iff nations i, j share a
    region): the two canonical spatial-autocorrelation statistics
    — I is a cross-product (global clustering) measure, C a
    squared-difference (local heterogeneity) measure, and their
    divergence flags hot spots that I alone smooths over; here
    they answer 'does revenue cluster by region beyond what
    nation-level variance implies?'. Centering by the SCALED
    deviation z = n*x - S keeps every cross product and squared
    difference an exact big int (within-region sums give both
    numerators in closed form); I and C are shared float
    expressions. Scale plan: the q7 broadcast-dim join into a
    25-row nation combine; region algebra is O(regions) driver
    work."""
    xn = _nation_revenue(sf_dir)
    xs = [int(v) for v in xn["x"]]
    rks = [int(v) for v in xn["rk"]]
    n = len(xs)
    s = sum(xs)
    reg = {}
    for rk, x in zip(rks, xs):
        z = n * x - s
        c, zr, z2 = reg.get(rk, (0, 0, 0))
        reg[rk] = (c + 1, zr + z, z2 + z * z)
    w = sum(c * (c - 1) for c, _, _ in reg.values())
    num_i = sum(zr * zr - z2 for _, zr, z2 in reg.values())
    num_c = sum(2 * (c * z2 - zr * zr)
                for c, zr, z2 in reg.values())
    den = sum(z2 for _, _, z2 in reg.values())
    mi = (np.float64(n) / np.float64(w)) \
        * (np.float64(num_i) / np.float64(den))
    gc = ((np.float64(n) - 1.0) / (2.0 * np.float64(w))) \
        * (np.float64(num_c) / np.float64(den))
    return pd.DataFrame({
        "n_nations": [np.int64(n)], "w_pairs": [np.int64(w)],
        "morans_i": [np.float64(mi)],
        "gearys_c": [np.float64(gc)]})


@register("join_count_stats", sql="""
    WITH """ + _NREV_SQL + """,
    med AS (SELECT CAST(count(*) AS BIGINT) AS n FROM xn),
    r AS (SELECT rk, x,
                 CAST(row_number() OVER (ORDER BY x, nk)
                      AS BIGINT) AS pos
          FROM xn),
    lab AS (SELECT rk,
                   CAST(CASE WHEN pos * 2 > (SELECT n FROM med)
                        THEN 1 ELSE 0 END AS BIGINT) AS b
            FROM r),
    reg AS (SELECT rk, CAST(count(*) AS BIGINT) AS cnt,
                   CAST(sum(b) AS BIGINT) AS nb
            FROM lab GROUP BY rk),
    agg AS (SELECT CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS w2,
                   CAST(sum(nb * (nb - 1)) AS BIGINT) AS bb2,
                   CAST(sum(2 * nb * (cnt - nb)) AS BIGINT)
                     AS bw2
            FROM reg),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(b) AS BIGINT) AS nb
            FROM lab)
    SELECT (SELECT n FROM tot) AS n_nations,
           (SELECT nb FROM tot) AS n_black,
           (SELECT w2 FROM agg) // 2 AS n_joins,
           (SELECT bb2 FROM agg) // 2 AS bb_joins,
           (SELECT bw2 FROM agg) // 2 AS bw_joins,
           CAST((SELECT bb2 FROM agg) AS DOUBLE) / 2.0
           - (CAST((SELECT w2 FROM agg) AS DOUBLE) / 2.0)
             * (CAST((SELECT nb FROM tot) AS DOUBLE)
                * (CAST((SELECT nb FROM tot) AS DOUBLE) - 1.0))
             / (CAST((SELECT n FROM tot) AS DOUBLE)
                * (CAST((SELECT n FROM tot) AS DOUBLE) - 1.0))
             AS bb_excess""")
def join_count_stats(sf_dir: str):
    """JOIN-COUNT STATISTICS on the binary spatial census: label
    each nation black if its revenue rank is in the top half
    ((value, nationkey) order), count black-black and black-white
    joins on the same-region adjacency, and report BB's excess
    over its free-sampling expectation W * nb(nb-1) / (n(n-1)) —
    the categorical counterpart of spatial_autocorr (Moran needs
    interval data; join counts work for ANY binary label, the
    classic epidemiology/cartography tool). Labels come from an
    exact integer rank test pos*2 > n; all join counts are exact
    integer region algebra; only the expectation term is float.
    Scale plan: same broadcast-dim nation combine; O(regions)
    driver work."""
    xn = _nation_revenue(sf_dir)
    n = len(xn)
    order = sorted(range(n),
                   key=lambda i: (int(xn["x"].iloc[i]),
                                  int(xn["nk"].iloc[i])))
    black = [False] * n
    for pos, i in enumerate(order, start=1):
        black[i] = pos * 2 > n
    reg = {}
    for i in range(n):
        rk = int(xn["rk"].iloc[i])
        c, nb = reg.get(rk, (0, 0))
        reg[rk] = (c + 1, nb + (1 if black[i] else 0))
    w2 = sum(c * (c - 1) for c, _ in reg.values())
    bb2 = sum(nb * (nb - 1) for _, nb in reg.values())
    bw2 = sum(2 * nb * (c - nb) for c, nb in reg.values())
    nb_tot = sum(nb for _, nb in reg.values())
    excess = np.float64(bb2) / 2.0 \
        - (np.float64(w2) / 2.0) \
        * (np.float64(nb_tot) * (np.float64(nb_tot) - 1.0)) \
        / (np.float64(n) * (np.float64(n) - 1.0))
    return pd.DataFrame({
        "n_nations": [np.int64(n)],
        "n_black": [np.int64(nb_tot)],
        "n_joins": [np.int64(w2 // 2)],
        "bb_joins": [np.int64(bb2 // 2)],
        "bw_joins": [np.int64(bw2 // 2)],
        "bb_excess": [np.float64(excess)]})


@register("wilcoxon_signed_rank", sql="""
    WITH day AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                          AS day,
                        CAST(sum(CASE WHEN user_id % 2 = 1
                                      AND event_type = 'purchase'
                                 THEN 1 ELSE 0 END)
                             - sum(CASE WHEN user_id % 2 = 0
                                        AND event_type =
                                            'purchase'
                                   THEN 1 ELSE 0 END) AS BIGINT)
                          AS d
                 FROM events GROUP BY 1),
    nz AS (SELECT d, abs(d) AS ad FROM day WHERE d <> 0),
    r AS (SELECT d,
                 CAST(rank() OVER (ORDER BY ad) AS BIGINT)
                   AS rmin,
                 CAST(count(*) OVER (PARTITION BY ad) AS BIGINT)
                   AS c
          FROM nz),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN d > 0
                          THEN 2 * rmin + c - 1 ELSE 0 END)
                      AS HUGEINT) AS w2
          FROM r),
    tie AS (SELECT CAST(COALESCE(sum(CAST(c AS HUGEINT) * c * c
                                     - c), 0) AS HUGEINT)
                     AS tcorr
            FROM (SELECT CAST(count(*) AS BIGINT) AS c
                  FROM nz GROUP BY ad)),
    f AS (SELECT n, w2,
                 CAST(n AS HUGEINT) * (n + 1) // 2 AS e2,
                 2 * CAST(n AS HUGEINT) * (n + 1) * (2 * n + 1)
                 - (SELECT tcorr FROM tie) AS vn
          FROM s)
    SELECT n AS n_days,
           CAST(w2 AS BIGINT) AS w_plus_doubled,
           (CAST(w2 - e2 AS DOUBLE) / 2.0)
           / sqrt(CAST(vn AS DOUBLE) / 48.0) AS wilcoxon_z
    FROM f""")
def wilcoxon_signed_rank(sf_dir: str):
    """WILCOXON SIGNED-RANK TEST on daily arm purchase-count
    differences: rank |d| with midrank ties (kept exact by
    DOUBLING: 2*rank_min + ties - 1), sum doubled ranks of
    positive days, z = (W+ - n(n+1)/4) / sqrt(var with the
    tie-corrected term sum(t^3 - t)/48) — the magnitude-aware
    middle ground between sign_test (signs only) and paired_t
    (assumes normality): a few huge wins move W+ but not the sign
    count. Every rank, tie count and moment is an exact integer
    (variance numerator VN = 2n(n+1)(2n+1) - sum(t^3 - t), so var
    = VN/48); the z is one shared float expression. Scale plan:
    bounded day-domain combine; ranking is O(days) driver work."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        arm = b["user_id"].to_numpy(np.int64) % 2
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "d": np.where(arm == 1, pur, -pur)}) \
            .groupby("day", as_index=False).sum()
        g["d"] = g["d"].astype(np.int64)
        return g

    t = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["d"], exact_int=True)
    d = [int(v) for v in t["d"] if int(v) != 0]
    ad = sorted(abs(v) for v in d)
    n = len(d)
    # doubled midrank per distinct |d| value, plus tie correction
    rmin = {}
    cnt = {}
    i = 0
    while i < n:
        j = i
        while j < n and ad[j] == ad[i]:
            j += 1
        rmin[ad[i]] = i + 1
        cnt[ad[i]] = j - i
        i = j
    w2 = sum(2 * rmin[abs(v)] + cnt[abs(v)] - 1
             for v in d if v > 0)
    tcorr = sum(c * c * c - c for c in cnt.values())
    e2 = n * (n + 1) // 2
    vn = 2 * n * (n + 1) * (2 * n + 1) - tcorr
    z = (np.float64(w2 - e2) / 2.0) \
        / np.sqrt(np.float64(vn) / 48.0)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "w_plus_doubled": [np.int64(w2)],
        "wilcoxon_z": [np.float64(z)]})
