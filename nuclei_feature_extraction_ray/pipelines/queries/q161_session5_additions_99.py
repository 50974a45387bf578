# round-5 session-5 additions, batch 99: exact bucketized 1-D
# optimal transport drift, the O'Brien-Fleming group-sequential
# replay, and a Bernoulli CUSUM on daily conversion.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL

# micro-quantized ln-likelihood-ratio increments for the Bernoulli
# CUSUM testing p1 = 0.25 against p0 = 0.2 (identical literals in
# both engines): success adds ln(0.25/0.2), failure ln(0.75/0.8)
_BC_S = 223144    # floor(ln(1.25)*1e6+0.5)
_BC_F = -64539    # floor(ln(0.9375)*1e6+0.5)

# O'Brien-Fleming two-sided boundaries (micro) at 4 equally spaced
# looks: 4.332634/sqrt(k/4) pattern -> literals
_OBF = (4332634, 3063643, 2501449, 2166317)


@register("exact_ot_drift", sql="""
    WITH """ + _DAILY_SQL + """,
    t AS (SELECT min(day) AS mn, max(day) AS mx FROM d),
    h AS (SELECT CASE WHEN day - (SELECT mn FROM t)
                      <= ((SELECT mx FROM t)
                          - (SELECT mn FROM t)) // 2
                 THEN 0 ELSE 1 END AS era,
                 least(CAST((v / 1) AS HUGEINT)
                       * 10
                       // ((SELECT max(CAST(v AS HUGEINT))
                            FROM d) + 1), 9) AS b
          FROM d),
    g AS (SELECT era, CAST(b AS BIGINT) AS b,
                 CAST(count(*) AS BIGINT) AS c
          FROM h GROUP BY era, b),
    grid AS (SELECT CAST(e.e AS BIGINT) AS era,
                    CAST(bb.b AS BIGINT) AS b,
                    CAST(COALESCE((SELECT c FROM g
                                   WHERE g.era = e.e
                                     AND g.b = bb.b), 0)
                         AS BIGINT) AS c
             FROM (VALUES (0), (1)) e(e)
             CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
                                (8),(9)) bb(b)),
    tot AS (SELECT
        CAST((SELECT sum(c) FROM grid WHERE era = 0) AS HUGEINT)
          AS n0,
        CAST((SELECT sum(c) FROM grid WHERE era = 1) AS HUGEINT)
          AS n1),
    cum AS (SELECT b,
                   CAST(sum(CASE WHEN era = 0 THEN c ELSE 0 END)
                        OVER (ORDER BY b) AS HUGEINT) AS p,
                   CAST(sum(CASE WHEN era = 1 THEN c ELSE 0 END)
                        OVER (ORDER BY b) AS HUGEINT) AS q
            FROM grid),
    cu AS (SELECT b, max(p) AS p, max(q) AS q FROM cum
           GROUP BY b),
    exact AS (SELECT CAST(sum(abs(p * (SELECT n1 FROM tot)
                                  - q * (SELECT n0 FROM tot)))
                          AS HUGEINT) AS w
              FROM cu WHERE b < 9)
    SELECT CAST((SELECT n0 FROM tot) AS BIGINT) AS n_first,
           CAST((SELECT n1 FROM tot) AS BIGINT) AS n_second,
           CAST((SELECT w FROM exact) AS DOUBLE)
           / (CAST((SELECT n0 FROM tot) AS DOUBLE)
              * CAST((SELECT n1 FROM tot) AS DOUBLE))
             AS exact_ot_buckets""")
def exact_ot_drift(sf_dir: str):
    """EXACT 1-D OPTIMAL TRANSPORT between the first- and
    second-half daily-revenue bucket distributions (10 equal
    revenue buckets): the earth-mover distance via the CDF
    identity W1 = sum_b |F(b) - G(b)| — computed with the exact
    integer cross-multiplication p*n1 - q*n0, so the whole
    distance is one division of an exact big int (the unit-cost
    transport problem solved in closed form; wasserstein_1d does
    the value-domain version, this is the bucketized drift gauge
    regime monitoring actually deploys as a PSI upgrade). Bucket
    edges come from the exact integer max; censuses fold exactly.
    Scale plan: bounded (era, bucket) combine; the CDF walk is
    O(buckets)."""
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
    days = [int(x) for x in d["day"]]
    vs = [int(x) for x in d["v"]]
    mn, mx = min(days), max(days)
    vmax = max(vs)
    cnt = {}
    for day, v in zip(days, vs):
        era = 0 if day - mn <= (mx - mn) // 2 else 1
        b = min(v * 10 // (vmax + 1), 9)
        cnt[(era, b)] = cnt.get((era, b), 0) + 1
    n0 = sum(c for (e, _), c in cnt.items() if e == 0)
    n1 = sum(c for (e, _), c in cnt.items() if e == 1)
    w = 0
    p = q = 0
    for b in range(9):
        p += cnt.get((0, b), 0)
        q += cnt.get((1, b), 0)
        w += abs(p * n1 - q * n0)
    return pd.DataFrame({
        "n_first": [np.int64(n0)], "n_second": [np.int64(n1)],
        "exact_ot_buckets": [np.float64(w)
                             / (np.float64(n0)
                                * np.float64(n1))]})


@register("obrien_fleming", sql="""
    WITH day AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                          AS day,
                        CAST(sum(CASE WHEN user_id % 2 = 1
                                      AND event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                          AS s1,
                        CAST(sum(CASE WHEN user_id % 2 = 0
                                      AND event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                          AS s0
                 FROM events GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM day),
    x AS (SELECT day, s1, s0,
                 CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i
          FROM day),
    looks AS (SELECT CAST(k.k AS BIGINT) AS look,
                     ((SELECT n FROM t) * k.k) // 4 AS cut,
                     CASE k.k WHEN 1 THEN {b1} WHEN 2 THEN {b2}
                          WHEN 3 THEN {b3} ELSE {b4} END
                       AS bound_micro
              FROM (VALUES (1), (2), (3), (4)) k(k)),
    z AS (SELECT looks.look, looks.bound_micro,
                 CAST(sum(x.s1 - x.s0) AS HUGEINT) AS dsum,
                 CAST(sum(x.s1 + x.s0) AS HUGEINT) AS tsum
          FROM looks JOIN x ON x.i <= looks.cut
          GROUP BY 1, 2),
    r AS (SELECT look, bound_micro,
                 CAST(dsum AS DOUBLE)
                 / sqrt(CAST(tsum AS DOUBLE)) AS zstat
          FROM z)
    SELECT look,
           CAST(bound_micro AS DOUBLE) / 1000000.0
             AS obf_bound,
           zstat,
           CAST(CASE WHEN abs(zstat) * 1000000.0
                          >= CAST(bound_micro AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS crossed
    FROM r ORDER BY look""".format(b1=_OBF[0], b2=_OBF[1],
                                   b3=_OBF[2], b4=_OBF[3]))
def obrien_fleming(sf_dir: str):
    """O'BRIEN-FLEMING GROUP-SEQUENTIAL REPLAY of the arm
    purchase-difference test at four equally spaced interim looks
    (day-index quartiles): the cumulative-difference z against
    the conservative early boundaries 4.33/3.06/2.50/2.17 — the
    regulated-trial machinery (spend almost no alpha early, keep
    ~2 at the end) that sprt_ab's always-on boundary trades
    against; the 'crossed' column is the audit trail of when the
    experiment COULD have stopped. Look cutoffs are exact integer
    ranks; cumulative sums are exact; each z and the boundary
    comparison are shared float expressions against the same
    micro-integer boundary literals. Scale plan: bounded
    day-domain combine; the four looks are prefix scans."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        arm = b["user_id"].to_numpy(np.int64) % 2
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "s1": ((arm == 1) & (pur == 1)).astype(np.int64),
            "s0": ((arm == 0) & (pur == 1)).astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        for c in ("s1", "s0"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["s1", "s0"], exact_int=True).sort_values("day")
    s1 = [int(x) for x in d["s1"]]
    s0 = [int(x) for x in d["s0"]]
    n = len(s1)
    rows = []
    for k in range(1, 5):
        cut = n * k // 4
        dsum = sum(s1[:cut]) - sum(s0[:cut])
        tsum = sum(s1[:cut]) + sum(s0[:cut])
        z = np.float64(dsum) / np.sqrt(np.float64(tsum))
        bound = _OBF[k - 1]
        rows.append((k, np.float64(bound) / 1000000.0, z,
                     1 if abs(z) * 1000000.0
                     >= np.float64(bound) else 0))
    return pd.DataFrame({
        "look": np.array([r[0] for r in rows], np.int64),
        "obf_bound": np.array([r[1] for r in rows], np.float64),
        "zstat": np.array([r[2] for r in rows], np.float64),
        "crossed": np.array([r[3] for r in rows], np.int64)})


@register("bernoulli_cusum", sql="""
    WITH u AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      user_id,
                      CAST(max(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY 1, 2),
    d AS (SELECT day, CAST(sum(p) AS BIGINT) AS s,
                 CAST(count(*) AS BIGINT) AS t
          FROM u GROUP BY day),
    l AS (SELECT day,
                 CAST(s * {ls} + (t - s) * {lf} AS BIGINT)
                   AS llr
          FROM d),
    c AS (SELECT day,
                 CAST(sum(llr) OVER (ORDER BY day) AS HUGEINT)
                   AS cum
          FROM l),
    ph AS (SELECT day,
                  cum - least(CAST(0 AS HUGEINT),
                              min(cum) OVER (ORDER BY day))
                    AS stat
           FROM c),
    w AS (SELECT day, stat FROM ph
          ORDER BY stat DESC, day LIMIT 1)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
           (SELECT day FROM w) AS peak_day,
           CAST((SELECT stat FROM w) AS DOUBLE) / 1000000.0
             AS max_llr,
           CAST(CASE WHEN (SELECT stat FROM w) >= 3000000
                THEN 1 ELSE 0 END AS BIGINT)
             AS alarm_at_3""".format(ls=_BC_S, lf=_BC_F))
def bernoulli_cusum(sf_dir: str):
    """BERNOULLI CUSUM on the daily user-conversion stream,
    testing a rate lift from 20% to 25%: each day adds its exact
    binomial log-likelihood-ratio s*ln(1.25) + (t-s)*ln(0.9375)
    (the two micro-integer literals shared by both engines), and
    the one-sided CUSUM again unrolls via the prefix-minimum
    identity — the SPC tool for RATES (cusum_peak watches a
    continuous level; this is the sequential detector Wald-optimal
    for a specified Bernoulli shift, with the textbook alarm at
    h = 3 nats). Daily (successes, trials) are exact integers
    from the user-day census; the whole path is exact integer
    arithmetic. Scale plan: (day, user) exchange into the bounded
    day combine; the scan is O(days) driver work."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        return pd.DataFrame({
            "day": day,
            "user_id": b["user_id"].to_numpy(np.int64),
            "p": pur}).groupby(["day", "user_id"],
                               as_index=False).max()

    from ...stages.partition import partition_map

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["day", "user_id"], as_index=False)["p"] \
            .max()
        out = a.groupby("day", as_index=False).agg(
            s=("p", "sum"), t=("p", "size"))
        for c in ("s", "t"):
            out[c] = out[c].astype(np.int64)
        return out

    d = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["day", "user_id"], cells, 16),
        ["day"], ["s", "t"]).sort_values("day")
    cum = 0
    mn = 0
    best = None
    for _, r in d.iterrows():
        day, s, t = int(r["day"]), int(r["s"]), int(r["t"])
        cum += s * _BC_S + (t - s) * _BC_F
        mn = min(mn, cum)
        stat = cum - min(0, mn)
        if best is None or stat > best[1]:
            best = (day, stat)
    return pd.DataFrame({
        "n_days": [np.int64(len(d))],
        "peak_day": [np.int64(best[0])],
        "max_llr": [np.float64(best[1]) / 1000000.0],
        "alarm_at_3": [np.int64(1 if best[1] >= 3000000
                                else 0)]})
