# round-5 session-5 additions, batch 58: revenue pacing milestones
# per year, the median quantile treatment effect between arms, and
# the ABC class migration matrix.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_AB_Y0, _AB_Y1 = 1996, 1997


@register("revenue_pacing", sql="""
    WITH d AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                      CAST(dayofyear(o_orderdate) AS BIGINT)
                        AS doy,
                      CAST(sum(CAST(floor(o_totalprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS v
               FROM orders GROUP BY 1, 2),
    t AS (SELECT y, CAST(sum(v) AS HUGEINT) AS tot
          FROM d GROUP BY y),
    c AS (SELECT d.y, d.doy,
                 CAST(sum(d.v) OVER (PARTITION BY d.y
                      ORDER BY d.doy) AS HUGEINT) AS cum,
                 t.tot
          FROM d JOIN t ON t.y = d.y),
    q AS (SELECT y,
                 CAST(min(CASE WHEN cum * 4 >= tot THEN doy END)
                      AS BIGINT) AS q1_day,
                 CAST(min(CASE WHEN cum * 2 >= tot THEN doy END)
                      AS BIGINT) AS q2_day,
                 CAST(min(CASE WHEN cum * 4 >= tot * 3 THEN doy
                          END) AS BIGINT) AS q3_day
          FROM c GROUP BY y)
    SELECT y AS year, q1_day, q2_day, q3_day
    FROM q ORDER BY y""")
def revenue_pacing(sf_dir: str):
    """REVENUE PACING MILESTONES per year: the day-of-year when
    cumulative revenue first reaches 25 / 50 / 75% of the year's
    total — the pacing curve finance tracks against plan, and a
    seasonality fingerprint (a Q4-heavy business hits its median
    day late; compare dow_index's weekly shape). Every milestone
    test is the EXACT integer cross-multiplication cum*4 >= tot*k
    on exact-cent prefix sums — no percentage float can misplace
    a milestone day. Scale plan: (year, day) cells through the
    bounded calendar-domain combine; prefix scans are O(days)
    driver work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["o_orderdate"].dt.year.to_numpy(np.int64)
        doy = b["o_orderdate"].dt.dayofyear.to_numpy(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"y": y, "doy": doy, "v": cents}) \
            .groupby(["y", "doy"], as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["y", "doy"], ["v"], exact_int=True)
    rows = []
    for y, g in d.groupby("y"):
        g = g.sort_values("doy")
        doy = g["doy"].to_numpy(np.int64)
        v = [int(x) for x in g["v"]]
        tot = sum(v)
        cum = 0
        q1 = q2 = q3 = None
        for dy, vv in zip(doy, v):
            cum += vv
            if q1 is None and cum * 4 >= tot:
                q1 = int(dy)
            if q2 is None and cum * 2 >= tot:
                q2 = int(dy)
            if q3 is None and cum * 4 >= tot * 3:
                q3 = int(dy)
        rows.append({"year": np.int64(int(y)),
                     "q1_day": np.int64(q1),
                     "q2_day": np.int64(q2),
                     "q3_day": np.int64(q3)})
    return pd.DataFrame(rows).sort_values(
        "year", kind="mergesort").reset_index(drop=True)


@register("qte_median", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      CAST(count(*) FILTER (
                          event_type = 'purchase') AS BIGINT)
                        AS pc
               FROM events GROUP BY user_id),
    h AS (SELECT arm, pc, CAST(count(*) AS BIGINT) AS c
          FROM u GROUP BY arm, pc),
    t AS (SELECT arm, CAST(sum(c) AS BIGINT) AS n
          FROM h GROUP BY arm),
    r AS (SELECT h.arm, h.pc, h.c,
                 CAST(sum(h.c) OVER (PARTITION BY h.arm
                      ORDER BY h.pc) AS BIGINT) AS cum,
                 t.n
          FROM h JOIN t ON t.arm = h.arm),
    med AS (SELECT arm,
                   CAST(min(CASE WHEN cum * 2 >= n THEN pc END)
                        AS BIGINT) AS median_pc
            FROM r GROUP BY arm)
    SELECT (SELECT n FROM t WHERE arm = 0) AS n_control,
           (SELECT n FROM t WHERE arm = 1) AS n_treatment,
           (SELECT median_pc FROM med WHERE arm = 0)
             AS median_control,
           (SELECT median_pc FROM med WHERE arm = 1)
             AS median_treatment,
           (SELECT median_pc FROM med WHERE arm = 1)
           - (SELECT median_pc FROM med WHERE arm = 0)
             AS qte_median""")
def qte_median(sf_dir: str):
    """MEDIAN QUANTILE TREATMENT EFFECT between the user-parity
    arms on per-user purchase counts: the difference of the two
    arm MEDIANS (lower medians via the exact cum*2 >= n integer
    test on per-arm count histograms) — the distributional effect
    that survives when a few whales make the mean difference
    meaningless (the robust companion to ab_test/paired_t's mean
    contrasts). Everything is exact integers: per-user counts, arm
    histograms, the median tests and the difference. Scale plan:
    per-user counts fold through one user exchange into bounded
    per-arm value histograms; median reads are O(domain) driver
    work."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "pc": (b["event_type"].to_numpy(object)
                   == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["pc"].sum()
        arm = (a["user_id"].to_numpy(np.int64) % 2)
        out = pd.DataFrame({
            "arm": arm.astype(np.int64),
            "pc": a["pc"].to_numpy(np.int64),
            "c": np.ones(len(a), np.int64)}) \
            .groupby(["arm", "pc"], as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["arm", "pc"], ["c"])
    res = {}
    for arm, g in h.groupby("arm"):
        g = g.sort_values("pc")
        c = g["c"].to_numpy(np.int64)
        pc = g["pc"].to_numpy(np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        med = int(pc[(cum * 2 >= n).argmax()])
        res[int(arm)] = (n, med)
    return pd.DataFrame({
        "n_control": [np.int64(res[0][0])],
        "n_treatment": [np.int64(res[1][0])],
        "median_control": [np.int64(res[0][1])],
        "median_treatment": [np.int64(res[1][1])],
        "qte_median": [np.int64(res[1][1] - res[0][1])]})


@register("abc_migration", sql="""
    WITH li AS (SELECT l_partkey AS pk,
                       CAST(year(l_shipdate) AS BIGINT) AS y,
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT) AS r
                FROM lineitem
                WHERE year(l_shipdate) IN ({y0}, {y1})),
    p AS (SELECT pk, y, CAST(sum(r) AS BIGINT) AS rev
          FROM li GROUP BY pk, y),
    t AS (SELECT y, CAST(sum(rev) AS HUGEINT) AS tot
          FROM p GROUP BY y),
    c AS (SELECT p.pk, p.y, p.rev,
                 CAST(sum(p.rev) OVER (PARTITION BY p.y
                      ORDER BY p.rev DESC, p.pk) - p.rev
                      AS HUGEINT) AS cb,
                 t.tot
          FROM p JOIN t ON t.y = p.y),
    cls AS (SELECT pk, y,
                   CASE WHEN cb * 100 < tot * 70 THEN 'A'
                        WHEN cb * 100 < tot * 90 THEN 'B'
                        ELSE 'C' END AS cls
            FROM c),
    mig AS (SELECT a.cls AS cls0, b.cls AS cls1,
                   CAST(count(*) AS BIGINT) AS n_parts
            FROM cls a JOIN cls b ON a.pk = b.pk
            WHERE a.y = {y0} AND b.y = {y1}
            GROUP BY 1, 2)
    SELECT cls0 AS class_{y0}, cls1 AS class_{y1}, n_parts
    FROM mig ORDER BY cls0, cls1""".format(y0=_AB_Y0, y1=_AB_Y1))
def abc_migration(sf_dir: str):
    """ABC CLASS MIGRATION MATRIX between ship years {y0} -> {y1}:
    each part classified by the cumulative-revenue ladder in BOTH
    years (abc_class/abc_xyz's exact integer thresholds,
    cb*100 < tot*70/90), cross-tabulated — the churn-of-importance
    census that tells planners how sticky the A-list actually is
    (graph_drift for the classification world). Per-year rankings,
    thresholds and the migration counts are pure integers. Scale
    plan: per-(part, year) revenue cells; the two cumulative
    ladders are the two-phase rank exchange at fleet scale; the
    3x3 matrix folds from one co-partition of the two years by
    part."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_shipdate"].dt.year.to_numpy(np.int64)
        m = (y == _AB_Y0) | (y == _AB_Y1)
        r = np.floor(
            b["l_extendedprice"].to_numpy(np.float64)[m] * 100
            + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64)[m],
            "y": y[m], "rev": r}) \
            .groupby(["pk", "y"], as_index=False).sum()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk", "y"], ["rev"], exact_int=True)
    cls = {}
    for y, g in p.groupby("y"):
        g = g.assign(rev_int=g["rev"].map(int)).sort_values(
            ["rev_int", "pk"], ascending=[False, True],
            kind="mergesort")
        tot = sum(g["rev_int"])
        cb = 0
        for _, r in g.iterrows():
            rev = int(r["rev_int"])
            if cb * 100 < tot * 70:
                c = "A"
            elif cb * 100 < tot * 90:
                c = "B"
            else:
                c = "C"
            cls[(int(r["pk"]), int(y))] = c
            cb += rev
    mig: dict = {}
    for (pk, y), c in cls.items():
        if y == _AB_Y0 and (pk, _AB_Y1) in cls:
            key = (c, cls[(pk, _AB_Y1)])
            mig[key] = mig.get(key, 0) + 1
    rows = [{"class_%d" % _AB_Y0: k[0],
             "class_%d" % _AB_Y1: k[1],
             "n_parts": np.int64(v)}
            for k, v in sorted(mig.items())]
    return pd.DataFrame(rows)
