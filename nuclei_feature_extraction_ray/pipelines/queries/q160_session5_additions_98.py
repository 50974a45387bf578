# round-5 session-5 additions, batch 98: the Stuart-Maxwell
# marginal-homogeneity test, VIKOR compromise ranking of parts, and
# Page's ordered trend test.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partitioned_apply, partition_map


@register("stuart_maxwell", sql="""
    WITH o AS (SELECT user_id, ts, event_id, event_type,
                      row_number() OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS rn,
                      count(*) OVER (PARTITION BY user_id) AS m
               FROM events),
    fl AS (SELECT user_id,
                  max(CASE WHEN rn = 1 THEN
                      CASE event_type WHEN 'click' THEN 0
                           WHEN 'view' THEN 1 ELSE 2 END END)
                    AS a,
                  max(CASE WHEN rn = m THEN
                      CASE event_type WHEN 'click' THEN 0
                           WHEN 'view' THEN 1 ELSE 2 END END)
                    AS b
           FROM o GROUP BY user_id),
    ct AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n
           FROM fl GROUP BY a, b),
    cell AS (SELECT CAST(ga.a AS BIGINT) AS a,
                    CAST(gb.b AS BIGINT) AS b,
                    CAST(COALESCE((SELECT n FROM ct
                                   WHERE ct.a = ga.a
                                     AND ct.b = gb.b), 0)
                         AS BIGINT) AS n
             FROM (VALUES (0), (1), (2)) ga(a)
             CROSS JOIN (VALUES (0), (1), (2)) gb(b)),
    mg AS (SELECT
        (SELECT sum(n) FROM cell WHERE a = 0) AS r0,
        (SELECT sum(n) FROM cell WHERE a = 1) AS r1,
        (SELECT sum(n) FROM cell WHERE b = 0) AS c0,
        (SELECT sum(n) FROM cell WHERE b = 1) AS c1,
        (SELECT n FROM cell WHERE a = 0 AND b = 0) AS n00,
        (SELECT n FROM cell WHERE a = 1 AND b = 1) AS n11,
        (SELECT n FROM cell WHERE a = 0 AND b = 1) AS n01,
        (SELECT n FROM cell WHERE a = 1 AND b = 0) AS n10),
    v AS (SELECT CAST(r0 - c0 AS HUGEINT) AS d0,
                 CAST(r1 - c1 AS HUGEINT) AS d1,
                 CAST(r0 + c0 - 2 * n00 AS HUGEINT) AS v00,
                 CAST(r1 + c1 - 2 * n11 AS HUGEINT) AS v11,
                 CAST(-(n01 + n10) AS HUGEINT) AS v01
          FROM mg)
    SELECT CAST((SELECT sum(n) FROM cell) AS BIGINT) AS n_users,
           CAST(d0 * d0 * v11 - 2 * d0 * d1 * v01
                + d1 * d1 * v00 AS DOUBLE)
           / CAST(v00 * v11 - v01 * v01 AS DOUBLE)
             AS stuart_maxwell_chi2
    FROM v""")
def stuart_maxwell(sf_dir: str):
    """STUART-MAXWELL MARGINAL-HOMOGENEITY TEST on each user's
    first-versus-last event type (click / view / other): did the
    population's category mix SHIFT between entry and exit? The
    k-category generalization of mcnemar_test (which this
    collapses to at k = 2), computed in closed form for k = 3:
    chi2 = d' V^-1 d with d the two marginal differences and V
    the Stuart covariance — every entry of d and V is an exact
    integer from the 3x3 transition census, and the 2x2 inverse
    makes chi2 ONE division of exact big ints. Scale plan: one
    user exchange extracts (first, last) pairs (partition-local
    ordering); the census is a bounded 9-cell combine."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id",
                          "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        cat = {"click": 0, "view": 1}
        u = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        first = {}
        last = {}
        for uid, t in zip(u, et):
            c = cat.get(t, 2)
            if uid not in first:
                first[uid] = c
            last[uid] = c
        out = {}
        for uid in first:
            key = (first[uid], last[uid])
            out[key] = out.get(key, 0) + 1
        ks = sorted(out)
        return pd.DataFrame({
            "a": np.array([k[0] for k in ks], np.int64),
            "b": np.array([k[1] for k in ks], np.int64),
            "n": np.array([out[k] for k in ks], np.int64)})

    ct = _combine_partials(
        partitioned_apply(ds, "user_id", fn, 16,
                          sort_cols=["user_id", "ts",
                                     "event_id"]),
        ["a", "b"], ["n"])
    cell = {(int(r["a"]), int(r["b"])): int(r["n"])
            for _, r in ct.iterrows()}
    n = sum(cell.values())
    r = [sum(v for (a, _), v in cell.items() if a == i)
         for i in range(3)]
    c = [sum(v for (_, b), v in cell.items() if b == i)
         for i in range(3)]
    d0 = r[0] - c[0]
    d1 = r[1] - c[1]
    v00 = r[0] + c[0] - 2 * cell.get((0, 0), 0)
    v11 = r[1] + c[1] - 2 * cell.get((1, 1), 0)
    v01 = -(cell.get((0, 1), 0) + cell.get((1, 0), 0))
    chi2 = np.float64(d0 * d0 * v11 - 2 * d0 * d1 * v01
                      + d1 * d1 * v00) \
        / np.float64(v00 * v11 - v01 * v01)
    return pd.DataFrame({
        "n_users": [np.int64(n)],
        "stuart_maxwell_chi2": [np.float64(chi2)]})


@register("vikor_parts", sql="""
    WITH p AS (SELECT l_partkey,
                      CAST(sum(CAST(floor(l_extendedprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS rev,
                      CAST(sum(CAST(l_quantity AS BIGINT))
                           AS BIGINT) AS qty,
                      CAST(count(DISTINCT l_orderkey) AS BIGINT)
                        AS ords
               FROM lineitem GROUP BY 1),
    b AS (SELECT max(rev) AS rmx, min(rev) AS rmn,
                 max(qty) AS qmx, min(qty) AS qmn,
                 max(ords) AS omx, min(ords) AS omn
          FROM p),
    q AS (SELECT l_partkey,
                 (CASE WHEN (SELECT rmx FROM b)
                            > (SELECT rmn FROM b)
                  THEN ((SELECT rmx FROM b) - rev) * 1000000
                       // ((SELECT rmx FROM b)
                           - (SELECT rmn FROM b))
                  ELSE 0 END)
                 + (CASE WHEN (SELECT qmx FROM b)
                              > (SELECT qmn FROM b)
                    THEN ((SELECT qmx FROM b) - qty) * 1000000
                         // ((SELECT qmx FROM b)
                             - (SELECT qmn FROM b))
                    ELSE 0 END)
                 + (CASE WHEN (SELECT omx FROM b)
                              > (SELECT omn FROM b)
                    THEN ((SELECT omx FROM b) - ords) * 1000000
                         // ((SELECT omx FROM b)
                             - (SELECT omn FROM b))
                    ELSE 0 END) AS s3,
                 greatest(
                   CASE WHEN (SELECT rmx FROM b)
                             > (SELECT rmn FROM b)
                   THEN ((SELECT rmx FROM b) - rev) * 1000000
                        // ((SELECT rmx FROM b)
                            - (SELECT rmn FROM b))
                   ELSE 0 END,
                   CASE WHEN (SELECT qmx FROM b)
                             > (SELECT qmn FROM b)
                   THEN ((SELECT qmx FROM b) - qty) * 1000000
                        // ((SELECT qmx FROM b)
                            - (SELECT qmn FROM b))
                   ELSE 0 END,
                   CASE WHEN (SELECT omx FROM b)
                             > (SELECT omn FROM b)
                   THEN ((SELECT omx FROM b) - ords) * 1000000
                        // ((SELECT omx FROM b)
                            - (SELECT omn FROM b))
                   ELSE 0 END) AS r3
          FROM p),
    sb AS (SELECT max(s3) AS smx, min(s3) AS smn,
                  max(r3) AS rmx, min(r3) AS rmn
           FROM q),
    fq AS (SELECT l_partkey, s3, r3,
                  (CASE WHEN (SELECT smx FROM sb)
                             > (SELECT smn FROM sb)
                   THEN (s3 - (SELECT smn FROM sb)) * 500000
                        // ((SELECT smx FROM sb)
                            - (SELECT smn FROM sb))
                   ELSE 0 END)
                  + (CASE WHEN (SELECT rmx FROM sb)
                               > (SELECT rmn FROM sb)
                     THEN (r3 - (SELECT rmn FROM sb)) * 500000
                          // ((SELECT rmx FROM sb)
                              - (SELECT rmn FROM sb))
                     ELSE 0 END) AS qmicro
           FROM q)
    SELECT CAST(l_partkey AS BIGINT) AS part,
           CAST(qmicro AS BIGINT) AS vikor_q_micro,
           CAST(s3 AS BIGINT) AS s_micro3,
           CAST(r3 AS BIGINT) AS r_micro
    FROM fq ORDER BY qmicro, part LIMIT 5""")
def vikor_parts(sf_dir: str):
    """VIKOR COMPROMISE RANKING of parts on three benefit
    criteria (revenue, quantity, distinct orders, equal weights):
    S (total regret), R (maximal single-criterion regret), and
    the Q = 0.5-blend of both normalized — the
    multi-criteria method that, unlike topsis_parts' single
    distance-to-ideal, explicitly balances GROUP utility against
    the WORST criterion, so its top-5 flags parts that are good
    everywhere rather than spectacular somewhere. Every
    normalized regret is an exact integer floor-division to
    micro units; S, R, Q and the (Q, part) ranking are pure
    integer arithmetic (degenerate criteria contribute exactly
    zero by the same CASE on both engines). Scale plan:
    part-keyed combine (bounded domain); the min/max scans and
    ranking are the two-phase exchanges at fleet scale."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_quantity", "l_orderkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "rev": np.floor(b["l_extendedprice"]
                            .to_numpy(np.float64) * 100 + 0.5)
            .astype(np.int64),
            "qty": b["l_quantity"].to_numpy(np.float64)
            .astype(np.int64)})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("l_partkey").agg(
            rev=("rev", "sum"), qty=("qty", "sum"),
            ords=("l_orderkey", "nunique")).reset_index()
        for c in ("rev", "qty", "ords"):
            a[c] = a[c].astype(np.int64)
        return a

    p = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], cells, 16).to_pandas()
    rev = [int(x) for x in p["rev"]]
    qty = [int(x) for x in p["qty"]]
    ords = [int(x) for x in p["ords"]]
    keys = [int(x) for x in p["l_partkey"]]

    def regret(vals):
        mx, mn = max(vals), min(vals)
        if mx == mn:
            return [0] * len(vals)
        return [(mx - v) * 1000000 // (mx - mn) for v in vals]

    qr = regret(rev)
    qq = regret(qty)
    qo = regret(ords)
    s3 = [a + b + c for a, b, c in zip(qr, qq, qo)]
    r3 = [max(a, b, c) for a, b, c in zip(qr, qq, qo)]
    smx, smn = max(s3), min(s3)
    rmx, rmn = max(r3), min(r3)
    rows = []
    for i, key in enumerate(keys):
        qm = 0
        if smx > smn:
            qm += (s3[i] - smn) * 500000 // (smx - smn)
        if rmx > rmn:
            qm += (r3[i] - rmn) * 500000 // (rmx - rmn)
        rows.append((qm, key, s3[i], r3[i]))
    rows.sort()
    rows = rows[:5]
    return pd.DataFrame({
        "part": np.array([r[1] for r in rows], np.int64),
        "vikor_q_micro": np.array([r[0] for r in rows],
                                  np.int64),
        "s_micro3": np.array([r[2] for r in rows], np.int64),
        "r_micro": np.array([r[3] for r in rows], np.int64)})


@register("page_trend_test", sql="""
    WITH c AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(o_custkey % 4 AS BIGINT) AS seg,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1, 2),
    days AS (SELECT DISTINCT day FROM c),
    grid AS (SELECT d.day, CAST(s.seg AS BIGINT) AS seg
             FROM days d CROSS JOIN (VALUES (0), (1), (2), (3))
                  s(seg)),
    f AS (SELECT g.day, g.seg, COALESCE(c.v, 0) AS v
          FROM grid g LEFT JOIN c
            ON c.day = g.day AND c.seg = g.seg),
    r AS (SELECT seg,
                 CAST(row_number() OVER (PARTITION BY day
                          ORDER BY v, seg) AS BIGINT) AS rk
          FROM f),
    rs AS (SELECT seg, CAST(sum(rk) AS HUGEINT) AS rj
           FROM r GROUP BY seg),
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM days),
    l AS (SELECT CAST(sum((seg + 1) * rj) AS HUGEINT) AS lstat
          FROM rs)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_blocks,
           CAST((SELECT lstat FROM l) AS BIGINT) AS page_l,
           (CAST((SELECT lstat FROM l) AS DOUBLE)
            - CAST((SELECT n FROM t) AS DOUBLE) * 4.0 * 5.0
              * 5.0 / 4.0)
           / sqrt(CAST((SELECT n FROM t) AS DOUBLE)
                  * 4.0 * 4.0 * (4.0 + 1.0)
                  * (4.0 * 4.0 - 1.0) * (4.0 + 1.0) / 144.0)
             AS page_z""")
def page_trend_test(sf_dir: str):
    """PAGE'S TREND TEST for an ORDERED alternative across the
    four customer segments (custkey mod 4, blocked by day): L =
    sum_j j * R_j over within-day ranks — where friedman_test
    asks 'are the segments different AT ALL', Page asks 'do they
    increase IN THE HYPOTHESIZED ORDER', buying real power when
    the ordering (here segment index) is meaningful. Ranks and L
    are exact integers on the same deterministic (value, segment)
    tie-break grid as Friedman; the normal approximation z uses
    the closed-form mean kn(k+1)^2/4 and variance
    nk^2(k+1)(k^2-1)/144 as one shared float expression. Scale
    plan: (day, seg) combine on a bounded grid; ranking is
    O(days) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_custkey",
                                  "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        seg = b["o_custkey"].to_numpy(np.int64) % 4
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "seg": seg, "v": cents}) \
            .groupby(["day", "seg"], as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day", "seg"], ["v"], exact_int=True)
    cells = {(int(r["day"]), int(r["seg"])): int(r["v"])
             for _, r in c.iterrows()}
    days_ = sorted(set(d for d, _ in cells))
    rj = [0, 0, 0, 0]
    for d in days_:
        order = sorted(range(4),
                       key=lambda s: (cells.get((d, s), 0), s))
        for rk, s in enumerate(order, start=1):
            rj[s] += rk
    n = len(days_)
    lstat = sum((j + 1) * rj[j] for j in range(4))
    mean = np.float64(n) * 4.0 * 5.0 * 5.0 / 4.0
    var = np.float64(n) * 4.0 * 4.0 * (4.0 + 1.0) \
        * (4.0 * 4.0 - 1.0) * (4.0 + 1.0) / 144.0
    z = (np.float64(lstat) - mean) / np.sqrt(var)
    return pd.DataFrame({
        "n_blocks": [np.int64(n)],
        "page_l": [np.int64(lstat)],
        "page_z": [np.float64(z)]})
