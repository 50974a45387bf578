# round-5 session-5 additions, batch 89: distance correlation,
# one-lag Granger causality, and the fixed-frequency weekly
# spectrum.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q150_session5_additions_88 import _DAILY_PAIR_SQL, _daily_pair


@register("distance_correlation", sql="""
    WITH """ + _DAILY_PAIR_SQL + """,
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM d),
    p AS (SELECT abs(a.x - b.x) AS dx,
                 CAST(abs(a.y - b.y) AS HUGEINT) AS dy
          FROM d a JOIN d b ON TRUE),
    rs AS (SELECT a.day,
                  CAST(sum(abs(a.x - b.x)) AS HUGEINT) AS ax,
                  CAST(sum(abs(a.y - b.y)) AS HUGEINT) AS ay
           FROM d a JOIN d b ON TRUE GROUP BY a.day),
    m AS (SELECT
        (SELECT CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT)
         FROM p) AS sab,
        (SELECT CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT)
         FROM p) AS saa,
        (SELECT CAST(sum(dy * dy) AS HUGEINT) FROM p) AS sbb,
        (SELECT CAST(sum(ax * ay) AS HUGEINT) FROM rs) AS sarbr,
        (SELECT CAST(sum(ax * ax) AS HUGEINT) FROM rs) AS sarar,
        (SELECT CAST(sum(ay * ay) AS HUGEINT) FROM rs) AS sbrbr,
        (SELECT CAST(sum(ax) AS HUGEINT) FROM rs) AS sa,
        (SELECT CAST(sum(ay) AS HUGEINT) FROM rs) AS sb),
    v AS (SELECT
        CAST(sab AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE))
        + CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE))
        - 2.0 * CAST(sarbr AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)) AS dcov2,
        CAST(saa AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE))
        + CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE))
        - 2.0 * CAST(sarar AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)) AS dvarx,
        CAST(sbb AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE))
        + CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE))
        - 2.0 * CAST(sbrbr AS DOUBLE)
          / (CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)
             * CAST((SELECT n FROM t) AS DOUBLE)) AS dvary
          FROM m)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_days,
           sqrt(dcov2 / sqrt(dvarx * dvary)) AS dcor
    FROM v""")
def distance_correlation(sf_dir: str):
    """DISTANCE CORRELATION (Szekely-Rizzo) between daily order
    count and daily revenue: dCov^2 = S1/n^2 + S2/n^4 - 2*S3/n^3
    over pairwise L1 distances — the dependence coefficient that
    is ZERO IF AND ONLY IF the two series are independent
    (Pearson misses nonlinear, chatterjee_xi is asymmetric; dCor
    is the symmetric omnibus). Every building block — the full
    pairwise distance-product sum, the row-sum products, the
    grand sums — is an EXACT integer (distances are integer
    counts/cents; engine folds big products with python ints),
    and dCor is one shared float expression. Scale plan: bounded
    day-domain combine; the O(n^2) pair sums are driver work on
    the day table (at fleet scale the pair sums tile into
    map_batches blocks)."""
    d = _daily_pair(sf_dir)
    n = len(d)
    xa = np.array([r[1] for r in d], np.int64)
    ya = np.array([r[2] for r in d], np.int64)
    def rowsums(vals):
        # ax_i = sum_j |v_i - v_j| via the sorted-prefix identity
        # v_i*(2k - n) - 2*P_k + P_n (exact python ints)
        order = np.argsort(vals, kind="mergesort")
        out = [0] * n
        pref = 0
        tot = int(vals.sum())
        for k, idx in enumerate(order, start=1):
            v = int(vals[idx])
            pref += v
            out[idx] = v * (2 * k - n) - 2 * pref + tot
        return out

    ax = rowsums(xa)
    ay = rowsums(ya)
    # closed forms: sum_ij (v_i - v_j)^2 = 2n*sum v^2 - 2*(sum v)^2
    sx1 = sum(int(v) for v in xa)
    sy1 = sum(int(v) for v in ya)
    sx2 = sum(int(v) * int(v) for v in xa)
    sy2 = sum(int(v) * int(v) for v in ya)
    saa = 2 * n * sx2 - 2 * sx1 * sx1
    sbb = 2 * n * sy2 - 2 * sy1 * sy1
    # only the cross term needs the pairwise pass; per-row int64
    # products (<= ~4e12 each) sum safely below 2^63 per row, the
    # cross-row accumulation is python-int exact
    sab = 0
    for i in range(n):
        dx = np.abs(xa[i] - xa)
        dy = np.abs(ya[i] - ya)
        sab += int((dx * dy).sum())
    sarbr = sum(a * b for a, b in zip(ax, ay))
    sarar = sum(a * a for a in ax)
    sbrbr = sum(b * b for b in ay)
    sa = sum(ax)
    sb = sum(ay)
    nf = np.float64(n)
    dcov2 = np.float64(sab) / (nf * nf) \
        + np.float64(sa) * np.float64(sb) / (nf * nf * nf * nf) \
        - 2.0 * np.float64(sarbr) / (nf * nf * nf)
    dvarx = np.float64(saa) / (nf * nf) \
        + np.float64(sa) * np.float64(sa) / (nf * nf * nf * nf) \
        - 2.0 * np.float64(sarar) / (nf * nf * nf)
    dvary = np.float64(sbb) / (nf * nf) \
        + np.float64(sb) * np.float64(sb) / (nf * nf * nf * nf) \
        - 2.0 * np.float64(sbrbr) / (nf * nf * nf)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "dcor": [np.sqrt(dcov2 / np.sqrt(dvarx * dvary))]})


@register("granger_1lag", sql="""
    WITH """ + _DAILY_PAIR_SQL + """,
    z AS (SELECT day, y,
                 lag(y) OVER (ORDER BY day) AS yl,
                 lag(x) OVER (ORDER BY day) AS xl
          FROM d),
    w AS (SELECT CAST(y AS HUGEINT) AS y,
                 CAST(yl AS HUGEINT) AS yl,
                 CAST(xl AS HUGEINT) AS xl
          FROM z WHERE yl IS NOT NULL),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(yl) AS HUGEINT) AS sl,
                 CAST(sum(xl) AS HUGEINT) AS sx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(y * yl) AS HUGEINT) AS syl,
                 CAST(sum(y * xl) AS HUGEINT) AS syx,
                 CAST(sum(yl * yl) AS HUGEINT) AS sll,
                 CAST(sum(yl * xl) AS HUGEINT) AS slx,
                 CAST(sum(xl * xl) AS HUGEINT) AS sxx
          FROM w),
    c AS (SELECT n,
                 n * syy - sy * sy AS cyy,
                 n * syl - sy * sl AS cyl,
                 n * syx - sy * sx AS cyx,
                 n * sll - sl * sl AS cll,
                 n * slx - sl * sx AS clx,
                 n * sxx - sx * sx AS cxx
          FROM m),
    f AS (SELECT n,
                 CAST(cyy AS DOUBLE) * CAST(cll AS DOUBLE)
                 - CAST(cyl AS DOUBLE) * CAST(cyl AS DOUBLE)
                   AS ar,
                 CAST(cll AS DOUBLE) AS br,
                 CAST(cyy AS DOUBLE)
                 * (CAST(cll AS DOUBLE) * CAST(cxx AS DOUBLE)
                    - CAST(clx AS DOUBLE) * CAST(clx AS DOUBLE))
                 - (CAST(cyl AS DOUBLE) * CAST(cyl AS DOUBLE)
                      * CAST(cxx AS DOUBLE)
                    - 2.0 * CAST(cyl AS DOUBLE)
                          * CAST(cyx AS DOUBLE)
                          * CAST(clx AS DOUBLE)
                    + CAST(cyx AS DOUBLE) * CAST(cyx AS DOUBLE)
                      * CAST(cll AS DOUBLE)) AS af,
                 CAST(cll AS DOUBLE) * CAST(cxx AS DOUBLE)
                 - CAST(clx AS DOUBLE) * CAST(clx AS DOUBLE)
                   AS bf
          FROM c)
    SELECT CAST(n AS BIGINT) AS n_obs,
           ((ar / br - af / bf) * (CAST(n AS DOUBLE) - 3.0))
           / (af / bf) AS granger_f
    FROM f""")
def granger_1lag(sf_dir: str):
    """ONE-LAG GRANGER CAUSALITY from daily order count to
    next-day revenue: compare the residual sum of squares of
    'revenue on its own lag' against 'revenue on its lag AND
    yesterday's order count'; F = (RSS_r - RSS_f)*(n-3)/RSS_f —
    the predictive-causality test (does volume carry information
    about TOMORROW's money beyond revenue's own memory?) that
    complements lins_ccc's same-day agreement. Both RSS values
    are ratios of determinant expressions in the n-scaled central
    moments: the moments themselves fold as exact big ints, and
    the determinant products (whose 6th-power magnitudes exceed
    INT128) are evaluated as IDENTICAL shared float expressions
    in both engines, so the result is bit-for-bit reproducible.
    Scale plan: bounded day-domain combine; O(1) driver
    arithmetic."""
    d = _daily_pair(sf_dir)
    rows = [(d[i][2], d[i - 1][2], d[i - 1][1])
            for i in range(1, len(d))]
    n = len(rows)
    sy = sum(r[0] for r in rows)
    sl = sum(r[1] for r in rows)
    sx = sum(r[2] for r in rows)
    syy = sum(r[0] * r[0] for r in rows)
    syl = sum(r[0] * r[1] for r in rows)
    syx = sum(r[0] * r[2] for r in rows)
    sll = sum(r[1] * r[1] for r in rows)
    slx = sum(r[1] * r[2] for r in rows)
    sxx = sum(r[2] * r[2] for r in rows)
    cyy = n * syy - sy * sy
    cyl = n * syl - sy * sl
    cyx = n * syx - sy * sx
    cll = n * sll - sl * sl
    clx = n * slx - sl * sx
    cxx = n * sxx - sx * sx
    fyy, fyl, fyx = (np.float64(cyy), np.float64(cyl),
                     np.float64(cyx))
    fll, flx, fxx = (np.float64(cll), np.float64(clx),
                     np.float64(cxx))
    ar = fyy * fll - fyl * fyl
    br = fll
    af = fyy * (fll * fxx - flx * flx) \
        - (fyl * fyl * fxx - 2.0 * fyl * fyx * flx
           + fyx * fyx * fll)
    bf = fll * fxx - flx * flx
    return pd.DataFrame({
        "n_obs": [np.int64(n)],
        "granger_f": [((ar / br - af / bf)
                       * (np.float64(n) - 3.0)) / (af / bf)]})


@register("weekly_spectrum", sql="""
    WITH """ + _DAILY_PAIR_SQL + """,
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS s FROM d),
    z AS (SELECT day,
                 (SELECT n FROM t) * y - (SELECT s FROM t) AS z
          FROM d),
    c AS (SELECT
        CAST(sum(z * CAST(floor(cos(CAST(day % 7 AS DOUBLE)
             * 2.0 * pi() / 7.0) * 1000000.0 + 0.5) AS BIGINT))
             AS HUGEINT) AS c7,
        CAST(sum(z * CAST(floor(sin(CAST(day % 7 AS DOUBLE)
             * 2.0 * pi() / 7.0) * 1000000.0 + 0.5) AS BIGINT))
             AS HUGEINT) AS s7,
        CAST(sum(z * CAST(floor(cos(CAST(day % 30 AS DOUBLE)
             * 2.0 * pi() / 30.0) * 1000000.0 + 0.5) AS BIGINT))
             AS HUGEINT) AS c30,
        CAST(sum(z * CAST(floor(sin(CAST(day % 30 AS DOUBLE)
             * 2.0 * pi() / 30.0) * 1000000.0 + 0.5) AS BIGINT))
             AS HUGEINT) AS s30,
        CAST(sum(z * z) AS HUGEINT) AS zz
        FROM z)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_days,
           (CAST((SELECT c7 FROM c) AS DOUBLE)
            * CAST((SELECT c7 FROM c) AS DOUBLE)
            + CAST((SELECT s7 FROM c) AS DOUBLE)
              * CAST((SELECT s7 FROM c) AS DOUBLE))
           / (1000000000000.0
              * CAST((SELECT zz FROM c) AS DOUBLE))
             AS power_7d,
           (CAST((SELECT c30 FROM c) AS DOUBLE)
            * CAST((SELECT c30 FROM c) AS DOUBLE)
            + CAST((SELECT s30 FROM c) AS DOUBLE)
              * CAST((SELECT s30 FROM c) AS DOUBLE))
           / (1000000000000.0
              * CAST((SELECT zz FROM c) AS DOUBLE))
             AS power_30d""")
def weekly_spectrum(sf_dir: str):
    """FIXED-FREQUENCY SPECTRUM of daily revenue at the 7-day and
    30-day periods: the single-bin DFT power |sum z_t e^{-iwt}|^2
    normalized by total deviation energy — the direct Fourier
    answer to 'how much of the variance IS the weekly cycle'
    (dominant_period finds WHICH lag; this measures HOW MUCH at
    the two business-meaningful frequencies, phase-invariantly).
    Deviations are the exact scaled integers n*y - S; the 7 (and
    30) cos/sin weights are micro-quantized once (day mod period,
    identical literals both engines), so both resultants fold as
    exact integers; the power ratios are shared float
    expressions. Scale plan: bounded day-domain combine; map-only
    weight products."""
    d = _daily_pair(sf_dir)
    n = len(d)
    s = sum(r[2] for r in d)
    out = {}
    zz = 0
    for per, tag in ((7, "7"), (30, "30")):
        cw = [int(np.floor(np.cos(np.float64(k) * 2.0 * np.pi
                                  / per) * 1000000.0 + 0.5))
              for k in range(per)]
        swt = [int(np.floor(np.sin(np.float64(k) * 2.0 * np.pi
                                   / per) * 1000000.0 + 0.5))
               for k in range(per)]
        cs = ss = 0
        for day, _, y in d:
            z = n * y - s
            cs += z * cw[day % per]
            ss += z * swt[day % per]
        out[tag] = (cs, ss)
    zz = sum((n * r[2] - s) ** 2 for r in d)
    res = {}
    for tag, (cs, ss) in out.items():
        res[tag] = (np.float64(cs) * np.float64(cs)
                    + np.float64(ss) * np.float64(ss)) \
            / (1.0e12 * np.float64(zz))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "power_7d": [res["7"]],
        "power_30d": [res["30"]]})
