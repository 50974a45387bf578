# round-5 session-5 additions, batch 87: convex-hull census of the
# nation scatter, the mean-excess tail function, and the Renyi
# entropy spectrum of the token distribution.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, _read_dim,
                      np, pd, ray, rd, register)
from ...functions.hashing import tokens_flat
from ...stages.partition import partition_map


@register("convex_hull_census", sql="""
    WITH cents AS (SELECT o_custkey,
                          CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT) AS v
                   FROM orders),
    pts AS (SELECT n.n_nationkey AS nk,
                   CAST(COALESCE(count(ce.v), 0) AS HUGEINT)
                     AS x,
                   CAST(COALESCE(sum(ce.v), 0) AS HUGEINT) AS y
            FROM nation n
            LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
            LEFT JOIN cents ce ON ce.o_custkey = c.c_custkey
            GROUP BY 1),
    inter AS (SELECT p.nk FROM pts p WHERE EXISTS (
        SELECT 1 FROM pts a, pts b, pts c
        WHERE a.nk < b.nk AND b.nk < c.nk
          AND a.nk <> p.nk AND b.nk <> p.nk AND c.nk <> p.nk
          AND (((b.x - a.x) * (p.y - a.y)
                - (b.y - a.y) * (p.x - a.x) > 0
                AND (c.x - b.x) * (p.y - b.y)
                    - (c.y - b.y) * (p.x - b.x) > 0
                AND (a.x - c.x) * (p.y - c.y)
                    - (a.y - c.y) * (p.x - c.x) > 0)
               OR ((b.x - a.x) * (p.y - a.y)
                   - (b.y - a.y) * (p.x - a.x) < 0
                   AND (c.x - b.x) * (p.y - b.y)
                       - (c.y - b.y) * (p.x - b.x) < 0
                   AND (a.x - c.x) * (p.y - c.y)
                       - (a.y - c.y) * (p.x - c.x) < 0)))),
    pairs AS (SELECT (a.x - b.x) * (a.x - b.x)
                     + (a.y - b.y) * (a.y - b.y) AS d2
              FROM pts a JOIN pts b ON a.nk < b.nk)
    SELECT CAST((SELECT count(*) FROM pts) AS BIGINT)
             AS n_points,
           CAST((SELECT count(*) FROM pts)
                - (SELECT count(*) FROM inter) AS BIGINT)
             AS hull_vertices,
           CAST((SELECT max(d2) FROM pairs) AS DOUBLE)
             AS diameter_sq,
           CAST((SELECT min(d2) FROM pairs) AS DOUBLE)
             AS closest_sq""")
def convex_hull_census(sf_dir: str):
    """CONVEX-HULL CENSUS of the nation scatter (x = order count,
    y = revenue cents): how many of the 25 nations are extreme
    points of the cloud (not strictly inside any triangle of
    others — the exact integer orientation test, no epsilons),
    plus the exact squared diameter (farthest pair) and
    closest-pair distance — computational geometry's outlier
    lens: hull vertices are the nations no mixture of peers can
    explain, the Pareto-frontier complement to skyline_trend. All
    cross products and distances are exact big-int arithmetic
    (cast to DOUBLE only at output). Scale plan: the q7 broadcast
    join into a 25-point scatter; the O(n^4) membership scan is
    driver work on a bounded dimension."""
    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    co = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((cust["c_custkey"].to_numpy(np.int64)[co],
                   cust["c_nationkey"].to_numpy(np.int64)[co]))
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys, nats = ray.get(ref)
        nk = nats[np.searchsorted(keys,
                                  b["o_custkey"]
                                  .to_numpy(np.int64))]
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"nk": nk,
                          "x": np.ones(len(b), np.int64),
                          "y": cents}) \
            .groupby("nk", as_index=False).sum()
        for c in ("x", "y"):
            g[c] = g[c].astype(np.int64)
        return g

    rev = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["nk"], ["x", "y"], exact_int=True)
    nat = _read_dim(_path(sf_dir, "nation"), ["n_nationkey"])
    m = {int(r["nk"]): (int(r["x"]), int(r["y"]))
         for _, r in rev.iterrows()}
    pts = [(int(k), *m.get(int(k), (0, 0)))
           for k in nat["n_nationkey"].to_numpy(np.int64)]
    pts.sort()

    def cross(ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    interior = 0
    n = len(pts)
    for pi in range(n):
        _, px, py = pts[pi]
        found = False
        for i in range(n):
            if found or i == pi:
                continue
            for j in range(i + 1, n):
                if found or j == pi:
                    continue
                for k in range(j + 1, n):
                    if k == pi:
                        continue
                    _, ax, ay = pts[i]
                    _, bx, by = pts[j]
                    _, cx, cy = pts[k]
                    s1 = cross(ax, ay, bx, by, px, py)
                    s2 = cross(bx, by, cx, cy, px, py)
                    s3 = cross(cx, cy, ax, ay, px, py)
                    if (s1 > 0 and s2 > 0 and s3 > 0) or \
                            (s1 < 0 and s2 < 0 and s3 < 0):
                        found = True
                        break
                if found:
                    break
        if found:
            interior += 1
    d2s = [(a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
           for i, a in enumerate(pts) for b in pts[i + 1:]]
    return pd.DataFrame({
        "n_points": [np.int64(n)],
        "hull_vertices": [np.int64(n - interior)],
        "diameter_sq": [np.float64(max(d2s))],
        "closest_sq": [np.float64(min(d2s))]})


@register("mean_excess", sql="""
    WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS v
               FROM orders),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
    r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM o),
    th AS (SELECT CAST(p.p AS BIGINT) AS pct,
                  (SELECT max(v) FROM r
                   WHERE rk = ((SELECT n FROM t) * p.p + 99)
                              // 100) AS u
           FROM (VALUES (90), (95), (99)) p(p)),
    ex AS (SELECT th.pct, th.u,
                  CAST(count(*) AS BIGINT) AS n_exceed,
                  CAST(sum(o.v - th.u) AS HUGEINT) AS s
           FROM th JOIN o ON o.v > th.u
           GROUP BY th.pct, th.u)
    SELECT pct, CAST(u AS BIGINT) AS threshold_cents, n_exceed,
           CAST(s AS DOUBLE)
           / (100.0 * CAST(n_exceed AS DOUBLE))
             AS mean_excess_dollars
    FROM ex ORDER BY pct""")
def mean_excess(sf_dir: str):
    """MEAN-EXCESS FUNCTION of order totals at the 90/95/99th
    percentile thresholds: E[X - u | X > u] — the
    extreme-value-theory diagnostic whose SHAPE identifies the
    tail family (rising linearly = heavy Pareto tail, flat =
    exponential, falling = bounded), the graphical companion that
    decides whether hill_estimator's power-law assumption is even
    admissible. Thresholds are exact type-1 order statistics at
    exact ranks; excess sums and exceedance counts are exact
    integers; one division per row. Scale plan: cent-value
    histogram combine; threshold cuts and excess sums are a
    cumulative walk."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"v": cents,
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("v", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["c"]).sort_values("v").reset_index(drop=True)
    vals = h["v"].to_numpy(np.int64)
    cnts = h["c"].to_numpy(np.int64)
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    rows = []
    for p in (90, 95, 99):
        rk = (n * p + 99) // 100
        u = int(vals[int(np.searchsorted(cum, rk))])
        mask = vals > u
        ne = int(cnts[mask].sum())
        s = int(((vals[mask] - u).astype(object)
                 * cnts[mask].astype(object)).sum())
        rows.append((p, u, ne,
                     np.float64(s) / (100.0 * np.float64(ne))))
    return pd.DataFrame({
        "pct": np.array([r[0] for r in rows], np.int64),
        "threshold_cents": np.array([r[1] for r in rows],
                                    np.int64),
        "n_exceed": np.array([r[2] for r in rows], np.int64),
        "mean_excess_dollars": np.array([r[3] for r in rows],
                                        np.float64)})


@register("renyi_spectrum", sql="""
    WITH d AS (SELECT trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
           FROM w GROUP BY term),
    h AS (SELECT c, CAST(count(*) AS BIGINT) AS m
          FROM tc GROUP BY c),
    t AS (SELECT CAST(sum(c * m) AS HUGEINT) AS n,
                 CAST(sum(m) AS BIGINT) AS vocab,
                 CAST(sum(CAST(c AS HUGEINT) * c * m)
                      AS HUGEINT) AS f2,
                 CAST(max(c) AS BIGINT) AS fmax
          FROM h),
    h1 AS (SELECT CAST(sum(CAST(m AS HUGEINT) * CAST(floor(
                -(CAST(c AS DOUBLE)
                  / CAST((SELECT n FROM t) AS DOUBLE))
                * log2(CAST(c AS DOUBLE)
                       / CAST((SELECT n FROM t) AS DOUBLE))
                * 1000000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
                  AS q
           FROM h)
    SELECT CAST((SELECT n FROM t) AS BIGINT) AS n_tokens,
           (SELECT vocab FROM t) AS vocab,
           log2(CAST((SELECT vocab FROM t) AS DOUBLE)) AS h0,
           CAST((SELECT q FROM h1) AS DOUBLE) / 1000000000.0
             AS h1,
           2.0 * log2(CAST((SELECT n FROM t) AS DOUBLE))
           - log2(CAST((SELECT f2 FROM t) AS DOUBLE)) AS h2,
           log2(CAST((SELECT n FROM t) AS DOUBLE))
           - log2(CAST((SELECT fmax FROM t) AS DOUBLE))
             AS h_min""")
def renyi_spectrum(sf_dir: str):
    """RENYI ENTROPY SPECTRUM of the corpus token distribution:
    H0 (log2 vocabulary — pure richness), H1 (Shannon), H2
    (collision entropy, -log2 sum p^2 — what a hash adversary or
    a dedup false-positive rate actually sees), and H_min
    (-log2 p_max — the guessing-security floor). The SPREAD
    between orders is the diagnosis: H0 >> H1 >> H2 means a long
    thin tail over a heavy head, and H2/H_min — not H1 — govern
    collision and guessing behavior (chao_shen corrects H1's
    bias; the spectrum shows what H1 alone hides). All moments
    (vocab, sum f^2, max f) fold exactly through the yule_k
    term exchange; H1 terms are nano-quantized shared floats
    summed exactly; H0/H2/H_min are shared float expressions on
    exact ints. Scale plan: term-keyed exchange into a bounded
    count histogram."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        g = pd.DataFrame({
            "term": vals.to_numpy(zero_copy_only=False),
            "c": np.ones(int(k.sum()), np.int64)}) \
            .groupby("term", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    def census(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)["c"].sum()
        out = pd.DataFrame({
            "c": a["c"].to_numpy(np.int64),
            "m": np.ones(len(a), np.int64)}) \
            .groupby("c", as_index=False).sum()
        out["m"] = out["m"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["term"], census, 16),
        ["c"], ["m"], exact_int=True)
    cs = [int(x) for x in h["c"]]
    ms = [int(x) for x in h["m"]]
    n = sum(c * m for c, m in zip(cs, ms))
    vocab = sum(ms)
    f2 = sum(c * c * m for c, m in zip(cs, ms))
    fmax = max(cs)
    q = 0
    for c, m in zip(cs, ms):
        p = np.float64(c) / np.float64(n)
        q += m * int(np.floor(-(p) * np.log2(p)
                              * 1000000000.0 + 0.5))
    return pd.DataFrame({
        "n_tokens": [np.int64(n)], "vocab": [np.int64(vocab)],
        "h0": [np.log2(np.float64(vocab))],
        "h1": [np.float64(q) / 1000000000.0],
        "h2": [2.0 * np.log2(np.float64(n))
               - np.log2(np.float64(f2))],
        "h_min": [np.log2(np.float64(n))
                  - np.log2(np.float64(fmax))]})
