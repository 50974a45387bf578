# round-5 session-5 additions, batch 35: a classifier two-sample
# test via the best stump, the turning-points randomness test, and
# Neyman optimal stratified allocation.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)

_NA_BUDGET = 1000


@register("c2st_stump", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                 CAST(sum(b) AS BIGINT) AS m FROM h),
    c AS (SELECT v,
                 CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
                 CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
          FROM h),
    cand AS (SELECT v, CAST(0 AS BIGINT) AS dir,
                    ca + (SELECT m FROM t) - cb AS correct
             FROM c
             UNION ALL
             SELECT v, CAST(1 AS BIGINT),
                    (SELECT n FROM t) - ca + cb
             FROM c),
    best AS (SELECT v, dir, correct,
                    row_number() OVER (ORDER BY correct DESC,
                                       v, dir) AS r
             FROM cand)
    SELECT (SELECT n FROM t) AS n_returned,
           (SELECT m FROM t) AS n_kept,
           CAST(v AS BIGINT) AS threshold,
           dir AS direction, correct AS n_correct,
           CAST(correct AS DOUBLE)
             / CAST((SELECT n FROM t) + (SELECT m FROM t)
                    AS DOUBLE) AS accuracy,
           CAST(correct AS DOUBLE)
             / CAST((SELECT n FROM t) + (SELECT m FROM t)
                    AS DOUBLE)
           - CAST(greatest((SELECT n FROM t), (SELECT m FROM t))
                  AS DOUBLE)
             / CAST((SELECT n FROM t) + (SELECT m FROM t)
                    AS DOUBLE) AS above_chance
    FROM best WHERE r = 1""")
def c2st_stump(sf_dir: str):
    """CLASSIFIER TWO-SAMPLE TEST with a threshold stump: the best
    single quantity cutoff (either direction) for telling returned
    lines from kept ones; accuracy above the majority-class rate is
    distributional difference a CLASSIFIER can exploit — the
    modern C2ST reading of the two-sample question beside the
    analytic family (ks/cvm/energy/wasserstein/mmd), in its
    simplest fully-exact form. The accuracy sweep is pure integer
    prefix arithmetic over the bounded histogram (argmax with
    (threshold, direction) tie-break — no float can flip the
    winner). Scale plan: per-batch (quantity, flag) histogram
    partials; the sweep is O(domain) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["l_quantity"].to_numpy(np.int64)
        r = (b["l_returnflag"].to_numpy(object)
             == "R").astype(np.int64)
        g = pd.DataFrame({"v": v, "a": r, "b": 1 - r}) \
            .groupby("v", as_index=False).sum()
        for c in ("a", "b"):
            g[c] = g[c].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["a", "b"]).sort_values("v").reset_index(drop=True)
    v = h["v"].to_numpy(np.int64)
    ca = np.cumsum(h["a"].to_numpy(np.int64))
    cb = np.cumsum(h["b"].to_numpy(np.int64))
    n, m = int(ca[-1]), int(cb[-1])
    best = (-1, None, None)
    for i in range(len(v)):
        for d, corr in ((0, int(ca[i]) + m - int(cb[i])),
                        (1, n - int(ca[i]) + int(cb[i]))):
            if corr > best[0] or (corr == best[0]
                                  and (int(v[i]), d)
                                  < (best[1], best[2])):
                best = (corr, int(v[i]), d)
    acc = np.float64(best[0]) / np.float64(n + m)
    return pd.DataFrame({
        "n_returned": [np.int64(n)], "n_kept": [np.int64(m)],
        "threshold": [np.int64(best[1])],
        "direction": [np.int64(best[2])],
        "n_correct": [np.int64(best[0])],
        "accuracy": [acc],
        "above_chance": [acc - np.float64(max(n, m))
                         / np.float64(n + m)]})


@register("turning_points", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, lag(v) OVER (ORDER BY day) AS pv,
                 lead(v) OVER (ORDER BY day) AS nv
          FROM d),
    c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN pv IS NOT NULL
                               AND nv IS NOT NULL
                               AND ((v > pv AND v > nv)
                                    OR (v < pv AND v < nv))
                          THEN 1 ELSE 0 END) AS BIGINT) AS t
          FROM x)
    SELECT n AS n_days, t AS n_turning_points,
           2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0 AS expected,
           (CAST(t AS DOUBLE)
            - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
           / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)
             AS turning_z
    FROM c""")
def turning_points(sf_dir: str):
    """TURNING-POINTS TEST for randomness of the daily revenue
    sequence: count strict local maxima and minima and compare to
    the i.i.d. expectation 2(n-2)/3 with variance (16n-29)/90 —
    too few turning points means trend/momentum, too many means
    negative serial correlation; the oscillation-sensitive
    complement of runs_test (level crossings) and ljung_box
    (linear correlation). The census is exact integer comparisons
    on exact day sums; the z-score is one shared float expression.
    Scale plan: per-batch (day, cents) partials through the
    bounded day-domain combine; the scan is O(days) driver
    work."""
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
    t = sum(1 for i in range(1, n - 1)
            if (v[i] > v[i - 1] and v[i] > v[i + 1])
            or (v[i] < v[i - 1] and v[i] < v[i + 1]))
    fn_ = np.float64(n)
    exp = 2.0 * (fn_ - 2.0) / 3.0
    z = (np.float64(t) - exp) / np.sqrt((16.0 * fn_ - 29.0)
                                        / 90.0)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "n_turning_points": [np.int64(t)],
        "expected": [np.float64(exp)],
        "turning_z": [np.float64(z)]})


@register("neyman_allocation", sql="""
    WITH g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(n_chars) AS HUGEINT) AS s,
                      CAST(sum(CAST(n_chars AS HUGEINT) * n_chars)
                           AS HUGEINT) AS s2
               FROM documents GROUP BY source),
    w AS (SELECT source, n,
                 CAST(floor(CAST(n AS DOUBLE)
                      * sqrt((CAST(s2 AS DOUBLE)
                              - CAST(s AS DOUBLE)
                                * CAST(s AS DOUBLE)
                                / CAST(n AS DOUBLE))
                             / CAST(n AS DOUBLE)) + 0.5)
                      AS BIGINT) AS wu
          FROM g),
    t AS (SELECT CAST(sum(wu) AS HUGEINT) AS tw FROM w),
    a AS (SELECT source, n, wu,
                 CAST({b} * CAST(wu AS HUGEINT)
                      // (SELECT tw FROM t) AS BIGINT) AS base,
                 CAST({b} * CAST(wu AS HUGEINT)
                      % (SELECT tw FROM t) AS BIGINT) AS rem
          FROM w),
    lo AS (SELECT CAST({b} - sum(base) AS BIGINT) AS left_
           FROM a),
    rk AS (SELECT source, CAST(row_number() OVER (
                 ORDER BY rem DESC, source) AS BIGINT) AS r
           FROM a)
    SELECT a.source, a.n AS n_docs, a.wu AS weight_unit,
           CAST(a.base + CASE WHEN rk.r <= (SELECT left_ FROM lo)
                              THEN 1 ELSE 0 END AS BIGINT)
             AS allocation
    FROM a JOIN rk ON rk.source = a.source
    ORDER BY a.source""".format(b=_NA_BUDGET))
def neyman_allocation(sf_dir: str):
    """NEYMAN OPTIMAL ALLOCATION of a {b}-document sampling budget
    across sources: each stratum's share is proportional to
    N_h * S_h (size times standard deviation of n_chars) — the
    variance-minimizing survey design that beats proportional
    allocation (stratified_sample's rule) whenever strata differ
    in spread, integerized by the exact largest-remainder method
    (sample_apportionment's machinery on Neyman weights). Stratum
    weights quantize to whole units half-up from exact integer
    moments; bases, remainders and the leftover hand-out are PURE
    integer arithmetic with (remainder DESC, source) tie-break.
    Scale plan: per-source 3-cell moment partials; the
    apportionment is O(sources) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["n_chars"].to_numpy(np.int64).astype(object)
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "n": np.ones(len(b), np.int64),
            "s": b["n_chars"].to_numpy(np.int64)}) \
            .groupby("source", as_index=False).sum()
        g2 = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "s2": x * x}).groupby("source", as_index=False).sum()
        out = g.merge(g2, on="source")
        for c in ("n", "s"):
            out[c] = out[c].astype(np.int64)
        return out

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n", "s", "s2"], exact_int=True)
    wu = {}
    nn = {}
    for _, r in g.iterrows():
        n, s, s2 = int(r["n"]), int(r["s"]), int(r["s2"])
        var = (np.float64(s2)
               - np.float64(s) * np.float64(s) / np.float64(n)) \
            / np.float64(n)
        wu[r["source"]] = int(np.floor(
            np.float64(n) * np.sqrt(var) + 0.5))
        nn[r["source"]] = n
    tw = sum(wu.values())
    base = {s: _NA_BUDGET * w // tw for s, w in wu.items()}
    rem = {s: _NA_BUDGET * w % tw for s, w in wu.items()}
    left = _NA_BUDGET - sum(base.values())
    order = sorted(rem, key=lambda s: (-rem[s], s))
    for s in order[:left]:
        base[s] += 1
    srcs = sorted(wu)
    return pd.DataFrame({
        "source": srcs,
        "n_docs": pd.Series([nn[s] for s in srcs],
                            dtype=np.int64),
        "weight_unit": pd.Series([wu[s] for s in srcs],
                                 dtype=np.int64),
        "allocation": pd.Series([base[s] for s in srcs],
                                dtype=np.int64)})
