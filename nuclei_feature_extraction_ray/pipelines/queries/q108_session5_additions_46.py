# round-5 session-5 additions, batch 46: md5 bit-balance QA for the
# sampler hash, an out-of-sample learning curve for the trend model,
# and Yuen's trimmed-mean two-sample test.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_LC_FRACS = (25, 50, 75, 100)
_YU_TRIM = 10           # percent trimmed from each tail


@register("hash_bit_balance", sql="""
    WITH h AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                        || ':arm'), 1, 16))::UBIGINT AS hv
               FROM documents),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM h),
    bits AS (SELECT CAST(b AS BIGINT) AS bit,
                    CAST(sum(CAST((hv >> b) & 1 AS BIGINT))
                         AS BIGINT) AS ones
             FROM h CROSS JOIN (SELECT unnest(generate_series(0,
                                        63)) AS b)
             GROUP BY b),
    s AS (SELECT CAST(max(abs(2 * ones - (SELECT n FROM n)))
                      AS BIGINT) AS worst,
                 CAST(sum(CAST(floor(
                      CAST((2 * ones - (SELECT n FROM n))
                           * (2 * ones - (SELECT n FROM n))
                           AS DOUBLE)
                      / CAST((SELECT n FROM n) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS chi_micro
          FROM bits)
    SELECT (SELECT n FROM n) AS n_docs,
           CAST(64 AS BIGINT) AS n_bits,
           (SELECT worst FROM s) AS worst_bit_imbalance,
           (SELECT chi_micro FROM s) AS chi_sum_micro,
           CAST((SELECT chi_micro FROM s) AS DOUBLE) / 1000000.0
             AS balance_chi2""")
def hash_bit_balance(sf_dir: str):
    """MD5 BIT-BALANCE QA for the sampler hash surface: across the
    64 high bits of md5(doc_id:arm), the ones-count per bit, the
    worst absolute imbalance |ones - zeros| and the 64-df
    chi-square against fair coins — the infrastructure audit that
    every hash-seeded operator here (srm_check,
    randomized_response, hash_replicate_se, weighted_sample)
    silently assumes; a biased bit would poison them all. Bit
    censuses are exact integer folds (one vectorized md5 kernel
    per batch); each (2*ones - n)^2/n term quantizes to micro
    units half-up before the 64-term fold. Scale plan: per-batch
    64-cell popcount partials — map-only, tiny grid."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hv = md5_id64_flat(b["doc_id"].to_numpy(np.int64),
                           ":arm")[0]
        ones = np.array([int(((hv >> np.uint64(bit))
                              & np.uint64(1)).sum())
                         for bit in range(64)], np.int64)
        return pd.DataFrame({
            "bit": np.arange(64, dtype=np.int64),
            "n": np.full(64, len(b), np.int64),
            "ones": ones})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["bit"], ["n", "ones"])
    n = int(s["n"].iloc[0])
    ones = s["ones"].to_numpy(np.int64)
    dev = 2 * ones - n
    worst = int(np.abs(dev).max())
    chi = int(np.floor(
        (dev.astype(np.float64) * dev.astype(np.float64))
        / np.float64(n) * 1000000.0 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "n_bits": [np.int64(64)],
        "worst_bit_imbalance": [np.int64(worst)],
        "chi_sum_micro": [np.int64(chi)],
        "balance_chi2": [np.float64(chi) / 1000000.0]})


def _lc_sql_frac(f: int) -> str:
    return """
    SELECT CAST({f} AS BIGINT) AS train_pct,
           (SELECT CAST(sum(CAST(floor(
                (CAST(te.v AS DOUBLE)
                 - ((CAST(m.sy AS DOUBLE)
                     - CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                       / CAST(m.n * m.sxx - m.sx * m.sx
                              AS DOUBLE)
                       * CAST(m.sx AS DOUBLE))
                    / CAST(m.n AS DOUBLE)
                    + CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                      / CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)
                      * CAST(te.t AS DOUBLE)))
                * (CAST(te.v AS DOUBLE)
                   - ((CAST(m.sy AS DOUBLE)
                       - CAST(m.n * m.sxy - m.sx * m.sy
                              AS DOUBLE)
                         / CAST(m.n * m.sxx - m.sx * m.sx
                                AS DOUBLE)
                         * CAST(m.sx AS DOUBLE))
                      / CAST(m.n AS DOUBLE)
                      + CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
                        / CAST(m.n * m.sxx - m.sx * m.sx
                               AS DOUBLE)
                        * CAST(te.t AS DOUBLE)))
                + 0.5) AS BIGINT)) AS HUGEINT)
            FROM te CROSS JOIN
              (SELECT CAST(count(*) AS HUGEINT) AS n,
                      CAST(sum(v) AS HUGEINT) AS sy,
                      CAST(sum(t) AS HUGEINT) AS sx,
                      CAST(sum(CAST(t AS HUGEINT) * t)
                           AS HUGEINT) AS sxx,
                      CAST(sum(CAST(t AS HUGEINT) * v)
                           AS HUGEINT) AS sxy
               FROM x
               WHERE x.t <= ntr * {f} // 100) m) AS sse_unit
    FROM (SELECT CAST(max(t) AS BIGINT) AS ntr FROM x
          WHERE t <= (SELECT n FROM nn) * 8 // 10)
    """.format(f=f)


@register("learning_curve", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT v, CAST(row_number() OVER (ORDER BY day)
                         AS BIGINT) AS t
          FROM d),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
    te AS (SELECT t, v FROM x
           WHERE t > (SELECT n FROM nn) * 8 // 10),
    curves AS ({f1} UNION ALL {f2} UNION ALL {f3} UNION ALL {f4})
    SELECT train_pct,
           CAST(sse_unit AS DOUBLE)
             / CAST((SELECT count(*) FROM te) AS DOUBLE)
             AS holdout_mse
    FROM curves ORDER BY train_pct""".format(
    f1=_lc_sql_frac(25), f2=_lc_sql_frac(50),
    f3=_lc_sql_frac(75), f4=_lc_sql_frac(100)))
def learning_curve(sf_dir: str):
    """OUT-OF-SAMPLE LEARNING CURVE for the daily-revenue trend
    model: fit the line on the first 25/50/75/100% of the TRAINING
    window (the first 80% of days) and score each fit's squared
    error on the SAME held-out final 20% — flattening MSE says
    more history stops helping (model capacity is the binding
    constraint), the diagnosis press_statistic cannot give from
    in-sample error alone. Fits are closed forms on exact integer
    moments; every holdout residual square (identical doubles)
    quantizes to whole units half-up before the exact fold. Scale
    plan: bounded day-domain combine; four moment scans plus one
    shared holdout fold, all O(days) driver work."""
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
    ntr = n * 8 // 10
    te = [(t, v[t - 1]) for t in range(ntr + 1, n + 1)]
    rows = []
    for f in _LC_FRACS:
        k = ntr * f // 100
        tr_t = list(range(1, k + 1))
        tr_v = v[:k]
        m = len(tr_t)
        sy = sum(tr_v)
        sx = sum(tr_t)
        sxx = sum(t * t for t in tr_t)
        sxy = sum(a * b for a, b in zip(tr_t, tr_v))
        b = np.float64(m * sxy - sx * sy) \
            / np.float64(m * sxx - sx * sx)
        a = (np.float64(sy) - b * np.float64(sx)) / np.float64(m)
        sse = 0
        for t, y in te:
            e = np.float64(y) - (a + b * np.float64(t))
            sse += int(np.floor(e * e + 0.5))
        rows.append({
            "train_pct": np.int64(f),
            "holdout_mse": np.float64(sse)
            / np.float64(len(te))})
    return pd.DataFrame(rows)


@register("yuen_test", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
                 CAST(sum(b) AS BIGINT) AS n2 FROM h),
    g AS (SELECT 1 AS grp, v, a AS c,
                 CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS cum,
                 (SELECT n1 FROM t) AS n
          FROM h WHERE a > 0
          UNION ALL
          SELECT 2, v, b,
                 CAST(sum(b) OVER (ORDER BY v) AS BIGINT),
                 (SELECT n2 FROM t)
          FROM h WHERE b > 0),
    w AS (SELECT grp, n,
                 CAST(n * {p} // 100 AS BIGINT) AS trim,
                 CAST(greatest(least(cum, n - n * {p} // 100)
                      - greatest(cum - c, n * {p} // 100), 0)
                      AS BIGINT) AS keep,
                 v
          FROM g),
    m AS (SELECT grp, CAST(max(n) AS BIGINT) AS n,
                 CAST(max(trim) AS BIGINT) AS trim,
                 CAST(sum(keep) AS BIGINT) AS kn,
                 CAST(sum(keep * v) AS HUGEINT) AS ks,
                 CAST(sum(CAST(keep AS HUGEINT) * v * v)
                      AS HUGEINT) AS ks2
          FROM w GROUP BY grp),
    f AS (SELECT
        (SELECT CAST(ks AS DOUBLE) / CAST(kn AS DOUBLE)
         FROM m WHERE grp = 1) AS m1,
        (SELECT CAST(ks AS DOUBLE) / CAST(kn AS DOUBLE)
         FROM m WHERE grp = 2) AS m2,
        (SELECT (CAST(ks2 AS DOUBLE)
                 - CAST(ks AS DOUBLE) * CAST(ks AS DOUBLE)
                   / CAST(kn AS DOUBLE))
                / (CAST(kn AS DOUBLE) - 1.0)
                / CAST(kn AS DOUBLE) FROM m WHERE grp = 1)
          AS se1,
        (SELECT (CAST(ks2 AS DOUBLE)
                 - CAST(ks AS DOUBLE) * CAST(ks AS DOUBLE)
                   / CAST(kn AS DOUBLE))
                / (CAST(kn AS DOUBLE) - 1.0)
                / CAST(kn AS DOUBLE) FROM m WHERE grp = 2)
          AS se2)
    SELECT (SELECT kn FROM m WHERE grp = 1) AS n_trimmed_1,
           (SELECT kn FROM m WHERE grp = 2) AS n_trimmed_2,
           m1 AS trimmed_mean_1, m2 AS trimmed_mean_2,
           (m1 - m2) / sqrt(se1 + se2) AS yuen_t
    FROM f""".format(p=_YU_TRIM))
def yuen_test(sf_dir: str):
    """YUEN'S TRIMMED-MEAN TEST between returned and kept
    quantities: trim {p}% from each tail of each group (EXACT
    count-based trimming on the bounded histogram — per-value kept
    weights are integer clamps of cumulative counts, no order
    stats pulled), compare trimmed means with the trimmed-sample
    SE — the outlier-proof location test that degrades gracefully
    where the plain t fails and mann_whitney answers a different
    question (documented: SE from the trimmed sample, the
    large-sample simplification). Kept-weight moments fold as
    exact big ints; means and the t are shared float expressions.
    Scale plan: per-batch (quantity, flag) histogram partials; the
    trim algebra is O(domain) driver work."""
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

    def trimmed(counts: np.ndarray):
        n = int(counts.sum())
        trim = n * _YU_TRIM // 100
        cum = np.cumsum(counts)
        keep = np.maximum(
            np.minimum(cum, n - trim)
            - np.maximum(cum - counts, trim), 0)
        kn = int(keep.sum())
        vv = h["v"].to_numpy(np.int64)
        ks = int((keep * vv).sum())
        ks2 = int((keep.astype(object) * vv.astype(object)
                   * vv.astype(object)).sum())
        mean = np.float64(ks) / np.float64(kn)
        se = (np.float64(ks2)
              - np.float64(ks) * np.float64(ks)
              / np.float64(kn)) / (np.float64(kn) - 1.0) \
            / np.float64(kn)
        return kn, mean, se

    kn1, m1, se1 = trimmed(h["a"].to_numpy(np.int64))
    kn2, m2, se2 = trimmed(h["b"].to_numpy(np.int64))
    return pd.DataFrame({
        "n_trimmed_1": [np.int64(kn1)],
        "n_trimmed_2": [np.int64(kn2)],
        "trimmed_mean_1": [m1], "trimmed_mean_2": [m2],
        "yuen_t": [(m1 - m2) / np.sqrt(se1 + se2)]})
