# round-5 session-5 additions, batch 53: the covariate balance
# table (standardized mean differences), the alarm run-length
# census over control-chart breaches, and per-language median
# confidence intervals.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat, tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_XMR_C = 2.66
_MC_Z = 1.959963984540054


@register("smd_balance", sql="""
    WITH d AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS
                          VARCHAR) || ':arm'), 1, 16))::UBIGINT
                          % 2 AS BIGINT) AS arm,
                      CAST(n_chars AS BIGINT) AS v1,
                      CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f')
                                     = '' THEN 0
                           ELSE len(string_split_regex(
                               trim(text, E' \\t\\n\\r\\f'),
                               '[ \\t\\n\\r\\f]+')) END
                           AS BIGINT) AS v2,
                      CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f')
                                     = '' THEN 0
                           ELSE len(list_distinct(
                               string_split_regex(
                               trim(text, E' \\t\\n\\r\\f'),
                               '[ \\t\\n\\r\\f]+'))) END
                           AS BIGINT) AS v3
               FROM documents),
    u AS (SELECT arm, 'n_chars' AS covariate, v1 AS v FROM d
          UNION ALL SELECT arm, 'n_tokens', v2 FROM d
          UNION ALL SELECT arm, 'n_distinct', v3 FROM d),
    m AS (SELECT covariate, arm,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(v * v) AS HUGEINT) AS s2
          FROM u GROUP BY covariate, arm),
    f AS (SELECT a.covariate,
                 CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS m0,
                 CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS m1,
                 (CAST(a.s2 AS DOUBLE)
                  - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
                    / CAST(a.n AS DOUBLE))
                 / (CAST(a.n AS DOUBLE) - 1.0) AS va,
                 (CAST(b.s2 AS DOUBLE)
                  - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
                    / CAST(b.n AS DOUBLE))
                 / (CAST(b.n AS DOUBLE) - 1.0) AS vb
          FROM m a JOIN m b ON a.covariate = b.covariate
          WHERE a.arm = 0 AND b.arm = 1)
    SELECT covariate, m0 AS mean_control, m1 AS mean_treatment,
           (m1 - m0) / sqrt((va + vb) / 2.0) AS smd,
           CAST(CASE WHEN abs((m1 - m0)
                              / sqrt((va + vb) / 2.0)) > 0.1
                     THEN 1 ELSE 0 END AS BIGINT) AS imbalanced
    FROM f ORDER BY covariate""")
def smd_balance(sf_dir: str):
    """COVARIATE BALANCE TABLE (standardized mean differences) for
    the hash-randomized document arms across three pre-treatment
    covariates (chars, tokens, distinct tokens): SMD = (m1 - m0) /
    sqrt((v1+v0)/2) with the |SMD| > 0.1 imbalance flag — the
    'Table 1' every trial report opens with and the covariate-level
    drill-down after srm_check's count-level gate. Per-arm moments
    are exact integer folds; means, pooled SDs, SMDs and the flags
    (identical doubles against 0.1) are shared expressions. Scale
    plan: map-only 3x2 moment cells (one vectorized md5 arm kernel
    per batch), O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        dis = pd.DataFrame(
            {"doc": doc,
             "term": vals.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("doc").size() \
            .reindex(np.arange(len(b)), fill_value=0) \
            .to_numpy(np.int64)
        arm = (md5_id64_flat(b["doc_id"].to_numpy(np.int64),
                             ":arm")[0] % 2).astype(np.int64)
        rows = []
        for cov, v in (("n_chars",
                        b["n_chars"].to_numpy(np.int64)),
                       ("n_tokens", k),
                       ("n_distinct", dis)):
            for a in (0, 1):
                m = arm == a
                vo = v[m].astype(object)
                rows.append({"covariate": cov, "arm": a,
                             "n": int(m.sum()),
                             "s": int(vo.sum()),
                             "s2": int((vo * vo).sum())})
        return pd.DataFrame(rows)

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["covariate", "arm"], ["n", "s", "s2"], exact_int=True)
    rows = []
    for cov in sorted(m["covariate"].unique()):
        stats = {}
        for a in (0, 1):
            r = m[(m["covariate"] == cov) & (m["arm"] == a)] \
                .iloc[0]
            n, s, s2 = int(r["n"]), int(r["s"]), int(r["s2"])
            mean = np.float64(s) / np.float64(n)
            var = (np.float64(s2)
                   - np.float64(s) * np.float64(s)
                   / np.float64(n)) / (np.float64(n) - 1.0)
            stats[a] = (mean, var)
        m0, va = stats[0]
        m1, vb = stats[1]
        smd = (m1 - m0) / np.sqrt((va + vb) / 2.0)
        rows.append({
            "covariate": cov, "mean_control": m0,
            "mean_treatment": m1, "smd": np.float64(smd),
            "imbalanced": np.int64(1 if np.abs(smd) > 0.1
                                   else 0)})
    return pd.DataFrame(rows)


@register("alarm_runs", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(abs(v - pv)) AS HUGEINT) AS smr,
                 CAST(count(pv) AS BIGINT) AS nmr
          FROM x),
    lim AS (SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   + {c} * (CAST(smr AS DOUBLE)
                            / CAST(nmr AS DOUBLE)) AS ucl
            FROM m),
    b AS (SELECT day,
                 CASE WHEN CAST(v AS DOUBLE)
                           > (SELECT ucl FROM lim)
                      THEN 1 ELSE 0 END AS breach
          FROM d),
    r AS (SELECT day, breach,
                 lag(breach) OVER (ORDER BY day) AS pb
          FROM b),
    runs AS (SELECT CAST(sum(CASE WHEN breach = 1
                              AND (pb IS NULL OR pb = 0)
                              THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_runs,
                    CAST(sum(breach) AS BIGINT) AS n_breaches
             FROM r),
    grp AS (SELECT day, breach,
                   CAST(sum(CASE WHEN breach = 1
                            AND (pb IS NULL OR pb = 0)
                            THEN 1 ELSE 0 END) OVER (
                        ORDER BY day ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS gid
            FROM r),
    lens AS (SELECT gid, CAST(count(*) AS BIGINT) AS len
             FROM grp WHERE breach = 1 GROUP BY gid)
    SELECT (SELECT n_breaches FROM runs) AS n_breach_days,
           (SELECT n_runs FROM runs) AS n_alarm_episodes,
           CAST(COALESCE((SELECT max(len) FROM lens), 0)
                AS BIGINT) AS longest_episode""".format(c=_XMR_C))
def alarm_runs(sf_dir: str):
    """ALARM RUN-LENGTH CENSUS over the XmR upper-limit breaches:
    total breach days, distinct alarm EPISODES (maximal runs of
    consecutive breach days) and the longest episode — the
    alarm-fatigue statistic that turns xmr_control's breach count
    into operational reality (one 5-day episode pages once; five
    scattered days page five times). The limit is the shared XmR
    expression; breach flags, episode starts (breach with
    non-breach predecessor) and run lengths are pure integer
    scans. Scale plan: bounded day-domain combine; the episode
    scan is O(days) driver work."""
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
    s = sum(v)
    mrs = [abs(b - a) for a, b in zip(v, v[1:])]
    ucl = np.float64(s) / np.float64(n) \
        + _XMR_C * (np.float64(sum(mrs)) / np.float64(len(mrs)))
    breach = [1 if np.float64(x) > ucl else 0 for x in v]
    n_breach = sum(breach)
    episodes = 0
    longest = 0
    cur = 0
    prev = 0
    for b_ in breach:
        if b_ == 1 and prev == 0:
            episodes += 1
            cur = 1
        elif b_ == 1:
            cur += 1
        else:
            cur = 0
        longest = max(longest, cur)
        prev = b_
    return pd.DataFrame({
        "n_breach_days": [np.int64(n_breach)],
        "n_alarm_episodes": [np.int64(episodes)],
        "longest_episode": [np.int64(longest)]})


@register("lang_median_ci", sql="""
    WITH h AS (SELECT lang, CAST(n_chars AS BIGINT) AS v,
                      CAST(count(*) AS BIGINT) AS c
               FROM documents GROUP BY lang, n_chars),
    t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n
          FROM h GROUP BY lang),
    r AS (SELECT h.lang, h.v, h.c,
                 CAST(sum(h.c) OVER (PARTITION BY h.lang
                      ORDER BY h.v) AS BIGINT) AS cum,
                 t.n
          FROM h JOIN t ON t.lang = h.lang),
    ks AS (SELECT lang, n,
                  (n + 1) // 2 AS kmed,
                  CAST(floor(CAST(n AS DOUBLE) / 2.0
                       - {z} * sqrt(CAST(n AS DOUBLE)) / 2.0)
                       AS BIGINT) AS klo,
                  CAST(ceil(1.0 + CAST(n AS DOUBLE) / 2.0
                       + {z} * sqrt(CAST(n AS DOUBLE)) / 2.0)
                       AS BIGINT) AS khi
           FROM t),
    pick AS (SELECT ks.lang, ks.n,
        (SELECT min(v) FROM r WHERE r.lang = ks.lang
         AND r.cum >= ks.kmed) AS med,
        (SELECT min(v) FROM r WHERE r.lang = ks.lang
         AND r.cum >= ks.klo) AS lo,
        (SELECT min(v) FROM r WHERE r.lang = ks.lang
         AND r.cum >= ks.khi) AS hi
      FROM ks)
    SELECT lang, n AS n_docs, CAST(med AS BIGINT) AS median_chars,
           CAST(lo AS BIGINT) AS ci_lower,
           CAST(hi AS BIGINT) AS ci_upper
    FROM pick ORDER BY lang""".format(z=_MC_Z))
def lang_median_ci(sf_dir: str):
    """PER-LANGUAGE MEDIAN document length with its distribution-
    free order-statistic 95% CI (ranks n/2 -+ z sqrt(n)/2, the
    median_ci machinery grouped): the per-slice robust-center
    report a corpus dashboard actually ships — medians AND honest
    intervals, so two languages only get called different when
    their intervals say so. All three picks are exact order
    statistics read off per-language value histograms (cumulative
    counts, no row-grain sort); ranks come from one shared float
    expression on n. Scale plan: the bounded (lang x length) grid
    census; per-language rank reads are O(domain) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"lang": b["lang"].to_numpy(object),
                          "v": b["n_chars"].to_numpy(np.int64),
                          "c": np.ones(len(b), np.int64)}) \
            .groupby(["lang", "v"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "v"], ["c"])
    rows = []
    for lang, g in h.groupby("lang"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        cum = np.cumsum(g["c"].to_numpy(np.int64))
        n = int(cum[-1])
        fn_ = np.float64(n)
        kmed = (n + 1) // 2
        klo = int(np.floor(fn_ / 2.0
                           - _MC_Z * np.sqrt(fn_) / 2.0))
        khi = int(np.ceil(1.0 + fn_ / 2.0
                          + _MC_Z * np.sqrt(fn_) / 2.0))

        def pick(k: int) -> int:
            return int(v[np.searchsorted(cum, k)])

        rows.append({
            "lang": lang, "n_docs": np.int64(n),
            "median_chars": np.int64(pick(kmed)),
            "ci_lower": np.int64(pick(klo)),
            "ci_upper": np.int64(pick(khi))})
    return pd.DataFrame(rows).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)
