# round-5 session-5 additions, batch 42: brand representation audit
# of the revenue top-k, a paired t-test on daily arm conversion
# rates, and a first-order Markov transition drift test.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, _read_dim,
                      np, pd, rd, register)
from ...stages.partition import partitioned_apply
from ...stages.window import segment_codes

_RR_TOP = 100
_MD_EV_P = 16


@register("ranking_representation", sql="""
    WITH pr AS (SELECT l_partkey AS pk,
                       CAST(sum(CAST(floor(l_extendedprice * 100
                                           + 0.5) AS BIGINT))
                            AS BIGINT) AS rev
                FROM lineitem GROUP BY pk),
    top AS (SELECT pk FROM (
              SELECT pk, row_number() OVER (ORDER BY rev DESC, pk)
                       AS r
              FROM pr)
            WHERE r <= {k}),
    base AS (SELECT p_brand AS brand,
                    CAST(count(*) AS BIGINT) AS n_catalog
             FROM part GROUP BY p_brand),
    tb AS (SELECT p.p_brand AS brand,
                  CAST(count(*) AS BIGINT) AS n_top
           FROM top JOIN part p ON top.pk = p.p_partkey
           GROUP BY p.p_brand),
    t AS (SELECT CAST(sum(n_catalog) AS BIGINT) AS nc FROM base)
    SELECT base.brand, base.n_catalog,
           CAST(COALESCE(tb.n_top, 0) AS BIGINT) AS n_top,
           CAST(base.n_catalog AS DOUBLE)
             / CAST((SELECT nc FROM t) AS DOUBLE) AS base_share,
           CAST(COALESCE(tb.n_top, 0) AS DOUBLE) / {k}.0
             AS top_share,
           CAST(COALESCE(tb.n_top, 0) AS DOUBLE) / {k}.0
           - CAST(base.n_catalog AS DOUBLE)
             / CAST((SELECT nc FROM t) AS DOUBLE)
             AS representation_gap
    FROM base LEFT JOIN tb ON tb.brand = base.brand
    ORDER BY base.brand""".format(k=_RR_TOP))
def ranking_representation(sf_dir: str):
    """RANKING REPRESENTATION AUDIT: each brand's share of the
    revenue top-{k} parts against its catalog base rate — the
    fairness-of-exposure question (who does the leaderboard
    amplify?) that fairness_audit asks of a classifier, posed to a
    RANKING; brands whose top-share exceeds base-share are
    winner-take-all amplified. The top-{k} cut is an exact integer
    rank (revenue DESC, partkey tie-break); both censuses are
    exact counts and the shares/gaps are shared float expressions.
    Scale plan: per-part revenue cells fold through part-keyed
    partials; the top-{k} is a bounded local-top merge and the
    brand join rides the guarded part dim."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand"])
    pk_arr = part["p_partkey"].to_numpy(np.int64)
    order_ = np.argsort(pk_arr, kind="stable")
    pk_arr = pk_arr[order_]
    brand_arr = part["p_brand"].to_numpy()[order_]

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                       * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "rev": rev}).groupby("pk", as_index=False).sum()
        g["rev"] = g["rev"].astype(np.int64)
        return g

    pr = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk"], ["rev"], exact_int=True)
    pr = pr.assign(rev_int=pr["rev"].map(int)).sort_values(
        ["rev_int", "pk"], ascending=[False, True],
        kind="mergesort").head(_RR_TOP)
    top_pk = pr["pk"].to_numpy(np.int64)
    tb_brands = brand_arr[np.searchsorted(pk_arr, top_pk)]
    top_counts = pd.Series(tb_brands).value_counts()
    base_counts = pd.Series(brand_arr).value_counts()
    nc = int(base_counts.sum())
    rows = []
    for brand in sorted(base_counts.index):
        ncat = int(base_counts[brand])
        ntop = int(top_counts.get(brand, 0))
        bs = np.float64(ncat) / np.float64(nc)
        ts = np.float64(ntop) / np.float64(_RR_TOP)
        rows.append({
            "brand": brand, "n_catalog": np.int64(ncat),
            "n_top": np.int64(ntop), "base_share": bs,
            "top_share": ts, "representation_gap": ts - bs})
    return pd.DataFrame(rows)


@register("paired_t", sql="""
    WITH d AS (SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT)
                        AS day,
                      CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1
                               ELSE 0 END) AS BIGINT) AS t0,
                      CAST(sum(CASE WHEN user_id % 2 = 0
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s0,
                      CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1
                               ELSE 0 END) AS BIGINT) AS t1,
                      CAST(sum(CASE WHEN user_id % 2 = 1
                                    AND event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT)
                        AS s1
               FROM events GROUP BY 1),
    v AS (SELECT CAST(floor((CAST(s1 AS DOUBLE)
                             / CAST(t1 AS DOUBLE)
                             - CAST(s0 AS DOUBLE)
                               / CAST(t0 AS DOUBLE))
                            * 1000000.0 + 0.5) AS BIGINT) AS dm
          FROM d WHERE t0 > 0 AND t1 > 0),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dm) AS HUGEINT) AS s,
                 CAST(sum(CAST(dm AS HUGEINT) * dm) AS HUGEINT)
                   AS s2
          FROM v)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
             AS mean_diff,
           (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt((CAST(s2 AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0)
                  / CAST(n AS DOUBLE)) AS paired_t
    FROM m""")
def paired_t(sf_dir: str):
    """PAIRED T-TEST on daily arm conversion-rate differences: each
    day both user-parity arms report a rate, the within-day
    difference removes the shared day effect (the weekday and
    seasonality noise an unpaired comparison eats as variance —
    CUPED's logic with the day as its own control), and the t uses
    the exact moments of the micro-quantized daily differences.
    Days where either arm has no traffic drop (matching the oracle
    WHERE). Each daily difference is an identical double quantized
    half-up; moments fold exactly; mean and t are shared float
    expressions. Scale plan: day-arm cells through the bounded
    day-domain combine; the t is O(days) driver work."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = (b["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        arm = b["user_id"].to_numpy(np.int64) % 2
        pur = (b["event_type"].to_numpy(object)
               == "purchase").astype(np.int64)
        g = pd.DataFrame({
            "day": day,
            "t0": (arm == 0).astype(np.int64),
            "s0": ((arm == 0) & (pur == 1)).astype(np.int64),
            "t1": (arm == 1).astype(np.int64),
            "s1": ((arm == 1) & (pur == 1)).astype(np.int64)}) \
            .groupby("day", as_index=False).sum()
        for c in ("t0", "s0", "t1", "s1"):
            g[c] = g[c].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["t0", "s0", "t1", "s1"], exact_int=True)
    dms = []
    for _, r in d.iterrows():
        t0, s0 = int(r["t0"]), int(r["s0"])
        t1, s1 = int(r["t1"]), int(r["s1"])
        if t0 > 0 and t1 > 0:
            dms.append(int(np.floor(
                (np.float64(s1) / np.float64(t1)
                 - np.float64(s0) / np.float64(t0))
                * 1000000.0 + 0.5)))
    n = len(dms)
    s = sum(dms)
    s2 = sum(v * v for v in dms)
    mean = np.float64(s) / np.float64(n)
    tstat = mean / np.sqrt(
        (np.float64(s2)
         - np.float64(s) * np.float64(s) / np.float64(n))
        / (np.float64(n) - 1.0) / np.float64(n))
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "mean_diff": [mean / 1000000.0],
        "paired_t": [np.float64(tstat)]})


@register("markov_drift", sql="""
    WITH b AS (SELECT CAST(floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400)
                           + CAST((floor(epoch((SELECT max(ts)
                                        FROM events)) / 86400)
                                   - floor(epoch((SELECT min(ts)
                                        FROM events)) / 86400))
                                  // 2 AS BIGINT) AS BIGINT)
                        AS mid),
    s AS (SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS prev_type,
                 lag(ts) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS prev_ts
          FROM events),
    c AS (SELECT prev_type, event_type AS next_type,
                 CASE WHEN CAST(floor(epoch(prev_ts) / 86400)
                           AS BIGINT) <= (SELECT mid FROM b)
                      THEN 0 ELSE 1 END AS era,
                 CAST(count(*) AS BIGINT) AS n
          FROM s WHERE prev_type IS NOT NULL
          GROUP BY 1, 2, 3),
    piv AS (SELECT prev_type, next_type,
                   CAST(sum(CASE WHEN era = 0 THEN n ELSE 0 END)
                        AS BIGINT) AS n0,
                   CAST(sum(CASE WHEN era = 1 THEN n ELSE 0 END)
                        AS BIGINT) AS n1
            FROM c GROUP BY 1, 2),
    rt AS (SELECT prev_type,
                  CAST(sum(n0) AS BIGINT) AS r0,
                  CAST(sum(n1) AS BIGINT) AS r1
           FROM piv GROUP BY prev_type),
    q AS (SELECT CAST(sum(CASE WHEN piv.n0 + piv.n1 > 0
                               AND rt.r0 > 0 AND rt.r1 > 0 THEN
                 CAST(floor((CAST(piv.n0 AS DOUBLE)
                      - CAST(rt.r0 AS DOUBLE)
                        * (CAST(piv.n0 + piv.n1 AS DOUBLE)
                           / CAST(rt.r0 + rt.r1 AS DOUBLE)))
                 * (CAST(piv.n0 AS DOUBLE)
                    - CAST(rt.r0 AS DOUBLE)
                      * (CAST(piv.n0 + piv.n1 AS DOUBLE)
                         / CAST(rt.r0 + rt.r1 AS DOUBLE)))
                 / (CAST(rt.r0 AS DOUBLE)
                    * (CAST(piv.n0 + piv.n1 AS DOUBLE)
                       / CAST(rt.r0 + rt.r1 AS DOUBLE))
                    * (1.0 - CAST(piv.n0 + piv.n1 AS DOUBLE)
                       / CAST(rt.r0 + rt.r1 AS DOUBLE))
                    * (1.0 - CAST(rt.r0 AS DOUBLE)
                       / CAST(rt.r0 + rt.r1 AS DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END)
                 AS BIGINT) AS chi_micro,
                 CAST(count(*) AS BIGINT) AS n_cells
          FROM piv JOIN rt ON rt.prev_type = piv.prev_type)
    SELECT (SELECT n_cells FROM q) AS n_cells,
           (SELECT chi_micro FROM q) AS chi_sum_micro,
           CAST((SELECT chi_micro FROM q) AS DOUBLE) / 1000000.0
             AS drift_chi2""")
def markov_drift(sf_dir: str):
    """MARKOV TRANSITION DRIFT test: split the corpus at its median
    day and chi-square each (prev, next) transition's era split
    against its ROW's era split — per-row homogeneity summed over
    the matrix (the documented per-cell form with the row-margin
    variance correction), detecting behavioral regime change that
    a stationary chain (markov_entropy_rate, event_transitions)
    would average away. Transition-era cells are exact integer
    folds inside the user exchange; each chi term is built from
    identical doubles and quantizes to micro units half-up before
    the fold. Scale plan: event_transitions' plan with an era tag;
    the drift scan is driver work on the types^2 grid."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts",
                          "event_type"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        us = (b["ts"].astype("datetime64[us]").to_numpy()
              .astype("datetime64[D]").astype(np.int64))
        return pd.DataFrame({"mn": [int(us.min())],
                             "mx": [int(us.max())]})

    bd = ds.map_batches(bounds, batch_format="pandas").to_pandas()
    mid = int(bd["mn"].min()) + (int(bd["mx"].max())
                                 - int(bd["mn"].min())) // 2

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        et = g["event_type"].to_numpy(object)
        day = (g["ts"].astype("datetime64[us]").to_numpy()
               .astype("datetime64[D]").astype(np.int64))
        if len(et) < 2:
            return pd.DataFrame({
                "prev_type": pd.Series(dtype=object),
                "next_type": pd.Series(dtype=object),
                "era": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64)})
        same = codes[1:] == codes[:-1]
        era = (day[:-1][same] > mid).astype(np.int64)
        out = pd.DataFrame({"prev_type": et[:-1][same],
                            "next_type": et[1:][same],
                            "era": era,
                            "n": np.ones(int(same.sum()),
                                         np.int64)}) \
            .groupby(["prev_type", "next_type", "era"],
                     as_index=False).sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    c = _combine_partials(
        partitioned_apply(ds, "user_id", fn, _MD_EV_P,
                          sort_cols=["user_id", "ts",
                                     "event_id"]),
        ["prev_type", "next_type", "era"], ["n"])
    piv = c.pivot_table(index=["prev_type", "next_type"],
                        columns="era", values="n", aggfunc="sum",
                        fill_value=0)
    n0 = piv.get(0, pd.Series(0, index=piv.index)) \
        .to_numpy(np.int64)
    n1 = piv.get(1, pd.Series(0, index=piv.index)) \
        .to_numpy(np.int64)
    prev = np.array([i[0] for i in piv.index], object)
    rows_r0: dict = {}
    rows_r1: dict = {}
    for p_, a, b in zip(prev, n0, n1):
        rows_r0[p_] = rows_r0.get(p_, 0) + int(a)
        rows_r1[p_] = rows_r1.get(p_, 0) + int(b)
    chi = 0
    for p_, a, b in zip(prev, n0, n1):
        tot = int(a) + int(b)
        r0, r1 = rows_r0[p_], rows_r1[p_]
        if tot > 0 and r0 > 0 and r1 > 0:
            share = np.float64(tot) / np.float64(r0 + r1)
            e = np.float64(r0) * share
            chi += int(np.floor(
                (np.float64(int(a)) - e)
                * (np.float64(int(a)) - e)
                / (e * (1.0 - share)
                   * (1.0 - np.float64(r0)
                      / np.float64(r0 + r1)))
                * 1000000.0 + 0.5))
    return pd.DataFrame({
        "n_cells": [np.int64(len(piv))],
        "chi_sum_micro": [np.int64(chi)],
        "drift_chi2": [np.float64(chi) / 1000000.0]})
