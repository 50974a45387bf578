# round-5 session-5 additions, batch 17: two-way ANOVA over the
# weekday x month grid, the directly-follows transition latency
# table, and Cochran's Q for three matched binary raters.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _events,
                      _path, np, pd, rd, register)
from ...stages.partition import partitioned_apply
from ...stages.window import segment_codes

_CQ_CHARS = 300
_CQ_TOKS = 55
_CQ_DIST = 25
_EV_P = 16


@register("twoway_anova", sql="""
    WITH o AS (SELECT CAST(isodow(o_orderdate) AS BIGINT) AS a,
                      CAST(month(o_orderdate) AS BIGINT) AS b,
                      CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x
               FROM orders),
    cell AS (SELECT a, b, CAST(count(*) AS BIGINT) AS ng,
                    CAST(sum(x) AS BIGINT) AS sg
             FROM o GROUP BY a, b),
    t AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
                 CAST(sum(sg) AS HUGEINT) AS tt,
                 CAST(count(*) AS BIGINT) AS n_cells,
                 CAST(count(DISTINCT a) AS BIGINT) AS na,
                 CAST(count(DISTINCT b) AS BIGINT) AS nb
          FROM cell),
    q AS (SELECT CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                   AS qq FROM o),
    cm AS (SELECT CAST(floor(CAST((SELECT tt FROM t) AS DOUBLE)
                  * CAST((SELECT tt FROM t) AS DOUBLE)
                  / CAST((SELECT n FROM t) AS DOUBLE) + 0.5)
                  AS HUGEINT) AS c),
    sa AS (SELECT CAST(sum(CAST(floor(CAST(sg AS DOUBLE)
                  * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                  + 0.5) AS HUGEINT)) AS HUGEINT) AS v
           FROM (SELECT a, CAST(sum(ng) AS BIGINT) AS ng,
                        CAST(sum(sg) AS BIGINT) AS sg
                 FROM cell GROUP BY a)),
    sb AS (SELECT CAST(sum(CAST(floor(CAST(sg AS DOUBLE)
                  * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                  + 0.5) AS HUGEINT)) AS HUGEINT) AS v
           FROM (SELECT b, CAST(sum(ng) AS BIGINT) AS ng,
                        CAST(sum(sg) AS BIGINT) AS sg
                 FROM cell GROUP BY b)),
    sc AS (SELECT CAST(sum(CAST(floor(CAST(sg AS DOUBLE)
                  * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)
                  + 0.5) AS HUGEINT)) AS HUGEINT) AS v
           FROM cell),
    f AS (SELECT (SELECT n FROM t) AS n,
                 (SELECT na FROM t) AS na,
                 (SELECT nb FROM t) AS nb,
                 (SELECT n_cells FROM t) AS nc,
                 CAST((SELECT v FROM sa) - (SELECT c FROM cm)
                      AS DOUBLE) AS ssa,
                 CAST((SELECT v FROM sb) - (SELECT c FROM cm)
                      AS DOUBLE) AS ssb,
                 CAST((SELECT v FROM sc) - (SELECT c FROM cm)
                      AS DOUBLE) AS ssc,
                 CAST((SELECT qq FROM q) - (SELECT v FROM sc)
                      AS DOUBLE) AS ssw)
    SELECT n AS n_orders, na AS n_dow, nb AS n_months,
           nc AS n_cells, ssa AS ss_dow, ssb AS ss_month,
           ssc - ssa - ssb AS ss_interaction, ssw AS ss_within,
           (ssa / CAST(na - 1 AS DOUBLE))
           / (ssw / CAST(n - nc AS DOUBLE)) AS f_dow,
           (ssb / CAST(nb - 1 AS DOUBLE))
           / (ssw / CAST(n - nc AS DOUBLE)) AS f_month,
           ((ssc - ssa - ssb)
            / CAST((na - 1) * (nb - 1) AS DOUBLE))
           / (ssw / CAST(n - nc AS DOUBLE)) AS f_interaction
    FROM f""")
def twoway_anova(sf_dir: str):
    """TWO-WAY ANOVA of order value over the weekday x month grid:
    main-effect and interaction sums of squares (classical
    weighted-means decomposition on the unbalanced grid —
    documented choice) with F ratios against the within-cell error
    — does the weekly pattern CHANGE with season, which the two
    one-way tests (dow_anova, orders_monthly) cannot ask? Cell,
    marginal and grand moments are exact integer folds; every
    S^2/n rational quantizes to whole units half-up before its
    cross-group fold (HUGEINT / python int), so each SS is a
    difference of identically-quantized integers and each F is a
    shared float expression. Scale plan: bounded 84-cell moment
    partials, map-only; the SS scan is driver-side grid
    arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        a = b["o_orderdate"].dt.dayofweek.to_numpy(np.int64) + 1
        mo = b["o_orderdate"].dt.month.to_numpy(np.int64)
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"a": a, "b": mo,
                          "ng": np.ones(len(b), np.int64),
                          "sg": x}) \
            .groupby(["a", "b"], as_index=False).sum()
        for c in ("ng", "sg"):
            g[c] = g[c].astype(np.int64)
        xo = x.astype(object)
        g["qq"] = 0
        q = pd.DataFrame({"a": a, "b": mo, "qq": xo * xo}) \
            .groupby(["a", "b"], as_index=False).sum()
        return g.drop(columns=["qq"]).merge(q, on=["a", "b"])

    cell = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["a", "b"], ["ng", "sg", "qq"], exact_int=True)
    n = sum(int(v) for v in cell["ng"])
    tt = sum(int(v) for v in cell["sg"])
    qq = sum(int(v) for v in cell["qq"])
    na = cell["a"].nunique()
    nb = cell["b"].nunique()
    nc = len(cell)
    cm = int(np.floor(np.float64(tt) * np.float64(tt)
                      / np.float64(n) + 0.5))

    def qsum(groups) -> int:
        return sum(int(np.floor(
            np.float64(int(r["sg"])) * np.float64(int(r["sg"]))
            / np.float64(int(r["ng"])) + 0.5))
            for _, r in groups.iterrows())

    ga = cell.groupby("a", as_index=False).agg(
        ng=("ng", lambda s: sum(int(v) for v in s)),
        sg=("sg", lambda s: sum(int(v) for v in s)))
    gb = cell.groupby("b", as_index=False).agg(
        ng=("ng", lambda s: sum(int(v) for v in s)),
        sg=("sg", lambda s: sum(int(v) for v in s)))
    ssa = np.float64(qsum(ga) - cm)
    ssb = np.float64(qsum(gb) - cm)
    ssc = np.float64(qsum(cell) - cm)
    ssw = np.float64(qq - qsum(cell))
    msw = ssw / np.float64(n - nc)
    return pd.DataFrame({
        "n_orders": [np.int64(n)], "n_dow": [np.int64(na)],
        "n_months": [np.int64(nb)], "n_cells": [np.int64(nc)],
        "ss_dow": [ssa], "ss_month": [ssb],
        "ss_interaction": [ssc - ssa - ssb], "ss_within": [ssw],
        "f_dow": [(ssa / np.float64(na - 1)) / msw],
        "f_month": [(ssb / np.float64(nb - 1)) / msw],
        "f_interaction": [((ssc - ssa - ssb)
                           / np.float64((na - 1) * (nb - 1)))
                          / msw]})


@register("transition_latency", sql="""
    WITH s AS (SELECT event_type, ts, user_id, event_id,
                      lag(event_type) OVER w AS prev_type,
                      lag(ts) OVER w AS prev_ts
               FROM events
               WINDOW w AS (PARTITION BY user_id
                            ORDER BY ts, event_id)),
    g AS (SELECT prev_type, event_type AS next_type,
                 CAST(floor(CAST(epoch_us(ts) - epoch_us(prev_ts)
                                 AS DOUBLE) / 3600000000.0)
                      AS BIGINT) AS gap_h
          FROM s WHERE prev_type IS NOT NULL),
    c AS (SELECT prev_type, next_type, gap_h,
                 CAST(count(*) AS BIGINT) AS c
          FROM g GROUP BY 1, 2, 3),
    r AS (SELECT prev_type, next_type, gap_h, c,
                 sum(c) OVER (PARTITION BY prev_type, next_type
                              ORDER BY gap_h) AS cum,
                 sum(c) OVER (PARTITION BY prev_type, next_type)
                   AS n
          FROM c)
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n_gaps,
           CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN gap_h
                    END) AS BIGINT) AS median_gap_hours
    FROM r GROUP BY prev_type, next_type, n
    ORDER BY prev_type, next_type""")
def transition_latency(sf_dir: str):
    """DIRECTLY-FOLLOWS TRANSITION LATENCY table (process mining):
    for every consecutive event-type transition inside a user's
    stream, the lower-median gap in whole hours — the bottleneck
    census that turns event_transitions' count matrix into 'WHERE
    does the journey stall'. Gaps floor to integer hours (exact
    epoch-microsecond arithmetic), medians are exact order
    statistics over per-transition gap histograms — no float
    anywhere. Scale plan: the lag runs INSIDE the one user_id
    exchange's sorted partitions (event_transitions' plan);
    partitions pre-aggregate to (transition, gap-hour) histogram
    cells whose domain is bounded by types^2 x corpus span."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts",
                          "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        et = g["event_type"].to_numpy(object)
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        if len(et) < 2:
            return pd.DataFrame({
                "prev_type": pd.Series(dtype=object),
                "next_type": pd.Series(dtype=object),
                "gap_h": pd.Series(dtype=np.int64),
                "c": pd.Series(dtype=np.int64)})
        same = codes[1:] == codes[:-1]
        gap = (us[1:] - us[:-1])[same]
        gap_h = np.floor(gap.astype(np.float64)
                         / 3600000000.0).astype(np.int64)
        out = pd.DataFrame({"prev_type": et[:-1][same],
                            "next_type": et[1:][same],
                            "gap_h": gap_h,
                            "c": np.ones(int(same.sum()),
                                         np.int64)}) \
            .groupby(["prev_type", "next_type", "gap_h"],
                     as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    parts = partitioned_apply(ds, "user_id", fn, _EV_P,
                              sort_cols=["user_id", "ts",
                                         "event_id"]) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("transition_latency: gap histogram too "
                         "large for the driver combine")
    c = parts.groupby(["prev_type", "next_type", "gap_h"],
                      as_index=False).agg(c=("c", "sum")) \
        .sort_values(["prev_type", "next_type", "gap_h"]) \
        .reset_index(drop=True)
    rows = []
    for (p, nx), g in c.groupby(["prev_type", "next_type"]):
        n = int(g["c"].sum())
        cum = g["c"].cumsum()
        k = (n + 1) // 2
        med = int(g["gap_h"].to_numpy(np.int64)[
            (cum >= k).to_numpy().argmax()])
        rows.append({"prev_type": p, "next_type": nx,
                     "n_gaps": np.int64(n),
                     "median_gap_hours": np.int64(med)})
    return pd.DataFrame(rows).sort_values(
        ["prev_type", "next_type"],
        kind="mergesort").reset_index(drop=True)


@register("cochran_q", sql="""
    WITH f AS (SELECT CASE WHEN n_chars >= {ch} THEN 1 ELSE 0 END
                        AS a,
                      CASE WHEN CAST(CASE WHEN trim(text,
                                          E' \\t\\n\\r\\f') = ''
                                THEN 0
                                ELSE len(string_split_regex(
                                    trim(text, E' \\t\\n\\r\\f'),
                                    '[ \\t\\n\\r\\f]+')) END
                                AS BIGINT) >= {tk}
                           THEN 1 ELSE 0 END AS b,
                      CASE WHEN CAST(CASE WHEN trim(text,
                                          E' \\t\\n\\r\\f') = ''
                                THEN 0
                                ELSE len(list_distinct(
                                    string_split_regex(
                                    trim(text, E' \\t\\n\\r\\f'),
                                    '[ \\t\\n\\r\\f]+'))) END
                                AS BIGINT) >= {ds}
                           THEN 1 ELSE 0 END AS c
               FROM documents),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a) AS BIGINT) AS ta,
                 CAST(sum(b) AS BIGINT) AS tb,
                 CAST(sum(c) AS BIGINT) AS tc,
                 CAST(sum(a + b + c) AS BIGINT) AS su,
                 CAST(sum((a + b + c) * (a + b + c)) AS BIGINT)
                   AS su2
          FROM f)
    SELECT n AS n_docs, ta AS t_chars, tb AS t_tokens,
           tc AS t_distinct,
           CAST(2 * (3 * (ta * ta + tb * tb + tc * tc)
                     - (ta + tb + tc) * (ta + tb + tc))
                AS DOUBLE)
           / CAST(3 * su - su2 AS DOUBLE) AS cochran_q
    FROM s""".format(ch=_CQ_CHARS, tk=_CQ_TOKS, ds=_CQ_DIST))
def cochran_q(sf_dir: str):
    """COCHRAN'S Q for three matched binary raters — the char-
    length, token-count and distinct-token heuristics each pass/
    fail every document: do the three flags have the SAME marginal
    pass rate (the k-sample extension of mcnemar_test, testing
    marginal homogeneity where fleiss_kappa tested agreement)?
    Q = (k-1)(k*sum T_j^2 - (sum T_j)^2) / (k*sum u_i - sum u_i^2)
    is built ENTIRELY from exact integer folds (per-doc pass-count
    first/second moments and the three column totals) with one
    final shared float division — zero quantization needed
    anywhere. Scale plan: map-only 6-cell partials, O(blocks)
    driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        dis = pd.DataFrame(
            {"doc": doc,
             "term": vals.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("doc").size() \
            .reindex(np.arange(len(b)), fill_value=0) \
            .to_numpy(np.int64)
        a = (b["n_chars"].to_numpy(np.int64)
             >= _CQ_CHARS).astype(np.int64)
        t = (k >= _CQ_TOKS).astype(np.int64)
        c = (dis >= _CQ_DIST).astype(np.int64)
        u = a + t + c
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "ta": np.array([int(a.sum())], np.int64),
            "tb": np.array([int(t.sum())], np.int64),
            "tc": np.array([int(c.sum())], np.int64),
            "su": np.array([int(u.sum())], np.int64),
            "su2": np.array([int((u * u).sum())], np.int64)})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "ta", "tb", "tc", "su", "su2"])
    n = int(s["n"].iloc[0])
    ta, tb, tc = (int(s[c].iloc[0]) for c in ("ta", "tb", "tc"))
    su, su2 = int(s["su"].iloc[0]), int(s["su2"].iloc[0])
    num = 2 * (3 * (ta * ta + tb * tb + tc * tc)
               - (ta + tb + tc) * (ta + tb + tc))
    den = 3 * su - su2
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "t_chars": [np.int64(ta)],
        "t_tokens": [np.int64(tb)], "t_distinct": [np.int64(tc)],
        "cochran_q": [np.float64(num) / np.float64(den)]})
