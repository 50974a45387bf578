# round-5 session-5 additions, batch 1: Chao1 vocabulary-richness
# estimation per language, the two-group log-rank survival test, and
# the Wald-Wolfowitz runs test on the daily revenue sequence.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

#: logrank_test: churn definition shared with kaplan_meier (q34) — a
#: customer whose last order precedes corpus end by MORE than this
#: many days has churned (event); later customers are right-censored.
_LR_CENSOR_DAYS = 90


@register("chao1_richness", sql="""
    WITH d AS (SELECT lang, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT lang, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n
          FROM w GROUP BY lang, term),
    s AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
                 CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS singletons,
                 CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS doubletons
          FROM c GROUP BY lang)
    SELECT lang, vocab, singletons, doubletons,
           CAST(vocab AS DOUBLE)
             + CAST(singletons AS DOUBLE)
               * CAST(singletons - 1 AS DOUBLE)
               / (2.0 * (CAST(doubletons AS DOUBLE) + 1.0)) AS chao1
    FROM s ORDER BY lang""")
def chao1_richness(sf_dir: str):
    """CHAO1 VOCABULARY-RICHNESS estimator per language: observed
    type count V plus the bias-corrected unseen-mass term
    f1*(f1-1) / (2*(f2+1)) built from the singleton/doubleton
    frequency-of-frequencies — the ecology species-richness estimator
    applied to corpus vocabulary, answering "how much vocabulary does
    another crawl unlock" per language before committing tokenizer
    budget. The correction is ONE shared float expression over exact
    integer censuses (always defined — the +1 denominator needs no
    f2>0 guard). Scale plan: per-batch (lang, term) count partials
    flow through ONE term-keyed hash exchange (a term's rows all
    co-locate, so within-partition totals are global); each partition
    emits 3 scalars per language and the driver combine is
    O(partitions x languages)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        g = pd.DataFrame({
            "lang": np.repeat(b["lang"].to_numpy(object), k),
            "term": vals.to_numpy(zero_copy_only=False),
            "n": np.ones(int(k.sum()), np.int64)}) \
            .groupby(["lang", "term"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    def census(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["lang", "term"], as_index=False)["n"].sum()
        n = a["n"].to_numpy(np.int64)
        out = pd.DataFrame({
            "lang": a["lang"],
            "v": np.ones(len(a), np.int64),
            "f1": (n == 1).astype(np.int64),
            "f2": (n == 2).astype(np.int64)}) \
            .groupby("lang", as_index=False).sum()
        for c in ("v", "f1", "f2"):
            out[c] = out[c].astype(np.int64)
        return out

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["term"], census, 16),
        ["lang"], ["v", "f1", "f2"])
    v = s["v"].to_numpy(np.int64)
    f1 = s["f1"].to_numpy(np.int64)
    f2 = s["f2"].to_numpy(np.int64)
    chao = v.astype(np.float64) \
        + f1.astype(np.float64) * (f1 - 1).astype(np.float64) \
        / (2.0 * (f2.astype(np.float64) + 1.0))
    return pd.DataFrame({
        "lang": s["lang"], "vocab": v, "singletons": f1,
        "doubletons": f2, "chao1": chao}).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)


@register("logrank_test", sql="""
    WITH mx AS (SELECT max(o_orderdate) AS m FROM orders),
    o AS (SELECT o_custkey AS cust, o_orderdate AS d,
                 o_orderpriority AS p,
                 row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders),
    a AS (SELECT cust,
                 CAST(date_diff('day', min(d), max(d)) AS BIGINT)
                   AS dur,
                 CASE WHEN date_diff('day', max(d),
                                     (SELECT m FROM mx)) > {cd}
                      THEN 1 ELSE 0 END AS ev
          FROM o GROUP BY cust),
    f AS (SELECT cust, CASE WHEN p IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END AS grp
          FROM o WHERE rn = 1),
    c2 AS (SELECT a.cust, a.dur, a.ev, f.grp
           FROM a JOIN f ON a.cust = f.cust),
    t AS (SELECT DISTINCT dur FROM c2 WHERE ev = 1),
    r AS (SELECT t.dur AS td,
                 CAST(sum(CASE WHEN c2.dur = t.dur AND c2.ev = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS d,
                 CAST(sum(CASE WHEN c2.dur = t.dur AND c2.ev = 1
                               AND c2.grp = 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c2.grp) AS BIGINT) AS n1
          FROM t JOIN c2 ON c2.dur >= t.dur
          GROUP BY t.dur),
    terms AS (SELECT d1,
          CAST(floor(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
                     / CAST(n AS DOUBLE) * 1000000.0 + 0.5)
               AS BIGINT) AS e1m,
          CASE WHEN n > 1 THEN CAST(floor(
               CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
               / CAST(n AS DOUBLE) * CAST(n - n1 AS DOUBLE)
               / CAST(n AS DOUBLE) * CAST(n - d AS DOUBLE)
               / CAST(n - 1 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
               ELSE 0 END AS vm
      FROM r),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_event_times,
                 CAST(sum(d1) AS BIGINT) AS o1,
                 CAST(sum(e1m) AS BIGINT) AS e1_micro,
                 CAST(sum(vm) AS BIGINT) AS v_micro
          FROM terms)
    SELECT n_event_times, o1, e1_micro, v_micro,
           (CAST(o1 AS DOUBLE)
            - CAST(e1_micro AS DOUBLE) / 1000000.0)
           * (CAST(o1 AS DOUBLE)
              - CAST(e1_micro AS DOUBLE) / 1000000.0)
           / (CAST(v_micro AS DOUBLE) / 1000000.0) AS logrank_chi2
    FROM s""".format(cd=_LR_CENSOR_DAYS))
def logrank_test(sf_dir: str):
    """TWO-GROUP LOG-RANK TEST on customer lifetime: does the
    urgent-first-order acquisition cohort (first order priority
    1-URGENT/2-HIGH) churn on a different survival curve than the
    rest? Lifetimes and censoring reuse kaplan_meier's definitions
    (days first->last order; still-active customers in the final
    90-day window are censored). At each distinct event time the
    observed group-1 deaths, the expected deaths d*n1/n under H0, and
    the hypergeometric variance term quantize to micro units with the
    shared half-up formula BEFORE summing — the chi-square statistic
    is then one shared float expression over three exact integer
    folds, immune to float summation order. Scale plan: orders
    collapse to per-customer (first, last, first-priority) partials
    through one custkey exchange; partitions emit (duration, group,
    event) HISTOGRAM cells — the day domain is bounded, so at-risk
    counts are suffix sums on a tiny driver frame and no
    customer-grain row ever reaches the driver."""
    ds = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_orderpriority"])

    mx_all = int(ds.map_batches(
        lambda b: pd.DataFrame({
            "mx": [b["o_orderdate"].to_numpy("datetime64[D]")
                   .astype(np.int64).max()]}),
        batch_format="pandas").to_pandas()["mx"].max())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        t = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "d": d, "k": b["o_orderkey"].to_numpy(np.int64),
            "p": b["o_orderpriority"]})
        agg = t.groupby("cust", as_index=False).agg(
            mn=("d", "min"), mx=("d", "max"))
        fst = t.sort_values(["d", "k"], kind="mergesort") \
            .drop_duplicates("cust")[["cust", "d", "k", "p"]] \
            .rename(columns={"d": "fd", "k": "fk", "p": "fp"})
        return agg.merge(fst, on="cust")

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        fst = g.sort_values(["fd", "fk"], kind="mergesort") \
            .drop_duplicates("cust")[["cust", "fp"]]
        agg = g.groupby("cust", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max")).merge(fst, on="cust")
        dur = (agg["mx"] - agg["mn"]).to_numpy(np.int64)
        ev = ((mx_all - agg["mx"].to_numpy(np.int64))
              > _LR_CENSOR_DAYS).astype(np.int64)
        grp = agg["fp"].isin(["1-URGENT", "2-HIGH"]) \
            .to_numpy().astype(np.int64)
        out = pd.DataFrame({"dur": dur, "grp": grp, "ev": ev,
                            "c": np.ones(len(agg), np.int64)}) \
            .groupby(["dur", "grp", "ev"], as_index=False).sum()
        out["c"] = out["c"].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["cust"], cells, 16),
        ["dur", "grp", "ev"], ["c"])
    if h.empty or int(h.loc[h["ev"] == 1, "c"].sum()) == 0:
        return pd.DataFrame({
            "n_event_times": [np.int64(0)], "o1": [np.int64(0)],
            "e1_micro": [np.int64(0)], "v_micro": [np.int64(0)],
            "logrank_chi2": [np.nan]})
    # suffix sums over the bounded duration domain
    durs = np.sort(h["dur"].unique())
    idx = {int(t): i for i, t in enumerate(durs)}
    tot = np.zeros(len(durs), np.int64)     # customers at dur
    tot1 = np.zeros(len(durs), np.int64)    # group-1 customers at dur
    dd = np.zeros(len(durs), np.int64)      # events at dur
    dd1 = np.zeros(len(durs), np.int64)     # group-1 events at dur
    for _, r in h.iterrows():
        i, c = idx[int(r["dur"])], int(r["c"])
        tot[i] += c
        if int(r["grp"]) == 1:
            tot1[i] += c
        if int(r["ev"]) == 1:
            dd[i] += c
            if int(r["grp"]) == 1:
                dd1[i] += c
    n_at = np.cumsum(tot[::-1])[::-1]       # at risk: dur >= t
    n1_at = np.cumsum(tot1[::-1])[::-1]
    msk = dd > 0                            # distinct event times
    d = dd[msk].astype(np.float64)
    d1 = dd1[msk]
    n = n_at[msk].astype(np.float64)
    n1 = n1_at[msk].astype(np.float64)
    e1m = np.floor(d * n1 / n * 1000000.0 + 0.5).astype(np.int64)
    ni = n_at[msk]
    vm = np.where(
        ni > 1,
        np.floor(d * n1 / n * (n - n1) / n
                 * (n - d) / np.where(ni > 1, n - 1.0, 1.0)
                 * 1000000.0 + 0.5),
        0.0).astype(np.int64)
    o1 = int(d1.sum())
    e1_micro, v_micro = int(e1m.sum()), int(vm.sum())
    diff = np.float64(o1) - np.float64(e1_micro) / 1000000.0
    chi2 = diff * diff / (np.float64(v_micro) / 1000000.0) \
        if v_micro > 0 else np.nan
    return pd.DataFrame({
        "n_event_times": [np.int64(int(msk.sum()))],
        "o1": [np.int64(o1)], "e1_micro": [np.int64(e1_micro)],
        "v_micro": [np.int64(v_micro)],
        "logrank_chi2": [np.float64(chi2)]})


@register("runs_test", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    sg AS (SELECT day,
                  CASE WHEN CAST(v AS HUGEINT) * (SELECT n FROM m)
                            > (SELECT s FROM m)
                       THEN 1 ELSE 0 END AS g
           FROM d),
    l AS (SELECT g, lag(g) OVER (ORDER BY day) AS pg FROM sg),
    c AS (SELECT CAST(sum(CASE WHEN pg IS NULL OR g <> pg
                               THEN 1 ELSE 0 END) AS BIGINT) AS runs,
                 CAST(sum(g) AS BIGINT) AS n1,
                 CAST(count(*) - sum(g) AS BIGINT) AS n2
          FROM l),
    e AS (SELECT runs, n1, n2,
                 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   / CAST(n1 + n2 AS DOUBLE) + 1.0 AS mu,
                 (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                     - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)))
                 / (CAST(n1 + n2 AS DOUBLE)
                    * CAST(n1 + n2 AS DOUBLE)
                    * (CAST(n1 + n2 AS DOUBLE) - 1.0)) AS s2
          FROM c)
    SELECT CAST(n1 + n2 AS BIGINT) AS n_days, n1 AS n_above,
           n2 AS n_below, runs, mu AS mu_runs,
           (CAST(runs AS DOUBLE) - mu) / sqrt(s2) AS runs_z
    FROM e""")
def runs_test(sf_dir: str):
    """WALD-WOLFOWITZ RUNS TEST for randomness of the daily revenue
    sequence: each day is classified above/below the corpus mean
    (v*n > S compared in exact integer cents — no division, no
    median tie-break), runs of equal signs are counted in day order,
    and the normal-approximation z-score comes from the exact run
    count vs mu = 2*n1*n2/n + 1. Too few runs = trending/clustered
    days, too many = oscillation; the cheap pre-check before fitting
    any time-series model. All inputs to the float expressions are
    exact ints and both engines evaluate the SAME left-associated
    formula. Scale plan: per-batch (day, cents) partials fold through
    the bounded day-domain combine (exact python-int sums); the runs
    scan is O(days) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
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
    sg = np.array([1 if x * n > s else 0 for x in v], np.int64)
    runs = int(1 + (sg[1:] != sg[:-1]).sum()) if n else 0
    n1 = int(sg.sum())
    n2 = n - n1
    f1, f2, fn = np.float64(n1), np.float64(n2), np.float64(n)
    mu = 2.0 * f1 * f2 / fn + 1.0
    s2 = (2.0 * f1 * f2 * (2.0 * f1 * f2 - f1 - f2)) \
        / (fn * fn * (fn - 1.0))
    z = (np.float64(runs) - mu) / np.sqrt(s2)
    return pd.DataFrame({
        "n_days": [np.int64(n)], "n_above": [np.int64(n1)],
        "n_below": [np.int64(n2)], "runs": [np.int64(runs)],
        "mu_runs": [np.float64(mu)], "runs_z": [np.float64(z)]})
