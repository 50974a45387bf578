# round-5 session-5 additions, batch 18: systematic PPS sampling of
# customers by spend, Harrell's C concordance for the survival
# predictor, and a difference-in-differences estimator over
# segment x year.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map
from .q34_session2_additions_7 import _KM_CENSOR_DAYS

_PPS_M = 20
_DID_Y0, _DID_Y1 = 1996, 1997
_DID_SEG = "BUILDING"


@register("pps_sample", sql="""
    WITH c AS (SELECT o_custkey AS cust,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS spend
               FROM orders GROUP BY 1),
    w AS (SELECT cust, spend,
                 CAST(sum(spend) OVER (ORDER BY cust) AS BIGINT)
                   AS cum
          FROM c),
    t AS (SELECT CAST(sum(spend) AS HUGEINT) AS tot FROM c),
    u AS (SELECT CAST(('0x' || substr(md5('pps-seed'), 1, 16))
                      ::UBIGINT % 1000000 AS HUGEINT) AS um),
    thr AS (SELECT CAST(j AS BIGINT) AS draw,
                   CAST(((SELECT um FROM u) + CAST(j AS HUGEINT)
                         * 1000000) * (SELECT tot FROM t)
                        // ({m} * 1000000) AS BIGINT) AS thr
            FROM (SELECT unnest(generate_series(0, {m} - 1))
                    AS j)),
    pick AS (SELECT thr.draw, w.cust, w.spend
             FROM thr JOIN w ON thr.thr >= w.cum - w.spend
                            AND thr.thr < w.cum)
    SELECT draw, cust AS custkey, spend AS spend_cents
    FROM pick ORDER BY draw""".format(m=_PPS_M))
def pps_sample(sf_dir: str):
    """SYSTEMATIC PPS (probability-proportional-to-size) sample of
    {m} customer draws by total spend — the survey-sampling design
    behind audit sampling and monetary-unit sampling: a customer's
    selection chance is exactly its share of revenue, big accounts
    can be drawn more than once, and ONE portable md5 uniform seeds
    the whole systematic sweep (the weighted_sample A-ES policy's
    sibling for WITHOUT-shuffling designs). Thresholds are EXACT
    integer arithmetic ((u + j*1e6)*T // (m*1e6)) against the exact
    cumulative-cents ladder, so membership is integer range
    containment — no float boundary anywhere. Scale plan:
    per-customer spend cells fold through the guarded combine; at
    fleet scale the cumulative ladder becomes the two-phase
    zipWithIndex prefix-offset exchange (systematic_sample's plan)
    — same thresholds, same answer."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "spend": cents}).groupby("cust", as_index=False).sum()
        g["spend"] = g["spend"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["cust"], ["spend"], exact_int=True).sort_values("cust") \
        .reset_index(drop=True)
    spend = [int(x) for x in c["spend"]]
    cum = np.cumsum(spend)
    tot = int(cum[-1])
    import hashlib
    um = int(hashlib.md5(b"pps-seed").hexdigest()[:16],
             16) % 1000000
    rows = []
    for j in range(_PPS_M):
        thr = (um + j * 1000000) * tot // (_PPS_M * 1000000)
        i = int(np.searchsorted(cum, thr, side="right"))
        rows.append({"draw": np.int64(j),
                     "custkey": np.int64(int(c["cust"].iloc[i])),
                     "spend_cents": np.int64(spend[i])})
    return pd.DataFrame(rows)


@register("harrell_c", sql="""
    WITH span AS (SELECT max(o_orderdate) AS mx FROM orders),
    o AS (SELECT o_custkey AS cust, o_orderdate AS d,
                 o_totalprice AS p,
                 row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders),
    c AS (SELECT cust,
                 CAST(date_diff('day', min(d), max(d)) AS BIGINT)
                   AS dur,
                 CAST(CASE WHEN date_diff('day', max(d),
                             (SELECT mx FROM span)) > {cd}
                      THEN 1 ELSE 0 END AS BIGINT) AS ev
          FROM o GROUP BY cust),
    f AS (SELECT cust, CAST(floor(p * 100 + 0.5) AS BIGINT)
                         AS score
          FROM o WHERE rn = 1),
    j AS (SELECT c.cust, c.dur, c.ev, f.score
          FROM c JOIN f ON c.cust = f.cust),
    p AS (SELECT CAST(count(*) AS BIGINT) AS comparable,
                 CAST(sum(CASE WHEN b.score > a.score
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS concordant,
                 CAST(sum(CASE WHEN b.score = a.score
                          THEN 1 ELSE 0 END) AS BIGINT) AS ties
          FROM j a JOIN j b ON a.ev = 1 AND a.dur < b.dur)
    SELECT comparable, concordant, ties,
           CAST(2 * concordant + ties AS DOUBLE)
           / CAST(2 * comparable AS DOUBLE) AS harrell_c
    FROM p""".format(cd=_KM_CENSOR_DAYS))
def harrell_c(sf_dir: str):
    """HARRELL'S C-STATISTIC for a survival predictor: does a
    customer's FIRST order value (the acquisition-size risk score)
    predict who stays active longer? Over all comparable pairs
    (i churned at dur_i, j observed beyond dur_i), count pairs
    where the longer-lived customer also has the higher score; C =
    (concordant + ties/2) / comparable computed as the EXACT
    integer ratio (2c + t)/(2n) — the survival-model evaluation
    operator completing kaplan_meier / logrank_test / rmst (those
    fit curves; this scores a predictor). Lifetimes and censoring
    reuse the shared definitions. Scale plan: customers collapse to
    (dur, ev, score) through one custkey exchange; the pair census
    runs on the driver under the combine guard, sorted-by-duration
    with a score-rank Fenwick fold as the documented O(n log n)
    scale path."""
    ds = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        t = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "d": d, "k": b["o_orderkey"].to_numpy(np.int64),
            "p": cents})
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
            mn=("mn", "min"), mx=("mx", "max")).merge(fst,
                                                      on="cust")
        return agg[["cust", "mn", "mx", "fp"]]

    rows = partition_map(
        ds.map_batches(partial, batch_format="pandas"),
        ["cust"], cells, 16).limit(1_000_001).to_pandas()
    if len(rows) > 1_000_000:
        raise ValueError("harrell_c: customer frame exceeds the "
                         "driver bound; use the Fenwick tier")
    mx_all = int(rows["mx"].max())
    dur = (rows["mx"] - rows["mn"]).to_numpy(np.int64)
    ev = ((mx_all - rows["mx"].to_numpy(np.int64))
          > _KM_CENSOR_DAYS).astype(np.int64)
    score = rows["fp"].to_numpy(np.int64)
    ai = np.nonzero(ev == 1)[0]
    comp = conc = ties = 0
    for i in ai:
        m = dur > dur[i]
        comp += int(m.sum())
        conc += int((score[m] > score[i]).sum())
        ties += int((score[m] == score[i]).sum())
    return pd.DataFrame({
        "comparable": [np.int64(comp)],
        "concordant": [np.int64(conc)],
        "ties": [np.int64(ties)],
        "harrell_c": [np.float64(2 * conc + ties)
                      / np.float64(2 * comp)]})


@register("diff_in_diff", sql="""
    WITH o AS (SELECT o_custkey AS cust,
                      CAST(year(o_orderdate) AS BIGINT) AS y,
                      CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x
               FROM orders
               WHERE year(o_orderdate) IN ({y0}, {y1})),
    j AS (SELECT CASE WHEN c.c_mktsegment = '{seg}'
                      THEN 1 ELSE 0 END AS grp,
                 CASE WHEN o.y = {y1} THEN 1 ELSE 0 END AS post,
                 o.x
          FROM o JOIN customer c ON o.cust = c.c_custkey),
    g AS (SELECT grp, post, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x) AS BIGINT) AS s
          FROM j GROUP BY grp, post),
    p AS (SELECT
            max(CASE WHEN grp = 1 AND post = 1 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS tp,
            max(CASE WHEN grp = 1 AND post = 0 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS tb,
            max(CASE WHEN grp = 0 AND post = 1 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS cp,
            max(CASE WHEN grp = 0 AND post = 0 THEN
                CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS cb
          FROM g)
    SELECT tp AS treat_post_mean, tb AS treat_base_mean,
           cp AS ctrl_post_mean, cb AS ctrl_base_mean,
           (tp - tb) - (cp - cb) AS did_cents
    FROM p""".format(y0=_DID_Y0, y1=_DID_Y1, seg=_DID_SEG))
def diff_in_diff(sf_dir: str):
    """DIFFERENCE-IN-DIFFERENCES: did BUILDING-segment customers'
    mean order value move differently from everyone else's between
    {y0} and {y1}? The 2x2 canonical causal estimator —
    (treat_post - treat_base) - (ctrl_post - ctrl_base) — on
    exact-integer cell sums, each mean ONE shared float division
    (the parallel-trends workhorse that ab_test cannot replace when
    assignment wasn't randomized). Scale plan: orders and the
    customer segment co-partition through ONE custkey exchange
    (tagged union — no broadcast of the customer table); partitions
    emit the 2x2 cell moments and the driver does four divisions."""
    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    cust = rd.read_parquet(_path(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])

    def o_part(b: pd.DataFrame) -> pd.DataFrame:
        y = b["o_orderdate"].dt.year.to_numpy(np.int64)
        m = (y == _DID_Y0) | (y == _DID_Y1)
        x = np.floor(
            b["o_totalprice"].to_numpy(np.float64)[m] * 100
            + 0.5).astype(np.int64)
        return pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64)[m],
            "post": (y[m] == _DID_Y1).astype(np.int64),
            "x": x, "seg": np.full(int(m.sum()), "", object),
            "t": np.zeros(int(m.sum()), np.int64)})

    def c_part(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cust": b["c_custkey"].to_numpy(np.int64),
            "post": np.zeros(len(b), np.int64),
            "x": np.zeros(len(b), np.int64),
            "seg": b["c_mktsegment"].to_numpy(object),
            "t": np.ones(len(b), np.int64)})

    u = orders.map_batches(o_part, batch_format="pandas").union(
        cust.map_batches(c_part, batch_format="pandas"))

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        segs = g.loc[g["t"] == 1, ["cust", "seg"]] \
            .drop_duplicates("cust")
        ords = g[g["t"] == 0].merge(segs, on="cust",
                                    suffixes=("", "_c"))
        if not len(ords):
            return pd.DataFrame({
                "grp": pd.Series(dtype=np.int64),
                "post": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "s": pd.Series(dtype=np.int64)})
        grp = (ords["seg_c"].to_numpy(object)
               == _DID_SEG).astype(np.int64)
        out = pd.DataFrame({
            "grp": grp, "post": ords["post"].to_numpy(np.int64),
            "n": np.ones(len(ords), np.int64),
            "s": ords["x"].to_numpy(np.int64)}) \
            .groupby(["grp", "post"], as_index=False).sum()
        for c in ("n", "s"):
            out[c] = out[c].astype(np.int64)
        return out

    g = _combine_partials(
        partition_map(u, ["cust"], cells, 16),
        ["grp", "post"], ["n", "s"], exact_int=True)

    def mean_of(grp: int, post: int) -> np.float64:
        r = g[(g["grp"] == grp) & (g["post"] == post)]
        return np.float64(int(r["s"].iloc[0])) \
            / np.float64(int(r["n"].iloc[0]))

    tp, tb = mean_of(1, 1), mean_of(1, 0)
    cp, cb = mean_of(0, 1), mean_of(0, 0)
    return pd.DataFrame({
        "treat_post_mean": [tp], "treat_base_mean": [tb],
        "ctrl_post_mean": [cp], "ctrl_base_mean": [cb],
        "did_cents": [(tp - tb) - (cp - cb)]})
