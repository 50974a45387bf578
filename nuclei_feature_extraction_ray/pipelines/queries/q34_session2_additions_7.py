# round-5 session-2 additions, batch 7: Kaplan-Meier survival with
# right-censoring (customer churn curve), a Johnson-Lindenstrauss
# sign-projection of the embedding table with an md5-replayable sign
# matrix, and lognormal MLE parameter fitting via per-term quantized
# log moments.
from __future__ import annotations

from ._shared import (ORACLE, _combine_partials, _events, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)
from ...functions.texture import _sql_r6, r6

#: kaplan_meier: a customer whose LAST order is within this many days
#: of the corpus end is right-CENSORED (their churn was not observed)
_KM_CENSOR_DAYS = 90

#: embedding_jl: projected dimensionality and input fixed-point grid
_JL_K = 16
_JL_GRID = 1000.0
_JL_DIM = 64


def _micro_ln_sql(expr: str) -> str:
    """Half-away micro-quantized natural log, the shared per-term
    fold idiom (value_psi / source_kl family)."""
    e = "ln(%s)" % expr
    return ("CASE WHEN ({e}) >= 0 THEN "
            "CAST(floor(({e})*1000000.0 + 0.5) AS BIGINT) ELSE "
            "-CAST(floor(-({e})*1000000.0 + 0.5) AS BIGINT) END"
            ).format(e=e)


def _micro_ln(x: np.ndarray) -> np.ndarray:
    lx = np.log(x)
    return np.copysign(np.floor(np.abs(lx) * 1e6 + 0.5),
                       lx).astype(np.int64)


@register("kaplan_meier", sql="""
    WITH span AS (SELECT max(o_orderdate) AS mx FROM orders),
    c AS (
      SELECT o_custkey,
             CAST(date_diff('day', min(o_orderdate),
                            max(o_orderdate)) AS BIGINT) AS dur,
             CAST(CASE WHEN date_diff('day', max(o_orderdate),
                         (SELECT mx FROM span)) > {cd}
                  THEN 1 ELSE 0 END AS BIGINT) AS ev
      FROM orders GROUP BY 1),
    h AS (SELECT dur, CAST(count(*) AS BIGINT) AS n_all,
                 CAST(sum(ev) AS BIGINT) AS d
          FROM c GROUP BY 1),
    r AS (SELECT dur, d,
                 CAST(sum(n_all) OVER (ORDER BY dur DESC
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
          FROM h),
    t AS (SELECT dur, n_risk, d,
                 CASE WHEN d < n_risk THEN {term} ELSE 0 END AS term,
                 CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS hit0
          FROM r WHERE d > 0)
    SELECT dur AS duration_days, n_risk, d AS d_events,
           CAST(sum(term) OVER w AS BIGINT) AS surv_log_micro,
           CAST(max(hit0) OVER w AS BIGINT) AS reaches_zero
    FROM t WINDOW w AS (ORDER BY dur ROWS UNBOUNDED PRECEDING)
    ORDER BY dur""".format(
        cd=_KM_CENSOR_DAYS,
        term=_micro_ln_sql(
            "CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)")))
def kaplan_meier(sf_dir: str):
    """KAPLAN-MEIER survival curve of customer lifetime (days from
    first to last order) with right-censoring: a customer still
    ordering within the final _KM_CENSOR_DAYS window is censored — they hold
    a place in the at-risk count up to their observed duration but
    contribute no churn event. Survival is reported as the CUMULATIVE
    LOG in exact micro-nats (each step's ln((n-d)/n) quantized
    half-away per term, then int64 window sums — the value_psi fold
    policy), so both engines agree bit-for-bit; steps where every
    at-risk customer churns set `reaches_zero` instead of ln(0).
    Plan: one tiny pass pins the global corpus-end date; orders then
    collapse to per-customer (first, last) partials through one
    customer exchange whose partitions emit duration-day HISTOGRAM
    partials — the day domain is bounded, so at-risk counts are one
    suffix sum on the driver and no customer-grain frame ever leaves
    the cluster."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate"])

    mx_all = int(ds.map_batches(
        lambda b: pd.DataFrame({
            "mx": [b["o_orderdate"].to_numpy("datetime64[D]")
                   .astype(np.int64).max()]}),
        batch_format="pandas").to_pandas()["mx"].max())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        g = pd.DataFrame({
            "cust": b["o_custkey"].to_numpy(np.int64),
            "mn": d, "mx": d}) \
            .groupby("cust", as_index=False).agg(
                mn=("mn", "min"), mx=("mx", "max"))
        return g

    parts = ds.map_batches(partial, batch_format="pandas")

    def hist_part(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("cust", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))
        dur = (a["mx"] - a["mn"]).to_numpy(np.int64)
        ev = ((mx_all - a["mx"].to_numpy(np.int64))
              > _KM_CENSOR_DAYS).astype(np.int64)
        out = pd.DataFrame({
            "dur": dur, "n_all": np.ones(len(a), np.int64),
            "ev": ev}).groupby("dur", as_index=False).sum()
        for c in ("n_all", "ev"):
            out[c] = out[c].astype(np.int64)
        return out

    h = _combine_partials(
        partition_map(parts, ["cust"], hist_part, 16),
        ["dur"], ["n_all", "ev"])
    h = h.sort_values("dur", kind="mergesort").reset_index(drop=True)
    n_all = h["n_all"].to_numpy(np.int64)
    d = h["ev"].to_numpy(np.int64)
    n_risk = np.cumsum(n_all[::-1])[::-1]
    keep = d > 0
    dur_k, nr, dk = h["dur"].to_numpy(np.int64)[keep], \
        n_risk[keep], d[keep]
    term = np.where(
        dk < nr,
        _micro_ln(np.maximum(nr - dk, 1) / nr.astype(np.float64)),
        0).astype(np.int64)
    hit0 = (dk >= nr).astype(np.int64)
    return pd.DataFrame({
        "duration_days": dur_k,
        "n_risk": nr, "d_events": dk,
        "surv_log_micro": np.cumsum(term).astype(np.int64),
        "reaches_zero": np.maximum.accumulate(hit0).astype(np.int64)})


def _jl_signs() -> np.ndarray:
    """(dim, k) +/-1 sign matrix from md5 parity — 1024 hashes,
    computed once and identical to the SQL replay."""
    import hashlib
    s = np.empty((_JL_DIM, _JL_K), np.int64)
    for i in range(_JL_DIM):
        for j in range(_JL_K):
            h = int(hashlib.md5(("%d#%d" % (i + 1, j + 1))
                                .encode()).hexdigest()[:16], 16)
            s[i, j] = 1 if h % 2 == 0 else -1
    return s


@register("embedding_jl", sql="""
    WITH m AS (
      SELECT vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * {g} + 0.5)
                  AS BIGINT) AS c
      FROM embeddings CROSS JOIN generate_series(1, {d}) gs(i)),
    s AS (
      SELECT i, j,
             CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || '#'
                        || CAST(j AS VARCHAR)), 1, 16))::UBIGINT
                       % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM generate_series(1, {d}) a(i)
      CROSS JOIN generate_series(1, {k}) b(j))
    SELECT m.vec_id, CAST(s.j AS BIGINT) AS j,
           CAST(sum(m.c * s.sgn) AS BIGINT) AS y
    FROM m JOIN s ON m.i = s.i
    GROUP BY 1, 2""".format(g=_JL_GRID, d=_JL_DIM, k=_JL_K))
def embedding_jl(sf_dir: str):
    """JOHNSON-LINDENSTRAUSS sign projection of the embedding table
    to k=16 dimensions (Achlioptas' database-friendly +/-1 variant):
    y_j = sum_i sign(i,j) * c_i over the fixed-point input grid, with
    the sign matrix derived from md5 PARITY so the oracle replays it
    exactly — distance sketches cheap enough to precede any ANN tier.
    Integer dots are order-free, so no float summation can diverge;
    the 1024-entry sign matrix is computed once per actor and the
    stage is pure map (no exchange)."""
    signs = _jl_signs()
    sref = ray.put(signs)

    class Project:
        def __init__(self):
            self.S = ray.get(sref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            C = np.stack([
                np.floor(np.asarray(v, np.float64) * _JL_GRID + 0.5)
                for v in b["embedding"]]).astype(np.int64)
            Y = C @ self.S
            n, k = Y.shape
            return pd.DataFrame({
                "vec_id": np.repeat(
                    b["vec_id"].to_numpy(np.int64), k),
                "j": np.tile(np.arange(1, k + 1, dtype=np.int64), n),
                "y": Y.ravel().astype(np.int64)})

    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    return ds.map_batches(Project, batch_format="pandas",
                          concurrency=2)


@register("lognormal_fit", sql="""
    WITH l AS (SELECT {li} AS li FROM events WHERE value > 0),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(li AS HUGEINT)) AS HUGEINT) AS sl,
                 CAST(sum(CAST(li AS HUGEINT) * li) AS HUGEINT)
                   AS sll
          FROM l)
    SELECT n,
           {mu} AS mu,
           {sg} AS sigma
    FROM s""".format(
        li=_micro_ln_sql("value"),
        mu=_sql_r6("CAST(sl AS DOUBLE) / (1000000.0 * n)"),
        sg=_sql_r6("sqrt(CAST(n * sll - sl * sl AS DOUBLE))"
                   " / (1000000.0 * n)")))
def lognormal_fit(sf_dir: str):
    """Lognormal MLE parameters of the event-value distribution:
    mu = mean(ln v), sigma = population std(ln v) — the standard
    heavy-tail model fit behind revenue simulations and outlier
    thresholds. Each row's ln(value) is quantized half-away to
    micro-nats (ONE shared formula both engines), so the sufficient
    statistics fold as exact ints (engine: per-batch int64 partials
    + python-int driver fold; SQL: HUGEINT) and mu/sigma are single
    shared-r6 double expressions. Map-only with a one-row combine."""
    ds = _events(sf_dir, columns=["value"])

    _BASE = 1 << 62        # sll can pass int64 on big blocks: ship
    #                        it as exact (hi, lo) int64 halves

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value"].to_numpy(np.float64)
        li = _micro_ln(v[v > 0])    # lognormal: positive support only
        sll = int((li.astype(object) * li.astype(object)).sum())
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "n": np.asarray([len(li)], np.int64),
            "sl": np.asarray([int(li.sum())], np.int64),
            "sll_hi": np.asarray([sll // _BASE], np.int64),
            "sll_lo": np.asarray([sll % _BASE], np.int64)})

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["k"], ["n", "sl", "sll_hi", "sll_lo"], exact_int=True)
    n = int(out["n"].iloc[0])
    sl = int(out["sl"].iloc[0])
    sll = int(out["sll_hi"].iloc[0]) * _BASE \
        + int(out["sll_lo"].iloc[0])
    mu = float(r6(float(sl) / (1e6 * n)))
    sigma = float(r6(np.sqrt(float(n * sll - sl * sl))
                     / (1e6 * n)))
    return pd.DataFrame({"n": [np.int64(n)],
                         "mu": [np.float64(mu)],
                         "sigma": [np.float64(sigma)]})
