# round-5 session-5 additions, batch 55: the unbiased pass@k
# estimator, Croston's intermittent-demand forecast as an integer
# recursion, and the DP sparse-vector-technique release.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_PAK_K = 3
_SVT_EPS = 1.0
_SVT_MAXREL = 3


@register("pass_at_k", sql="""
    WITH p AS (SELECT l_partkey AS pk,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS c
               FROM lineitem GROUP BY pk
               HAVING count(*) >= {k}),
    t AS (SELECT pk, n, c,
                 CAST(floor((1.0
                      - (CAST(n - c AS DOUBLE)
                         / CAST(n AS DOUBLE))
                        * (CAST(n - c - 1 AS DOUBLE)
                           / CAST(n - 1 AS DOUBLE))
                        * (CAST(n - c - 2 AS DOUBLE)
                           / CAST(n - 2 AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS pm
          FROM p),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(sum(pm) AS HUGEINT) AS sp FROM t)
    SELECT (SELECT n_parts FROM s) AS n_parts,
           CAST({k} AS BIGINT) AS k,
           CAST((SELECT sp FROM s) AS BIGINT) AS pass_sum_micro,
           CAST((SELECT sp FROM s) AS DOUBLE) / 1000000.0
             / CAST((SELECT n_parts FROM s) AS DOUBLE)
             AS mean_pass_at_k""".format(k=_PAK_K))
def pass_at_k(sf_dir: str):
    """UNBIASED PASS@K estimator (Codex-style) applied to parts:
    with each part's lineitems as 'samples' and returned lines as
    'passes', pass@{k} = 1 - C(n-c,{k})/C(n,{k}) computed as the
    telescoping product of exact-integer ratios — the
    without-replacement estimator LLM evals use because the naive
    (c/n)^k is biased. Each part's probability quantizes to micro
    units half-up; the mean is an exact integer fold over parts
    with >= {k} samples (the HAVING both engines share). Scale
    plan: per-part (n, c) cells fold through part-keyed partials;
    the product is three exact ratios per part on the driver (or
    inside the exchange at fleet scale)."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64),
            "c": (b["l_returnflag"].to_numpy(object)
                  == "R").astype(np.int64)}) \
            .groupby("pk", as_index=False).sum()
        for col in ("n", "c"):
            g[col] = g[col].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("pk", as_index=False)[["n", "c"]].sum()
        a = a[a["n"] >= _PAK_K]
        np_ = len(a)
        sp = 0
        for _, r in a.iterrows():
            n, c = int(r["n"]), int(r["c"])
            prod = np.float64(1.0)
            for i in range(_PAK_K):
                prod = prod * (np.float64(n - c - i)
                               / np.float64(n - i))
            sp += int(np.floor((1.0 - prod) * 1000000.0 + 0.5))
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n_parts": [np_], "sp": [sp]})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["pk"], cells, 16),
        ["j"], ["n_parts", "sp"], exact_int=True)
    np_ = int(s["n_parts"].iloc[0])
    sp = int(s["sp"].iloc[0])
    return pd.DataFrame({
        "n_parts": [np.int64(np_)], "k": [np.int64(_PAK_K)],
        "pass_sum_micro": [np.int64(sp)],
        "mean_pass_at_k": [np.float64(sp) / 1000000.0
                           / np.float64(np_)]})


@register("croston_forecast", sql="""
    WITH RECURSIVE li AS (
      SELECT CAST(floor(epoch(CAST(l_shipdate AS TIMESTAMP))
                        / 604800) AS BIGINT) AS wk,
             CAST(sum(l_quantity) AS BIGINT) AS q
      FROM lineitem
      WHERE l_partkey = (SELECT min(l_partkey) FROM lineitem)
      GROUP BY 1),
    bounds AS (SELECT min(wk) AS w0, max(wk) AS w1 FROM li),
    spine AS (SELECT CAST(unnest(generate_series(
                 (SELECT w0 FROM bounds),
                 (SELECT w1 FROM bounds))) AS BIGINT) AS wk),
    x AS (SELECT CAST(row_number() OVER (ORDER BY s.wk)
                      AS BIGINT) AS t,
                 CAST(COALESCE(li.q, 0) AS BIGINT) AS q
          FROM spine s LEFT JOIN li ON li.wk = s.wk),
    rec AS (
      SELECT t, q,
             CASE WHEN q > 0 THEN q * 1000000 ELSE 0 END AS z,
             CASE WHEN q > 0 THEN t * 1000000 ELSE 0 END AS p,
             CASE WHEN q > 0 THEN 0 ELSE t END AS since,
             CASE WHEN q > 0 THEN 1 ELSE 0 END AS seeded
      FROM x WHERE t = 1
      UNION ALL
      SELECT x.t, x.q,
             CASE WHEN x.q = 0 THEN r.z
                  WHEN r.seeded = 0 THEN x.q * 1000000
                  ELSE (9 * r.z + x.q * 1000000) // 10 END,
             CASE WHEN x.q = 0 THEN r.p
                  WHEN r.seeded = 0 THEN (r.since + 1) * 1000000
                  ELSE (9 * r.p + (r.since + 1) * 1000000) // 10
                  END,
             CASE WHEN x.q > 0 THEN 0 ELSE r.since + 1 END,
             CASE WHEN x.q > 0 THEN 1 ELSE r.seeded END
      FROM rec r JOIN x ON x.t = r.t + 1),
    fin AS (SELECT *, row_number() OVER (ORDER BY t DESC) AS rn
            FROM rec)
    SELECT CAST((SELECT count(*) FROM x) AS BIGINT) AS n_weeks,
           CAST((SELECT count(*) FROM li) AS BIGINT)
             AS n_demand_weeks,
           CAST(z AS BIGINT) AS size_micro,
           CAST(p AS BIGINT) AS interval_micro,
           CASE WHEN p > 0 THEN CAST(z AS DOUBLE)
                                / CAST(p AS DOUBLE)
                ELSE NULL END AS forecast_per_week
    FROM fin WHERE rn = 1""")
def croston_forecast(sf_dir: str):
    """CROSTON'S METHOD for the lowest-keyed part's intermittent
    weekly demand: separate alpha=0.1 exponential smoothers for
    nonzero demand SIZE and the INTERVAL between demands (updated
    only on demand weeks), forecast = size/interval — the
    intermittent-demand forecaster that ses/holt mishandle when
    zero_inflation says most periods are empty. Both smoother
    states live as micro ints with pure integer recursions
    ((9*s + x)//10 — the rsi/holt policy), seeded at the first
    demand, so the whole pass is bit-identical to the
    recursive-CTE oracle; only the final ratio is float (NULL
    before any demand). Scale plan: the week spine is bounded;
    the inherently sequential smoother is O(weeks) on the
    driver."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity"])

    mn = int(ds.map_batches(
        lambda b: pd.DataFrame({
            "mn": [int(b["l_partkey"].to_numpy(np.int64).min())]}),
        batch_format="pandas").to_pandas()["mn"].min())

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["l_partkey"].to_numpy(np.int64) == mn
        wk = (b["l_shipdate"].to_numpy("datetime64[D]")
              .astype(np.int64))[m] // 7
        g = pd.DataFrame({
            "wk": wk,
            "q": b["l_quantity"].to_numpy(np.int64)[m]}) \
            .groupby("wk", as_index=False).sum()
        g["q"] = g["q"].astype(np.int64)
        return g

    li = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["wk"], ["q"], exact_int=True).sort_values("wk") \
        .reset_index(drop=True)
    w0, w1 = int(li["wk"].min()), int(li["wk"].max())
    qmap = {int(r["wk"]): int(r["q"]) for _, r in li.iterrows()}
    z = p = 0
    since = 0
    seeded = 0
    t = 0
    for wk in range(w0, w1 + 1):
        t += 1
        q = qmap.get(wk, 0)
        if t == 1:
            if q > 0:
                z, p, since, seeded = q * 1000000, 1000000, 0, 1
            else:
                z, p, since, seeded = 0, 0, 1, 0
            continue
        if q == 0:
            since += 1
        elif seeded == 0:
            z = q * 1000000
            p = (since + 1) * 1000000
            since, seeded = 0, 1
        else:
            z = (9 * z + q * 1000000) // 10
            p = (9 * p + (since + 1) * 1000000) // 10
            since = 0
    fc = np.float64(z) / np.float64(p) if p > 0 else np.nan
    return pd.DataFrame({
        "n_weeks": [np.int64(w1 - w0 + 1)],
        "n_demand_weeks": [np.int64(len(li))],
        "size_micro": [np.int64(z)],
        "interval_micro": [np.int64(p)],
        "forecast_per_week": [fc]})


@register("svt_release", sql="""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS k FROM c),
    nz AS (SELECT source, n,
                  CAST(('0x' || substr(md5(source || ':svt'),
                         1, 12))::UBIGINT AS DOUBLE)
                    / 281474976710656.0 AS u,
                  CAST(('0x' || substr(md5(':svt-thr'), 1, 12))
                       ::UBIGINT AS DOUBLE)
                    / 281474976710656.0 AS ut
           FROM c),
    s AS (SELECT source, n,
                 CAST(n AS DOUBLE)
                 + (CASE WHEN u >= 0.5
                    THEN -{b2} * ln(1.0 - 2.0 * (u - 0.5))
                    ELSE {b2} * ln(1.0 - 2.0 * (0.5 - u)) END)
                   AS noisy_q,
                 CAST((SELECT tot FROM t) AS DOUBLE)
                 / CAST((SELECT k FROM t) AS DOUBLE)
                 + (CASE WHEN ut >= 0.5
                    THEN -{b1} * ln(1.0 - 2.0 * (ut - 0.5))
                    ELSE {b1} * ln(1.0 - 2.0 * (0.5 - ut)) END)
                   AS noisy_thr
          FROM nz),
    r AS (SELECT source, n,
                 CAST(CASE WHEN noisy_q > noisy_thr
                      THEN 1 ELSE 0 END AS BIGINT) AS above,
                 row_number() OVER (ORDER BY source) AS i
          FROM s),
    cum AS (SELECT source, n, above,
                   CAST(sum(above) OVER (ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS n_released
            FROM r)
    SELECT source, n AS true_count,
           CAST(CASE WHEN above = 1
                     AND n_released <= {mr}
                THEN 1 ELSE 0 END AS BIGINT) AS released
    FROM cum ORDER BY source""".format(
    b1=2.0 / _SVT_EPS, b2=4.0 / _SVT_EPS, mr=_SVT_MAXREL))
def svt_release(sf_dir: str):
    """SPARSE VECTOR TECHNIQUE (above-threshold) DP release: scan
    sources in name order against a noisy mean-count threshold
    (Laplace(2/eps)) with per-query Laplace(4/eps) noise, and
    release only the first {mr} above-threshold hits — the DP
    mechanism whose privacy cost scales with RELEASES, not
    queries, completing the mechanism family (dp_noisy_counts'
    additive noise, dp_exponential_pick's selection). All noise is
    seeded by the portable md5 inverse-CDF idiom (documented:
    reproducible stand-in for a production RNG); the release
    decisions are identical-double comparisons and the running
    release cap is an exact integer prefix sum. Scale plan:
    per-source cells; the ordered scan is O(sources) driver
    work."""
    import hashlib
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"source": b["source"].to_numpy(object),
                          "n": np.ones(len(b), np.int64)}) \
            .groupby("source", as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source"], ["n"]).sort_values("source") \
        .reset_index(drop=True)
    tot = int(c["n"].sum())
    k = len(c)

    def lap(seed: str, b: float) -> np.float64:
        u = np.float64(int(hashlib.md5(seed.encode())
                           .hexdigest()[:12], 16)) \
            / 281474976710656.0
        if u >= 0.5:
            return np.float64(-b * np.log(1.0 - 2.0 * (u - 0.5)))
        return np.float64(b * np.log(1.0 - 2.0 * (0.5 - u)))

    thr = np.float64(tot) / np.float64(k) \
        + lap(":svt-thr", 2.0 / _SVT_EPS)
    released = 0
    rows = []
    for _, r in c.iterrows():
        n = int(r["n"])
        nq = np.float64(n) + lap(r["source"] + ":svt",
                                 4.0 / _SVT_EPS)
        above = 1 if nq > thr else 0
        if above:
            released += 1
        rel = 1 if (above and released <= _SVT_MAXREL) else 0
        rows.append({"source": r["source"],
                     "true_count": np.int64(n),
                     "released": np.int64(rel)})
    return pd.DataFrame(rows)
