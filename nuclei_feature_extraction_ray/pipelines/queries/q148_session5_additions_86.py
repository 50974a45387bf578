# round-5 session-5 additions, batch 86: forward-algorithm HMM
# log-likelihood with per-step quantization, empirical-Bayes
# beta-binomial shrinkage, and a two-Poisson mixture by Prony
# moments.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue
from .q147_session5_additions_85 import (_VT_HIT, _VT_INIT,
                                         _VT_MISS, _VT_STAY,
                                         _VT_SW)


@register("hmm_likelihood", sql="""
    WITH RECURSIVE """ + _DAILY_SQL + """,
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    st AS (SELECT string_agg(CASE WHEN v > pv THEN '1'
                             ELSE '0' END, '' ORDER BY day) AS s,
                  CAST(count(*) AS BIGINT) AS n
           FROM x WHERE pv IS NOT NULL),
    dp AS (
        SELECT CAST(1 AS BIGINT) AS i,
               CAST({init} + CASE WHEN substr(st.s, 1, 1) = '0'
                    THEN {hit} ELSE {miss} END AS BIGINT) AS a0,
               CAST({init} + CASE WHEN substr(st.s, 1, 1) = '1'
                    THEN {hit} ELSE {miss} END AS BIGINT) AS a1
        FROM st
        UNION ALL
        SELECT dp.i + 1,
               greatest(dp.a0 + {stay}, dp.a1 + {sw})
               + CAST(floor(ln(1.0 + exp(CAST(
                     least(dp.a0 + {stay}, dp.a1 + {sw})
                     - greatest(dp.a0 + {stay}, dp.a1 + {sw})
                     AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5)
                 AS BIGINT)
               + CASE WHEN substr(st.s,
                             CAST(dp.i AS INTEGER) + 1, 1) = '0'
                 THEN {hit} ELSE {miss} END,
               greatest(dp.a1 + {stay}, dp.a0 + {sw})
               + CAST(floor(ln(1.0 + exp(CAST(
                     least(dp.a1 + {stay}, dp.a0 + {sw})
                     - greatest(dp.a1 + {stay}, dp.a0 + {sw})
                     AS DOUBLE) / 1000000.0)) * 1000000.0 + 0.5)
                 AS BIGINT)
               + CASE WHEN substr(st.s,
                             CAST(dp.i AS INTEGER) + 1, 1) = '1'
                 THEN {hit} ELSE {miss} END
        FROM dp, st WHERE dp.i < st.n)
    SELECT st.n AS n_days,
           CAST(greatest(a0, a1)
                + CAST(floor(ln(1.0 + exp(CAST(least(a0, a1)
                      - greatest(a0, a1) AS DOUBLE)
                      / 1000000.0)) * 1000000.0 + 0.5)
                  AS BIGINT) AS DOUBLE)
           / (1000000.0 * CAST(st.n AS DOUBLE))
             AS loglik_per_day
    FROM dp, st WHERE i = st.n""".format(
        init=_VT_INIT, stay=_VT_STAY, sw=_VT_SW, hit=_VT_HIT,
        miss=_VT_MISS))
def hmm_likelihood(sf_dir: str):
    """FORWARD-ALGORITHM LOG-LIKELIHOOD of the daily up/down
    sequence under the viterbi_regimes HMM: the sum-product
    counterpart of Viterbi's max-product — log P(observations),
    the model-evidence number that lets this HMM be compared
    against markov_entropy_rate's order-1 chain as a predictive
    model. Each forward step's log-sum-exp is computed as max +
    ln(1+exp(diff/1e6)) on INTEGER log-scores and immediately
    re-quantized to micro ints (the holt per-step-quantization
    policy), so the recursion state is bit-identical across
    engines; the oracle replays it in a recursive CTE. Scale
    plan: bounded day-domain combine; the recursion is O(days)
    driver work."""
    days, v = _daily_revenue(sf_dir)
    obs = "".join("1" if b > a else "0"
                  for a, b in zip(v, v[1:]))
    n = len(obs)

    def lse(x, y):
        m, d = (x, y - x) if x >= y else (y, x - y)
        return m + int(np.floor(np.log(1.0 + np.exp(
            np.float64(d) / 1000000.0)) * 1000000.0 + 0.5))

    a0 = _VT_INIT + (_VT_HIT if obs[0] == "0" else _VT_MISS)
    a1 = _VT_INIT + (_VT_HIT if obs[0] == "1" else _VT_MISS)
    for i in range(1, n):
        o = obs[i]
        n0 = lse(a0 + _VT_STAY, a1 + _VT_SW) \
            + (_VT_HIT if o == "0" else _VT_MISS)
        n1 = lse(a1 + _VT_STAY, a0 + _VT_SW) \
            + (_VT_HIT if o == "1" else _VT_MISS)
        a0, a1 = n0, n1
    tot = lse(a0, a1)
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "loglik_per_day": [np.float64(tot)
                           / (1000000.0 * np.float64(n))]})


@register("eb_beta_binomial", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 20 AS BIGINT) AS grp,
                      CAST(max(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS p
               FROM events GROUP BY user_id),
    g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(p) AS BIGINT) AS k
          FROM u GROUP BY grp),
    t AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
                 CAST(sum(k) AS HUGEINT) AS kk,
                 CAST(count(*) AS HUGEINT) AS m
          FROM g),
    mm AS (SELECT
        CAST((SELECT kk FROM t) AS DOUBLE)
        / CAST((SELECT nn FROM t) AS DOUBLE) AS pbar,
        (SELECT CAST(sum(CAST(floor(
             (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              - CAST((SELECT kk FROM t) AS DOUBLE)
                / CAST((SELECT nn FROM t) AS DOUBLE))
             * (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                - CAST((SELECT kk FROM t) AS DOUBLE)
                  / CAST((SELECT nn FROM t) AS DOUBLE))
             * 1000000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
         FROM g) AS s2q),
    ab AS (SELECT pbar,
                  CAST(s2q AS DOUBLE)
                  / (1000000000.0
                     * CAST((SELECT m FROM t) AS DOUBLE))
                    AS s2,
                  pbar * (1.0 - pbar)
                  / (CAST(s2q AS DOUBLE)
                     / (1000000000.0
                        * CAST((SELECT m FROM t) AS DOUBLE)))
                  - 1.0 AS nu
           FROM mm)
    SELECT g.grp AS grp, g.n AS n_users, g.k AS n_purchasers,
           CAST(g.k AS DOUBLE) / CAST(g.n AS DOUBLE)
             AS raw_rate,
           (CAST(g.k AS DOUBLE)
            + (SELECT pbar * nu FROM ab))
           / (CAST(g.n AS DOUBLE) + (SELECT nu FROM ab))
             AS shrunk_rate
    FROM g ORDER BY grp""")
def eb_beta_binomial(sf_dir: str):
    """EMPIRICAL-BAYES BETA-BINOMIAL SHRINKAGE of per-bucket
    conversion rates (20 user-id buckets): method-of-moments
    pseudo-counts nu = pbar(1-pbar)/s^2 - 1 from the observed
    between-bucket variance, then every bucket's rate pulled
    toward the pool as (k + pbar*nu)/(n + nu) — the
    small-cell-stabilization standard (james_stein does the
    normal-theory version; beta-binomial is the right conjugate
    for RATES and keeps estimates in [0,1]). Cell counts are
    exact integers; each bucket's squared deviation is one shared
    float nano-quantized before the exact cross-bucket sum; the
    shrunken rates are shared float expressions. Scale plan: one
    user exchange into a 20-cell combine; O(buckets) driver
    work."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "p": (b["event_type"].to_numpy(object)
                  == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).max()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["p"].max()
        out = pd.DataFrame({
            "grp": (a["user_id"].to_numpy(np.int64) % 20),
            "n": np.ones(len(a), np.int64),
            "k": a["p"].to_numpy(np.int64)}) \
            .groupby("grp", as_index=False).sum()
        for c in ("n", "k"):
            out[c] = out[c].astype(np.int64)
        return out

    g = _combine_partials(
        partition_map(ds.map_batches(partial,
                                     batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["grp"], ["n", "k"]).sort_values("grp") \
        .reset_index(drop=True)
    ns = g["n"].to_numpy(np.int64)
    ks = g["k"].to_numpy(np.int64)
    nn, kk, m = int(ns.sum()), int(ks.sum()), len(g)
    pbar = np.float64(kk) / np.float64(nn)
    s2q = 0
    for n_i, k_i in zip(ns, ks):
        d = np.float64(int(k_i)) / np.float64(int(n_i)) - pbar
        s2q += int(np.floor(d * d * 1000000000.0 + 0.5))
    s2 = np.float64(s2q) / (1000000000.0 * np.float64(m))
    nu = pbar * (1.0 - pbar) / s2 - 1.0
    return pd.DataFrame({
        "grp": g["grp"].to_numpy(np.int64),
        "n_users": ns, "n_purchasers": ks,
        "raw_rate": np.array(
            [np.float64(int(k)) / np.float64(int(n))
             for n, k in zip(ns, ks)], np.float64),
        "shrunk_rate": np.array(
            [(np.float64(int(k)) + pbar * nu)
             / (np.float64(int(n)) + nu)
             for n, k in zip(ns, ks)], np.float64)})


@register("poisson_mixture_mom", sql="""
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY user_id),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
                 CAST(sum(n) AS HUGEINT) AS m1,
                 CAST(sum(CAST(n AS HUGEINT) * (n - 1))
                      AS HUGEINT) AS m2,
                 CAST(sum(CAST(n AS HUGEINT) * (n - 1) * (n - 2))
                      AS HUGEINT) AS m3
          FROM u),
    e AS (SELECT
        CAST(nn * m3 - m1 * m2 AS DOUBLE)
        / CAST(nn * m2 - m1 * m1 AS DOUBLE) AS e1,
        CAST(m1 * m3 - m2 * m2 AS DOUBLE)
        / CAST(nn * m2 - m1 * m1 AS DOUBLE) AS e2,
        CAST(m1 AS DOUBLE) / CAST(nn AS DOUBLE) AS mu1
        FROM m)
    SELECT CAST((SELECT nn FROM m) AS BIGINT) AS n_users,
           (e1 - sqrt(e1 * e1 - 4.0 * e2)) / 2.0 AS lambda_low,
           (e1 + sqrt(e1 * e1 - 4.0 * e2)) / 2.0 AS lambda_high,
           (mu1 - (e1 - sqrt(e1 * e1 - 4.0 * e2)) / 2.0)
           / ((e1 + sqrt(e1 * e1 - 4.0 * e2)) / 2.0
              - (e1 - sqrt(e1 * e1 - 4.0 * e2)) / 2.0)
             AS weight_high
    FROM e""")
def poisson_mixture_mom(sf_dir: str):
    """TWO-POISSON MIXTURE by PRONY'S METHOD on per-user event
    counts: the factorial moments mu_[r] = w*l1^r + (1-w)*l2^r
    obey the exact linear recurrence with characteristic roots
    (l1, l2), so the elementary symmetric functions come from one
    2x2 solve — e1 = (N*M3 - M1*M2)/(N*M2 - M1^2), e2 = (M1*M3 -
    M2^2)/(N*M2 - M1^2) — and the two rates are the quadratic
    roots: a CLOSED-FORM mixture fit (no EM, no seeds) that
    splits the population into casual and power intensity classes
    where negbin_fit forces one overdispersed family. Factorial
    moments fold as exact big ints; the rates and mixing weight
    are shared float expressions. Scale plan: per-user counts
    through one user exchange into a 4-cell moment combine."""
    ds = _events(sf_dir, ["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "n": np.ones(len(b), np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    u = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], ["n"])
    ns = [int(x) for x in u["n"]]
    nn = len(ns)
    m1 = sum(ns)
    m2 = sum(n * (n - 1) for n in ns)
    m3 = sum(n * (n - 1) * (n - 2) for n in ns)
    det = nn * m2 - m1 * m1
    e1 = np.float64(nn * m3 - m1 * m2) / np.float64(det)
    e2 = np.float64(m1 * m3 - m2 * m2) / np.float64(det)
    mu1 = np.float64(m1) / np.float64(nn)
    disc = np.sqrt(e1 * e1 - 4.0 * e2)
    lo = (e1 - disc) / 2.0
    hi = (e1 + disc) / 2.0
    return pd.DataFrame({
        "n_users": [np.int64(nn)],
        "lambda_low": [np.float64(lo)],
        "lambda_high": [np.float64(hi)],
        "weight_high": [(mu1 - lo) / (hi - lo)]})
