# round-5 session-5 additions, batch 6: randomized-response local-DP
# rate estimation, the Cramer-von Mises two-sample test over the
# bounded quantity domain, and the entropy rate of the event-type
# Markov chain.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat
from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _events,
                      _path, np, pd, rd, register)
from ...stages.partition import partitioned_apply

_RR_CHARS = 300       # true attribute: "long document"
_EV_P = 16


@register("randomized_response", sql="""
    WITH f AS (SELECT CASE WHEN n_chars >= {ch} THEN 1 ELSE 0 END
                        AS truth,
                      CAST(('0x' || substr(md5(CAST(doc_id AS
                                  VARCHAR) || ':rr1'), 1, 16))
                           ::UBIGINT % 2 AS BIGINT) AS c1,
                      CAST(('0x' || substr(md5(CAST(doc_id AS
                                  VARCHAR) || ':rr2'), 1, 16))
                           ::UBIGINT % 2 AS BIGINT) AS c2
               FROM documents),
    r AS (SELECT truth,
                 CASE WHEN c1 = 1 THEN truth ELSE c2 END AS ans
          FROM f),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(truth) AS BIGINT) AS n_true,
                 CAST(sum(ans) AS BIGINT) AS n_yes
          FROM r)
    SELECT n AS n_docs, n_true AS n_true_long,
           n_yes AS n_reported_yes,
           CAST(n_true AS DOUBLE) / CAST(n AS DOUBLE) AS p_true,
           2.0 * (CAST(n_yes AS DOUBLE) / CAST(n AS DOUBLE)) - 0.5
             AS p_estimated
    FROM s""".format(ch=_RR_CHARS))
def randomized_response(sf_dir: str):
    """RANDOMIZED RESPONSE (Warner) local-DP estimation: each
    document 'reports' whether it is long (n_chars >= 300) — but a
    deterministic md5 coin decides whether it answers truthfully or
    with a second md5 coin flip (the seeded-determinism policy of
    dp_noisy_counts, giving ln(3)-LDP semantics with replayable
    'randomness'). The unbiased estimator p_hat = 2*lambda - 1/2
    inverts the noise; the TRUE rate rides along so the output shows
    estimator error directly. All counts are exact integer folds;
    the two estimates are shared float expressions. Scale plan:
    map-only 3-cell partials, both coins are one vectorized md5
    kernel per batch (md5_id64_flat — bit-identical to the SQL
    hex-prefix UBIGINT)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(np.int64)
        truth = (b["n_chars"].to_numpy(np.int64)
                 >= _RR_CHARS).astype(np.int64)
        c1 = (md5_id64_flat(ids, ":rr1")[0] % 2).astype(np.int64)
        c2 = (md5_id64_flat(ids, ":rr2")[0] % 2).astype(np.int64)
        ans = np.where(c1 == 1, truth, c2)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "n_true": np.array([int(truth.sum())], np.int64),
            "n_yes": np.array([int(ans.sum())], np.int64)})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "n_true", "n_yes"])
    n = int(s["n"].iloc[0])
    nt, ny = int(s["n_true"].iloc[0]), int(s["n_yes"].iloc[0])
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "n_true_long": [np.int64(nt)],
        "n_reported_yes": [np.int64(ny)],
        "p_true": [np.float64(nt) / np.float64(n)],
        "p_estimated": [2.0 * (np.float64(ny) / np.float64(n))
                        - 0.5]})


@register("cramer_von_mises", sql="""
    WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 1 ELSE 0 END) AS BIGINT) AS a,
                      CAST(sum(CASE WHEN l_returnflag = 'R'
                               THEN 0 ELSE 1 END) AS BIGINT) AS b
               FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS n,
                 CAST(sum(b) AS BIGINT) AS m FROM h),
    c AS (SELECT v, a, b,
                 CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
                 CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
          FROM h),
    s AS (SELECT CAST(sum(CAST(floor(CAST(a + b AS DOUBLE)
               * ((CAST(ca AS DOUBLE)
                   / CAST((SELECT n FROM t) AS DOUBLE)
                   - CAST(cb AS DOUBLE)
                     / CAST((SELECT m FROM t) AS DOUBLE))
                  * (CAST(ca AS DOUBLE)
                     / CAST((SELECT n FROM t) AS DOUBLE)
                     - CAST(cb AS DOUBLE)
                       / CAST((SELECT m FROM t) AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS tm
          FROM c)
    SELECT (SELECT n FROM t) AS n_returned,
           (SELECT m FROM t) AS n_kept,
           (SELECT tm FROM s) AS t_sum_micro,
           CAST((SELECT n FROM t) AS DOUBLE)
           * CAST((SELECT m FROM t) AS DOUBLE)
           / (CAST((SELECT n FROM t) + (SELECT m FROM t) AS DOUBLE)
              * CAST((SELECT n FROM t) + (SELECT m FROM t)
                     AS DOUBLE))
           * (CAST((SELECT tm FROM s) AS DOUBLE) / 1000000.0)
             AS cvm_t""")
def cramer_von_mises(sf_dir: str):
    """CRAMER-VON MISES two-sample test: do returned ('R') and kept
    lineitems draw quantities from the same distribution? The
    integral-type EDF statistic T = nm/(n+m)^2 * sum_x w_x
    (F_n(x) - G_m(x))^2 — the quadratic companion of ks_2samp's
    supremum statistic, sensitive to spread differences KS misses.
    The quantity domain is BOUNDED, so both EDFs are exact integer
    prefix sums over the histogram; each pooled-weighted squared gap
    quantizes to micro units with the shared half-up formula before
    the integer fold, and T is one shared float expression. Scale
    plan: per-batch (quantity, flag) histogram partials — the
    value-domain census replaces any global sort (the ks_2samp
    policy); the EDF scan is O(domain) on the driver."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b["l_quantity"].to_numpy(np.int64)
        r = (b["l_returnflag"].to_numpy(object) == "R") \
            .astype(np.int64)
        g = pd.DataFrame({"v": v, "a": r, "b": 1 - r}) \
            .groupby("v", as_index=False).sum()
        for c in ("a", "b"):
            g[c] = g[c].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["v"], ["a", "b"]).sort_values("v").reset_index(drop=True)
    a = h["a"].to_numpy(np.int64)
    b = h["b"].to_numpy(np.int64)
    n, m = int(a.sum()), int(b.sum())
    ca = np.cumsum(a).astype(np.float64)
    cb = np.cumsum(b).astype(np.float64)
    gap = ca / np.float64(n) - cb / np.float64(m)
    tm = int(np.floor((a + b).astype(np.float64) * (gap * gap)
                      * 1000000.0 + 0.5).astype(np.int64).sum())
    t = np.float64(n) * np.float64(m) \
        / (np.float64(n + m) * np.float64(n + m)) \
        * (np.float64(tm) / 1000000.0)
    return pd.DataFrame({
        "n_returned": [np.int64(n)], "n_kept": [np.int64(m)],
        "t_sum_micro": [np.int64(tm)], "cvm_t": [np.float64(t)]})


@register("markov_entropy_rate", sql="""
    WITH s AS (SELECT event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_type
               FROM events),
    c AS (SELECT prev_type, event_type AS next_type,
                 CAST(count(*) AS BIGINT) AS nij
          FROM s WHERE prev_type IS NOT NULL
          GROUP BY prev_type, next_type),
    r AS (SELECT prev_type, CAST(sum(nij) AS BIGINT) AS ni
          FROM c GROUP BY prev_type),
    t AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS n_cells FROM c),
    e AS (SELECT CAST(sum(CAST(floor(
                 CAST(c.nij AS DOUBLE)
                 / CAST((SELECT n FROM t) AS DOUBLE)
                 * log2(CAST(r.ni AS DOUBLE)
                        / CAST(c.nij AS DOUBLE))
                 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hm
          FROM c JOIN r ON c.prev_type = r.prev_type)
    SELECT (SELECT n FROM t) AS n_transitions,
           (SELECT n_cells FROM t) AS n_cells,
           CAST((SELECT count(*) FROM r) AS BIGINT) AS n_states,
           (SELECT hm FROM e) AS h_sum_micro,
           CAST((SELECT hm FROM e) AS DOUBLE) / 1000000.0
             AS entropy_rate_bits""")
def markov_entropy_rate(sf_dir: str):
    """ENTROPY RATE of the first-order event-type Markov chain:
    H = sum_ij (n_ij/N) * log2(n_i/n_ij) bits per step, weighting
    each state's conditional next-step entropy by its EMPIRICAL
    transition mass (documented choice: the observed-frequency
    stationary weights, not the eigenvector) — how predictable is
    the next user action given the current one? The information-
    theoretic summary of event_transitions' count matrix. Every term
    is built from exact integer counts, quantized to micro units
    with the shared half-up formula before the fold. Scale plan: the
    lag runs INSIDE the one user_id exchange's sorted partitions
    (event_transitions' plan); partitions pre-aggregate to the
    types^2 matrix and the entropy scan is driver-side on that
    bounded grid."""
    from ...stages.window import segment_codes
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        et = g["event_type"].to_numpy(object)
        if len(et) < 2:
            return pd.DataFrame({
                "prev_type": pd.Series(dtype=object),
                "next_type": pd.Series(dtype=object),
                "nij": pd.Series(dtype=np.int64)})
        same = codes[1:] == codes[:-1]
        out = pd.DataFrame({"prev_type": et[:-1][same],
                            "next_type": et[1:][same]}) \
            .groupby(["prev_type", "next_type"],
                     as_index=False).size() \
            .rename(columns={"size": "nij"})
        out["nij"] = out["nij"].astype(np.int64)
        return out

    parts = partitioned_apply(ds, "user_id", fn, _EV_P,
                              sort_cols=["user_id", "ts",
                                         "event_id"]) \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("markov_entropy_rate: transition matrix "
                         "too large for the driver combine")
    c = parts.groupby(["prev_type", "next_type"],
                      as_index=False).agg(nij=("nij", "sum"))
    ni = c.groupby("prev_type")["nij"].transform("sum") \
        .to_numpy(np.int64)
    nij = c["nij"].to_numpy(np.int64)
    n = int(nij.sum())
    hm = int(np.floor(
        nij.astype(np.float64) / np.float64(n)
        * np.log2(ni.astype(np.float64) / nij.astype(np.float64))
        * 1000000.0 + 0.5).astype(np.int64).sum())
    return pd.DataFrame({
        "n_transitions": [np.int64(n)],
        "n_cells": [np.int64(len(c))],
        "n_states": [np.int64(c["prev_type"].nunique())],
        "h_sum_micro": [np.int64(hm)],
        "entropy_rate_bits": [np.float64(hm) / 1000000.0]})
