# round-5 session-2 additions, batch 9: the nonparametric two-sample
# tests (Kolmogorov-Smirnov, Mann-Whitney U with tie correction) and
# the quantile transform — all exact, because the bounded cents
# domain turns rank statistics into histogram prefix sums.
from __future__ import annotations

from ._shared import (ORACLE, _combine_partials, _events, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)
from ...functions.texture import _sql_r6, r6


def _cents_hist_partial(b: pd.DataFrame) -> pd.DataFrame:
    """(cents, na, nb) histogram partial: na = clicks, nb =
    purchases."""
    et = b["event_type"].to_numpy(object)
    keep = (et == "click") | (et == "purchase")
    cents = np.floor(b["value"].to_numpy(np.float64)[keep] * 100
                     + 0.5).astype(np.int64)
    is_a = (et[keep] == "click").astype(np.int64)
    g = pd.DataFrame({"cents": cents, "na": is_a, "nb": 1 - is_a}) \
        .groupby("cents", as_index=False).sum()
    for c in ("na", "nb"):
        g[c] = g[c].astype(np.int64)
    return g


@register("ks_2samp", sql="""
    WITH h AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                      END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS nb
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1),
    c AS (SELECT cents,
                 CAST(sum(na) OVER w AS HUGEINT) AS ca,
                 CAST(sum(nb) OVER w AS HUGEINT) AS cb,
                 (SELECT CAST(sum(na) AS HUGEINT) FROM h) AS ta,
                 (SELECT CAST(sum(nb) AS HUGEINT) FROM h) AS tb
          FROM h WINDOW w AS (ORDER BY cents
                              ROWS UNBOUNDED PRECEDING)),
    d AS (SELECT cents, abs(ca * tb - cb * ta) AS num, ta, tb
          FROM c)
    SELECT CAST(ta AS BIGINT) AS n_click,
           CAST(tb AS BIGINT) AS n_purchase,
           CAST(cents AS BIGINT) AS d_at_cents,
           {d} AS d_stat
    FROM d ORDER BY num DESC, cents LIMIT 1""".format(
        d=_sql_r6("CAST(num AS DOUBLE)"
                  " / (CAST(ta AS DOUBLE) * CAST(tb AS DOUBLE))")))
def ks_2samp(sf_dir: str):
    """Two-sample KOLMOGOROV-SMIRNOV statistic between the click and
    purchase value distributions: D = max_x |F_click(x) -
    F_purchase(x)| — the distribution-drift test PSI/KL approximate,
    computed EXACTLY because the bounded cents domain makes both
    empirical CDFs histogram prefix sums. The max runs on the
    integer cross-product |ca*tb - cb*ta| (no division until the
    single reported row; ties broken at the smallest cents), so both
    engines agree bit-for-bit; D itself is one shared-r6 double."""
    ds = _events(sf_dir, columns=["event_type", "value"])
    h = _combine_partials(
        ds.map_batches(_cents_hist_partial, batch_format="pandas"),
        ["cents"], ["na", "nb"]).sort_values(
            "cents", kind="mergesort").reset_index(drop=True)
    ca = np.cumsum(h["na"].to_numpy(np.int64)).astype(object)
    cb = np.cumsum(h["nb"].to_numpy(np.int64)).astype(object)
    ta, tb = int(ca[-1]), int(cb[-1])
    num = np.abs(ca * tb - cb * ta)
    mx = max(int(v) for v in num)
    # h is cents-ascending, so the first hit is the smallest cents
    i = next(k for k, v in enumerate(num) if int(v) == mx)
    return pd.DataFrame({
        "n_click": [np.int64(ta)], "n_purchase": [np.int64(tb)],
        "d_at_cents": [np.int64(h["cents"].iloc[i])],
        "d_stat": [np.float64(r6(float(int(num[i]))
                                 / (float(ta) * float(tb))))]})


@register("mann_whitney", sql="""
    WITH h AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                      END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) AS BIGINT) AS nb
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1),
    c AS (SELECT cents, na, nb,
                 CAST(sum(nb) OVER (ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) - nb AS HUGEINT)
                   AS cb_below
          FROM h),
    s AS (SELECT
            CAST(sum(CAST(na AS HUGEINT)) AS HUGEINT) AS ta,
            CAST(sum(CAST(nb AS HUGEINT)) AS HUGEINT) AS tb,
            CAST(sum(CAST(na AS HUGEINT)
                     * (2 * cb_below + nb)) AS HUGEINT) AS u2,
            CAST(sum(CAST(na + nb AS HUGEINT) * (na + nb)
                     * (na + nb) - (na + nb)) AS HUGEINT) AS tsum
          FROM c),
    f AS (SELECT ta, tb, u2, tsum, ta + tb AS n FROM s)
    SELECT CAST(ta AS BIGINT) AS n_click,
           CAST(tb AS BIGINT) AS n_purchase,
           CAST(u2 AS BIGINT) AS u2_click,
           CASE WHEN ta = 0 OR tb = 0 OR n < 2
                  OR (n + 1) * n * (n - 1) = tsum THEN NULL
                ELSE {z} END AS z
    FROM f""".format(
        z=_sql_r6("CAST(u2 - ta * tb AS DOUBLE)"
                  " * sqrt(3.0 * CAST(n AS DOUBLE)"
                  " * CAST(n - 1 AS DOUBLE))"
                  " / sqrt(CAST(ta * tb AS DOUBLE)"
                  " * CAST((n + 1) * n * (n - 1) - tsum"
                  " AS DOUBLE))")))
def mann_whitney(sf_dir: str):
    """MANN-WHITNEY U test (click vs purchase values) with full tie
    correction — the rank-sum alternative to Welch's t when values
    are heavy-tailed. Everything is exact integer arithmetic off the
    cents histogram: 2*U = sum na_c * (2*cb_below + nb_c) (the
    half-credit for ties kept integral by the doubling), the tie term
    sum(t^3 - t) from per-cents totals, and the normal-approximation
    z collapses to ONE shared-r6 double expression over those ints —
    12*n*(n-1)*var = ta*tb*((n+1)*n*(n-1) - T) cleared of every
    fraction. Degenerate cases (empty arm, all values tied) report
    NULL on both sides."""
    ds = _events(sf_dir, columns=["event_type", "value"])
    h = _combine_partials(
        ds.map_batches(_cents_hist_partial, batch_format="pandas"),
        ["cents"], ["na", "nb"]).sort_values(
            "cents", kind="mergesort").reset_index(drop=True)
    na = h["na"].to_numpy(np.int64).astype(object)
    nb = h["nb"].to_numpy(np.int64).astype(object)
    cb_below = np.concatenate(([0], np.cumsum(nb)[:-1]))
    ta, tb = int(sum(na)), int(sum(nb))
    u2 = int(sum(na * (2 * cb_below + nb)))
    t = na + nb
    tsum = int(sum(t * t * t - t))
    n = ta + tb
    if ta == 0 or tb == 0 or n < 2 or (n + 1) * n * (n - 1) == tsum:
        z = np.nan
    else:
        z = float(r6(float(u2 - ta * tb)
                     * np.sqrt(3.0 * float(n) * float(n - 1))
                     / np.sqrt(float(ta * tb)
                               * float((n + 1) * n * (n - 1)
                                       - tsum))))
    return pd.DataFrame({
        "n_click": [np.int64(ta)], "n_purchase": [np.int64(tb)],
        "u2_click": [np.int64(u2)], "z": [np.float64(z)]})


@register("quantile_normalize", sql="""
    WITH h AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    r AS (SELECT cents,
                 2 * (sum(c) OVER (ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) - c) + c + 1 AS r2,
                 (SELECT CAST(sum(c) AS BIGINT) FROM h) AS n
          FROM h)
    SELECT e.event_id,
           CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents,
           r.r2 * 1.0 / (2 * r.n) AS q
    FROM events e JOIN r
      ON CAST(floor(e.value * 100 + 0.5) AS BIGINT) = r.cents""")
def quantile_normalize(sf_dir: str):
    """QUANTILE TRANSFORM of the event values: each row mapped to its
    tie-average empirical quantile q = avg_rank/n in (0, 1] — the
    rank-uniformization step (sklearn's QuantileTransformer) that
    makes any downstream threshold distribution-free. The per-VALUE
    quantile comes from the bounded cents histogram as a 2x-scaled
    integer rank (spearman's idiom), broadcast as a tiny sorted map;
    the second pass is a map-only searchsorted — no join, no sort,
    and q is ONE int/int division -> bit-identical with no
    rounding."""
    ds = _events(sf_dir, columns=["event_id", "value"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"cents": cents,
                          "c": np.ones(len(b), np.int64)}) \
            .groupby("cents", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(hist, batch_format="pandas"),
        ["cents"], ["c"]).sort_values(
            "cents", kind="mergesort").reset_index(drop=True)
    cents_v = h["cents"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    below = np.concatenate(([0], np.cumsum(c)[:-1]))
    r2 = 2 * below + c + 1
    n = int(c.sum())
    mref = ray.put((cents_v, r2.astype(np.int64), n))

    class Map:
        def __init__(self):
            self.cents, self.r2, self.n = ray.get(mref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            cents = np.floor(b["value"].to_numpy(np.float64) * 100
                             + 0.5).astype(np.int64)
            pos = np.searchsorted(self.cents, cents)
            r2 = self.r2[pos]
            return pd.DataFrame({
                "event_id": b["event_id"].to_numpy(np.int64),
                "cents": cents,
                "q": r2 / np.float64(2 * self.n)})

    return ds.map_batches(Map, batch_format="pandas", concurrency=2)
