# round-5 session-5 additions, batch 90: the nonlinear-dynamics
# family — Bandt-Pompe permutation entropy, sample entropy, and
# recurrence quantification.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


@register("permutation_entropy", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT v,
                 lead(v, 1) OVER (ORDER BY day) AS b,
                 lead(v, 2) OVER (ORDER BY day) AS c
          FROM d),
    p AS (SELECT 4 * (CASE WHEN v <= b THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN b <= c THEN 1 ELSE 0 END)
                 + (CASE WHEN v <= c THEN 1 ELSE 0 END) AS pat
          FROM x WHERE c IS NOT NULL),
    h AS (SELECT pat, CAST(count(*) AS BIGINT) AS n
          FROM p GROUP BY pat),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS k FROM h),
    q AS (SELECT CAST(sum(CAST(floor(
                -(CAST(n AS DOUBLE)
                  / CAST((SELECT tot FROM t) AS DOUBLE))
                * ln(CAST(n AS DOUBLE)
                     / CAST((SELECT tot FROM t) AS DOUBLE))
                * 1000000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
                  AS s
          FROM h)
    SELECT (SELECT tot FROM t) AS n_triples,
           (SELECT k FROM t) AS patterns_seen,
           CAST((SELECT s FROM q) AS DOUBLE) / 1000000000.0
             AS perm_entropy_nats,
           CAST((SELECT s FROM q) AS DOUBLE)
           / (1000000000.0 * ln(6.0))
             AS perm_entropy_norm""")
def permutation_entropy(sf_dir: str):
    """BANDT-POMPE PERMUTATION ENTROPY (order 3) of daily
    revenue: every consecutive triple is reduced to its ordinal
    pattern — which of the 6 orderings the three values take,
    ties resolved to the earlier day (the <= convention, identical
    both engines) — and the Shannon entropy of the 6-pattern
    census, normalized by ln 6, measures dynamical complexity:
    robust to any monotone transform of the values (unlike
    lz_complexity's fixed binarization) and the standard quick
    test separating deterministic structure from noise. Pattern
    ids are pure integer comparisons; entropy terms are
    nano-quantized shared floats summed exactly. Scale plan:
    bounded day-domain combine; the pattern census is a map-only
    scan."""
    days, v = _daily_revenue(sf_dir)
    pats = {}
    for a, b, c in zip(v, v[1:], v[2:]):
        pat = 4 * (1 if a <= b else 0) \
            + 2 * (1 if b <= c else 0) + (1 if a <= c else 0)
        pats[pat] = pats.get(pat, 0) + 1
    tot = sum(pats.values())
    s = 0
    for n in pats.values():
        p = np.float64(n) / np.float64(tot)
        s += int(np.floor(-(p) * np.log(p) * 1000000000.0
                          + 0.5))
    return pd.DataFrame({
        "n_triples": [np.int64(tot)],
        "patterns_seen": [np.int64(len(pats))],
        "perm_entropy_nats": [np.float64(s) / 1000000000.0],
        "perm_entropy_norm": [np.float64(s)
                              / (1000000000.0
                                 * np.log(6.0))]})


@register("sample_entropy", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i,
                 v
          FROM d),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 (max(v) - min(v)) // 10 AS r
          FROM x),
    b2 AS (SELECT CAST(count(*) AS BIGINT) AS b
           FROM x a1 JOIN x a2 ON a2.i > a1.i
                AND a2.i <= (SELECT n FROM t) - 1
                AND a1.i <= (SELECT n FROM t) - 1
           JOIN x b1 ON b1.i = a1.i + 1
           JOIN x b2 ON b2.i = a2.i + 1
           WHERE abs(a1.v - a2.v) <= (SELECT r FROM t)
             AND abs(b1.v - b2.v) <= (SELECT r FROM t)),
    a3 AS (SELECT CAST(count(*) AS BIGINT) AS a
           FROM x a1 JOIN x a2 ON a2.i > a1.i
                AND a2.i <= (SELECT n FROM t) - 2
                AND a1.i <= (SELECT n FROM t) - 2
           JOIN x b1 ON b1.i = a1.i + 1
           JOIN x b2 ON b2.i = a2.i + 1
           JOIN x c1 ON c1.i = a1.i + 2
           JOIN x c2 ON c2.i = a2.i + 2
           WHERE abs(a1.v - a2.v) <= (SELECT r FROM t)
             AND abs(b1.v - b2.v) <= (SELECT r FROM t)
             AND abs(c1.v - c2.v) <= (SELECT r FROM t))
    SELECT (SELECT n FROM t) AS n_days,
           (SELECT b FROM b2) AS template_pairs_m2,
           (SELECT a FROM a3) AS template_pairs_m3,
           -ln(CAST((SELECT a FROM a3) AS DOUBLE)
               / CAST((SELECT b FROM b2) AS DOUBLE))
             AS sample_entropy""")
def sample_entropy(sf_dir: str):
    """SAMPLE ENTROPY (m = 2, r = range/10) of daily revenue:
    -ln(A/B) where B counts pairs of length-2 templates within
    Chebyshev distance r and A the pairs still matching when
    extended to length 3 — the regularity statistic of the
    physiological-signals literature (low SampEn = patterns that
    continue predictably; high = novelty at every step), immune
    to the self-match bias of approximate entropy. The tolerance
    is the exact integer (max-min)//10 and every template match
    is an exact integer comparison, so A and B are exact counts;
    the final -ln ratio is one shared float. Scale plan: bounded
    day-domain combine; the O(n^2) template scan is vectorized
    driver work (tiles into map_batches blocks at fleet scale)."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    va = np.array(v, np.int64)
    r = (int(va.max()) - int(va.min())) // 10
    b = a = 0
    for i in range(n - 2):
        # j ranges over i+1 .. n-2 for m=2; restrict further for m=3
        j = np.arange(i + 1, n - 1)
        m2 = (np.abs(va[i] - va[j]) <= r) \
            & (np.abs(va[i + 1] - va[j + 1]) <= r)
        b += int(m2.sum())
        j3 = j[j <= n - 3]
        m2c = m2[: len(j3)]
        m3 = m2c & (np.abs(va[i + 2] - va[j3 + 2]) <= r)
        a += int(m3.sum())
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "template_pairs_m2": [np.int64(b)],
        "template_pairs_m3": [np.int64(a)],
        "sample_entropy": [-np.log(np.float64(a)
                                   / np.float64(b))]})


@register("rqa_census", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i,
                 v
          FROM d),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 (max(v) - min(v)) // 10 AS r
          FROM x),
    rec AS (SELECT a.i AS i, b.i AS j
            FROM x a JOIN x b ON b.i > a.i
            WHERE abs(a.v - b.v) <= (SELECT r FROM t)),
    diag AS (SELECT CAST(count(*) AS BIGINT) AS d2
             FROM rec r1 JOIN rec r2
               ON r2.i = r1.i + 1 AND r2.j = r1.j + 1)
    SELECT (SELECT n FROM t) AS n_days,
           CAST((SELECT count(*) FROM rec) AS BIGINT)
             AS recurrent_pairs,
           CAST((SELECT count(*) FROM rec) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * (CAST((SELECT n FROM t) AS DOUBLE) - 1.0)
              / 2.0) AS recurrence_rate,
           CAST((SELECT d2 FROM diag) AS BIGINT)
             AS diagonal_pairs,
           CAST((SELECT d2 FROM diag) AS DOUBLE)
           / CAST((SELECT count(*) FROM rec) AS DOUBLE)
             AS determinism""")
def rqa_census(sf_dir: str):
    """RECURRENCE QUANTIFICATION of daily revenue: the recurrence
    rate (share of day pairs within tolerance r = range/10 of each
    other) and determinism (share of recurrent pairs whose
    SUCCESSORS also recur — diagonal structure in the recurrence
    plot) — the dynamical-systems census separating 'the series
    revisits levels' from 'the series revisits TRAJECTORIES'
    (high RR + low DET = noisy mean reversion; high DET = repeated
    motifs that sample_entropy prices globally). The tolerance
    and every pair predicate are exact integers; the two ratios
    are the only floats. Scale plan: bounded day-domain combine;
    the pair scans are vectorized driver work."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    va = np.array(v, np.int64)
    r = (int(va.max()) - int(va.min())) // 10
    rec = 0
    diag = 0
    prev_mask = None
    for i in range(n - 1):
        j = np.arange(i + 1, n)
        m = np.abs(va[i] - va[j]) <= r
        rec += int(m.sum())
        if prev_mask is not None:
            # ((i-1, j), (i, j+1)) both recurrent: index t of j in
            # prev_mask equals index t of j+1 in m, so the masks
            # align head-to-head with no shift
            diag += int((prev_mask[: len(m)] & m).sum())
        prev_mask = m
    return pd.DataFrame({
        "n_days": [np.int64(n)],
        "recurrent_pairs": [np.int64(rec)],
        "recurrence_rate": [np.float64(rec)
                            / (np.float64(n)
                               * (np.float64(n) - 1.0) / 2.0)],
        "diagonal_pairs": [np.int64(diag)],
        "determinism": [np.float64(diag) / np.float64(rec)]})
