# round-5 session-5 additions, batch 84: edit distance between
# half-series signatures, dominant seasonality period by exact ACF
# argmax, and the birthday-paradox collision audit.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...functions.hashing import md5_id64_flat
from .q143_session5_additions_81 import _DAILY_SQL, _daily_revenue


@register("edit_distance_signature", sql="""
    WITH """ + _DAILY_SQL + """,
    x AS (SELECT day, v, lag(v) OVER (ORDER BY day) AS pv FROM d),
    st AS (SELECT string_agg(CASE WHEN v > pv THEN '1'
                             ELSE '0' END, '' ORDER BY day) AS s
           FROM x WHERE pv IS NOT NULL),
    h AS (SELECT substr(s, 1, len(s) // 2) AS s1,
                 substr(s, len(s) // 2 + 1) AS s2
          FROM st)
    SELECT CAST(len(s1) AS BIGINT) AS len_first,
           CAST(len(s2) AS BIGINT) AS len_second,
           CAST(levenshtein(s1, s2) AS BIGINT) AS edit_distance,
           CAST(levenshtein(s1, s2) AS DOUBLE)
           / CAST(greatest(len(s1), len(s2)) AS DOUBLE)
             AS edit_distance_norm
    FROM h""")
def edit_distance_signature(sf_dir: str):
    """LEVENSHTEIN EDIT DISTANCE between the first- and
    second-half up/down signatures of daily revenue: encode each
    day as 1/0 (rose/fell), split the string in half, and compute
    the unit-cost edit distance — a regime-similarity check that
    sees ORDER (a weekday rhythm shifted by one day costs ~2 edits
    per week, while markov_drift's transition matrices barely
    move). The signature is exact integer comparisons; the DP is
    pure integer (the oracle uses DuckDB's built-in levenshtein,
    the engine the classic two-row DP — both the standard
    ins/del/sub metric). Scale plan: bounded day-domain combine;
    the DP is O(n^2/4) driver work on the day string."""
    days, v = _daily_revenue(sf_dir)
    s = "".join("1" if b > a else "0" for a, b in zip(v, v[1:]))
    half = len(s) // 2
    s1, s2 = s[:half], s[half:]
    prev = list(range(len(s2) + 1))
    for i, ch1 in enumerate(s1, start=1):
        cur = [i] + [0] * len(s2)
        for j, ch2 in enumerate(s2, start=1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (0 if ch1 == ch2 else 1))
        prev = cur
    dist = prev[len(s2)]
    return pd.DataFrame({
        "len_first": [np.int64(len(s1))],
        "len_second": [np.int64(len(s2))],
        "edit_distance": [np.int64(dist)],
        "edit_distance_norm": [np.float64(dist)
                               / np.float64(max(len(s1),
                                                len(s2)))]})


@register("dominant_period", sql="""
    WITH """ + _DAILY_SQL + """,
    t AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    x AS (SELECT CAST(row_number() OVER (ORDER BY day)
                      AS BIGINT) AS i,
                 (SELECT n FROM t) * v - (SELECT s FROM t) AS z
          FROM d),
    dd AS (SELECT CAST(sum(z * z) AS HUGEINT) AS d2 FROM x),
    lags AS (SELECT CAST(h AS BIGINT) AS h FROM range(2, 61)
             t(h)),
    acf AS (SELECT lags.h,
                   CAST(sum(a.z * b.z) AS HUGEINT) AS num,
                   CAST(count(*) AS HUGEINT) AS m
            FROM lags
            JOIN x a ON TRUE
            JOIN x b ON b.i = a.i + lags.h
            GROUP BY lags.h),
    sc AS (SELECT h, num, m,
                  num * 1000000 // m AS score
           FROM acf),
    w AS (SELECT h, num, m FROM sc
          ORDER BY score DESC, h LIMIT 1)
    SELECT (SELECT h FROM w) AS dominant_lag,
           CAST((SELECT m FROM w) AS BIGINT) AS n_pairs,
           (CAST((SELECT num FROM w) AS DOUBLE)
            / CAST((SELECT m FROM w) AS DOUBLE))
           / (CAST((SELECT d2 FROM dd) AS DOUBLE)
              / CAST((SELECT n FROM t) AS DOUBLE))
             AS acf_at_dominant""")
def dominant_period(sf_dir: str):
    """DOMINANT SEASONALITY PERIOD of daily revenue: the lag in
    2..60 maximizing the autocovariance of mean deviations — the
    PERIOD-DETECTION argmax that daily_acf's fixed-lag table
    leaves to the eye (a clean weekly rhythm pins it at 7; 30ish
    flags a billing cycle). Deviations are the exact scaled
    integers n*x - S, so each lag's covariance sum is an exact
    big int, and the argmax is decided by the deterministic
    integer score num*1e6 // m (identical floor-division both
    engines, smallest-lag tie-break); the reported ACF value is
    one shared float expression. Scale plan: bounded day-domain
    combine; the 59-lag scan is O(59 n) driver work."""
    days, v = _daily_revenue(sf_dir)
    n = len(v)
    s = sum(v)
    z = [n * x - s for x in v]
    d2 = sum(a * a for a in z)
    best = None
    for h in range(2, 61):
        num = sum(z[i] * z[i + h] for i in range(n - h))
        m = n - h
        # DuckDB // truncates toward zero; mirror that exactly
        score = (num * 1000000 // m) if num >= 0 \
            else -((-num) * 1000000 // m)
        if best is None or score > best[0]:
            best = (score, h, num, m)
    _, h, num, m = best
    acf = (np.float64(num) / np.float64(m)) \
        / (np.float64(d2) / np.float64(n))
    return pd.DataFrame({
        "dominant_lag": [np.int64(h)],
        "n_pairs": [np.int64(m)],
        "acf_at_dominant": [np.float64(acf)]})


@register("birthday_collisions", sql="""
    WITH b AS (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                          || ':bday'), 1, 16))
                      ::UBIGINT >> 48 AS bucket
               FROM documents),
    h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY bucket),
    t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS used,
                 CAST(sum(c * (c - 1) // 2) AS HUGEINT) AS col
          FROM h)
    SELECT (SELECT n FROM t) AS n_docs,
           (SELECT used FROM t) AS buckets_used,
           CAST((SELECT col FROM t) AS BIGINT) AS collisions,
           CAST((SELECT n FROM t) AS DOUBLE)
           * (CAST((SELECT n FROM t) AS DOUBLE) - 1.0)
           / (2.0 * 65536.0) AS expected_collisions,
           CAST((SELECT col FROM t) AS DOUBLE)
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * (CAST((SELECT n FROM t) AS DOUBLE) - 1.0)
              / (2.0 * 65536.0)) AS collision_ratio""")
def birthday_collisions(sf_dir: str):
    """BIRTHDAY-PARADOX COLLISION AUDIT of a 16-bit hash bucket
    space: actual pair collisions sum C(c_b, 2) over the 65536
    md5-derived buckets versus the uniform expectation
    n(n-1)/2^17 — the capacity-planning sanity check for any
    hash-partitioned layout (a ratio well above 1 means the hash
    or the id space is clumping and hot partitions will follow;
    hash_bit_balance checks BITS, this checks PAIRWISE load).
    Buckets are the top 16 bits of the portable md5 twin (engine
    kernel and SQL read the same hex prefix); counts and
    collision pairs are exact integers; expectation and ratio are
    shared float expressions. Scale plan: map-only hash into a
    bounded bucket combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hi, _ = md5_id64_flat(b["doc_id"].to_numpy(np.int64),
                              ":bday")
        g = pd.DataFrame({
            "bucket": (hi >> np.uint64(48)).astype(np.int64),
            "c": np.ones(len(b), np.int64)}) \
            .groupby("bucket", as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["bucket"], ["c"])
    cs = [int(x) for x in h["c"]]
    n = sum(cs)
    used = len(cs)
    col = sum(c * (c - 1) // 2 for c in cs)
    exp = np.float64(n) * (np.float64(n) - 1.0) / (2.0 * 65536.0)
    return pd.DataFrame({
        "n_docs": [np.int64(n)],
        "buckets_used": [np.int64(used)],
        "collisions": [np.int64(col)],
        "expected_collisions": [np.float64(exp)],
        "collision_ratio": [np.float64(col) / exp]})
