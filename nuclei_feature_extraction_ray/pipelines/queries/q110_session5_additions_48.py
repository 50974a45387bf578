# round-5 session-5 additions, batch 48: WoE bin-monotonicity
# audit, extreme-day weekday attribution, and the vocabulary
# concentration curve.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_WM_BINS = 10
_ED_TOPK = (10, 100, 1000)


@register("woe_monotonicity", sql="""
    WITH o AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT) AS x,
                      CAST(CASE WHEN o_orderpriority IN
                                ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END AS BIGINT) AS y,
                      o_orderkey AS k
               FROM orders),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM o),
    r AS (SELECT x, y,
                 CAST((row_number() OVER (ORDER BY x, k) - 1)
                      * {b} // (SELECT n FROM n) AS BIGINT)
                   AS bin
          FROM o),
    g AS (SELECT bin, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(y) AS BIGINT) AS ev
          FROM r GROUP BY bin),
    l AS (SELECT bin, cnt, ev,
                 lag(ev) OVER (ORDER BY bin) AS pev,
                 lag(cnt) OVER (ORDER BY bin) AS pcnt
          FROM g),
    s AS (SELECT CAST(sum(CASE WHEN pev IS NOT NULL
                 AND CAST(ev AS HUGEINT) * pcnt
                     <> CAST(pev AS HUGEINT) * cnt
                 AND (CASE WHEN CAST(ev AS HUGEINT) * pcnt
                                > CAST(pev AS HUGEINT) * cnt
                           THEN 1 ELSE -1 END)
                     <> (CASE WHEN (SELECT
                           CASE WHEN CAST(g2.ev AS HUGEINT)
                                     * g1.cnt
                                     > CAST(g1.ev AS HUGEINT)
                                       * g2.cnt
                                THEN 1 ELSE -1 END
                           FROM g g1, g g2
                           WHERE g1.bin = 0
                             AND g2.bin = {b} - 1) = 1
                          THEN 1 ELSE -1 END)
                 THEN 1 ELSE 0 END) AS BIGINT) AS violations
          FROM l)
    SELECT CAST({b} AS BIGINT) AS n_bins,
           (SELECT violations FROM s) AS monotonicity_violations,
           CAST(CASE WHEN (SELECT violations FROM s) = 0
                     THEN 1 ELSE 0 END AS BIGINT) AS is_monotone
    """.format(b=_WM_BINS))
def woe_monotonicity(sf_dir: str):
    """WoE BIN-MONOTONICITY AUDIT: split orders into {b}
    equal-count value deciles (exact rank binning, orderkey
    tie-break) and count adjacent-bin event-rate moves AGAINST the
    overall first-to-last direction — the credit-scoring sanity
    gate that a scorecard's binning (woe_iv / decile_lift) must
    pass before its WoE curve is monotone enough to deploy. Every
    rate comparison is an EXACT integer cross-multiplication
    (ev*pcnt vs pev*cnt), the reference direction comes from the
    first and last bins the same way, and the verdict is an
    integer. Scale plan: the decile assignment is the two-phase
    rank exchange at fleet scale; bin cells are a bounded grid."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice",
                                  "o_orderpriority"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        return pd.DataFrame({
            "x": x, "k": b["o_orderkey"].to_numpy(np.int64),
            "y": (np.isin(b["o_orderpriority"].to_numpy(object),
                          ["1-URGENT", "2-HIGH"]))
            .astype(np.int64)})

    rows = ds.map_batches(partial, batch_format="pandas") \
        .limit(1_000_001).to_pandas()
    if len(rows) > 1_000_000:
        raise ValueError("woe_monotonicity: order frame exceeds "
                         "the driver bound; use the two-phase "
                         "rank exchange tier")
    rows = rows.sort_values(["x", "k"],
                            kind="mergesort").reset_index(drop=True)
    n = len(rows)
    binv = (np.arange(n, dtype=np.int64) * _WM_BINS) // n
    g = pd.DataFrame({"bin": binv,
                      "cnt": 1,
                      "ev": rows["y"].to_numpy(np.int64)}) \
        .groupby("bin", as_index=False).sum().sort_values("bin")
    cnt = g["cnt"].to_numpy(np.int64)
    ev = g["ev"].to_numpy(np.int64)
    ref = 1 if int(ev[-1]) * int(cnt[0]) \
        > int(ev[0]) * int(cnt[-1]) else -1
    viol = 0
    for i in range(1, len(g)):
        lhs = int(ev[i]) * int(cnt[i - 1])
        rhs = int(ev[i - 1]) * int(cnt[i])
        if lhs != rhs:
            step = 1 if lhs > rhs else -1
            if step != ref:
                viol += 1
    return pd.DataFrame({
        "n_bins": [np.int64(_WM_BINS)],
        "monotonicity_violations": [np.int64(viol)],
        "is_monotone": [np.int64(1 if viol == 0 else 0)]})


@register("extreme_day_attribution", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    r AS (SELECT day, ((day + 3) % 7) + 1 AS dow,
                 row_number() OVER (ORDER BY v DESC, day) AS i
          FROM d),
    base AS (SELECT dow, CAST(count(*) AS BIGINT) AS nb
             FROM r GROUP BY dow),
    top AS (SELECT dow, CAST(count(*) AS BIGINT) AS nt
            FROM r WHERE i <= (SELECT n FROM n) // 10
            GROUP BY dow),
    k AS (SELECT CAST((SELECT n FROM n) // 10 AS BIGINT) AS k)
    SELECT base.dow,
           base.nb AS n_days,
           CAST(COALESCE(top.nt, 0) AS BIGINT) AS n_extreme,
           CAST(COALESCE(top.nt, 0) AS DOUBLE)
             * CAST((SELECT n FROM n) AS DOUBLE)
             / (CAST((SELECT k FROM k) AS DOUBLE)
                * CAST(base.nb AS DOUBLE)) AS lift
    FROM base LEFT JOIN top ON top.dow = base.dow
    ORDER BY base.dow""")
def extreme_day_attribution(sf_dir: str):
    """EXTREME-DAY WEEKDAY ATTRIBUTION: which weekdays produce the
    top-decile revenue days? Per-weekday membership in the top
    n//10 days (revenue DESC, day tie-break) against its base-rate
    share, reported as lift — the spike-attribution census that
    tells capacity planning WHEN gumbel_block_maxima's extremes
    actually arrive (the integer dow key (day+3)%7+1, no calendar
    function). The cut, censuses and joins are exact integers;
    lift is one shared float expression. Scale plan: bounded
    day-domain combine; ranking is O(days) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    day = d["day"].to_numpy(np.int64)
    v = np.array([int(x) for x in d["v"]], np.int64)
    n = len(v)
    k = n // 10
    order = np.lexsort((day, -v))
    top_days = day[order][:k]
    dow_all = ((day + 3) % 7) + 1
    dow_top = ((top_days + 3) % 7) + 1
    base = pd.Series(dow_all).value_counts()
    top = pd.Series(dow_top).value_counts()
    rows = []
    for dw in sorted(base.index):
        nb = int(base[dw])
        nt = int(top.get(dw, 0))
        rows.append({
            "dow": np.int64(dw), "n_days": np.int64(nb),
            "n_extreme": np.int64(nt),
            "lift": np.float64(nt) * np.float64(n)
            / (np.float64(k) * np.float64(nb))})
    return pd.DataFrame(rows)


@register("vocab_concentration", sql="""
    WITH d AS (SELECT trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    c AS (SELECT term, CAST(count(*) AS BIGINT) AS n
          FROM w GROUP BY term),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot,
                 CAST(count(*) AS BIGINT) AS vocab FROM c),
    r AS (SELECT n, row_number() OVER (ORDER BY n DESC, term)
                   AS i
          FROM c),
    ks AS (SELECT CAST(k AS BIGINT) AS k
           FROM (SELECT unnest([{ks}]) AS k))
    SELECT ks.k AS top_k,
           (SELECT CAST(vocab FROM?) ) AS x
    FROM ks""".replace(
    "(SELECT CAST(vocab FROM?) ) AS x",
    """CAST((SELECT COALESCE(sum(n), 0) FROM r
                 WHERE i <= ks.k) AS BIGINT) AS token_count,
           CAST((SELECT COALESCE(sum(n), 0) FROM r
                 WHERE i <= ks.k) AS DOUBLE)
             / CAST((SELECT tot FROM t) AS DOUBLE)
             AS token_share""").format(
    ks=", ".join(str(k) for k in _ED_TOPK)) + " ORDER BY ks.k")
def vocab_concentration(sf_dir: str):
    """VOCABULARY CONCENTRATION CURVE: the share of ALL tokens
    covered by the top-10 / top-100 / top-1000 terms (count DESC,
    term tie-break) — the tokenizer-budget planning curve that
    says how much of the stream a small vocab already covers
    (vocab_coverage checks a GIVEN vocab; this sweeps the frontier
    zipf_fit parameterizes). Term counts fold through the
    term-keyed exchange; prefix sums at the three cuts are exact
    integers and only the share divides. Scale plan: per-partition
    local top-1000 candidates merge on the driver (exact — a
    term's global count lives in one partition, the burrows_delta
    argument); the total token count is one scalar fold."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text"])

    def tcount(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = tokens_flat(b["text"])
        un = pd.Series(vals.to_numpy(zero_copy_only=False),
                       dtype=object).value_counts()
        return pd.DataFrame({"term": un.index.to_numpy(object),
                             "n": un.to_numpy(np.int64)})

    def localtop(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)["n"].sum()
        a["n"] = a["n"].astype(np.int64)
        top = a.sort_values(["n", "term"],
                            ascending=[False, True],
                            kind="mergesort").head(max(_ED_TOPK))
        top = top.assign(tot=np.int64(0))
        tot = pd.DataFrame({"term": [""],
                            "n": [np.int64(0)],
                            "tot": [np.int64(int(a["n"].sum()))]})
        return pd.concat([top, tot], ignore_index=True)

    cand = _combine_partials(
        partition_map(ds.map_batches(tcount, batch_format="pandas"),
                      ["term"], localtop, 16),
        ["term"], ["n", "tot"])
    tot = int(cand["tot"].sum())
    terms = cand[cand["term"] != ""]
    top = terms.sort_values(["n", "term"],
                            ascending=[False, True],
                            kind="mergesort").head(max(_ED_TOPK))
    counts = top["n"].to_numpy(np.int64)
    rows = []
    for k in _ED_TOPK:
        tc = int(counts[:k].sum()) if len(counts) else 0
        rows.append({
            "top_k": np.int64(k),
            "token_count": np.int64(tc),
            "token_share": np.float64(tc) / np.float64(tot)})
    return pd.DataFrame(rows)
