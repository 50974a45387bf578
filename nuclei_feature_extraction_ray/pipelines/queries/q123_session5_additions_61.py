# round-5 session-5 additions, batch 61: distinct-n diversity per
# source, arc elasticity along the discount ladder, and agreement
# between two anomaly detectors.
from __future__ import annotations

import hashlib

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_AA_K = 20
_ISO_K = 8


@register("distinct_ngrams", sql="""
    WITH d AS (SELECT source, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    toks AS (SELECT source,
                    string_split_regex(t, '[ \\t\\n\\r\\f]+')
                      AS arr
             FROM d),
    u1 AS (SELECT source, unnest(arr) AS g FROM toks),
    u2 AS (SELECT source,
                  arr[i] || ' ' || arr[i + 1] AS g
           FROM toks, LATERAL (SELECT unnest(generate_series(
                1, len(arr) - 1)) AS i)),
    s1 AS (SELECT source, CAST(count(*) AS BIGINT) AS total1,
                  CAST(count(DISTINCT g) AS BIGINT) AS uniq1
           FROM u1 GROUP BY source),
    s2 AS (SELECT source, CAST(count(*) AS BIGINT) AS total2,
                  CAST(count(DISTINCT g) AS BIGINT) AS uniq2
           FROM u2 GROUP BY source)
    SELECT s1.source, s1.total1 AS n_unigrams,
           CAST(s1.uniq1 AS DOUBLE)
             / CAST(s1.total1 AS DOUBLE) AS distinct_1,
           s2.total2 AS n_bigrams,
           CAST(s2.uniq2 AS DOUBLE)
             / CAST(s2.total2 AS DOUBLE) AS distinct_2
    FROM s1 JOIN s2 ON s2.source = s1.source
    ORDER BY s1.source""")
def distinct_ngrams(sf_dir: str):
    """DISTINCT-1 / DISTINCT-2 diversity per source: unique
    unigrams and within-document bigrams over their totals — the
    NLG diversity metric that flags mode-collapsed or templated
    text (low distinct-2 with normal distinct-1 means the same
    word PAIRS repeat; the generation-side complement of
    bigram_cond_entropy's predictability). Counts are exact
    integers through token- and bigram-keyed exchanges; the two
    ratios are the only divisions. Scale plan: per-batch n-gram
    count partials co-locate by gram so per-source distinct
    counting is exact inside the exchange; per-source scalars
    out."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        toks = vals.to_numpy(zero_copy_only=False)
        src = np.repeat(b["source"].to_numpy(object), k)
        doc = np.repeat(np.arange(len(k), dtype=np.int64), k)
        frames = [pd.DataFrame({
            "n": 1, "source": src, "g": toks,
            "c": np.ones(len(toks), np.int64)})]
        if len(toks) > 1:
            same = doc[1:] == doc[:-1]
            big = np.array([a + " " + b for a, b in
                            zip(toks[:-1][same], toks[1:][same])],
                           object)
            frames.append(pd.DataFrame({
                "n": 2, "source": src[:-1][same], "g": big,
                "c": np.ones(len(big), np.int64)}))
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["n", "source", "g"],
                           as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["n", "source", "g"], as_index=False) \
            ["c"].sum()
        out = a.groupby(["n", "source"], as_index=False).agg(
            total=("c", "sum"), uniq=("g", "size"))
        for c in ("total", "uniq"):
            out[c] = out[c].astype(np.int64)
        return out

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["g"], cells, 16),
        ["n", "source"], ["total", "uniq"])
    rows = []
    for src in sorted(s["source"].unique()):
        r1 = s[(s["n"] == 1) & (s["source"] == src)].iloc[0]
        r2 = s[(s["n"] == 2) & (s["source"] == src)].iloc[0]
        rows.append({
            "source": src,
            "n_unigrams": np.int64(int(r1["total"])),
            "distinct_1": np.float64(int(r1["uniq"]))
            / np.float64(int(r1["total"])),
            "n_bigrams": np.int64(int(r2["total"])),
            "distinct_2": np.float64(int(r2["uniq"]))
            / np.float64(int(r2["total"]))})
    return pd.DataFrame(rows)


@register("arc_elasticity", sql="""
    WITH g AS (SELECT CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS d,
                      CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem GROUP BY 1),
    p AS (SELECT d, n, q,
                 lead(d) OVER (ORDER BY d) AS d2,
                 lead(n) OVER (ORDER BY d) AS n2,
                 lead(q) OVER (ORDER BY d) AS q2
          FROM g)
    SELECT d AS discount_pct_lo, d2 AS discount_pct_hi,
           CAST(q AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty_lo,
           CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE)
             AS mean_qty_hi,
           ((CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE)
             - CAST(q AS DOUBLE) / CAST(n AS DOUBLE))
            / ((CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE)
                + CAST(q AS DOUBLE) / CAST(n AS DOUBLE)) / 2.0))
           / ((CAST(d2 - d AS DOUBLE))
              / ((CAST(d2 + d AS DOUBLE)) / 2.0
                 + 0.0000001)) AS arc_elasticity
    FROM p WHERE d2 IS NOT NULL ORDER BY d""")
def arc_elasticity(sf_dir: str):
    """ARC ELASTICITY along the discount ladder: between each
    adjacent discount level, the midpoint-formula elasticity of
    mean quantity with respect to the discount — the demand-curve
    reading that turns discount_quantity_corr's single number into
    a level-by-level response profile (where on the ladder does
    another point of discount actually move volume?). Level cells
    are exact integers; means and the midpoint formula (with the
    documented epsilon guarding the 0%-to-1% step's zero
    midpoint) are shared float expressions. Scale plan: the
    bounded discount-level census, map-only; the ladder scan is
    O(levels) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_discount", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "d": np.floor(b["l_discount"].to_numpy(np.float64)
                          * 100 + 0.5).astype(np.int64),
            "n": np.ones(len(b), np.int64),
            "q": b["l_quantity"].to_numpy(np.int64)}) \
            .groupby("d", as_index=False).sum()
        for c in ("n", "q"):
            g[c] = g[c].astype(np.int64)
        return g

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["d"], ["n", "q"], exact_int=True).sort_values("d") \
        .reset_index(drop=True)
    rows = []
    for i in range(len(g) - 1):
        d1, d2 = int(g["d"].iloc[i]), int(g["d"].iloc[i + 1])
        n1, n2 = int(g["n"].iloc[i]), int(g["n"].iloc[i + 1])
        q1, q2 = int(g["q"].iloc[i]), int(g["q"].iloc[i + 1])
        m1 = np.float64(q1) / np.float64(n1)
        m2 = np.float64(q2) / np.float64(n2)
        el = ((m2 - m1) / ((m2 + m1) / 2.0)) \
            / (np.float64(d2 - d1)
               / (np.float64(d2 + d1) / 2.0 + 0.0000001))
        rows.append({
            "discount_pct_lo": np.int64(d1),
            "discount_pct_hi": np.int64(d2),
            "mean_qty_lo": m1, "mean_qty_hi": m2,
            "arc_elasticity": np.float64(el)})
    return pd.DataFrame(rows)


@register("anomaly_agreement", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s FROM d),
    za AS (SELECT day,
                  abs(CAST(v AS HUGEINT) * (SELECT n FROM n)
                      - (SELECT s FROM n)) AS dev,
                  row_number() OVER (ORDER BY
                      abs(CAST(v AS HUGEINT) * (SELECT n FROM n)
                          - (SELECT s FROM n)) DESC, day) AS rz
           FROM d),
    rk AS (SELECT day, v,
                  row_number() OVER (ORDER BY v, day) AS i
           FROM d),
    st AS (SELECT CAST(s AS BIGINT) AS s,
                  CAST(1 + ('0x' || substr(md5('iso' ||
                       CAST(s AS VARCHAR)), 1, 16))::UBIGINT
                       % CAST((SELECT n FROM n) - 1 AS UBIGINT)
                       AS BIGINT) AS cut
           FROM (SELECT unnest(generate_series(0, {k} - 1))
                   AS s)),
    votes AS (SELECT rk.day,
                     CAST(sum(CASE WHEN
                          (rk.i <= st.cut
                           AND 2 * st.cut <= (SELECT n FROM n))
                          OR (rk.i > st.cut
                              AND 2 * st.cut > (SELECT n FROM n))
                          THEN 1 ELSE 0 END) AS BIGINT) AS votes
              FROM rk CROSS JOIN st GROUP BY rk.day),
    iso AS (SELECT day,
                   row_number() OVER (ORDER BY votes DESC, day)
                     AS ri
            FROM votes)
    SELECT CAST({t} AS BIGINT) AS k_top,
           CAST((SELECT count(*) FROM za JOIN iso
                 ON iso.day = za.day
                 WHERE za.rz <= {t} AND iso.ri <= {t})
                AS BIGINT) AS n_overlap,
           CAST((SELECT count(*) FROM za JOIN iso
                 ON iso.day = za.day
                 WHERE za.rz <= {t} AND iso.ri <= {t})
                AS DOUBLE) / {t}.0 AS agreement_rate""".format(
    k=_ISO_K, t=_AA_K))
def anomaly_agreement(sf_dir: str):
    """ANOMALY-DETECTOR AGREEMENT: the overlap@{t} between the
    top-{t} days by mean-deviation (|v*n - S|, the z-style ranking
    with day tie-break) and the top-{t} by isolation-stump votes
    (isolation_stumps' hash-seeded cuts, vote-count ranking) — two
    detectors built on DIFFERENT principles agreeing is the
    cheapest form of anomaly validation an unlabeled pipeline can
    get (the detector-level cousin of dawid_skene_lite's rater
    QC). Deviations, ranks, votes and the overlap census are all
    exact integers. Scale plan: bounded day-domain combine; both
    rankings and the join are O(days) driver work."""
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
    s = int(v.sum())
    dev = [abs(int(x) * n - s) for x in v]
    zorder = sorted(range(n), key=lambda i: (-dev[i],
                                             int(day[i])))
    ztop = set(int(day[i]) for i in zorder[:_AA_K])
    order = np.lexsort((day, v))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(1, n + 1)
    votes = np.zeros(n, np.int64)
    for st in range(_ISO_K):
        hx = hashlib.md5(("iso%d" % st).encode()) \
            .hexdigest()[:16]
        cut = 1 + int(hx, 16) % (n - 1)
        low_small = 2 * cut <= n
        votes += np.where(rank <= cut,
                          1 if low_small else 0,
                          0 if low_small else 1)
    iorder = sorted(range(n), key=lambda i: (-int(votes[i]),
                                             int(day[i])))
    itop = set(int(day[i]) for i in iorder[:_AA_K])
    overlap = len(ztop & itop)
    return pd.DataFrame({
        "k_top": [np.int64(_AA_K)],
        "n_overlap": [np.int64(overlap)],
        "agreement_rate": [np.float64(overlap)
                           / np.float64(_AA_K)]})
