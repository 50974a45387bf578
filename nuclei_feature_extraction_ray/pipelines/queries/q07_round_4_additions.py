# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, datetime, np, pa, partition_map, pc, pd, ray, rd, register)

@register("q6_revenue", sql="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_cp,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24""")
def q6_revenue(sf_dir: str):
    """TPC-H-Q6-shaped pure scan: predicate-pushed parquet read (date
    range + quantity at the row-group level), a vectorized discount
    band inside the batch, and ONE integer cents×percent partial per
    batch — the whole corpus collapses to blocks-many 3-column rows
    with no exchange at all. The canonical embarrassingly-parallel
    filter-agg; its wall-time is the engine's scan floor."""
    lo = datetime(1996, 1, 1)
    hi = datetime(1997, 1, 1)
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_quantity",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("l_shipdate") < pa.scalar(hi, pa.timestamp("us")))
                & (pc.field("l_quantity") < 24)))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pct = np.round(b["l_discount"].to_numpy() * 100).astype(np.int64)
        keep = (pct >= 5) & (pct <= 7)
        cents = np.round(b["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "cp": np.asarray([(cents * pct[keep]).sum()],
                                              np.int64),
                             "n": np.asarray([keep.sum()], np.int64)})

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"), ["k"],
        ["cp", "n"])
    return pd.DataFrame({
        "revenue_cp": out["cp"].to_numpy(np.int64),
        "n_items": out["n"].to_numpy(np.int64)})


@register("q5_local_supplier", sql="""
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cp
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue_cp DESC, n_name""")
def q5_local_supplier(sf_dir: str):
    """TPC-H-Q5-shaped local-supplier volume: a 6-table star where the
    only large×large edge is lineitem⋈orders. Every dimension
    (supplier/customer/nation/region) becomes a guarded broadcast
    lookup (J2), both fact sides are pruned at the read AND
    semi-filtered to the ASIA slice BEFORE the one hash join, and
    lineitem pre-aggregates per batch to (orderkey, supp-nation,
    cents×percent) grain — so the exchange moves aggregate-grain rows
    of the selected region only. Final group-by-nation is a
    per-block partial + 5-row driver merge."""
    lo = datetime(1996, 1, 1)
    hi = datetime(1998, 1, 1)

    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read_dim(_path(sf_dir, "region"), ["r_regionkey", "r_name"])
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = nat[nat["r_name"] == "ASIA"]
    asia_keys = np.sort(asia["n_nationkey"].to_numpy(np.int64))
    asia_names = dict(zip(asia["n_nationkey"].to_numpy(np.int64),
                          asia["n_name"].to_numpy()))

    sup = _read_dim(_path(sf_dir, "supplier"),
                    ["s_suppkey", "s_nationkey"])
    so = np.argsort(sup["s_suppkey"].to_numpy())
    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    co = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((sup["s_suppkey"].to_numpy(np.int64)[so],
                   sup["s_nationkey"].to_numpy(np.int64)[so],
                   cust["c_custkey"].to_numpy(np.int64)[co],
                   cust["c_nationkey"].to_numpy(np.int64)[co],
                   asia_keys))

    def _lookup(keys, vals, probe):
        i = np.clip(np.searchsorted(keys, probe), 0, len(keys) - 1)
        return vals[i], keys[i] == probe

    # Plain functions (tasks), NOT actor pools: this query also runs
    # hash-join aggregator ACTORS downstream; two fixed map pools
    # would pin every CPU of a small session and the aggregators
    # could never schedule (observed hard stall at num_cpus=4).
    # ray.get of the broadcast ref inside a task is a zero-copy
    # shared-memory read of an already-local object.
    def order_nat(b: pd.DataFrame) -> pd.DataFrame:
        """orders -> (o_orderkey, cnat) for ASIA customers only."""
        _, _, ck, cn, asia_ = ray.get(ref)
        nat_, ok = _lookup(ck, cn, b["o_custkey"].to_numpy(np.int64))
        keep = ok & np.isin(nat_, asia_)
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64)[keep],
            "cnat": nat_[keep]})

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        """lineitem -> per-batch (l_orderkey, snat, cp) partials for
        ASIA suppliers only (integer cents×percent, exact)."""
        sk, sn, _, _, asia_ = ray.get(ref)
        nat_, ok = _lookup(sk, sn, b["l_suppkey"].to_numpy(np.int64))
        keep = ok & np.isin(nat_, asia_)
        cents = np.round(b["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        pctl = 100 - np.round(b["l_discount"].to_numpy()[keep]
                              * 100).astype(np.int64)
        d = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64)[keep],
            "snat": nat_[keep], "cp": cents * pctl})
        return d.groupby(["l_orderkey", "snat"],
                         as_index=False).agg(cp=("cp", "sum"))

    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=((pc.field("o_orderdate")
                 >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("o_orderdate")
                   < pa.scalar(hi, pa.timestamp("us"))))) \
        .map_batches(order_nat, batch_format="pandas")

    lrev = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(line_partial, batch_format="pandas")

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = lrev.join(
        orders, "inner", num_partitions=max(2, min(16, ncpu)),
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25})

    def nation_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["snat"] == b["cnat"]]
        g = b.groupby("snat", as_index=False).agg(cp=("cp", "sum"))
        return g.rename(columns={"snat": "natkey"})

    out = _combine_partials(
        joined.map_batches(nation_partial, batch_format="pandas"),
        ["natkey"], ["cp"])
    out["n_name"] = out["natkey"].map(asia_names)
    out = out.rename(columns={"cp": "revenue_cp"}) \
             .sort_values(["revenue_cp", "n_name"],
                          ascending=[False, True], kind="mergesort")
    out["revenue_cp"] = out["revenue_cp"].astype(np.int64)
    return out[["n_name", "revenue_cp"]].reset_index(drop=True)


@register("decile_lift", sql="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS spend_cp
      FROM orders GROUP BY o_custkey),
    d AS (
      SELECT spend_cp,
             ntile(10) OVER (ORDER BY spend_cp DESC, o_custkey)
               AS decile
      FROM spend)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(spend_cp) AS BIGINT) AS decile_cp,
           CAST(sum(spend_cp) AS DOUBLE)
             / CAST((SELECT sum(spend_cp) FROM spend) AS DOUBLE)
             AS share
    FROM d GROUP BY decile ORDER BY decile""")
def decile_lift(sf_dir: str):
    """Customer-value decile (lift) table: exact global NTILE(10) over
    per-customer spend, distributed. Ray Data has no NTILE; this is
    the two-phase rank of quality_rank applied to an aggregate: one
    custkey hash exchange builds customer-grain spend, a tiny
    (spend-histogram) combine gives the driver exact rank offsets +
    the NTILE cut points, and a second spend-keyed exchange assigns
    decile = bucket(rank) partition-locally, shrinking to 10-row
    partials before the driver merge. At web scale swap the exact
    key histogram for sampled range boundaries — same shape."""
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def spend_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["o_totalprice"].to_numpy()
                         * 100).astype(np.int64)
        return pd.DataFrame({"o_custkey": b["o_custkey"].to_numpy(
            np.int64), "cp": cents}) \
            .groupby("o_custkey", as_index=False).agg(cp=("cp", "sum"))

    def spend_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", as_index=False).agg(
            cp=("cp", "sum"))

    spend = partition_map(
        ds.map_batches(spend_partial, batch_format="pandas"),
        ["o_custkey"], spend_final, 16)

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cp", as_index=False).agg(n=("o_custkey", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        spend.map_batches(hist_partial, batch_format="pandas"),
        ["cp"], ["n"]).sort_values("cp", ascending=False,
                                   kind="mergesort")
    counts = hist["n"].to_numpy(np.int64)
    n_total = int(counts.sum())
    total_cp = int((hist["cp"].to_numpy(np.int64) * counts).sum())
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    keys = hist["cp"].to_numpy(np.int64)
    ko = np.argsort(keys)
    ref = ray.put((keys[ko], offs[ko], n_total))

    def ntile_of(rank: np.ndarray, n: int, b: int = 10) -> np.ndarray:
        # SQL NTILE: first (n % b) buckets get ceil(n/b) rows.
        q, rem = divmod(n, b)
        big = rem * (q + 1)
        r0 = rank - 1
        out = np.where(r0 < big, r0 // (q + 1) + 1,
                       rem + (r0 - big) // max(q, 1) + 1)
        return out.astype(np.int64)

    def decile_partial(g: pd.DataFrame) -> pd.DataFrame:
        k, o, n = ray.get(ref)
        g = g.sort_values(["cp", "o_custkey"],
                          ascending=[False, True], kind="mergesort")
        base = o[np.searchsorted(k, g["cp"].to_numpy(np.int64))]
        rank = base + g.groupby("cp", sort=False).cumcount() \
            .to_numpy(np.int64) + 1
        d = pd.DataFrame({"decile": ntile_of(rank, n),
                          "cp": g["cp"].to_numpy(np.int64)})
        out = d.groupby("decile", as_index=False).agg(
            n_cust=("cp", "size"), decile_cp=("cp", "sum"))
        out["n_cust"] = out["n_cust"].astype(np.int64)
        return out

    out = _combine_partials(
        partition_map(spend, ["cp"], decile_partial, 8),
        ["decile"], ["n_cust", "decile_cp"]) \
        .sort_values("decile", kind="mergesort").reset_index(drop=True)
    out["share"] = out["decile_cp"].to_numpy(np.float64) \
        / np.float64(total_cp)
    return out.astype({"decile": np.int64, "n_cust": np.int64,
                       "decile_cp": np.int64})


@register("gini_spend", sql="""
    WITH spend AS (
      SELECT o_custkey, max(c_nationkey) AS natkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cp
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY o_custkey),
    r AS (
      SELECT natkey, cp,
             CAST(row_number() OVER (PARTITION BY natkey
                  ORDER BY cp, o_custkey) AS BIGINT) AS rk
      FROM spend)
    SELECT CAST(natkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(cp) AS BIGINT) AS spend_cp,
           2.0 * CAST(sum(rk * cp) AS DOUBLE)
             / (CAST(count(*) AS DOUBLE) * CAST(sum(cp) AS DOUBLE))
             - (CAST(count(*) AS DOUBLE) + 1.0)
               / CAST(count(*) AS DOUBLE) AS gini
    FROM r GROUP BY natkey ORDER BY nationkey""")
def gini_spend(sf_dir: str):
    """Per-nation Gini coefficient of customer spend — the inequality
    / concentration audit of a data mix (same math as "how skewed is
    the per-domain contribution"). Uses the exact rank formula
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted spend, whose
    numerator terms are all int64 (cents × rank) so the fold is exact
    and order-free; the ONE float expression is composed identically
    in both engines.

    Scale plan: orders pre-aggregate per batch to (custkey, nation,
    cents) with a broadcast custkey→nation lookup, ONE nation-hash
    exchange co-locates each nation, and the per-partition kernel is
    a vectorized segmented sort + cumcount — output is nations-many
    rows."""
    from ...stages.partition import partition_map

    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    co = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((cust["c_custkey"].to_numpy(np.int64)[co],
                   cust["c_nationkey"].to_numpy(np.int64)[co]))

    class SpendPartial:
        def __init__(self):
            self.ck, self.cn = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ckey = b["o_custkey"].to_numpy(np.int64)
            i = np.clip(np.searchsorted(self.ck, ckey), 0,
                        len(self.ck) - 1)
            cents = np.round(b["o_totalprice"].to_numpy()
                             * 100).astype(np.int64)
            d = pd.DataFrame({"natkey": self.cn[i],
                              "o_custkey": ckey, "cp": cents})
            return d.groupby(["natkey", "o_custkey"],
                             as_index=False).agg(cp=("cp", "sum"))

    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def gini_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["natkey", "o_custkey"], as_index=False).agg(
            cp=("cp", "sum"))
        g = g.sort_values(["natkey", "cp", "o_custkey"],
                          kind="mergesort")
        rk = g.groupby("natkey", sort=False).cumcount() \
            .to_numpy(np.int64) + 1
        g["rkcp"] = rk * g["cp"].to_numpy(np.int64)
        a = g.groupby("natkey", as_index=False).agg(
            n_cust=("cp", "size"), spend_cp=("cp", "sum"),
            s=("rkcp", "sum"))
        n = a["n_cust"].to_numpy(np.int64).astype(np.float64)
        tot = a["spend_cp"].to_numpy(np.int64).astype(np.float64)
        s = a["s"].to_numpy(np.int64).astype(np.float64)
        a["gini"] = 2.0 * s / (n * tot) - (n + 1.0) / n
        a = a.rename(columns={"natkey": "nationkey"})
        a["n_cust"] = a["n_cust"].astype(np.int64)
        a["nationkey"] = a["nationkey"].astype(np.int64)
        return a[["nationkey", "n_cust", "spend_cp", "gini"]]

    out = partition_map(
        ds.map_batches(SpendPartial, batch_format="pandas",
                       concurrency=2),
        ["natkey"], gini_part, 8)
    return out.sort("nationkey")


@register("chi2_lang_source", sql="""
    WITH ct AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS observed
      FROM documents GROUP BY lang, source),
    tot AS (SELECT CAST(sum(observed) AS DOUBLE) AS n FROM ct),
    rm AS (SELECT lang, CAST(sum(observed) AS DOUBLE) AS rn
           FROM ct GROUP BY lang),
    cm AS (SELECT source, CAST(sum(observed) AS DOUBLE) AS cn
           FROM ct GROUP BY source)
    SELECT ct.lang, ct.source, observed,
           rn * cn / n AS expected,
           (CAST(observed AS DOUBLE) - rn * cn / n)
             * (CAST(observed AS DOUBLE) - rn * cn / n)
             / (rn * cn / n) AS contrib
    FROM ct JOIN rm USING (lang) JOIN cm USING (source)
    CROSS JOIN tot
    ORDER BY lang, source""")
def chi2_lang_source(sf_dir: str):
    """Chi-square independence cells for the lang × source contingency
    table — the drift/bias audit ("is language distribution
    independent of the crawl source?"). Emitted per cell (observed,
    expected, contribution) rather than as one global statistic so
    the result is a deterministic hash-comparable relation and no
    cross-cell float fold exists in either engine.

    Scale plan: counts are per-batch partials over the bounded
    (lang, source) key grid — one tiny driver combine, marginals and
    the float expressions computed once on cells-many rows."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "source"], as_index=False).agg(
            observed=("lang", "size"))
        g["observed"] = g["observed"].astype(np.int64)
        return g

    ct = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["observed"])
    o = ct["observed"].to_numpy(np.int64)
    n = np.float64(o.sum())
    rn = ct.groupby("lang")["observed"].transform("sum") \
        .to_numpy(np.int64).astype(np.float64)
    cn = ct.groupby("source")["observed"].transform("sum") \
        .to_numpy(np.int64).astype(np.float64)
    e = rn * cn / n
    od = o.astype(np.float64)
    ct["expected"] = e
    ct["contrib"] = (od - e) * (od - e) / e
    ct["observed"] = ct["observed"].astype(np.int64)
    return ct.sort_values(["lang", "source"], kind="mergesort") \
             .reset_index(drop=True)


@register("orders_monthly", sql="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS month_cp
      FROM orders GROUP BY 1, 2)
    SELECT y, m, n_orders, month_cp,
           CAST(month_cp AS DOUBLE)
             / CAST(sum(month_cp) OVER (PARTITION BY y) AS DOUBLE)
             AS year_share
    FROM m ORDER BY y, m""")
def orders_monthly(sf_dir: str):
    """Calendar seasonality decomposition: per (year, month) order
    volume + revenue and each month's share of its year — the
    ingest-freshness / seasonality profile of a crawl. Per-batch
    partials over the bounded (year, month) grid, one tiny combine,
    share computed once on the driver (single exact-int division,
    identical expression in SQL)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        dt = b["o_orderdate"]
        cents = np.round(b["o_totalprice"].to_numpy()
                         * 100).astype(np.int64)
        d = pd.DataFrame({"y": dt.dt.year.to_numpy(np.int64),
                          "m": dt.dt.month.to_numpy(np.int64),
                          "cp": cents})
        g = d.groupby(["y", "m"], as_index=False).agg(
            n=("cp", "size"), cp=("cp", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["y", "m"], ["n", "cp"]).rename(columns={
            "n": "n_orders", "cp": "month_cp"})
    ytot = out.groupby("y")["month_cp"].transform("sum") \
        .to_numpy(np.int64).astype(np.float64)
    out["year_share"] = out["month_cp"].to_numpy(np.int64) \
        .astype(np.float64) / ytot
    out = out.astype({"y": np.int64, "m": np.int64,
                      "n_orders": np.int64, "month_cp": np.int64})
    return out.sort_values(["y", "m"], kind="mergesort") \
              .reset_index(drop=True)


_KEYNESS_SRC = "src0"
_KEYNESS_MIN = 50
_BM25_TERMS = ("join", "merge", "query", "scan", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_LINKAGE_MAXDIST = 2
_LINKAGE_MAX_BLOCK = 100_000


@register("keyness_loglik", sql="""
    WITH docs AS (
      SELECT source,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    words AS (SELECT source, unnest(w) AS term FROM docs),
    cnt AS (
      SELECT term,
             CAST(sum(CASE WHEN source = '{src}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(sum(CASE WHEN source <> '{src}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b
      FROM words GROUP BY term),
    tot AS (SELECT CAST(sum(a) AS DOUBLE) AS n1,
                   CAST(sum(b) AS DOUBLE) AS n2 FROM cnt)
    SELECT term, a, b,
           CAST(2.0 AS DOUBLE) * (
             (CASE WHEN a = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE)
                / (n1 * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                   / (n1 + n2))) END)
           + (CASE WHEN b = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE)
                / (n2 * (CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                   / (n1 + n2))) END)) AS g2
    FROM cnt CROSS JOIN tot
    WHERE a + b >= {mn}
    ORDER BY term""".format(src=_KEYNESS_SRC, mn=_KEYNESS_MIN))
def keyness_loglik(sf_dir: str):
    """Dunning log-likelihood (G²) keyness of every frequent term in
    one source vs the rest of the corpus — the corpus-linguistics
    test for "which terms are over/under-represented in this crawl
    slice", used to detect a source drifting off-distribution before
    it pollutes a training mix.

    Scale plan: the doc_tfidf shape — per-batch (term, a, b) count
    partials collapse the corpus to vocabulary grain before ONE term
    exchange; the combined count table is pulled under the same 20M
    vocabulary guard (min-count cutoff is the knob at web scale) and
    the G² expression is one vectorized pass. Both engines compose
    the float expression identically; the int counts are exact."""
    from ...stages.dedup import _tokenize
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def cnt_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(b["text"])
        src = b["source"].to_numpy()
        terms, is_a = [], []
        for s, t in zip(src, toks):
            if not t:
                continue
            terms.append(np.asarray(t, dtype=object))
            is_a.append(np.full(len(t), s == _KEYNESS_SRC, bool))
        if not terms:
            return pd.DataFrame({"term": pd.Series(dtype=object),
                                 "a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        terms = np.concatenate(terms)
        is_a = np.concatenate(is_a)
        d = pd.DataFrame({"term": terms,
                          "a": is_a.astype(np.int64),
                          "b": (~is_a).astype(np.int64)})
        return d.groupby("term", as_index=False)[["a", "b"]].sum()

    def cnt_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", as_index=False)[["a", "b"]].sum()
        return out.astype({"a": np.int64, "b": np.int64})

    cnt = partition_map(
        ds.map_batches(cnt_partial, batch_format="pandas"),
        ["term"], cnt_combine, 16).limit(20_000_001).to_pandas()
    if len(cnt) > 20_000_000:
        raise ValueError("keyness_loglik: vocabulary too large to "
                         "pull; apply a min-count cutoff first")
    a = cnt["a"].to_numpy(np.int64)
    b = cnt["b"].to_numpy(np.int64)
    n1 = np.float64(a.sum())
    n2 = np.float64(b.sum())
    keep = a + b >= _KEYNESS_MIN
    cnt = cnt[keep].reset_index(drop=True)
    ad = a[keep].astype(np.float64)
    bd = b[keep].astype(np.float64)
    e1 = n1 * (ad + bd) / (n1 + n2)
    e2 = n2 * (ad + bd) / (n1 + n2)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(ad == 0, 0.0, ad * np.log(ad / e1))
        t2 = np.where(bd == 0, 0.0, bd * np.log(bd / e2))
    cnt["g2"] = 2.0 * (t1 + t2)
    return cnt.sort_values("term", kind="mergesort") \
              .reset_index(drop=True)


def _hist_quantile_cont(vals: np.ndarray, counts: np.ndarray,
                        q: float) -> np.float64:
    """quantile_cont from a SORTED-value histogram: DuckDB's formula
    ``lo * (1 - frac) + hi * frac`` at ``h = q * (n - 1)`` (the
    add_rolling_quantiles kernel, proven bit-identical), evaluated
    from cumulative counts instead of expanded rows."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    h = q * (n - 1)
    lo_i = int(np.floor(h))
    hi_i = int(np.ceil(h))
    frac = h - np.floor(h)
    lo = np.float64(vals[np.searchsorted(cum, lo_i + 1)])
    hi = np.float64(vals[np.searchsorted(cum, hi_i + 1)])
    return lo * (1 - frac) + hi * frac


@register("winsorized_stats", sql="""
    WITH q AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n,
             quantile_cont(n_chars, 0.05) AS q05,
             quantile_cont(n_chars, 0.95) AS q95
      FROM documents GROUP BY lang)
    SELECT d.lang,
           CAST(max(q.n) AS BIGINT) AS n_docs,
           max(q.q05) AS q05, max(q.q95) AS q95,
           (CAST(sum(CASE WHEN n_chars >= q05 AND n_chars <= q95
                          THEN n_chars ELSE 0 END) AS DOUBLE)
            + CAST(sum(CASE WHEN n_chars < q05 THEN 1 ELSE 0 END)
                   AS DOUBLE) * max(q.q05)
            + CAST(sum(CASE WHEN n_chars > q95 THEN 1 ELSE 0 END)
                   AS DOUBLE) * max(q.q95))
           / CAST(max(q.n) AS DOUBLE) AS wmean
    FROM documents d JOIN q USING (lang)
    GROUP BY d.lang ORDER BY d.lang""")
def winsorized_stats(sf_dir: str):
    """Per-language winsorized mean of document length (values
    clamped to the exact [p05, p95] band) — the robust central
    tendency a curation dashboard reports when raw means are wrecked
    by boilerplate giants and empty stubs.

    Scale plan: ONE pass builds a (lang, n_chars) count histogram via
    per-batch partials (bounded: langs x distinct lengths — the value
    domain, not the row count); quantiles AND the clamped sum are
    then derived from the same histogram on the driver, so no second
    data pass and no row-grain exchange exist. The single float sum
    is composed as (int-mid + n_lo*q05 + n_hi*q95)/n in the same
    order in both engines; quantile interpolation is the shared
    quantile_cont formula."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "n_chars"], as_index=False).agg(
            n=("n_chars", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    hist = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "n_chars"], ["n"])
    rows = []
    for lang, g in hist.groupby("lang", sort=True):
        g = g.sort_values("n_chars", kind="mergesort")
        vals = g["n_chars"].to_numpy(np.int64)
        cts = g["n"].to_numpy(np.int64)
        n = int(cts.sum())
        q05 = _hist_quantile_cont(vals, cts, 0.05)
        q95 = _hist_quantile_cont(vals, cts, 0.95)
        mid = (vals >= q05) & (vals <= q95)
        s_mid = np.float64(int((vals[mid] * cts[mid]).sum()))
        n_lo = np.float64(int(cts[vals < q05].sum()))
        n_hi = np.float64(int(cts[vals > q95].sum()))
        wmean = (s_mid + n_lo * q05 + n_hi * q95) / np.float64(n)
        rows.append({"lang": lang, "n_docs": np.int64(n),
                     "q05": q05, "q95": q95, "wmean": wmean})
    return pd.DataFrame(rows)


@register("bm25_scores", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(len(w)) AS BIGINT) AS tt FROM docs),
    words AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term
              FROM docs),
    tf AS (SELECT doc_id, term, CAST(max(dl) AS BIGINT) AS dl,
                  CAST(count(*) AS BIGINT) AS tf
           FROM words WHERE term IN ({terms})
           GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
            FROM words WHERE term IN ({terms}) GROUP BY term)
    SELECT doc_id, term, tf, df,
           ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE)
               + CAST(0.5 AS DOUBLE))
              / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE))
              + CAST(1.0 AS DOUBLE))
           * (CAST(tf AS DOUBLE) * CAST({k1p1} AS DOUBLE))
           / (CAST(tf AS DOUBLE) + CAST({k1} AS DOUBLE)
              * (CAST(1.0 AS DOUBLE) - CAST({b} AS DOUBLE)
                 + CAST({b} AS DOUBLE)
                   * (CAST(dl AS DOUBLE)
                      / (CAST(tt AS DOUBLE) / CAST(n AS DOUBLE)))))
             AS score
    FROM tf JOIN dfq USING (term) CROSS JOIN stats
    ORDER BY doc_id, term""".format(
        terms=", ".join("'%s'" % t for t in _BM25_TERMS),
        k1=_BM25_K1, k1p1=_BM25_K1 + 1, b=_BM25_B))
def bm25_scores(sf_dir: str):
    """Okapi BM25 relevance of a fixed query-term set against every
    document (k1=1.2, b=0.75, the always-positive ln(1+...) idf) —
    the retrieval-scoring pass of a data-curation search tool.

    Scale plan: pass 1 is a tiny bounded combine — per-batch partials
    carry only (per-query-term df) + (doc count, token count)
    sentinels, so the broadcast is O(|query|). Pass 2 is map-only:
    per-batch flattened token mask against the 5-term set, np.unique
    on (row, term-id) codes for tf, and one vectorized float
    expression identical to the SQL's."""
    from ...stages.dedup import _tokenize

    qterms = np.asarray(_BM25_TERMS, dtype=object)  # sorted
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = _tokenize(b["text"])
        dfc = np.zeros(len(qterms), np.int64)
        n_docs = 0
        n_toks = 0
        for t in toks:
            if not t:
                continue
            n_docs += 1
            n_toks += len(t)
            arr = np.asarray(t, dtype=object)
            i = np.clip(np.searchsorted(qterms, arr), 0,
                        len(qterms) - 1)
            hit = qterms[i] == arr
            dfc[np.unique(i[hit])] += 1
        return pd.DataFrame({
            "tid": np.concatenate([np.arange(len(qterms)),
                                   [-1, -2]]).astype(np.int64),
            "v": np.concatenate([dfc, [n_docs, n_toks]])
                 .astype(np.int64)})

    stats = _combine_partials(
        ds.map_batches(df_partial, batch_format="pandas"),
        ["tid"], ["v"]).set_index("tid")["v"]
    n = np.float64(stats.get(-1, 0))
    tt = np.float64(stats.get(-2, 0))
    dfs = np.asarray([stats.get(i, 0) for i in range(len(qterms))],
                     np.int64)
    ref = ray.put((qterms, dfs, n, tt))

    class Score:
        def __init__(self):
            self.qterms, self.dfs, self.n, self.tt = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids, tids, tfs, dls = [], [], [], []
            for doc_id, t in zip(b["doc_id"].to_numpy(np.int64),
                                 _tokenize(b["text"])):
                if not t:
                    continue
                arr = np.asarray(t, dtype=object)
                i = np.clip(np.searchsorted(self.qterms, arr), 0,
                            len(self.qterms) - 1)
                hit = self.qterms[i] == arr
                u, c = np.unique(i[hit], return_counts=True)
                ids.append(np.full(len(u), doc_id, np.int64))
                tids.append(u)
                tfs.append(c.astype(np.int64))
                dls.append(np.full(len(u), len(t), np.int64))
            if not ids:
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype=np.int64),
                    "term": pd.Series(dtype=object),
                    "tf": pd.Series(dtype=np.int64),
                    "df": pd.Series(dtype=np.int64),
                    "score": pd.Series(dtype=np.float64)})
            ids = np.concatenate(ids)
            tids = np.concatenate(tids)
            tf = np.concatenate(tfs).astype(np.float64)
            dl = np.concatenate(dls).astype(np.float64)
            df = self.dfs[tids]
            dfd = df.astype(np.float64)
            idf = np.log((self.n - dfd + 0.5) / (dfd + 0.5) + 1.0)
            score = idf * (tf * (_BM25_K1 + 1)) \
                / (tf + _BM25_K1 * (1.0 - _BM25_B + _BM25_B
                                    * (dl / (self.tt / self.n))))
            return pd.DataFrame({
                "doc_id": ids, "term": self.qterms[tids],
                "tf": tf.astype(np.int64), "df": df,
                "score": score})

    # concurrency=2, NOT the session CPU count: a fixed actor pool
    # sized to every CPU starves the upstream read tasks (observed
    # hard stall at num_cpus=4) — same rationale as stages/dedup.py.
    return ds.map_batches(Score, batch_format="pandas",
                          concurrency=2)


@register("part_linkage", sql="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk
          FROM names)
    SELECT x.p_name AS name_a, y.p_name AS name_b,
           CAST(levenshtein(x.p_name, y.p_name) AS BIGINT) AS dist
    FROM b x JOIN b y ON x.blk = y.blk AND x.p_name < y.p_name
    WHERE levenshtein(x.p_name, y.p_name) <= {d}
    ORDER BY name_a, name_b""".format(d=_LINKAGE_MAXDIST))
def part_linkage(sf_dir: str):
    """Blocked record linkage: near-identical part names (edit
    distance <= 2) found WITHOUT an all-pairs scan — candidates are
    generated only within a blocking key (the name's last word), the
    standard dedup-blocking design for entity resolution.

    Scale plan: per-batch DISTINCT (name, block) partials shrink the
    fact to name-grain before ONE block-hash exchange; each partition
    enumerates pairs only inside its blocks (quadratic strictly
    within a block, guarded at _LINKAGE_MAX_BLOCK names/block — shrink
    the blocking key if one exceeds it) and scores ALL pairs in one vectorized
    Wagner-Fischer DP (functions/editdist.levenshtein_pairs: the
    Python loop is max-name-length², not pair count)."""
    from ...functions.editdist import levenshtein_pairs
    from ...stages.dedup import _segment_pairs
    from ...stages.partition import partition_map

    ds = rd.read_parquet(_path(sf_dir, "part"), columns=["p_name"])

    def name_partial(b: pd.DataFrame) -> pd.DataFrame:
        names = pd.unique(b["p_name"].to_numpy())
        blk = np.asarray([s.rsplit(" ", 1)[-1] for s in names],
                         dtype=object)
        return pd.DataFrame({"p_name": names, "blk": blk})

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("p_name") \
             .sort_values(["blk", "p_name"], kind="mergesort")
        names = g["p_name"].to_numpy()
        # contiguous runs of equal blk
        codes = pd.factorize(g["blk"].to_numpy())[0]
        starts, ends = _segment_pairs(codes)
        ia, ib = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m > _LINKAGE_MAX_BLOCK:
                raise ValueError(
                    "part_linkage: block of %d names exceeds the "
                    "%d-name quadratic guard; use a finer blocking "
                    "key" % (m, _LINKAGE_MAX_BLOCK))
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            ia.append(i + s)
            ib.append(j + s)
        if not ia:
            return pd.DataFrame({
                "name_a": pd.Series(dtype=object),
                "name_b": pd.Series(dtype=object),
                "dist": pd.Series(dtype=np.int64)})
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        d = levenshtein_pairs(names[ia], names[ib])
        keep = d <= _LINKAGE_MAXDIST
        return pd.DataFrame({"name_a": names[ia[keep]],
                             "name_b": names[ib[keep]],
                             "dist": d[keep].astype(np.int64)})

    return partition_map(
        ds.map_batches(name_partial, batch_format="pandas"),
        ["blk"], block_pairs, 8)
