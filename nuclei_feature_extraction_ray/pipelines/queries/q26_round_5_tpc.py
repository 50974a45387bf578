# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (ORACLE, QUERIES, _combine_partials, _path, _read_dim, _sorted_member, datetime, np, pa, partition_map, pc, pd, ray, rd, register)
from .q05_pages_flagship import (boilerplate_strip_sql, line_dedup_sql, pages_domain_cap_sql, pages_domains_sql, pages_drift_sql, pages_features_core_sql, pages_features_full_sql, pages_latest_sql, pages_probes_core_sql, pages_sessions_sql, pages_url_features_sql, trending_terms_sql, url_versions_sql)

def _order_year_side(sf_dir: str, cust_keep_ref=None):
    """orders -> (o_orderkey, o_year) Dataset, optionally semi-filtered
    to a broadcast customer-key set (the region slice of Q8). Shared by
    the q8/q9 profit joins."""
    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        if cust_keep_ref is not None:
            keep = _sorted_member(ray.get(cust_keep_ref),
                                  b["o_custkey"].to_numpy(np.int64))
            b = b[keep]
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "o_year": b["o_orderdate"].dt.year.to_numpy(np.int64)})

    return orders.map_batches(prep, batch_format="pandas")


def _line_profit_side(sf_dir: str, part_keys_ref, sup_ref):
    """lineitem -> per-batch (l_orderkey, snat, cp) partials for the
    broadcast part-key slice, supplier nation attached map-side
    (integer cents×percent, exact). Shared by q8/q9."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey",
                                  "l_suppkey", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pk = ray.get(part_keys_ref)
        sk, sn = ray.get(sup_ref)
        keep = _sorted_member(pk, b["l_partkey"].to_numpy(np.int64))
        b = b[keep]
        sp = b["l_suppkey"].to_numpy(np.int64)
        i = np.clip(np.searchsorted(sk, sp), 0, len(sk) - 1)
        ok = sk[i] == sp
        b = b[ok]
        snat = sn[i[ok]]
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        pctl = 100 - np.round(b["l_discount"].to_numpy()
                              * 100).astype(np.int64)
        d = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "snat": snat, "cp": cents * pctl})
        return d.groupby(["l_orderkey", "snat"],
                         as_index=False).agg(cp=("cp", "sum"))

    return ds.map_batches(partial, batch_format="pandas")


def _profit_grid(sf_dir: str, part_keys, cust_keep=None) -> pd.DataFrame:
    """(o_year, snat, cp) combine table behind q8/q9: dims broadcast,
    ONE lineitem⋈orders hash join at aggregate grain, bounded
    (years × nations) final combine."""
    sup = _read_dim(_path(sf_dir, "supplier"),
                    ["s_suppkey", "s_nationkey"])
    so = np.argsort(sup["s_suppkey"].to_numpy())
    sup_ref = ray.put((sup["s_suppkey"].to_numpy(np.int64)[so],
                       sup["s_nationkey"].to_numpy(np.int64)[so]))
    pk_ref = ray.put(np.sort(np.asarray(part_keys, np.int64)))
    ck_ref = (None if cust_keep is None
              else ray.put(np.sort(np.asarray(cust_keep, np.int64))))

    lrev = _line_profit_side(sf_dir, pk_ref, sup_ref)
    orders = _order_year_side(sf_dir, ck_ref)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    joined = lrev.join(
        orders, "inner", num_partitions=max(2, min(16, ncpu)),
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25})

    def grid_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["o_year", "snat"],
                         as_index=False).agg(cp=("cp", "sum"))

    return _combine_partials(
        joined.map_batches(grid_partial, batch_format="pandas"),
        ["o_year", "snat"], ["cp"])


@register("q8_market_share", sql="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS cp,
             n2.n_name AS snation
      FROM lineitem, orders, customer, nation n1, region, supplier,
           nation n2, part
      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO')
    SELECT o_year,
           CAST(sum(CASE WHEN snation = 'NATION_5' THEN cp ELSE 0 END)
                AS BIGINT) AS nation_cp,
           CAST(sum(cp) AS BIGINT) AS total_cp,
           CAST(sum(CASE WHEN snation = 'NATION_5' THEN cp ELSE 0 END)
                AS DOUBLE) / CAST(sum(cp) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year""")
def q8_market_share(sf_dir: str):
    """TPC-H-Q8-shaped national market share: of the PROMO-part volume
    sold to AMERICA customers, what fraction was supplied by
    NATION_5, per order year. The 8-table star collapses to ONE
    large×large edge (lineitem⋈orders): part/supplier/customer/
    nation/region become guarded broadcasts; the customer side
    semi-filters orders to the region slice BEFORE the join; lineitem
    pre-aggregates to (orderkey, supplier-nation, cents×percent)
    grain. Final combine is (years × nations)-bounded; the share is
    one exact-int ratio per year (cf. reference per-family ratio
    features, src/features/shape.rs)."""
    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_name", "n_regionkey"])
    reg = _read_dim(_path(sf_dir, "region"), ["r_regionkey", "r_name"])
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    amer = nat.loc[nat["r_name"] == "AMERICA", "n_nationkey"] \
        .to_numpy(np.int64)
    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    cust_keep = cust.loc[cust["c_nationkey"].isin(amer),
                         "c_custkey"].to_numpy(np.int64)
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_type"])
    pkeys = part.loc[part["p_type"] == "PROMO",
                     "p_partkey"].to_numpy(np.int64)
    names = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                     nat["n_name"].to_numpy()))

    grid = _profit_grid(sf_dir, pkeys, cust_keep=cust_keep)
    is_nat = grid["snat"].map(
        lambda k: names.get(int(k)) == "NATION_5").to_numpy(bool)
    tot = grid.groupby("o_year", as_index=False).agg(
        total_cp=("cp", "sum"))
    natg = grid[is_nat].groupby("o_year", as_index=False).agg(
        nation_cp=("cp", "sum"))
    out = tot.merge(natg, on="o_year", how="left")
    out["nation_cp"] = out["nation_cp"].fillna(0)
    out["o_year"] = out["o_year"].astype(np.int64)
    out["nation_cp"] = out["nation_cp"].astype(np.int64)
    out["total_cp"] = out["total_cp"].astype(np.int64)
    out["mkt_share"] = (out["nation_cp"].to_numpy(np.int64)
                        .astype(np.float64)
                        / out["total_cp"].to_numpy(np.int64)
                        .astype(np.float64))
    return out.sort_values("o_year",
                           kind="mergesort").reset_index(drop=True)


@register("q9_product_profit", sql="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS profit_cp
    FROM lineitem, orders, supplier, nation, part
    WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC""")
def q9_product_profit(sf_dir: str):
    """TPC-H-Q9-shaped product-line profit: discounted revenue of
    'red' parts per supplier nation per order year (the synthetic
    schema has no partsupp cost side, so profit = revenue — the join
    topology is the point). Same engine plan as q8 minus the region
    semi-filter: the profit grid helper runs the single
    lineitem⋈orders exchange with part keys broadcast and supplier
    nation attached map-side; (nation × year) is bounded so the
    finish is a tiny driver combine."""
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_name"])
    pkeys = part.loc[part["p_name"].str.contains("red", regex=False),
                     "p_partkey"].to_numpy(np.int64)
    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_name"])
    names = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                     nat["n_name"].to_numpy()))

    grid = _profit_grid(sf_dir, pkeys)
    grid["nation"] = grid["snat"].map(lambda k: names[int(k)])
    out = grid.groupby(["nation", "o_year"], as_index=False) \
        .agg(profit_cp=("cp", "sum"))
    out["o_year"] = out["o_year"].astype(np.int64)
    out["profit_cp"] = out["profit_cp"].astype(np.int64)
    return out.sort_values(["nation", "o_year"],
                           ascending=[True, False],
                           kind="mergesort").reset_index(drop=True)


@register("q15_top_supplier", sql="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100)
                               AS BIGINT))) AS BIGINT) AS total_cp
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_cp
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_cp = (SELECT max(total_cp) FROM rev)
    ORDER BY s_suppkey""")
def q15_top_supplier(sf_dir: str):
    """TPC-H-Q15-shaped top supplier: the supplier(s) with maximum
    quarterly revenue — the aggregate-then-argmax-WITH-TIES shape
    (Q15's revenue view + scalar-subquery max). Predicate-pushed
    lineitem scan, per-batch (suppkey, cents×percent) partials, a
    supplier-bounded driver combine, exact integer argmax (ties
    kept), and the supplier dim attaches names driver-side."""
    lo = datetime(1996, 1, 1)
    hi = datetime(1996, 4, 1)
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate")
                 >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("l_shipdate")
                   < pa.scalar(hi, pa.timestamp("us")))))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        pctl = 100 - np.round(b["l_discount"].to_numpy()
                              * 100).astype(np.int64)
        d = pd.DataFrame({"l_suppkey": b["l_suppkey"]
                          .to_numpy(np.int64), "cp": cents * pctl})
        return d.groupby("l_suppkey", as_index=False).agg(
            cp=("cp", "sum"))

    rev = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_suppkey"], ["cp"])
    best = rev[rev["cp"] == rev["cp"].max()]
    sup = _read_dim(_path(sf_dir, "supplier"),
                    ["s_suppkey", "s_name"])
    out = best.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    out = pd.DataFrame({
        "s_suppkey": out["s_suppkey"].to_numpy(np.int64),
        "s_name": out["s_name"].to_numpy(object),
        "total_cp": out["cp"].to_numpy(np.int64)})
    return out.sort_values("s_suppkey",
                           kind="mergesort").reset_index(drop=True)


@register("q17_small_quantity", sql="""
    WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11'),
    l AS (SELECT l_partkey,
                 CAST(round(l_quantity * 100) AS BIGINT) AS qc,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS ec
          FROM lineitem JOIN pk ON l_partkey = p_partkey),
    s AS (SELECT l_partkey, CAST(sum(qc) AS BIGINT) AS sq,
                 CAST(count(*) AS BIGINT) AS n
          FROM l GROUP BY l_partkey)
    SELECT CAST(sum(ec) AS BIGINT) AS small_cents,
           CAST(count(*) AS BIGINT) AS n_small,
           CAST(sum(ec) AS DOUBLE) / 7.0 / 100.0 AS avg_yearly
    FROM l JOIN s USING (l_partkey)
    WHERE 5 * qc * n < sq""")
def q17_small_quantity(sf_dir: str):
    """TPC-H-Q17-shaped small-quantity revenue: lines of one brand
    whose quantity is below 20% of that part's average — the
    correlated aggregate subquery, decorrelated into ONE
    co-partitioning exchange on partkey (each partition holds every
    line of its parts, computes the per-part quantity sums, and
    applies the threshold as an EXACT integer cross-multiplication:
    qc < sq/(5n) ⟺ 5·qc·n < sq — no division, no float, identical in
    both engines). Partition output is one partial-sum row, so the
    driver combine is partition-sized. int64 headroom: 5·qc·n wraps
    only past ~4e14 lines per part."""
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_brand"])
    pkeys = np.sort(part.loc[part["p_brand"] == "Brand#11",
                             "p_partkey"].to_numpy(np.int64))
    pk_ref = ray.put(pkeys)

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        keep = _sorted_member(ray.get(pk_ref),
                              b["l_partkey"].to_numpy(np.int64))
        b = b[keep]
        return pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "qc": np.round(b["l_quantity"].to_numpy()
                           * 100).astype(np.int64),
            "ec": np.round(b["l_extendedprice"].to_numpy()
                           * 100).astype(np.int64)})

    def small_part(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("l_partkey")["qc"].agg(["sum", "size"])
        sq = s["sum"].reindex(g["l_partkey"]).to_numpy(np.int64)
        n = s["size"].reindex(g["l_partkey"]).to_numpy(np.int64)
        qc = g["qc"].to_numpy(np.int64)
        small = 5 * qc * n < sq
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "ec": [np.int64(g["ec"].to_numpy(np.int64)[small].sum())],
            "n": [np.int64(small.sum())]})

    out = _combine_partials(
        partition_map(ds.map_batches(prep, batch_format="pandas"),
                      ["l_partkey"], small_part, 16),
        ["k"], ["ec", "n"])
    ec = int(out["ec"].iloc[0])
    return pd.DataFrame({
        "small_cents": [np.int64(ec)],
        "n_small": [out["n"].to_numpy(np.int64)[0]],
        "avg_yearly": [np.float64(ec) / 7.0 / 100.0]})


@register("q19_disjunctive", sql="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cp,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND CAST(round(l_quantity * 100) AS BIGINT)
               BETWEEN 100 AND 3000)
       OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 25
           AND CAST(round(l_quantity * 100) AS BIGINT)
               BETWEEN 1000 AND 4000)
       OR (p_brand = 'Brand#31' AND p_size BETWEEN 1 AND 35
           AND CAST(round(l_quantity * 100) AS BIGINT)
               BETWEEN 2000 AND 5000)""")
def q19_disjunctive(sf_dir: str):
    """TPC-H-Q19-shaped disjunctive predicate join: revenue over an
    OR-of-ANDs of (brand, size-range, quantity-range) triples — the
    shape that defeats naive predicate pushdown. The part side
    collapses to a broadcast int8 class array (brand class by
    partkey, pre-filtered by its size range), so the lineitem scan
    evaluates the whole disjunction as three vectorized masks and
    emits one integer cents×percent partial per batch — map-only, no
    exchange at all."""
    part = _read_dim(_path(sf_dir, "part"),
                     ["p_partkey", "p_brand", "p_size"])
    brand = part["p_brand"].to_numpy(object)
    size = part["p_size"].to_numpy(np.int64)
    cls = np.zeros(len(part), np.int8)
    cls[(brand == "Brand#11") & (size >= 1) & (size <= 15)] = 1
    cls[(brand == "Brand#21") & (size >= 1) & (size <= 25)] = 2
    cls[(brand == "Brand#31") & (size >= 1) & (size <= 35)] = 3
    keysort = np.argsort(part["p_partkey"].to_numpy())
    ref = ray.put((part["p_partkey"].to_numpy(np.int64)[keysort],
                   cls[keysort]))
    qlo = {1: 100, 2: 1000, 3: 2000}
    qhi = {1: 3000, 2: 4000, 3: 5000}

    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pk, pcls = ray.get(ref)
        probe = b["l_partkey"].to_numpy(np.int64)
        i = np.clip(np.searchsorted(pk, probe), 0, len(pk) - 1)
        c = np.where(pk[i] == probe, pcls[i], 0)
        qc = np.round(b["l_quantity"].to_numpy()
                      * 100).astype(np.int64)
        keep = np.zeros(len(b), bool)
        for k in (1, 2, 3):
            keep |= (c == k) & (qc >= qlo[k]) & (qc <= qhi[k])
        cents = np.round(b["l_extendedprice"].to_numpy()[keep]
                         * 100).astype(np.int64)
        pctl = 100 - np.round(b["l_discount"].to_numpy()[keep]
                              * 100).astype(np.int64)
        return pd.DataFrame({
            "k": np.zeros(1, np.int64),
            "cp": [np.int64((cents * pctl).sum())],
            "n": [np.int64(keep.sum())]})

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["k"], ["cp", "n"])
    return pd.DataFrame({
        "revenue_cp": out["cp"].to_numpy(np.int64),
        "n_items": out["n"].to_numpy(np.int64)})


@register("q22_sales_opportunity", sql="""
    WITH pos AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0.0),
    eligible AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      FROM customer, pos
      WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c_custkey
                          AND o.o_totalprice > 250000))
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(bal) AS BIGINT) AS total_bal_cents
    FROM eligible GROUP BY c_nationkey ORDER BY nationkey""")
def q22_sales_opportunity(sf_dir: str):
    """TPC-H-Q22-shaped sales opportunity census: customers with
    above-average positive balance and no HIGH-VALUE (>250k) order,
    grouped by nation.
    Two passes: (1) the global positive-balance mean folds from
    per-batch (sum, count) integer partials; the above-average test
    is the exact cross-multiplication bal·n > s (no division); (2)
    the anti-join is the cust_no_orders plan — both sides stream
    key-partials into ONE custkey exchange (orders collapse to
    distinct keys per batch), each partition anti-merges vectorized
    and emits (nationkey, count, balance) partials, so the driver
    combine is nation-sized."""
    cust = rd.read_parquet(_path(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])
    orders = rd.read_parquet(
        _path(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"],
        filter=pc.field("o_totalprice") > 250000)

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        bal = np.round(b["c_acctbal"].to_numpy()
                       * 100).astype(np.int64)
        pos = b["c_acctbal"].to_numpy() > 0.0
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "s": [np.int64(bal[pos].sum())],
                             "n": [np.int64(pos.sum())]})

    p = _combine_partials(
        cust.map_batches(bal_partial, batch_format="pandas"),
        ["k"], ["s", "n"], exact_int=True)
    s_pos, n_pos = int(p["s"].iloc[0]), int(p["n"].iloc[0])
    # bal·n > s for integer bal ⟺ bal > floor(s/n): the threshold is
    # ONE exact python-int floor-division on the driver, and the scan
    # test stays a vectorized int64 compare (no per-row bigints).
    thresh = s_pos // n_pos if n_pos else np.iinfo(np.int64).max

    def cust_rows(b: pd.DataFrame) -> pd.DataFrame:
        bal = np.round(b["c_acctbal"].to_numpy()
                       * 100).astype(np.int64)
        keep = bal > thresh
        return pd.DataFrame({
            "key": b["c_custkey"].to_numpy(np.int64)[keep],
            "nationkey": b["c_nationkey"].to_numpy(np.int64)[keep],
            "bal": bal[keep],
            "side": np.zeros(int(keep.sum()), np.int64)})

    def order_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(b["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "key": k, "nationkey": np.zeros(len(k), np.int64),
            "bal": np.zeros(len(k), np.int64),
            "side": np.ones(len(k), np.int64)})

    both = cust.map_batches(cust_rows, batch_format="pandas").union(
        orders.map_batches(order_keys, batch_format="pandas"))

    def anti_partial(g: pd.DataFrame) -> pd.DataFrame:
        has = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        c = g[g["side"] == 0]
        keep = ~np.isin(c["key"].to_numpy(np.int64), has)
        c = c[keep]
        out = c.groupby("nationkey", as_index=False).agg(
            n_cust=("key", "size"), total_bal_cents=("bal", "sum"))
        out["n_cust"] = out["n_cust"].astype(np.int64)
        return out

    out = _combine_partials(
        partition_map(both, ["key"], anti_partial, 16),
        ["nationkey"], ["n_cust", "total_bal_cents"])
    out["nationkey"] = out["nationkey"].astype(np.int64)
    out["n_cust"] = out["n_cust"].astype(np.int64)
    out["total_bal_cents"] = out["total_bal_cents"].astype(np.int64)
    return out.sort_values("nationkey",
                           kind="mergesort").reset_index(drop=True)


#: Flagship oracles pinned to the FRONT of the exported query order.
#: The driver's correctness gate checks a fixed-size PREFIX of the
#: ``queries()`` dict (registration-order in rounds 1-3, which left
#: the flagship ``pages_*`` oracles and ~34 other oracled queries
#: outside its 50-entry window while 10 rows-only entries sat inside
#: it). Export order is therefore: flagship + highest-value oracled
#: queries first, then every remaining ORACLED query in registration
#: order, then the rows-only (no-oracle) entries last. Source order
#: in this file stays grouped by topic; only the export dict reorders.
_EXPORT_FRONT = [
    "pages_features_core", "pages_sessions", "pages_probes_core",
    "pages_features_full", "pages_domains", "pages_latest",
    "pages_domain_cap", "pages_drift", "line_dedup",
    "lm_score", "dup_spans", "dup_spans_apply", "dedup_clusters",
    "near_dedup_keep_md5", "q3_shipping", "corpus_curation",
    "decontaminate", "doc_tfidf", "epoch_shuffle",
]

#: Flagship oracles are attached dynamically in ``all_oracle_sql``
#: (their SQL embeds the generated corpus path) — list them here so
#: the export ordering can tell oracled from rows-only without
#: building the corpus at import time.
_DYNAMIC_ORACLED = frozenset([
    "pages_sessions", "pages_features_core", "pages_features_full",
    "pages_probes_core", "pages_domains", "pages_latest",
    "pages_domain_cap", "pages_drift", "line_dedup",
    "pages_url_features", "boilerplate_strip", "url_versions",
    "trending_terms", "pages_markup_census", "pages_titles",
    "title_text_overlap"])


def _export_order() -> list[str]:
    oracled = set(ORACLE) | _DYNAMIC_ORACLED
    front = set(_EXPORT_FRONT)
    names = [n for n in _EXPORT_FRONT if n in QUERIES]
    names += [n for n in QUERIES if n not in front and n in oracled]
    names += [n for n in QUERIES if n not in front and n not in oracled]
    assert len(names) == len(QUERIES), "export order dropped a query"
    return names


def all_queries() -> dict:
    return {n: QUERIES[n] for n in _export_order()}


def all_oracle_sql() -> dict[str, str]:
    """Static oracles + the flagship oracles (built lazily here: their
    SQL embeds the deterministic corpus path, and building it
    generates-and-caches the corpus the driver will compare at —
    correctness runs at sf0.01 -> the t2 corpus)."""
    out = dict(ORACLE)
    out["pages_sessions"] = pages_sessions_sql("t2")
    out["pages_features_core"] = pages_features_core_sql("t2")
    out["pages_features_full"] = pages_features_full_sql("t2")
    out["pages_probes_core"] = pages_probes_core_sql("t2")
    out["pages_domains"] = pages_domains_sql("t2")
    out["pages_latest"] = pages_latest_sql("t2")
    out["pages_domain_cap"] = pages_domain_cap_sql("t2")
    out["pages_drift"] = pages_drift_sql("t2")
    out["line_dedup"] = line_dedup_sql("t2")
    out["pages_url_features"] = pages_url_features_sql("t2")
    out["boilerplate_strip"] = boilerplate_strip_sql("t2")
    out["url_versions"] = url_versions_sql("t2")
    out["trending_terms"] = trending_terms_sql("t2")
    from .q28_session2_additions import pages_markup_census_sql
    out["pages_markup_census"] = pages_markup_census_sql("t2")
    from .q29_session2_additions_2 import pages_titles_sql
    out["pages_titles"] = pages_titles_sql("t2")
    from .q33_session2_additions_6 import title_text_overlap_sql
    out["title_text_overlap"] = title_text_overlap_sql("t2")
    from .q44_session2_additions_17 import url_path_prefix_sql
    out["url_path_prefix"] = url_path_prefix_sql("t2")
    return out
