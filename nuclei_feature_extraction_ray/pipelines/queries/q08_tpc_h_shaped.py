# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _path, _read_dim, _sorted_member, datetime, np, pa, partition_map, pc, pd, rd, register)

_Q18_MIN_QTY = 250


@register("q14_promo", sql="""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS BIGINT) AS promo_cp,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS total_cp,
           CAST(count(*) AS BIGINT) AS n_items,
           100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                    ELSE 0 END) AS DOUBLE)
                 / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS DOUBLE) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-06-01'""")
def q14_promo(sf_dir: str):
    """TPC-H-Q14-shaped promo-revenue share: what fraction of a date
    slice's discounted revenue came from promo-type parts. The part
    dimension collapses to a sorted int64 array of promo partkeys
    broadcast once (guarded J2 lookup — never per batch); lineitem is
    pruned AND date-filtered at the read; each batch emits one
    3-column integer partial, so nothing row-grain ever shuffles.
    Revenue crosses engines as exact integer cents x percent; the one
    float division happens once, identically, in both engines."""
    lo, hi = datetime(1996, 3, 1), datetime(1996, 6, 1)
    part = _read_dim(_path(sf_dir, "part"), ["p_partkey", "p_type"])
    promo = np.sort(part.loc[part["p_type"] == "PROMO",
                             "p_partkey"].to_numpy(np.int64))
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=((pc.field("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("l_shipdate") < pa.scalar(hi, pa.timestamp("us")))))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["l_extendedprice"].to_numpy()
                         * 100).astype(np.int64)
        pct = 100 - np.round(b["l_discount"].to_numpy()
                             * 100).astype(np.int64)
        rev = cents * pct
        is_promo = _sorted_member(promo,
                                  b["l_partkey"].to_numpy(np.int64))
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "promo_cp": [rev[is_promo].sum()],
                             "total_cp": [rev.sum()],
                             "n_items": [np.int64(len(b))]})

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"), ["k"],
        ["promo_cp", "total_cp", "n_items"])
    promo_cp = np.int64(out["promo_cp"].iloc[0])
    total_cp = np.int64(out["total_cp"].iloc[0])
    return pd.DataFrame({
        "promo_cp": [promo_cp], "total_cp": [total_cp],
        "n_items": out["n_items"].to_numpy(np.int64),
        "promo_share": [100.0 * np.float64(promo_cp)
                        / np.float64(total_cp)]})


@register("q18_big_orders", sql="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250)
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           sum_qty
    FROM orders JOIN big ON o_orderkey = l_orderkey
    ORDER BY totalprice_cents DESC, o_orderkey""")
def q18_big_orders(sf_dir: str):
    """TPC-H-Q18-shaped large-volume-order report: orders whose total
    line quantity exceeds a threshold, joined back to the order
    header. Scale plan: lineitem pre-aggregates per batch to
    (orderkey, qty) grain, ONE hash exchange on orderkey finishes the
    sums and applies the HAVING — only then does the (tiny, tail-of-
    distribution) winner set come to the driver under the combine
    guard and broadcast into the orders scan as a sorted key array +
    aligned qty lookup. Order rows never shuffle; quantities are
    integral doubles summed exactly below 2^53."""
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        return pd.DataFrame({
            "key": g["l_orderkey"].to_numpy(np.int64),
            "qty": np.round(g["l_quantity"].to_numpy()).astype(np.int64)})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("key", as_index=False)["qty"].sum()
        t = t[t["qty"] > _Q18_MIN_QTY]
        return pd.DataFrame({"key": t["key"].to_numpy(np.int64),
                             "qty": t["qty"].to_numpy(np.int64)})

    big = partition_map(
        li.map_batches(qty_partial, batch_format="pandas"),
        ["key"], finish, 16)
    bdf = big.limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(bdf) > _COMBINE_MAX_ROWS:
        raise ValueError(
            "q18_big_orders: winner set exceeds %d rows — raise the "
            "quantity threshold or keep the result distributed"
            % _COMBINE_MAX_ROWS)
    order_ = np.argsort(bdf["key"].to_numpy(np.int64), kind="stable")
    keys = bdf["key"].to_numpy(np.int64)[order_]
    qtys = bdf["qty"].to_numpy(np.int64)[order_]

    orders = rd.read_parquet(_path(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        keep = _sorted_member(keys, k)
        b = b[keep]
        pos = np.searchsorted(keys, b["o_orderkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": b["o_orderdate"].to_numpy(),
            "totalprice_cents": np.round(
                b["o_totalprice"].to_numpy() * 100).astype(np.int64),
            "sum_qty": qtys[pos]})

    out = orders.map_batches(attach, batch_format="pandas").to_pandas()
    return out.sort_values(["totalprice_cents", "o_orderkey"],
                           ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)


@register("q4_priority", sql="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R')
    GROUP BY o_orderpriority ORDER BY o_orderpriority""")
def q4_priority(sf_dir: str):
    """TPC-H-Q4-shaped priority census: per order priority, how many
    1996 orders had at least one returned line. Large-large SEMI-join
    with no broadcast (the returned-orderkey set is fact-sized at
    scale): both sides stream key partials into ONE co-partitioning
    exchange — orders as (orderkey, priority), lineitem collapsed to
    per-batch DISTINCT returned orderkeys — each partition
    semi-merges vectorized and emits bounded (priority, count)
    partials; the final combine is 5 rows. The anti-join twin is
    cust_no_orders (reference J5); this is J6's EXISTS flavor."""
    lo, hi = datetime(1996, 1, 1), datetime(1997, 1, 1)
    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        filter=((pc.field("o_orderdate") >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("o_orderdate") < pa.scalar(hi, pa.timestamp("us")))))
    li = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag"],
        filter=(pc.field("l_returnflag") == "R"))

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "prio": b["o_orderpriority"].astype(object),
            "side": np.zeros(len(b), np.int64)})

    def returned_keys(b: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(b["l_orderkey"].to_numpy(np.int64))
        return pd.DataFrame({"key": k,
                             "prio": np.full(len(k), "", object),
                             "side": np.ones(len(k), np.int64)})

    both = orders.map_batches(order_rows, batch_format="pandas").union(
        li.map_batches(returned_keys, batch_format="pandas"))

    def semi_count(g: pd.DataFrame) -> pd.DataFrame:
        has = np.unique(g.loc[g["side"] == 1, "key"].to_numpy(np.int64))
        o = g[g["side"] == 0]
        keep = _sorted_member(has, o["key"].to_numpy(np.int64))
        c = o.loc[keep].groupby("prio", as_index=False).agg(
            n=("key", "size"))
        return pd.DataFrame({"o_orderpriority": c["prio"].astype(object),
                             "n": c["n"].to_numpy(np.int64)})

    partials = partition_map(both, ["key"], semi_count, 16)
    out = _combine_partials(partials, ["o_orderpriority"], ["n"])
    out = out.rename(columns={"n": "n_orders"})
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.sort_values("o_orderpriority",
                           kind="mergesort").reset_index(drop=True)
