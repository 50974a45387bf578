# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, datetime, np, pa, pc, pd, ray, rd, register)

@register("q7_trade_flow", sql="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_cp
    FROM customer, orders, lineitem, supplier,
         nation cn, nation sn
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = cn.n_nationkey
      AND s_nationkey = sn.n_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY cust_nation, supp_nation
    ORDER BY cust_nation, supp_nation""")
def q7_trade_flow(sf_dir: str):
    """TPC-H-Q7-shaped trade-flow matrix: discounted revenue between
    every (customer nation, supplier nation) pair over a date slice
    — Q7 without the two-nation filter, so the full flow matrix a
    mixing plan reads. Same physical plan as q5_local_supplier: both
    dimension lookups broadcast once (guarded), orders pruned AND
    date-filtered at the read, lineitem pre-aggregated per batch to
    (orderkey, supp-nation, cents x percent) grain, ONE hash join on
    orderkey, then nations²-bounded grid partials -> tiny combine."""
    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_name"])
    names = dict(zip(nat["n_nationkey"].to_numpy(np.int64),
                     nat["n_name"].to_numpy()))
    sup = _read_dim(_path(sf_dir, "supplier"),
                    ["s_suppkey", "s_nationkey"])
    so = np.argsort(sup["s_suppkey"].to_numpy())
    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    co = np.argsort(cust["c_custkey"].to_numpy())
    ref = ray.put((sup["s_suppkey"].to_numpy(np.int64)[so],
                   sup["s_nationkey"].to_numpy(np.int64)[so],
                   cust["c_custkey"].to_numpy(np.int64)[co],
                   cust["c_nationkey"].to_numpy(np.int64)[co]))

    def _lookup(keys, vals, probe):
        i = np.clip(np.searchsorted(keys, probe), 0, len(keys) - 1)
        return vals[i], keys[i] == probe

    def order_nat(b: pd.DataFrame) -> pd.DataFrame:
        _, _, ck, cn = ray.get(ref)
        nat_, ok = _lookup(ck, cn, b["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64)[ok],
            "cnat": nat_[ok]})

    def line_partial(b: pd.DataFrame) -> pd.DataFrame:
        sk, sn, _, _ = ray.get(ref)
        nat_, ok = _lookup(sk, sn, b["l_suppkey"].to_numpy(np.int64))
        cents = np.round(b["l_extendedprice"].to_numpy()[ok]
                         * 100).astype(np.int64)
        pctl = 100 - np.round(b["l_discount"].to_numpy()[ok]
                              * 100).astype(np.int64)
        d = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64)[ok],
            "snat": nat_[ok], "cp": cents * pctl})
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

    def grid_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["cnat", "snat"], as_index=False).agg(
            cp=("cp", "sum"))
        return g

    out = _combine_partials(
        joined.map_batches(grid_partial, batch_format="pandas"),
        ["cnat", "snat"], ["cp"])
    out["cust_nation"] = out["cnat"].map(names)
    out["supp_nation"] = out["snat"].map(names)
    out = out.rename(columns={"cp": "revenue_cp"})
    out["revenue_cp"] = out["revenue_cp"].astype(np.int64)
    return out[["cust_nation", "supp_nation", "revenue_cp"]] \
        .sort_values(["cust_nation", "supp_nation"],
                     kind="mergesort").reset_index(drop=True)
