# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_combine_partials, _path, _read_dim, datetime, np, pa, partition_map, pc, pd, ray, rd, register)

@register("pricing_summary", sql="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           round(sum(l_quantity) / count(*), 6) AS avg_qty,
           round(sum(CAST(round(l_discount * 100) AS BIGINT))
                 / (100.0 * count(*)), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus""")
def pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped pricing summary: predicate pushed to the Parquet
    read, exact integer-cent partial sums per batch, tiny final groupby.
    """
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate")
                <= pa.scalar(datetime(1998, 9, 2), pa.timestamp("us"))))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["cents"] = np.round(
            batch["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        batch["dcents"] = np.round(
            batch["l_discount"].to_numpy() * 100).astype(np.int64)
        g = batch.groupby(["l_returnflag", "l_linestatus"],
                          as_index=False).agg(
            q=("l_quantity", "sum"), cents=("cents", "sum"),
            dcents=("dcents", "sum"), n=("l_quantity", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    b = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"],
        ["q", "cents", "dcents", "n"]).rename(columns={
            "q": "sum_qty", "cents": "sum_base_cents", "dcents": "dc",
            "n": "count_order"})
    b["sum_qty"] = b["sum_qty"].astype(np.float64)
    b["sum_base_cents"] = b["sum_base_cents"].astype(np.int64)
    b["count_order"] = b["count_order"].astype(np.int64)
    b["avg_qty"] = (b["sum_qty"] / b["count_order"]).round(6)
    b["avg_disc"] = (b["dc"] / (100.0 * b["count_order"])).round(6)
    return b[["l_returnflag", "l_linestatus", "sum_qty",
              "sum_base_cents", "avg_qty", "avg_disc", "count_order"]]


@register("top_spenders", sql="""
    SELECT o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY o_custkey
    ORDER BY total_cents DESC, o_custkey LIMIT 10""")
def top_spenders(sf_dir: str):
    """Aggregate -> global top-k (sort + limit with deterministic
    tie-break)."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch["cents"] = np.round(
            batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return batch.groupby("o_custkey", as_index=False).agg(
            cents=("cents", "sum"))

    from ...stages.partition import partition_map

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", as_index=False).agg(
            total_cents=("cents", "sum"))
        return out

    # High-cardinality grouped sum via partition_map (Ray's aggregate
    # operator was measured ~20s on 15k groups; one hash exchange +
    # vectorized pandas combine is ~2s).
    agg = partition_map(ds.map_batches(partial, batch_format="pandas"),
                        ["o_custkey"], combine, 16)

    # Scalable top-k: per-block partial top-10, tiny driver-side merge
    # (a global Dataset.sort of the whole aggregate was measured ~30s
    # for 10 output rows).
    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["total_cents", "o_custkey"],
                          ascending=[False, True], kind="mergesort")
        return b.head(10)

    parts = agg.map_batches(block_topk,
                            batch_format="pandas").to_pandas()
    top = parts.sort_values(["total_cents", "o_custkey"],
                            ascending=[False, True],
                            kind="mergesort").head(10)
    top["total_cents"] = top["total_cents"].astype(np.int64)
    return top[["o_custkey", "total_cents"]].reset_index(drop=True)


@register("region_orders", sql="""
    SELECT r.r_name AS region_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name""")
def region_orders(sf_dir: str):
    """Broadcast lookup join: the dimension chain customer->nation->
    region is tiny, so it is collapsed to one custkey->region_name map,
    ray.put ONCE, and probed per batch — no shuffle join (J2 pattern,
    src/utils.rs:96-109 recast)."""
    cust = _read_dim(_path(sf_dir, "customer"),
                     ["c_custkey", "c_nationkey"])
    nat = _read_dim(_path(sf_dir, "nation"),
                    ["n_nationkey", "n_regionkey"])
    reg = _read_dim(_path(sf_dir, "region"),
                    ["r_regionkey", "r_name"])
    dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey") \
              .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    lookup_keys = dim["c_custkey"].to_numpy(np.int64)
    order_k = np.argsort(lookup_keys)
    lookup_keys = lookup_keys[order_k]
    lookup_vals = dim["r_name"].to_numpy()[order_k]
    ref = ray.put((lookup_keys, lookup_vals))

    class Enrich:
        def __init__(self):
            self.keys, self.vals = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            idx = np.searchsorted(self.keys, batch["o_custkey"].to_numpy())
            idx = np.clip(idx, 0, len(self.keys) - 1)
            names = self.vals[idx]
            cents = np.round(
                batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
            d = pd.DataFrame({"region_name": names, "cents": cents})
            g = d.groupby("region_name", as_index=False).agg(
                n=("cents", "size"), cents=("cents", "sum"))
            g["n"] = g["n"].astype(np.int64)
            return g

    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_custkey", "o_totalprice"])
    out = _combine_partials(
        ds.map_batches(Enrich, batch_format="pandas", concurrency=2),
        ["region_name"], ["n", "cents"]).rename(columns={
            "n": "n_orders", "cents": "total_cents"})
    return out.astype({"n_orders": np.int64, "total_cents": np.int64})
