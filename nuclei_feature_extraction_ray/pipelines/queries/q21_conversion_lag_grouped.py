# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (EVENTS_P, _combine_partials, _events, _path, datetime, np, pa, partition_map, partitioned_apply, pc, pd, rd, register)

@register("conversion_lag", sql="""
    WITH f AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p
      FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(epoch_us(p) - epoch_us(v) AS BIGINT) AS lag_us
    FROM f
    WHERE v IS NOT NULL AND p IS NOT NULL AND p > v
    ORDER BY user_id""")
def conversion_lag(sf_dir: str):
    """First-touch conversion lag: per user, microseconds from the
    first 'view' to the first 'purchase' (users who purchased before
    ever viewing, or never did one of the two, are excluded) — the
    time-to-convert feature funnels and attribution models consume.
    Per-batch (user, first-view, first-purchase) partials collapse
    each block to user grain BEFORE the one user_id exchange; the
    partition finishes both mins and the filter vectorized."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(("view", "purchase"))
        b = b[m]
        d = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "is_p": (b["event_type"] == "purchase").to_numpy(),
            "ts": b["ts"].to_numpy()})
        g = d.groupby(["user_id", "is_p"], as_index=False)["ts"].min()
        return g

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["user_id", "is_p"], as_index=False)["ts"].min()
        v = g[~g["is_p"]].set_index("user_id")["ts"]
        p = g[g["is_p"]].set_index("user_id")["ts"]
        both = v.index.intersection(p.index)
        vv = v.loc[both].to_numpy("datetime64[us]")
        pp = p.loc[both].to_numpy("datetime64[us]")
        keep = pp > vv
        return pd.DataFrame({
            "user_id": both.to_numpy(np.int64)[keep],
            "lag_us": (pp[keep].astype(np.int64)
                       - vv[keep].astype(np.int64))})

    out = partitioned_apply(
        ds.map_batches(partial, batch_format="pandas"),
        "user_id", finish, EVENTS_P).to_pandas()
    return out.sort_values("user_id",
                           kind="mergesort").reset_index(drop=True)


@register("cheapest_supplier", sql="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                 AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    r AS (SELECT l_partkey, l_suppkey, cents, qty,
                 row_number() OVER (
                     PARTITION BY l_partkey
                     ORDER BY CAST(cents AS DOUBLE)
                              / CAST(qty AS DOUBLE), l_suppkey)
                     AS rn
          FROM ps)
    SELECT l_partkey, l_suppkey,
           CAST(cents AS DOUBLE) / CAST(qty AS DOUBLE)
               AS unit_price_cents
    FROM r WHERE rn = 1 ORDER BY l_partkey""")
def cheapest_supplier(sf_dir: str):
    """Grouped ARGMIN (TPC-H-Q2 flavor on observed prices): per part,
    the supplier with the lowest realized unit price (total cents /
    total quantity), ties broken by suppkey — the supplier-selection
    primitive. Per-batch (part, supp) integer pre-aggregation, ONE
    hash exchange on partkey, and the per-partition argmin is a
    lexsort + take-first across ALL parts at once. The comparison key
    is the same IEEE double division in both engines, so ordering
    agrees bit-for-bit."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "cents": np.round(b["l_extendedprice"].to_numpy()
                              * 100).astype(np.int64),
            "qty": np.round(b["l_quantity"].to_numpy())
            .astype(np.int64)})
        return d.groupby(["l_partkey", "l_suppkey"],
                         as_index=False).agg(cents=("cents", "sum"),
                                             qty=("qty", "sum"))

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["l_partkey", "l_suppkey"],
                      as_index=False).agg(cents=("cents", "sum"),
                                          qty=("qty", "sum"))
        price = g["cents"].to_numpy(np.int64).astype(np.float64) \
            / g["qty"].to_numpy(np.int64).astype(np.float64)
        g = g.assign(price=price).sort_values(
            ["l_partkey", "price", "l_suppkey"], kind="mergesort")
        first = g.drop_duplicates("l_partkey", keep="first")
        return pd.DataFrame({
            "l_partkey": first["l_partkey"].to_numpy(np.int64),
            "l_suppkey": first["l_suppkey"].to_numpy(np.int64),
            "unit_price_cents": first["price"].to_numpy(np.float64)})

    out = partitioned_apply(
        ds.map_batches(partial, batch_format="pandas"),
        "l_partkey", argmin, 16).to_pandas()
    return out.sort_values("l_partkey",
                           kind="mergesort").reset_index(drop=True)


@register("part_churn", sql="""
    WITH y AS (
      SELECT DISTINCT l_partkey,
             CAST(year(o_orderdate) AS BIGINT) AS y
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'),
    f AS (SELECT l_partkey,
                 max(CASE WHEN y = 1996 THEN 1 ELSE 0 END) AS a,
                 max(CASE WHEN y = 1997 THEN 1 ELSE 0 END) AS b
          FROM y GROUP BY l_partkey)
    SELECT CASE WHEN a = 1 AND b = 1 THEN 'retained'
                WHEN a = 1 THEN 'churned'
                ELSE 'new' END AS status,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM f GROUP BY status ORDER BY status""")
def part_churn(sf_dir: str):
    """Temporal assortment churn: parts ordered in BOTH 1996 and 1997
    (retained), only 1996 (churned), or only 1997 (new) — the
    set-difference census a freshness audit runs between snapshots.
    Scale plan: order years broadcast is avoided entirely — lineitem
    joins orders through a co-partitioning exchange on orderkey
    (tagged union), each partition emits DISTINCT (part, year)
    pairs, a second exchange on partkey folds the presence flags,
    and only the 3-row census reaches the driver."""
    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    orders = rd.read_parquet(
        _path(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate"],
        filter=((pc.field("o_orderdate")
                 >= pa.scalar(lo, pa.timestamp("us")))
                & (pc.field("o_orderdate")
                   < pa.scalar(hi, pa.timestamp("us")))))
    li = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def order_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "key": b["o_orderkey"].to_numpy(np.int64),
            "part": np.zeros(len(b), np.int64),
            "y": b["o_orderdate"].dt.year.to_numpy(np.int64),
            "side": np.zeros(len(b), np.int64)})

    def line_rows(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "key": b["l_orderkey"].to_numpy(np.int64),
            "part": b["l_partkey"].to_numpy(np.int64),
        }).drop_duplicates(ignore_index=True)
        d["y"] = np.zeros(len(d), np.int64)
        d["side"] = np.ones(len(d), np.int64)
        return d

    both = orders.map_batches(order_rows,
                              batch_format="pandas").union(
        li.map_batches(line_rows, batch_format="pandas"))

    def join_years(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "y"]]
        l = g[g["side"] == 1][["key", "part"]]
        m = l.merge(o, on="key")
        return m[["part", "y"]].drop_duplicates(ignore_index=True)

    pairs = partition_map(both, ["key"], join_years, 16)

    def fold_flags(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["part", "y"])
        f = g.assign(a=(g["y"] == 1996).astype(np.int64),
                     b=(g["y"] == 1997).astype(np.int64)) \
            .groupby("part", as_index=False).agg(a=("a", "max"),
                                                 b=("b", "max"))
        status = np.where(
            (f["a"] == 1) & (f["b"] == 1), "retained",
            np.where(f["a"] == 1, "churned", "new"))
        c = pd.DataFrame({"status": status}).groupby(
            "status", as_index=False).agg(n=("status", "size"))
        c["n"] = c["n"].astype(np.int64)
        return c

    out = _combine_partials(
        partition_map(pairs, ["part"], fold_flags, 16),
        ["status"], ["n"]).rename(columns={"n": "n_parts"})
    out["n_parts"] = out["n_parts"].astype(np.int64)
    return out.sort_values("status",
                           kind="mergesort").reset_index(drop=True)
