# round-5 session-2 additions, batch 10: full CUBE grouping sets
# (the margin ROLLUP lacks), Z-order space-filling-curve keys (the
# multi-column data-layout operator), and a non-ASCII character
# census (the script/encoding audit).
from __future__ import annotations

from ._shared import (ORACLE, _combine_partials, _events, _path, np,
                      pa, partition_map, pc, pd, ray, rd, register)

#: zorder_keys: bits interleaved per dimension (cents < 2^16 here)
_Z_BITS = 16


@register("sales_cube", sql="""
    SELECT coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL')
             AS order_year,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(grouping(year(o_orderdate)) AS BIGINT) AS g_year,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY CUBE (year(o_orderdate), o_orderpriority)""")
def sales_cube(sf_dir: str):
    """Full CUBE grouping sets over (year, priority): the four
    aggregates {(year, priority), (year), (priority), ()} with
    GROUPING() flags — the per-priority margin that `sales_rollup`'s
    hierarchy cannot produce, i.e. the complete OLAP cube edge.
    Subtotal keys surface as 'ALL' (no real NULLs in either key).
    Scale plan identical to sales_rollup: per-batch partials collapse
    to years x priorities cells before any movement; all four
    grouping sets are derived from the finest cells driver-side —
    integer cents, zero shuffles."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_orderpriority",
                                  "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["o_orderdate"].to_numpy("datetime64[Y]") \
            .astype(np.int64) + 1970
        g = pd.DataFrame({
            "y": y,
            "prio": b["o_orderpriority"].to_numpy(object),
            "n": np.ones(len(b), np.int64),
            "cents": np.round(b["o_totalprice"].to_numpy()
                              * 100).astype(np.int64)}) \
            .groupby(["y", "prio"], as_index=False).sum()
        for c in ("n", "cents"):
            g[c] = g[c].astype(np.int64)
        return g

    cells = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["y", "prio"], ["n", "cents"])

    def level(keys: list[str], gy: int, gp: int) -> pd.DataFrame:
        if keys:
            agg = cells.groupby(keys, as_index=False)[
                ["n", "cents"]].sum()
        else:
            agg = pd.DataFrame({
                "n": [cells["n"].sum()],
                "cents": [cells["cents"].sum()]})
        out = pd.DataFrame({
            "order_year": (agg["y"].astype(np.int64).astype(str)
                           .to_numpy(object) if "y" in keys
                           else np.full(len(agg), "ALL", object)),
            "priority": (agg["prio"].to_numpy(object)
                         if "prio" in keys
                         else np.full(len(agg), "ALL", object)),
            "g_year": np.full(len(agg), gy, np.int64),
            "g_priority": np.full(len(agg), gp, np.int64),
            "n_orders": agg["n"].to_numpy(np.int64),
            "revenue_cents": agg["cents"].to_numpy(np.int64)})
        return out

    return pd.concat([
        level(["y", "prio"], 0, 0), level(["y"], 0, 1),
        level(["prio"], 1, 0), level([], 1, 1)],
        ignore_index=True)


@register("zorder_keys", sql="""
    WITH e AS (
      SELECT event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             CAST(extract(hour FROM ts) AS BIGINT) AS hr
      FROM events)
    SELECT e.event_id, e.cents, e.hr,
           CAST(sum((((e.cents >> g.i) & 1) << (2 * g.i))
                    + (((e.hr >> g.i) & 1) << (2 * g.i + 1)))
                AS BIGINT) AS zkey
    FROM e CROSS JOIN generate_series(0, {b}) g(i)
    GROUP BY 1, 2, 3""".format(b=_Z_BITS - 1))
def zorder_keys(sf_dir: str):
    """Z-ORDER (Morton) space-filling-curve key over (value cents,
    hour of day): the two dimensions' bits interleaved so rows close
    in BOTH dimensions land close on the 1-D key — the multi-column
    clustering operator behind Delta/Iceberg `Z-ORDER BY`, which
    turns two range predicates into one contiguous key range.
    Pure integer bit arithmetic, identical in both engines (the
    oracle interleaves via a generate_series bit join); the engine
    pass is one vectorized shift/or loop over 16 bit positions —
    map-only, no exchange, and sorting by zkey downstream is the
    layout step this key exists for."""
    ds = _events(sf_dir, columns=["event_id", "ts", "value"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(b["value"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        us = b["ts"].to_numpy("datetime64[us]").astype(np.int64)
        hr = (us // 3_600_000_000) % 24
        z = np.zeros(len(b), np.int64)
        for i in range(_Z_BITS):
            z |= ((cents >> i) & 1) << (2 * i)
            z |= ((hr >> i) & 1) << (2 * i + 1)
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "cents": cents, "hr": hr.astype(np.int64), "zkey": z})

    return ds.map_batches(fn, batch_format="pandas")


@register("nonascii_census", sql="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(length(text) - length(
                regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')))
                AS BIGINT) AS n_nonascii
    FROM documents GROUP BY lang ORDER BY lang""")
def nonascii_census(sf_dir: str):
    """Non-ASCII character census per language — the script /
    encoding audit a multilingual corpus runs before choosing
    tokenizers (CJK and Arabic rows are ~100% non-ASCII; a high
    non-ASCII count inside 'en' flags mojibake). Counts are CHARACTER
    counts on the extracted text (both engines operate on the same
    UTF-8 payload; the engine counts via one vectorized pandas
    regex), folded as integer partials through one lang-bounded
    combine — map-only."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b["text"].fillna("")
        n = s.str.len().to_numpy(np.int64)
        na = s.str.count(r"[^\x00-\x7F]").to_numpy(np.int64)
        g = pd.DataFrame({
            "lang": b["lang"].to_numpy(object),
            "n_docs": np.ones(len(b), np.int64),
            "n_chars": n, "n_nonascii": na}) \
            .groupby("lang", as_index=False).sum()
        for c in ("n_docs", "n_chars", "n_nonascii"):
            g[c] = g[c].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang"], ["n_docs", "n_chars", "n_nonascii"])
    for c in ("n_docs", "n_chars", "n_nonascii"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("lang",
                           kind="mergesort").reset_index(drop=True)
