# round-5 session-2 additions, batch 11: UNPIVOT/melt reshape, an
# order-independent table checksum (the replication/migration
# verification operator), and ordered list aggregation (string_agg
# with an intra-group ORDER BY).
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat
from ._shared import (ORACLE, _combine_partials, _path, np, pa,
                      partition_map, pc, pd, ray, rd, register,
                      EVENTS_P)

_U64 = 1 << 64


@register("part_unpivot", sql="""
    SELECT p_partkey, 'size' AS metric,
           CAST(p_size AS BIGINT) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'retail_cents' AS metric,
           CAST(round(p_retailprice * 100) AS BIGINT) AS value
    FROM part""")
def part_unpivot(sf_dir: str):
    """UNPIVOT/melt: the part table's numeric metrics reshaped wide →
    long, one (key, metric, value) row per metric — the inverse of
    `lang_pivot`'s pivot and the canonical feature-store long layout.
    Map-only: each input batch emits its own stacked long rows (row
    count × metrics, zero exchange); prices quantize to integer cents
    so both engines emit identical BIGINTs. At 100 TB this is a pure
    streaming projection whose output is `n_metrics ×` the input —
    the only scale knob is a smaller batch_size for the widened
    output, no shuffle anywhere."""
    ds = rd.read_parquet(_path(sf_dir, "part"),
                         columns=["p_partkey", "p_size",
                                  "p_retailprice"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        k = b["p_partkey"].to_numpy(np.int64)
        size = b["p_size"].to_numpy(np.int64)
        cents = np.round(b["p_retailprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        return pd.DataFrame({
            "p_partkey": np.concatenate([k, k]),
            "metric": np.concatenate([
                np.full(len(k), "size", object),
                np.full(len(k), "retail_cents", object)]),
            "value": np.concatenate([size, cents])})

    return ds.map_batches(fn, batch_format="pandas")


@register("orders_checksum", sql="""
    WITH r AS (
      SELECT o_orderstatus AS status,
             ('0x' || substr(md5(
                 CAST(o_orderkey AS VARCHAR) || '|' ||
                 CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                      AS VARCHAR) || '|' ||
                 strftime(o_orderdate, '%Y-%m-%d') || '|' ||
                 o_orderpriority), 1, 16))::UBIGINT AS h
      FROM orders)
    SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(h AS HUGEINT)) % 18446744073709551616
                AS UBIGINT) AS checksum
    FROM r GROUP BY status ORDER BY status""")
def orders_checksum(sf_dir: str):
    """Order-independent content checksum per order status: md5 of a
    canonical `key|cents|date|priority` row string, upper 64 bits
    summed mod 2^64 — the replication / migration / backup
    verification operator (two copies of a table match iff their
    checksums match, regardless of row order or partitioning). The
    md5→uint64 kernel is the same DuckDB `md5_number_upper` C call
    the sketch twins use (functions/hashing.md5_upper64_flat), so
    both engines hash identical bytes. Each batch folds its rows into
    one wraparound-exact uint64 partial per status (np.add.at on a
    uint64 accumulator; the int64 bit-cast on the wire preserves the
    value mod 2^64), so the driver combine sees ≤ statuses × blocks
    tiny rows — map-only at any scale, the canonical
    embarrassingly-parallel integrity sweep."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderstatus",
                                  "o_totalprice", "o_orderdate",
                                  "o_orderpriority"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["o_totalprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        s = (b["o_orderkey"].astype(str) + "|"
             + pd.Series(cents, index=b.index).astype(str) + "|"
             + b["o_orderdate"].dt.strftime("%Y-%m-%d") + "|"
             + b["o_orderpriority"])
        h = md5_upper64_flat(s.to_numpy(object))
        codes, uniq = pd.factorize(b["o_orderstatus"], sort=True)
        acc = np.zeros(len(uniq), np.uint64)
        np.add.at(acc, codes, h)
        return pd.DataFrame({
            "status": np.asarray(uniq, object),
            "n_rows": np.bincount(
                codes, minlength=len(uniq)).astype(np.int64),
            "checksum_i64": acc.view(np.int64)})

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["status"], ["n_rows", "checksum_i64"], exact_int=True)
    p = p.sort_values("status", kind="mergesort")
    return pd.DataFrame({
        "status": p["status"].to_numpy(object),
        "n_rows": p["n_rows"].map(int).astype(np.int64).to_numpy(),
        "checksum": np.array(
            [int(v) % _U64 for v in p["checksum_i64"]],
            np.uint64)}).reset_index(drop=True)


@register("order_parts_concat", sql="""
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
           string_agg(CAST(l_partkey AS VARCHAR), ','
                      ORDER BY l_linenumber, l_partkey) AS parts_list
    FROM lineitem GROUP BY l_orderkey""")
def order_parts_concat(sf_dir: str):
    """Ordered list aggregation: per order, the part keys
    concatenated in line-number order (`string_agg ... ORDER BY`) —
    the denormalize-to-sequence operator that feeds sequence models
    and session exports. One hash exchange on l_orderkey co-locates
    each order; within a partition a single mergesort + groupby join
    emits every order's list (l_linenumber ties are broken by
    l_partkey in BOTH engines, so the order is total and they agree). Output is one row
    per order — the same grain and exchange the TPC-H join family
    already proves at 10× scale."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_linenumber",
                                  "l_partkey"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_linenumber", "l_partkey"],
                          kind="mergesort")
        keys = g["l_orderkey"].to_numpy(np.int64)
        joined = g["l_partkey"].astype(str) \
            .groupby(keys, sort=True).agg(",".join)
        n = np.bincount(
            pd.factorize(keys, sort=True)[0]).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": joined.index.to_numpy(np.int64),
            "n_lines": n,
            "parts_list": joined.to_numpy(object)})

    return partition_map(ds, ["l_orderkey"], per_part, EVENTS_P)
