# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, os, pd, pq, register)

_ALL_TABLES = ("customer", "documents", "embeddings", "events",
               "lineitem", "nation", "orders", "part", "region",
               "supplier")


@register("tables_census", sql=" UNION ALL ".join(
    "SELECT '%s' AS tbl, CAST(count(*) AS BIGINT) AS n_rows FROM %s"
    % (t, t) for t in _ALL_TABLES) + " ORDER BY tbl")
def tables_census(sf_dir: str):
    """Catalog row-count census over every table — the first page of
    any data audit. At scale this is deliberately NOT a data scan:
    parquet footers carry exact row counts, so the census reads only
    metadata (the same statistics pruning relies on) — zero bytes of
    row data move. The oracle counts the rows the slow way and must
    agree."""
    rows = []
    for t in _ALL_TABLES:
        p = _path(sf_dir, t)
        if os.path.isdir(p):   # sharded table: sum the shard footers
            n = sum(pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
                    for f in os.listdir(p) if f.endswith(".parquet"))
        else:
            n = pq.ParquetFile(p).metadata.num_rows
        rows.append({"tbl": t, "n_rows": np.int64(n)})
    return pd.DataFrame(rows)


@register("missing_hours", sql="""
    WITH o AS (SELECT event_type, CAST(ts AS DATE) AS d,
                      CAST(hour(ts) AS BIGINT) AS h
               FROM events GROUP BY 1, 2, 3),
    b AS (SELECT min(CAST(ts AS DATE)) AS lo,
                 max(CAST(ts AS DATE)) AS hi FROM events),
    span AS (SELECT CAST(date_diff('day', lo, hi) + 1 AS BIGINT)
                 AS n_days FROM b)
    SELECT event_type,
           CAST(span.n_days * 24 AS BIGINT) AS n_slots,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(span.n_days * 24 - count(*) AS BIGINT) AS n_missing
    FROM o CROSS JOIN span
    GROUP BY event_type, span.n_days ORDER BY event_type""")
def missing_hours(sf_dir: str):
    """Ingestion-hole census: per event stream, how many (day, hour)
    slots in the corpus's span saw ZERO events — the freshness /
    pipeline-outage alarm (an hour with no 'click's is a collector
    gap, not user behavior). The (type, day, hour) occupancy grid is
    bounded, so per-batch DISTINCT-slot partials collapse to one
    combine; the expected-slot count comes from the global min/max
    day derived from the same grid."""
    ds = _events(sf_dir, columns=["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "event_type": b["event_type"].to_numpy(object),
            "d": b["ts"].dt.normalize().to_numpy(),
            "h": b["ts"].dt.hour.to_numpy(np.int64)})
        g = d.groupby(["event_type", "d", "h"], as_index=False).agg(
            n=("h", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "d", "h"], ["n"])
    lo = grid["d"].min()
    hi = grid["d"].max()
    n_days = int((np.datetime64(hi, "D") - np.datetime64(lo, "D"))
                 .astype(np.int64)) + 1
    a = grid.groupby("event_type", as_index=False).agg(
        n_active=("n", "size"))
    a["n_slots"] = np.int64(n_days * 24)
    a["n_active"] = a["n_active"].astype(np.int64)
    a["n_missing"] = (a["n_slots"] - a["n_active"]).astype(np.int64)
    return a[["event_type", "n_slots", "n_active", "n_missing"]] \
        .sort_values("event_type",
                     kind="mergesort").reset_index(drop=True)
