# round-5 session-2 additions, batch 16: Markov next-event temporal
# holdout evaluation, dense week-spine materialization with zero
# fill, and a mergeable-sketch rollup (daily HLL registers merged to
# weekly distinct estimates).
from __future__ import annotations

from ._shared import (EVENTS_P, ORACLE, _combine_partials, _events,
                      _path, np, pa, partition_map,
                      partitioned_apply, pc, pd, ray, rd, register)

_EVO = "PARTITION BY user_id ORDER BY ts, event_id"


@register("markov_holdout", sql="""
    WITH o AS (SELECT user_id, event_type, ts, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC)
                   AS rev,
                 lead(event_type) OVER ({evo}) AS nxt
               FROM events),
    train AS (SELECT event_type AS prev, nxt
              FROM o WHERE nxt IS NOT NULL AND rev > 2),
    tc AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
           FROM train GROUP BY prev, nxt),
    pred AS (SELECT prev, nxt AS predicted FROM (
               SELECT prev, nxt, row_number() OVER (
                 PARTITION BY prev ORDER BY n DESC, nxt) AS rk
               FROM tc) WHERE rk = 1),
    test AS (SELECT event_type AS prev, nxt AS actual
             FROM o WHERE rev = 2)
    SELECT t.prev AS context,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN p.predicted = t.actual
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM test t JOIN pred p ON p.prev = t.prev
    GROUP BY t.prev ORDER BY context""".format(evo=_EVO))
def markov_holdout(sf_dir: str):
    """Temporal holdout evaluation of a first-order Markov
    next-event model: train transition counts on every consecutive
    pair EXCEPT each user's final transition, predict each user's
    last event from its predecessor by argmax count (ties break
    lexicographically), and report correctness per context type —
    the leave-last-out backtest every sequential recommender runs,
    with a strict no-leakage split (the evaluated transition never
    enters the counts). ONE user_id exchange; each partition emits
    tagged integer partials (train transition cells and test
    (context, actual) cells — both ≤ |types|² rows), the driver
    folds the tiny tables and the argmax/compare is pure pandas on
    ≤ 25 cells. Scale cost is the sessionize exchange, nothing
    more."""
    ds = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        same = uid[:-1] == uid[1:]
        # last row index per user (g sorted by user, ts, event_id)
        is_last = np.concatenate([uid[:-1] != uid[1:], [True]])
        last_idx = np.flatnonzero(is_last)
        # transition i -> i+1 is a TEST pair iff i+1 is user's last
        pair_prev = et[:-1][same]
        pair_next = et[1:][same]
        pair_is_test = is_last[1:][same]
        frames = []
        for kind, mask in (("train", ~pair_is_test),
                           ("test", pair_is_test)):
            c = pd.DataFrame({
                "prev": pair_prev[mask],
                "nxt": pair_next[mask]}) \
                .groupby(["prev", "nxt"], as_index=False).size()
            c["kind"] = kind
            frames.append(c)
        out = pd.concat(frames, ignore_index=True)
        out["n"] = out["size"].astype(np.int64)
        return out[["kind", "prev", "nxt", "n"]]

    p = _combine_partials(
        partitioned_apply(ds, "user_id", partials, EVENTS_P,
                          sort_cols=["user_id", "ts", "event_id"]),
        ["kind", "prev", "nxt"], ["n"])
    train = p[p["kind"] == "train"]
    test = p[p["kind"] == "test"]
    tr = train.sort_values(["prev", "n", "nxt"],
                           ascending=[True, False, True],
                           kind="mergesort")
    pred = tr.groupby("prev", sort=True).head(1) \
        .set_index("prev")["nxt"]
    t = test[test["prev"].isin(pred.index)].copy()
    t["predicted"] = t["prev"].map(pred)
    t["correct"] = np.where(t["predicted"] == t["nxt"], t["n"], 0)
    out = t.groupby("prev", as_index=False) \
        .agg(n_users=("n", "sum"), n_correct=("correct", "sum"))
    return pd.DataFrame({
        "context": out["prev"].to_numpy(object),
        "n_users": out["n_users"].to_numpy(np.int64),
        "n_correct": out["n_correct"].to_numpy(np.int64)}) \
        .sort_values("context", kind="mergesort") \
        .reset_index(drop=True)


@register("dense_weekly_sales", sql="""
    WITH w AS (SELECT date_trunc('week', o_orderdate) AS wk,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS cents
               FROM orders GROUP BY 1),
    b AS (SELECT min(wk) AS mn, max(wk) AS mx FROM w),
    spine AS (SELECT unnest(generate_series(mn, mx,
                                            INTERVAL 7 DAY)) AS wk
              FROM b)
    SELECT CAST(s.wk AS TIMESTAMP) AS week_ts,
           coalesce(w.cents, 0) AS revenue_cents,
           coalesce(w.cents, 0)
             - coalesce(lag(coalesce(w.cents, 0))
                        OVER (ORDER BY s.wk), 0) AS wow_cents
    FROM spine s LEFT JOIN w ON w.wk = s.wk ORDER BY s.wk""")
def dense_weekly_sales(sf_dir: str):
    """Dense calendar materialization: revenue on a COMPLETE Monday
    week spine from first to last order week, missing weeks
    zero-filled, with week-over-week deltas computed on the dense
    series — the reporting/feature layout where absent periods must
    be explicit zeros, not absent rows (a lag over the sparse table
    silently skips gaps). Per-batch integer cents partials collapse
    to week cells before the driver fold; the spine is an arange of
    Monday-aligned epoch days (the same ISO truncation DuckDB's
    date_trunc('week') applies), so the reindex + diff is exact
    integer arithmetic on a bounded number of weeks."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        monday = ((d + 3) // 7) * 7 - 3
        cents = np.round(b["o_totalprice"].to_numpy(np.float64)
                         * 100).astype(np.int64)
        g = pd.DataFrame({"wk": monday, "cents": cents}) \
            .groupby("wk", as_index=False).sum()
        g["cents"] = g["cents"].astype(np.int64)
        return g

    w = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["wk"], ["cents"]).set_index("wk")["cents"]
    spine = np.arange(w.index.min(), w.index.max() + 1, 7,
                      dtype=np.int64)
    cents = w.reindex(spine).fillna(0).to_numpy(np.int64)
    return pd.DataFrame({
        "week_ts": spine.astype("datetime64[D]")
            .astype("datetime64[us]"),
        "revenue_cents": cents,
        "wow_cents": np.diff(cents, prepend=0)})


_HLL_P, _HLL_M = 12, 4096


def _hll_rollup_sql(m: int = _HLL_M) -> str:
    """Weekly rollup twin of custkey_distinct_hll_md5's estimator
    (q03): identical integer register algebra, grouped by ISO week.
    Max-over-day-registers == max-over-week directly, so the oracle
    skips the (engine-side) daily layer without changing a bit."""
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}.0))"
    raw = (f"{alpha} * {m}.0 * {m}.0 * 9007199254740992.0"
           " / CAST(s_int AS DOUBLE)")
    return f"""
    WITH h AS (SELECT date_trunc('week', ts) AS wk,
                      md5_number_upper(CAST(user_id AS VARCHAR))
                        AS h
               FROM events),
    b AS (SELECT wk, (h >> 52) AS bucket,
                 (h & ((1::UBIGINT << 52) - 1)) AS w FROM h),
    r AS (SELECT wk, bucket,
                 MAX(CASE WHEN w = 0 THEN CAST(53 AS BIGINT)
                     ELSE CAST(53 - length(bin(w)) AS BIGINT) END)
                 AS rho
          FROM b GROUP BY wk, bucket),
    s AS (SELECT wk,
                 CAST(sum(1::HUGEINT << (53 - rho)) AS HUGEINT)
                 + (CAST({m} AS HUGEINT)
                    - CAST(count(*) AS HUGEINT))
                   * (1::HUGEINT << 53) AS s_int,
                 CAST({m} - count(*) AS BIGINT) AS v_zero,
                 CAST(count(*) AS BIGINT) AS n_buckets
          FROM r GROUP BY wk)
    SELECT CAST(wk AS TIMESTAMP) AS week_ts,
           CASE WHEN v_zero > 0 AND {raw} <= 2.5 * {m}.0
           THEN {m}.0 * ln({m}.0 / CAST(v_zero AS DOUBLE))
           ELSE {raw} END AS est_users,
           v_zero, n_buckets FROM s ORDER BY wk"""


@register("hll_rollup", sql=_hll_rollup_sql())
def hll_rollup(sf_dir: str):
    """Mergeable-sketch rollup: per-DAY HyperLogLog registers of
    distinct users, max-merged up to ISO weeks — the sketch
    additivity that makes approximate distincts pre-aggregable at
    any time grain (store day registers once, answer week / month /
    lifetime by register max, never rescan). Same md5-portable
    register algebra as custkey_distinct_hll_md5 (q03), so the
    weekly estimates are bit-equal to the DuckDB twin; the engine
    genuinely builds daily partials (≤ 4096 rows × days per block)
    and merges them driver-side, proving the rollup path the oracle
    is allowed to shortcut."""
    m, p = _HLL_M, _HLL_P
    from ...functions.hashing import md5_id64_flat

    def partial(b: pa.Table) -> pa.Table:
        ids = b["user_id"].to_numpy(zero_copy_only=False)
        hv = md5_id64_flat(ids, "")[0].byteswap()
        d = b["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        bucket = (hv >> np.uint64(64 - p)).astype(np.int64)
        w = hv & np.uint64((1 << (64 - p)) - 1)
        _, e = np.frexp(w.astype(np.float64))
        rho = np.where(w == 0, 64 - p + 1,
                       64 - p + 1 - e).astype(np.int64)
        df = pd.DataFrame({"day": d, "bucket": bucket, "rho": rho}) \
            .groupby(["day", "bucket"], as_index=False)["rho"].max()
        return pa.table({
            "day": pa.array(df["day"].to_numpy(np.int64)),
            "bucket": pa.array(df["bucket"].to_numpy(np.int64)),
            "rho": pa.array(df["rho"].to_numpy(np.int64))})

    parts = _events(sf_dir, ["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .limit(4_000_001).to_pandas()
    if len(parts) > 4_000_000:
        raise ValueError("hll_rollup: register partials exceeded "
                         "the driver bound")
    # daily registers -> weekly merge (max), then the estimator
    daily = parts.groupby(["day", "bucket"])["rho"].max() \
        .reset_index()
    daily["wk"] = ((daily["day"] + 3) // 7) * 7 - 3
    weekly = daily.groupby(["wk", "bucket"])["rho"].max()
    rows = []
    for wk, reg in weekly.groupby(level=0):
        r = reg.to_numpy(np.int64)
        s_int = (sum(1 << (53 - int(x)) for x in r)
                 + (m - len(r)) * (1 << 53))
        v = m - len(r)
        alpha = 0.7213 / (1.0 + 1.079 / float(m))
        raw = alpha * float(m) * float(m) * 9007199254740992.0 \
            / float(s_int)
        est = (float(m) * np.log(float(m) / float(v))
               if (v > 0 and raw <= 2.5 * m) else raw)
        rows.append({"week_ts": np.datetime64(int(wk), "D"),
                     "est_users": est, "v_zero": np.int64(v),
                     "n_buckets": np.int64(len(r))})
    out = pd.DataFrame(rows).sort_values("week_ts") \
        .reset_index(drop=True)
    out["week_ts"] = out["week_ts"].astype("datetime64[us]")
    out["est_users"] = out["est_users"].astype(np.float64)
    return out
