# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (EVENTS_P, _combine_partials, _events, _path, np, partition_map, partitioned_apply, pd, rd, register)
from .q10_feature_engineering_readability import (_basket_edges)

#: triangle counting: loud guard on per-partition wedge blow-up (a hub
#: node of degree d generates d^2/4 wedges; at web scale shard hubs or
#: apply a degree cap before the wedge join).
_WEDGE_MAX_ROWS = 20_000_000


@register("triangle_count", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT a.l_partkey AS u, b.l_partkey AS v
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.v = e2.u
              JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""")
def triangle_count(sf_dir: str):
    """Distributed triangle counting on the co-order part graph (the
    standard two-round MR algorithm, Suri & Vassilvitskii's
    wedge-check shape): round 1 co-locates each node's incident
    edges on the MIDDLE node and enumerates wedges (u<v<w via the
    canonical edge orientation); round 2 co-locates wedges with
    edges on the (u, w) closing key and counts matches. Every
    exchange carries only 8-byte node ids; the wedge blow-up (hub
    degree squared) is the documented hot spot, guarded loudly.
    Edges reuse the basket support pipeline (2 more exchanges).
    The edge Dataset is materialized: it is consumed twice (wedge
    sides + closing-edge side) and is support-filtered aggregate
    grain — without pinning, the two-exchange edge pipeline would
    execute twice."""
    edges = _basket_edges(sf_dir).materialize()

    def tag_wedge_sides(b: pd.DataFrame) -> pd.DataFrame:
        # left role: edge (u, v) keyed on its head v (wedge middle);
        # right role: edge (v, w) keyed on its tail v.
        u = b["part_a"].to_numpy(np.int64)
        v = b["part_b"].to_numpy(np.int64)
        return pd.DataFrame({
            "mid": np.concatenate([v, u]),
            "other": np.concatenate([u, v]),
            "side": np.repeat(np.asarray([0, 1], np.int64),
                              [len(b), len(b)])})

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == 0]
        right = g[g["side"] == 1]
        if not len(left) or not len(right):
            return pd.DataFrame({"u": pd.Series(dtype=np.int64),
                                 "w": pd.Series(dtype=np.int64)})
        m = left.merge(right, on="mid")
        if len(m) > _WEDGE_MAX_ROWS:
            raise ValueError(
                "triangle_count: wedge partition exceeds %d rows — "
                "hub degree too high; cap or shard hub nodes before "
                "the wedge join" % _WEDGE_MAX_ROWS)
        return pd.DataFrame({"u": m["other_x"].to_numpy(np.int64),
                             "w": m["other_y"].to_numpy(np.int64)})

    wedge_ds = partition_map(
        edges.map_batches(tag_wedge_sides, batch_format="pandas"),
        ["mid"], wedges, 16)

    def tag_close(is_edge: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            if is_edge:
                u = b["part_a"].to_numpy(np.int64)
                w = b["part_b"].to_numpy(np.int64)
            else:
                u = b["u"].to_numpy(np.int64)
                w = b["w"].to_numpy(np.int64)
            return pd.DataFrame({
                "u": u, "w": w,
                "side": np.full(len(b), is_edge, np.int64)})
        return f

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 1].drop_duplicates(["u", "w"])
        wdg = g[g["side"] == 0]
        n = len(wdg.merge(e[["u", "w"]], on=["u", "w"]))
        return pd.DataFrame({"k": np.zeros(1, np.int64),
                             "tri": [np.int64(n)],
                             "ne": [np.int64(len(e))]})

    both = wedge_ds.map_batches(tag_close(0),
                                batch_format="pandas").union(
        edges.map_batches(tag_close(1), batch_format="pandas"))
    out = _combine_partials(partition_map(both, ["u", "w"],
                                          close_count, 16),
                            ["k"], ["tri", "ne"])
    return pd.DataFrame({
        "n_edges": out["ne"].to_numpy(np.int64),
        "n_triangles": out["tri"].to_numpy(np.int64)})


@register("ab_test", sql="""
    WITH v AS (SELECT event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
               FROM events
               WHERE event_type IN ('click', 'purchase')),
    s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(c) AS HUGEINT) AS s,
                 CAST(sum(c * c) AS HUGEINT) AS ss
          FROM v GROUP BY event_type),
    w AS (SELECT
            CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
            CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean_a_cents,
            CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean_b_cents,
            CAST(a.n * a.ss - a.s * a.s AS DOUBLE)
              / CAST(a.n * (a.n - 1) AS DOUBLE) AS var_a,
            CAST(b.n * b.ss - b.s * b.s AS DOUBLE)
              / CAST(b.n * (b.n - 1) AS DOUBLE) AS var_b
          FROM (SELECT * FROM s WHERE event_type = 'click') a,
               (SELECT * FROM s WHERE event_type = 'purchase') b)
    SELECT n_a, n_b, mean_a_cents, mean_b_cents, var_a, var_b,
           (mean_a_cents - mean_b_cents)
             / sqrt(var_a / CAST(n_a AS DOUBLE)
                    + var_b / CAST(n_b AS DOUBLE)) AS t_welch,
           (var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE))
             * (var_a / CAST(n_a AS DOUBLE)
                + var_b / CAST(n_b AS DOUBLE))
             / ((var_a / CAST(n_a AS DOUBLE))
                * (var_a / CAST(n_a AS DOUBLE))
                / CAST(n_a - 1 AS DOUBLE)
                + (var_b / CAST(n_b AS DOUBLE))
                  * (var_b / CAST(n_b AS DOUBLE))
                  / CAST(n_b - 1 AS DOUBLE)) AS df_welch
    FROM w""")
def ab_test(sf_dir: str):
    """Two-sample experiment readout: Welch's t statistic (and
    Welch–Satterthwaite degrees of freedom) comparing event value
    between two arms — the A/B significance primitive. Values
    quantize to exact integer cents (shared half-away floor), each
    batch emits one (n, sum, sum-of-squares) partial per arm, and
    mean/variance/t/df compose from the exact integer sums in the
    identical expression order in both engines (python ints in the
    driver fold — no overflow, no float fold-order sensitivity)."""
    ds = _events(sf_dir, columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["event_type"].isin(("click", "purchase"))
        b = b[m]
        c = np.floor(b["value"].to_numpy(np.float64) * 100
                     + 0.5).astype(np.int64)
        g = pd.DataFrame({"arm": b["event_type"].to_numpy(object),
                          "n": np.ones(len(b), np.int64),
                          "s": c, "ss": c * c})
        return g.groupby("arm", as_index=False).sum()

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["arm"], ["n", "s", "ss"], exact_int=True).set_index("arm")

    if not {"click", "purchase"} <= set(p.index):
        # an absent arm: the oracle's cross join of the two arm
        # subqueries yields zero rows — match it (same schema, 0 rows)
        # instead of raising KeyError.
        return pd.DataFrame({
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64),
            "mean_a_cents": pd.Series([], dtype=np.float64),
            "mean_b_cents": pd.Series([], dtype=np.float64),
            "var_a": pd.Series([], dtype=np.float64),
            "var_b": pd.Series([], dtype=np.float64),
            "t_welch": pd.Series([], dtype=np.float64),
            "df_welch": pd.Series([], dtype=np.float64)})

    def stats(arm: str):
        n = int(p.loc[arm, "n"])
        s = int(p.loc[arm, "s"])
        ss = int(p.loc[arm, "ss"])
        mean = np.float64(s) / np.float64(n)
        var = np.float64(n * ss - s * s) / np.float64(n * (n - 1))
        return n, mean, var

    n_a, mean_a, var_a = stats("click")
    n_b, mean_b, var_b = stats("purchase")
    sa = var_a / np.float64(n_a)
    sb = var_b / np.float64(n_b)
    t = (mean_a - mean_b) / np.sqrt(sa + sb)
    df = (sa + sb) * (sa + sb) / (sa * sa / np.float64(n_a - 1)
                                  + sb * sb / np.float64(n_b - 1))
    return pd.DataFrame({
        "n_a": [np.int64(n_a)], "n_b": [np.int64(n_b)],
        "mean_a_cents": [mean_a], "mean_b_cents": [mean_b],
        "var_a": [var_a], "var_b": [var_b],
        "t_welch": [t], "df_welch": [df]})


@register("source_kl", sql="""
    WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source, lang),
    l AS (SELECT lang, CAST(sum(n) AS BIGINT) AS g FROM c
          GROUP BY lang),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
    s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns FROM c
          GROUP BY source),
    term AS (SELECT c.source, s.ns,
                    (CAST(c.n AS DOUBLE) / CAST(s.ns AS DOUBLE))
                    * ln(CAST(CAST(c.n AS HUGEINT) * t.nn AS DOUBLE)
                         / CAST(CAST(s.ns AS HUGEINT) * l.g
                                AS DOUBLE)) AS tt
             FROM c JOIN l USING (lang) JOIN s USING (source)
             CROSS JOIN t)
    SELECT source, CAST(max(ns) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN tt >= 0
                    THEN CAST(floor(tt * 1e6 + 0.5) AS BIGINT)
                    ELSE -CAST(floor(-tt * 1e6 + 0.5) AS BIGINT)
                    END) AS BIGINT) AS kl_micro
    FROM term GROUP BY source ORDER BY source""")
def source_kl(sf_dir: str):
    """Distribution drift per source: KL divergence of each source's
    language mix from the corpus-wide mix (in integer micro-nats) —
    the per-slice skew alarm a mixing plan monitors. The (source,
    lang) grid is bounded, so one tiny combine holds all counts;
    each KL term is computed as ONE double expression from exact
    integer ratios, quantized half-away to micro-nats, and summed
    as int64 — making the fold independent of either engine's float
    summation order (the doc_entropy policy)."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["source", "lang"], as_index=False).agg(
            n=("lang", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "lang"], ["n"])
    lang_tot = grid.groupby("lang")["n"].sum()
    nn = int(grid["n"].sum())
    rows = []
    for src, g in grid.groupby("source", sort=True):
        ns = int(g["n"].sum())
        micro = 0
        for lang, c in zip(g["lang"], g["n"].astype(int)):
            gl = int(lang_tot[lang])
            tt = ((np.float64(c) / np.float64(ns))
                  * np.log(np.float64(c * nn)
                           / np.float64(ns * gl)))
            micro += int(np.copysign(
                np.floor(np.abs(tt) * 1e6 + 0.5), tt))
        rows.append({"source": src, "n_docs": np.int64(ns),
                     "kl_micro": np.int64(micro)})
    return pd.DataFrame(rows)


@register("interarrival_stats", sql="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
           quantile_cont(gap, 0.5) AS median_gap_us,
           quantile_cont(gap, 0.9) AS p90_gap_us
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id ORDER BY user_id""")
def interarrival_stats(sf_dir: str):
    """Per-entity inter-arrival quantiles: median and p90 gap between
    consecutive events — the burstiness / engagement-cadence feature.
    ONE hash exchange on user_id; gaps are int64-microsecond diffs of
    the partition-sorted timestamps, and BOTH quantiles for ALL users
    in a partition come from one lexsort + segment-offset arithmetic
    (the shared quantile_cont formula on per-user segments) — no
    per-user Python loop, no second pass."""
    ds = _events(sf_dir, columns=["user_id", "ts", "event_id"])

    def gaps_fn(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy(np.int64)
        t = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        same = np.r_[False, u[1:] == u[:-1]]
        gap = np.r_[np.int64(0), t[1:] - t[:-1]][same]
        gu = u[same]
        if not len(gu):
            return pd.DataFrame({
                "user_id": pd.Series(dtype=np.int64),
                "n_gaps": pd.Series(dtype=np.int64),
                "median_gap_us": pd.Series(dtype=np.float64),
                "p90_gap_us": pd.Series(dtype=np.float64)})
        o = np.lexsort((gap, gu))
        gu, gap = gu[o], gap[o]
        uu, starts, counts = np.unique(gu, return_index=True,
                                       return_counts=True)

        def qc(q: float) -> np.ndarray:
            h = q * (counts - 1)
            lo = gap[starts + np.floor(h).astype(np.int64)] \
                .astype(np.float64)
            hi = gap[starts + np.ceil(h).astype(np.int64)] \
                .astype(np.float64)
            frac = h - np.floor(h)
            return lo * (1 - frac) + hi * frac

        return pd.DataFrame({"user_id": uu,
                             "n_gaps": counts.astype(np.int64),
                             "median_gap_us": qc(0.5),
                             "p90_gap_us": qc(0.9)})

    out = partitioned_apply(ds, "user_id", gaps_fn, EVENTS_P,
                            sort_cols=["user_id", "ts", "event_id"]) \
        .to_pandas()
    return out.sort_values("user_id",
                           kind="mergesort").reset_index(drop=True)
