# round-5 session-5 additions, batch 60: penny-drift rounding
# reconciliation, the TOST equivalence test, and duplicate-bias
# correction of corpus means.
from __future__ import annotations

from ...functions.hashing import md5_upper64_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_TOST_MARGIN = 0.02     # +-2pp equivalence margin
_TOST_Z = 1.6448536269514722   # z_{0.95}
_TOST_TH = 14


@register("penny_drift", sql="""
    WITH li AS (SELECT l_orderkey AS ok,
                       CAST(floor(l_extendedprice
                                  * (1 - l_discount) * 100 + 0.5)
                            AS BIGINT) AS line_net,
                       CAST(floor(l_extendedprice
                                  * (1 - l_discount) * 1000000
                                  + 0.5) AS BIGINT) AS net_micro
                FROM lineitem),
    o AS (SELECT ok,
                 CAST(sum(line_net) AS BIGINT) AS sum_rounded,
                 CAST((sum(net_micro) + 5000) // 10000
                      AS BIGINT) AS rounded_sum
          FROM li GROUP BY ok),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(CASE WHEN sum_rounded <> rounded_sum
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_drifted,
                 CAST(sum(abs(sum_rounded - rounded_sum))
                      AS BIGINT) AS total_drift_cents,
                 CAST(max(abs(sum_rounded - rounded_sum))
                      AS BIGINT) AS max_drift_cents
          FROM o)
    SELECT n_orders, n_drifted, total_drift_cents,
           max_drift_cents,
           CAST(n_drifted AS DOUBLE) / CAST(n_orders AS DOUBLE)
             AS drift_rate
    FROM s""")
def penny_drift(sf_dir: str):
    """PENNY-DRIFT RECONCILIATION: per order, the sum of
    line-level half-up-rounded net amounts versus the rounding of
    the order's raw net total — the cents that appear or vanish
    depending on WHERE an invoicing pipeline rounds; the
    accounting-reconciliation census every billing migration must
    zero out. Line roundings quantize identical doubles on both
    engines; the order-level alternative sums EXACT micro-cent
    quantizations and rounds once ((sum_micro + 5000) // 10000 —
    pure integer, no float summation order anywhere); censuses
    are exact integers. Scale
    plan: per-order cells co-partition by orderkey; 4 scalars
    out."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice",
                 "l_discount"])

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        net = b["l_extendedprice"].to_numpy(np.float64) \
            * (1 - b["l_discount"].to_numpy(np.float64))
        return pd.DataFrame({
            "ok": b["l_orderkey"].to_numpy(np.int64),
            "line_net": np.floor(net * 100
                                 + 0.5).astype(np.int64),
            "net_micro": np.floor(net * 1000000
                                  + 0.5).astype(np.int64)})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("ok").agg(
            sum_rounded=("line_net", "sum"),
            sum_micro=("net_micro", "sum"))
        sr = a["sum_rounded"].to_numpy(np.int64)
        rs = (a["sum_micro"].to_numpy(np.int64) + 5000) // 10000
        drift = np.abs(sr - rs)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n_orders": np.array([len(a)], np.int64),
            "n_drifted": np.array([int((drift > 0).sum())],
                                  np.int64),
            "total_drift": np.array([int(drift.sum())],
                                    np.int64),
            "max_drift": np.array([int(drift.max())
                                   if len(a) else 0], np.int64)})

    parts = partition_map(
        ds.map_batches(rows, batch_format="pandas"),
        ["ok"], cells, 16).limit(1_000_001).to_pandas()
    if len(parts) > 1_000_000:
        raise ValueError("penny_drift: partial frame exceeds the "
                         "driver bound")
    n = int(parts["n_orders"].sum())
    nd = int(parts["n_drifted"].sum())
    td = int(parts["total_drift"].sum())
    mx = int(parts["max_drift"].max())
    return pd.DataFrame({
        "n_orders": [np.int64(n)], "n_drifted": [np.int64(nd)],
        "total_drift_cents": [np.int64(td)],
        "max_drift_cents": [np.int64(int(mx))],
        "drift_rate": [np.float64(nd) / np.float64(n)]})


@register("tost_equivalence", sql="""
    WITH u AS (SELECT user_id,
                      CAST(user_id % 2 AS BIGINT) AS arm,
                      CAST(CASE WHEN count(*) FILTER (
                           event_type = 'purchase') >= {th}
                           THEN 1 ELSE 0 END AS BIGINT) AS conv
               FROM events GROUP BY user_id),
    s AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(conv) AS BIGINT) AS c
          FROM u GROUP BY arm),
    f AS (SELECT
        (SELECT CAST(c AS DOUBLE) / CAST(n AS DOUBLE) FROM s
         WHERE arm = 0) AS p0,
        (SELECT CAST(c AS DOUBLE) / CAST(n AS DOUBLE) FROM s
         WHERE arm = 1) AS p1,
        (SELECT CAST(n AS BIGINT) FROM s WHERE arm = 0) AS n0,
        (SELECT CAST(n AS BIGINT) FROM s WHERE arm = 1) AS n1),
    g AS (SELECT p0, p1, n0, n1, p1 - p0 AS d,
                 sqrt(p0 * (1.0 - p0) / CAST(n0 AS DOUBLE)
                      + p1 * (1.0 - p1) / CAST(n1 AS DOUBLE))
                   AS se
          FROM f)
    SELECT n0 AS n_control, n1 AS n_treatment, d AS diff,
           (d + {m}) / se AS z_lower, ({m} - d) / se AS z_upper,
           CAST(CASE WHEN (d + {m}) / se > {z}
                     AND ({m} - d) / se > {z}
                THEN 1 ELSE 0 END AS BIGINT) AS equivalent
    FROM g""".format(th=_TOST_TH, m=_TOST_MARGIN, z=_TOST_Z))
def tost_equivalence(sf_dir: str):
    """TOST EQUIVALENCE TEST (two one-sided tests) on the arm
    heavy-purchaser rates: both z = (d+margin)/se and
    (margin-d)/se must exceed z_0.95 to declare the arms
    EQUIVALENT within +-2pp — the inferential machinery for
    'prove the change is SAFE', which no amount of failing to
    reject with ab_test can provide (absence of evidence is not
    equivalence). Counts fold exactly through the user grain;
    rates, the pooled-free SE, both one-sided z's and the verdict
    are shared float expressions. Scale plan: per-user conversion
    through one user exchange; the TOST is driver arithmetic."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "pc": (b["event_type"].to_numpy(object)
                   == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["pc"].sum()
        arm = (a["user_id"].to_numpy(np.int64) % 2) \
            .astype(np.int64)
        conv = (a["pc"].to_numpy(np.int64)
                >= _TOST_TH).astype(np.int64)
        out = pd.DataFrame({"arm": arm,
                            "n": np.ones(len(a), np.int64),
                            "c": conv}) \
            .groupby("arm", as_index=False).sum()
        for col in ("n", "c"):
            out[col] = out[col].astype(np.int64)
        return out

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["arm"], ["n", "c"])
    st = {int(r["arm"]): (int(r["n"]), int(r["c"]))
          for _, r in s.iterrows()}
    n0, c0 = st[0]
    n1, c1 = st[1]
    p0 = np.float64(c0) / np.float64(n0)
    p1 = np.float64(c1) / np.float64(n1)
    d = p1 - p0
    se = np.sqrt(p0 * (1.0 - p0) / np.float64(n0)
                 + p1 * (1.0 - p1) / np.float64(n1))
    zl = (d + _TOST_MARGIN) / se
    zu = (_TOST_MARGIN - d) / se
    return pd.DataFrame({
        "n_control": [np.int64(n0)],
        "n_treatment": [np.int64(n1)],
        "diff": [np.float64(d)], "z_lower": [np.float64(zl)],
        "z_upper": [np.float64(zu)],
        "equivalent": [np.int64(1 if (zl > _TOST_Z
                                      and zu > _TOST_Z)
                                else 0)]})


@register("dup_bias_correction", sql="""
    WITH h AS (SELECT md5(text) AS hv,
                      CAST(count(*) AS BIGINT) AS g,
                      CAST(sum(n_chars) AS BIGINT) AS s
               FROM documents GROUP BY md5(text)),
    t AS (SELECT CAST(sum(g) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(s) AS HUGEINT) AS raw_sum,
                 CAST(sum(CAST(floor(CAST(s AS DOUBLE)
                      / CAST(g AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT)) AS HUGEINT) AS dedup_micro
          FROM h)
    SELECT n_docs, n_groups,
           CAST(raw_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS raw_mean_chars,
           CAST(dedup_micro AS DOUBLE) / 1000000.0
             / CAST(n_groups AS DOUBLE) AS dedup_mean_chars,
           CAST(raw_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)
           - CAST(dedup_micro AS DOUBLE) / 1000000.0
             / CAST(n_groups AS DOUBLE) AS duplication_bias
    FROM t""")
def dup_bias_correction(sf_dir: str):
    """DUPLICATE-BIAS CORRECTION of the corpus mean length: the
    raw per-document mean versus the dedup-weighted mean (each
    exact-duplicate group contributes its average ONCE) — the gap
    IS the bias duplication injects into any corpus statistic,
    quantifying why dedup must precede measurement (the metric-
    level companion of dedup_exact's count and
    dup_cross_source's provenance view). Group sums fold inside
    the text-hash exchange; each group mean quantizes to micro
    units half-up before the exact cross-group fold. Scale plan:
    the dedup_exact plan — 16-byte keys, per-partition group
    cells, 4 scalars out."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["text", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        hv = md5_upper64_flat(b["text"])
        return pd.DataFrame({
            "hv": hv.astype(np.uint64),
            "nc": b["n_chars"].to_numpy(np.int64)})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("hv").agg(g=("nc", "size"),
                                s=("nc", "sum"))
        gg = a["g"].to_numpy(np.int64)
        ss = a["s"].to_numpy(np.int64)
        dm = sum(int(np.floor(np.float64(int(s_))
                              / np.float64(int(g_))
                              * 1000000.0 + 0.5))
                 for g_, s_ in zip(gg, ss))
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n_docs": np.array([int(gg.sum())], np.int64),
            "n_groups": np.array([len(a)], np.int64),
            "raw_sum": np.array([int(ss.sum())], np.int64),
            "dedup_micro": np.array([dm], object)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["hv"], cells, 16),
        ["j"], ["n_docs", "n_groups", "raw_sum", "dedup_micro"],
        exact_int=True)
    nd = int(s["n_docs"].iloc[0])
    ng = int(s["n_groups"].iloc[0])
    rs = int(s["raw_sum"].iloc[0])
    dm = int(s["dedup_micro"].iloc[0])
    raw = np.float64(rs) / np.float64(nd)
    ded = np.float64(dm) / 1000000.0 / np.float64(ng)
    return pd.DataFrame({
        "n_docs": [np.int64(nd)], "n_groups": [np.int64(ng)],
        "raw_mean_chars": [raw], "dedup_mean_chars": [ded],
        "duplication_bias": [raw - ded]})
