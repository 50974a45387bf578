# round-5 session-5 additions, batch 22: Hoeffding's D exact
# nonparametric dependence over the bounded quantity x discount
# grid, a one-step Dawid-Skene rater quality estimate, and the
# two-proportion power / required-sample-size calculation.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat, tokens_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...stages.partition import partition_map

_DS_CHARS = 300
_DS_TOKS = 55
_DS_DIST = 25
_PW_Z_A = 1.959963984540054     # z_{0.975}
_PW_Z_B = 0.8416212335729143    # z_{0.80}


@register("hoeffding_d", sql="""
    WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                        CAST(floor(l_discount * 100 + 0.5)
                             AS BIGINT) AS y
                 FROM lineitem),
    cell AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
             FROM pts GROUP BY x, y),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell),
    rx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM cell
           GROUP BY x),
    ry AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cell
           GROUP BY y),
    rk AS (SELECT c.x, c.y, c.c,
                  CAST(2 * COALESCE((SELECT sum(r.cx) FROM rx r
                                     WHERE r.x < c.x), 0)
                       + (SELECT r.cx FROM rx r WHERE r.x = c.x)
                       + 1 AS BIGINT) AS r2,
                  CAST(2 * COALESCE((SELECT sum(r.cy) FROM ry r
                                     WHERE r.y < c.y), 0)
                       + (SELECT r.cy FROM ry r WHERE r.y = c.y)
                       + 1 AS BIGINT) AS s2,
                  CAST(4 * COALESCE((SELECT sum(c2.c) FROM cell c2
                                     WHERE c2.x < c.x
                                       AND c2.y < c.y), 0)
                       + 2 * COALESCE((SELECT sum(c2.c) FROM cell
                                       c2 WHERE c2.x = c.x
                                       AND c2.y < c.y), 0)
                       + 2 * COALESCE((SELECT sum(c2.c) FROM cell
                                       c2 WHERE c2.x < c.x
                                       AND c2.y = c.y), 0)
                       + (c.c - 1) AS BIGINT) AS q4
           FROM cell c),
    d AS (SELECT
            CAST(sum(CAST(c AS HUGEINT) * (q4 - 4) * (q4 - 8))
                 AS HUGEINT) AS d1_16,
            CAST(sum(CAST(c AS HUGEINT) * (r2 - 2) * (r2 - 4)
                     * (s2 - 2) * (s2 - 4)) AS HUGEINT) AS d2_16,
            CAST(sum(CAST(c AS HUGEINT) * (r2 - 4) * (s2 - 4)
                     * (q4 - 4)) AS HUGEINT) AS d3_16
          FROM rk)
    SELECT (SELECT n FROM n) AS n_rows,
           CAST((SELECT d1_16 FROM d) AS DOUBLE) AS d1_16,
           CAST((SELECT d3_16 FROM d) AS DOUBLE) AS d3_16,
           30.0 * CAST(((SELECT n FROM n) - 2)
                       * ((SELECT n FROM n) - 3)
                       * (SELECT d1_16 FROM d)
                       + (SELECT d2_16 FROM d)
                       - 2 * ((SELECT n FROM n) - 2)
                         * (SELECT d3_16 FROM d) AS DOUBLE)
           / CAST(16 * CAST((SELECT n FROM n) AS HUGEINT)
                  * ((SELECT n FROM n) - 1)
                  * ((SELECT n FROM n) - 2)
                  * ((SELECT n FROM n) - 3)
                  * ((SELECT n FROM n) - 4) AS DOUBLE)
             AS hoeffding_d""")
def hoeffding_d(sf_dir: str):
    """HOEFFDING'S D between quantity and discount — the
    nonparametric dependence statistic that detects NON-MONOTONE
    association (U-shapes, bands) that spearman/kendall score as
    zero. Computed EXACTLY over the bounded value grid: every point
    in a (quantity, discount) cell shares the same midranks and
    bivariate rank, kept as 2-/4-scaled integers so ties never
    touch a float; the three D-sums fold as exact big integers
    (python int / HUGEINT, terms reach ~1e25) and D is ONE final
    division of exact integers. Scale plan: per-batch cell-count
    partials over the ~550-cell grid; the rank algebra is an
    O(cells^2) driver scan — the value domain, not row count,
    bounds everything."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": b["l_quantity"].to_numpy(np.int64),
            "y": np.floor(b["l_discount"].to_numpy(np.float64)
                          * 100 + 0.5).astype(np.int64),
            "c": np.ones(len(b), np.int64)}) \
            .groupby(["x", "y"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    cell = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["x", "y"], ["c"])
    xs = np.sort(cell["x"].unique())
    ys = np.sort(cell["y"].unique())
    G = np.zeros((len(xs), len(ys)), np.int64)
    xi = {int(v): i for i, v in enumerate(xs)}
    yi = {int(v): i for i, v in enumerate(ys)}
    for _, r in cell.iterrows():
        G[xi[int(r["x"])], yi[int(r["y"])]] = int(r["c"])
    n = int(G.sum())
    cx = G.sum(axis=1)
    cy = G.sum(axis=0)
    cxl = np.concatenate([[0], np.cumsum(cx)[:-1]])
    cyl = np.concatenate([[0], np.cumsum(cy)[:-1]])
    # 2D strictly-less cumulative
    cum = np.cumsum(np.cumsum(G, axis=0), axis=1)
    below = np.zeros_like(G)
    below[1:, 1:] = cum[:-1, :-1]
    rowless = np.zeros_like(G)      # x' = x, y' < y
    rowless[:, 1:] = np.cumsum(G, axis=1)[:, :-1]
    colless = np.zeros_like(G)      # x' < x, y' = y
    colless[1:, :] = np.cumsum(G, axis=0)[:-1, :]
    d1 = d2 = d3 = 0
    for i in range(len(xs)):
        for j in range(len(ys)):
            c = int(G[i, j])
            if not c:
                continue
            r2 = 2 * int(cxl[i]) + int(cx[i]) + 1
            s2 = 2 * int(cyl[j]) + int(cy[j]) + 1
            q4 = 4 * int(below[i, j]) + 2 * int(rowless[i, j]) \
                + 2 * int(colless[i, j]) + (c - 1)
            d1 += c * (q4 - 4) * (q4 - 8)
            d2 += c * (r2 - 2) * (r2 - 4) * (s2 - 2) * (s2 - 4)
            d3 += c * (r2 - 4) * (s2 - 4) * (q4 - 4)
    num = (n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3
    den = 16 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4)
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "d1_16": [np.float64(d1)],
        "d3_16": [np.float64(d3)],
        "hoeffding_d": [30.0 * np.float64(num)
                        / np.float64(den)]})


@register("dawid_skene_lite", sql="""
    WITH lab AS (SELECT
        CASE WHEN n_chars >= {ch} THEN 1 ELSE 0 END AS a,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) >= {tk}
             THEN 1 ELSE 0 END AS b,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(list_distinct(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+'))) END AS BIGINT) >= {ds}
             THEN 1 ELSE 0 END AS c
        FROM documents),
    mj AS (SELECT a, b, c,
                  CASE WHEN a + b + c >= 2 THEN 1 ELSE 0 END AS m
           FROM lab),
    u AS (SELECT CAST(1 AS BIGINT) AS rater, a AS lab, m FROM mj
          UNION ALL
          SELECT CAST(2 AS BIGINT), b, m FROM mj
          UNION ALL
          SELECT CAST(3 AS BIGINT), c, m FROM mj),
    s AS (SELECT rater,
                 CAST(sum(lab * m) AS BIGINT) AS tp,
                 CAST(sum(lab * (1 - m)) AS BIGINT) AS fp,
                 CAST(sum((1 - lab) * m) AS BIGINT) AS fn,
                 CAST(sum((1 - lab) * (1 - m)) AS BIGINT) AS tn
          FROM u GROUP BY rater)
    SELECT rater, tp, fp, fn, tn,
           CAST(tp + tn AS DOUBLE)
             / CAST(tp + fp + fn + tn AS DOUBLE) AS accuracy,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
             AS sensitivity,
           CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)
             AS specificity
    FROM s ORDER BY rater""".format(ch=_DS_CHARS, tk=_DS_TOKS,
                                    ds=_DS_DIST))
def dawid_skene_lite(sf_dir: str):
    """DAWID-SKENE one-step rater quality estimation: with the
    majority vote of the three deterministic length raters (chars /
    tokens / distinct-tokens, the fleiss_kappa panel) as the
    working truth, estimate each rater's confusion matrix —
    sensitivity, specificity, accuracy — the crowdsourcing QC
    operator that tells you WHICH labeler to trust before weighting
    their votes (the per-rater drill-down after fleiss_kappa's
    panel-level agreement and cochran_q's marginal test). All
    confusion cells are exact integer folds; the three rates are
    shared float divisions. Scale plan: map-only 12-cell partials
    (4 cells x 3 raters), O(blocks) driver combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        dis = pd.DataFrame(
            {"doc": doc,
             "term": vals.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("doc").size() \
            .reindex(np.arange(len(b)), fill_value=0) \
            .to_numpy(np.int64)
        a = (b["n_chars"].to_numpy(np.int64)
             >= _DS_CHARS).astype(np.int64)
        t = (k >= _DS_TOKS).astype(np.int64)
        c = (dis >= _DS_DIST).astype(np.int64)
        m = ((a + t + c) >= 2).astype(np.int64)
        rows = []
        for rater, lab in ((1, a), (2, t), (3, c)):
            rows.append({
                "rater": rater,
                "tp": int((lab * m).sum()),
                "fp": int((lab * (1 - m)).sum()),
                "fn": int(((1 - lab) * m).sum()),
                "tn": int(((1 - lab) * (1 - m)).sum())})
        return pd.DataFrame(rows)

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["rater"], ["tp", "fp", "fn", "tn"]).sort_values("rater") \
        .reset_index(drop=True)
    tp = s["tp"].to_numpy(np.int64)
    fp = s["fp"].to_numpy(np.int64)
    fn_ = s["fn"].to_numpy(np.int64)
    tn = s["tn"].to_numpy(np.int64)
    tot = (tp + fp + fn_ + tn).astype(np.float64)
    return pd.DataFrame({
        "rater": s["rater"].astype(np.int64),
        "tp": tp, "fp": fp, "fn": fn_, "tn": tn,
        "accuracy": (tp + tn).astype(np.float64) / tot,
        "sensitivity": tp.astype(np.float64)
        / (tp + fn_).astype(np.float64),
        "specificity": tn.astype(np.float64)
        / (tn + fp).astype(np.float64)})


@register("power_sample_size", sql="""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    r AS (SELECT u.user_id,
                 CAST(('0x' || substr(md5(CAST(u.user_id AS
                       VARCHAR) || ':arm'), 1, 16))::UBIGINT % 2
                      AS BIGINT) AS arm
          FROM u),
    e AS (SELECT ev.user_id,
                 CAST(CASE WHEN sum(CASE WHEN ev.event_type =
                               'purchase' THEN 1 ELSE 0 END) >= 14
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM events ev GROUP BY ev.user_id),
    j AS (SELECT r.arm, e.conv FROM r JOIN e
          ON r.user_id = e.user_id),
    s AS (SELECT CAST(sum(1 - arm) AS BIGINT) AS n0,
                 CAST(sum(arm) AS BIGINT) AS n1,
                 CAST(sum((1 - arm) * conv) AS BIGINT) AS c0,
                 CAST(sum(arm * conv) AS BIGINT) AS c1
          FROM j),
    p AS (SELECT n0, n1, c0, c1,
                 CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
                 CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1
          FROM s)
    SELECT n0 AS n_control, n1 AS n_treatment, p0, p1,
           CASE WHEN p1 <> p0 THEN
           CAST(ceil(({za} + {zb}) * ({za} + {zb})
                * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
                / ((p1 - p0) * (p1 - p0))) AS BIGINT)
           ELSE NULL END AS n_required_per_arm
    FROM p""".format(za=_PW_Z_A, zb=_PW_Z_B))
def power_sample_size(sf_dir: str):
    """TWO-PROPORTION POWER ANALYSIS: with users hash-assigned to
    arms (the srm_check coin) and the per-user heavy-purchaser flag
    (>= 14 purchases) as the metric, the required per-arm sample size to detect the
    OBSERVED rate difference at alpha=0.05 / power=0.80 —
    n = (z_a+z_b)^2 (p0 q0 + p1 q1) / (p1-p0)^2 — the experiment-
    design operator that says whether the A/B test you are about to
    read (ab_test / sprt_ab) ever had a chance. Counts are exact
    integer folds over deduplicated users; rates, the formula and
    the ceil all evaluate on identical doubles. Scale plan:
    per-user conversion collapses through ONE user exchange;
    everything after is driver arithmetic."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "conv": (b["event_type"].to_numpy(object)
                     == "purchase").astype(np.int64)}) \
            .groupby("user_id", as_index=False).sum()
        g["conv"] = g["conv"].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("user_id", as_index=False)["conv"].sum()
        ids = a["user_id"].to_numpy(np.int64)
        arm = (md5_id64_flat(ids, ":arm")[0] % 2).astype(np.int64)
        conv = (a["conv"].to_numpy(np.int64) >= 14) \
            .astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n0": np.array([int((arm == 0).sum())], np.int64),
            "n1": np.array([int((arm == 1).sum())], np.int64),
            "c0": np.array([int(conv[arm == 0].sum())], np.int64),
            "c1": np.array([int(conv[arm == 1].sum())],
                           np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["user_id"], cells, 16),
        ["j"], ["n0", "n1", "c0", "c1"])
    n0, n1 = int(s["n0"].iloc[0]), int(s["n1"].iloc[0])
    c0, c1 = int(s["c0"].iloc[0]), int(s["c1"].iloc[0])
    p0 = np.float64(c0) / np.float64(n0)
    p1 = np.float64(c1) / np.float64(n1)
    z = _PW_Z_A + _PW_Z_B
    if p1 != p0:
        req = np.int64(int(np.ceil(
            z * z * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
            / ((p1 - p0) * (p1 - p0)))))
    else:
        req = np.nan
    return pd.DataFrame({
        "n_control": [np.int64(n0)], "n_treatment": [np.int64(n1)],
        "p0": [np.float64(p0)], "p1": [np.float64(p1)],
        "n_required_per_arm": [req]})
