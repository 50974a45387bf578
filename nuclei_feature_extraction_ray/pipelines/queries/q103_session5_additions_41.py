# round-5 session-5 additions, batch 41: hub-removal robustness of
# the co-purchase graph, feature-ablation delta-R^2 from exact
# moments, and a zero-inflation check on weekly part demand.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map
from .q27_round_5_tpc_2 import _basket_edges_sym

_HR_K = 5
_HR_DRIVER_EDGES = 5_000_000


@register("hub_removal_impact", sql="""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e AS (SELECT src, dst FROM p0 UNION ALL SELECT dst, src
          FROM p0),
    dg AS (SELECT src AS v, CAST(count(*) AS BIGINT) AS deg
           FROM e GROUP BY 1),
    hubs AS (SELECT v FROM (
               SELECT v, row_number() OVER (ORDER BY deg DESC, v)
                        AS r
               FROM dg)
             WHERE r <= {k}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM p0),
    lost AS (SELECT CAST(count(*) AS BIGINT) AS l FROM p0
             WHERE src IN (SELECT v FROM hubs)
                OR dst IN (SELECT v FROM hubs))
    SELECT CAST((SELECT count(*) FROM dg) AS BIGINT) AS n_nodes,
           (SELECT n_edges FROM m) AS n_edges,
           CAST({k} AS BIGINT) AS hubs_removed,
           (SELECT l FROM lost) AS edges_lost,
           CAST((SELECT l FROM lost) AS DOUBLE)
             / CAST((SELECT n_edges FROM m) AS DOUBLE)
             AS edge_loss_fraction""".format(k=_HR_K))
def hub_removal_impact(sf_dir: str):
    """HUB-REMOVAL ROBUSTNESS of the co-purchase graph: delete the
    top-{k} degree hubs (degree DESC, id tie-break) and count the
    edges that disappear — the targeted-attack resilience census
    that quantifies what degree_powerlaw's scale-free claim
    implies: a heavy tail means a handful of hubs carry a huge
    edge share (compare rich_club, which asks if hubs
    interconnect). Degrees, the hub cut and the incidence census
    are ALL exact integers; only the final fraction divides. Scale
    plan: degrees from the shared basket edges; up to the 5M-edge
    driver bound the incidence scan is one numpy membership test
    (part_pagerank's fast tier), above it a broadcast of the tiny
    hub set into one counting pass."""
    edges2 = _basket_edges_sym(sf_dir).materialize()
    if edges2.count() > _HR_DRIVER_EDGES:
        raise ValueError(
            "hub_removal_impact: edge list exceeds the driver "
            "bound; use the broadcast-hub counting tier")
    e = edges2.to_pandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    vs, cs = np.unique(src, return_counts=True)
    order = np.lexsort((vs, -cs))
    hubs = np.sort(vs[order][:_HR_K])
    und = src < dst
    us, ud = src[und], dst[und]
    n_edges = len(us)

    def member(arr: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(hubs, arr)
        pos[pos == len(hubs)] = len(hubs) - 1
        return hubs[pos] == arr

    lost = int((member(us) | member(ud)).sum())
    return pd.DataFrame({
        "n_nodes": [np.int64(len(vs))],
        "n_edges": [np.int64(n_edges)],
        "hubs_removed": [np.int64(_HR_K)],
        "edges_lost": [np.int64(lost)],
        "edge_loss_fraction": [np.float64(lost)
                               / np.float64(n_edges)]})


@register("feature_ablation", sql="""
    WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS y,
                      CAST(floor(l_discount * 100 + 0.5)
                           AS BIGINT) AS x1,
                      CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
                        AS x2
               FROM lineitem),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x1) AS HUGEINT) AS s1,
                 CAST(sum(x2) AS HUGEINT) AS s2,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x1 * x1) AS HUGEINT) AS s11,
                 CAST(sum(x2 * x2) AS HUGEINT) AS s22,
                 CAST(sum(x1 * y) AS HUGEINT) AS s1y,
                 CAST(sum(x2 * y) AS HUGEINT) AS s2y,
                 CAST(sum(x1 * x2) AS HUGEINT) AS s12
          FROM r),
    c AS (SELECT CAST(n AS BIGINT) AS n,
                 CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
                 CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
                 CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
                 CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
                 CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y,
                 CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12
          FROM m),
    f AS (SELECT n,
                 (c1y * (c1y * c22 - c2y * c12)
                  + c2y * (c2y * c11 - c1y * c12))
                 / (cyy * (c11 * c22 - c12 * c12)) AS r2_full,
                 c1y * c1y / (cyy * c11) AS r2_only1,
                 c2y * c2y / (cyy * c22) AS r2_only2
          FROM c)
    SELECT n AS n_rows, r2_full,
           r2_full - r2_only2 AS delta_r2_discount,
           r2_full - r2_only1 AS delta_r2_tax
    FROM f""")
def feature_ablation(sf_dir: str):
    """FEATURE-ABLATION delta-R^2 for the two-regressor model
    (quantity ~ discount + tax): the full model's R^2 minus each
    single-feature model's — the model-explanation number
    ('how much does THIS feature uniquely buy') that
    permutation importance estimates by shuffling, here CLOSED
    FORM from the same exact integer moments as multi_ols (every
    centered moment an exact big int, each R^2 one shared float
    expression). Scale plan: one 10-cell moment pass, O(blocks)
    driver combine — three model fits for the price of zero extra
    scans."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount",
                                  "l_tax"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_quantity"].to_numpy(np.int64).astype(object)
        x1 = np.floor(b["l_discount"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        x2 = np.floor(b["l_tax"].to_numpy(np.float64) * 100
                      + 0.5).astype(np.int64).astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "sy": [int(y.sum())], "s1": [int(x1.sum())],
            "s2": [int(x2.sum())], "syy": [int((y * y).sum())],
            "s11": [int((x1 * x1).sum())],
            "s22": [int((x2 * x2).sum())],
            "s1y": [int((x1 * y).sum())],
            "s2y": [int((x2 * y).sum())],
            "s12": [int((x1 * x2).sum())]})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "sy", "s1", "s2", "syy", "s11", "s22",
                "s1y", "s2y", "s12"], exact_int=True)
    n = int(s["n"].iloc[0])
    sy, s1, s2 = (int(s[c].iloc[0]) for c in ("sy", "s1", "s2"))
    syy, s11, s22 = (int(s[c].iloc[0])
                     for c in ("syy", "s11", "s22"))
    s1y, s2y, s12 = (int(s[c].iloc[0])
                     for c in ("s1y", "s2y", "s12"))
    cyy = np.float64(n * syy - sy * sy)
    c11 = np.float64(n * s11 - s1 * s1)
    c22 = np.float64(n * s22 - s2 * s2)
    c1y = np.float64(n * s1y - s1 * sy)
    c2y = np.float64(n * s2y - s2 * sy)
    c12 = np.float64(n * s12 - s1 * s2)
    r2_full = (c1y * (c1y * c22 - c2y * c12)
               + c2y * (c2y * c11 - c1y * c12)) \
        / (cyy * (c11 * c22 - c12 * c12))
    r2_1 = c1y * c1y / (cyy * c11)
    r2_2 = c2y * c2y / (cyy * c22)
    return pd.DataFrame({
        "n_rows": [np.int64(n)], "r2_full": [np.float64(r2_full)],
        "delta_r2_discount": [np.float64(r2_full - r2_2)],
        "delta_r2_tax": [np.float64(r2_full - r2_1)]})


@register("zero_inflation", sql="""
    WITH li AS (SELECT l_partkey AS pk,
                       CAST(floor(epoch(CAST(l_shipdate AS
                            TIMESTAMP)) / 604800) AS BIGINT)
                         AS wk,
                       CAST(sum(l_quantity) AS BIGINT) AS q
                FROM lineitem GROUP BY 1, 2),
    span AS (SELECT CAST(max(wk) - min(wk) + 1 AS BIGINT) AS w
             FROM li),
    p AS (SELECT pk, CAST(count(*) AS BIGINT) AS active,
                 CAST(sum(q) AS BIGINT) AS tq
          FROM li GROUP BY pk),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(sum((SELECT w FROM span) - active)
                      AS BIGINT) AS zero_cells,
                 CAST(sum((SELECT w FROM span)) AS BIGINT)
                   AS total_cells,
                 CAST(sum(CAST(floor(exp(
                      -CAST(tq AS DOUBLE)
                      / CAST((SELECT w FROM span) AS DOUBLE))
                      * CAST((SELECT w FROM span) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT)) AS HUGEINT)
                   AS exp_zero_micro
          FROM p)
    SELECT n_parts, total_cells, zero_cells,
           CAST(zero_cells AS DOUBLE)
             / CAST(total_cells AS DOUBLE) AS zero_share,
           CAST(exp_zero_micro AS DOUBLE) / 1000000.0
             / CAST(total_cells AS DOUBLE)
             AS poisson_expected_share,
           (CAST(zero_cells AS DOUBLE)
            / CAST(total_cells AS DOUBLE))
           / (CAST(exp_zero_micro AS DOUBLE) / 1000000.0
              / CAST(total_cells AS DOUBLE))
             AS zero_inflation_ratio
    FROM s""")
def zero_inflation(sf_dir: str):
    """ZERO-INFLATION CHECK on weekly part demand: the observed
    share of (part, week) cells with NO sales against the share a
    per-part Poisson (rate = total demand over the week span)
    would predict — ratio >> 1 is the structural-zeros signature
    that says demand needs a hurdle/ZIP model, the count-data
    companion of negbin_fit's variance test. Active-week counts
    and the span are exact integers; each part's expected-zeros
    term W*exp(-lambda) quantizes to micro units half-up before
    the exact fold. Scale plan: (part, week) cells fold through
    part-keyed partials; per-part scalars combine once — the
    calendar, not rows, bounds every census."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_shipdate",
                                  "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        wk = (b["l_shipdate"].to_numpy("datetime64[D]")
              .astype(np.int64)) // 7
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "wk": wk,
            "q": b["l_quantity"].to_numpy(np.int64)}) \
            .groupby(["pk", "wk"], as_index=False).sum()
        g["q"] = g["q"].astype(np.int64)
        return g

    cells = _combine_partials(
        partition_map(
            ds.map_batches(partial, batch_format="pandas"),
            ["pk"],
            lambda g: g.groupby(["pk", "wk"],
                                as_index=False)[["q"]].sum(),
            16),
        ["pk", "wk"], ["q"])
    w = int(cells["wk"].max()) - int(cells["wk"].min()) + 1
    per = cells.groupby("pk").agg(active=("wk", "size"),
                                  tq=("q", "sum"))
    n_parts = len(per)
    zero_cells = sum(w - int(v) for v in per["active"])
    total_cells = n_parts * w
    exp_m = sum(int(np.floor(
        np.exp(-np.float64(int(r["tq"])) / np.float64(w))
        * np.float64(w) * 1000000.0 + 0.5))
        for _, r in per.iterrows())
    zshare = np.float64(zero_cells) / np.float64(total_cells)
    eshare = np.float64(exp_m) / 1000000.0 \
        / np.float64(total_cells)
    return pd.DataFrame({
        "n_parts": [np.int64(n_parts)],
        "total_cells": [np.int64(total_cells)],
        "zero_cells": [np.int64(zero_cells)],
        "zero_share": [zshare],
        "poisson_expected_share": [eshare],
        "zero_inflation_ratio": [zshare / eshare]})
