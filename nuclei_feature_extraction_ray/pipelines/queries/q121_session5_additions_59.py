# round-5 session-5 additions, batch 59: the revenue waterfall
# decomposition, supplier concentration risk per part, and the
# yearly skyline-size trend.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_SC_PCT = 80


@register("revenue_waterfall", sql="""
    WITH li AS (SELECT
        CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
          AS gross,
        CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
             AS BIGINT) AS disc,
        CAST(floor(l_extendedprice * (1 - l_discount) * l_tax
                   * 100 + 0.5) AS BIGINT) AS tax,
        CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
        FROM lineitem),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(gross) AS BIGINT) AS gross,
                 CAST(sum(disc) AS BIGINT) AS discounts,
                 CAST(sum(gross * ret) AS BIGINT) AS returned,
                 CAST(sum(tax * (1 - ret)) AS BIGINT)
                   AS tax_kept,
                 CAST(sum((gross - disc) * (1 - ret)) AS BIGINT)
                   AS net_kept
          FROM li)
    SELECT n AS n_lines, gross AS gross_cents,
           discounts AS discount_cents,
           returned AS returned_gross_cents,
           net_kept AS net_kept_cents,
           tax_kept AS tax_on_kept_cents,
           CAST(net_kept AS DOUBLE) / CAST(gross AS DOUBLE)
             AS net_capture_rate
    FROM s""")
def revenue_waterfall(sf_dir: str):
    """REVENUE WATERFALL decomposition: gross line revenue, the
    discount give-back, gross value lost to returns, the net
    retained on kept lines and its tax — the bridge-chart census
    every revenue review opens with, assembled in ONE pass with
    every step in exact integer cents (each per-line discounted/
    taxed amount quantizes half-up from the same bit-identical
    double on both engines, the pricing_summary policy). Only the
    final capture rate divides. Scale plan: map-only 6-cell
    partials, O(blocks) driver combine."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ep = b["l_extendedprice"].to_numpy(np.float64)
        dc = b["l_discount"].to_numpy(np.float64)
        tx = b["l_tax"].to_numpy(np.float64)
        gross = np.floor(ep * 100 + 0.5).astype(np.int64)
        disc = np.floor(ep * dc * 100 + 0.5).astype(np.int64)
        tax = np.floor(ep * (1 - dc) * tx * 100
                       + 0.5).astype(np.int64)
        ret = (b["l_returnflag"].to_numpy(object)
               == "R").astype(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "gross": np.array([int(gross.sum())], np.int64),
            "discounts": np.array([int(disc.sum())], np.int64),
            "returned": np.array([int((gross * ret).sum())],
                                 np.int64),
            "tax_kept": np.array([int((tax * (1 - ret)).sum())],
                                 np.int64),
            "net_kept": np.array([int(((gross - disc)
                                       * (1 - ret)).sum())],
                                 np.int64)})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "gross", "discounts", "returned",
                "tax_kept", "net_kept"], exact_int=True)
    n = int(s["n"].iloc[0])
    gross = int(s["gross"].iloc[0])
    disc = int(s["discounts"].iloc[0])
    ret = int(s["returned"].iloc[0])
    taxk = int(s["tax_kept"].iloc[0])
    netk = int(s["net_kept"].iloc[0])
    return pd.DataFrame({
        "n_lines": [np.int64(n)], "gross_cents": [np.int64(gross)],
        "discount_cents": [np.int64(disc)],
        "returned_gross_cents": [np.int64(ret)],
        "net_kept_cents": [np.int64(netk)],
        "tax_on_kept_cents": [np.int64(taxk)],
        "net_capture_rate": [np.float64(netk)
                             / np.float64(gross)]})


@register("supplier_concentration", sql="""
    WITH c AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem GROUP BY 1, 2),
    t AS (SELECT pk, CAST(sum(q) AS BIGINT) AS tq,
                 CAST(max(q) AS BIGINT) AS mq,
                 CAST(count(*) AS BIGINT) AS n_supp
          FROM c GROUP BY pk),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
                 CAST(sum(CASE WHEN mq * 100 > tq * {p}
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_concentrated,
                 CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_single_source
          FROM t)
    SELECT n_parts, n_single_source, n_concentrated,
           CAST(n_concentrated AS DOUBLE)
             / CAST(n_parts AS DOUBLE) AS concentration_rate
    FROM s""".format(p=_SC_PCT))
def supplier_concentration(sf_dir: str):
    """SUPPLIER CONCENTRATION RISK census: parts where one
    supplier carries more than {p}% of shipped volume, plus the
    strictly single-sourced count — the supply-chain
    single-point-of-failure audit (the sourcing cousin of
    hub_removal_impact's graph view and source_hhi's share math).
    The {p}% test is the EXACT integer cross-multiplication
    mq*100 > tq*{p}; every census is an integer fold. Scale plan:
    (part, supplier) volume cells fold through part-keyed
    partials; per-part max/total reduce inside the exchange, 3
    scalars out."""
    ds = rd.read_parquet(_path(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey",
                                  "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "sk": b["l_suppkey"].to_numpy(np.int64),
            "q": b["l_quantity"].to_numpy(np.int64)}) \
            .groupby(["pk", "sk"], as_index=False).sum()
        g["q"] = g["q"].astype(np.int64)
        return g

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["pk", "sk"], as_index=False)["q"].sum()
        t = a.groupby("pk").agg(tq=("q", "sum"), mq=("q", "max"),
                                n_supp=("sk", "size"))
        tq = t["tq"].to_numpy(np.int64)
        mq = t["mq"].to_numpy(np.int64)
        ns = t["n_supp"].to_numpy(np.int64)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n_parts": np.array([len(t)], np.int64),
            "conc": np.array([int((mq * 100
                                   > tq * _SC_PCT).sum())],
                             np.int64),
            "single": np.array([int((ns == 1).sum())],
                               np.int64)})

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["pk"], cells, 16),
        ["j"], ["n_parts", "conc", "single"])
    np_ = int(s["n_parts"].iloc[0])
    conc = int(s["conc"].iloc[0])
    single = int(s["single"].iloc[0])
    return pd.DataFrame({
        "n_parts": [np.int64(np_)],
        "n_single_source": [np.int64(single)],
        "n_concentrated": [np.int64(conc)],
        "concentration_rate": [np.float64(conc)
                               / np.float64(np_)]})


@register("skyline_trend", sql="""
    WITH p AS (SELECT l_partkey AS pk,
                      CAST(year(l_shipdate) AS BIGINT) AS y,
                      CAST(sum(CAST(floor(l_extendedprice * 100
                                          + 0.5) AS BIGINT))
                           AS BIGINT) AS rev,
                      CAST(sum(l_quantity) AS BIGINT) AS qty
               FROM lineitem GROUP BY 1, 2),
    grp AS (SELECT y, rev, CAST(max(qty) AS BIGINT) AS gmax
            FROM p GROUP BY y, rev),
    scan AS (SELECT y, rev, gmax,
                    CAST(COALESCE(max(gmax) OVER (PARTITION BY y
                         ORDER BY rev DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), -1) AS BIGINT)
                      AS pmax
             FROM grp),
    nn AS (SELECT y, CAST(count(*) AS BIGINT) AS n_parts
           FROM p GROUP BY y),
    sv AS (SELECT p.y, CAST(count(*) AS BIGINT) AS skyline_size
           FROM p JOIN scan ON scan.y = p.y
                           AND scan.rev = p.rev
           WHERE scan.gmax > scan.pmax AND p.qty = scan.gmax
           GROUP BY p.y)
    SELECT nn.y AS year, nn.n_parts, sv.skyline_size,
           CAST(sv.skyline_size AS DOUBLE)
             / CAST(nn.n_parts AS DOUBLE) AS skyline_share
    FROM nn JOIN sv ON sv.y = nn.y ORDER BY nn.y""")
def skyline_trend(sf_dir: str):
    """YEARLY SKYLINE-SIZE TREND: per ship year, how many parts
    are Pareto-optimal on (revenue, quantity) — no other part that
    year dominates them on both axes — and what share of the
    catalog that frontier is; a growing skyline share means the
    market is DIVERSIFYING (no single trade-off curve), a
    shrinking one means winners consolidate (the temporal reading
    of supplier_skyline/part_pareto's static frontier). Dominance
    is pure integer comparison on exact cents/units; the frontier
    per year falls out of one rev-descending scan keeping the
    running quantity maximum. Scale plan: per-(part,
    year) cells; each year's skyline is the classic sort-by-rev
    scan keeping the running qty max — O(parts log parts) driver
    work per year (partitionable by year at fleet scale)."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_shipdate"].dt.year.to_numpy(np.int64)
        r = np.floor(b["l_extendedprice"].to_numpy(np.float64)
                     * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({
            "pk": b["l_partkey"].to_numpy(np.int64),
            "y": y, "rev": r,
            "qty": b["l_quantity"].to_numpy(np.int64)}) \
            .groupby(["pk", "y"], as_index=False).sum()
        for c in ("rev", "qty"):
            g[c] = g[c].astype(np.int64)
        return g

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk", "y"], ["rev", "qty"], exact_int=True)
    rows = []
    for y, g in p.groupby("y"):
        rev = np.array([int(x) for x in g["rev"]], np.int64)
        qty = np.array([int(x) for x in g["qty"]], np.int64)
        n = len(g)
        # frontier scan: per distinct rev (desc), survivors are
        # the points at the group qty max when it strictly beats
        # every higher-rev group's max (identical (rev, qty)
        # pairs never dominate each other, so all survive)
        df = pd.DataFrame({"rev": rev, "qty": qty})
        gmax = df.groupby("rev")["qty"].max()
        cnt_at_max = df.merge(
            gmax.rename("gmax"), left_on="rev",
            right_index=True)
        cnt_at_max = cnt_at_max[cnt_at_max["qty"]
                                == cnt_at_max["gmax"]] \
            .groupby("rev").size()
        sky = 0
        pmax = -1
        for rv in sorted(gmax.index, reverse=True):
            gm = int(gmax[rv])
            if gm > pmax:
                sky += int(cnt_at_max[rv])
                pmax = gm
        rows.append({
            "year": np.int64(int(y)),
            "n_parts": np.int64(n),
            "skyline_size": np.int64(sky),
            "skyline_share": np.float64(sky) / np.float64(n)})
    return pd.DataFrame(rows).sort_values(
        "year", kind="mergesort").reset_index(drop=True)
