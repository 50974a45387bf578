# round-5 session-5 additions, batch 39: indirectly standardized
# flag ratios per source, process capability indices for daily
# revenue, and a multi-feature PSI drift sweep between ship years.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_SMR_TOKS = 55
_SMR_BINS = (250, 350)       # n_chars strata edges
_PC_LO, _PC_HI = 50, 150     # spec limits as % of grand mean
_PSI_Y0, _PSI_Y1 = 1996, 1997


@register("smr_indirect", sql="""
    WITH lab AS (SELECT source,
        CASE WHEN n_chars < {b0} THEN 0
             WHEN n_chars < {b1} THEN 1 ELSE 2 END AS stratum,
        CASE WHEN CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = ''
                  THEN 0 ELSE len(string_split_regex(
                      trim(text, E' \\t\\n\\r\\f'),
                      '[ \\t\\n\\r\\f]+')) END AS BIGINT) >= {tk}
             THEN 1 ELSE 0 END AS flag
        FROM documents),
    ref AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(flag) AS BIGINT) AS f
            FROM lab GROUP BY stratum),
    g AS (SELECT source, stratum,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(flag) AS BIGINT) AS o
          FROM lab GROUP BY source, stratum),
    e AS (SELECT g.source,
                 CAST(sum(g.o) AS BIGINT) AS observed,
                 CAST(sum(CAST(floor(
                     CAST(g.n AS DOUBLE) * CAST(ref.f AS DOUBLE)
                     / CAST(ref.n AS DOUBLE) * 1000000.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS expected_micro
          FROM g JOIN ref ON ref.stratum = g.stratum
          GROUP BY g.source)
    SELECT source, observed, expected_micro,
           CAST(observed AS DOUBLE)
           / (CAST(expected_micro AS DOUBLE) / 1000000.0) AS smr
    FROM e ORDER BY source""".format(b0=_SMR_BINS[0],
                                     b1=_SMR_BINS[1],
                                     tk=_SMR_TOKS))
def smr_indirect(sf_dir: str):
    """INDIRECTLY STANDARDIZED FLAG RATIO (SMR) per source: each
    source's observed token-rich documents against the count
    EXPECTED if its char-length strata experienced the corpus-wide
    stratum rates — the epidemiology adjustment that separates 'this
    source flags more because its composition differs' from 'it
    flags more at like-for-like length' (the standardization
    upgrade of prr_signals' crude disproportionality). Each
    stratum's expected contribution n_sh * rate_h quantizes to
    micro units half-up before the exact per-source fold; SMR is
    one shared float ratio. Scale plan: two bounded
    (source x stratum) censuses from one map-only pass; the
    standardization is driver grid arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        nc = b["n_chars"].to_numpy(np.int64)
        st = np.where(nc < _SMR_BINS[0], 0,
                      np.where(nc < _SMR_BINS[1], 1, 2))
        fl = (k >= _SMR_TOKS).astype(np.int64)
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "stratum": st.astype(np.int64),
            "n": np.ones(len(b), np.int64), "o": fl}) \
            .groupby(["source", "stratum"], as_index=False).sum()
        for c in ("n", "o"):
            g[c] = g[c].astype(np.int64)
        return g

    g = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "stratum"], ["n", "o"])
    ref = g.groupby("stratum")[["n", "o"]].sum()
    rows = []
    for src, sub in g.groupby("source"):
        obs = int(sub["o"].sum())
        exp_m = 0
        for _, r in sub.iterrows():
            st = int(r["stratum"])
            exp_m += int(np.floor(
                np.float64(int(r["n"]))
                * np.float64(int(ref.loc[st, "o"]))
                / np.float64(int(ref.loc[st, "n"]))
                * 1000000.0 + 0.5))
        rows.append({
            "source": src, "observed": np.int64(obs),
            "expected_micro": np.int64(exp_m),
            "smr": np.float64(obs)
            / (np.float64(exp_m) / 1000000.0)})
    return pd.DataFrame(rows).sort_values(
        "source", kind="mergesort").reset_index(drop=True)


@register("process_capability", sql="""
    WITH d AS (SELECT CAST(floor(epoch(CAST(o_orderdate AS
                                             TIMESTAMP)) / 86400)
                           AS BIGINT) AS day,
                      CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                    AS BIGINT)) AS BIGINT) AS v
               FROM orders GROUP BY 1),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(v) AS HUGEINT) AS s,
                 CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT)
                   AS s2
          FROM d),
    c AS (SELECT CAST(n AS BIGINT) AS n,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 sqrt((CAST(s2 AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                         / CAST(n AS DOUBLE))
                      / (CAST(n AS DOUBLE) - 1.0)) AS sd
          FROM m),
    f AS (SELECT n, mu, sd,
                 mu * {lo}.0 / 100.0 AS lsl,
                 mu * {hi}.0 / 100.0 AS usl
          FROM c)
    SELECT n AS n_days, mu AS mean_cents, sd AS sd_cents,
           (usl - lsl) / (6.0 * sd) AS cp,
           least((usl - mu) / (3.0 * sd),
                 (mu - lsl) / (3.0 * sd)) AS cpk
    FROM f""".format(lo=_PC_LO, hi=_PC_HI))
def process_capability(sf_dir: str):
    """PROCESS CAPABILITY INDICES Cp / Cpk for daily revenue
    against +-50%-of-mean spec limits: Cp measures whether the
    day-to-day spread FITS the tolerance band, Cpk whether it is
    also CENTERED — the manufacturing yardstick (kin to
    xmr_control's natural limits) that turns 'volatile revenue'
    into a single comparable number. Moments fold as exact
    integers; mean, sample SD, both limits and both indices are
    shared float expressions. Scale plan: bounded day-domain
    combine; O(1) driver arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64)
                         * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True)
    v = [int(x) for x in d["v"]]
    n = len(v)
    s = sum(v)
    s2 = sum(x * x for x in v)
    mu = np.float64(s) / np.float64(n)
    sd = np.sqrt((np.float64(s2)
                  - np.float64(s) * np.float64(s) / np.float64(n))
                 / (np.float64(n) - 1.0))
    lsl = mu * np.float64(_PC_LO) / 100.0
    usl = mu * np.float64(_PC_HI) / 100.0
    return pd.DataFrame({
        "n_days": [np.int64(n)], "mean_cents": [mu],
        "sd_cents": [sd], "cp": [(usl - lsl) / (6.0 * sd)],
        "cpk": [min((usl - mu) / (3.0 * sd),
                    (mu - lsl) / (3.0 * sd))]})


def _psi_feature_sql(col: str, expr: str, bins: str) -> str:
    return """
    SELECT '{c}' AS feature, b,
           CAST(sum(CASE WHEN y = {y0} THEN 1 ELSE 0 END)
                AS BIGINT) AS n0,
           CAST(sum(CASE WHEN y = {y1} THEN 1 ELSE 0 END)
                AS BIGINT) AS n1
    FROM (SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
                 {bins} AS b
          FROM lineitem
          WHERE year(l_shipdate) IN ({y0}, {y1}))
    GROUP BY b""".format(c=col, bins=bins.format(e=expr),
                         y0=_PSI_Y0, y1=_PSI_Y1)


@register("psi_sweep", sql="""
    WITH cells AS ({q} UNION ALL {d} UNION ALL {t}),
    tot AS (SELECT feature, CAST(sum(n0) AS BIGINT) AS t0,
                   CAST(sum(n1) AS BIGINT) AS t1
            FROM cells GROUP BY feature),
    p AS (SELECT c.feature,
                 CAST(sum(CASE WHEN c.n0 > 0 AND c.n1 > 0 THEN
                      CAST(floor((CAST(c.n1 AS DOUBLE)
                            / CAST(tot.t1 AS DOUBLE)
                            - CAST(c.n0 AS DOUBLE)
                              / CAST(tot.t0 AS DOUBLE))
                           * ln((CAST(c.n1 AS DOUBLE)
                                 / CAST(tot.t1 AS DOUBLE))
                                / (CAST(c.n0 AS DOUBLE)
                                   / CAST(tot.t0 AS DOUBLE)))
                           * 1000000.0 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS psi_micro,
                 CAST(count(*) AS BIGINT) AS n_bins
          FROM cells c JOIN tot ON tot.feature = c.feature
          GROUP BY c.feature)
    SELECT feature, n_bins, psi_micro,
           CAST(psi_micro AS DOUBLE) / 1000000.0 AS psi,
           CAST(row_number() OVER (ORDER BY psi_micro DESC,
                                   feature) AS BIGINT)
             AS drift_rank
    FROM p ORDER BY feature""".format(
    q=_psi_feature_sql("quantity", "l_quantity",
                       "CAST(({e}) AS BIGINT)"),
    d=_psi_feature_sql("discount",
                       "floor(l_discount * 100 + 0.5)",
                       "CAST(({e}) AS BIGINT)"),
    t=_psi_feature_sql("price_band",
                       "floor(l_extendedprice / 1000)",
                       "CAST(({e}) AS BIGINT)")))
def psi_sweep(sf_dir: str):
    """MULTI-FEATURE PSI DRIFT SWEEP between ship years {y0} and
    {y1}: population stability index per feature (quantity,
    discount, 1000$-price band) with a drift ranking — the
    monitoring dashboard shape that value_psi computes for one
    column, swept across the feature set so the retrain alarm
    names WHICH input moved. Bin counts are exact integer censuses
    over bounded domains; each (p1-p0)ln(p1/p0) term quantizes to
    micro units half-up before the per-feature fold (bins present
    in only one year are excluded — documented, the value_psi
    policy), and the ranking orders exact integers. Scale plan:
    per-batch (feature, bin, year) count partials over bounded
    grids; the sweep is driver arithmetic."""
    ds = rd.read_parquet(
        _path(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_quantity", "l_discount",
                 "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_shipdate"].dt.year.to_numpy(np.int64)
        m = (y == _PSI_Y0) | (y == _PSI_Y1)
        feats = {
            "quantity": b["l_quantity"].to_numpy(np.int64)[m],
            "discount": np.floor(
                b["l_discount"].to_numpy(np.float64)[m] * 100
                + 0.5).astype(np.int64),
            "price_band": np.floor(
                b["l_extendedprice"].to_numpy(np.float64)[m]
                / 1000).astype(np.int64)}
        ym = y[m]
        frames = []
        for name, vals in feats.items():
            g = pd.DataFrame({
                "feature": name, "b": vals,
                "n0": (ym == _PSI_Y0).astype(np.int64),
                "n1": (ym == _PSI_Y1).astype(np.int64)}) \
                .groupby(["feature", "b"], as_index=False).sum()
            for c in ("n0", "n1"):
                g[c] = g[c].astype(np.int64)
            frames.append(g)
        return pd.concat(frames, ignore_index=True)

    cells = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["feature", "b"], ["n0", "n1"])
    rows = []
    for feat, g in cells.groupby("feature"):
        t0 = int(g["n0"].sum())
        t1 = int(g["n1"].sum())
        psi = 0
        for _, r in g.iterrows():
            n0, n1 = int(r["n0"]), int(r["n1"])
            if n0 > 0 and n1 > 0:
                p0 = np.float64(n0) / np.float64(t0)
                p1 = np.float64(n1) / np.float64(t1)
                psi += int(np.floor((p1 - p0) * np.log(p1 / p0)
                                    * 1000000.0 + 0.5))
        rows.append({"feature": feat,
                     "n_bins": np.int64(len(g)),
                     "psi_micro": np.int64(psi),
                     "psi": np.float64(psi) / 1000000.0})
    out = pd.DataFrame(rows).sort_values(
        "feature", kind="mergesort").reset_index(drop=True)
    order = out.sort_values(["psi_micro", "feature"],
                            ascending=[False, True],
                            kind="mergesort").index
    rank = pd.Series(np.arange(1, len(out) + 1, dtype=np.int64),
                     index=order)
    out["drift_rank"] = rank.sort_index().to_numpy(np.int64)
    return out
