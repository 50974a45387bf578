# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd, register)

@register("dow_anova", sql="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY 1, 2),
    g AS (SELECT dow, CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n) AS HUGEINT) AS sg
          FROM d GROUP BY dow),
    gt AS (SELECT CAST(sum(CAST(floor(
                 CAST(sg * sg AS DOUBLE) / CAST(k AS DOUBLE)
                 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS bmicro
           FROM g),
    t AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                 CAST(sum(n) AS HUGEINT) AS s,
                 CAST(sum(n * n) AS HUGEINT) AS s2
          FROM d)
    SELECT nd AS n_days,
           (CAST(bmicro AS DOUBLE) / 1e6
              - CAST(s * s AS DOUBLE) / CAST(nd AS DOUBLE))
             / (CAST(s2 AS DOUBLE)
                - CAST(s * s AS DOUBLE) / CAST(nd AS DOUBLE))
               AS eta2
    FROM t, gt""")
def dow_anova(sf_dir: str):
    """Seasonality STRENGTH: one-way ANOVA eta² of daily event volume
    grouped by weekday — the share of day-to-day variance the weekly
    cycle explains (dow_index gives the per-day factors; this says
    whether they matter). All sufficient statistics are exact
    integers from the bounded calendar grid; the one per-group float
    term (S_g²/k_g) quantizes half-away to micro-units and folds as
    int64, so neither engine's summation order leaks into eta²."""
    ds = _events(sf_dir, columns=["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"day": b["ts"].dt.normalize().to_numpy()}) \
            .groupby("day", as_index=False).agg(n=("day", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"])
    dow = pd.to_datetime(grid["day"]).dt.dayofweek.to_numpy(np.int64)
    n = grid["n"].to_numpy(np.int64)
    nd = len(n)
    s = int(n.sum())
    s2 = int((n * n).sum())
    bmicro = 0
    for g in range(7):
        m = dow == g
        if not m.any():
            continue
        sg = int(n[m].sum())
        k = int(m.sum())
        term = np.float64(sg * sg) / np.float64(k)
        bmicro += int(np.floor(term * 1e6 + 0.5))
    mean_sq = np.float64(s * s) / np.float64(nd)
    eta2 = (np.float64(bmicro) / 1e6 - mean_sq) \
        / (np.float64(s2) - mean_sq)
    return pd.DataFrame({"n_days": [np.int64(nd)], "eta2": [eta2]})


@register("source_hhi", sql="""
    WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang, source),
    a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
                 CAST(sum(n) AS HUGEINT) AS s,
                 CAST(sum(n * n) AS HUGEINT) AS s2
          FROM c GROUP BY lang)
    SELECT lang, CAST(s AS BIGINT) AS n_docs, n_sources,
           CAST(s2 AS DOUBLE) / CAST(s * s AS DOUBLE) AS hhi
    FROM a ORDER BY lang""")
def source_hhi(sf_dir: str):
    """Herfindahl–Hirschman concentration of each language's source
    mix: Σ share² (1/n_sources = perfectly balanced, 1.0 = single
    source) — the monoculture alarm for a mixing plan
    (source_diversity is its entropy sibling). HHI = Σc²/(Σc)²
    needs ONLY exact integer sums from the bounded grid — the single
    float division happens once per language, identically in both
    engines."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["lang", "source"], as_index=False).agg(
            n=("lang", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    grid = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["n"])
    rows = []
    for lang, g in grid.groupby("lang", sort=True):
        c = g["n"].to_numpy(np.int64)
        s = int(c.sum())
        s2 = int((c * c).sum())
        rows.append({"lang": lang, "n_docs": np.int64(s),
                     "n_sources": np.int64(len(c)),
                     "hhi": np.float64(s2) / np.float64(s * s)})
    return pd.DataFrame(rows)
