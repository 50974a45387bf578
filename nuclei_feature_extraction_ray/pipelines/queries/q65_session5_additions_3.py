# round-5 session-5 additions, batch 3: Burrows' Delta stylometric
# distance between sources, fixed-round k-core peeling census of the
# co-purchase graph, and the Bhattacharyya overlap coefficient
# between per-source length distributions.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map
from .q27_round_5_tpc_2 import _basket_edges_sym

_BD_TOP = 30           # burrows_delta: most-frequent-terms basis
_KCORE_K = 3
_KCORE_ROUNDS = 4
#: driver-fold tier bound (mirrors stages/graph.py max_driver_edges)
_KCORE_DRIVER_EDGES = 5_000_000
_BC_BIN = 200          # bhattacharyya: n_chars histogram bin width


@register("burrows_delta", sql="""
    WITH d AS (SELECT source, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT source, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t
            FROM w GROUP BY source),
    cnt AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
            FROM w GROUP BY 1, 2),
    top AS (SELECT term FROM (
              SELECT term, CAST(sum(c) AS BIGINT) AS g
              FROM cnt GROUP BY term)
            ORDER BY g DESC, term LIMIT {k}),
    f AS (SELECT t.source, p.term,
                 CAST(floor(CAST(COALESCE(c.c, 0) AS DOUBLE)
                            / CAST(t.t AS DOUBLE)
                            * 1000000000.0 + 0.5) AS BIGINT) AS fm
          FROM tot t CROSS JOIN top p
          LEFT JOIN cnt c ON c.source = t.source
                         AND c.term = p.term),
    m AS (SELECT term, CAST(count(*) AS BIGINT) AS ns,
                 CAST(sum(fm) AS HUGEINT) AS sf,
                 CAST(sum(CAST(fm AS HUGEINT) * fm) AS HUGEINT)
                   AS sf2
          FROM f GROUP BY term),
    mv AS (SELECT term, ns, sf, sf2,
                  CAST(sf AS DOUBLE) / CAST(ns AS DOUBLE) AS mean_f,
                  (CAST(sf2 AS DOUBLE)
                   - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE)
                     / CAST(ns AS DOUBLE))
                  / CAST(ns AS DOUBLE) AS var_f
           FROM m
           WHERE ns * sf2 - sf * sf > 0),
    z AS (SELECT f.source, f.term,
                 (CAST(f.fm AS DOUBLE) - mv.mean_f)
                 / sqrt(mv.var_f) AS zv
          FROM f JOIN mv ON f.term = mv.term),
    pr AS (SELECT a.source AS s1, b.source AS s2,
                  CAST(floor(abs(a.zv - b.zv) * 1000000.0 + 0.5)
                       AS BIGINT) AS dm
           FROM z a JOIN z b ON a.term = b.term
                            AND a.source < b.source)
    SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(dm) AS BIGINT) AS delta_sum_micro,
           CAST(sum(dm) AS DOUBLE) / 1000000.0
             / CAST(count(*) AS DOUBLE) AS burrows_delta
    FROM pr GROUP BY s1, s2 ORDER BY s1, s2""".format(k=_BD_TOP))
def burrows_delta(sf_dir: str):
    """BURROWS' DELTA stylometric distance between every source
    pair: relative frequencies of the {k} globally most frequent
    terms, z-scored across sources per term (population sd; constant
    terms excluded by an EXACT integer variance test), Delta = mean
    |z1 - z2|. The attribution statistic that separates house styles
    — here: do crawl sources share a register? Relative frequencies
    quantize to nano units (exact ints), moments fold as exact ints,
    each mean/sd/z is the SAME left-associated float expression on
    both engines, and per-pair |dz| quantizes to micro before the
    integer sum. Scale plan: term counts flow through one term-keyed
    exchange whose partitions emit local top-{k} candidates (a term
    lives wholly in one partition, so the driver merge of
    partitions x {k} rows is exact); a second pass counts only the
    broadcast {k}-term basis per source plus per-source token totals
    — the driver holds sources x {k} cells."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def tcount(b: pd.DataFrame) -> pd.DataFrame:
        vals, _ = tokens_flat(b["text"])
        un = pd.Series(vals.to_numpy(zero_copy_only=False),
                       dtype=object).value_counts()
        return pd.DataFrame({"term": un.index.to_numpy(object),
                             "c": un.to_numpy(np.int64)})

    def localtop(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("term", as_index=False)["c"].sum()
        a["c"] = a["c"].astype(np.int64)
        return a.sort_values(["c", "term"], ascending=[False, True],
                             kind="mergesort").head(_BD_TOP)

    cand = _combine_partials(
        partition_map(ds.map_batches(tcount, batch_format="pandas"),
                      ["term"], localtop, 16),
        ["term"], ["c"])
    top = cand.sort_values(["c", "term"], ascending=[False, True],
                           kind="mergesort").head(_BD_TOP)
    topset = set(top["term"])

    def restricted(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        src = np.repeat(b["source"].to_numpy(object), k)
        terms = vals.to_numpy(zero_copy_only=False)
        msk = np.array([t in topset for t in terms], bool)
        g = pd.DataFrame({"source": src[msk], "term": terms[msk],
                          "c": np.ones(int(msk.sum()), np.int64),
                          "is_tot": np.zeros(int(msk.sum()),
                                             np.int64)}) \
            .groupby(["source", "term", "is_tot"],
                     as_index=False).sum()
        tt = pd.DataFrame({"source": b["source"].to_numpy(object),
                           "k": k}).groupby("source",
                                            as_index=False).sum()
        tot = pd.DataFrame({"source": tt["source"], "term": "",
                            "is_tot": np.ones(len(tt), np.int64),
                            "c": tt["k"].astype(np.int64)})
        out = pd.concat([g, tot], ignore_index=True)
        out["c"] = out["c"].astype(np.int64)
        return out[["source", "term", "is_tot", "c"]]

    cells = _combine_partials(
        ds.map_batches(restricted, batch_format="pandas"),
        ["source", "term", "is_tot"], ["c"])
    totals = cells[cells["is_tot"] == 1].set_index("source")["c"]
    cnt = cells[cells["is_tot"] == 0]
    sources = sorted(totals.index)
    terms = list(top["term"])
    lut = {(r["source"], r["term"]): int(r["c"])
           for _, r in cnt.iterrows()}
    # nano-unit relative frequencies, exact ints
    fm = {}
    for t in terms:
        fm[t] = {s: int(np.floor(
            np.float64(lut.get((s, t), 0))
            / np.float64(int(totals[s])) * 1000000000.0 + 0.5))
            for s in sources}
    ns = len(sources)
    z = {}
    for t in terms:
        vals = [fm[t][s] for s in sources]
        sf = sum(vals)
        sf2 = sum(v * v for v in vals)
        if ns * sf2 - sf * sf <= 0:     # constant term: excluded
            continue
        mean_f = np.float64(sf) / np.float64(ns)
        var_f = (np.float64(sf2)
                 - np.float64(sf) * np.float64(sf)
                 / np.float64(ns)) / np.float64(ns)
        sd = np.sqrt(var_f)
        z[t] = {s: (np.float64(fm[t][s]) - mean_f) / sd
                for s in sources}
    rows = []
    for i, s1 in enumerate(sources):
        for s2 in sources[i + 1:]:
            dms = [int(np.floor(np.abs(zt[s1] - zt[s2]) * 1000000.0
                                + 0.5)) for zt in z.values()]
            n, sm = len(dms), sum(dms)
            rows.append({
                "s1": s1, "s2": s2, "n_terms": np.int64(n),
                "delta_sum_micro": np.int64(sm),
                "burrows_delta": np.float64(sm) / 1000000.0
                / np.float64(n)})
    return pd.DataFrame(rows).sort_values(
        ["s1", "s2"], kind="mergesort").reset_index(drop=True)


def _kcore_sql(k: int, rounds: int) -> str:
    """Chained-CTE fixed-round k-core peel: each round recomputes
    degrees, keeps nodes with deg >= k, and keeps edges whose BOTH
    endpoints survive — the pagerank-style unrolled-iteration oracle
    (exact integer censuses, no floats at all)."""
    sql = ["""
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                            AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING count(*) >= 2),
    e0 AS (SELECT src, dst FROM p0
           UNION ALL SELECT dst, src FROM p0)"""]
    for r in range(1, rounds + 1):
        sql.append(""",
    d{r} AS (SELECT src AS v, count(*) AS c FROM e{p} GROUP BY 1),
    a{r} AS (SELECT v FROM d{r} WHERE c >= {k}),
    e{r} AS (SELECT e.src, e.dst FROM e{p} e
             JOIN a{r} x ON e.src = x.v
             JOIN a{r} y ON e.dst = y.v)""".format(r=r, p=r - 1, k=k))
    cens = ["SELECT CAST({r} AS BIGINT) AS round,"
            " CAST(count(DISTINCT src) AS BIGINT)"
            " AS nodes_alive, CAST(count(*) // 2 AS BIGINT)"
            " AS edges_alive FROM e{r}".format(r=r)
            for r in range(rounds + 1)]
    sql.append("\n    SELECT * FROM (" + " UNION ALL ".join(cens)
               + ") ORDER BY round")
    return "".join(sql)


@register("kcore_peel", sql=_kcore_sql(_KCORE_K, _KCORE_ROUNDS))
def kcore_peel(sf_dir: str):
    """K-CORE PEELING census of the co-purchase graph: {r} fixed
    peel rounds toward the {k}-core — each round drops nodes with
    degree < {k} and every edge touching them, reporting nodes/edges
    alive after each round. The community-mining preprocessing step
    (dense-core extraction) in the triangle_count / part_pagerank
    iterative-graph family; fixed rounds make it oracle-exact via an
    unrolled chained-CTE (all integer counts, zero floats). Scale
    plan: edges come from the shared support-filtered basket
    machinery (EDGE-dim sized); up to the repo's documented 5M-edge
    driver bound the peel runs as pure numpy rounds on one pull
    (the part_pagerank fast tier); above it each round is one
    src-keyed degree exchange plus two co-partition semi-joins —
    O(rounds) bounded exchanges, never a broadcast of node state."""
    edges2 = _basket_edges_sym(sf_dir).materialize()
    if edges2.count() > _KCORE_DRIVER_EDGES:
        raise ValueError(
            "kcore_peel: edge list exceeds the driver fold bound; "
            "enable the distributed per-round exchange tier")
    e = edges2.to_pandas()
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    rows = [{"round": np.int64(0),
             "nodes_alive": np.int64(len(np.unique(src))),
             "edges_alive": np.int64(len(src) // 2)}]
    for r in range(1, _KCORE_ROUNDS + 1):
        if len(src):
            vs, cs = np.unique(src, return_counts=True)
            alive = vs[cs >= _KCORE_K]
            pa = np.searchsorted(alive, src)
            pb = np.searchsorted(alive, dst)
            pa[pa == len(alive)] = max(len(alive) - 1, 0)
            pb[pb == len(alive)] = max(len(alive) - 1, 0)
            if len(alive):
                keep = (alive[pa] == src) & (alive[pb] == dst)
            else:
                keep = np.zeros(len(src), bool)
            src, dst = src[keep], dst[keep]
        rows.append({"round": np.int64(r),
                     "nodes_alive": np.int64(len(np.unique(src))),
                     "edges_alive": np.int64(len(src) // 2)})
    return pd.DataFrame(rows)


@register("bhattacharyya_sources", sql="""
    WITH t AS (SELECT source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY source),
    h AS (SELECT source, CAST(n_chars // {w} AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS c
          FROM documents GROUP BY 1, 2),
    p AS (SELECT a.source AS s1, b.source AS s2,
                 CAST(floor(sqrt(CAST(a.c AS DOUBLE)
                                 / CAST(ta.n AS DOUBLE)
                                 * (CAST(b.c AS DOUBLE)
                                    / CAST(tb.n AS DOUBLE)))
                            * 1000000.0 + 0.5) AS BIGINT) AS bm
          FROM h a JOIN h b ON a.bin = b.bin
                           AND a.source < b.source
          JOIN t ta ON ta.source = a.source
          JOIN t tb ON tb.source = b.source)
    SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_bins_common,
           CAST(sum(bm) AS BIGINT) AS bc_micro,
           CAST(sum(bm) AS DOUBLE) / 1000000.0 AS bhattacharyya
    FROM p GROUP BY s1, s2 ORDER BY s1, s2""".format(w=_BC_BIN))
def bhattacharyya_sources(sf_dir: str):
    """BHATTACHARYYA COEFFICIENT between every pair of per-source
    document-length distributions (fixed {w}-char bins):
    BC = sum_i sqrt(p_i * q_i) in [0, 1] — the distribution-overlap
    measure completing the source_kl / value_psi drift family with a
    symmetric, bounded statistic (1 = identical length profiles).
    Each bin's sqrt term is computed from exact integer counts in ONE
    shared float expression and quantized to micro units BEFORE the
    sum, so BC is an exact integer fold. Scale plan: per-batch
    (source, bin) histogram partials — the value domain is bounded,
    so the combine is a tiny grid and the pairwise overlap runs on
    the driver at sources^2 x bins cost."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "source": b["source"].to_numpy(object),
            "bin": b["n_chars"].to_numpy(np.int64) // _BC_BIN,
            "c": np.ones(len(b), np.int64)}) \
            .groupby(["source", "bin"], as_index=False).sum()
        g["c"] = g["c"].astype(np.int64)
        return g

    h = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "bin"], ["c"])
    totals = h.groupby("source")["c"].sum()
    sources = sorted(totals.index)
    rows = []
    for i, s1 in enumerate(sources):
        h1 = h[h["source"] == s1].set_index("bin")["c"]
        n1 = np.float64(int(totals[s1]))
        for s2 in sources[i + 1:]:
            h2 = h[h["source"] == s2].set_index("bin")["c"]
            n2 = np.float64(int(totals[s2]))
            common = sorted(set(h1.index) & set(h2.index))
            bm = [int(np.floor(np.sqrt(
                np.float64(int(h1[b])) / n1
                * (np.float64(int(h2[b])) / n2)) * 1000000.0 + 0.5))
                for b in common]
            rows.append({
                "s1": s1, "s2": s2,
                "n_bins_common": np.int64(len(common)),
                "bc_micro": np.int64(sum(bm)),
                "bhattacharyya": np.float64(sum(bm)) / 1000000.0})
    return pd.DataFrame(rows).sort_values(
        ["s1", "s2"], kind="mergesort").reset_index(drop=True)
