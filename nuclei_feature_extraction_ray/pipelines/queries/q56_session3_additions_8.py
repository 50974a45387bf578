# round-5 session-3 additions, batch 8: next-greater-element spans on
# the daily series (monotonic stack), weighted Jaccard between source
# vocabularies, and Theil inequality decomposition.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)


@register("days_to_higher", sql="""
    WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY day)
    SELECT a.day, a.n,
           CAST(date_diff('day', a.day,
                (SELECT min(b.day) FROM d b
                 WHERE b.day > a.day AND b.n > a.n)) AS BIGINT)
             AS days_until_higher
    FROM d a ORDER BY a.day""")
def days_to_higher(sf_dir: str):
    """Next-greater-element spans on the daily event-count series:
    for every day, how many days until traffic first EXCEEDS it
    (NULL for days never beaten) — the stock-span/monotonic-stack
    problem, the O(n) answer to 'was this a local peak and for how
    long'. The oracle states it as a correlated subquery; the engine
    runs the classic monotonic stack over the combined series, so the
    semantics are checked against an independent formulation.
    Exactness: pure integer day arithmetic. Scale plan: per-batch
    (day, count) partials collapse to a calendar-bounded combine; the
    stack runs on the driver's tiny series."""
    ds = _events(sf_dir, ["ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["ts"].to_numpy("datetime64[us]").astype(np.int64) \
            // 86_400_000_000
        g = pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size()
        return pd.DataFrame({"day": g["day"].to_numpy(np.int64),
                             "n": g["size"].to_numpy(np.int64)})

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["n"]).sort_values("day", kind="mergesort") \
        .reset_index(drop=True)
    days = d["day"].to_numpy(np.int64)
    n = d["n"].to_numpy(np.int64)
    until = np.full(len(n), np.nan, np.float64)
    stack: list[int] = []           # indices with no higher day yet
    for i in range(len(n)):
        while stack and n[stack[-1]] < n[i]:
            j = stack.pop()
            until[j] = float(days[i] - days[j])
        stack.append(i)
    return pd.DataFrame({
        "day": days.astype("datetime64[D]").astype("datetime64[us]"),
        "n": n, "days_until_higher": until})


@register("weighted_jaccard_sources", sql="""
    WITH w AS (SELECT source, unnest(string_split_regex(
                 trim(text, E' \\t\\n\\r\\f'),
                 '[ \\t\\n\\r\\f]+')) AS term
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS n
          FROM w GROUP BY source, term),
    t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot
          FROM c GROUP BY source),
    i AS (SELECT a.source AS source_a, b.source AS source_b,
                 CAST(sum(least(a.n, b.n)) AS BIGINT) AS s_min
          FROM c a JOIN c b ON a.term = b.term
                           AND a.source < b.source
          GROUP BY 1, 2)
    SELECT source_a, source_b, s_min,
           CAST(s_min AS DOUBLE)
             / CAST(ta.tot + tb.tot - s_min AS DOUBLE)
             AS weighted_jaccard
    FROM i JOIN t ta ON ta.source = i.source_a
           JOIN t tb ON tb.source = i.source_b
    ORDER BY source_a, source_b""")
def weighted_jaccard_sources(sf_dir: str):
    """Weighted Jaccard similarity between every pair of source
    vocabularies: sum(min(tf_a, tf_b)) / sum(max(tf_a, tf_b)) over
    the term-frequency vectors — the multiset overlap that (unlike
    set Jaccard, vocab_jaccard_langs) notices when two sources share
    words but at wildly different rates. Exact integers with ONE
    division via the identity sum(max) = tot_a + tot_b - sum(min).
    Scale plan: per-batch (source, term, tf) partials through the
    guarded vocabulary combine (term-keyed exchange above it — each
    term's min contributions are computable term-locally); the pair
    matrix folds on a sources x sources grid."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        g = pd.DataFrame({
            "source": np.repeat(b["source"].to_numpy(object), k),
            "term": vals.to_numpy(zero_copy_only=False)}) \
            .groupby(["source", "term"], as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g[["source", "term", "n"]]

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["source", "term"], ["n"])
    piv = c.pivot_table(index="term", columns="source", values="n",
                        fill_value=0, aggfunc="sum")
    srcs = sorted(piv.columns)
    tot = {s: int(piv[s].sum()) for s in srcs}
    rows = []
    for ai, a in enumerate(srcs):
        va = piv[a].to_numpy(np.int64)
        for b2 in srcs[ai + 1:]:
            vb = piv[b2].to_numpy(np.int64)
            s_min = int(np.minimum(va, vb).sum())
            if s_min == 0:
                continue            # oracle's inner join drops these
            rows.append((a, b2, s_min,
                         float(s_min)
                         / float(tot[a] + tot[b2] - s_min)))
    out = pd.DataFrame(rows, columns=["source_a", "source_b",
                                      "s_min", "weighted_jaccard"])
    out["s_min"] = out["s_min"].astype(np.int64)
    return out.sort_values(["source_a", "source_b"],
                           kind="mergesort").reset_index(drop=True)


@register("theil_index", sql="""
    WITH o AS (SELECT o_orderpriority AS g,
                      CAST(round(o_totalprice * 100) AS BIGINT)
                        AS cents FROM orders),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(cents) AS HUGEINT) AS s FROM o),
    gg AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
                  CAST(sum(cents) AS HUGEINT) AS sg
           FROM o GROUP BY g),
    tt AS (SELECT sum((CAST(cents AS DOUBLE) / CAST(tot.s AS DOUBLE))
                      * ln(CAST(cents AS DOUBLE)
                           * CAST(tot.n AS DOUBLE)
                           / CAST(tot.s AS DOUBLE))) AS t_total
           FROM o CROSS JOIN tot),
    bb AS (SELECT sum((CAST(sg AS DOUBLE) / CAST(tot.s AS DOUBLE))
                      * ln(CAST(sg AS DOUBLE)
                           * CAST(tot.n AS DOUBLE)
                           / (CAST(ng AS DOUBLE)
                              * CAST(tot.s AS DOUBLE))))
                    AS t_between
           FROM gg CROSS JOIN tot)
    SELECT tot.n AS n_orders, tt.t_total AS theil_total,
           bb.t_between AS theil_between,
           tt.t_total - bb.t_between AS theil_within
    FROM tot CROSS JOIN tt CROSS JOIN bb""")
def theil_index(sf_dir: str):
    """Theil T inequality index of order values, decomposed into
    between-priority and within-priority components — the
    decomposable inequality measure (Gini is not additive across
    groups) that answers 'is revenue concentration driven by the
    priority mix or by spread inside each priority'. Identity used:
    T = sum_i (x_i/S) ln(x_i n / S); between = sum_g (S_g/S)
    ln(mu_g/mu); within = T - between (computed by the SAME
    subtraction in both engines). Scale plan: pass 1 folds exact
    integer (group, count, cents) partials; pass 2 is map-only float
    partial sums of the ln terms against the broadcast totals;
    round-6 absorbs fold-order ulps."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_totalprice"])

    def gpart(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["o_totalprice"].to_numpy()
                         * 100).astype(np.int64)
        g = pd.DataFrame({"g": b["o_orderpriority"].astype(object),
                          "ng": np.ones(len(b), np.int64),
                          "sg": cents}) \
            .groupby("g", as_index=False).sum()
        g["ng"] = g["ng"].astype(np.int64)
        g["sg"] = g["sg"].astype(np.int64)
        return g

    gg = _combine_partials(
        ds.map_batches(gpart, batch_format="pandas"),
        ["g"], ["ng", "sg"])
    n = int(gg["ng"].sum())
    s = float(gg["sg"].sum())
    nd = float(n)

    def tpart(b: pd.DataFrame) -> pd.DataFrame:
        x = np.round(b["o_totalprice"].to_numpy()
                     * 100).astype(np.int64).astype(np.float64)
        return pd.DataFrame({
            "t": [float(np.sum((x / s) * np.log(x * nd / s)))]})

    t_total = float(ds.map_batches(tpart, batch_format="pandas")
                    .to_pandas()["t"].sum())
    sg = gg["sg"].to_numpy(np.int64).astype(np.float64)
    ng = gg["ng"].to_numpy(np.int64).astype(np.float64)
    t_between = float(np.sum((sg / s) * np.log(sg * nd / (ng * s))))
    return pd.DataFrame({
        "n_orders": np.asarray([n], np.int64),
        "theil_total": np.asarray([t_total], np.float64),
        "theil_between": np.asarray([t_between], np.float64),
        "theil_within": np.asarray([t_total - t_between],
                                   np.float64)})
