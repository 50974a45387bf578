# round-5 session-5 additions, batch 5: Wilder-smoothed RSI with a
# recursive-CTE oracle, Fleiss' kappa across three deterministic
# raters, and Yule's K vocabulary concentration per language.
from __future__ import annotations

from ...functions.hashing import tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)
from ...stages.partition import partition_map

_RSI_N = 14
#: fleiss_kappa rater thresholds (cat 0 / 1 / 2 per metric)
_FK_CHARS = (250, 350)
_FK_TOKS = (45, 60)
_FK_DIST = (23, 27)


@register("rsi_wilder", sql="""
    WITH RECURSIVE d AS (
      SELECT CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))
                        / 86400) AS BIGINT) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS v
      FROM orders GROUP BY 1),
    x AS (SELECT day, v,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT)
                   AS t
          FROM d),
    g AS (SELECT a.t AS i,
                 greatest(b.v - a.v, 0) AS gain,
                 greatest(a.v - b.v, 0) AS loss
          FROM x a JOIN x b ON b.t = a.t + 1),
    seed AS (SELECT CAST({n} AS BIGINT) AS i,
                    CAST(sum(gain) // {n} AS BIGINT) AS ag,
                    CAST(sum(loss) // {n} AS BIGINT) AS al
             FROM g WHERE i <= {n}),
    rec AS (SELECT * FROM seed
            UNION ALL
            SELECT r.i + 1,
                   (r.ag * ({n} - 1) + g.gain) // {n},
                   (r.al * ({n} - 1) + g.loss) // {n}
            FROM rec r JOIN g ON g.i = r.i + 1),
    fin AS (SELECT *, row_number() OVER (ORDER BY i DESC) AS rn
            FROM rec)
    SELECT CAST(i AS BIGINT) AS n_diffs,
           CAST(ag AS BIGINT) AS avg_gain_cents,
           CAST(al AS BIGINT) AS avg_loss_cents,
           CASE WHEN ag + al > 0
                THEN 100.0 * CAST(ag AS DOUBLE)
                     / CAST(ag + al AS DOUBLE)
                ELSE NULL END AS rsi
    FROM fin WHERE rn = 1""".format(n=_RSI_N))
def rsi_wilder(sf_dir: str):
    """RSI (relative strength index) of the daily revenue series
    with WILDER SMOOTHING, the classic momentum oscillator: day-over-
    day gains/losses in exact integer cents, a simple-mean seed over
    the first {n} diffs, then the recursion
    avg = (avg*({n}-1) + x) // {n} in pure integer floor division —
    bit-identical to the recursive-CTE oracle with no float state
    (the holt_forecast recursion policy). RSI = 100*ag/(ag+al) is the
    ONE shared float expression at the end (NULL when both averages
    are zero). Scale plan: per-batch (day, cents) partials fold
    through the bounded day-domain combine (exact python-int sums);
    the O(days) recursion runs on the driver — the day domain, not
    the row count, bounds the sequential work."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_orderdate", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        day = b["o_orderdate"].to_numpy("datetime64[D]") \
            .astype(np.int64)
        cents = np.floor(b["o_totalprice"].to_numpy(np.float64) * 100
                         + 0.5).astype(np.int64)
        g = pd.DataFrame({"day": day, "v": cents}) \
            .groupby("day", as_index=False).sum()
        g["v"] = g["v"].astype(np.int64)
        return g

    d = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["day"], ["v"], exact_int=True).sort_values("day") \
        .reset_index(drop=True)
    v = [int(x) for x in d["v"]]
    gains = [max(b - a, 0) for a, b in zip(v, v[1:])]
    losses = [max(a - b, 0) for a, b in zip(v, v[1:])]
    n = _RSI_N
    if len(gains) < n:
        return pd.DataFrame({
            "n_diffs": pd.Series([], dtype=np.int64),
            "avg_gain_cents": pd.Series([], dtype=np.int64),
            "avg_loss_cents": pd.Series([], dtype=np.int64),
            "rsi": pd.Series([], dtype=np.float64)})
    ag = sum(gains[:n]) // n
    al = sum(losses[:n]) // n
    i = n
    for gn, ls in zip(gains[n:], losses[n:]):
        ag = (ag * (n - 1) + gn) // n
        al = (al * (n - 1) + ls) // n
        i += 1
    rsi = 100.0 * np.float64(ag) / np.float64(ag + al) \
        if ag + al > 0 else np.nan
    return pd.DataFrame({
        "n_diffs": [np.int64(i)],
        "avg_gain_cents": [np.int64(ag)],
        "avg_loss_cents": [np.int64(al)],
        "rsi": [np.float64(rsi)]})


def _fk_cat_sql(expr: str, lo: int, hi: int) -> str:
    return ("CASE WHEN {e} < {lo} THEN 0 WHEN {e} < {hi} THEN 1 "
            "ELSE 2 END").format(e=expr, lo=lo, hi=hi)


_FK_TOK_EXPR = ("CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = '' "
                "THEN 0 ELSE len(string_split_regex(trim(text, "
                "E' \\t\\n\\r\\f'), '[ \\t\\n\\r\\f]+')) END "
                "AS BIGINT)")
_FK_DIST_EXPR = ("CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f') = '' "
                 "THEN 0 ELSE len(list_distinct(string_split_regex("
                 "trim(text, E' \\t\\n\\r\\f'), "
                 "'[ \\t\\n\\r\\f]+'))) END AS BIGINT)")


@register("fleiss_kappa", sql="""
    WITH lab AS (SELECT {c1} AS c1, {c2} AS c2, {c3} AS c3
                 FROM documents),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(3 + 2 * (CASE WHEN c1 = c2 THEN 1 ELSE 0
                                   END
                                   + CASE WHEN c1 = c3 THEN 1 ELSE 0
                                     END
                                   + CASE WHEN c2 = c3 THEN 1 ELSE 0
                                     END)) AS BIGINT) AS s2,
                 CAST(sum(CASE WHEN c1 = 0 THEN 1 ELSE 0 END
                          + CASE WHEN c2 = 0 THEN 1 ELSE 0 END
                          + CASE WHEN c3 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS t0,
                 CAST(sum(CASE WHEN c1 = 1 THEN 1 ELSE 0 END
                          + CASE WHEN c2 = 1 THEN 1 ELSE 0 END
                          + CASE WHEN c3 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS t1,
                 CAST(sum(CASE WHEN c1 = 2 THEN 1 ELSE 0 END
                          + CASE WHEN c2 = 2 THEN 1 ELSE 0 END
                          + CASE WHEN c3 = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS t2
          FROM lab),
    cat AS (SELECT t0 AS tj FROM s UNION ALL
            SELECT t1 FROM s UNION ALL SELECT t2 FROM s),
    pe AS (SELECT CAST(sum(CAST(floor(
                 CAST(tj AS DOUBLE)
                 / (3.0 * CAST((SELECT n FROM s) AS DOUBLE))
                 * (CAST(tj AS DOUBLE)
                    / (3.0 * CAST((SELECT n FROM s) AS DOUBLE)))
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS pem
           FROM cat)
    SELECT n AS n_docs, s2 AS s2_sum, t0, t1, t2,
           (CAST(s2 AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))
             / (6.0 * CAST(n AS DOUBLE)) AS p_o,
           CAST((SELECT pem FROM pe) AS DOUBLE) / 1000000000.0
             AS p_e,
           ((CAST(s2 AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))
              / (6.0 * CAST(n AS DOUBLE))
            - CAST((SELECT pem FROM pe) AS DOUBLE) / 1000000000.0)
           / (1.0 - CAST((SELECT pem FROM pe) AS DOUBLE)
                    / 1000000000.0) AS fleiss_kappa
    FROM s""".format(
    c1=_fk_cat_sql("n_chars", *_FK_CHARS),
    c2=_fk_cat_sql(_FK_TOK_EXPR, *_FK_TOKS),
    c3=_fk_cat_sql(_FK_DIST_EXPR, *_FK_DIST)))
def fleiss_kappa(sf_dir: str):
    """FLEISS' KAPPA inter-rater agreement across THREE deterministic
    'raters' that each bin every document into short/medium/long —
    by character count, by token count, and by distinct-token count
    — answering 'do the three length notions AGREE beyond chance?'
    (the categorical counterpart of kendall_w's rank concordance).
    Per-document agreement reduces to the pair-equality census
    (sum n_ij^2 = 3 + 2*#equal-pairs), so P_o is exact integers with
    one division; category marginals are exact ints and each p_j^2
    term quantizes to nano units before the 3-term sum, making P_e an
    exact integer fold; kappa is one shared float expression. Scale
    plan: map-only 5-cell partials (N, S2, T_j), O(blocks) driver
    combine."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["n_chars", "text"])

    def cat(vals: np.ndarray, lo: int, hi: int) -> np.ndarray:
        return np.where(vals < lo, 0,
                        np.where(vals < hi, 1, 2)).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        doc = np.repeat(np.arange(len(b), dtype=np.int64), k)
        dis = pd.DataFrame(
            {"doc": doc,
             "term": vals.to_numpy(zero_copy_only=False)}) \
            .drop_duplicates().groupby("doc").size() \
            .reindex(np.arange(len(b)), fill_value=0) \
            .to_numpy(np.int64)
        c1 = cat(b["n_chars"].to_numpy(np.int64), *_FK_CHARS)
        c2 = cat(k, *_FK_TOKS)
        c3 = cat(dis, *_FK_DIST)
        eqp = ((c1 == c2).astype(np.int64)
               + (c1 == c3).astype(np.int64)
               + (c2 == c3).astype(np.int64))
        s2 = int((3 + 2 * eqp).sum())
        t = [int((c1 == j).sum() + (c2 == j).sum()
                 + (c3 == j).sum()) for j in (0, 1, 2)]
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(b)], np.int64),
            "s2": np.array([s2], np.int64),
            "t0": np.array([t[0]], np.int64),
            "t1": np.array([t[1]], np.int64),
            "t2": np.array([t[2]], np.int64)})

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["j"], ["n", "s2", "t0", "t1", "t2"])
    n = int(s["n"].iloc[0])
    s2 = int(s["s2"].iloc[0])
    t = [int(s[c].iloc[0]) for c in ("t0", "t1", "t2")]
    po = (np.float64(s2) - 3.0 * np.float64(n)) \
        / (6.0 * np.float64(n))
    pem = sum(int(np.floor(
        np.float64(tj) / (3.0 * np.float64(n))
        * (np.float64(tj) / (3.0 * np.float64(n)))
        * 1000000000.0 + 0.5)) for tj in t)
    pe = np.float64(pem) / 1000000000.0
    kappa = (po - pe) / (1.0 - pe)
    return pd.DataFrame({
        "n_docs": [np.int64(n)], "s2_sum": [np.int64(s2)],
        "t0": [np.int64(t[0])], "t1": [np.int64(t[1])],
        "t2": [np.int64(t[2])], "p_o": [np.float64(po)],
        "p_e": [np.float64(pe)],
        "fleiss_kappa": [np.float64(kappa)]})


@register("yule_k", sql="""
    WITH d AS (SELECT lang, trim(text, E' \\t\\n\\r\\f') AS t
               FROM documents
               WHERE trim(text, E' \\t\\n\\r\\f') <> ''),
    w AS (SELECT lang, unnest(string_split_regex(
                 t, '[ \\t\\n\\r\\f]+')) AS term FROM d),
    c AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n
          FROM w GROUP BY lang, term),
    s AS (SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
                 CAST(sum(n) AS BIGINT) AS n_tokens,
                 CAST(sum(CAST(n AS HUGEINT) * n) AS BIGINT)
                   AS sum_f2
          FROM c GROUP BY lang)
    SELECT lang, n_tokens, vocab, sum_f2,
           10000.0 * (CAST(sum_f2 AS DOUBLE)
                      - CAST(n_tokens AS DOUBLE))
             / (CAST(n_tokens AS DOUBLE)
                * CAST(n_tokens AS DOUBLE)) AS yule_k
    FROM s ORDER BY lang""")
def yule_k(sf_dir: str):
    """YULE'S K vocabulary-concentration characteristic per language:
    K = 10^4 * (sum_t f_t^2 - N) / N^2 over term frequencies — the
    classic repetitiveness / lexical-diversity statistic that, unlike
    a raw type-token ratio, is (asymptotically) text-length
    invariant; the stylometric complement of chao1_richness's unseen
    mass. All moments are exact integer folds (the second moment in
    HUGEINT / python int — the embedding_covariance overflow policy)
    and K is ONE shared float expression. Scale plan: per-batch
    (lang, term) count partials through ONE term-keyed exchange; each
    partition emits 3 scalars per language."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vals, k = tokens_flat(b["text"])
        g = pd.DataFrame({
            "lang": np.repeat(b["lang"].to_numpy(object), k),
            "term": vals.to_numpy(zero_copy_only=False),
            "n": np.ones(int(k.sum()), np.int64)}) \
            .groupby(["lang", "term"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    def census(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby(["lang", "term"], as_index=False)["n"].sum()
        n = a["n"].to_numpy(np.int64)
        out = pd.DataFrame({
            "lang": a["lang"],
            "vocab": np.ones(len(a), np.int64),
            "n_tokens": n,
            "sum_f2": n * n}) \
            .groupby("lang", as_index=False).sum()
        for c in ("vocab", "n_tokens", "sum_f2"):
            out[c] = out[c].astype(np.int64)
        return out

    s = _combine_partials(
        partition_map(ds.map_batches(partial, batch_format="pandas"),
                      ["term"], census, 16),
        ["lang"], ["vocab", "n_tokens", "sum_f2"], exact_int=True)
    nt = s["n_tokens"].map(int)
    f2 = s["sum_f2"].map(int)
    k = 10000.0 * (np.array([np.float64(x) for x in f2])
                   - np.array([np.float64(x) for x in nt])) \
        / (np.array([np.float64(x) for x in nt])
           * np.array([np.float64(x) for x in nt]))
    return pd.DataFrame({
        "lang": s["lang"],
        "n_tokens": nt.astype(np.int64),
        "vocab": s["vocab"].map(int).astype(np.int64),
        "sum_f2": f2.astype(np.int64),
        "yule_k": k}).sort_values(
        "lang", kind="mergesort").reset_index(drop=True)
