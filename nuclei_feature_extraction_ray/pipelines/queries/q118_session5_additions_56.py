# round-5 session-5 additions, batch 56: inventory safety-stock
# parameters for the top-volume parts, Box's M covariance-equality
# test, and Goodman-Kruskal lambda.
from __future__ import annotations

from ...functions.hashing import md5_id64_flat, tokens_flat
from ._shared import (_combine_partials, _path, np, pd, rd, register)

_SSP_TOP = 5
_SSP_Z = 1.645          # 95% service level
_SSP_LT = 2             # lead time, weeks


@register("safety_stock_params", sql="""
    WITH w AS (SELECT l_partkey AS pk,
                      CAST(floor(epoch(CAST(l_shipdate AS
                           TIMESTAMP)) / 604800) AS BIGINT) AS wk,
                      CAST(sum(l_quantity) AS BIGINT) AS q
               FROM lineitem GROUP BY 1, 2),
    span AS (SELECT CAST(max(wk) - min(wk) + 1 AS BIGINT) AS nw
             FROM w),
    m AS (SELECT pk, CAST(sum(q) AS BIGINT) AS tq,
                 CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT)
                   AS q2
          FROM w GROUP BY pk),
    top AS (SELECT pk, tq, q2,
                   row_number() OVER (ORDER BY tq DESC, pk) AS r
            FROM m),
    f AS (SELECT pk, tq,
                 CAST(tq AS DOUBLE)
                 / CAST((SELECT nw FROM span) AS DOUBLE) AS mu,
                 sqrt((CAST(q2 AS DOUBLE)
                       - CAST(tq AS DOUBLE) * CAST(tq AS DOUBLE)
                         / CAST((SELECT nw FROM span) AS DOUBLE))
                      / CAST((SELECT nw FROM span) AS DOUBLE))
                   AS sd
          FROM top WHERE r <= {k})
    SELECT pk AS partkey, tq AS total_qty, mu AS mean_weekly,
           sd AS sd_weekly,
           {z} * sd * sqrt({lt}.0) AS safety_stock,
           mu * {lt}.0 + {z} * sd * sqrt({lt}.0) AS reorder_point
    FROM f ORDER BY pk""".format(k=_SSP_TOP, z=_SSP_Z,
                                 lt=_SSP_LT))
def safety_stock_params(sf_dir: str):
    """SAFETY-STOCK PARAMETERS for the {k} highest-volume parts:
    weekly demand mean and SD over the FULL week span (absent
    weeks are true zeros, folded through the sufficient statistics
    without materializing them), safety stock z*sd*sqrt(L) and the
    reorder point mu*L + safety at a 95% service level over a
    {lt}-week lead time — the textbook inventory-control
    parameterization that closes the planning loop ss_policy_sim
    replays and newsvendor_stock prices. Demand moments are exact
    integer folds (zero weeks contribute exactly nothing to sums
    and exactly nw to the denominator); all parameters are shared
    float expressions. Scale plan: (part, week) cells fold through
    part-keyed partials; the top-{k} is a bounded merge."""
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

    w = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["pk", "wk"], ["q"], exact_int=True)
    nw = int(w["wk"].max()) - int(w["wk"].min()) + 1
    per = w.groupby("pk").agg(
        tq=("q", lambda s: sum(int(v) for v in s)),
        q2=("q", lambda s: sum(int(v) * int(v) for v in s)))
    per = per.reset_index().sort_values(
        ["tq", "pk"], ascending=[False, True],
        kind="mergesort").head(_SSP_TOP).sort_values("pk") \
        .reset_index(drop=True)
    rows = []
    for _, r in per.iterrows():
        tq, q2 = int(r["tq"]), int(r["q2"])
        mu = np.float64(tq) / np.float64(nw)
        sd = np.sqrt((np.float64(q2)
                      - np.float64(tq) * np.float64(tq)
                      / np.float64(nw)) / np.float64(nw))
        ss = _SSP_Z * sd * np.sqrt(np.float64(_SSP_LT))
        rows.append({
            "partkey": np.int64(int(r["pk"])),
            "total_qty": np.int64(tq), "mean_weekly": mu,
            "sd_weekly": sd, "safety_stock": ss,
            "reorder_point": mu * np.float64(_SSP_LT) + ss})
    return pd.DataFrame(rows)


@register("boxm_test", sql="""
    WITH d AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS
                          VARCHAR) || ':arm'), 1, 16))::UBIGINT
                          % 2 AS BIGINT) AS arm,
                      CAST(n_chars AS BIGINT) AS x,
                      CAST(CASE WHEN trim(text, E' \\t\\n\\r\\f')
                                     = '' THEN 0
                           ELSE len(string_split_regex(
                               trim(text, E' \\t\\n\\r\\f'),
                               '[ \\t\\n\\r\\f]+')) END
                           AS BIGINT) AS y
               FROM documents),
    m AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(y * y) AS HUGEINT) AS syy,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM d GROUP BY arm),
    c AS (SELECT arm, CAST(n AS BIGINT) AS n,
                 CAST(n * sxx - sx * sx AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS vxx,
                 CAST(n * syy - sy * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS vyy,
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * (CAST(n AS DOUBLE) - 1.0)) AS vxy
          FROM m),
    pool AS (SELECT
        CAST(sum(n) AS BIGINT) AS nt,
        CAST(count(*) AS BIGINT) AS g,
        sum((CAST(n AS DOUBLE) - 1.0) * vxx) AS pxx,
        sum((CAST(n AS DOUBLE) - 1.0) * vyy) AS pyy,
        sum((CAST(n AS DOUBLE) - 1.0) * vxy) AS pxy,
        sum((CAST(n AS DOUBLE) - 1.0)
            * ln(vxx * vyy - vxy * vxy)) AS sldet
      FROM c)
    SELECT (SELECT nt FROM pool) AS n_docs,
           (CAST((SELECT nt FROM pool) AS DOUBLE)
            - CAST((SELECT g FROM pool) AS DOUBLE))
           * ln(((SELECT pxx FROM pool)
                 / (CAST((SELECT nt FROM pool) AS DOUBLE)
                    - CAST((SELECT g FROM pool) AS DOUBLE)))
                * ((SELECT pyy FROM pool)
                   / (CAST((SELECT nt FROM pool) AS DOUBLE)
                      - CAST((SELECT g FROM pool) AS DOUBLE)))
                - ((SELECT pxy FROM pool)
                   / (CAST((SELECT nt FROM pool) AS DOUBLE)
                      - CAST((SELECT g FROM pool) AS DOUBLE)))
                  * ((SELECT pxy FROM pool)
                     / (CAST((SELECT nt FROM pool) AS DOUBLE)
                        - CAST((SELECT g FROM pool)
                               AS DOUBLE))))
           - (SELECT sldet FROM pool) AS box_m""")
def boxm_test(sf_dir: str):
    """BOX'S M TEST for covariance-matrix equality between the two
    hash arms on the (chars, tokens) plane: M = (N-g) ln|S_pooled|
    - sum (n_k-1) ln|S_k| over the 2x2 sample covariances — the
    multivariate variance-homogeneity gate (levene_test's matrix
    generalization) that MANOVA-style comparisons and
    mahalanobis_outliers' common-covariance assumption quietly
    require. Every covariance entry is built from exact integer
    moments; determinants and logs are shared float expressions on
    identical doubles. Scale plan: per-arm 6-cell moment partials,
    map-only; the M assembly is O(1) driver arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "n_chars", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        _, k = tokens_flat(b["text"])
        arm = (md5_id64_flat(b["doc_id"].to_numpy(np.int64),
                             ":arm")[0] % 2).astype(np.int64)
        rows = []
        for a in (0, 1):
            m = arm == a
            x = b["n_chars"].to_numpy(np.int64)[m].astype(object)
            y = k[m].astype(object)
            rows.append({"arm": a, "n": int(m.sum()),
                         "sx": int(x.sum()), "sy": int(y.sum()),
                         "sxx": int((x * x).sum()),
                         "syy": int((y * y).sum()),
                         "sxy": int((x * y).sum())})
        return pd.DataFrame(rows)

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["arm"], ["n", "sx", "sy", "sxx", "syy", "sxy"],
        exact_int=True)
    nt = 0
    g = len(m)
    pxx = pyy = pxy = np.float64(0.0)
    sldet = np.float64(0.0)
    for _, r in m.iterrows():
        n = int(r["n"])
        nt += n
        fn_ = np.float64(n)
        den = fn_ * (fn_ - 1.0)
        vxx = np.float64(n * int(r["sxx"])
                         - int(r["sx"]) * int(r["sx"])) / den
        vyy = np.float64(n * int(r["syy"])
                         - int(r["sy"]) * int(r["sy"])) / den
        vxy = np.float64(n * int(r["sxy"])
                         - int(r["sx"]) * int(r["sy"])) / den
        pxx += (fn_ - 1.0) * vxx
        pyy += (fn_ - 1.0) * vyy
        pxy += (fn_ - 1.0) * vxy
        sldet += (fn_ - 1.0) * np.log(vxx * vyy - vxy * vxy)
    dfp = np.float64(nt) - np.float64(g)
    det_p = (pxx / dfp) * (pyy / dfp) - (pxy / dfp) * (pxy / dfp)
    return pd.DataFrame({
        "n_docs": [np.int64(nt)],
        "box_m": [dfp * np.log(det_p) - sldet]})


@register("gk_lambda", sql="""
    WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
               FROM documents GROUP BY lang, source),
    rowmax AS (SELECT lang, CAST(max(n) AS BIGINT) AS mx
               FROM c GROUP BY lang),
    colsum AS (SELECT source, CAST(sum(n) AS BIGINT) AS cs
               FROM c GROUP BY source),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c),
    s AS (SELECT CAST(sum(mx) AS BIGINT) AS smx FROM rowmax),
    cm AS (SELECT CAST(max(cs) AS BIGINT) AS cmx FROM colsum)
    SELECT (SELECT nn FROM t) AS n_docs,
           (SELECT smx FROM s) AS sum_row_max,
           (SELECT cmx FROM cm) AS modal_col,
           CAST((SELECT smx FROM s) - (SELECT cmx FROM cm)
                AS DOUBLE)
           / CAST((SELECT nn FROM t) - (SELECT cmx FROM cm)
                  AS DOUBLE) AS gk_lambda""")
def gk_lambda(sf_dir: str):
    """GOODMAN-KRUSKAL LAMBDA: the proportional reduction in error
    when predicting a document's SOURCE from its LANGUAGE versus
    always guessing the modal source — lambda = (sum of row
    maxima - modal column) / (N - modal column); the PRE
    association measure whose 'how much does knowing X help'
    reading chi2_lang_source's significance and lang_source_mi's
    bits both lack. ENTIRELY exact integers (row maxima, the modal
    marginal, one final division) — not one intermediate float.
    Scale plan: the bounded lang x source grid census; maxima are
    O(grid) driver work."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"lang": b["lang"].to_numpy(object),
                          "source": b["source"].to_numpy(object),
                          "n": np.ones(len(b), np.int64)}) \
            .groupby(["lang", "source"], as_index=False).sum()
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "source"], ["n"])
    nn = int(c["n"].sum())
    smx = int(c.groupby("lang")["n"].max().sum())
    cmx = int(c.groupby("source")["n"].sum().max())
    return pd.DataFrame({
        "n_docs": [np.int64(nn)],
        "sum_row_max": [np.int64(smx)],
        "modal_col": [np.int64(cmx)],
        "gk_lambda": [np.float64(smx - cmx)
                      / np.float64(nn - cmx)]})
