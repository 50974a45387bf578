# round-5 session-5 additions, batch 26: embedding axis-isotropy /
# participation ratio, within-vs-across-label cosine contrast, and
# a gamma method-of-moments fit of user inter-event gaps.
from __future__ import annotations

from ._shared import (_combine_partials, _path, np, pd, rd, register)
from .q13_embedding_table_operators import (_EMB_DIM,
                                            _EMB_UNPACK_SQL,
                                            _emb_micro)


@register("isotropy_score", sql=f"""
    WITH m AS ({_EMB_UNPACK_SQL}),
    p AS (SELECT i, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(c) AS HUGEINT) AS s,
                 CAST(sum(c * c) AS HUGEINT) AS s2
          FROM m GROUP BY i),
    v AS (SELECT i, CAST(floor(CAST(n * s2 - s * s AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE) + 0.5) AS HUGEINT)
                   AS vu
          FROM p),
    t AS (SELECT CAST(count(*) AS BIGINT) AS d,
                 CAST(sum(vu) AS HUGEINT) AS sv,
                 CAST(sum(vu * vu) AS HUGEINT) AS sv2,
                 CAST(max(vu) AS HUGEINT) AS mx
          FROM v)
    SELECT d AS n_dims, CAST(sv AS DOUBLE) AS var_total_unit,
           CAST(sv * sv AS DOUBLE) / CAST(sv2 AS DOUBLE)
             AS participation_ratio,
           CAST(mx AS DOUBLE)
           / (CAST(sv AS DOUBLE) / CAST(d AS DOUBLE))
             AS max_over_mean
    FROM t""")
def isotropy_score(sf_dir: str):
    """EMBEDDING AXIS-ISOTROPY score: per-dimension variances from
    exact integer moments, summarized by the PARTICIPATION RATIO
    (sum v)^2 / sum v^2 — d for a perfectly isotropic space, 1 when
    one axis hoards all variance — plus the max/mean axis ratio;
    the representation-quality diagnostic (axis-aligned variant,
    documented) that flags collapsed embedding spaces BEFORE
    cosine-based retrieval (ann_cosine/semantic_dedup) silently
    degrades. Each axis variance quantizes to whole units half-up
    from its exact (n, s, s2) fold, so PR is a ratio of exact big
    integers. Scale plan: the embedding_covariance diagonal plan —
    per-batch d-cell moment partials, dimension-bounded combine,
    O(d) driver arithmetic."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        return pd.DataFrame({
            "i": np.arange(1, _EMB_DIM + 1, dtype=np.int64),
            "n": np.full(_EMB_DIM, len(b), np.int64),
            "s": c.sum(axis=0),
            "s2": (c.astype(object) * c.astype(object)).sum(
                axis=0)})

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["i"], ["n", "s", "s2"], exact_int=True)
    vu = []
    for _, r in p.iterrows():
        n, s, s2 = int(r["n"]), int(r["s"]), int(r["s2"])
        vu.append(int(np.floor(
            np.float64(n * s2 - s * s)
            / np.float64(n * (n - 1)) + 0.5)))
    d = len(vu)
    sv = sum(vu)
    sv2 = sum(v * v for v in vu)
    mx = max(vu)
    return pd.DataFrame({
        "n_dims": [np.int64(d)],
        "var_total_unit": [np.float64(sv)],
        "participation_ratio": [np.float64(sv * sv)
                                / np.float64(sv2)],
        "max_over_mean": [np.float64(mx)
                          / (np.float64(sv) / np.float64(d))]})


@register("cosine_contrast", sql=f"""
    WITH m AS ({_EMB_UNPACK_SQL}),
    nr AS (SELECT vec_id, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nm
           FROM m GROUP BY vec_id),
    u AS (SELECT m.vec_id, m.label, m.i,
                 CAST(CASE WHEN CAST(m.c AS DOUBLE) / nr.nm >= 0
                      THEN floor(CAST(m.c AS DOUBLE) / nr.nm
                                 * 1000000.0 + 0.5)
                      ELSE -floor(-CAST(m.c AS DOUBLE) / nr.nm
                                  * 1000000.0 + 0.5)
                      END AS BIGINT) AS uc
          FROM m JOIN nr ON nr.vec_id = m.vec_id),
    gl AS (SELECT label, i, CAST(sum(uc) AS HUGEINT) AS su
           FROM u GROUP BY label, i),
    gn AS (SELECT label, CAST(count(DISTINCT vec_id) AS HUGEINT)
                   AS ng,
                 CAST(sum(CAST(uc AS HUGEINT) * uc) AS HUGEINT)
                   AS squ
           FROM u GROUP BY label),
    gs AS (SELECT gl.label,
                  CAST(sum(su * su) AS HUGEINT) AS s2g
           FROM gl GROUP BY gl.label),
    tot AS (SELECT i, CAST(sum(su) AS HUGEINT) AS st FROM gl
            GROUP BY i),
    tt AS (SELECT CAST(sum(st * st) AS HUGEINT) AS s2t FROM tot),
    agg AS (SELECT CAST(sum(gn.ng) AS HUGEINT) AS n,
                   CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(gn.squ) AS HUGEINT) AS squ_tot,
                   CAST(sum(gn.ng * gn.ng) AS HUGEINT) AS sn2,
                   CAST(sum(gs.s2g) AS HUGEINT) AS s2g_tot
            FROM gn JOIN gs ON gs.label = gn.label)
    SELECT CAST((SELECT n FROM agg) AS BIGINT) AS n_vecs,
           (SELECT k FROM agg) AS n_labels,
           CAST((SELECT s2g_tot FROM agg)
                - (SELECT squ_tot FROM agg) AS DOUBLE)
           / CAST((SELECT sn2 FROM agg) - (SELECT n FROM agg)
                  AS DOUBLE) / 1000000000000.0 AS within_mean_cos,
           CAST((SELECT s2t FROM tt)
                - (SELECT s2g_tot FROM agg) AS DOUBLE)
           / CAST((SELECT n FROM agg) * (SELECT n FROM agg)
                  - (SELECT sn2 FROM agg) AS DOUBLE)
           / 1000000000000.0 AS across_mean_cos,
           (CAST((SELECT s2g_tot FROM agg)
                 - (SELECT squ_tot FROM agg) AS DOUBLE)
            / CAST((SELECT sn2 FROM agg) - (SELECT n FROM agg)
                   AS DOUBLE)
            - CAST((SELECT s2t FROM tt)
                   - (SELECT s2g_tot FROM agg) AS DOUBLE)
              / CAST((SELECT n FROM agg) * (SELECT n FROM agg)
                     - (SELECT sn2 FROM agg) AS DOUBLE))
           / 1000000000000.0 AS contrast""")
def cosine_contrast(sf_dir: str):
    """WITHIN- vs ACROSS-LABEL COSINE CONTRAST of the embedding
    table: mean pairwise cosine inside each label minus the mean
    across labels, computed WITHOUT enumerating a single pair —
    sum-of-vector algebra turns both means into exact integer
    expressions (||sum u||^2 - sum ||u||^2 within; total minus
    within across) over micro-quantized NORMALIZED components. The
    contrastive-alignment metric that says whether labels are
    actually separated in embedding space (the aggregate companion
    of label_centroid_sim and the sanity gate for
    decontaminate_semantic). Normalization uses the exact integer
    component norms, so both engines quantize identical doubles.
    Scale plan: per-batch (label, dim) sum partials plus per-label
    norm cells — all dimension x label bounded, zero pair
    enumeration anywhere."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding", "label"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        nm = np.sqrt((c.astype(np.float64) ** 2).sum(axis=1))
        un = c.astype(np.float64) / nm[:, None] * 1000000.0
        u = np.copysign(np.floor(np.abs(un) + 0.5),
                        un).astype(np.int64)
        lab = b["label"].to_numpy(np.int64)
        rows = []
        for lb in np.unique(lab):
            m = lab == lb
            su = u[m].sum(axis=0)
            rows.append(pd.DataFrame({
                "label": np.full(_EMB_DIM, lb, np.int64),
                "i": np.arange(1, _EMB_DIM + 1, dtype=np.int64),
                "su": su,
                "ng": np.full(_EMB_DIM, 0, np.int64),
                "squ": np.zeros(_EMB_DIM, object)}))
            rows.append(pd.DataFrame({
                "label": [np.int64(lb)], "i": [np.int64(0)],
                "su": [np.int64(0)],
                "ng": [np.int64(int(m.sum()))],
                "squ": [int((u[m].astype(object)
                             * u[m].astype(object)).sum())]}))
        return pd.concat(rows, ignore_index=True)

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["label", "i"], ["su", "ng", "squ"], exact_int=True)
    dims = p[p["i"] > 0]
    meta = p[p["i"] == 0]
    ng = {int(r["label"]): int(r["ng"]) for _, r in meta.iterrows()}
    squ = {int(r["label"]): int(r["squ"])
           for _, r in meta.iterrows()}
    labels = sorted(ng)
    k = len(labels)
    n = sum(ng.values())
    s2g_tot = 0
    st = {}
    for lb in labels:
        sub = dims[dims["label"] == lb]
        for _, r in sub.iterrows():
            i, su = int(r["i"]), int(r["su"])
            st[i] = st.get(i, 0) + su
        s2g_tot += sum(int(v) * int(v) for v in sub["su"])
    s2t = sum(v * v for v in st.values())
    squ_tot = sum(squ.values())
    sn2 = sum(v * v for v in ng.values())
    within = np.float64(s2g_tot - squ_tot) \
        / np.float64(sn2 - n) / 1000000000000.0
    across = np.float64(s2t - s2g_tot) \
        / np.float64(n * n - sn2) / 1000000000000.0
    return pd.DataFrame({
        "n_vecs": [np.int64(n)], "n_labels": [np.int64(k)],
        "within_mean_cos": [np.float64(within)],
        "across_mean_cos": [np.float64(across)],
        "contrast": [np.float64(
            np.float64(s2g_tot - squ_tot) / np.float64(sn2 - n)
            - np.float64(s2t - s2g_tot)
            / np.float64(n * n - sn2)) / 1000000000000.0]})


@register("gamma_fit_lag", sql="""
    WITH s AS (SELECT user_id, ts, event_id,
                      lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev_ts
               FROM events),
    l AS (SELECT CAST(floor(CAST(epoch_us(ts) - epoch_us(prev_ts)
                                 AS DOUBLE) / 60000000.0)
                      AS BIGINT) AS gap
          FROM s WHERE prev_ts IS NOT NULL AND ts > prev_ts),
    m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(gap) AS HUGEINT) AS s,
                 CAST(sum(gap * gap) AS HUGEINT) AS s2
          FROM l),
    f AS (SELECT CAST(n AS BIGINT) AS n,
                 CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_,
                 (CAST(s2 AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
                   AS var_
          FROM m)
    SELECT n AS n_gaps, mean_ AS mean_gap_min,
           var_ AS var_gap_min,
           mean_ * mean_ / var_ AS gamma_k,
           var_ / mean_ AS gamma_theta
    FROM f""")
def gamma_fit_lag(sf_dir: str):
    """GAMMA METHOD-OF-MOMENTS fit of per-user inter-event gaps
    (whole minutes, strictly positive): shape k = m^2/v and scale
    theta = v/m — the right-skewed waiting-time model behind
    session-timeout tuning (sessionize's gap threshold) where
    interarrival_stats reports raw moments; k near 1 says
    memoryless exponential arrivals, k < 1 says bursts. Gaps floor
    to exact integer minutes inside the user-keyed exchange;
    moments are exact integer folds (python int / HUGEINT) and all
    outputs are shared float expressions. Scale plan: the lag runs
    INSIDE the one user_id exchange's sorted partitions
    (event_transitions' plan); partitions emit 3-cell moment
    partials."""
    from ._shared import _events
    from ...stages.partition import partitioned_apply
    from ...stages.window import segment_codes
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        codes = segment_codes(g["user_id"].to_numpy())
        us = g["ts"].astype("datetime64[us]").to_numpy() \
            .astype(np.int64)
        if len(us) < 2:
            return pd.DataFrame({
                "j": pd.Series(dtype=np.int64),
                "n": pd.Series(dtype=np.int64),
                "s": pd.Series(dtype=object),
                "s2": pd.Series(dtype=object)})
        same = codes[1:] == codes[:-1]
        gap_us = (us[1:] - us[:-1])[same]
        gap_us = gap_us[gap_us > 0]
        gap = np.floor(gap_us.astype(np.float64)
                       / 60000000.0).astype(np.int64)
        go = gap.astype(object)
        return pd.DataFrame({
            "j": np.zeros(1, np.int64),
            "n": np.array([len(gap)], np.int64),
            "s": [int(go.sum())], "s2": [int((go * go).sum())]})

    parts = partitioned_apply(ds, "user_id", fn, 16,
                              sort_cols=["user_id", "ts",
                                         "event_id"])
    s = _combine_partials(parts, ["j"], ["n", "s", "s2"],
                          exact_int=True)
    n = int(s["n"].iloc[0])
    sm, s2 = int(s["s"].iloc[0]), int(s["s2"].iloc[0])
    mean = np.float64(sm) / np.float64(n)
    var = (np.float64(s2)
           - np.float64(sm) * np.float64(sm) / np.float64(n)) \
        / np.float64(n)
    return pd.DataFrame({
        "n_gaps": [np.int64(n)], "mean_gap_min": [mean],
        "var_gap_min": [var], "gamma_k": [mean * mean / var],
        "gamma_theta": [var / mean]})
