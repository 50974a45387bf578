# round-5 session-5 additions, batch 93: leave-one-out 1-NN label
# accuracy over embeddings, and a Johnson-Lindenstrauss sign-sketch
# distortion audit.
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from ...functions.hashing import md5_id64_flat

_KNN_GRID = 1000.0
_JL_K = 8


@register("knn_loo_accuracy", sql="""
    WITH m AS (
      SELECT vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0
                        + 0.5) AS BIGINT) AS c
      FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
            FROM embeddings),
    dots AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             CAST(sum(a.c * b.c) AS BIGINT) AS dot
      FROM m a JOIN m b ON a.i = b.i AND a.vec_id <> b.vec_id
      GROUP BY 1, 2),
    r AS (SELECT ia, ib, row_number() OVER (
            PARTITION BY ia ORDER BY dot DESC, ib) AS rk
          FROM dots),
    top AS (SELECT ia, ib FROM r WHERE rk = 1),
    acc AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CASE WHEN la.label = lb.label
                            THEN 1 ELSE 0 END) AS BIGINT) AS hit
            FROM top
            JOIN lab la ON la.vec_id = top.ia
            JOIN lab lb ON lb.vec_id = top.ib)
    SELECT (SELECT n FROM acc) AS n_vectors,
           (SELECT hit FROM acc) AS n_correct,
           CAST((SELECT hit FROM acc) AS DOUBLE)
           / CAST((SELECT n FROM acc) AS DOUBLE)
             AS loo_accuracy""")
def knn_loo_accuracy(sf_dir: str):
    """LEAVE-ONE-OUT 1-NN LABEL ACCURACY over the embedding
    table: each vector's nearest OTHER vector under inner-product
    similarity (milli-quantized exact integer dots, (dot, id)
    tie-break) votes its label; the hit rate is the classic
    no-training-step ceiling estimate for how separable the label
    classes are in this geometry — the EVALUATION complement to
    mutual_nn (alignment pairs) and label_centroid_sim (centroid
    view): centroids can look separated while the 1-NN rule still
    fails on interleaved manifolds. Every dot product and argmax
    is exact integer arithmetic; accuracy is one division. Scale
    plan: the ann brute-force tier — per-batch dot blocks against
    the broadcast matrix, exact arg-top-1 per row (documented N^2
    tier; IVF/LSH is the scale path)."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding",
                                  "label"])
    df = ds.to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    emb = np.stack([np.asarray(e, np.float64)
                    for e in df["embedding"]])
    c = np.floor(emb * _KNN_GRID + 0.5).astype(np.int64)
    ids = df["vec_id"].to_numpy(np.int64)
    labels = df["label"].to_numpy(np.int64)
    n = len(df)
    hit = 0
    chunk = 256
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        dots = c[lo:hi] @ c.T  # int64: 64 * 1e6 per term
        for r in range(lo, hi):
            row = dots[r - lo].copy()
            row[r] = np.iinfo(np.int64).min
            best = row.max()
            cand = np.nonzero(row == best)[0]
            j = cand[np.argmin(ids[cand])]
            if labels[j] == labels[r]:
                hit += 1
    return pd.DataFrame({
        "n_vectors": [np.int64(n)],
        "n_correct": [np.int64(hit)],
        "loo_accuracy": [np.float64(hit) / np.float64(n)]})


@register("jl_distortion", sql="""
    WITH m AS (
      SELECT vec_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0
                        + 0.5) AS BIGINT) AS c
      FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
    sgn AS (SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                   CASE WHEN ('0x' || substr(md5(
                        CAST(i * 100 + j AS VARCHAR) || ':jl'),
                        1, 16))::UBIGINT % 2 = 0
                   THEN 1 ELSE -1 END AS s
            FROM generate_series(1, 64) a(i)
            CROSS JOIN generate_series(1, {k}) b(j)),
    proj AS (SELECT m.vec_id, sgn.j,
                    CAST(sum(m.c * sgn.s) AS BIGINT) AS p
             FROM m JOIN sgn ON sgn.i = m.i
             GROUP BY 1, 2),
    idx AS (SELECT vec_id,
                   row_number() OVER (ORDER BY vec_id) AS rn
            FROM embeddings),
    pairs AS (SELECT a.vec_id AS va, b.vec_id AS vb
              FROM idx a JOIN idx b ON b.rn = a.rn + 1),
    dlow AS (SELECT pairs.va, pairs.vb,
                    CAST(sum(CAST(pa.p - pb.p AS HUGEINT)
                             * (pa.p - pb.p)) AS HUGEINT) AS d2
             FROM pairs
             JOIN proj pa ON pa.vec_id = pairs.va
             JOIN proj pb ON pb.vec_id = pairs.vb
                         AND pb.j = pa.j
             GROUP BY 1, 2),
    dfull AS (SELECT pairs.va, pairs.vb,
                     CAST(sum(CAST(ma.c - mb.c AS HUGEINT)
                              * (ma.c - mb.c)) AS HUGEINT) AS d2
              FROM pairs
              JOIN m ma ON ma.vec_id = pairs.va
              JOIN m mb ON mb.vec_id = pairs.vb
                       AND mb.i = ma.i
              GROUP BY 1, 2),
    q AS (SELECT 64 * dlow.d2 * 1000000
                 // ({k} * dfull.d2) AS r
          FROM dlow JOIN dfull ON dfull.va = dlow.va
                              AND dfull.vb = dlow.vb
          WHERE dfull.d2 > 0)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(CAST(sum(r) AS HUGEINT) AS DOUBLE)
           / (1000000.0 * CAST(count(*) AS DOUBLE))
             AS mean_ratio,
           CAST(max(r) AS DOUBLE) / 1000000.0 AS max_ratio,
           CAST(min(r) AS DOUBLE) / 1000000.0 AS min_ratio
    FROM q""".format(k=_JL_K))
def jl_distortion(sf_dir: str):
    """JOHNSON-LINDENSTRAUSS SIGN-SKETCH DISTORTION AUDIT:
    project the 64-d embeddings to {k} dimensions with a
    deterministic md5-seeded +-1 matrix and measure, over
    consecutive vec_id pairs, the ratio of the (d/k)-rescaled
    sketch distance to the true squared distance — the
    before-you-deploy audit of how much a cheap random projection
    actually distorts THIS corpus's distances (the theory
    promises concentration near 1; min/max bound the damage for
    dedup or ann pre-filters). Signs come from the portable md5
    twin, projections and both distances are exact integers, and
    each pair's ratio uses exact floor division to micro units;
    mean/max/min fold exactly. Scale plan: the projection is a
    map-only pass against the broadcast sign matrix; pairs are
    adjacent ids, never N^2."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    df = ds.to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    emb = np.stack([np.asarray(e, np.float64)
                    for e in df["embedding"]])
    c = np.floor(emb * 1000000.0 + 0.5).astype(np.int64)
    ids = np.array([i * 100 + j for i in range(1, 65)
                    for j in range(1, _JL_K + 1)], np.int64)
    hi, _ = md5_id64_flat(ids, ":jl")
    s = np.where((hi & np.uint64(1)) == 0, 1, -1) \
        .astype(np.int64).reshape(64, _JL_K)
    proj = c @ s
    rows = []
    for a in range(len(df) - 1):
        dl = proj[a] - proj[a + 1]
        d2l = int((dl.astype(object) ** 2).sum())
        dfv = c[a] - c[a + 1]
        d2f = int((dfv.astype(object) ** 2).sum())
        if d2f > 0:
            rows.append(64 * d2l * 1000000 // (_JL_K * d2f))
    n = len(rows)
    return pd.DataFrame({
        "n_pairs": [np.int64(n)],
        "mean_ratio": [np.float64(sum(rows))
                       / (1000000.0 * np.float64(n))],
        "max_ratio": [np.float64(max(rows)) / 1000000.0],
        "min_ratio": [np.float64(min(rows)) / 1000000.0]})
