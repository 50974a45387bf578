# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (_COMBINE_MAX_ROWS, _combine_partials, _path, np, pd, rd, register)

_EMB_DIM = 64
#: component quantization scale: float32 components become exact
#: signed integer micro-units so every cross-engine sum is an integer
#: fold (summation-order-free), the doc_entropy/source_kl policy.
_EMB_MICRO = 1e6

#: the SQL long-format unpacking of the embedding list column shared
#: by the embedding oracles: one (vec_id, label, i, c) row per
#: component, c = half-away-quantized micro-units.
_EMB_UNPACK_SQL = """
      SELECT vec_id, CAST(label AS BIGINT) AS label, i,
             CAST(CASE WHEN embedding[i] >= 0
                  THEN floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
                  ELSE -floor(-CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
                  END AS BIGINT) AS c
      FROM embeddings CROSS JOIN generate_series(1, 64) g(i)"""


def _emb_micro(b_emb) -> np.ndarray:
    """(n, 64) int64 micro-unit matrix from the Arrow/pandas list
    column — float32 -> float64 is exact, then the shared half-away
    quantizer."""
    x = np.stack([np.asarray(v, np.float64) for v in b_emb])
    return np.copysign(np.floor(np.abs(x) * _EMB_MICRO + 0.5),
                       x).astype(np.int64)


@register("embedding_covariance", sql=f"""
    WITH m AS ({_EMB_UNPACK_SQL}),
    p AS (SELECT a.i AS i, b.i AS j,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(a.c) AS HUGEINT) AS si,
                 CAST(sum(b.c) AS HUGEINT) AS sj,
                 CAST(sum(a.c * b.c) AS HUGEINT) AS sij
          FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY a.i, b.i)
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CAST(n * sij - si * sj AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE) AS cov_micro2
    FROM p ORDER BY i, j""")
def embedding_covariance(sf_dir: str):
    """Distributed covariance matrix of the embedding table — the
    sufficient-statistics reduction behind PCA / whitening at corpus
    scale: each batch collapses to ONE d(d+1)/2-row partial (pair
    sums from a single int64 C^T C matmul plus per-dim sums), the
    combine is dimension-sized (2080 rows for d=64, independent of
    corpus rows), and the sample covariance composes from exact
    integer sums — no float fold-order sensitivity, no row-grain
    shuffle, no driver materialization of vectors."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["embedding"])
    iu, ju = np.triu_indices(_EMB_DIM)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        m = c.T @ c                      # (64, 64) exact int64
        s = c.sum(axis=0)
        return pd.DataFrame({
            "i": (iu + 1).astype(np.int64),
            "j": (ju + 1).astype(np.int64),
            "n": np.full(len(iu), len(b), np.int64),
            "si": s[iu], "sj": s[ju], "sij": m[iu, ju]})

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["i", "j"], ["n", "si", "sj", "sij"], exact_int=True)
    n = p["n"].astype(object)            # python ints: exact products
    si = p["si"].astype(object)
    sj = p["sj"].astype(object)
    sij = p["sij"].astype(object)
    cov = np.asarray([np.float64(int(a)) / np.float64(int(b_))
                      for a, b_ in zip(n * sij - si * sj,
                                       n * (n - 1))])
    out = pd.DataFrame({"i": p["i"].to_numpy(np.int64),
                        "j": p["j"].to_numpy(np.int64),
                        "cov_micro2": cov})
    return out.sort_values(["i", "j"],
                           kind="mergesort").reset_index(drop=True)


@register("embedding_quantize", sql=f"""
    WITH m AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings CROSS JOIN generate_series(1, 64) g(i)),
    b AS (SELECT i, CAST(min(x) AS DOUBLE) AS lo,
                 CAST(max(x) AS DOUBLE) AS hi
          FROM m GROUP BY i)
    SELECT vec_id, CAST(m.i AS BIGINT) AS i,
           CAST(CASE WHEN hi = lo THEN 0
                ELSE floor((x - lo) / (hi - lo) * 255.0 + 0.5)
                END AS BIGINT) AS code
    FROM m JOIN b ON m.i = b.i
    ORDER BY vec_id, m.i""")
def embedding_quantize(sf_dir: str):
    """Scalar (int8-style) quantization of the embedding table: each
    dimension rescaled to a 0..255 code against its corpus-wide
    min/max — the memory-4x compression step before a quantized ANN
    index. Per-batch per-dim min/max partials (d rows each) collapse
    to one dimension-sized combine; the bounds broadcast as two
    float arrays and encoding is one vectorized pass. Emitted in
    long (vec_id, dim, code) format so the oracle compares scalar
    cells."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def bounds(b: pd.DataFrame) -> pd.DataFrame:
        x = np.stack([np.asarray(v, np.float64)
                      for v in b["embedding"]])
        return pd.DataFrame({"i": np.arange(1, _EMB_DIM + 1,
                                            dtype=np.int64),
                             "lo": x.min(axis=0), "hi": x.max(axis=0)})

    parts = ds.map_batches(bounds, batch_format="pandas") \
        .limit(_COMBINE_MAX_ROWS + 1).to_pandas()
    if len(parts) > _COMBINE_MAX_ROWS:
        raise ValueError("embedding_quantize: bounds partials "
                         "exceed the combine guard")
    g = parts.groupby("i", as_index=False).agg(lo=("lo", "min"),
                                               hi=("hi", "max"))
    g = g.sort_values("i", kind="mergesort")
    lo = g["lo"].to_numpy(np.float64)
    hi = g["hi"].to_numpy(np.float64)

    def encode(b: pd.DataFrame) -> pd.DataFrame:
        x = np.stack([np.asarray(v, np.float64)
                      for v in b["embedding"]])
        span = hi - lo
        code = np.where(span == 0.0, 0,
                        np.floor((x - lo)
                                 / np.where(span == 0.0, 1.0, span)
                                 * 255.0 + 0.5)).astype(np.int64)
        n, d = code.shape
        return pd.DataFrame({
            "vec_id": np.repeat(b["vec_id"].to_numpy(np.int64), d),
            "i": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
            "code": code.reshape(-1)})

    out = ds.map_batches(encode, batch_format="pandas").to_pandas()
    return out.sort_values(["vec_id", "i"],
                           kind="mergesort").reset_index(drop=True)


@register("label_centroid_sim", sql=f"""
    WITH m AS ({_EMB_UNPACK_SQL}),
    s AS (SELECT label, i, CAST(sum(c) AS HUGEINT) AS s
          FROM m GROUP BY label, i),
    nrm AS (SELECT label, CAST(sum(s * s) AS HUGEINT) AS ss
            FROM s GROUP BY label),
    d AS (SELECT a.label AS label_a, b.label AS label_b,
                 CAST(sum(a.s * b.s) AS HUGEINT) AS dot
          FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
          GROUP BY a.label, b.label)
    SELECT label_a, label_b,
           CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.ss AS DOUBLE))
                * sqrt(CAST(nb.ss AS DOUBLE))) AS cosine
    FROM d JOIN nrm na ON na.label = d.label_a
           JOIN nrm nb ON nb.label = d.label_b
    ORDER BY label_a, label_b""")
def label_centroid_sim(sf_dir: str):
    """Pairwise cosine similarity between per-label embedding
    centroids — the class-confusability map a curriculum or
    clustering audit reads. Key exactness trick: cosine is
    scale-invariant, so the per-label mean's 1/n factor cancels and
    the whole computation runs on exact integer micro-unit SUMS
    (dot, ||.||² as int products summed) — the only floats are the
    final divide and sqrts, composed identically in both engines.
    Per-batch (label, dim) partials are label*d-sized; nothing
    row-grain leaves the scan."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["label", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        lab = b["label"].to_numpy(np.int64)
        f = pd.DataFrame({"label": np.repeat(lab, _EMB_DIM),
                          "i": np.tile(np.arange(1, _EMB_DIM + 1,
                                                 dtype=np.int64),
                                       len(lab)),
                          "s": c.reshape(-1)})
        return f.groupby(["label", "i"], as_index=False)["s"].sum()

    s = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["label", "i"], ["s"])
    labels = np.sort(s["label"].unique())
    mat = {int(l): s[s["label"] == l].sort_values("i")["s"]
           .to_numpy(np.int64) for l in labels}
    rows = []
    for ii, la in enumerate(labels):
        for lb in labels[ii + 1:]:
            va = [int(v) for v in mat[int(la)]]
            vb = [int(v) for v in mat[int(lb)]]
            dot = sum(a * b for a, b in zip(va, vb))
            ssa = sum(a * a for a in va)
            ssb = sum(b * b for b in vb)
            rows.append({
                "label_a": np.int64(la), "label_b": np.int64(lb),
                "cosine": np.float64(dot)
                / (np.sqrt(np.float64(ssa))
                   * np.sqrt(np.float64(ssb)))})
    return pd.DataFrame(rows)


def _pca_components(sf_dir: str, k: int = 2):
    """Top-k principal axes from the exact integer sufficient
    statistics (the embedding_covariance reduction, SAME long-format
    2080-row partial — a wide one-row frame was measured 2x slower
    through the combine), eigendecomposed on the driver (d x d is
    tiny). Signs are fixed deterministically: each component's
    largest-|.| coordinate is made positive."""
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["embedding"])
    iu, ju = np.triu_indices(_EMB_DIM)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        m = c.T @ c
        s = c.sum(axis=0)
        return pd.DataFrame({
            "i": (iu + 1).astype(np.int64),
            "j": (ju + 1).astype(np.int64),
            "n": np.full(len(iu), len(b), np.int64),
            "si": s[iu], "sj": s[ju], "sij": m[iu, ju]})

    p = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["i", "j"], ["n", "si", "sj", "sij"], exact_int=True)
    diag = p[p["i"] == p["j"]].sort_values("i")
    n = int(diag["n"].iloc[0])
    s = np.zeros(_EMB_DIM, np.float64)
    s[diag["i"].to_numpy(np.int64) - 1] = [
        np.float64(int(v)) for v in diag["si"]]
    cov = np.zeros((_EMB_DIM, _EMB_DIM), np.float64)
    ii = p["i"].to_numpy(np.int64) - 1
    jj = p["j"].to_numpy(np.int64) - 1
    vals = np.asarray(
        [np.float64(n * int(sij_) - int(si_) * int(sj_))
         / np.float64(n * (n - 1))
         for sij_, si_, sj_ in zip(p["sij"], p["si"], p["sj"])])
    cov[ii, jj] = vals
    cov[jj, ii] = vals
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :k].T          # (k, d), descending variance
    for r in range(k):
        a = comps[r]
        if a[np.argmax(np.abs(a))] < 0:
            comps[r] = -a
    return comps, s / np.float64(n)


@register("embedding_pca", sql="""
    SELECT vec_id, pc1, pc2
    FROM read_parquet('/root/repo/goldens/embedding_pca_sf0_01.parquet')
    ORDER BY vec_id""")
def embedding_pca(sf_dir: str):
    """PCA projection of the embedding table onto its top-2 principal
    axes — the dimensionality-reduction / visualization primitive.
    The covariance reduction is the embedding_covariance pipeline
    (dimension-sized partials, exact integer sums); eigh runs on the
    driver's 64x64 matrix; projection is one broadcast matmul pass.
    Eigendecomposition is not SQL-expressible, so the driver oracle is
    a STORED GOLDEN pinned to the driver's correctness scale (sf0.01):
    tools/gen_pca_golden.py recomputes the projection independently of
    this engine (DuckDB quantization + exact-int covariance SQL,
    numpy eigh, plain matmul) and the oracle reads the resulting
    parquet. Determinism / variance-ordering / sign-convention pytest
    coverage remains (test_embedding_ops)."""
    comps, mean = _pca_components(sf_dir, k=2)
    ds = rd.read_parquet(_path(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def project(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"]).astype(np.float64)
        y = (c - mean) @ comps.T
        return pd.DataFrame({
            "vec_id": b["vec_id"].to_numpy(np.int64),
            "pc1": y[:, 0], "pc2": y[:, 1]})

    out = ds.map_batches(project, batch_format="pandas").to_pandas()
    return out.sort_values("vec_id",
                           kind="mergesort").reset_index(drop=True)
