# round-5 session-5 additions, batch 92: top eigenvalue of the
# embedding second-moment matrix by quantized power iteration, and
# the participation ratio (effective dimensionality).
from __future__ import annotations

from ._shared import (_combine_partials, _events, _path, np, pd, rd,
                      register)
from .q13_embedding_table_operators import _EMB_UNPACK_SQL, _emb_micro

_PI_ITERS = 3


def _emb_ds(sf_dir: str):
    return rd.read_parquet(_path(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"])


@register("top_eigenvalue", sql="""
    WITH e AS (""" + _EMB_UNPACK_SQL + """),
    t AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n
          FROM e),
    v0 AS (SELECT CAST(g.i AS BIGINT) AS i,
                  CAST(1000000 AS HUGEINT) AS val
           FROM generate_series(1, 64) g(i)),
    s1 AS (SELECT e.vec_id,
                  CAST(sum(CAST(e.c AS HUGEINT) * v0.val)
                       AS HUGEINT) AS s
           FROM e JOIN v0 ON v0.i = e.i GROUP BY e.vec_id),
    w1 AS (SELECT e.i,
                  CAST(sum(CAST(e.c AS HUGEINT) * s1.s)
                       AS HUGEINT) AS w
           FROM e JOIN s1 ON s1.vec_id = e.vec_id GROUP BY e.i),
    m1 AS (SELECT max(abs(w)) AS mx FROM w1),
    v1 AS (SELECT i,
                  CASE WHEN w >= 0
                  THEN w * 1000000 // (SELECT mx FROM m1)
                  ELSE -((-w) * 1000000 // (SELECT mx FROM m1))
                  END AS val
           FROM w1),
    s2 AS (SELECT e.vec_id,
                  CAST(sum(CAST(e.c AS HUGEINT) * v1.val)
                       AS HUGEINT) AS s
           FROM e JOIN v1 ON v1.i = e.i GROUP BY e.vec_id),
    w2 AS (SELECT e.i,
                  CAST(sum(CAST(e.c AS HUGEINT) * s2.s)
                       AS HUGEINT) AS w
           FROM e JOIN s2 ON s2.vec_id = e.vec_id GROUP BY e.i),
    m2 AS (SELECT max(abs(w)) AS mx FROM w2),
    v2 AS (SELECT i,
                  CASE WHEN w >= 0
                  THEN w * 1000000 // (SELECT mx FROM m2)
                  ELSE -((-w) * 1000000 // (SELECT mx FROM m2))
                  END AS val
           FROM w2),
    s3 AS (SELECT e.vec_id,
                  CAST(sum(CAST(e.c AS HUGEINT) * v2.val)
                       AS HUGEINT) AS s
           FROM e JOIN v2 ON v2.i = e.i GROUP BY e.vec_id),
    w3 AS (SELECT e.i,
                  CAST(sum(CAST(e.c AS HUGEINT) * s3.s)
                       AS HUGEINT) AS w
           FROM e JOIN s3 ON s3.vec_id = e.vec_id GROUP BY e.i),
    m3 AS (SELECT max(abs(w)) AS mx FROM w3),
    v3 AS (SELECT i,
                  CASE WHEN w >= 0
                  THEN w * 1000000 // (SELECT mx FROM m3)
                  ELSE -((-w) * 1000000 // (SELECT mx FROM m3))
                  END AS val
           FROM w3),
    sf AS (SELECT e.vec_id,
                  CAST(sum(CAST(e.c AS HUGEINT) * v3.val)
                       AS HUGEINT) AS s
           FROM e JOIN v3 ON v3.i = e.i GROUP BY e.vec_id),
    ray AS (SELECT
        (SELECT CAST(sum(s * s) AS HUGEINT) FROM sf) AS vmv,
        (SELECT CAST(sum(val * val) AS HUGEINT) FROM v3) AS vv)
    SELECT (SELECT n FROM t) AS n_vectors,
           (CAST((SELECT vmv FROM ray) AS DOUBLE)
            / CAST((SELECT vv FROM ray) AS DOUBLE))
           / (CAST((SELECT n FROM t) AS DOUBLE)
              * 1000000000000.0) AS top_eigenvalue""")
def top_eigenvalue(sf_dir: str):
    """TOP EIGENVALUE of the embedding second-moment matrix by
    THREE quantized power iterations: each iteration is the
    factored mat-vec w_i = sum_r c_ri * (x_r . v) — two
    aggregation passes over the unpacked table, never
    materializing the 64x64 Gram — followed by sign-magnitude
    re-quantization v' = sign(w) * (|w|*1e6 // max|w|), so the
    iterate is EXACT integers at every step and bit-identical
    across engines; the Rayleigh quotient v'Mv/v'v (exact big
    ints) reports the dominant variance direction's strength in
    raw embedding units — the spectral headline that
    isotropy_score and participation_ratio summarize from below.
    Scale plan: the per-iteration passes are map_batches partials
    against the BROADCAST 64-vector (ray.put semantics), one
    64-cell combine each — no N x d^2 blowup at any scale."""
    ds = _emb_ds(sf_dir).materialize()
    v = [1000000] * 64
    n_vec = None
    for it in range(_PI_ITERS + 1):
        varr = np.array(v, np.int64)

        def partial(b: pd.DataFrame, varr=varr,
                    last=(it == _PI_ITERS)) -> pd.DataFrame:
            c = _emb_micro(b["embedding"])
            s = c @ varr  # per-row dot, <= 64*1e6*1e6 ~ 6e13
            if last:
                return pd.DataFrame({
                    "i": np.arange(1, 3, dtype=np.int64),
                    "w": [int((s.astype(object) ** 2).sum()),
                          int(len(b))]})
            w = (c.T.astype(object) @ s.astype(object))
            return pd.DataFrame({
                "i": np.arange(1, 65, dtype=np.int64),
                "w": [int(x) for x in w]})

        out = _combine_partials(
            ds.map_batches(partial, batch_format="pandas"),
            ["i"], ["w"], exact_int=True).sort_values("i")
        ws = [int(x) for x in out["w"]]
        if it == _PI_ITERS:
            vmv, n_vec = ws[0], ws[1]
            break
        mx = max(abs(x) for x in ws)
        v = [(x * 1000000 // mx) if x >= 0
             else -((-x) * 1000000 // mx) for x in ws]
    vv = sum(x * x for x in v)
    lam = (np.float64(vmv) / np.float64(vv)) \
        / (np.float64(n_vec) * 1.0e12)
    return pd.DataFrame({
        "n_vectors": [np.int64(n_vec)],
        "top_eigenvalue": [np.float64(lam)]})


@register("participation_ratio", sql="""
    WITH e AS (""" + _EMB_UNPACK_SQL + """),
    t AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n
          FROM e),
    m AS (SELECT a.i AS i, b.i AS j,
                 CAST(sum(CAST(a.c AS HUGEINT) * b.c)
                      AS HUGEINT) AS v
          FROM e a JOIN e b ON a.vec_id = b.vec_id
          GROUP BY a.i, b.i),
    tr AS (SELECT
        (SELECT CAST(sum(v) AS HUGEINT) FROM m WHERE i = j)
          AS tr1,
        (SELECT CAST(sum(v * v) AS HUGEINT) FROM m) AS tr2)
    SELECT (SELECT n FROM t) AS n_vectors,
           (CAST((SELECT tr1 FROM tr) AS DOUBLE)
            * CAST((SELECT tr1 FROM tr) AS DOUBLE))
           / CAST((SELECT tr2 FROM tr) AS DOUBLE)
             AS participation_ratio""")
def participation_ratio(sf_dir: str):
    """PARTICIPATION RATIO (effective dimensionality) of the
    embedding cloud: PR = (tr M)^2 / tr(M^2) = (sum lambda)^2 /
    sum lambda^2 over the second-moment spectrum — 64 when
    variance spreads evenly, 1 when one direction dominates; the
    spectrum-free effective-rank number (via the trace identities,
    NO eigendecomposition) that calibrates how much
    top_eigenvalue's leading direction actually owns and whether
    ann recall targets are realistic (hubness explodes as PR
    drops). The 64x64 second-moment matrix folds as exact big
    ints (per-batch integer Gram products), and both traces are
    exact; PR is one shared float expression. Scale plan:
    map_batches emits 4096-cell integer Gram partials — O(d^2)
    state, one bounded combine, no pairwise N^2 anywhere."""
    ds = _emb_ds(sf_dir)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _emb_micro(b["embedding"])
        g = c.T @ c  # int64-safe: |c|<=1e6 -> products 1e12 * rows
        ii, jj = np.meshgrid(np.arange(1, 65, dtype=np.int64),
                             np.arange(1, 65, dtype=np.int64),
                             indexing="ij")
        return pd.DataFrame({
            "i": ii.ravel(), "j": jj.ravel(),
            "v": [int(x) for x in g.ravel()],
            "n": np.concatenate([[np.int64(len(b))],
                                 np.zeros(4095, np.int64)])})

    m = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["i", "j"], ["v", "n"], exact_int=True)
    n_vec = int(sum(int(x) for x in m["n"]))
    tr1 = sum(int(r["v"]) for _, r in m.iterrows()
              if int(r["i"]) == int(r["j"]))
    tr2 = sum(int(r["v"]) ** 2 for _, r in m.iterrows())
    return pd.DataFrame({
        "n_vectors": [np.int64(n_vec)],
        "participation_ratio": [(np.float64(tr1)
                                 * np.float64(tr1))
                                / np.float64(tr2)]})
