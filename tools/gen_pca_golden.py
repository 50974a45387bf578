"""Golden-frame generator for the ``embedding_pca`` oracle.

Eigendecomposition is not SQL-expressible, so the driver oracle for
``embedding_pca`` is a STORED GOLDEN: this script recomputes the
projection with an implementation INDEPENDENT of the Ray engine —
DuckDB does the micro-unit quantization and the exact-integer
covariance sufficient statistics in SQL, numpy.linalg.eigh runs on the
resulting 64x64 matrix, and the projection is one plain matmul — and
writes ``goldens/embedding_pca_sf0_01.parquet``. The registered oracle
SQL just reads that file, pinning the engine's output frame-exactly at
the driver's correctness scale (sf0.01).

Independence: no imports from nuclei_feature_extraction_ray; the only
shared library is numpy's eigh (there is no second eigensolver in this
container). Spec shared with the engine (documented, not imported):
micro-units = round-half-away(x * 1e6) as int64; covariance =
(n*sij - si*sj) / (n*(n-1)) from exact integer sums; top-2 components
with each component's largest-|.| coordinate made positive;
projection = (micro - mean) @ comps.T with mean = si/n.

Rerun after any intentional semantic change: python tools/gen_pca_golden.py
"""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = os.environ.get("PCA_GOLDEN_SF", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens",
    "embedding_pca_sf0_01.parquet")
D = 64
MICRO = 1_000_000

con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF}/embeddings.parquet')")

# micro-unit matrix (round half away from zero, exact in SQL on the
# float32->double values) and exact-integer sufficient statistics
m = con.execute(f"""
  WITH e AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * {MICRO}, 0)
                AS BIGINT) AS q
    FROM embeddings)
  SELECT vec_id, dim, q FROM e ORDER BY vec_id, dim""").df()
ids = m["vec_id"].to_numpy(np.int64)[::D]
M = m["q"].to_numpy(np.int64).reshape(-1, D)
n = M.shape[0]

# covariance from exact python-int sums (no float accumulation)
si = [int(v) for v in M.sum(axis=0, dtype=object)]
cov = np.empty((D, D), np.float64)
Mo = M.astype(object)
S = Mo.T @ Mo          # object matmul -> exact python ints
for i in range(D):
    for j in range(D):
        cov[i, j] = float(n * int(S[i, j]) - si[i] * si[j]) \
            / float(n * (n - 1))

w, v = np.linalg.eigh(cov)
comps = v[:, ::-1][:, :2].T
for r in range(2):
    if comps[r][np.argmax(np.abs(comps[r]))] < 0:
        comps[r] = -comps[r]
mean = np.asarray([float(x) / n for x in si])
y = (M.astype(np.float64) - mean) @ comps.T

os.makedirs(os.path.dirname(OUT), exist_ok=True)
pq.write_table(pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "pc1": pa.array(y[:, 0], pa.float64()),
    "pc2": pa.array(y[:, 1], pa.float64())}), OUT)
print("wrote", OUT, n, "rows")
