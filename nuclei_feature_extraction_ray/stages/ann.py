"""Similarity search over an embedding column (``list<float>``).

* ``ann_bruteforce``: exact cosine top-k — the query matrix is
  broadcast ONCE via ``ray.put`` and every ``map_batches`` task does a
  numpy matmul against its block, emitting only per-block top-k
  partials; a final tiny combine keeps the global top-k. Shuffle-free;
  scales linearly in corpus size.
* ``ann_lsh``: random-hyperplane LSH variant — corpus rows are bucketed
  by sign-pattern; only buckets matching a query's pattern (within one
  flipped bit) are scanned. The scale path when the corpus is too big
  for full scans.
* ``embedding_near_dup``: exact all-pairs cosine >= threshold via a
  DISTRIBUTED blocked self-join: the corpus is packed into normalized
  matrix blocks held in the object store, and one Ray-Data task per
  block pair (i <= j) does the C matmul — the driver holds only block
  refs, never the matrix. Exact-tier work is inherently O(n^2/blocks)
  flops (so is the quadratic SQL oracle); for approximate near-dup at
  corpus scale with high thresholds, the banded-LSH shape of
  ``ann_lsh`` / ``dedup.minhash_lsh_pairs`` is the documented path.

No analog in the reference (nearest-centroid lookups there are spatial
patch reads); this is a first-class training-data op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..util import pool_size


def _stack(emb_chunk) -> np.ndarray:
    """(n, d) float64 from an Arrow list column — zero-copy through the
    flat values buffer for fixed-size or uniform-length lists (the
    embedding case); no ``to_pylist`` round-trip."""
    arr = emb_chunk.combine_chunks() if isinstance(
        emb_chunk, pa.ChunkedArray) else emb_chunk
    if isinstance(arr, pa.FixedSizeListArray) and arr.null_count == 0:
        # .values is the UNSLICED child buffer: apply the slice offset
        # explicitly (a sliced/offset FixedSizeListArray otherwise
        # yields the wrong rows). Null entries fall through to the
        # generic path below.
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        start = arr.offset * d
        return flat[start:start + len(arr) * d] \
            .reshape(len(arr), d).astype(np.float64)
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)):
        off = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(off)
        if len(widths) and (widths == widths[0]).all():
            flat = arr.values.to_numpy(zero_copy_only=False)
            d = int(widths[0])
            return flat[off[0]:off[-1]].reshape(len(arr), d) \
                .astype(np.float64)
    rows = arr.to_pylist()
    d = next((len(r) for r in rows if r is not None), 0)
    zero = np.zeros(d, np.float64)
    # null embeddings -> zero vectors: norm 0 is preserved by
    # _norm_rows, so they match nothing (cosine 0 to everything)
    return np.vstack([zero if r is None else np.asarray(r, np.float64)
                      for r in rows]) if rows \
        else np.empty((0, d), np.float64)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_matrix(ds, emb_col: str, id_col: str,
                  query_ids: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Gather the (tiny) query rows with a vectorized Arrow filter over
    the corpus — no per-row Python predicate; only the handful of
    matching query rows ever reach the driver."""
    qset = pa.array(sorted(int(q) for q in query_ids), pa.int64())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=qset))

    # take_all is safe here by construction: the Arrow filter ran
    # distributed and only the <= len(query_ids) matching rows survive
    # it — do NOT copy this pattern for unbounded results.
    rows = ds.select_columns([id_col, emb_col]) \
             .map_batches(keep, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r[id_col]))
    qids = np.asarray([int(r[id_col]) for r in rows])
    qmat = _norm_rows(np.asarray([r[emb_col] for r in rows], np.float64))
    return qids, qmat


def _topk_reduce(partials_ds, k: int):
    """Combiner stage between per-block partials and the driver: each
    combine call folds up to 64k partial rows down to Q*(k+1), so the
    driver frame is bounded by blocks/64k regardless of corpus size."""
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["query_id", "score", "neighbor_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        return g.groupby("query_id", sort=False).head(k + 1)

    return partials_ds.map_batches(combine, batch_format="pandas",
                                   batch_size=65536).to_pandas()


def _topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    partials = partials[partials["query_id"] != partials["neighbor_id"]]
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True], kind="mergesort")
    top = partials.groupby("query_id", sort=True).head(k).reset_index(
        drop=True)
    top["rank"] = top.groupby("query_id", sort=False).cumcount() + 1
    top["rank"] = top["rank"].astype(np.int64)
    top["score"] = top["score"].round(6)
    return top[["query_id", "neighbor_id", "rank", "score"]]


def ann_bruteforce(ds, emb_col: str, id_col: str,
                   query_ids: list[int], k: int = 5) -> pd.DataFrame:
    """Exact cosine top-k for each query id (queries drawn from the
    dataset itself; self-matches excluded). Returns a small pandas
    frame (query_id, neighbor_id, rank, score) — top-k results are
    driver-sized by construction."""
    qids, qmat = _query_matrix(ds, emb_col, id_col, query_ids)
    qref = ray.put((qids, qmat))

    class BlockTopK:
        """Per-block partial top-k vs the broadcast query matrix."""

        def __init__(self):
            self.qids, self.qmat = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mat = _norm_rows(_stack(batch[emb_col]))
            sims = self.qmat @ mat.T                    # (Q, B)
            out_q, out_n, out_s = [], [], []
            kk = min(k + 1, sims.shape[1])              # +1 covers self
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            for qi in range(len(self.qids)):
                cand = part[qi]
                out_q.append(np.full(len(cand), self.qids[qi]))
                out_n.append(ids[cand])
                out_s.append(sims[qi, cand])
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "score": pa.array(np.concatenate(out_s)),
            })

    partials = _topk_reduce(
        ds.select_columns([id_col, emb_col]).map_batches(
            BlockTopK, batch_format="pyarrow", concurrency=pool_size(),
            batch_size=4096), k)
    return _topk(partials, k)


def ann_lsh(ds, emb_col: str, id_col: str, query_ids: list[int],
            k: int = 5, n_planes: int = 8, seed: int = 11) -> pd.DataFrame:
    """Random-hyperplane LSH ANN: bucket = sign pattern of ``n_planes``
    fixed random projections; scan only buckets at hamming distance <= 1
    from each query's bucket. Approximate — recall measured in tests
    against ``ann_bruteforce``."""
    qids, qmat = _query_matrix(ds, emb_col, id_col, query_ids)
    dim = qmat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qsig = ((qmat @ planes.T) > 0).astype(np.uint8)
    qbuck = np.packbits(qsig, axis=1, bitorder="little")[:, 0]
    # Expand each query bucket to its hamming<=1 neighborhood.
    wanted: set[int] = set()
    for b in qbuck:
        wanted.add(int(b))
        for bit in range(n_planes):
            wanted.add(int(b) ^ (1 << bit))
    ctx = ray.put((qids, qmat, planes,
                   np.asarray(sorted(wanted), np.int64)))

    class BucketScan:
        def __init__(self):
            self.qids, self.qmat, self.planes, w = ray.get(ctx)
            self.wanted = w                       # sorted int64 array

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mat = _norm_rows(_stack(batch[emb_col]))
            sig = ((mat @ self.planes.T) > 0).astype(np.uint8)
            buck = np.packbits(sig, axis=1, bitorder="little")[:, 0] \
                .astype(np.int64)
            pos = np.searchsorted(self.wanted, buck)
            pos = np.clip(pos, 0, len(self.wanted) - 1)
            mask = self.wanted[pos] == buck       # vectorized membership
            ids, mat = ids[mask], mat[mask]
            if len(ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            sims = self.qmat @ mat.T
            q = np.repeat(self.qids, len(ids))
            n = np.tile(ids, len(self.qids))
            return pa.table({"query_id": pa.array(q),
                             "neighbor_id": pa.array(n),
                             "score": pa.array(sims.reshape(-1))})

    partials = _topk_reduce(
        ds.select_columns([id_col, emb_col]).map_batches(
            BucketScan, batch_format="pyarrow", concurrency=pool_size(),
            batch_size=4096), k)
    return _topk(partials, k)


def _pair_of_index(t: np.ndarray, n_blocks: int
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Invert the row-major enumeration of block pairs (i <= j): linear
    index t in [0, B*(B+1)/2) -> (i, j). Pure arithmetic inside the
    task, so the DRIVER never materializes the O(B^2) pair list (at
    10^9 rows / 2048-row blocks that list alone would kill the driver
    long before any matmul ran). The float sqrt seed is corrected with
    exact integer bounds, so the mapping is right for any B."""
    B = np.int64(n_blocks)
    off = lambda i: i * (2 * B - i + 1) // 2          # first index of row i
    s = float(2 * B + 1)
    i = np.floor((s - np.sqrt(s * s - 8.0 * t.astype(np.float64))) / 2.0) \
        .astype(np.int64)
    i = np.clip(i, 0, B - 1)
    # two exact correction passes absorb any float rounding drift
    for _ in range(2):
        i = np.where(off(i + 1) <= t, i + 1, i)
        i = np.where(off(i) > t, i - 1, i)
    j = i + (t - off(i))
    return i, j


def embedding_near_dup(ds, emb_col: str, id_col: str,
                       threshold: float,
                       block_size: int = 2048) -> pd.DataFrame:
    """Cosine near-duplicate pairs (a < b, cos >= threshold), EXACT,
    distributed: corpus -> normalized matrix blocks in the object
    store -> one task per block pair (i <= j) does the matmul. The
    driver only ever holds block REFS and the final pair rows; a dot
    product between two vectors is blocking-invariant, so results are
    bit-identical to a monolithic matmul (and to the SQL oracle)
    regardless of row order: off-diagonal pairs are emitted normalized
    (min(id), max(id)) so the result does not depend on ids being
    monotone with dataset order.

    Exact-tier flops are inherently quadratic (like the SQL oracle);
    for approximate near-dup at corpus scale use the banded-LSH shape
    of ``ann_lsh`` / ``dedup.minhash_lsh_pairs``."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _norm_rows(_stack(batch[emb_col]))
        return pa.table({
            "ids": pa.array([ids.tobytes()], pa.binary()),
            "mat": pa.array([mat.tobytes()], pa.binary()),
            "d": pa.array([mat.shape[1]], pa.int64()),
        })

    blocks = ds.select_columns([id_col, emb_col]).map_batches(
        pack, batch_format="pyarrow", batch_size=block_size).materialize()
    refs = [r for bundle in blocks.iter_internal_ref_bundles()
            for r in bundle.block_refs]
    if not refs:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64),
                             "cosine": pd.Series(dtype=np.float64)})

    import ray.data as rd
    B = len(refs)
    n_pairs = B * (B + 1) // 2
    # Streamed pair indices: rd.range is lazy (no driver-side list);
    # block count is capped so range metadata stays driver-sized even
    # when n_pairs explodes, while batch_size keeps per-call work and
    # the per-actor block cache bounded.
    pairs = rd.range(n_pairs, override_num_blocks=max(
        1, min((n_pairs + 3) // 4, pool_size() * 64)))

    class PairBlock:
        def __init__(self, refs):
            self.refs = refs
            self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        def _load(self, k: int):
            if k not in self.cache:
                t = ray.get(self.refs[k])
                if isinstance(t, pd.DataFrame):
                    t = pa.Table.from_pandas(t)
                d = t["d"][0].as_py()
                ids = np.concatenate(
                    [np.frombuffer(b, np.int64)
                     for b in t["ids"].to_pylist()])
                mat = np.vstack(
                    [np.frombuffer(b, np.float64).reshape(-1, d)
                     for b in t["mat"].to_pylist()])
                if len(self.cache) >= 8:     # bounded per-actor cache
                    self.cache.pop(next(iter(self.cache)))
                self.cache[k] = (ids, mat)
            return self.cache[k]

        def __call__(self, batch: pa.Table) -> pa.Table:
            t = batch["id"].to_numpy(zero_copy_only=False)
            bis, bjs = _pair_of_index(t, B)
            out_a, out_b, out_c = [], [], []
            for i, j in zip(bis, bjs):
                ids_i, mat_i = self._load(int(i))
                ids_j, mat_j = self._load(int(j))
                sims = mat_i @ mat_j.T
                bi, bj = np.nonzero(sims >= threshold)
                if i == j:
                    a, b = ids_i[bi], ids_j[bj]
                    keep = a < b
                else:
                    # normalize orientation: the smaller id may live in
                    # either block (ids need not be monotone with order)
                    a = np.minimum(ids_i[bi], ids_j[bj])
                    b = np.maximum(ids_i[bi], ids_j[bj])
                    keep = a != b
                out_a.append(a[keep])
                out_b.append(b[keep])
                out_c.append(np.round(sims[bi, bj][keep], 6))
            cat = lambda xs, t_: (np.concatenate(xs) if xs
                                  else np.empty(0, t_))
            return pa.table({
                "a": pa.array(cat(out_a, np.int64)),
                "b": pa.array(cat(out_b, np.int64)),
                "cosine": pa.array(cat(out_c, np.float64)),
            })

    return pairs.map_batches(
        PairBlock, batch_format="pyarrow", concurrency=pool_size(),
        batch_size=4, fn_constructor_kwargs={"refs": refs}).to_pandas()


def embedding_near_dup_lsh(ds, emb_col: str, id_col: str,
                           threshold: float, n_planes: int = 12,
                           n_tables: int = 6, seed: int = 17,
                           num_partitions: int = 16,
                           max_bucket: int = 4096):
    """APPROXIMATE cosine near-dup pairs — the documented scale tier
    of ``embedding_near_dup``: random-hyperplane bucketing (``n_tables``
    independent tables of ``n_planes`` signed projections) generates
    candidates, and only in-bucket pairs get an exact cosine verify,
    so the flops are sum-of-bucket-squares instead of corpus-squared.
    Found pairs carry EXACT cosines (verified like the exact tier);
    recall is probabilistic (misses pairs that collide in no table —
    measured against the exact tier in tests). Returns a Dataset of
    (a, b, cosine), a < b.

    Shuffle shape: one hash exchange on bucket carrying (table,
    bucket, id, d*8-byte vector) x n_tables, then one on (a, b) to
    dedup cross-table candidates. ``max_bucket`` drops degenerate
    buckets (the hot-shingle guard of jaccard_pairs) — a bucket of the
    whole corpus would re-quadratize the verify."""
    import ray.data as rd  # noqa: F401  (parity with exact tier imports)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = _norm_rows(_stack(batch[emb_col]))
        if mat.size == 0:
            return pa.table({
                "table_id": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "doc": pa.array([], pa.int64()),
                "vec": pa.array([], pa.binary())})
        d = mat.shape[1]
        # planes derived deterministically from (seed, d): every batch
        # regenerates the same projections — nothing is broadcast
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, n_planes, d))
        vec_bytes = [r.tobytes() for r in mat]
        t_out, b_out, d_out, v_out = [], [], [], []
        for t in range(n_tables):
            bits = (mat @ planes[t].T > 0).astype(np.uint8)
            buck = np.packbits(
                bits, axis=1, bitorder="little").astype(np.int64)
            key = buck[:, 0]
            for col in range(1, buck.shape[1]):
                key = key * 256 + buck[:, col]
            t_out.append(np.full(len(ids), t, np.int64))
            b_out.append(key)
            d_out.append(ids)
            v_out.extend(vec_bytes)
        return pa.table({
            "table_id": pa.array(np.concatenate(t_out)),
            "bucket": pa.array(np.concatenate(b_out)),
            "doc": pa.array(np.concatenate(d_out)),
            "vec": pa.array(v_out, pa.binary()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["table_id", "bucket", "doc"],
                          kind="mergesort")
        g = g.drop_duplicates(["table_id", "bucket", "doc"])
        tb = (g["table_id"].to_numpy() << np.int64(56)) \
            ^ g["bucket"].to_numpy()
        docs = g["doc"].to_numpy()
        vecs = g["vec"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        mat = np.frombuffer(b"".join(vecs), np.float64).reshape(n, -1)
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = tb[1:] != tb[:-1]
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], n)
        out_a, out_b, out_c = [], [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2 or m > max_bucket:
                continue
            i, j = np.triu_indices(m, k=1)
            sims = np.einsum("ij,ij->i", mat[st + i], mat[st + j])
            keep = sims >= threshold
            a = docs[st + i[keep]]
            b = docs[st + j[keep]]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_c.append(np.round(sims[keep], 6))
        cat = lambda xs, t: (np.concatenate(xs) if xs
                             else np.empty(0, t))
        return pd.DataFrame({"a": cat(out_a, np.int64),
                             "b": cat(out_b, np.int64),
                             "cosine": cat(out_c, np.float64)})

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b", "cosine"]]

    from .partition import partition_map
    rows = ds.select_columns([id_col, emb_col]).map_batches(
        bucketize, batch_format="pyarrow", batch_size=4096)
    cand = partition_map(rows, ["bucket"], bucket_pairs, num_partitions)
    return partition_map(cand, ["a", "b"], uniq, num_partitions)


def _train_centroids(ds, emb_col: str, id_col: str, n_cells: int,
                     sample_size: int, kmeans_iters: int,
                     seed: int) -> np.ndarray:
    """Spherical k-means centroids trained on a bounded driver-side
    sample (normalized rows, mean-renormalized updates); deterministic
    under the fixed seed.  The sample is SORTED by id before training:
    block arrival order is not stable across executions, and k-means
    init + update order depend on row order — without the sort, two
    runs of the same query could emit different (equally valid) cell
    labelings."""
    sample = ds.select_columns([id_col, emb_col]).limit(sample_size)
    tabs = [pa.concat_tables([ray.get(r)])
            for r in sample.to_arrow_refs()]
    tabs = [t for t in tabs if t.num_rows]
    tab = pa.concat_tables(tabs)
    order = np.argsort(tab[id_col].to_numpy(zero_copy_only=False),
                       kind="stable")
    smat = _norm_rows(_stack(tab[emb_col])[order])
    rng = np.random.default_rng(seed)
    cents = smat[rng.choice(len(smat), size=min(n_cells, len(smat)),
                            replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(smat @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = smat[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def semantic_dedup(ds, emb_col: str, id_col: str, threshold: float,
                   n_cells: int = 16, sample_size: int = 2048,
                   kmeans_iters: int = 10, seed: int = 23,
                   num_partitions: int = 16, max_cell: int = 100_000):
    """SemDeDup-style semantic dedup: spherical-k-means cluster the
    embeddings, then within each cluster drop every row that has a
    lower-id neighbor at cosine >= ``threshold`` (greedy keep-min-id —
    deterministic, retry-idempotent).

    Scale shape: centroids train on a bounded sample and broadcast
    with the assignment map; the ONE exchange is keyed on cell id and
    carries (cell, id, packed unit vector) rows; the in-cell pass is a
    single X @ X.T per cell. In-cell work is quadratic in CELL size,
    not corpus size — flops ~ n^2/n_cells for balanced cells; size
    ``n_cells`` so cells stay under ``max_cell`` (guarded: an
    over-large cell raises rather than OOMing a worker). Approximate
    by construction: near-dup pairs straddling a cell boundary are
    missed — the recall/threshold trade is measured in pytest against
    the exact pair tier.

    Returns (id, cell, keep) for every input row.
    """
    from .partition import partition_map

    cents = _train_centroids(ds, emb_col, id_col, n_cells,
                             sample_size, kmeans_iters, seed)
    cref = ray.put(cents)

    class Assign:
        def __init__(self):
            self.cents = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mat = _norm_rows(_stack(batch[emb_col]))
            cell = np.argmax(mat @ self.cents.T, axis=1)
            d = mat.shape[1]
            return pa.table({
                "id": pa.array(ids.astype(np.int64)),
                "cell": pa.array(cell.astype(np.int64)),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.float64()), d)})

    assigned = ds.select_columns([id_col, emb_col]).map_batches(
        Assign, batch_format="pyarrow", concurrency=pool_size(),
        batch_size=4096)

    def cell_prune(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cell, grp in g.groupby("cell", sort=False):
            if len(grp) > max_cell:
                raise ValueError(
                    "semantic_dedup: cell %d has %d rows > max_cell=%d;"
                    " raise n_cells" % (cell, len(grp), max_cell))
            grp = grp.sort_values("id", kind="mergesort")
            mat = np.vstack([np.asarray(v, np.float64)
                             for v in grp["vec"]])
            sims = mat @ mat.T
            # drop row j if any i < j has cos >= threshold
            dup = (np.triu(sims >= threshold, k=1)).any(axis=0)
            out.append(pd.DataFrame({
                "id": grp["id"].to_numpy(np.int64),
                "cell": grp["cell"].to_numpy(np.int64),
                "keep": ~dup}))
        if not out:
            return pd.DataFrame({
                "id": pd.Series(dtype=np.int64),
                "cell": pd.Series(dtype=np.int64),
                "keep": pd.Series(dtype=bool)})
        return pd.concat(out, ignore_index=True)

    return partition_map(assigned, ["cell"], cell_prune,
                         num_partitions)


def ann_ivf(ds, emb_col: str, id_col: str, query_ids: list[int],
            k: int = 5, n_cells: int = 16, n_probe_cells: int = 4,
            sample_size: int = 2048, kmeans_iters: int = 10,
            seed: int = 23) -> pd.DataFrame:
    """IVF (inverted-file) ANN — the classic coarse-quantizer scale
    path: k-means centroids are trained on a SAMPLE (driver-side,
    bounded), every corpus block assigns its rows to the nearest
    centroid with one matmul, and only rows in each query's
    ``n_probe_cells`` nearest cells are scored. Deterministic under
    the fixed seed. Approximate — recall measured in tests against
    ``ann_bruteforce``; scan fraction ~ n_probe_cells / n_cells.
    """
    qids, qmat = _query_matrix(ds, emb_col, id_col, query_ids)
    cents = _train_centroids(ds, emb_col, id_col, n_cells,
                             sample_size, kmeans_iters, seed)

    # each query probes its n_probe_cells nearest cells
    qcell = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe_cells]
    wanted = np.unique(qcell.reshape(-1))
    ctx = ray.put((qids, qmat, cents, qcell, wanted))

    class CellScan:
        def __init__(self):
            (self.qids, self.qmat, self.cents, self.qcell,
             self.wanted) = ray.get(ctx)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mat = _norm_rows(_stack(batch[emb_col]))
            cell = np.argmax(mat @ self.cents.T, axis=1)
            keep = np.isin(cell, self.wanted)
            ids, mat, cell = ids[keep], mat[keep], cell[keep]
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.qids)):
                m = np.isin(cell, self.qcell[qi])
                if not m.any():
                    continue
                sims = mat[m] @ self.qmat[qi]
                out_q.append(np.full(int(m.sum()), self.qids[qi]))
                out_n.append(ids[m])
                out_s.append(sims)
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "score": pa.array(np.concatenate(out_s))})

    partials = _topk_reduce(
        ds.select_columns([id_col, emb_col]).map_batches(
            CellScan, batch_format="pyarrow", concurrency=pool_size(),
            batch_size=4096), k)
    return _topk(partials, k)


def kmeans_lloyd(ds, emb_col: str, id_col: str, k: int = 8,
                 iters: int = 4, quant_bits: int = 20):
    """Full-data Lloyd k-means over an embedding column, DETERMINISTIC
    at any partitioning / arrival order: per-batch partial sums are
    computed on embeddings quantized to integer micro-units
    (``round(x * 2^quant_bits)`` int64), so the cross-partition
    reduction is exact integer addition — fold-order-free — and every
    centroid update is one fixed float expression of exact integers.
    (int64 headroom: |q| <= ~2^21 at unit-scale inputs, safe to ~1e12
    rows per cluster.)

    Init is the embeddings of the ``k`` SMALLEST ids (portable, no
    RNG). Empty clusters keep their previous centroid. Returns
    ``(assignments Dataset (id_col, cluster), inertia_history)`` —
    history is float64 (monotone non-increasing up to IEEE noise;
    assignments themselves are bit-deterministic).

    Scale shape: every iteration is ONE streaming pass emitting <= k
    rows per block (cluster, count, d int sums); the driver combine is
    k x blocks rows; centroids broadcast once per iteration via
    ray.put. No shuffle anywhere.
    """
    Q = float(1 << quant_bits)

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")[:k]
        return b.take(pa.array(np.sort(order)))

    seeds = ds.select_columns([id_col, emb_col]).map_batches(
        seed_partial, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values(id_col, kind="mergesort").head(k)
    cent = np.vstack([np.asarray(r, np.float64)
                      for r in seeds[emb_col]])
    d = cent.shape[1]
    history = []
    scols = ["s%d" % j for j in range(d)]

    def make_partial(cent_ref):
        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            X = _stack(b[emb_col])
            q = np.round(X * Q).astype(np.int64)
            # ||x-c||^2 for all pairs; argmin ties -> lowest cluster
            d2 = ((X * X).sum(axis=1, keepdims=True)
                  - 2.0 * (X @ c.T)
                  + (c * c).sum(axis=1)[None, :])
            a = np.argmin(d2, axis=1)
            inert = d2[np.arange(len(a)), a].sum()
            out = {"cluster": [], "cnt": [], "inertia": []}
            sums = []
            for ci in np.unique(a):
                m = a == ci
                out["cluster"].append(int(ci))
                out["cnt"].append(int(m.sum()))
                out["inertia"].append(float(inert) if not sums
                                      else 0.0)
                sums.append(q[m].sum(axis=0))
            t = pa.table({
                "cluster": pa.array(out["cluster"], pa.int64()),
                "cnt": pa.array(out["cnt"], pa.int64()),
                "inertia": pa.array(out["inertia"], pa.float64()),
                **{scols[j]: pa.array(
                    np.asarray([s[j] for s in sums], np.int64))
                   for j in range(d)}})
            return t
        return partial

    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = ds.select_columns([id_col, emb_col]).map_batches(
            make_partial(cent_ref), batch_format="pyarrow") \
            .to_pandas()
        history.append(float(parts["inertia"].sum()))
        agg = parts.groupby("cluster", as_index=False).agg(
            {"cnt": "sum", **{c: "sum" for c in scols}})
        new = cent.copy()
        for _, row in agg.iterrows():
            ci = int(row["cluster"])
            n = float(row["cnt"])
            s = row[scols].to_numpy(np.float64)
            new[ci] = (s / n) / Q
        cent = new

    cent_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        X = _stack(b[emb_col])
        d2 = ((X * X).sum(axis=1, keepdims=True) - 2.0 * (X @ c.T)
              + (c * c).sum(axis=1)[None, :])
        a = np.argmin(d2, axis=1).astype(np.int64)
        return pa.table({
            id_col: b[id_col],
            "cluster": pa.array(a)})

    out = ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow")
    return out, history
