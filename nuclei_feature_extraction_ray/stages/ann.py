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

No analog in the reference (nearest-centroid lookups there are spatial
patch reads); this is a first-class training-data op.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..util import pool_size


def _stack(emb_chunk) -> np.ndarray:
    arr = emb_chunk.combine_chunks() if hasattr(emb_chunk, "combine_chunks") \
        else emb_chunk
    return np.vstack([np.asarray(x, np.float64) for x in
                      arr.to_pylist()])


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ann_bruteforce(ds, emb_col: str, id_col: str,
                   query_ids: list[int], k: int = 5) -> pd.DataFrame:
    """Exact cosine top-k for each query id (queries drawn from the
    dataset itself; self-matches excluded). Returns a small pandas
    frame (query_id, neighbor_id, rank, score) — top-k results are
    driver-sized by construction."""
    qset = set(int(q) for q in query_ids)

    qrows = ds.filter(lambda r: int(r[id_col]) in qset).take_all()
    qrows.sort(key=lambda r: int(r[id_col]))
    qids = np.asarray([int(r[id_col]) for r in qrows])
    qmat = _norm_rows(np.asarray([r[emb_col] for r in qrows], np.float64))
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

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        BlockTopK, batch_format="pyarrow", concurrency=pool_size(),
        batch_size=4096).to_pandas()     # partials: Q * k * n_blocks rows

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


def ann_lsh(ds, emb_col: str, id_col: str, query_ids: list[int],
            k: int = 5, n_planes: int = 8, seed: int = 11) -> pd.DataFrame:
    """Random-hyperplane LSH ANN: bucket = sign pattern of ``n_planes``
    fixed random projections; scan only buckets at hamming distance <= 1
    from each query's bucket. Approximate — recall measured in tests
    against ``ann_bruteforce``."""
    sample = ds.take(1)[0]
    dim = len(sample[emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qset = set(int(q) for q in query_ids)

    qrows = ds.filter(lambda r: int(r[id_col]) in qset).take_all()
    qrows.sort(key=lambda r: int(r[id_col]))
    qids = np.asarray([int(r[id_col]) for r in qrows])
    qmat = _norm_rows(np.asarray([r[emb_col] for r in qrows], np.float64))
    qsig = ((qmat @ planes.T) > 0).astype(np.uint8)
    qbuck = np.packbits(qsig, axis=1, bitorder="little")[:, 0]
    # Expand each query bucket to its hamming<=1 neighborhood.
    wanted: set[int] = set()
    for b in qbuck:
        wanted.add(int(b))
        for bit in range(n_planes):
            wanted.add(int(b) ^ (1 << bit))
    ctx = ray.put((qids, qmat, planes, frozenset(wanted)))

    class BucketScan:
        def __init__(self):
            self.qids, self.qmat, self.planes, self.wanted = ray.get(ctx)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mat = _norm_rows(_stack(batch[emb_col]))
            sig = ((mat @ self.planes.T) > 0).astype(np.uint8)
            buck = np.packbits(sig, axis=1, bitorder="little")[:, 0]
            mask = np.asarray([int(b) in self.wanted for b in buck])
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

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        BucketScan, batch_format="pyarrow", concurrency=pool_size(),
        batch_size=4096).to_pandas()
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


def embedding_near_dup(ds, emb_col: str, id_col: str,
                       threshold: float) -> pd.DataFrame:
    """Cosine near-duplicate pairs (a < b, cos >= threshold) via blocked
    self-matmul: every block is compared against the full (normalized)
    matrix, which is broadcast once. O(n^2/blocks) flops in C, no
    Python-pair loops; for corpora where the matrix itself no longer
    fits a worker, the LSH bucketing of ``ann_lsh`` is the scale path."""
    all_rows = ds.select_columns([id_col, emb_col])
    full = all_rows.to_pandas()
    ids_full = full[id_col].to_numpy()
    mat_full = _norm_rows(np.vstack(
        [np.asarray(v, np.float64) for v in full[emb_col]]))
    order = np.argsort(ids_full, kind="mergesort")
    ids_full, mat_full = ids_full[order], mat_full[order]
    ref = ray.put((ids_full, mat_full))

    class PairBlock:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mat = _norm_rows(_stack(batch[emb_col]))
            sims = mat @ self.mat.T
            bi, fj = np.nonzero(sims >= threshold)
            a = ids[bi]
            b = self.ids[fj]
            keep = a < b
            return pa.table({
                "a": pa.array(a[keep]), "b": pa.array(b[keep]),
                "cosine": pa.array(np.round(sims[bi, fj][keep], 6)),
            })

    return (all_rows.map_batches(PairBlock, batch_format="pyarrow",
                                 concurrency=pool_size(), batch_size=2048)
            .to_pandas())
