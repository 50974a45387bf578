"""Deduplication family for training-data pipelines: exact,
n-gram-Jaccard (exact, inverted-index), MinHash+LSH (approximate,
scale path), SimHash, embedding-cosine near-dup.

None of these exist in the reference (SURVEY.md §2.6 — it has no
dedup/distinct at all); they are first-class here because a 100 TB web
corpus is unusable without them.

Execution shape: Ray's ``groupby(fine_key).map_groups`` pays a Python
call per group, which is catastrophic for millions of tiny groups
(hashes, LSH buckets, pairs). Every stage here therefore shuffles on a
COARSE hash partition (``hash(fine_key) % P``) and runs ONE vectorized
pandas/numpy pass per partition that handles all its fine groups —
P Python calls total, like stages/partition.partitioned_apply.

Shuffle accounting (what matters at 100 TB):
* exact dedup — one groupby on an 8-byte content hash (bodies never
  move unless requested);
* jaccard — explode to (shingle, doc) postings -> pairs within each
  posting list -> count per pair; hot shingles are the skew risk ->
  ``max_df`` cutoff (documented semantic knob);
* minhash-lsh — constant work per doc, one groupby on (band, bucket);
* simhash — 4-band pigeonhole blocking is EXACT for hamming <= 3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (hash64, hamming64, lsh_band_keys,
                                 minhash_signatures, simhash64,
                                 word_shingles)
from .partition import partition_map

_EMPTY_PAIRS = {"a": np.int64, "b": np.int64}


def _empty(cols: dict) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, content_col: str, id_col: str,
                keep_content: bool = False, num_partitions: int = 32):
    """Keep one deterministic winner (min id) per distinct content
    value; emits (id, n_copies). The shuffle key is the 64-bit content
    hash, so only (id, hash) move; the winner is min(id), so block
    order and task retries cannot change the result."""
    cols = [content_col, id_col] if keep_content else [id_col]

    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64(batch[content_col].to_numpy(zero_copy_only=False))
        batch = batch.append_column("__h", pa.array(h.astype(np.int64)))
        return batch.select(cols + ["__h"])

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        gb = g.groupby("__h", sort=False)
        out = gb.head(1)[cols].copy()
        out["n_copies"] = gb.size().reindex(
            gb.head(1)["__h"]).to_numpy(np.int64)
        return out

    ds = ds.select_columns([content_col, id_col]) \
           .map_batches(add_hash, batch_format="pyarrow")
    return partition_map(ds, ["__h"], dedup_part,
                         num_partitions).select_columns(
        cols + ["n_copies"])


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted index (posting lists)
# ---------------------------------------------------------------------------

def _tokenize(texts: pd.Series) -> list[list[str]]:
    return [t.split() if isinstance(t, str) else [] for t in texts]


def _segment_pairs(grouped_keys: np.ndarray):
    """(start, end) run boundaries for an array whose equal keys are
    CONTIGUOUS (grouped by a sort) but not necessarily globally
    monotonic — np.unique's first-occurrence indices would interleave
    runs for non-monotonic keys (e.g. band<<32 ^ bucket) and fabricate
    giant bogus segments."""
    n = len(grouped_keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = grouped_keys[1:] != grouped_keys[:-1]
    starts = np.nonzero(change)[0]
    return starts, np.append(starts[1:], n)


def jaccard_pairs(ds, text_col: str, id_col: str, ngram: int = 2,
                  threshold: float = 0.2, max_df: int | None = None,
                  num_partitions: int = 16):
    """All pairs (a < b) with word-``ngram`` shingle Jaccard >=
    threshold, computed exactly with an inverted index:

    1. map_batches: doc -> distinct shingle hashes -> posting rows
       (shingle, doc, doc_size);
    2. partition by hash(shingle): per partition, one numpy pass emits
       the pairs of every posting list (``max_df`` drops stop-shingles
       — the skew guard);
    3. partition by hash(pair): per partition, one pandas groupby
       counts co-occurrences = |intersection| and filters by
       jaccard = inter / (|a| + |b| - inter).

    The division is int/int in both engines -> bit-identical to the
    SQL oracle without any rounding.
    """
    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh, did, dsz = [], [], []
        for i, toks in enumerate(_tokenize(texts)):
            s = word_shingles(toks, ngram)
            sh.append(s)
            did.append(np.full(len(s), ids[i]))
            dsz.append(np.full(len(s), len(s)))
        cat = lambda xs, t: (np.concatenate(xs).astype(t) if xs
                             else np.empty(0, t))
        return pa.table({
            "shingle": pa.array(cat(sh, np.int64)),
            "doc": pa.array(cat(did, np.int64)),
            "size": pa.array(cat(dsz, np.int64)),
        })

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "doc"], kind="mergesort")
        sh = g["shingle"].to_numpy()
        d = g["doc"].to_numpy()
        s = g["size"].to_numpy()
        starts, ends = _segment_pairs(sh)
        out_a, out_b, out_sa, out_sb = [], [], [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2 or (max_df is not None and m > max_df):
                continue
            i, j = np.triu_indices(m, k=1)
            out_a.append(d[st + i])
            out_b.append(d[st + j])
            out_sa.append(s[st + i])
            out_sb.append(s[st + j])
        if not out_a:
            return _empty({"a": np.int64, "b": np.int64,
                           "sa": np.int64, "sb": np.int64})
        return pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b),
            "sa": np.concatenate(out_sa), "sb": np.concatenate(out_sb)})

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False, as_index=False).agg(
            inter=("sa", "size"), sa=("sa", "first"), sb=("sb", "first"))
        inter = agg["inter"].to_numpy(np.int64)
        union = agg["sa"].to_numpy() + agg["sb"].to_numpy() - inter
        jac = inter / union
        agg["jaccard"] = jac
        return agg.loc[jac >= threshold, ["a", "b", "jaccard"]]

    post = ds.select_columns([text_col, id_col]).map_batches(
        explode, batch_format="pyarrow")
    cand = partition_map(post, ["shingle"], pairs_part, num_partitions)
    return partition_map(cand, ["a", "b"], score_part, num_partitions)


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate near-dup at scale)
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(ds, text_col: str, id_col: str, ngram: int = 2,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.2, num_partitions: int = 16):
    """Candidate pairs from LSH banding, verified by exact Jaccard on
    the pair's shingle sets (re-derived from the texts carried through
    the bucket shuffle). Probabilistic recall (standard S-curve with
    r = k/bands rows per band); deterministic given fixed hash seeds.
    """
    def sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        shingles = [word_shingles(t, ngram) for t in _tokenize(texts)]
        sigs = minhash_signatures(shingles, k=num_hashes)
        keys = lsh_band_keys(sigs, bands)
        n = len(ids)
        return pa.table({
            "band": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n)),
            "bucket": pa.array(keys.T.reshape(-1).astype(np.int64)),
            "doc": pa.array(np.tile(ids, bands)),
            "text": pa.array(np.tile(texts.to_numpy(dtype=object), bands),
                             pa.string()),
        })

    def bucket_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "bucket", "doc"], kind="mergesort")
        g = g.drop_duplicates(["band", "bucket", "doc"])
        bb = (g["band"].to_numpy() * np.int64(1 << 32)
              ^ g["bucket"].to_numpy())
        docs = g["doc"].to_numpy()
        texts = g["text"].to_numpy(dtype=object)
        starts, ends = _segment_pairs(bb)
        seen: set[tuple[int, int]] = set()
        rows_a, rows_b, rows_j = [], [], []
        cache: dict[int, np.ndarray] = {}

        def sset(pos: int) -> np.ndarray:
            if pos not in cache:
                cache[pos] = word_shingles(texts[pos].split(), ngram)
            return cache[pos]

        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            for x in range(st, en):
                for y in range(x + 1, en):
                    key = (int(docs[x]), int(docs[y]))
                    if key in seen:
                        continue
                    seen.add(key)
                    sa, sb = sset(x), sset(y)
                    inter = np.intersect1d(sa, sb,
                                           assume_unique=True).size
                    union = sa.size + sb.size - inter
                    jac = inter / union if union else 0.0
                    if jac >= threshold:
                        rows_a.append(key[0])
                        rows_b.append(key[1])
                        rows_j.append(jac)
        if not rows_a:
            return _empty({"a": np.int64, "b": np.int64,
                           "jaccard": np.float64})
        return pd.DataFrame({"a": rows_a, "b": rows_b, "jaccard": rows_j})

    cand = ds.select_columns([text_col, id_col]).map_batches(
        sig, batch_format="pyarrow")
    pairs = partition_map(cand, ["bucket"], bucket_pairs_part,
                          num_partitions)

    # A pair found in several bands can land in different partitions ->
    # final exact dedup on the pair key (small shuffle: pairs only).
    def uniq_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b", "jaccard"]]

    return partition_map(pairs, ["a", "b"], uniq_part, num_partitions)


# ---------------------------------------------------------------------------
# SimHash near-dup (exact for small hamming radius via pigeonhole bands)
# ---------------------------------------------------------------------------

def simhash_pairs(ds, text_col: str, id_col: str,
                  max_hamming: int = 3, num_partitions: int = 16):
    """Pairs with SimHash hamming distance <= max_hamming. With 4
    16-bit bands, any pair within distance 3 shares at least one exact
    band (pigeonhole) — candidate generation loses nothing."""
    BANDS = 4

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        th = [hash64(t.split()) if isinstance(t, str) and t else
              np.empty(0, np.uint64) for t in texts]
        sh = simhash64(th)
        n = len(ids)
        band_vals = np.stack([(sh >> np.uint64(16 * b))
                              & np.uint64(0xFFFF) for b in range(BANDS)])
        return pa.table({
            "band": pa.array(np.repeat(np.arange(BANDS, dtype=np.int64), n)),
            "bucket": pa.array(band_vals.reshape(-1).astype(np.int64)),
            "doc": pa.array(np.tile(ids, BANDS)),
            "simhash": pa.array(np.tile(sh, BANDS).astype(np.int64)),
        })

    def bucket_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "bucket", "doc"], kind="mergesort")
        g = g.drop_duplicates(["band", "bucket", "doc"])
        bb = (g["band"].to_numpy() * np.int64(1 << 32)
              ^ g["bucket"].to_numpy())
        docs = g["doc"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        starts, ends = _segment_pairs(bb)
        out_a, out_b, out_h = [], [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            ham = hamming64(sh[st + i], sh[st + j])
            keep = ham <= max_hamming
            out_a.append(docs[st + i[keep]])
            out_b.append(docs[st + j[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return _empty({"a": np.int64, "b": np.int64,
                           "hamming": np.int64})
        return pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b),
            "hamming": np.concatenate(out_h).astype(np.int64)})

    cand = ds.select_columns([text_col, id_col]).map_batches(
        sig, batch_format="pyarrow")
    pairs = partition_map(cand, ["bucket"], bucket_pairs_part,
                          num_partitions)

    def uniq_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b", "hamming"]]

    return partition_map(pairs, ["a", "b"], uniq_part, num_partitions)
