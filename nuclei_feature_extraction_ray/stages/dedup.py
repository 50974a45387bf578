"""Deduplication family for training-data pipelines: exact,
n-gram-Jaccard (exact, inverted-index), MinHash+LSH (approximate,
scale path), SimHash, embedding-cosine near-dup.

None of these exist in the reference (SURVEY.md §2.6 — it has no
dedup/distinct at all); they are first-class here because a 100 TB web
corpus is unusable without them.

Shuffle accounting (the thing that matters at scale):
* exact dedup — one groupby on a 64-bit content hash;
* jaccard — explode to (shingle, doc) posting rows -> groupby(shingle)
  emits pairs only within a posting list -> groupby(pair) counts; hot
  shingles are the skew risk -> ``max_df`` frequency cutoff;
* minhash-lsh — constant work per doc (k hashes), then one groupby on
  (band, bucket); candidate verification is partition-local;
* simhash — 4-band pigeonhole blocking is EXACT for hamming<=3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (hash64, hamming64, lsh_band_keys,
                                 minhash_signatures, simhash64,
                                 word_shingles)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, content_col: str, id_col: str,
                keep_content: bool = False):
    """Keep one deterministic winner (min id) per distinct content value.

    Grouping key is the 64-bit content hash so the shuffle moves 8-byte
    keys, not document bodies; the winner is min(id) so retries and
    block order can't change the result. Emits (id, n_copies).
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        h = hash64(batch[content_col].to_numpy(zero_copy_only=False))
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    cols = [content_col, id_col] if keep_content else [id_col]

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        out = g.head(1)[cols].copy()
        out["n_copies"] = np.int64(len(g))
        return out

    return (ds.select_columns(cols)
              .map_batches(add_hash, batch_format="pyarrow")
              .groupby("__h").map_groups(first, batch_format="pandas")
              .select_columns(cols + ["n_copies"]))


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted index (posting lists)
# ---------------------------------------------------------------------------

def _tokenize(texts: pd.Series) -> list[list[str]]:
    return [t.split() if isinstance(t, str) else [] for t in texts]


def jaccard_pairs(ds, text_col: str, id_col: str, ngram: int = 2,
                  threshold: float = 0.2, max_df: int | None = None,
                  num_partitions: int = 32):
    """All pairs (a < b) with word-``ngram`` shingle Jaccard >= threshold.

    Stage 1 (map_batches): doc -> distinct shingle hashes, emitted as
    posting rows (shingle, doc, doc_size).
    Stage 2 (groupby shingle): pairs within each posting list with
    co-occurrence count 1 each. ``max_df`` drops shingles appearing in
    more docs (stop-shingles; skew guard — documented semantic knob).
    Stage 3 (groupby pair): sum co-occurrence -> intersection size;
    jaccard = inter / (|a| + |b| - inter).
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
        return pa.table({
            "shingle": pa.array(np.concatenate(sh).astype(np.int64)
                                if sh else np.empty(0, np.int64)),
            "doc": pa.array(np.concatenate(did).astype(np.int64)
                            if did else np.empty(0, np.int64)),
            "size": pa.array(np.concatenate(dsz).astype(np.int64)
                             if dsz else np.empty(0, np.int64)),
        })

    def pairs_in_posting(g: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None and len(g) > max_df:
            return pd.DataFrame({c: pd.Series(dtype=np.int64) for c in
                                 ("a", "b", "sa", "sb")})
        g = g.sort_values("doc", kind="mergesort")
        d = g["doc"].to_numpy()
        s = g["size"].to_numpy()
        i, j = np.triu_indices(len(d), k=1)
        return pd.DataFrame({"a": d[i], "b": d[j], "sa": s[i], "sb": s[j]})

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        inter = batch["inter"].to_numpy(np.float64)
        union = (batch["sa"] + batch["sb"]).to_numpy(np.float64) - inter
        jac = np.where(union > 0, inter / union, 0.0)
        out = batch[["a", "b"]].copy()
        out["jaccard"] = jac
        return out[jac >= threshold]

    from ray.data.aggregate import Count, Max

    post = ds.select_columns([text_col, id_col]).map_batches(
        explode, batch_format="pyarrow")
    cand = post.groupby("shingle").map_groups(
        pairs_in_posting, batch_format="pandas")
    # Vectorized combine: intersection size = co-occurrence count; the
    # per-doc set sizes ride along (constant per pair -> Max).
    agg = cand.groupby(["a", "b"]).aggregate(
        Count(alias_name="inter"),
        Max("sa", alias_name="sa"), Max("sb", alias_name="sb"))
    return agg.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate near-dup at scale)
# ---------------------------------------------------------------------------

def minhash_lsh_pairs(ds, text_col: str, id_col: str, ngram: int = 2,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.2):
    """Candidate pairs from LSH banding, verified by exact Jaccard on the
    pair's shingle sets (re-derived inside the verifying task from the
    two docs' texts, carried through the bucket groupby).

    Probabilistic recall (standard S-curve for r=k/bands rows per band);
    deterministic given the fixed hash seeds — retries are idempotent.
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

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc").sort_values("doc", kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "jaccard": pd.Series(dtype=np.float64)})
        docs = g["doc"].to_numpy()
        sets = [word_shingles(t.split(), ngram) for t in g["text"]]
        i, j = np.triu_indices(len(docs), k=1)
        jac = np.empty(len(i))
        for t, (x, y) in enumerate(zip(i, j)):
            inter = np.intersect1d(sets[x], sets[y],
                                   assume_unique=True).size
            union = sets[x].size + sets[y].size - inter
            jac[t] = inter / union if union else 0.0
        keep = jac >= threshold
        return pd.DataFrame({"a": docs[i[keep]], "b": docs[j[keep]],
                             "jaccard": jac[keep]})

    cand = ds.select_columns([text_col, id_col]).map_batches(
        sig, batch_format="pyarrow")
    pairs = cand.groupby(["band", "bucket"]).map_groups(
        bucket_pairs, batch_format="pandas")
    # A pair can surface from several bands -> dedup on (a, b).
    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)
    return pairs.groupby(["a", "b"]).map_groups(
        uniq, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup (exact for small hamming radius via pigeonhole bands)
# ---------------------------------------------------------------------------

def simhash_pairs(ds, text_col: str, id_col: str,
                  max_hamming: int = 3):
    """Pairs with SimHash hamming distance <= max_hamming. With 4
    16-bit bands, any pair within distance 3 shares at least one exact
    band (pigeonhole), so candidate generation loses nothing."""
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

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc").sort_values("doc", kind="mergesort")
        empty = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                              "b": pd.Series(dtype=np.int64),
                              "hamming": pd.Series(dtype=np.int64)})
        if len(g) < 2:
            return empty
        docs = g["doc"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        i, j = np.triu_indices(len(docs), k=1)
        ham = hamming64(sh[i], sh[j])
        keep = ham <= max_hamming
        return pd.DataFrame({"a": docs[i[keep]], "b": docs[j[keep]],
                             "hamming": ham[keep].astype(np.int64)})

    cand = ds.select_columns([text_col, id_col]).map_batches(
        sig, batch_format="pyarrow")
    pairs = cand.groupby(["band", "bucket"]).map_groups(
        bucket_pairs, batch_format="pandas")
    return pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
