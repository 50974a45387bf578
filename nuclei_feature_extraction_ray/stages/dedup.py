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
                                 minhash_signatures,
                                 minhash_signatures_flat, simhash64,
                                 word_shingles, word_shingles_flat)
from .partition import partition_map

_EMPTY_PAIRS = {"a": np.int64, "b": np.int64}

#: broadcast the signature table when it is below this (else keyed join)
SIG_BROADCAST_MAX_BYTES = 256 << 20


def _empty(cols: dict) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})


def _sig_matrix(col, num_hashes: int) -> np.ndarray:
    """(n, k) uint64 signature matrix from a binary Arrow/pandas column
    of fixed 8*k-byte signatures — ONE frombuffer over the joined
    bytes, no per-row unpacking."""
    vals = col.to_pylist() if hasattr(col, "to_pylist") else list(col)
    if not vals:
        return np.empty((0, num_hashes), np.uint64)
    return np.frombuffer(b"".join(vals), np.uint64) \
        .reshape(len(vals), num_hashes)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

#: independent second SipHash key -> effective 128-bit content hash
_H2_KEY = "9f8e7d6c5b4a3210"


def exact_dedup(ds, content_col: str, id_col: str,
                keep_content: bool = False, num_partitions: int = 32):
    """Keep one deterministic winner (min id) per distinct content
    value; emits (id, n_copies). The shuffle key is a 128-bit content
    hash (two independently-keyed SipHash64 runs), so only (id, 16
    bytes) move per row; the winner is min(id), so block order and
    task retries cannot change the result. Collision bound: birthday
    over 2^128 is ~2^64 docs — safe at the billions-of-docs scale
    where a single 64-bit hash would start silently merging distinct
    documents (~2^32 birthday)."""
    cols = [content_col, id_col] if keep_content else [id_col]

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch[content_col].to_numpy(zero_copy_only=False)
        h = hash64(vals)
        h2 = pd.util.hash_array(np.asarray(vals, dtype=object),
                                hash_key=_H2_KEY, categorize=False)
        batch = batch.append_column("__h", pa.array(h.astype(np.int64)))
        batch = batch.append_column("__h2",
                                    pa.array(h2.astype(np.int64)))
        return batch.select(cols + ["__h", "__h2"])

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        gb = g.groupby(["__h", "__h2"], sort=False)
        out = gb.head(1)[cols].copy()
        out["n_copies"] = gb.size().to_numpy(np.int64)
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


def _posting_explode(text_col: str, id_col: str, ngram: int):
    """Shared map_batches fn: doc batch -> posting rows (shingle,
    doc, doc_size). Fully vectorized end to end
    (functions.hashing.word_shingles_flat): Arrow split -> flat gram
    strings -> one SipHash kernel -> one-lexsort per-doc distinct;
    posting rows built with ``np.repeat`` — zero per-doc Python."""
    def explode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        flat, lens = word_shingles_flat(batch[text_col], ngram)
        return pa.table({
            "shingle": pa.array(flat.astype(np.int64)),
            "doc": pa.array(np.repeat(np.asarray(ids, np.int64),
                                      lens)),
            "size": pa.array(np.repeat(lens, lens)),
        })
    return explode


def segment_all_pairs(grouped_keys: np.ndarray,
                      max_seg: int | None = None
                      ) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment index pairs (i < j by row position) of an
    array whose equal keys are contiguous — FULLY VECTORIZED (no
    Python loop over segments, which dominates wall time when a
    partition holds millions of 2-row posting lists). Row r at
    segment-relative position p contributes p pairs as the ``j``
    side, with ``i`` sides r-p .. r-1 (a ragged arange). Segments
    larger than ``max_seg`` are skipped entirely (the stop-shingle /
    skew guard)."""
    n = len(grouped_keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    starts, ends = _segment_pairs(grouped_keys)
    sizes = ends - starts
    row_start = np.repeat(starts, sizes)
    pos = np.arange(n, dtype=np.int64) - row_start
    if max_seg is not None:
        pos = np.where(np.repeat(sizes, sizes) > max_seg, 0, pos)
    total = int(pos.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    b_idx = np.repeat(np.arange(n, dtype=np.int64), pos)
    off = np.arange(total, dtype=np.int64) \
        - np.repeat(np.cumsum(pos) - pos, pos)
    a_idx = np.repeat(np.arange(n, dtype=np.int64) - pos, pos) + off
    return a_idx, b_idx


def _posting_pairs_part(max_df: int | None):
    """Shared per-partition pair enumeration over grouped posting
    lists: every co-occurring (a < b) doc pair of every shingle's
    posting list, carrying both doc sizes (``max_df`` drops
    stop-shingles — the skew guard). One vectorized
    ``segment_all_pairs`` pass — zero per-segment Python."""
    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "doc"], kind="mergesort")
        d = g["doc"].to_numpy()
        s = g["size"].to_numpy()
        i, j = segment_all_pairs(g["shingle"].to_numpy(), max_df)
        if not len(i):
            return _empty({"a": np.int64, "b": np.int64,
                           "sa": np.int64, "sb": np.int64})
        return pd.DataFrame({"a": d[i], "b": d[j],
                             "sa": s[i], "sb": s[j]})
    return pairs_part


def _posting_pairs(ds, text_col: str, id_col: str, ngram: int,
                   max_df: int | None, num_partitions: int,
                   score_part):
    """The inverted-index near-dup plan shared by jaccard_pairs and
    containment_pairs: posting explode -> shingle exchange (pair
    enumeration) -> pair exchange (``score_part`` gets the grouped
    (a, b, sa, sb) co-occurrence rows and scores/filters them)."""
    post = ds.select_columns([text_col, id_col]).map_batches(
        _posting_explode(text_col, id_col, ngram),
        batch_format="pyarrow")
    cand = partition_map(post, ["shingle"],
                         _posting_pairs_part(max_df), num_partitions)
    return partition_map(cand, ["a", "b"], score_part, num_partitions)


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
    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False, as_index=False).agg(
            inter=("sa", "size"), sa=("sa", "first"), sb=("sb", "first"))
        inter = agg["inter"].to_numpy(np.int64)
        union = agg["sa"].to_numpy() + agg["sb"].to_numpy() - inter
        jac = inter / union
        agg["jaccard"] = jac
        return agg.loc[jac >= threshold, ["a", "b", "jaccard"]]

    return _posting_pairs(ds, text_col, id_col, ngram, max_df,
                          num_partitions, score_part)


def containment_pairs(ds, text_col: str, id_col: str, ngram: int = 2,
                      threshold: float = 0.8, max_df: int | None = None,
                      num_partitions: int = 16):
    """Asymmetric near-dup: all pairs (a < b) where EITHER document's
    shingle set is >= ``threshold`` contained in the other's
    (containment of A in B = |A∩B| / |A|) — the subset-duplicate
    detector Jaccard misses (a short doc embedded verbatim in a long
    one has high containment but low Jaccard). Identical inverted-
    index plan to jaccard_pairs (the shared ``_posting_pairs``
    machinery); only the per-pair score differs, and both divisions
    stay int/int -> bit-identical to the SQL oracle."""
    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], sort=False, as_index=False).agg(
            inter=("sa", "size"), sa=("sa", "first"),
            sb=("sb", "first"))
        inter = agg["inter"].to_numpy(np.int64)
        c_ab = inter / agg["sa"].to_numpy(np.int64)
        c_ba = inter / agg["sb"].to_numpy(np.int64)
        agg["cont_a_in_b"] = c_ab
        agg["cont_b_in_a"] = c_ba
        keep = (c_ab >= threshold) | (c_ba >= threshold)
        return agg.loc[keep, ["a", "b", "cont_a_in_b", "cont_b_in_a"]]

    return _posting_pairs(ds, text_col, id_col, ngram, max_df,
                          num_partitions, score_part)


def jaccard_pairs_prefix(ds, text_col: str, id_col: str, ngram: int = 2,
                         threshold: float = 0.5,
                         num_partitions: int = 16):
    """AllPairs/PPJoin-style PREFIX-FILTERED exact Jaccard pairs
    (Chaudhuri et al. ICDE 2006; Bayardo et al. WWW 2007): identical
    result set to ``jaccard_pairs`` at the same threshold, but the
    pair enumeration runs only over each document's PREFIX — its
    ``|d| - ceil(t*|d|) + 1`` rarest shingles under the global
    (df asc, shingle) total order. Any pair with Jaccard >= t shares
    its globally-smallest common shingle inside BOTH prefixes (the
    standard bound), so candidate generation is complete; hot
    stop-shingles sort LAST and drop out of every prefix — the skew
    guard ``max_df`` hand-tunes in ``jaccard_pairs`` falls out of the
    ordering here.

    Plan (all bounded exchanges, nothing on the driver):
      1. posting explode (shared ``_posting_explode``);
      2. shingle exchange: attach exact global df (a shingle's rows
         co-locate, so ``transform('size')`` IS the global count);
      3. doc exchange: per-doc (df, shingle) sort -> keep the prefix;
      4. shingle exchange over prefixes: candidate (a < b) pairs;
      5. verify: two key exchanges attach each doc's FULL sorted
         shingle set (packed int64 blob) to its candidate pairs —
         first by a, then by b — and one ``np.intersect1d`` per
         surviving candidate scores exact Jaccard. Candidates are
         near-dup-sparse by construction; docs without candidates
         still ship one blob per round (a semi-join prefilter would
         drop them at extreme scale).
    """
    post = ds.select_columns([text_col, id_col]).map_batches(
        _posting_explode(text_col, id_col, ngram),
        batch_format="pyarrow")

    def df_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("shingle")["doc"].transform("size") \
            .astype(np.int64)
        return g

    wdf = partition_map(post, ["shingle"], df_part, num_partitions)

    def prefix_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "df", "shingle"], kind="mergesort")
        pos = g.groupby("doc", sort=False).cumcount().to_numpy()
        size = g["size"].to_numpy(np.int64)
        plen = size - np.ceil(threshold * size).astype(np.int64) + 1
        return g.loc[pos < plen, ["shingle", "doc"]]

    pre = partition_map(wdf, ["doc"], prefix_part, num_partitions)

    def cand_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "doc"], kind="mergesort")
        d = g["doc"].to_numpy()
        i, j = segment_all_pairs(g["shingle"].to_numpy())
        if not len(i):
            return _empty(_EMPTY_PAIRS)
        return pd.DataFrame({"a": d[i], "b": d[j]}).drop_duplicates()

    cand = partition_map(pre, ["shingle"], cand_part, num_partitions)

    def docset_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "shingle"], kind="mergesort")
        d = g["doc"].to_numpy()
        sh = g["shingle"].to_numpy(np.int64)
        starts, ends = _segment_pairs(d)
        return pd.DataFrame({
            "k": d[starts].astype(np.int64),
            "other": np.full(len(starts), -1, np.int64),
            "blob": [sh[s:e].tobytes()
                     for s, e in zip(starts, ends)],
            "side": np.ones(len(starts), np.int64)})

    sets = partition_map(post, ["doc"], docset_part,
                         num_partitions).materialize()

    def pair_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": b["a"].to_numpy(np.int64),
            "other": b["b"].to_numpy(np.int64),
            "blob": np.full(len(b), b"", object),
            "side": np.zeros(len(b), np.int64)})

    _SCHEMA1 = {"k": np.int64, "other": np.int64,
                "blob": object, "side": np.int64}

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        bl = g.loc[side == 1].set_index("k")["blob"]
        p = g[side == 0]
        if p.empty:
            return _empty(_SCHEMA1)
        # the same candidate can surface from several shingle
        # partitions; all copies of (a, b) co-locate here (keyed by a)
        p = p.drop_duplicates(["k", "other"])
        return pd.DataFrame({
            "k": p["other"].to_numpy(np.int64),
            "other": p["k"].to_numpy(np.int64),
            "blob": p["k"].map(bl).to_numpy(object),
            "side": np.zeros(len(p), np.int64)})

    r1 = partition_map(
        cand.map_batches(pair_rows, batch_format="pandas").union(sets),
        ["k"], attach_a, num_partitions)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy()
        bl = g.loc[side == 1].set_index("k")["blob"]
        p = g[side == 0]
        if p.empty:
            return _empty({"a": np.int64, "b": np.int64,
                           "jaccard": np.float64})
        blob_b = p["k"].map(bl).to_numpy(object)
        a_ids = p["other"].to_numpy(np.int64)
        b_ids = p["k"].to_numpy(np.int64)
        rows_a, rows_b, rows_j = [], [], []
        for aid, bid, ba, bb in zip(a_ids, b_ids,
                                    p["blob"].to_numpy(object),
                                    blob_b):
            sa = np.frombuffer(ba, np.int64)
            sb = np.frombuffer(bb, np.int64)
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            if union and inter / union >= threshold:
                rows_a.append(aid)
                rows_b.append(bid)
                rows_j.append(inter / union)
        return pd.DataFrame({
            "a": np.asarray(rows_a, np.int64),
            "b": np.asarray(rows_b, np.int64),
            "jaccard": np.asarray(rows_j, np.float64)})

    return partition_map(r1.union(sets), ["k"], score, num_partitions)


# ---------------------------------------------------------------------------
# MinHash + LSH (approximate near-dup at scale)
# ---------------------------------------------------------------------------

def _attach_sig(pairs_ds, sigs_ds, key_col: str, new_col: str,
                carry: dict[str, "pa.DataType"], num_partitions: int):
    """Keyed join attaching ``sig`` of doc ``key_col`` onto pair rows:
    tag + union + ONE hash exchange on the doc id (the asof-join
    shape, stages/asof.py). Only pair tuples and 512-byte signatures
    cross the wire. Int pair columns are restored after the pandas
    merge (null padding upcasts them, cf. asof dtype note)."""
    side = "__side"

    def prep_pairs(t: pa.Table) -> pa.Table:
        cols = {"__key": t[key_col]}
        for c in carry:
            cols[c] = t[c]
        cols["__s"] = pa.nulls(len(t), pa.binary())
        cols[side] = pa.array(np.zeros(len(t), np.int8))
        return pa.table(cols)

    def prep_sigs(t: pa.Table) -> pa.Table:
        cols = {"__key": t["doc"]}
        for c, typ in carry.items():
            cols[c] = pa.nulls(len(t), typ)
        cols["__s"] = t["sig"]
        cols[side] = pa.array(np.ones(len(t), np.int8))
        return pa.table(cols)

    both = pairs_ds.map_batches(prep_pairs, batch_format="pyarrow") \
        .union(sigs_ds.map_batches(prep_sigs, batch_format="pyarrow"))

    def attach_part(g: pd.DataFrame) -> pd.DataFrame:
        sig = g.loc[g[side] == 1, ["__key", "__s"]]
        pr = g[g[side] == 0].drop(columns=["__s", side])
        m = pr.merge(sig.rename(columns={"__s": new_col}),
                     on="__key", how="left").drop(columns=["__key"])
        for c in ("a", "b"):
            if c in m.columns and m[c].dtype != np.int64:
                m[c] = m[c].astype(np.int64)
        return m

    return partition_map(both, ["__key"], attach_part, num_partitions)


def minhash_lsh_pairs(ds, text_col: str, id_col: str, ngram: int = 2,
                      num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.2, num_partitions: int = 16,
                      shingle_fn=None, shingle_batch_fn=None,
                      shingle_flat_fn=None):
    """Candidate pairs from LSH banding, verified by SIGNATURE
    AGREEMENT: jaccard_est = fraction of the k MinHash lanes equal —
    an unbiased estimator of Jaccard (stderr ~ sqrt(s(1-s)/k)).
    Probabilistic recall (standard S-curve with r = k/bands rows per
    band); deterministic given fixed hash seeds.

    Scale shape: the raw text NEVER crosses a shuffle. The per-doc
    signature table (doc, 8*k bytes) is materialized once; the band
    shuffle moves only (band, bucket, doc) rows; candidate pairs are
    deduplicated, then the two 512-byte signatures are attached by two
    keyed exchanges and compared with one vectorized lane-equality
    pass — no per-pair Python loop anywhere."""
    shingles_of = shingle_fn or (lambda toks: word_shingles(toks, ngram))

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # Zero-shingle (empty / whitespace-only) docs are dropped HERE:
        # their all-max sentinel signatures would otherwise share LSH
        # buckets and agree on every lane, pairing all empty docs at
        # jaccard_est = 1.0 — while exact Jaccard of an empty union is
        # 0 (jaccard_pairs and its SQL oracle both exclude them).
        if shingle_fn is None and shingle_batch_fn is None:
            # default + md5-twin tier: flat offsets path, zero per-doc
            # Python (Arrow split -> batch hash kernel -> lexsort
            # distinct -> reduceat minima)
            flat_fn = shingle_flat_fn or (
                lambda col: word_shingles_flat(col, ngram))
            flat, lens = flat_fn(batch[text_col])
            keep = lens > 0
            sigs = minhash_signatures_flat(flat, lens,
                                           k=num_hashes)[keep]
        else:
            texts = batch[text_col].to_pandas()
            shingles = (shingle_batch_fn(_tokenize(texts))
                        if shingle_batch_fn else
                        [shingles_of(t) for t in _tokenize(texts)])
            keep = np.asarray([len(s) > 0 for s in shingles], bool)
            shingles = [s for s in shingles if len(s)]
            sigs = minhash_signatures(shingles, k=num_hashes)
        return pa.table({
            "doc": pa.array(ids[keep].astype(np.int64)),
            "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
        })

    sigs_ds = ds.select_columns([text_col, id_col]).map_batches(
        sig, batch_format="pyarrow").materialize()

    def bandrows(batch: pa.Table) -> pa.Table:
        docs = batch["doc"].to_numpy(zero_copy_only=False)
        sigm = _sig_matrix(batch["sig"], num_hashes)
        keys = lsh_band_keys(sigm, bands)
        n = len(docs)
        return pa.table({
            "band": pa.array(np.repeat(
                np.arange(bands, dtype=np.int64), n)),
            "bucket": pa.array(keys.T.reshape(-1).astype(np.int64)),
            "doc": pa.array(np.tile(docs, bands)),
        })

    def bucket_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "bucket", "doc"], kind="mergesort")
        g = g.drop_duplicates(["band", "bucket", "doc"])
        bb = (g["band"].to_numpy() * np.int64(1 << 32)
              ^ g["bucket"].to_numpy())
        docs = g["doc"].to_numpy()
        starts, ends = _segment_pairs(bb)
        out_a, out_b = [], []
        for st, en in zip(starts, ends):
            m = en - st
            if m < 2:
                continue
            i, j = np.triu_indices(m, k=1)
            out_a.append(docs[st + i])
            out_b.append(docs[st + j])
        if not out_a:
            return _empty(_EMPTY_PAIRS)
        out = pd.DataFrame({"a": np.concatenate(out_a),
                            "b": np.concatenate(out_b)})
        return out.drop_duplicates(["a", "b"])

    def uniq_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    cand = sigs_ds.map_batches(bandrows, batch_format="pyarrow")
    pairs = partition_map(cand, ["bucket"], bucket_pairs_part,
                          num_partitions)
    pairs = partition_map(pairs, ["a", "b"], uniq_part, num_partitions)

    # Two verification tiers. The signature table is 8*(k+1) bytes per
    # doc; when it fits comfortably in a worker heap it is broadcast
    # ONCE (ray.put) and pairs verify map-side with zero extra
    # shuffles. Above the cap, signatures are attached by two keyed
    # exchanges — the scale path (pairs + 512B sigs only on the wire).
    n_docs_total = sigs_ds.count()
    if n_docs_total * (num_hashes + 1) * 8 <= SIG_BROADCAST_MAX_BYTES:
        import ray

        def to_mat(t: pa.Table):
            ids = t["doc"].to_numpy(zero_copy_only=False)
            return ids, _sig_matrix(t["sig"], num_hashes)

        tabs = [ray.get(r) for r in sigs_ds.to_arrow_refs()]
        parts = [to_mat(t) for t in tabs if t.num_rows]
        all_ids = np.concatenate([p[0] for p in parts]) if parts \
            else np.empty(0, np.int64)
        all_sig = np.vstack([p[1] for p in parts]) if parts \
            else np.empty((0, num_hashes), np.uint64)
        order = np.argsort(all_ids, kind="stable")
        sig_ref = ray.put((all_ids[order], all_sig[order]))

        class Estimate:
            def __init__(self):
                self.ids, self.sig = ray.get(sig_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if len(batch) == 0:
                    return pa.table({
                        "a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64()),
                        "jaccard_est": pa.array([], pa.float64())})
                a = batch["a"].to_numpy(zero_copy_only=False)
                b = batch["b"].to_numpy(zero_copy_only=False)
                ia = np.searchsorted(self.ids, a)
                ib = np.searchsorted(self.ids, b)
                est = (self.sig[ia] == self.sig[ib]).mean(axis=1)
                keep = est >= threshold
                return pa.table({"a": pa.array(a[keep]),
                                 "b": pa.array(b[keep]),
                                 "jaccard_est": pa.array(est[keep])})

        return pairs.map_batches(Estimate, batch_format="pyarrow",
                                 concurrency=2)

    pairs = _attach_sig(pairs, sigs_ds, "a", "sig_a",
                        {"a": pa.int64(), "b": pa.int64()},
                        num_partitions)
    pairs = _attach_sig(pairs, sigs_ds, "b", "sig_b",
                        {"a": pa.int64(), "b": pa.int64(),
                         "sig_a": pa.binary()}, num_partitions)

    def estimate(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard_est": pa.array([], pa.float64())})
        sa = np.frombuffer(b"".join(g["sig_a"]), np.uint64) \
            .reshape(len(g), num_hashes)
        sb = np.frombuffer(b"".join(g["sig_b"]), np.uint64) \
            .reshape(len(g), num_hashes)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "a": pa.array(g["a"].to_numpy(np.int64)[keep]),
            "b": pa.array(g["b"].to_numpy(np.int64)[keep]),
            "jaccard_est": pa.array(est[keep]),
        })

    return pairs.map_batches(estimate, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup (exact for small hamming radius via pigeonhole bands)
# ---------------------------------------------------------------------------

def simhash_pairs(ds, text_col: str, id_col: str,
                  max_hamming: int = 3, num_partitions: int = 16,
                  token_hash_fn=None, token_hash_batch_fn=None,
                  drop_empty: bool = False):
    """Pairs with SimHash hamming distance <= max_hamming. With 4
    16-bit bands, any pair within distance 3 shares at least one exact
    band (pigeonhole) — candidate generation loses nothing.

    ``token_hash_fn`` (text -> uint64 token-hash array, tokenization
    included) defaults to SipHash over ``str.split()``; pass
    ``hashing.md5_token_hashes`` + ``drop_empty=True`` for the
    PORTABLE variant whose SimHash is reproducible in DuckDB SQL (the
    driver-oracled tier — empty docs are dropped there because they
    all share signature 0)."""
    BANDS = 4
    hfn = token_hash_fn or (lambda t: hash64(t.split()))

    def sig(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        th = (token_hash_batch_fn(list(texts))
              if token_hash_batch_fn else
              [hfn(t) if isinstance(t, str) and t else
               np.empty(0, np.uint64) for t in texts])
        if drop_empty:
            keep = np.asarray([len(x) > 0 for x in th], bool)
            th = [x for x in th if len(x)]
            ids = ids[keep]
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


# ---------------------------------------------------------------------------
# Cross-document line dedup (C4-style boilerplate removal)
# ---------------------------------------------------------------------------

def _split_lines(col: pa.ChunkedArray):
    """Vectorized newline split of a string column -> (flat line
    StringArray, per-row line counts int64, row ids per flat line)."""
    import pyarrow.compute as pc
    la = pc.split_pattern(col, pattern="\n").combine_chunks()
    counts = np.diff(la.offsets.to_numpy())
    row_ids = np.repeat(np.arange(len(la)), counts)
    return la.flatten(), counts.astype(np.int64), row_ids


def _line_hashes(lines) -> tuple[np.ndarray, np.ndarray]:
    """Effective 128-bit line content hash (same construction and
    collision argument as exact_dedup)."""
    vals = np.asarray(lines.to_numpy(zero_copy_only=False), dtype=object)
    h = hash64(vals).astype(np.int64)
    h2 = pd.util.hash_array(vals, hash_key=_H2_KEY,
                            categorize=False).astype(np.int64)
    return h, h2


def hot_lines(ds, text_col: str, doc_col: str, min_docs: int,
              num_partitions: int = 16,
              driver_max: int = 5_000_000) -> pd.DataFrame:
    """Pass 1 of C4-style line dedup: the (small) set of lines that
    occur in >= ``min_docs`` DISTINCT documents, as a (h, h2) frame of
    128-bit line hashes.

    Scale shape: the exchange moves only distinct (line-hash128,
    doc-hash64) triples (pre-deduplicated per batch — repeated
    boilerplate inside one batch collapses before the shuffle); the
    per-partition pass counts distinct docs per line vectorized.  The
    result is boilerplate — bounded and broadcastable — but guarded:
    > ``driver_max`` hot lines raises instead of silently flooding the
    driver (raise min_docs if hit).
    """
    import pyarrow.compute as pc  # noqa: F401  (kept for symmetry)

    def pairs(b: pa.Table) -> pa.Table:
        flat, counts, row_ids = _split_lines(b[text_col])
        h, h2 = _line_hashes(flat)
        uh = hash64(
            b[doc_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"h": h, "h2": h2,
                           "uh": uh[row_ids]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        nd = g.groupby(["h", "h2"], as_index=False).agg(
            nd=("uh", "nunique"))
        return nd.loc[nd["nd"] >= min_docs, ["h", "h2"]]

    hot = partition_map(ds.map_batches(pairs, batch_format="pyarrow"),
                        ["h"], count_part, num_partitions)
    df = hot.limit(driver_max + 1).to_pandas()
    if len(df) > driver_max:
        raise ValueError(
            "hot_lines: more than %d lines cross the min_docs=%d "
            "threshold; raise min_docs or driver_max" %
            (driver_max, min_docs))
    return df


def remove_hot_lines(ds, text_col: str, hot: pd.DataFrame,
                     out_col: str = "clean_text"):
    """Pass 2: drop every line whose 128-bit hash is in ``hot``
    (broadcast ONCE via ray.put, looked up per batch with a vectorized
    two-column merge).  Reconstruction is zero-Python-per-row:
    filtered flat lines are re-wrapped with recomputed offsets and
    joined with ``pc.binary_join``.  Adds int64 ``n_kept`` /
    ``n_dropped`` columns; row order and multiplicity are preserved
    (a pure map — no exchange in this pass).
    """
    import ray
    import pyarrow.compute as pc

    hot_ref = ray.put(pa.Table.from_pandas(
        hot[["h", "h2"]].drop_duplicates(), preserve_index=False))

    class Clean:
        def __init__(self):
            self.hot = ray.get(hot_ref).to_pandas()

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, counts, row_ids = _split_lines(b[text_col])
            h, h2 = _line_hashes(flat)
            m = pd.DataFrame({"h": h, "h2": h2}).merge(
                self.hot, on=["h", "h2"], how="left", indicator=True)
            keep = (m["_merge"] != "both").to_numpy()
            kept_counts = np.bincount(
                row_ids[keep], minlength=len(b)).astype(np.int64)
            offs = np.concatenate(
                ([0], np.cumsum(kept_counts))).astype(np.int32)
            la = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), flat.filter(pa.array(keep)))
            out = b.drop_columns([text_col])
            out = out.append_column(out_col, pc.binary_join(la, "\n"))
            out = out.append_column("n_kept", pa.array(kept_counts))
            return out.append_column(
                "n_dropped", pa.array(counts - kept_counts))

    # concurrency=2: an actor pool sized to the session would reserve
    # every CPU and starve the upstream read tasks (deadlock on small
    # local sessions); 2 actors keep the pool busy while leaving CPUs
    # for reads.  On a real cluster raise alongside num_cpus.
    return ds.map_batches(Clean, batch_format="pyarrow", concurrency=2)


def host_hot_lines(ds, text_col: str, group_col: str, doc_col: str,
                   min_docs: int,
                   num_partitions: int = 16,
                   driver_max: int = 5_000_000) -> pd.DataFrame:
    """Pass 1 of PER-GROUP boilerplate stripping (CCNet-style
    per-domain template removal): within each ``group_col`` value
    (host), a line is boilerplate when it occurs in at least
    ``min_docs`` DISTINCT documents OF THAT GROUP — the per-domain
    counterpart of hot_lines' global rule (a line shared by two pages
    of one site is that site's template; the same line on two pages
    of different sites is coincidence). Returns a (group, h, h2)
    frame.

    Scale shape: the exchange moves only distinct (group, line-hash128,
    doc-hash64) rows, keyed on group — the per-(group, line)
    distinct-doc count resolves inside ONE partition. The result is
    template lines — bounded and broadcastable — under the same loud
    ``driver_max`` guard as hot_lines."""
    def pairs(b: pa.Table) -> pa.Table:
        flat, counts, row_ids = _split_lines(b[text_col])
        h, h2 = _line_hashes(flat)
        uh = hash64(
            b[doc_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        grp = np.asarray(b[group_col].to_numpy(zero_copy_only=False),
                         dtype=object)
        df = pd.DataFrame({"grp": grp[row_ids], "h": h, "h2": h2,
                           "uh": uh[row_ids]}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        nd = g.groupby(["grp", "h", "h2"], as_index=False).agg(
            c=("uh", "nunique"))
        return nd.loc[nd["c"] >= min_docs, ["grp", "h", "h2"]]

    hot = partition_map(ds.map_batches(pairs, batch_format="pyarrow"),
                        ["grp"], count_part, num_partitions)
    df = hot.limit(driver_max + 1).to_pandas()
    if len(df) > driver_max:
        raise ValueError(
            "host_hot_lines: more than %d boilerplate lines; raise "
            "min_docs or driver_max" % driver_max)
    if not len(df):
        # an empty Dataset pull drops the column names
        df = pd.DataFrame({"grp": pd.Series(dtype=object),
                           "h": pd.Series(dtype=np.int64),
                           "h2": pd.Series(dtype=np.int64)})
    return df


def remove_host_hot_lines(ds, text_col: str, group_col: str,
                          hot: pd.DataFrame,
                          out_col: str = "clean_text"):
    """Pass 2 of per-group boilerplate stripping: drop every line whose
    (group, 128-bit line hash) is in ``hot`` — the same broadcast-once
    / vectorized-merge / ``pc.binary_join`` rebuild as
    remove_hot_lines, with the group key joined alongside the content
    hashes. Pure map: row order and multiplicity preserved."""
    import ray
    import pyarrow.compute as pc

    hot_ref = ray.put(pa.Table.from_pandas(
        hot[["grp", "h", "h2"]].drop_duplicates(),
        preserve_index=False))

    class Clean:
        def __init__(self):
            self.hot = ray.get(hot_ref).to_pandas()

        def __call__(self, b: pa.Table) -> pa.Table:
            flat, counts, row_ids = _split_lines(b[text_col])
            h, h2 = _line_hashes(flat)
            grp = np.asarray(
                b[group_col].to_numpy(zero_copy_only=False),
                dtype=object)
            m = pd.DataFrame({"grp": grp[row_ids], "h": h,
                              "h2": h2}).merge(
                self.hot, on=["grp", "h", "h2"], how="left",
                indicator=True)
            keep = (m["_merge"] != "both").to_numpy()
            kept_counts = np.bincount(
                row_ids[keep], minlength=len(b)).astype(np.int64)
            offs = np.concatenate(
                ([0], np.cumsum(kept_counts))).astype(np.int32)
            la = pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), flat.filter(pa.array(keep)))
            out = b.drop_columns([text_col])
            out = out.append_column(out_col, pc.binary_join(la, "\n"))
            out = out.append_column("n_kept", pa.array(kept_counts))
            return out.append_column(
                "n_dropped", pa.array(counts - kept_counts))

    return ds.map_batches(Clean, batch_format="pyarrow", concurrency=2)


def duplicate_spans(ds, text_col: str, id_col: str, k: int = 20,
                    num_partitions: int = 8,
                    policy: str = "mark_all"):
    """Exact duplicate-SUBSTRING span detection (the ExactSubstr goal
    of Lee et al., ACL'22, recast as hashed-gram exchanges): find, for
    every document, the maximal character ranges covered by some
    k-gram that also appears in ANOTHER document. Returns
    ``(id_col, span_start, span_end, span_len)`` with ``span_end``
    exclusive — the ranges a substring-level dedup pass would cut.

    Three stages, two exchanges, nothing on the driver:
    1. map: every doc -> (h1, h2, doc, pos) rows for all character
       k-grams, hashed with the vectorized 128-bit rolling polynomial
       (``functions.hashing.rolling_kgram_hash128`` — one numpy pass
       per doc, no per-gram Python, char positions == SQL substring).
    2. exchange on (h1, h2): a gram kept iff its posting list spans
       >1 DISTINCT doc (cross-doc duplication only; within-doc repeats
       alone don't mark a span). Emits only the duplicated (doc, pos)
       hits — the text itself never crosses any exchange.
    3. exchange on doc: sort positions, merge overlapping/adjacent
       [pos, pos+k) intervals (vectorized gaps-and-islands cumsum).

    Scale accounting: stage 1 inflates 1 byte of corpus into one
    24-byte gram row — the honest cost of EXACT substring dedup (the
    reference-free sampling alternative is winnowing, implemented as
    ``doc_fingerprint``). Gram rows stream block-by-block through the
    hash exchange with backpressure and are never materialized in one
    place; 128-bit keys make cross-gram collisions negligible
    (identical standard to ``exact_dedup``). Skew: a gram duplicated
    across q docs costs q rows in one partition — bounded by doc
    count, and hot grams (boilerplate) are exactly the spans we want.

    ``policy``: ``"mark_all"`` marks the span in EVERY doc carrying
    it (the audit view); ``"keep_first"`` marks it only in docs whose
    id is above the gram's minimum doc id — the cut list that keeps
    exactly one copy of each duplicated region (Lee et al.'s
    dedup semantics), applied by ``remove_duplicate_spans``.
    """
    if policy not in ("mark_all", "keep_first"):
        raise ValueError("policy must be mark_all|keep_first: %r"
                         % policy)
    from ..functions.hashing import rolling_kgram_hash128

    def grams(b: pd.DataFrame) -> pd.DataFrame:
        h1s, h2s, docs, poss = [], [], [], []
        for did, txt in zip(b[id_col].to_numpy(),
                            b[text_col].to_numpy()):
            h1, h2 = rolling_kgram_hash128(txt, k)
            m = len(h1)
            if not m:
                continue
            h1s.append(h1)
            h2s.append(h2)
            docs.append(np.full(m, did, np.int64))
            poss.append(np.arange(m, dtype=np.int64))
        if not docs:
            return _empty({"h1": np.uint64, "h2": np.uint64,
                           "doc": np.int64, "pos": np.int64})
        return pd.DataFrame({"h1": np.concatenate(h1s),
                             "h2": np.concatenate(h2s),
                             "doc": np.concatenate(docs),
                             "pos": np.concatenate(poss)})

    gram_rows = ds.map_batches(grams, batch_format="pandas")

    def cross_doc_hits(g: pd.DataFrame) -> pd.DataFrame:
        dup = (g.drop_duplicates(["h1", "h2", "doc"])
               .groupby(["h1", "h2"], as_index=False)
               .agg(nd=("doc", "size"), mn=("doc", "min")))
        dup = dup.loc[dup["nd"] > 1, ["h1", "h2", "mn"]]
        hits = g.merge(dup, on=["h1", "h2"])
        if policy == "keep_first":
            hits = hits[hits["doc"] > hits["mn"]]
        return hits[["doc", "pos"]]

    hits = partition_map(gram_rows, ["h1", "h2"], cross_doc_hits,
                         num_partitions)

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "pos"], kind="mergesort")
        doc = g["doc"].to_numpy(np.int64)
        pos = g["pos"].to_numpy(np.int64)
        if not len(doc):
            return _empty({id_col: np.int64, "span_start": np.int64,
                           "span_end": np.int64, "span_len": np.int64})
        brk = np.ones(len(doc), bool)
        # new island when the doc changes or the gram starts past the
        # end of the previous interval [prev, prev + k)
        brk[1:] = (doc[1:] != doc[:-1]) | (pos[1:] > pos[:-1] + k)
        isle = np.cumsum(brk)
        f = pd.DataFrame({id_col: doc, "isle": isle, "pos": pos})
        out = f.groupby([id_col, "isle"], as_index=False).agg(
            span_start=("pos", "min"), span_end=("pos", "max"))
        out["span_end"] += k
        out["span_len"] = out["span_end"] - out["span_start"]
        return out[[id_col, "span_start", "span_end", "span_len"]]

    return partition_map(hits, ["doc"], merge_spans, num_partitions)


def remove_duplicate_spans(ds, text_col: str, id_col: str,
                           k: int = 20, num_partitions: int = 8):
    """APPLY the substring dedup decision: cut every duplicated span
    from all but its first (min doc id) carrier — the actual
    ExactSubstr dedup pass, not just the audit list. One extra
    doc-keyed exchange co-locates each doc's text with its
    ``keep_first`` spans; the cut is a vectorized-offsets splice per
    partition. Returns ``(id_col, clean_text, n_cut)`` for EVERY doc
    (zero-span docs pass through, n_cut=0)."""
    spans = duplicate_spans(ds, text_col, id_col, k=k,
                            num_partitions=num_partitions,
                            policy="keep_first")

    def tag_doc(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": b[id_col].to_numpy(np.int64),
            "text": b[text_col].to_numpy(),
            "s": np.full(len(b), -1, np.int64),
            "e": np.full(len(b), -1, np.int64)})

    def tag_span(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc": b[id_col].to_numpy(np.int64),
            "text": pd.Series([None] * len(b), dtype=object),
            "s": b["span_start"].to_numpy(np.int64),
            "e": b["span_end"].to_numpy(np.int64)})

    both = ds.map_batches(tag_doc, batch_format="pandas").union(
        spans.map_batches(tag_span, batch_format="pandas"))

    def cut(g: pd.DataFrame) -> pd.DataFrame:
        # Offset-array splice: docs sorted by id (unique — one row per
        # doc), spans sorted by (doc, start); each doc's span range is
        # two searchsorteds, cut totals one cumsum difference. The
        # only Python-level work left is the unavoidable string
        # slicing, and only for docs that actually carry spans.
        docs = g[g["s"] < 0].sort_values("doc", kind="mergesort")
        sp = g[g["s"] >= 0].sort_values(["doc", "s"], kind="mergesort")
        did = docs["doc"].to_numpy(np.int64)
        txt = docs["text"].to_numpy()
        if not len(did):
            return _empty({id_col: np.int64, "clean_text": object,
                           "n_cut": np.int64})
        sdoc = sp["doc"].to_numpy(np.int64)
        ss = sp["s"].to_numpy(np.int64)
        se = sp["e"].to_numpy(np.int64)
        lo = np.searchsorted(sdoc, did, side="left")
        hi = np.searchsorted(sdoc, did, side="right")
        csum = np.concatenate(([0], np.cumsum(se - ss)))
        cuts = csum[hi] - csum[lo]
        cleans = txt.copy()
        for j in np.flatnonzero(hi > lo):
            t = txt[j]
            # kept pieces: [0,s0), [e0,s1), ..., [e_last, len)
            starts = np.concatenate(([0], se[lo[j]:hi[j]]))
            ends = np.concatenate((ss[lo[j]:hi[j]], [len(t)]))
            cleans[j] = "".join(
                [t[a:b] for a, b in zip(starts, ends)])
        return pd.DataFrame({
            id_col: did,
            "clean_text": pd.Series(cleans, dtype=object),
            "n_cut": cuts.astype(np.int64)})

    return partition_map(both, ["doc"], cut, num_partitions)


def dedup_against_index(ds, content_col: str, id_col: str,
                        index_ds=None, num_partitions: int = 32):
    """INCREMENTAL exact dedup: drop rows whose 128-bit content hash
    already exists in a PRIOR run's hash index, and dedup the new
    batch against itself (min-id winner, like ``exact_dedup``) — the
    append-only ingestion pass a continuously-crawled corpus needs.

    ``index_ds``: Dataset of prior ``(__h, __h2)`` int64 hash rows
    (written by a previous run; pass None for a first run). Returns
    ``(id_col, __h, __h2)`` for the SURVIVING new rows — the caller
    appends exactly these hash rows to the index directory (one new
    parquet dir per run keeps the index itself append-only and
    resumable, the ``state/manifest`` pattern).

    Scale shape: the index is NEVER broadcast or driver-materialized —
    both sides stream tagged hash rows into ONE co-partitioning
    exchange on the content hash, and each partition anti-filters
    vectorized. Retry-idempotent: min-id winner + pure filter."""
    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch[content_col].to_numpy(zero_copy_only=False)
        h = hash64(vals)
        h2 = pd.util.hash_array(np.asarray(vals, dtype=object),
                                hash_key=_H2_KEY, categorize=False)
        return pa.table({
            id_col: batch[id_col],
            "__h": pa.array(h.astype(np.int64)),
            "__h2": pa.array(h2.astype(np.int64)),
            "__old": pa.array(np.zeros(len(batch), np.int64))})

    new = ds.select_columns([content_col, id_col]) \
        .map_batches(add_hash, batch_format="pyarrow")

    if index_ds is not None:
        def tag_old(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                id_col: np.full(len(b), -1, np.int64),
                "__h": b["__h"].to_numpy(np.int64),
                "__h2": b["__h2"].to_numpy(np.int64),
                "__old": np.ones(len(b), np.int64)})
        new = new.union(index_ds.map_batches(
            tag_old, batch_format="pandas"))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["__old"] == 1]
        nw = g[g["__old"] == 0].sort_values(id_col, kind="mergesort")
        # intra-run dedup: min id per hash
        nw = nw.groupby(["__h", "__h2"], sort=False).head(1)
        if len(old):
            m = nw.merge(old[["__h", "__h2"]].drop_duplicates(),
                         on=["__h", "__h2"], how="left",
                         indicator=True)
            nw = nw[(m["_merge"] == "left_only").to_numpy()]
        return nw[[id_col, "__h", "__h2"]]

    return partition_map(new, ["__h"], anti, num_partitions)
