"""Dedup family + ANN: planted near-dups, LSH recall, regression for
the grouped-keys segment bug."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nuclei_feature_extraction_ray.stages.ann import (ann_bruteforce,
                                                      ann_lsh)
from nuclei_feature_extraction_ray.stages.dedup import (_segment_pairs,
                                                        exact_dedup,
                                                        jaccard_pairs,
                                                        minhash_lsh_pairs,
                                                        simhash_pairs)


def _docs_with_near_dups():
    rng = np.random.default_rng(9)
    vocab = ["w%02d" % i for i in range(60)]
    texts, ids = [], []
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, 50)))
        ids.append(i)
    # planted near-dups: copy with one word changed
    for j, src in enumerate([0, 5, 10]):
        words = texts[src].split()
        words[3] = "CHANGED%d" % j
        texts.append(" ".join(words))
        ids.append(100 + j)
    # exact dup
    texts.append(texts[1])
    ids.append(200)
    # degenerate: empty + whitespace-only docs must produce NO
    # near-dup pairs (shingle set is empty; the SQL oracle's WHERE
    # clause matches this — ADVICE.md jaccard empty-doc item)
    texts.extend(["", "   \t "])
    ids.extend([300, 301])
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_segment_pairs_nonmonotonic_grouped_keys():
    """Regression: np.unique-based boundaries fabricated giant bogus
    segments for grouped-but-unsorted keys (quadratic blowup)."""
    keys = np.array([5, 5, 2, 2, 2, 9])   # grouped, not sorted
    starts, ends = _segment_pairs(keys)
    assert starts.tolist() == [0, 2, 5]
    assert ends.tolist() == [2, 5, 6]
    assert _segment_pairs(np.empty(0, np.int64))[0].size == 0


def test_exact_dedup_keeps_min_id():
    ds = rd.from_arrow(_docs_with_near_dups())
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert len(out) == 45                      # 46 docs, one exact dup
    row = out[out["n_copies"] == 2]
    assert len(row) == 1 and row["doc_id"].iloc[0] == 1


def test_jaccard_and_minhash_find_planted_pairs():
    ds = rd.from_arrow(_docs_with_near_dups())
    exact = jaccard_pairs(ds, "text", "doc_id", ngram=2,
                          threshold=0.5).to_pandas()
    got_exact = set(map(tuple, exact[["a", "b"]].to_numpy()))
    planted = {(0, 100), (5, 101), (10, 102), (1, 200)}
    assert planted <= got_exact
    # empty / whitespace-only docs never pair (engine == oracle WHERE)
    assert not {a for a, _ in got_exact} & {300, 301}
    assert not {b for _, b in got_exact} & {300, 301}

    lsh = minhash_lsh_pairs(ds, "text", "doc_id", ngram=2,
                            threshold=0.5).to_pandas()
    got_lsh = set(map(tuple, lsh[["a", "b"]].to_numpy()))
    # LSH recall on >=0.9-jaccard planted pairs should be total here
    assert planted <= got_lsh
    # signature-agreement estimate tracks exact jaccard (k=64 lanes:
    # stderr ~ sqrt(s(1-s)/64) ~ 0.06; allow 4 sigma)
    m = exact.merge(lsh, on=["a", "b"])
    assert len(m) >= len(planted)
    np.testing.assert_allclose(m["jaccard"], m["jaccard_est"], atol=0.25)
    # the exact dup pair estimates jaccard exactly 1
    dup = lsh[(lsh["a"] == 1) & (lsh["b"] == 200)]
    assert dup["jaccard_est"].iloc[0] == 1.0


def test_minhash_keyed_join_tier(monkeypatch):
    """Force the large-corpus path (signatures attached by keyed
    exchanges instead of broadcast): identical output."""
    from nuclei_feature_extraction_ray.stages import dedup as dd
    ds = rd.from_arrow(_docs_with_near_dups())
    small = minhash_lsh_pairs(ds, "text", "doc_id", ngram=2,
                              threshold=0.5).to_pandas()
    monkeypatch.setattr(dd, "SIG_BROADCAST_MAX_BYTES", 0)
    big = minhash_lsh_pairs(ds, "text", "doc_id", ngram=2,
                            threshold=0.5).to_pandas()
    k = ["a", "b"]
    pd.testing.assert_frame_equal(
        small.sort_values(k).reset_index(drop=True),
        big.sort_values(k).reset_index(drop=True))


def test_simhash_finds_exact_dup():
    ds = rd.from_arrow(_docs_with_near_dups())
    out = simhash_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert (1, 200) in got                     # identical docs: dist 0
    assert (out["hamming"] <= 3).all()


def test_ann_ivf_recall_vs_bruteforce():
    from nuclei_feature_extraction_ray.stages.ann import ann_ivf
    rng = np.random.default_rng(7)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(np.arange(n)),
                    "embedding": pa.array(list(mat),
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    exact = ann_bruteforce(ds, "embedding", "vec_id", [0, 1, 2], k=5)
    approx = ann_ivf(ds, "embedding", "vec_id", [0, 1, 2], k=5,
                     n_cells=8, n_probe_cells=4)
    rec = []
    for q in (0, 1, 2):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        rec.append(len(e & a) / 5)
    assert np.mean(rec) >= 0.4        # probing half the cells
    # scores of overlapping neighbors identical (same normalized dot)
    m = exact.merge(approx, on=["query_id", "neighbor_id"])
    np.testing.assert_allclose(m["score_x"], m["score_y"])
    # determinism under fixed seed
    again = ann_ivf(ds, "embedding", "vec_id", [0, 1, 2], k=5,
                    n_cells=8, n_probe_cells=4)
    pd.testing.assert_frame_equal(approx, again)


def test_ann_lsh_recall_vs_bruteforce():
    rng = np.random.default_rng(3)
    n, d = 400, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table({"vec_id": pa.array(np.arange(n)),
                    "embedding": pa.array(list(mat),
                                          pa.list_(pa.float32()))})
    ds = rd.from_arrow(tbl)
    exact = ann_bruteforce(ds, "embedding", "vec_id", [0, 1, 2], k=5)
    approx = ann_lsh(ds, "embedding", "vec_id", [0, 1, 2], k=5)
    assert list(exact.columns) == ["query_id", "neighbor_id", "rank",
                                   "score"]
    # per-query recall@5 of the LSH variant
    rec = []
    for q in (0, 1, 2):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        rec.append(len(e & a) / 5)
    assert np.mean(rec) >= 0.4      # hamming<=1 buckets of 8 planes
    # scores of overlapping neighbors identical
    m = exact.merge(approx, on=["query_id", "neighbor_id"])
    np.testing.assert_allclose(m["score_x"], m["score_y"])


def test_minhash_empty_docs_never_pair():
    """ADVICE r2: empty/whitespace-only docs share the all-max sentinel
    signature; they must be filtered before banding, not paired at
    jaccard_est=1.0 (exact Jaccard of an empty union is 0, and the
    jaccard SQL oracle excludes empty docs)."""
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "   \t ", None,
                          "alpha beta gamma delta",
                          "alpha beta gamma delta"], pa.string())})
    out = minhash_lsh_pairs(rd.from_arrow(tbl), "text", "doc_id",
                            ngram=2, threshold=0.2).to_pandas()
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert got == {(3, 4)}
    # keyed-join tier agrees
    import pytest as _pytest
    mp = _pytest.MonkeyPatch()
    from nuclei_feature_extraction_ray.stages import dedup as dd
    mp.setattr(dd, "SIG_BROADCAST_MAX_BYTES", 0)
    try:
        out2 = minhash_lsh_pairs(rd.from_arrow(tbl), "text", "doc_id",
                                 ngram=2, threshold=0.2).to_pandas()
    finally:
        mp.undo()
    assert set(map(tuple, out2[["a", "b"]].to_numpy())) == {(3, 4)}


def test_pair_of_index_enumerates_every_block_pair():
    """Streaming pair-index arithmetic (replaces the O(B^2) driver
    list): every (i <= j) pair exactly once, row-major."""
    from nuclei_feature_extraction_ray.stages.ann import _pair_of_index
    for B in (1, 2, 3, 7, 64, 513):
        t = np.arange(B * (B + 1) // 2, dtype=np.int64)
        i, j = _pair_of_index(t, B)
        want = [(a, b) for a in range(B) for b in range(a, B)]
        assert list(zip(i.tolist(), j.tolist())) == want


def test_embedding_near_dup_shuffled_ids_multi_block():
    """ADVICE r2 (high): pairs whose smaller doc id lives in the LATER
    block were dropped by the keep = a < b filter. With shuffled ids
    across several blocks the result must still equal the monolithic
    matmul."""
    from nuclei_feature_extraction_ray.stages.ann import (
        _norm_rows, embedding_near_dup)
    rng = np.random.default_rng(11)
    n, d = 120, 16
    mat = rng.standard_normal((n, d))
    # plant near-dup pairs whose ids are anti-monotone with row order
    mat[100] = mat[5] + 0.01 * rng.standard_normal(d)
    mat[3] = mat[110] + 0.01 * rng.standard_normal(d)
    ids = rng.permutation(n).astype(np.int64)   # ids NOT sorted by row
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(mat.astype(np.float64)),
                                          pa.list_(pa.float64()))})
    got = embedding_near_dup(rd.from_arrow(tbl), "embedding", "vec_id",
                             threshold=0.6, block_size=16)
    got_set = set(map(tuple, got[["a", "b"]].to_numpy()))

    nm = _norm_rows(mat)
    sims = nm @ nm.T
    ri, rj = np.nonzero(np.triu(sims >= 0.6, k=1))
    want = {(min(ids[x], ids[y]), max(ids[x], ids[y]))
            for x, y in zip(ri, rj)}
    assert got_set == want and len(want) >= 2
    # scores match the monolithic matmul bit-for-bit (after the shared
    # round-6)
    lut = {(min(ids[x], ids[y]), max(ids[x], ids[y])):
           round(float(sims[x, y]), 6) for x, y in zip(ri, rj)}
    for _, r in got.iterrows():
        assert lut[(r["a"], r["b"])] == r["cosine"]


def test_stack_fixed_size_list_slice_and_nulls():
    """ADVICE r2: the FixedSizeList fast path ignored the slice offset
    (wrong rows) and nulls (misaligned reshape)."""
    from nuclei_feature_extraction_ray.stages.ann import _stack
    base = pa.FixedSizeListArray.from_arrays(
        pa.array(np.arange(12.0)), 3)
    sl = base.slice(1, 2)
    np.testing.assert_array_equal(
        _stack(sl), np.arange(3.0, 9.0).reshape(2, 3))
    with_null = pa.array([[1.0, 2.0], None, [5.0, 6.0]],
                         pa.list_(pa.float64(), 2))
    out = _stack(with_null)
    np.testing.assert_array_equal(out[0], [1.0, 2.0])
    np.testing.assert_array_equal(out[2], [5.0, 6.0])


def test_embedding_near_dup_lsh_recall_and_exact_cosines():
    """Scale tier: LSH-bucketed near-dup finds a subset of the exact
    tier's pairs with exact cosines, and recall on the planted
    high-similarity pairs is total."""
    from nuclei_feature_extraction_ray.stages.ann import (
        embedding_near_dup, embedding_near_dup_lsh)
    rng = np.random.default_rng(21)
    n, d = 200, 24
    mat = rng.standard_normal((n, d))
    planted = [(10, 150), (30, 170), (50, 190)]
    for a, b in planted:
        mat[b] = mat[a] + 0.02 * rng.standard_normal(d)
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(list(mat),
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl)
    exact = embedding_near_dup(ds, "embedding", "vec_id",
                               threshold=0.8, block_size=64)
    approx = embedding_near_dup_lsh(ds, "embedding", "vec_id",
                                    threshold=0.8).to_pandas()
    e = set(map(tuple, exact[["a", "b"]].to_numpy()))
    a = set(map(tuple, approx[["a", "b"]].to_numpy()))
    assert a <= e                       # never a false pair
    assert set(planted) <= a            # near-identical pairs found
    m = exact.merge(approx, on=["a", "b"])
    np.testing.assert_array_equal(m["cosine_x"], m["cosine_y"])


# ---------------------------------------------------------------------------
# C4-style line dedup (round 3)
# ---------------------------------------------------------------------------

def _line_ds():
    import ray.data as rd
    docs = [
        {"doc": 1, "text": "boiler\nunique one\nboiler two"},
        {"doc": 2, "text": "boiler\nunique two"},
        {"doc": 3, "text": "boiler\nunique three\nboiler two"},
        {"doc": 4, "text": "solo line"},
        {"doc": 5, "text": "boiler"},          # whole doc is boilerplate
    ]
    return rd.from_items(docs)


def test_hot_lines_distinct_doc_threshold():
    from nuclei_feature_extraction_ray.stages.dedup import hot_lines
    hot = hot_lines(_line_ds(), "text", "doc", min_docs=3)
    # "boiler" in 4 docs; "boiler two" in only 2 -> not hot
    assert len(hot) == 1


def test_hot_lines_driver_guard_raises():
    import pytest
    from nuclei_feature_extraction_ray.stages.dedup import hot_lines
    with pytest.raises(ValueError, match="hot_lines"):
        hot_lines(_line_ds(), "text", "doc", min_docs=1, driver_max=2)


def test_remove_hot_lines_rebuild_and_counts():
    from nuclei_feature_extraction_ray.stages.dedup import (
        hot_lines, remove_hot_lines)
    ds = _line_ds()
    hot = hot_lines(ds, "text", "doc", min_docs=3)
    out = remove_hot_lines(ds, "text", hot).to_pandas() \
        .sort_values("doc").reset_index(drop=True)
    assert list(out["clean_text"]) == [
        "unique one\nboiler two", "unique two",
        "unique three\nboiler two", "solo line", ""]
    assert list(out["n_dropped"]) == [1, 1, 1, 0, 1]
    assert list(out["n_kept"]) == [2, 1, 2, 1, 0]


def test_semantic_dedup_prunes_planted_dups():
    import ray.data as rd
    from nuclei_feature_extraction_ray.stages.ann import (
        embedding_near_dup, semantic_dedup)
    rng = np.random.default_rng(11)
    d, n = 16, 256
    # 4 well-separated clusters + planted near-identical dups
    base = rng.standard_normal((4, d)) * 8
    mat = base[np.arange(n) % 4] + 0.5 * rng.standard_normal((n, d))
    planted = [(i, i + 128) for i in range(0, 24, 4)]
    for a, b in planted:
        mat[b] = mat[a] + 1e-4 * rng.standard_normal(d)
        mat[b - 1] = mat[a]            # force same parity cluster too
    tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(list(mat),
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tbl)
    out = semantic_dedup(ds, "embedding", "vec_id", threshold=0.999,
                         n_cells=4).to_pandas()
    assert len(out) == n
    keep = dict(zip(out["id"], out["keep"]))
    # planted near-identical rows are pruned, originals kept
    for a, b in planted:
        assert keep[a] and not keep[b]
    # determinism: same seed -> identical result
    out2 = semantic_dedup(ds, "embedding", "vec_id", threshold=0.999,
                          n_cells=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("id").reset_index(drop=True),
        out2.sort_values("id").reset_index(drop=True))
    # soundness vs the exact pair tier: every pruned row has SOME
    # >=threshold lower-id partner in the exact pair list
    exact = embedding_near_dup(ds, "embedding", "vec_id",
                               threshold=0.999, block_size=64)
    has_lower = set(exact["b"]) 
    pruned = set(out.loc[~out["keep"], "id"])
    assert pruned <= has_lower


def test_connected_components_tiers_agree():
    """Driver union-find == star loop == min-label loop, on a graph
    with a chain (1-2-3), a self-loop (9-9), a cross-component bridge
    (9-1), an isolated pair (5-6), and a PURE self-loop node (77)."""
    from nuclei_feature_extraction_ray.stages.graph import (
        attach_clusters, connected_components)

    edges = rd.from_pandas(pd.DataFrame(
        {"a": [1, 2, 5, 9, 9, 77], "b": [2, 3, 6, 9, 1, 77]}))

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    uf = norm(connected_components(edges).to_pandas())
    star = norm(connected_components(edges, method="star")
                .to_pandas())
    lab = norm(connected_components(edges, method="label",
                                    max_driver_edges=0).to_pandas())
    pd.testing.assert_frame_equal(uf, star)
    pd.testing.assert_frame_equal(uf, lab)
    assert dict(zip(uf["node"], uf["label"])) == {
        1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 77: 77}

    # singletons resolved by the attach join: 7 absent from edges
    ids = rd.from_pandas(pd.DataFrame({"doc_id": [1, 3, 5, 7]}))
    out = norm(attach_clusters(ids, connected_components(edges),
                               "doc_id").to_pandas())
    assert dict(zip(out["doc_id"], out["cluster"])) == {
        1: 1, 3: 1, 5: 5, 7: 7}
    assert dict(zip(out["doc_id"], out["is_rep"])) == {
        1: 1, 3: 0, 5: 1, 7: 1}


def test_rolling_kgram_hash_matches_direct():
    from nuclei_feature_extraction_ray.functions.hashing import (
        _RK_BASE1, _RK_BASE2, rolling_kgram_hash128)

    t = "abcabcXabcabc zz abcabc"
    k = 6
    h1, h2 = rolling_kgram_hash128(t, k)
    assert len(h1) == len(t) - k + 1
    M = 1 << 64

    def direct(g, base):
        return sum(ord(c) * pow(base, j, M)
                   for j, c in enumerate(g)) % M

    for i in range(len(h1)):
        assert int(h1[i]) == direct(t[i:i + k], _RK_BASE1)
        assert int(h2[i]) == direct(t[i:i + k], _RK_BASE2)
    # equal grams collide, the pair (h1, h2) separates distinct grams
    seen = {}
    for i in range(len(h1)):
        seen.setdefault(t[i:i + k], set()).add(
            (int(h1[i]), int(h2[i])))
    assert all(len(v) == 1 for v in seen.values())
    assert len({next(iter(v)) for v in seen.values()}) == len(seen)
    # shorter than k -> empty
    assert rolling_kgram_hash128("ab", k)[0].size == 0


def test_duplicate_spans_planted():
    """Cross-doc shared substrings produce merged spans; within-doc
    repetition alone does not; disjoint docs yield nothing."""
    from nuclei_feature_extraction_ray.stages.dedup import (
        duplicate_spans)

    shared = "the boilerplate footer text shared by both pages!"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "unique preamble one. " + shared + " tail A",
            "different intro here::: " + shared + " tail B",
            # within-doc repeat only — k-gram repeats but in ONE doc
            "zzqqwwrrttyyuuiioopp" * 3,
            "completely unrelated content with no overlap at all",
        ]})
    out = duplicate_spans(rd.from_pandas(docs), "text", "doc_id",
                          k=20, num_partitions=4).to_pandas()
    got = {int(d): (int(s), int(e))
           for d, s, e in zip(out["doc_id"], out["span_start"],
                              out["span_end"])}
    assert set(got) == {1, 2}
    # each span covers the full shared substring
    for did, base in ((1, "unique preamble one. "),
                      (2, "different intro here::: ")):
        s, e = got[did]
        lo = len(base)
        assert s <= lo and e >= lo + len(shared)
    # spans never exceed doc bounds
    for did, (s, e) in got.items():
        assert 0 <= s < e <= len(docs.loc[docs.doc_id == did,
                                          "text"].iloc[0])


def test_duplicate_spans_matches_bruteforce():
    """Randomized corpora (3 seeds): engine output == O(n^2)
    substring-search reference (positions whose k-gram occurs in
    another doc, merged into maximal intervals)."""
    from nuclei_feature_extraction_ray.stages.dedup import (
        duplicate_spans)

    for seed in (0, 1, 2):
        _check_duplicate_spans_seed(seed)


def _check_duplicate_spans_seed(seed):
    from nuclei_feature_extraction_ray.stages.dedup import (
        duplicate_spans)

    rng = np.random.default_rng(seed)
    words = ["aa", "bob", "cat", "dd", "eel", "fig", "go", "hat"]
    texts = []
    for _ in range(12):
        n = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(words, n)))
    docs = pd.DataFrame({"doc_id": np.arange(len(texts)),
                         "text": texts})
    k = 8
    out = duplicate_spans(rd.from_pandas(docs), "text", "doc_id",
                          k=k, num_partitions=4).to_pandas()
    got = sorted(map(tuple, out[["doc_id", "span_start",
                                 "span_end"]].to_numpy()))

    want = []
    for i, t in enumerate(texts):
        dup_pos = [p for p in range(len(t) - k + 1)
                   if any(t[p:p + k] in o
                          for j, o in enumerate(texts) if j != i)]
        spans = []
        for p in dup_pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        want.extend((i, s, e) for s, e in spans)
    assert got == sorted(want)


def test_star_components_long_chain_log_rounds():
    """A 200-node path has diameter 199: min-label needs ~200 rounds,
    the star loop must finish within O(log n) — max_rounds=16 would
    raise loudly if it didn't. Also: a random graph agrees with the
    driver union-find."""
    from nuclei_feature_extraction_ray.stages.graph import (
        connected_components)

    n = 200
    chain = rd.from_pandas(pd.DataFrame(
        {"a": np.arange(n - 1) + 1000, "b": np.arange(1, n) + 1000}))
    out = connected_components(chain, method="star", max_rounds=16,
                               num_partitions=4).to_pandas()
    assert len(out) == n
    assert (out["label"] == 1000).all()

    rng = np.random.default_rng(3)
    a = rng.integers(0, 60, 80)
    b = rng.integers(0, 60, 80)
    g = rd.from_pandas(pd.DataFrame({"a": a, "b": b}))

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    uf = norm(connected_components(g).to_pandas())
    star = norm(connected_components(g, method="star",
                                     num_partitions=4).to_pandas())
    pd.testing.assert_frame_equal(uf, star)


def test_near_dedup_keep_planted(tmp_path):
    """The scale-path composition (LSH pairs -> CC -> keep flags)
    groups planted near-dups under the min doc id and keeps exactly
    one representative per cluster."""
    import pyarrow.parquet as pq
    from nuclei_feature_extraction_ray.pipelines.queries import QUERIES

    tbl = _docs_with_near_dups()
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = QUERIES["near_dedup_keep"](str(tmp_path)).to_pandas()

    assert len(out) == tbl.num_rows            # every doc labeled
    cl = dict(zip(out["doc_id"], out["cluster"]))
    rep = dict(zip(out["doc_id"], out["is_rep"]))
    # planted near-dups + the exact dup join their source's cluster
    for src, dup in ((0, 100), (5, 101), (10, 102), (1, 200)):
        assert cl[dup] == cl[src] == src
        assert rep[src] == 1 and rep[dup] == 0
    # empty docs are their own singletons (never pair)
    assert cl[300] == 300 and cl[301] == 301 and rep[300] == 1
    # exactly one representative per cluster
    g = out.groupby("cluster")["is_rep"].sum()
    assert (g == 1).all()


def test_remove_duplicate_spans_keep_first():
    """keep_first cuts the shared region from the LATER doc only and
    splices the remainder correctly."""
    from nuclei_feature_extraction_ray.stages.dedup import (
        remove_duplicate_spans)

    shared = "shared boilerplate region both docs carry here"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "first doc keeps: " + shared + " :tail one",
            "second doc loses " + shared + " :tail two",
            "untouched third document with unique words only",
        ]})
    out = remove_duplicate_spans(rd.from_pandas(docs), "text",
                                 "doc_id", k=20, num_partitions=4) \
        .to_pandas().set_index("doc_id")
    assert len(out) == 3
    # first carrier intact
    assert out.loc[1, "clean_text"] == docs.loc[0, "text"]
    assert out.loc[1, "n_cut"] == 0
    # later carrier loses the shared region (and nothing survives of
    # it); the unique prefix remains
    assert shared not in out.loc[2, "clean_text"]
    assert out.loc[2, "clean_text"].startswith("second doc loses")
    assert out.loc[2, "n_cut"] > len(shared) - 1
    assert out.loc[3, "n_cut"] == 0


def test_dedup_against_index_incremental(tmp_path):
    """Run 1 dedups intra-batch; its hash rows become the index; run 2
    drops everything already ingested and keeps only genuinely new
    content."""
    import pyarrow.parquet as pq
    from nuclei_feature_extraction_ray.stages.dedup import (
        dedup_against_index)

    r1 = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["alpha", "beta", "alpha", "gamma"]})
    out1 = dedup_against_index(rd.from_pandas(r1), "text", "doc_id",
                               num_partitions=4).to_pandas()
    assert sorted(out1["doc_id"]) == [1, 2, 4]      # intra-run dedup

    idx_dir = tmp_path / "index" / "run=1"
    idx_dir.mkdir(parents=True)
    pq.write_table(
        pa.Table.from_pandas(out1[["__h", "__h2"]],
                             preserve_index=False),
        str(idx_dir / "part.parquet"))

    r2 = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["beta", "delta", "gamma", "delta"]})
    idx = rd.read_parquet(str(tmp_path / "index"))
    out2 = dedup_against_index(rd.from_pandas(r2), "text", "doc_id",
                               index_ds=idx,
                               num_partitions=4).to_pandas()
    # beta/gamma already ingested; delta new (min id wins intra-run)
    assert sorted(out2["doc_id"]) == [11]


def test_kmeans_lloyd_deterministic_and_monotone(sf_small):
    """Lloyd over the embeddings table: assignments are
    bit-deterministic across runs (integer-quantized partial sums ->
    fold-order-free centroid reduction), inertia never increases
    across iterations, and every vector lands in exactly one of k
    clusters."""
    from nuclei_feature_extraction_ray.stages.ann import kmeans_lloyd

    ds = rd.read_parquet(sf_small + "/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out1, h1 = kmeans_lloyd(ds, "embedding", "vec_id", k=8, iters=4)
    a1 = out1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    out2, h2 = kmeans_lloyd(ds, "embedding", "vec_id", k=8, iters=4)
    a2 = out2.to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a1, a2)
    assert h1 == h2
    # monotone non-increasing up to IEEE summation noise
    for prev, cur in zip(h1, h1[1:]):
        assert cur <= prev * (1 + 1e-9)
    assert a1["cluster"].between(0, 7).all()
    n = len(pd.read_parquet(sf_small + "/embeddings.parquet"))
    assert len(a1) == n
