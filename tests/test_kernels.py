"""Kernel unit tests vs slow/obvious oracles (SURVEY.md §5 item 1)."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nuclei_feature_extraction_ray.functions.text_stats import (
    text_stats_frame)
from nuclei_feature_extraction_ray.functions.quality import quality_frame
from nuclei_feature_extraction_ray.functions.langid import langid_frame
from nuclei_feature_extraction_ray.functions.hashing import (
    hash64, hamming64, minhash_signatures, simhash64, winnow_fingerprint,
    word_shingles)
from nuclei_feature_extraction_ray.state.deque import (
    MonotonicDeque, sliding_extreme, sliding_extreme_time)
from nuclei_feature_extraction_ray.stages.window import (
    row_window_lefts, segment_codes, segment_starts, time_window_lefts,
    windowed_stats)


def test_text_stats_hand_computed():
    s = pd.Series(["ab cd ab", "", "A1\nb2", None])
    f = text_stats_frame(s)
    assert f["n_chars"].tolist() == [8, 0, 5, 0]
    assert f["n_tokens"].tolist() == [3, 0, 2, 0]
    assert f["n_lines"].tolist() == [1, 0, 2, 0]
    assert f["ttr"][0] == pytest.approx(2 / 3)
    assert np.isnan(f["ttr"][1])
    assert f["alpha_ratio"][2] == pytest.approx(2 / 5)
    assert f["digit_ratio"][2] == pytest.approx(2 / 5)
    assert f["ws_ratio"][2] == pytest.approx(1 / 5)
    assert f["upper_ratio"][2] == pytest.approx(1 / 5)
    assert f["mean_token_len"][0] == pytest.approx(6 / 3)


def test_text_stats_nonascii():
    f = text_stats_frame(pd.Series(["héllo wörld 数据"]))
    # é ö and CJK land in other_ratio by design (ASCII classes).
    assert f["n_tokens"][0] == 3
    assert f["other_ratio"][0] == pytest.approx(4 / 14)
    assert f["n_bytes"][0] > f["n_chars"][0]


def test_quality_bounds():
    q = quality_frame(pd.Series(["the cat sat on the mat " * 20, "!!!"]))
    assert 0 <= q["quality"][0] <= 1.0001
    assert q["stop_ratio"][0] > 0.2
    assert q["quality"][1] < q["quality"][0]


def test_langid_scripts():
    f = langid_frame(pd.Series([
        "the quick brown fox is over the dog",
        "der schnelle braune Fuchs über straße",
        "le renard est par-dessus le chien",
        "数据 流 批 查询 连接 窗口",
        "بيانات تدفق دفعة استعلام",
        ""]))
    assert f["pred_lang"].tolist()[:5] == ["en", "de", "fr", "zh", "ar"]
    assert f["pred_lang"][5] == "und"


def test_hash64_stable_and_spread():
    a = hash64(["x", "y", "x"])
    assert a[0] == a[2] and a[0] != a[1]
    # must equal a fresh call (process-stable is covered by pandas key)
    assert (hash64(["x", "y", "x"]) == a).all()


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(0)
    base = [f"tok{i}" for i in range(400)]
    t1 = base[:300]
    t2 = base[100:400]  # true overlap 200/400 = 0.5
    s1 = word_shingles(t1, 1)
    s2 = word_shingles(t2, 1)
    sig = minhash_signatures([s1, s2], k=256)
    est = (sig[0] == sig[1]).mean()
    true = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    assert abs(est - true) < 0.1


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely unrelated content here"
    ha, hb, hc = simhash64([hash64(t.split()) for t in (a, b, c)])
    close = hamming64(np.array([ha]), np.array([hb]))[0]
    far = hamming64(np.array([ha]), np.array([hc]))[0]
    assert close < far


def test_winnow_fingerprint_contained():
    t = "abcdefghijklmnopqrstuvwxyz" * 4
    fp = winnow_fingerprint(t)
    all_grams = hash64([t[i:i + 8] for i in range(len(t) - 7)])
    assert np.isin(fp, all_grams).all()
    assert (winnow_fingerprint(t) == fp).all()


# -- deque / sparse-table / pandas triple agreement -------------------------

def test_monotonic_deque_matches_pandas_rows():
    rng = np.random.default_rng(1)
    v = rng.normal(size=500)
    for mode, fn in (("min", "min"), ("max", "max")):
        got = sliding_extreme(v, 7, mode)
        want = pd.Series(v).rolling(7, min_periods=1).agg(fn).to_numpy()
        np.testing.assert_allclose(got, want)


def test_deque_time_window_matches_bruteforce():
    rng = np.random.default_rng(2)
    ts = np.sort(rng.integers(0, 10_000, 300)).astype(np.int64)
    v = rng.normal(size=300)
    span = 500
    got = sliding_extreme_time(ts, v, span, "max")
    want = np.array([v[(ts >= ts[i] - span) & (ts <= ts[i])].max()
                     for i in range(len(v))])
    np.testing.assert_allclose(got, want)


def test_windowed_stats_multi_entity_vs_pandas():
    rng = np.random.default_rng(3)
    keys = np.sort(rng.integers(0, 20, 400))
    v = rng.normal(size=400)
    codes = segment_codes(keys)
    lefts = row_window_lefts(codes, 5)
    st = windowed_stats(v, lefts)
    df = pd.DataFrame({"k": keys, "v": v})
    r = df.groupby("k")["v"].rolling(5, min_periods=1)
    np.testing.assert_allclose(
        st["min"], r.min().reset_index(level=0, drop=True).to_numpy())
    np.testing.assert_allclose(
        st["max"], r.max().reset_index(level=0, drop=True).to_numpy())
    np.testing.assert_allclose(
        st["mean"], r.mean().reset_index(level=0, drop=True).to_numpy())
    np.testing.assert_allclose(
        st["count"], r.count().reset_index(level=0, drop=True).to_numpy())


def test_time_window_lefts_segments_and_deque_agree():
    rng = np.random.default_rng(4)
    n = 300
    keys = np.sort(rng.integers(0, 10, n))
    ts = np.empty(n, np.int64)
    for k in np.unique(keys):
        m = keys == k
        ts[m] = np.sort(rng.integers(0, 100_000, m.sum()))
    v = rng.normal(size=n)
    codes = segment_codes(keys)
    lefts = time_window_lefts(codes, ts, 5_000)
    st = windowed_stats(v, lefts)
    # per-entity deque oracle
    for k in np.unique(keys):
        m = keys == k
        want_max = sliding_extreme_time(ts[m], v[m], 5_000, "max")
        np.testing.assert_allclose(st["max"][m], want_max)
        # brute force left bounds
        idx = np.nonzero(m)[0]
        for pos, i in enumerate(idx):
            inwin = (ts[m] >= ts[i] - 5_000) & (ts[m] <= ts[i])
            assert st["count"][i] == inwin[:pos + 1].sum()


def test_segment_helpers():
    codes = segment_codes(np.array(["a", "a", "b", "c", "c", "c"]))
    assert codes.tolist() == [0, 0, 1, 2, 2, 2]
    assert segment_starts(codes).tolist() == [0, 0, 2, 3, 3, 3]
    deque = MonotonicDeque("min", window_rows=2)
    outs = []
    for i, v in enumerate([5.0, 3.0, 4.0, 1.0]):
        deque.push(i, v)
        outs.append(deque.extreme())
    assert outs == [5.0, 3.0, 3.0, 1.0]


def test_salted_time_windows_equal_unsalted():
    """Hot-entity salting with window-sized overlap + emit filtering
    must reproduce the unsalted rolling result exactly (SURVEY.md §7
    hard part b)."""
    from nuclei_feature_extraction_ray.stages.window import (
        salted_time_windows, windowed_stats, time_window_lefts,
        segment_codes)
    rng = np.random.default_rng(11)
    ts = np.sort(rng.integers(0, 1_000_000, 800)).astype(np.int64)
    v = rng.normal(size=800)
    span = 50_000
    codes = segment_codes(np.zeros(800, np.int64))
    want = windowed_stats(v, time_window_lefts(codes, ts, span))
    for nb in (2, 3, 7):
        got = salted_time_windows(ts, v, span, nb)
        for k in ("min", "max", "mean", "count", "sum"):
            np.testing.assert_allclose(got[k], want[k], err_msg=k)


def test_repetition_hand_computed():
    from nuclei_feature_extraction_ray.functions.repetition import (
        repetition_frame)
    f = repetition_frame(pd.Series([
        "a b a b a b",         # top 2-gram "a b" x3 (len 3)
        "x",                   # single token, no grams
        "",                    # empty text
        "w w w w",             # one token repeated
        None,
    ]))
    assert f["n_tokens"].tolist() == [6, 1, 1, 4, 1]
    assert f["max_tok_frac"][0] == pytest.approx(3 / 6)
    # "a b" occurs 3x, "b a" 2x -> top chars = 3*3 = 9 over 11 chars
    assert f["top2_char_frac"][0] == pytest.approx(9 / 11)
    # 3-grams "a b a" x2 (len 5), "b a b" x2 -> (2*5 + 2*5) / 11
    assert f["dup3_char_frac"][0] == pytest.approx(20 / 11)
    assert f["top2_char_frac"][1] == 0.0
    assert f["top2_char_frac"][2] == 0.0
    assert f["dup3_char_frac"][2] == 0.0
    assert f["max_tok_frac"][3] == 1.0
    # "w w" x3 of len 3 over 7 chars
    assert f["top2_char_frac"][3] == pytest.approx(9 / 7)


def test_repetition_matches_duckdb_on_edge_cases():
    import duckdb
    from nuclei_feature_extraction_ray.functions.repetition import (
        repetition_frame, repetition_sql)
    texts = ["a b a b a b", "x", "", "w w w w", "a  b", "one two three",
             "t t t s s", "spam " * 50, ("p q r " * 9).strip()]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(repetition_sql("documents")).df() \
              .sort_values("doc_id").reset_index(drop=True)
    got = repetition_frame(df["text"])
    got.insert(0, "doc_id", df["doc_id"].to_numpy())
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=True)


def test_normalize_matches_duckdb_incl_unicode():
    import duckdb
    from nuclei_feature_extraction_ray.functions.normalize import (
        normalize_frame, normalize_sql)
    texts = ["  Hello   WORLD  ", "a\tb\n\nc", "", "Café CRÈME",
             "tabs\t\tand\f\rforms", None, "ALL CAPS", "é vs é"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(normalize_sql("documents")).df() \
              .sort_values("doc_id").reset_index(drop=True)
    got = normalize_frame(df["text"])
    got.insert(0, "doc_id", df["doc_id"].to_numpy())
    # DuckDB md5(NULL) is NULL; the engine treats missing text as ""
    want.loc[df["text"].isna(), "norm_md5"] = \
        got.loc[df["text"].isna(), "norm_md5"]
    want.loc[df["text"].isna(), "n_chars_norm"] = 0
    want["n_chars_norm"] = want["n_chars_norm"].astype(np.int64)
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=True)
    # NFC folds the combining-accent variant onto the composed one
    n = normalize_frame(pd.Series(["é", "é"]))
    assert n["norm_md5"][0] == n["norm_md5"][1]


def test_interval_pairs_boundaries_and_keys():
    """Half-open [t+lo, t+hi) window, multi-key, vs brute force."""
    from nuclei_feature_extraction_ray.stages.rangejoin import \
        interval_pairs

    rng = np.random.default_rng(7)
    rk = rng.integers(0, 6, 200).astype(np.int64)
    rt = rng.integers(0, 1000, 200).astype(np.int64)
    order = np.lexsort((rt, rk))
    rk, rt = rk[order], rt[order]
    lk = rng.integers(0, 8, 60).astype(np.int64)   # some keys absent
    lt = rng.integers(0, 1000, 60).astype(np.int64)
    lo, hi = 10, 120
    li, ri = interval_pairs(rk, rt, lk, lt, lo, hi)
    got = set(zip(li.tolist(), ri.tolist()))
    want = {(i, j) for i in range(len(lk)) for j in range(len(rk))
            if rk[j] == lk[i] and lt[i] + lo <= rt[j] < lt[i] + hi}
    assert got == want


def test_interval_pairs_exact_tie_inclusive_exclusive():
    from nuclei_feature_extraction_ray.stages.rangejoin import \
        interval_pairs

    rk = np.array([1, 1, 1], np.int64)
    rt = np.array([10, 20, 30], np.int64)
    # window [10, 30): includes ts==10 (lo inclusive), excludes 30.
    li, ri = interval_pairs(rk, rt, np.array([1], np.int64),
                            np.array([10], np.int64), 0, 20)
    assert sorted(ri.tolist()) == [0, 1]
    # empty right / empty left
    li, ri = interval_pairs(np.array([], np.int64),
                            np.array([], np.int64),
                            np.array([1], np.int64),
                            np.array([5], np.int64), 0, 10)
    assert len(li) == 0
    li, ri = interval_pairs(rk, rt, np.array([], np.int64),
                            np.array([], np.int64), 0, 10)
    assert len(li) == 0


def test_props_extract_regex_matches_json_extract():
    """The vectorized regex path must agree with DuckDB json_extract
    on present, missing, negative, and spaced fields."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    props = ['{"k": 69}', '{"j": 1}', '{"k":-3}', '{ "k" : 12 , "j":0}',
             '{}', None]
    m = pc.extract_regex(pa.array(props), r'"k"\s*:\s*(?P<v>-?\d+)')
    got = pc.cast(pc.struct_field(m, "v"), pa.int64()).to_pylist()
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        "SELECT CAST(json_extract(p, '$.k') AS BIGINT) "
        "FROM (SELECT unnest(?) AS p)", [props]).fetchall()]
    assert got == want


def test_clamped_parts_floor_cap_and_no_hint():
    """Exchange-width clamp (stages.partition.clamped_parts): no hint
    -> caller's width untouched; tiny hint -> floor(8) capped at the
    caller's width; big hint -> caller's width (the scale-design cap
    wins); hint always cleared by the registry wrapper."""
    from nuclei_feature_extraction_ray.stages import partition as P

    saved = list(P.INPUT_SIZE_HINT)
    try:
        P.INPUT_SIZE_HINT.clear()
        assert P.clamped_parts(32) == 32          # no hint: untouched
        P.INPUT_SIZE_HINT.append(1 << 20)         # 1 MiB input
        assert P.clamped_parts(32) == 8           # floor
        assert P.clamped_parts(4) == 4            # cap below floor wins
        P.INPUT_SIZE_HINT.append(1 << 30)         # +1 GiB input
        assert P.clamped_parts(32) == 32          # big data: cap wins
        assert P.clamped_parts(300) == 257        # fit between floor/cap
    finally:
        P.INPUT_SIZE_HINT.clear()
        P.INPUT_SIZE_HINT.extend(saved)


def test_registry_wrapper_clears_size_hint(sf_small):
    """A registered query leaves no stale hint behind (pipelines built
    outside the registry — the bench headline — must see none)."""
    from nuclei_feature_extraction_ray.pipelines.queries import QUERIES
    from nuclei_feature_extraction_ray.stages import partition as P

    QUERIES["doc_sample"](sf_small)
    assert P.INPUT_SIZE_HINT == []


def test_size_hint_is_thread_local():
    """Concurrent query builders (one per thread) must not cross-clamp
    each other's exchange widths via the shared module global."""
    import threading

    from nuclei_feature_extraction_ray.stages import partition as P

    P.INPUT_SIZE_HINT.clear()
    P.INPUT_SIZE_HINT.append(1 << 30)
    seen: dict = {}

    def other():
        seen["before"] = list(P.INPUT_SIZE_HINT)
        P.INPUT_SIZE_HINT.append(1 << 10)
        seen["after"] = list(P.INPUT_SIZE_HINT)

    t = threading.Thread(target=other)
    t.start()
    t.join()
    assert seen["before"] == []            # other thread saw no hint
    assert seen["after"] == [1 << 10]
    assert P.INPUT_SIZE_HINT == [1 << 30]  # ours untouched by theirs
    P.INPUT_SIZE_HINT.clear()


def test_read_dim_guard_raises_on_fact_sized_table(sf_small):
    """The broadcast-dimension guard rejects an over-sized table on
    parquet METADATA, before reading any bytes."""
    import pytest as _pytest

    from nuclei_feature_extraction_ray.pipelines.queries import _read_dim

    path = sf_small + "/customer.parquet"
    df = _read_dim(path, ["c_custkey"])          # normal: fits
    assert len(df) > 1
    with _pytest.raises(ValueError, match="too large to broadcast"):
        _read_dim(path, ["c_custkey"], max_rows=1)


def test_rolling_quantiles_vs_bruteforce():
    """add_rolling_quantiles == per-row brute-force quantile with the
    DuckDB quantile_cont interpolation formula, across entities and
    clipped windows."""
    import pandas as pd

    from nuclei_feature_extraction_ray.stages.window import \
        add_rolling_quantiles

    rng = np.random.RandomState(7)
    n = 400
    g = pd.DataFrame({
        "k": np.sort(rng.randint(0, 9, n)),
        "v": rng.rand(n),
    })
    g = add_rolling_quantiles(g, "k", "v", 5,
                              {"q50": 0.5, "q25": 0.25, "q75": 0.75})
    ks = g["k"].to_numpy()
    vs = g["v"].to_numpy()
    for i in range(n):
        lo = i
        while lo > 0 and ks[lo - 1] == ks[i] and i - lo < 4:
            lo -= 1
        w = np.sort(vs[lo:i + 1])
        for name, q in (("q50", .5), ("q25", .25), ("q75", .75)):
            pos = q * (len(w) - 1)
            j = int(np.floor(pos))
            frac = pos - j
            hj = min(j + 1, len(w) - 1)
            want = w[j] * (1.0 - frac) + w[hj] * frac
            assert g[name].iloc[i] == want, (i, name)


def test_ewma_rows_vs_sequential_fold():
    """add_ewma_rows' masked vectorized passes == the literal
    sequential recurrence over each row's trailing window."""
    import pandas as pd

    from nuclei_feature_extraction_ray.stages.window import add_ewma_rows

    rng = np.random.RandomState(11)
    n = 300
    g = pd.DataFrame({
        "k": np.sort(rng.randint(0, 5, n)),
        "v": rng.rand(n),
    })
    out = add_ewma_rows(g.copy(), "k", "v", 20, 0.25, "e")
    ks = g["k"].to_numpy()
    vs = g["v"].to_numpy()
    for i in range(n):
        lo = i
        while lo > 0 and ks[lo - 1] == ks[i] and i - lo < 19:
            lo -= 1
        acc = vs[lo]
        for j in range(lo + 1, i + 1):
            acc = acc * 0.75 + vs[j] * 0.25
        assert out["e"].iloc[i] == acc, i


def test_concurrency_sweep_hand_case():
    """Sweep-line edge semantics: closed intervals overlap at the
    boundary (start ties before end), zero-length intervals count, and
    groups sweep independently."""
    import pandas as pd

    from nuclei_feature_extraction_ray.stages.window import \
        concurrency_sweep

    # group 0: [0,10], [10,20] (touch at 10 -> concurrent), [15,15]
    # group 1: [0,5] alone
    g = pd.DataFrame({
        "day": np.array([0, 0, 0, 0, 0, 0, 1, 1], np.int64),
        "ts": np.array([0, 10, 10, 20, 15, 15, 0, 5], np.int64),
        "delta": np.array([1, -1, 1, -1, 1, -1, 1, -1], np.int64),
    })
    out = concurrency_sweep(g, "day", "ts", "delta") \
        .sort_values("day").reset_index(drop=True)
    assert out["max_concurrent"].tolist() == [2, 1]
    assert out["n_sessions"].tolist() == [3, 1]


def test_rolling_distinct_vs_bruteforce():
    """add_rolling_distinct == per-row set() over the trailing window."""
    import pandas as pd

    from nuclei_feature_extraction_ray.stages.window import \
        add_rolling_distinct

    rng = np.random.RandomState(3)
    n = 300
    g = pd.DataFrame({
        "k": np.sort(rng.randint(0, 6, n)),
        "v": rng.choice(list("abcd"), n),
    })
    out = add_rolling_distinct(g.copy(), "k", "v", 8, "d")
    ks = g["k"].to_numpy()
    vs = g["v"].to_numpy()
    for i in range(n):
        lo = i
        while lo > 0 and ks[lo - 1] == ks[i] and i - lo < 7:
            lo -= 1
        assert out["d"].iloc[i] == len(set(vs[lo:i + 1])), i


def test_asof_forward_direction_hand_case():
    """local_asof_merge direction='forward' picks the EARLIEST snapshot
    at-or-after the probe (inclusive), nulls past the last one."""
    import pandas as pd

    from nuclei_feature_extraction_ray.stages.asof import local_asof_merge

    pr = pd.DataFrame({"k": [1, 1, 1], "ts": [10, 20, 99]})
    sn = pd.DataFrame({"k": [1, 1, 1], "vts": [12, 20, 30],
                       "val": ["a", "b", "c"]})
    out = local_asof_merge(pr, sn, "k", "ts", "vts", ["val"],
                           ["k", "ts"], direction="forward")
    assert out["val"].tolist()[:2] == ["a", "b"]   # 20 matches exactly
    assert pd.isna(out["val"].iloc[2])             # nothing after 99


def test_bpe_merges_matches_reference(sf_small):
    """bpe_merges vs an INDEPENDENT reference trainer: vocab built by
    DuckDB (not the engine's exchange), merge loop written with
    Counter/sorted instead of the engine's dict/min — exact frame
    equality proves both the distributed vocab collapse and the merge
    arithmetic; a second run proves determinism."""
    from collections import Counter

    import duckdb

    from nuclei_feature_extraction_ray.pipelines.queries import (
        QUERIES, _BPE_ROUNDS)

    got = QUERIES["bpe_merges"](sf_small)
    got2 = QUERIES["bpe_merges"](sf_small)
    pd.testing.assert_frame_equal(got, got2)

    vocab = duckdb.connect().execute("""
        WITH toks AS (
          SELECT unnest(string_split_regex(
                   trim(text, E' \t\n\r\f'), '[ \t\n\r\f]+')) AS t
          FROM read_parquet('%s/documents.parquet')
          WHERE trim(text, E' \t\n\r\f') <> '')
        SELECT t, count(*) AS n FROM toks WHERE t <> ''
        GROUP BY t ORDER BY t""" % sf_small).df()

    words = {tuple(t): int(n) for t, n in zip(vocab["t"], vocab["n"])}
    ranks, lefts, rights, ns = [], [], [], []
    for r in range(_BPE_ROUNDS):
        stats = Counter()
        for w, f in words.items():
            for a, b in zip(w, w[1:]):
                stats[(a, b)] += f
        if not stats:
            break
        best = sorted(stats.items(),
                      key=lambda kv: (-kv[1], kv[0]))[0]
        (l, rt), n = best
        nxt = Counter()
        for w, f in words.items():
            nw, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == (l, rt):
                    nw.append(l + rt)
                    i += 2
                else:
                    nw.append(w[i])
                    i += 1
            nxt[tuple(nw)] += f
        words = dict(nxt)
        ranks.append(r + 1)
        lefts.append(l)
        rights.append(rt)
        ns.append(n)
    want = pd.DataFrame({"rank": np.asarray(ranks, np.int64),
                         "left": np.asarray(lefts, object),
                         "right": np.asarray(rights, object),
                         "n": np.asarray(ns, np.int64)})
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


# -- flat (offsets-form) shingle builders -----------------------------------

_FLAT_TEXTS = ["the quick brown fox jumps", "  lead and trail  ", "",
               "   ", None, "one", "two words", "a b c d e f g",
               "tab\tsep\nnl lines here", "nbsp\xa0joined token",
               "rep rep rep rep rep", "x " * 300 + "y",
               " em space seps", "\x1c\x1dcontrol seps"]


def test_tokens_flat_matches_str_split():
    from nuclei_feature_extraction_ray.functions.hashing import tokens_flat
    vals, k = tokens_flat(pd.Series(_FLAT_TEXTS))
    py = [t.split() if isinstance(t, str) else [] for t in _FLAT_TEXTS]
    assert list(k) == [len(t) for t in py]
    assert vals.to_pylist() == [w for t in py for w in t]


@pytest.mark.parametrize("n", [1, 2, 3, 5])
def test_word_shingles_flat_matches_per_doc(n):
    from nuclei_feature_extraction_ray.functions.hashing import (
        word_shingles_batch, word_shingles_flat)
    toks = [t.split() if isinstance(t, str) else [] for t in _FLAT_TEXTS]
    f1, l1 = word_shingles_batch(toks, n)
    f2, l2 = word_shingles_flat(_FLAT_TEXTS, n)
    assert np.array_equal(l1, l2)
    assert np.array_equal(f1, f2)


def test_md5_shingles_flat_and_sig_flat_match_per_doc():
    from nuclei_feature_extraction_ray.functions.hashing import (
        md5_shingles_batch, md5_shingles_flat, minhash_signatures,
        minhash_signatures_flat)
    toks = [t.split() if isinstance(t, str) else [] for t in _FLAT_TEXTS]
    per_doc = md5_shingles_batch(toks, 2)
    flat, lens = md5_shingles_flat(_FLAT_TEXTS, 2)
    assert np.array_equal(
        np.concatenate(per_doc) if per_doc else np.empty(0), flat)
    assert [len(s) for s in per_doc] == list(lens)
    s1 = minhash_signatures(per_doc, k=32)
    s2 = minhash_signatures_flat(flat, lens, k=32)
    assert np.array_equal(s1, s2)
