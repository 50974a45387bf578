"""Flagship pipeline end-to-end: golden run, temporal leakage, resume,
scale invariance (SURVEY.md §5 items 3-6)."""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nuclei_feature_extraction_ray.corpus import (
    corpus_dir, generate_pages, generate_probes)
from nuclei_feature_extraction_ray.pipelines.pages_features import (
    FEATURE_COLUMNS, compute_features, partition_features, probe_features,
    run_checkpointed)
from nuclei_feature_extraction_ray.state.manifest import (
    committed_parts, read_output, summarize)


@pytest.fixture(scope="module")
def pages_tbl() -> pa.Table:
    return generate_pages(400)


@pytest.fixture(scope="module")
def feats(pages_tbl) -> pd.DataFrame:
    ds = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html", "lang"]))
    out = compute_features(ds, num_partitions=8, concurrency=2).to_pandas()
    return out.sort_values(["url", "warc_ts"]).reset_index(drop=True)


def test_schema_and_rowcount(pages_tbl, feats):
    assert list(feats.columns) == FEATURE_COLUMNS
    p = pages_tbl.to_pandas()
    expect = p[~p.duplicated(["url", "warc_ts"]) | True]  # all rows
    p_dedup = p.drop_duplicates(["url", "warc_ts"])
    n_parseable = p_dedup["text"].notna().sum()
    assert len(feats) == n_parseable


def test_features_match_singleprocess_oracle(pages_tbl, feats):
    """Golden check: the distributed result equals a single-process
    pandas recomputation over the whole corpus (order- and
    partitioning-independent)."""
    p = pages_tbl.to_pandas()
    from nuclei_feature_extraction_ray.functions.hashing import hash64
    p["extracted_text"] = p["text"]
    p["extract_ok"] = p["text"].notna()
    p["html_hash"] = hash64(
        [bytes(h) for h in p["html"]]).astype(np.int64)
    want = partition_features(
        p[["url", "warc_ts", "lang", "extracted_text", "extract_ok",
           "html_hash"]])
    want = want.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    got_num = feats.select_dtypes(include=[np.number])
    want_num = want.select_dtypes(include=[np.number])
    assert list(got_num.columns) == list(want_num.columns)
    np.testing.assert_allclose(got_num.to_numpy(np.float64),
                               want_num.to_numpy(np.float64),
                               equal_nan=True, atol=0, rtol=0)
    for c in ("url", "lang", "warc_ts"):
        assert (feats[c] == want[c]).all()


def test_empty_text_gives_nan_not_crash(feats):
    empty = feats[feats["n_chars"] == 0]
    assert len(empty) >= 1
    assert empty["mean_token_len"].isna().all()
    assert empty["ttr"].isna().all()


def test_zero_temporal_leakage(pages_tbl, feats):
    """Property test: recompute each sampled row's features using ONLY
    rows with warc_ts <= its own; must match exactly (north_rule)."""
    from nuclei_feature_extraction_ray.functions.hashing import hash64
    p = pages_tbl.to_pandas()
    p["extracted_text"] = p["text"]
    p["extract_ok"] = p["text"].notna()
    p["html_hash"] = hash64(
        [bytes(h) for h in p["html"]]).astype(np.int64)
    p = p[["url", "warc_ts", "lang", "extracted_text", "extract_ok",
           "html_hash"]]
    rng = np.random.default_rng(5)
    sample = feats.sample(25, random_state=7)
    num_cols = [c for c in FEATURE_COLUMNS
                if c not in ("url", "warc_ts", "lang")]
    for _, row in sample.iterrows():
        prefix = p[(p["url"] == row["url"])
                   & (p["warc_ts"] <= row["warc_ts"])]
        redo = partition_features(prefix.copy())
        redo = redo[(redo["url"] == row["url"])
                    & (redo["warc_ts"] == row["warc_ts"])]
        assert len(redo) == 1
        got = row[num_cols].to_numpy(np.float64)
        want = redo.iloc[0][num_cols].to_numpy(np.float64)
        np.testing.assert_allclose(got, want, equal_nan=True,
                                   atol=0, rtol=0)


def test_scale_invariance_partition_count(pages_tbl, feats):
    """Same input, different partition count -> identical sorted output
    (guards order-dependent state bugs)."""
    ds = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html", "lang"]))
    other = compute_features(ds, num_partitions=3, concurrency=2) \
        .to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(feats, other)


def test_asof_probe_features_match_merge_asof(pages_tbl, feats):
    probes_tbl = generate_probes(pages_tbl, 80)
    ds = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html", "lang"]))
    fds = compute_features(ds, num_partitions=8, concurrency=2)
    got = probe_features(fds, rd.from_arrow(probes_tbl),
                         num_partitions=8).to_pandas()
    got = got.sort_values(["url", "query_ts"]).reset_index(drop=True)

    pr = probes_tbl.to_pandas().sort_values("query_ts")
    sn = feats.sort_values("warc_ts")
    want = pd.merge_asof(pr, sn, left_on="query_ts", right_on="warc_ts",
                         by="url", direction="backward")
    want = want.sort_values(["url", "query_ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(
        got["n_chars"].to_numpy(np.float64),
        want["n_chars"].to_numpy(np.float64), equal_nan=True)
    np.testing.assert_allclose(
        got["r30_mean"].to_numpy(np.float64),
        want["r30_mean"].to_numpy(np.float64), equal_nan=True)
    # unmatched probes (before first snapshot / unknown urls) keep nulls
    assert got["warc_ts"].isna().sum() == want["warc_ts"].isna().sum() > 0


def test_fused_probe_serve_matches_generic(pages_tbl, tmp_path):
    """run_checkpointed(probes_ds=...) writes per-partition probe
    parquet equal to the generic exchange join (plus all-NaN rows for
    probes whose partition has no pages, via finalize_fused_probes)."""
    from nuclei_feature_extraction_ray.pipelines.pages_features import (
        finalize_fused_probes, run_checkpointed)
    from nuclei_feature_extraction_ray.state.manifest import read_output
    probes_tbl = generate_probes(pages_tbl, 80)
    ds = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html",
                                         "lang"]))
    out = str(tmp_path / "fused_ckpt")
    pdir = str(tmp_path / "fused_probes")
    run_checkpointed(ds, out, num_partitions=4, resume=False,
                     probes_ds=rd.from_arrow(probes_tbl),
                     probe_dir=pdir).materialize()
    finalize_fused_probes(pdir, rd.from_arrow(probes_tbl), 4)
    fused = rd.read_parquet(pdir, partitioning=None).to_pandas()
    slow = probe_features(read_output(out), rd.from_arrow(probes_tbl),
                          num_partitions=4).to_pandas()
    assert len(fused) == len(slow) == probes_tbl.num_rows
    k = ["url", "query_ts"]
    pd.testing.assert_frame_equal(
        fused.sort_values(k).reset_index(drop=True),
        slow.sort_values(k).reset_index(drop=True)[fused.columns],
        check_dtype=False)


def test_probe_features_from_checkpoint_matches_generic(
        pages_tbl, tmp_path):
    """The checkpoint-aware probe join (probe-only shuffle + local
    merge against part=<id> parquet) must equal the generic exchange
    join row-for-row."""
    from nuclei_feature_extraction_ray.pipelines.pages_features import (
        probe_features_from_checkpoint, run_checkpointed)
    from nuclei_feature_extraction_ray.state.manifest import read_output
    probes_tbl = generate_probes(pages_tbl, 80)
    ds = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html",
                                         "lang"]))
    out = str(tmp_path / "ckpt_probe")
    run_checkpointed(ds, out, num_partitions=4,
                     resume=False).materialize()
    fast = probe_features_from_checkpoint(
        out, rd.from_arrow(probes_tbl), num_partitions=4).to_pandas()
    slow = probe_features(read_output(out), rd.from_arrow(probes_tbl),
                          num_partitions=4).to_pandas()
    k = ["url", "query_ts"]
    pd.testing.assert_frame_equal(
        fast.sort_values(k).reset_index(drop=True),
        slow.sort_values(k).reset_index(drop=True)[fast.columns],
        check_dtype=False)


# -- checkpointed sink / resume (SURVEY.md §5 item 5) -----------------------

def _write_corpus(tmp_path, tbl) -> str:
    import pyarrow.parquet as pq
    path = os.path.join(tmp_path, "pages.parquet")
    pq.write_table(tbl, path)
    return path


def test_checkpointed_sink_and_resume(pages_tbl, feats, tmp_path):
    src = _write_corpus(tmp_path, pages_tbl)
    out_full = os.path.join(tmp_path, "full")
    pages = rd.read_parquet(src, columns=["url", "warc_ts", "html", "lang"])
    man = run_checkpointed(pages, out_full, num_partitions=8,
                           concurrency=2).to_pandas()
    assert len(man) == len(committed_parts(out_full))
    s = summarize(out_full)
    assert s["rows"] == len(feats)
    assert s["dropped_rows"] >= 3

    # Simulate a killed run: keep only 3 committed partitions.
    out_part = os.path.join(tmp_path, "resumed")
    os.makedirs(out_part)
    import shutil
    kept = sorted(committed_parts(out_full))[:3]
    for pid in kept:
        shutil.copytree(os.path.join(out_full, "part=%05d" % pid),
                        os.path.join(out_part, "part=%05d" % pid))
    before = {pid: os.path.getmtime(
        os.path.join(out_part, "part=%05d" % pid, "MANIFEST.json"))
        for pid in kept}

    pages2 = rd.read_parquet(src, columns=["url", "warc_ts", "html", "lang"])
    man2 = run_checkpointed(pages2, out_part, num_partitions=8,
                            concurrency=2).to_pandas()
    # resumed run only processed the missing partitions
    assert set(man2["partition"]) == set(
        committed_parts(out_full)) - set(kept)
    # committed partitions were not recomputed (manifest mtime unchanged)
    for pid in kept:
        assert os.path.getmtime(
            os.path.join(out_part, "part=%05d" % pid,
                         "MANIFEST.json")) == before[pid]

    # final output identical to the uninterrupted run
    a = read_output(out_full).to_pandas() \
        .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    b = read_output(out_part).to_pandas() \
        .sort_values(["url", "warc_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    a2 = a[FEATURE_COLUMNS].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a2, feats[FEATURE_COLUMNS].reset_index(drop=True),
        check_dtype=False)


def test_entry_smoke():
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    ds = mod.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) > 0
    assert list(df.columns) == FEATURE_COLUMNS


def test_asof_nullable_probe_column_keeps_arrow_type():
    """VERDICT r2: dtype restore is schema-driven — an int64 probe
    column that legitimately CONTAINS nulls must stay Arrow int64 in
    every partition (the old isna() heuristic left it float64 in some
    partitions and int64 in others)."""
    from nuclei_feature_extraction_ray.stages.asof import asof_join
    probes = pa.table({
        "user": pa.array(["u1", "u2", "u3", "u4"]),
        "qts": pa.array([10, 20, 30, 40], pa.timestamp("us")),
        "tag": pa.array([7, None, 9, None], pa.int64()),   # nullable!
    })
    snaps = pa.table({
        "user": pa.array(["u1", "u3"]),
        "sts": pa.array([5, 25], pa.timestamp("us")),
        "v": pa.array([1.5, 2.5], pa.float64()),
    })
    out = asof_join(rd.from_arrow(probes), rd.from_arrow(snaps),
                    key="user", probe_ts="qts", snap_ts="sts",
                    value_cols=["v"], num_partitions=3)
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["tag"] == pa.int64()
    df = out.to_pandas().sort_values("user").reset_index(drop=True)
    assert len(df) == 4
    assert df["tag"].tolist()[0] == 7 and pd.isna(df["tag"].tolist()[1])
    assert df.loc[df["user"] == "u3", "v"].iloc[0] == 2.5


def test_fused_probe_guards(pages_tbl, tmp_path):
    """ADVICE r2: fused probe serve + hot salting must raise (not
    silently skip), and finalize_fused_probes must refuse to run when
    no partition probe files exist at all."""
    from nuclei_feature_extraction_ray.pipelines.pages_features import (
        finalize_fused_probes, run_checkpointed)
    probes_tbl = generate_probes(pages_tbl, 20)
    ds = rd.from_arrow(pages_tbl.select(["url", "warc_ts", "html",
                                         "lang"]))
    with pytest.raises(ValueError, match="salting"):
        run_checkpointed(ds, str(tmp_path / "ck"), num_partitions=4,
                         resume=False, hot_threshold=1,  # all urls hot
                         probes_ds=rd.from_arrow(probes_tbl),
                         probe_dir=str(tmp_path / "pd"))
    with pytest.raises(ValueError, match="no part="):
        finalize_fused_probes(str(tmp_path / "nonexistent"),
                              rd.from_arrow(probes_tbl), 4)


def test_filter_cli_domain_matches_pathless_urls(tmp_path):
    """ADVICE r2: path-less urls (https://example.org) must match the
    --domains host filter."""
    from datetime import datetime

    import pyarrow.parquet as pq

    from nuclei_feature_extraction_ray.filter_cli import slice_pages
    tbl = pa.table({
        "url": pa.array(["https://example.org",
                         "https://example.org/a/b",
                         "https://other.net/x"]),
        "warc_ts": pa.array([1_000_000, 2_000_000, 3_000_000],
                            pa.timestamp("us")),
    })
    out = slice_pages(rd.from_arrow(tbl), datetime(1970, 1, 1),
                      datetime(2000, 1, 1),
                      domains=["example.org"]).to_pandas()
    assert sorted(out["url"]) == ["https://example.org",
                                  "https://example.org/a/b"]
