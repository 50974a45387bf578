"""Hot-key salting (stages/salt.py wired into the flagship):
byte-identical features vs the unsalted path for a planted hot url
spanning several time buckets and blocks, plus detection and manifest
skew evidence."""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nuclei_feature_extraction_ray.corpus import generate_pages
from nuclei_feature_extraction_ray.pipelines.pages_features import (
    compute_features, run_checkpointed)
from nuclei_feature_extraction_ray.stages.salt import detect_hot_urls

HOT_URL_SNAPS = 200


def _pages():
    # generate_pages plants one hot url with ~n/10 snapshots (capped
    # 500) spanning years, with >30d gaps, (url, ts) duplicates and
    # unparseable rows — exactly the hard cases for salting.
    tbl = generate_pages(2000, seed=17)
    return tbl.select(["url", "warc_ts", "html", "lang"])


def test_detect_hot_urls():
    ds = rd.from_arrow(_pages())
    hot = detect_hot_urls(ds, "url", threshold=100)
    assert any(u.endswith("/hot") for u in hot)
    assert all(n >= 100 for n in hot.values())
    # high threshold -> nothing hot
    assert detect_hot_urls(ds, "url", threshold=10**9) == {}


def test_salted_features_byte_identical():
    tbl = _pages()
    base = compute_features(rd.from_arrow(tbl), num_partitions=4,
                            hot_threshold=None).to_pandas()
    salted = compute_features(rd.from_arrow(tbl), num_partitions=4,
                              hot_threshold=100).to_pandas()
    key = ["url", "warc_ts"]
    a = base.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = salted.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)


def test_salted_byte_identity_multi_seed():
    """Property-style: salted == unsalted across several random
    corpora (different hot-url sizes, gap structures, duplicate and
    degenerate mixes)."""
    for seed in (3, 29, 71):
        tbl = generate_pages(1200, seed=seed) \
            .select(["url", "warc_ts", "html", "lang"])
        base = compute_features(rd.from_arrow(tbl), num_partitions=3,
                                hot_threshold=None).to_pandas()
        salted = compute_features(rd.from_arrow(tbl), num_partitions=3,
                                  hot_threshold=60).to_pandas()
        key = ["url", "warc_ts"]
        a = base.sort_values(key, kind="mergesort").reset_index(drop=True)
        b = salted.sort_values(key, kind="mergesort") \
            .reset_index(drop=True)
        assert len(a) == len(b), seed
        pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)


def test_salted_manifest_skew_stats(tmp_path):
    out = str(tmp_path / "salted_ckpt")
    man_ds = run_checkpointed(rd.from_arrow(_pages()), out,
                              num_partitions=4, resume=False,
                              hot_threshold=100)
    man = man_ds.to_pandas()
    # salted partitions (ids >= P) exist and carry skew metadata
    assert (man["partition"] >= 4).any()
    salted_files = []
    for d in os.listdir(out):
        mf = os.path.join(out, d, "MANIFEST.json")
        if os.path.isfile(mf):
            with open(mf) as f:
                m = json.load(f)
            if m.get("salted"):
                salted_files.append(m)
    assert salted_files
    assert all(m.get("salted_cells", 0) >= 1 for m in salted_files)
    # committed rows across all partitions == unsalted row count
    base = compute_features(rd.from_arrow(_pages()), num_partitions=4,
                            hot_threshold=None).to_pandas()
    assert int(man["rows"].sum()) == len(base)


def test_detect_hot_urls_distributed_combine(monkeypatch):
    """Above the driver cap the heavy-hitter combine goes through one
    hash exchange; result identical."""
    from nuclei_feature_extraction_ray.stages import salt as salt_mod
    ds = rd.from_arrow(_pages())
    small = detect_hot_urls(ds, "url", threshold=100)
    monkeypatch.setattr(salt_mod, "_DETECT_DRIVER_MAX", 0)
    big = salt_mod.detect_hot_urls(ds, "url", threshold=100)
    assert small == big


def test_salted_checkpoint_resume(tmp_path):
    """Resume over a salted checkpoint: a second resumed run reuses
    every committed partition (manifests untouched) and the combined
    output still equals the unsalted computation."""
    import time
    out = str(tmp_path / "salted_resume")
    tbl = _pages()
    man1 = run_checkpointed(rd.from_arrow(tbl), out, num_partitions=4,
                            resume=False, hot_threshold=100) \
        .to_pandas()
    mtimes = {}
    for d in os.listdir(out):
        mf = os.path.join(out, d, "MANIFEST.json")
        if os.path.isfile(mf):
            mtimes[d] = os.path.getmtime(mf)
    time.sleep(0.05)
    man2 = run_checkpointed(rd.from_arrow(tbl), out, num_partitions=4,
                            resume=True, hot_threshold=100).to_pandas()
    # nothing recomputed: resumed run returns no freshly-committed rows
    assert len(man2) == 0
    for d, m in mtimes.items():
        assert os.path.getmtime(
            os.path.join(out, d, "MANIFEST.json")) == m
    from nuclei_feature_extraction_ray.state.manifest import read_output
    committed = read_output(out).to_pandas()
    base = compute_features(rd.from_arrow(tbl), num_partitions=4,
                            hot_threshold=None).to_pandas()
    key = ["url", "warc_ts"]
    pd.testing.assert_frame_equal(
        committed.sort_values(key, kind="mergesort")
        .reset_index(drop=True)[base.columns],
        base.sort_values(key, kind="mergesort").reset_index(drop=True),
        check_exact=True)
