"""Skew-stress conformance (VERDICT r3 #8): one url carries >=30% of
all rows and one host >=35% — the worst-case shapes for the url-hash
exchange. Asserts the flagship is byte-identical with salting on vs
off, that salting actually BOUNDS per-partition peak rows (manifest
skew stats), and that pages_domain_cap and line_dedup survive the
same corpus (oracle-checked / semantically checked).

Measured ratios are recorded in SCALE.md ("skew stress" row).
"""
from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from nuclei_feature_extraction_ray.corpus import generate_pages
from nuclei_feature_extraction_ray.pipelines.pages_features import (
    compute_features, run_checkpointed)
from nuclei_feature_extraction_ray.state.manifest import summarize

HOT_URL = "https://skew.test/p00"
HOT_HOST = "skew.test"
N_HOT_SNAPS = 450
N_SIDE_URLS = 29          # host total 30 urls > _DOMAIN_CAP (20)
BOILER = "SKEW BOILERPLATE LINE xyzzy"


def _skewed_pages(seed: int = 11) -> pa.Table:
    """generate_pages base (~900 rows) + one url with 450 snapshots
    (>=30% of all rows) + 29 sibling urls on the same host (host
    >=35%), html recycled from parseable base rows, timestamps
    strictly increasing with a mix of intra- and cross-session gaps.
    A boilerplate line is planted into ~35% of text values (line
    dedup's input column; the flagship re-extracts from html)."""
    rng = np.random.default_rng(seed)
    base = generate_pages(900, seed=seed)
    good = base.filter(pa.compute.greater(
        pa.compute.utf8_length(
            pa.compute.coalesce(base["text"], "")), 0))
    pool_html = good["html"].to_pylist()
    pool_text = good["text"].to_pylist()

    url, ts, html, text, lang = [], [], [], [], []
    t0 = 10**15
    for i in range(N_HOT_SNAPS):
        url.append(HOT_URL)
        # ~20% of gaps above the 30-day session threshold
        gap = (40 * 86400 if i % 5 == 0 else
               int(rng.integers(3600, 5 * 86400))) * 1_000_000
        t0 += gap
        ts.append(t0)
        j = i % len(pool_html)
        html.append(pool_html[j])
        text.append(pool_text[j])
        lang.append("en")
    for u in range(N_SIDE_URLS):
        for k in range(2):
            url.append("https://%s/side%02d" % (HOT_HOST, u))
            ts.append(10**15 + (u * 7 + k) * 86_400_000_000)
            j = (u * 2 + k) % len(pool_html)
            html.append(pool_html[j])
            text.append(pool_text[j])
            lang.append("en")
    hot = pa.table({
        "url": pa.array(url, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(html, pa.binary()),
        "text": pa.array(text, pa.string()),
        "lang": pa.array(lang, pa.string()),
    })
    tbl = pa.concat_tables([base, hot]).combine_chunks()
    # plant the boilerplate line into ~35% of texts (by row hash)
    txt = tbl["text"].to_pylist()
    planted = [(t + "\n" + BOILER) if (t and i % 3 == 0) else t
               for i, t in enumerate(txt)]
    return tbl.set_column(tbl.schema.get_field_index("text"), "text",
                          pa.array(planted, pa.string()))


@pytest.fixture(scope="module")
def skewed() -> pa.Table:
    return _skewed_pages()


def test_skew_fixture_is_skewed(skewed):
    u = pd.Series(skewed["url"].to_pylist())
    frac_url = (u == HOT_URL).mean()
    frac_host = u.str.contains(HOT_HOST, regex=False).mean()
    assert frac_url >= 0.30, frac_url
    assert frac_host >= 0.33, frac_host


def test_flagship_byte_identical_under_skew(skewed):
    cols = skewed.select(["url", "warc_ts", "html", "lang"])
    base = compute_features(rd.from_arrow(cols), num_partitions=4,
                            hot_threshold=None).to_pandas()
    salted = compute_features(rd.from_arrow(cols), num_partitions=4,
                              hot_threshold=100).to_pandas()
    key = ["url", "warc_ts"]
    a = base.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = salted.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)


def test_skew_partition_peak_is_bounded(skewed, tmp_path):
    """With salting, no committed partition holds anywhere near the
    hot url's 30% share — the manifest skew stats prove the exchange
    stayed balanced. (Measured ratio recorded in SCALE.md.)"""
    cols = skewed.select(["url", "warc_ts", "html", "lang"])
    base_out = str(tmp_path / "skew_ckpt_unsalted")
    run_checkpointed(rd.from_arrow(cols), base_out, num_partitions=8,
                     resume=False, hot_threshold=None).materialize()
    b = summarize(base_out)
    out = str(tmp_path / "skew_ckpt")
    run_checkpointed(rd.from_arrow(cols), out, num_partitions=8,
                     resume=False, hot_threshold=100).materialize()
    s = summarize(out)
    assert s["rows"] == b["rows"] > 0
    ratio = s["max_part_rows"] / s["rows"]
    base_ratio = b["max_part_rows"] / b["rows"]
    # unsalted: the partition holding the hot url carries >= its 30%
    # share; salted: the peak drops well below it
    assert base_ratio >= 0.30, (base_ratio, b)
    assert ratio <= 0.15, (ratio, s)
    assert s["max_part_rows"] < b["max_part_rows"]


def test_domain_cap_under_skew(skewed, tmp_path):
    """pages_domain_cap over the skewed corpus: the hot host is capped
    at _DOMAIN_CAP urls, earliest-crawled first; full result matches
    the DuckDB oracle on the same parquet."""
    from nuclei_feature_extraction_ray.pipelines.queries import (
        _DOMAIN_CAP, domain_cap_core)
    p = str(tmp_path / "pages.parquet")
    pq.write_table(skewed, p)
    got = domain_cap_core(
        rd.read_parquet(p, columns=["url", "warc_ts"]),
        num_partitions=4).to_pandas()
    hot = got[got["host"] == HOT_HOST]
    assert len(hot) == _DOMAIN_CAP
    assert sorted(hot["rk"]) == list(range(1, _DOMAIN_CAP + 1))

    con = duckdb.connect()
    want = con.execute("""
        WITH u AS (
          SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 url, min(warc_ts) AS first_ts,
                 CAST(count(*) AS BIGINT) AS n_snapshots
          FROM read_parquet('%s') GROUP BY host, url
        ), r AS (
          SELECT host, url, first_ts, n_snapshots,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY first_ts, url) AS rk
          FROM u)
        SELECT host, url, first_ts, n_snapshots,
               CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= %d""" % (p, _DOMAIN_CAP)).df()
    key = ["host", "url"]
    a = got.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = want.sort_values(key, kind="mergesort").reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_line_dedup_under_skew(skewed, tmp_path):
    """C4 line dedup over the skewed corpus: the planted boilerplate
    (in ~35% of rows across many urls) is dropped from EVERY row,
    row count and order multiplicity are preserved."""
    from nuclei_feature_extraction_ray.stages import dedup as D
    p = str(tmp_path / "pages.parquet")
    pq.write_table(skewed, p)
    pages = rd.read_parquet(
        p, columns=["url", "warc_ts", "text"],
        filter=pa.compute.field("text").is_valid())
    hot = D.hot_lines(pages, "text", "url", min_docs=3,
                      num_partitions=4)
    assert len(hot) > 0
    out = D.remove_hot_lines(pages, "text", hot).to_pandas()
    n_in = pages.count()
    assert len(out) == n_in
    assert not out["clean_text"].str.contains(
        BOILER, regex=False).any()
    assert int(out["n_dropped"].sum()) > 0
