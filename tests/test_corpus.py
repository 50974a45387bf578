"""Corpus generator determinism + extraction invariant (FIXTURES.md F1).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from nuclei_feature_extraction_ray.corpus import (
    corpus_dir, extract_text_one, generate_pages, generate_probes)
from nuclei_feature_extraction_ray.functions.text_extract import ExtractText


def test_generator_deterministic():
    a = generate_pages(300)
    b = generate_pages(300)
    assert a.equals(b)


def test_schema_matches_input_hint():
    t = generate_pages(200)
    assert t.schema.field("url").type == pa.string()
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("html").type == pa.binary()
    assert t.schema.field("text").type == pa.string()
    assert t.schema.field("lang").type == pa.string()


def test_degenerate_rows_present():
    t = generate_pages(300).to_pandas()
    assert t["text"].isna().sum() >= 3          # unparseable htmls
    assert (t["text"] == "").sum() >= 1          # empty-extraction page
    assert t.duplicated(["url", "warc_ts"]).sum() >= 2   # exact dups
    # one hot url with many snapshots
    assert t.groupby("url").size().max() >= 30


def test_timestamps_strictly_increasing_per_url():
    t = generate_pages(300).to_pandas()
    t = t[~t.duplicated(["url", "warc_ts"])]
    g = t.sort_values(["url", "warc_ts"]).groupby("url")["warc_ts"]
    assert (g.diff().dropna() > np.timedelta64(0, "us")).all()


def test_batched_extraction_byte_identical():
    """The pipeline's vectorized extractor must reproduce the stored
    ground-truth text byte-for-byte (driver input_hint invariant)."""
    t = generate_pages(300)
    ex = ExtractText()
    out = ex(t.select(["html"]))
    got = out["extracted_text"].to_pylist()
    want = t["text"].to_pylist()
    assert got == want
    ok = out["extract_ok"].to_pylist()
    assert all((w is not None) == o for w, o in zip(want, ok))


def test_canonical_equals_batched_on_edge_cases():
    cases = [b"", None, b"plain", b"<html>x</html>",
             b"<html><p>a &amp; b</p><script>s</script></html>",
             b"<HTML><BODY><H1>T</H1> <p>x  y</p></BODY></HTML>",
             "<html><p>héllo 数据</p></html>".encode(),
             b"\xff\xfe<html>bad"]
    ex = ExtractText()
    tbl = pa.table({"html": pa.array(cases, pa.binary())})
    got = ex(tbl)["extracted_text"].to_pylist()
    want = [extract_text_one(c) for c in cases]
    assert got == want


def test_probes_mixture():
    pages = generate_pages(300)
    probes = generate_probes(pages, 100)
    p = probes.to_pandas()
    assert len(p) == 100
    assert p["url"].str.startswith("https://unknown.").any()


def test_corpus_dir_cached(tmp_path):
    d1 = corpus_dir("t1", root=str(tmp_path))
    d2 = corpus_dir("t1", root=str(tmp_path))
    assert d1 == d2
    import os
    assert os.path.isdir(os.path.join(d1, "pages"))
    assert os.path.exists(os.path.join(d1, "probes.parquet"))
