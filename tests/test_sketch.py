"""HLL approx distinct + exact distinct op + degenerate-class
taxonomy (the shape.rs:142-207 NaN-bail analog)."""
from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nuclei_feature_extraction_ray.functions.sketch import (
    approx_distinct, distinct_count, hll_estimate, hll_merge,
    hll_partial)
from nuclei_feature_extraction_ray.functions.text_stats import (
    text_stats_frame, text_stats_sql)


def test_hll_accuracy_and_merge():
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 10**12, size=60_000)
    true = len(np.unique(vals))
    # partials merged across arbitrary splits == one-shot
    one = hll_partial(vals)
    split = hll_merge([hll_partial(vals[:20_000]),
                       hll_partial(vals[20_000:45_000]),
                       hll_partial(vals[45_000:])])
    assert np.array_equal(one, split)
    est = hll_estimate(one)
    assert abs(est - true) / true < 0.05      # stderr ~1.6% at p=12


def test_distinct_ops_on_dataset():
    vals = np.repeat(np.arange(5000, dtype=np.int64), 3)
    np.random.default_rng(1).shuffle(vals)
    ds = rd.from_arrow(pa.table({"k": pa.array(vals)}))
    assert distinct_count(ds, "k", num_partitions=4) == 5000
    approx = approx_distinct(ds, "k")
    assert abs(approx - 5000) / 5000 < 0.05


def test_degenerate_class_taxonomy():
    texts = pd.Series(["hello world x", "", "   \t", "single",
                       "aa bb cc", "aaa bbb ccc"])
    out = text_stats_frame(texts)
    assert out["degenerate_class"].tolist() == [0, 1, 2, 3, 4, 4]
    # SQL oracle agrees class-for-class
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    expr = text_stats_sql("text")["degenerate_class"]
    ora = con.execute(
        "SELECT %s AS c FROM documents" % expr).df()["c"]
    assert ora.tolist() == [0, 1, 2, 3, 4, 4]
