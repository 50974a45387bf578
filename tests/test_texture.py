"""Texture-analog family tests (SURVEY.md §2.7 GLCM/GLRLM/Gabor rows):
vectorized kernels vs slow per-document oracles, DuckDB SQL-oracle
conformance, degenerate NaN policy, alias expansion."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from nuclei_feature_extraction_ray.functions import texture as tx

DEGENERATE = ["", "   ", "\t\n", "one", "aa aa aa", "a b", "x" * 40]


def _random_docs(n=60, seed=3):
    rng = np.random.default_rng(seed)
    words = ["a", "bb", "ccc", "dddd", "eeeee", "theword", "1", "22",
             "3456", "x!", "..", "MiXeD", "longestwordhere", "日本語"]
    docs = []
    for _ in range(n):
        k = int(rng.integers(0, 60))
        docs.append(" ".join(rng.choice(words, size=k)) if k else "")
    return docs + DEGENERATE


def test_kernels_match_slow_oracles():
    texts = pd.Series(_random_docs())
    fast = tx.texture_frame(texts)
    assert list(fast.columns) == tx.TEXTURE_COLUMNS
    slow_rows = []
    for t in texts:
        row = {}
        row.update(tx.slow_cooc_row(t))
        row.update(tx.slow_runlen_row(t))
        row.update(tx.slow_spectrum_row(t))
        slow_rows.append(row)
    slow = pd.DataFrame(slow_rows)[tx.TEXTURE_COLUMNS]
    for c in tx.TEXTURE_COLUMNS:
        assert np.allclose(fast[c], slow[c], atol=2e-6, equal_nan=True), c


def test_sql_oracle_bit_exact():
    texts = _random_docs(n=40, seed=9)
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    for name, sql, cols in [("cooc", tx.cooc_sql(), tx.COOC_COLUMNS),
                            ("runlen", tx.runlen_sql(), tx.RUNLEN_COLUMNS),
                            ("spectrum", tx.spectrum_sql(),
                             tx.SPECTRUM_COLUMNS)]:
        ora = con.execute(sql).df().sort_values("doc_id") \
            .reset_index(drop=True)
        eng = tx.texture_frame(df["text"], which=(name,))
        for c in cols:
            f = eng[c].to_numpy(np.float64)
            o = ora[c].to_numpy(np.float64)
            assert np.array_equal(f, o, equal_nan=True), (name, c)


def test_degenerate_nan_policy():
    # empty / whitespace-only docs: NaN everywhere (shape.rs:142-147
    # NaN-not-crash policy); short docs: NaN only where the window
    # cannot exist.
    out = tx.texture_frame(pd.Series(["", "  \t ", "one"]))
    assert out.iloc[0].isna().all()
    assert out.iloc[1][tx.COOC_COLUMNS + tx.SPECTRUM_COLUMNS].isna().all()
    # whitespace-only doc still has a whitespace RUN
    assert np.isfinite(out.iloc[1]["rl_run_percentage"])
    row = out.iloc[2]
    assert row[tx.COOC_COLUMNS].isna().all()     # no pairs
    assert np.isfinite(row["spec_var"])          # one token: var = 0
    assert np.isnan(row["spec_lag1_cov"])


def test_single_class_correlation_is_nan():
    # all tokens the same length -> one occupied class -> sigma = 0
    out = tx.texture_frame(pd.Series(["aa bb cc dd ee"]))
    for q in tx.COOC_QUANTS:
        for d in tx.COOC_DISTS:
            assert np.isnan(
                out.iloc[0]["cooc_correlation_d%d_q%d" % (d, q)])
            assert out.iloc[0]["cooc_contrast_d%d_q%d" % (d, q)] == 0.0


def test_alias_expansion_includes_texture():
    from nuclei_feature_extraction_ray.config import (expand_families,
                                                      feature_schema)
    fams = [f.name for f in expand_families(["texture"])]
    assert fams == ["cooc", "runlen", "spectrum"]
    cols = feature_schema(["all"])
    for c in tx.TEXTURE_COLUMNS:
        assert c in cols
    with pytest.raises(ValueError):
        expand_families(["glcm_nope"])
