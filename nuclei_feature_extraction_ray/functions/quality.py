"""Document quality scoring — length / punctuation / stopword signals,
SQL-expressible so the DuckDB oracle can verify it exactly.

The formula is deliberately simple and fixed (deterministic schema from
config, like the reference's constant feature grids,
``src/features/texture.rs:82-157``):

    quality = 0.4 * min(1, n_tokens / 64)
            + 0.3 * (1 - other_ratio)            # low symbol noise
            + 0.3 * min(1, stop_ratio * 8)       # natural language-ness

where ``stop_ratio`` = fraction of whitespace tokens that are in a
fixed 8-word English stopword list, and ``other_ratio`` is the
char-class ratio from ``text_stats``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .text_stats import WS_CLASS, text_stats_frame

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def quality_frame(texts: pd.Series) -> pd.DataFrame:
    """-> DataFrame(n_tokens, stop_ratio, quality) float64/int64."""
    stats = text_stats_frame(texts)
    s = texts.fillna("").str.strip(" \t\n\r\f")
    tok_lists = s.str.split(WS_CLASS + "+")
    stop = set(STOPWORDS)
    n_stop = np.asarray(
        [sum(t in stop for t in toks) if toks != [""] else 0
         for toks in tok_lists], np.int64)
    n_tokens = stats["n_tokens"].to_numpy(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_tokens > 0, n_stop / n_tokens, np.nan)
        quality = (0.4 * np.minimum(1.0, n_tokens / 64.0)
                   + 0.3 * (1.0 - stats["other_ratio"].to_numpy())
                   + 0.3 * np.minimum(1.0, stop_ratio * 8.0))
    return pd.DataFrame({
        "n_tokens": n_tokens,
        "stop_ratio": stop_ratio,
        "quality": quality,
    }, index=texts.index)


def quality_sql(text_expr: str = "text") -> dict[str, str]:
    """DuckDB expressions mirroring ``quality_frame`` exactly."""
    from .text_stats import text_stats_sql
    st = text_stats_sql(text_expr)
    toks = st["n_tokens"]
    trim_t = "trim({t}, E' \\t\\n\\r\\f')".format(t=text_expr)
    stoplist = ", ".join("'%s'" % w for w in STOPWORDS)
    n_stop = ("CASE WHEN {tt} = '' THEN 0 ELSE len(list_filter("
              "string_split_regex({tt}, '[ \\t\\n\\r\\f]+'),"
              " x -> list_contains([{sl}], x))) END"
              ).format(tt=trim_t, sl=stoplist)
    stop_ratio = ("CASE WHEN ({k}) > 0 THEN ({s}) * 1.0 / ({k}) "
                  "ELSE NULL END").format(k=toks, s=n_stop)
    quality = ("0.4 * least(1.0, ({k}) / 64.0) + 0.3 * (1.0 - ({o})) "
               "+ 0.3 * least(1.0, ({sr}) * 8.0)"
               ).format(k=toks, o=st["other_ratio"], sr=stop_ratio)
    return {"n_tokens": toks, "stop_ratio": stop_ratio, "quality": quality}
