"""Per-row text feature kernels — the graft analog of the reference's
per-record shape/color feature kernels (``src/features/shape.rs:15-135``,
``src/features/color.rs:10-107``): fixed, deterministic schema of scalar
descriptors per record, vectorized over the batch.

Char classes are defined as explicit ASCII regex classes so the DuckDB
oracle SQL (RE2) and this pandas implementation (Python ``re``) agree
byte-for-byte:

* alpha  = ``[A-Za-z]``
* digit  = ``[0-9]``
* ws     = ``[ \\t\\n\\r\\f]`` (tokens split on runs of this class)
* other  = everything else (non-ASCII letters land here by design)

Degenerate inputs (empty text) yield NaN ratios, mirroring the
reference's NaN-not-crash policy (``src/features/shape.rs:142-147``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

WS_CLASS = r"[ \t\n\r\f]"

#: Column order is fixed — schema is derived deterministically from this
#: list (cf. reference constant-grid schema, src/features/texture.rs:82-157).
STAT_COLUMNS = [
    "n_chars", "n_bytes", "n_lines", "n_tokens", "mean_token_len",
    "ttr", "degenerate_class", "alpha_ratio", "digit_ratio",
    "upper_ratio", "ws_ratio", "other_ratio",
]

#: Degenerate-input taxonomy — the graft analog of the reference's
#: per-class NaN bail-outs in ``src/features/shape.rs:142-207`` (empty
#: mask / NaN covariance / non-2x2 covariance / Inf covariance): each
#: degenerate input gets an explicit class code instead of a silent
#: NaN, so the loss is observable. Precedence is first-match.
DEGENERATE_CLASSES = {
    0: "normal",
    1: "empty",              # no characters        (~ empty mask)
    2: "whitespace_only",    # no tokens            (~ empty centroid)
    3: "single_token",       # no pairs/windows     (~ degenerate cov)
    4: "constant_token_len", # zero variance        (~ zero eigenvalue)
}


def text_stats_frame(texts: pd.Series) -> pd.DataFrame:
    """Vectorized descriptor computation; one row out per row in."""
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(np.int64)
    n_bytes = s.str.encode("utf-8").str.len().to_numpy(np.int64)
    nl = s.str.count("\n").to_numpy(np.int64)
    n_lines = np.where(n_chars > 0, nl + 1, 0)

    ws = s.str.count(WS_CLASS).to_numpy(np.int64)
    alpha = s.str.count(r"[A-Za-z]").to_numpy(np.int64)
    digit = s.str.count(r"[0-9]").to_numpy(np.int64)
    upper = s.str.count(r"[A-Z]").to_numpy(np.int64)
    other = n_chars - ws - alpha - digit

    trimmed = s.str.strip(" \t\n\r\f")
    tok_lists = trimmed.str.split(WS_CLASS + "+")
    n_tokens = np.asarray(
        [0 if len(t) == 1 and t[0] == "" else len(t) for t in tok_lists],
        np.int64)
    n_distinct = np.asarray(
        [len(set(t)) for t in tok_lists], np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        nonws = (n_chars - ws).astype(np.float64)
        mean_token_len = np.where(n_tokens > 0, nonws / n_tokens, np.nan)
        ttr = np.where(n_tokens > 0, n_distinct / n_tokens, np.nan)
        denom = n_chars.astype(np.float64)
        alpha_ratio = np.where(n_chars > 0, alpha / denom, np.nan)
        digit_ratio = np.where(n_chars > 0, digit / denom, np.nan)
        upper_ratio = np.where(n_chars > 0, upper / denom, np.nan)
        ws_ratio = np.where(n_chars > 0, ws / denom, np.nan)
        other_ratio = np.where(n_chars > 0, other / denom, np.nan)

    tok_min = np.asarray(
        [min((len(w) for w in t), default=0) for t in tok_lists],
        np.int64)
    tok_max = np.asarray(
        [max((len(w) for w in t), default=0) for t in tok_lists],
        np.int64)
    degenerate = np.zeros(len(s), np.int64)
    degenerate[(n_tokens > 1) & (tok_min == tok_max)] = 4
    degenerate[n_tokens == 1] = 3
    degenerate[(n_chars > 0) & (n_tokens == 0)] = 2
    degenerate[n_chars == 0] = 1

    return pd.DataFrame({
        "n_chars": n_chars, "n_bytes": n_bytes, "n_lines": n_lines,
        "n_tokens": n_tokens, "mean_token_len": mean_token_len,
        "ttr": ttr, "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio, "upper_ratio": upper_ratio,
        "ws_ratio": ws_ratio, "other_ratio": other_ratio,
        "degenerate_class": degenerate,
    }, index=texts.index)


def text_stats_sql(text_expr: str = "text") -> dict[str, str]:
    """DuckDB expressions computing exactly the columns of
    ``text_stats_frame`` — the conformance oracle (SURVEY.md §5.2)."""
    t = text_expr
    ws = "[ \\t\\n\\r\\f]"
    trim_t = "trim({t}, E' \\t\\n\\r\\f')".format(t=t)
    toks = ("CASE WHEN {tt} = '' THEN 0 ELSE "
            "len(string_split_regex({tt}, '{ws}+')) END"
            ).format(tt=trim_t, ws=ws)
    dtoks = ("CASE WHEN {tt} = '' THEN 0 ELSE "
             "len(list_distinct(string_split_regex({tt},"
             " '{ws}+'))) END").format(tt=trim_t, ws=ws)
    cnt = lambda cls: ("length({t}) - length(regexp_replace({t}, '{c}', '',"
                       " 'g'))").format(t=t, c=cls)
    n = "length(%s)" % t
    alpha, digit, upper, wsc = (cnt("[A-Za-z]"), cnt("[0-9]"),
                                cnt("[A-Z]"), cnt(ws))
    ratio = lambda x: ("CASE WHEN {n} > 0 THEN ({x}) * 1.0 / {n} "
                       "ELSE NULL END").format(n=n, x=x)
    return {
        "n_chars": n,
        "n_bytes": "octet_length(encode(%s))" % t,
        "n_lines": ("CASE WHEN {n} > 0 THEN {nl} + 1 ELSE 0 END"
                    ).format(n=n, nl=cnt("[\\n]")),
        "n_tokens": toks,
        "mean_token_len": ("CASE WHEN ({k}) > 0 THEN ({n} - ({w})) * 1.0 /"
                           " ({k}) ELSE NULL END"
                           ).format(k=toks, n=n, w=wsc),
        "ttr": ("CASE WHEN ({k}) > 0 THEN ({d}) * 1.0 / ({k}) ELSE NULL END"
                ).format(k=toks, d=dtoks),
        "alpha_ratio": ratio(alpha),
        "digit_ratio": ratio(digit),
        "upper_ratio": ratio(upper),
        "ws_ratio": ratio(wsc),
        "other_ratio": ratio("{n} - ({w}) - ({a}) - ({d})".format(
            n=n, w=wsc, a=alpha, d=digit)),
        "degenerate_class": (
            "CAST(CASE WHEN {n} = 0 THEN 1 WHEN {tt} = '' THEN 2 "
            "WHEN ({k}) = 1 THEN 3 "
            "WHEN list_min({lens}) = list_max({lens}) THEN 4 "
            "ELSE 0 END AS BIGINT)").format(
            n=n, tt=trim_t, k=toks,
            lens=("list_transform(string_split_regex({tt}, '{ws}+'), "
                  "w -> length(w))").format(tt=trim_t, ws=ws)),
    }
