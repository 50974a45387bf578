"""Text normalization for dedup / canonicalization.

A webtext pipeline deduplicates on a *canonical* form of the text, not
the raw bytes (casing, whitespace runs, and unicode composition
variants are not meaningful differences). Chain, chosen so every step
has an exactly-matching DuckDB twin:

1. unicode NFC          (`unicodedata.normalize` / `nfc_normalize`)
2. lowercase            (`str.lower` / `lower`)
3. collapse the explicit whitespace class ``[ \\t\\n\\r\\f]+`` to one
   space (same class as text_stats; RE2- and Python-identical)
4. strip leading/trailing spaces (`strip(' ')` / `trim`)

The canonical fingerprint exported across engines is the md5 hex of
the normalized UTF-8 bytes — portable, so the whole op is
driver-oracle-able (the same pattern as hashing.md5_shingles).
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

_WS_RUN = re.compile(r"[ \t\n\r\f]+")


def normalize_series(texts: pd.Series) -> pd.Series:
    """Vectorized where pandas allows: NFC is per-row (C call), the
    rest are pandas .str kernels. (An all-pyarrow utf8proc chain is
    ~35% faster on ASCII-heavy corpora but DIVERGES from DuckDB's
    lower()/nfc_normalize() on unicode edge cases — special-casing
    differs between utf8proc builds — so the oracle-identical
    unicodedata/str chain stays; the unicode conformance test pins
    this.)"""
    s = texts.fillna("").map(lambda x: unicodedata.normalize("NFC", x))
    return s.str.lower() \
            .str.replace(_WS_RUN, " ", regex=True) \
            .str.strip(" ")


def normalize_frame(texts: pd.Series) -> pd.DataFrame:
    from .hashing import md5_hex_flat
    norm = normalize_series(texts)
    return pd.DataFrame({
        "norm_md5": md5_hex_flat(list(norm)),
        "n_chars_norm": norm.str.len().to_numpy(np.int64),
    })


#: the DuckDB expression equal to normalize_series(text)
def normalize_expr(text: str = "text") -> str:
    return ("trim(regexp_replace(lower(nfc_normalize({t})), "
            "'[ \\t\\n\\r\\f]+', ' ', 'g'))").format(t=text)


def normalize_sql(table: str = "documents", text: str = "text",
                  key: str = "doc_id") -> str:
    return """
    SELECT {key} AS doc_id, md5({n}) AS norm_md5,
           CAST(len({n}) AS BIGINT) AS n_chars_norm
    FROM {table}""".format(n=normalize_expr(text), table=table, key=key)
