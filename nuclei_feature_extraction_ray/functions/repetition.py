"""Gopher-style repetition / n-gram coverage features per document.

The reference computes per-nucleus texture statistics from pixel
co-occurrence (src/features/texture.rs:22-172); the webtext analog a
training-data pipeline actually filters on is *n-gram repetition*
(Rae et al. 2021 "Scaling Language Models" §A1.1: fraction of
characters in the most frequent n-gram, fraction of characters in
duplicated n-grams). Definitions here, chosen to be bit-exact
SQL-expressible (int counts, ONE final int/int division — see the
float policy in pipelines/queries.py):

* ``n_tokens``          — ``len(text.split(' '))`` (single-space split,
                          matching DuckDB ``string_split(text, ' ')``).
* ``max_tok_frac``      — count of the most frequent token / n_tokens.
* ``top2_char_frac``    — chars covered by the most frequent word
                          2-gram (count x len(gram), gram rendered as
                          ``"a b"``) / len(text); ties on count break
                          by the larger count*len product.
* ``dup3_char_frac``    — sum of count x len(gram) over word 3-grams
                          occurring more than once / len(text). May
                          exceed 1.0 for highly repetitive text
                          (overlapping occupancy is NOT deduplicated —
                          documented, deterministic, cheap).

Everything after the per-row ``str.split`` is vectorized pandas/numpy
over ONE exploded (doc, token) frame per batch — no per-document
Python loops for the counting.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd

REPETITION_COLUMNS = ["n_tokens", "max_tok_frac", "top2_char_frac",
                      "dup3_char_frac"]


def repetition_frame(texts: pd.Series) -> pd.DataFrame:
    """Vectorized repetition features for a batch of documents."""
    t = texts.fillna("").to_numpy(dtype=object)
    n = len(t)
    toks = [s.split(" ") for s in t]
    ntok = np.fromiter((len(x) for x in toks), np.int64, count=n)
    total = int(ntok.sum())
    flat = np.empty(total, dtype=object)
    flat[:] = list(chain.from_iterable(toks))
    doc = np.repeat(np.arange(n, dtype=np.int64), ntok)
    nchars = np.fromiter((len(s) for s in t), np.int64, count=n)

    # unigram: count of the most frequent token per doc
    c1 = (pd.DataFrame({"d": doc, "g": flat})
          .groupby(["d", "g"], sort=False).size()
          .groupby(level=0).max())
    mc1 = np.zeros(n, np.int64)
    mc1[c1.index.to_numpy()] = c1.to_numpy()

    def gram_counts(k: int) -> pd.DataFrame:
        """(doc, gram) -> count, charlen for word k-grams."""
        if total < k:
            return pd.DataFrame({"d": [], "c": [], "l": []})
        m = doc[: total - k + 1] == doc[k - 1:]
        parts = flat[: total - k + 1]
        for i in range(1, k):
            parts = parts + " "            # object-array str concat
            parts = parts + flat[i: total - k + 1 + i]
        g = pd.DataFrame({"d": doc[: total - k + 1][m], "g": parts[m]})
        cnt = g.groupby(["d", "g"], sort=False).size().rename("c") \
               .reset_index()
        cnt["l"] = cnt["g"].str.len().astype(np.int64)
        return cnt[["d", "c", "l"]]

    # top 2-gram coverage: among grams with the max count, the max
    # count*len product (deterministic tie-break; mirrors the SQL
    # FILTER (WHERE c = mc) form).
    g2 = gram_counts(2)
    top2 = np.zeros(n, np.int64)
    if len(g2):
        g2["mc"] = g2.groupby("d")["c"].transform("max")
        sel = g2[g2["c"] == g2["mc"]]
        prod = (sel["c"] * sel["l"]).groupby(sel["d"].to_numpy()).max()
        top2[prod.index.to_numpy()] = prod.to_numpy()

    # duplicated 3-gram coverage
    g3 = gram_counts(3)
    dup3 = np.zeros(n, np.int64)
    if len(g3):
        dups = g3[g3["c"] > 1]
        s = (dups["c"] * dups["l"]).groupby(dups["d"].to_numpy()).sum()
        dup3[s.index.to_numpy()] = s.to_numpy()

    safe = np.where(nchars == 0, 1, nchars).astype(np.float64)
    return pd.DataFrame({
        "n_tokens": ntok,
        "max_tok_frac": mc1 / ntok.astype(np.float64),
        "top2_char_frac": np.where(nchars == 0, 0.0, top2 / safe),
        "dup3_char_frac": np.where(nchars == 0, 0.0, dup3 / safe),
    })


def repetition_sql(table: str = "documents", text: str = "text",
                   key: str = "doc_id") -> str:
    """DuckDB oracle for :func:`repetition_frame` over ``table``.

    Counts and char lengths are BIGINT; each output fraction is ONE
    int/int division (DuckDB ``/`` on integers yields DOUBLE), so the
    comparison is bit-exact."""
    return """
    WITH base AS (
      SELECT {key} AS doc_id, {text} AS text,
             string_split({text}, ' ') AS l
      FROM {table}
    ),
    tok AS (
      SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM base
    ),
    u1 AS (
      SELECT doc_id, max(c) AS mc FROM (
        SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
      GROUP BY doc_id
    ),
    c2 AS (
      SELECT a.doc_id, a.tok || ' ' || b.tok AS gram,
             count(*) AS c, len(a.tok || ' ' || b.tok) AS gl
      FROM tok a JOIN tok b
        ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      GROUP BY a.doc_id, gram
    ),
    t2 AS (
      SELECT doc_id, max(c * gl) FILTER (WHERE c = mc) AS topchars
      FROM (SELECT c2.*, max(c) OVER (PARTITION BY doc_id) AS mc
            FROM c2)
      GROUP BY doc_id
    ),
    c3 AS (
      SELECT a.doc_id,
             a.tok || ' ' || b.tok || ' ' || c.tok AS gram,
             count(*) AS c,
             len(a.tok || ' ' || b.tok || ' ' || c.tok) AS gl
      FROM tok a
      JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
      JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
      GROUP BY a.doc_id, gram
    ),
    d3 AS (
      SELECT doc_id, sum(c * gl) FILTER (WHERE c > 1) AS dupchars
      FROM c3 GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.l) AS BIGINT) AS n_tokens,
           u1.mc / len(b.l) AS max_tok_frac,
           CASE WHEN len(b.text) = 0 THEN 0.0
                ELSE COALESCE(t2.topchars, 0) / len(b.text)
           END AS top2_char_frac,
           CASE WHEN len(b.text) = 0 THEN 0.0
                ELSE COALESCE(d3.dupchars, 0) / len(b.text)
           END AS dup3_char_frac
    FROM base b
    JOIN u1 ON u1.doc_id = b.doc_id
    LEFT JOIN t2 ON t2.doc_id = b.doc_id
    LEFT JOIN d3 ON d3.doc_id = b.doc_id""".format(
        table=table, text=text, key=key)
