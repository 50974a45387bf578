"""Heuristic language identification (no external models — script
ranges + stopword n-gram scoring), deterministic, vectorized enough.

A first-class text-analysis op for the training-data pipeline; not
present in the reference (its analog is the colorspace transform in
``src/features/color.rs:45-46`` — a fixed per-record classification
kernel). Runs as a stateless ``map_batches`` stage.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "over", "quick",
           "dog", "fox"},
    "de": {"der", "die", "das", "und", "über", "nicht", "ist", "ein",
           "schnelle", "hunde"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "par",
           "rapide", "chien"},
}
_RE_CJK = re.compile(r"[一-鿿]")
_RE_ARABIC = re.compile(r"[؀-ۿ]")
_RE_DE_CHARS = re.compile(r"[äöüßÄÖÜ]")
_RE_FR_CHARS = re.compile(r"[àâçéèêëîïôùûœÀÂÇÉÈÊËÎÏÔÙÛ]")
_RE_WORD = re.compile(r"[^\W\d_]+", re.U)


def langid_frame(texts: pd.Series) -> pd.DataFrame:
    """-> DataFrame(pred_lang: str, lang_confidence: float64)."""
    s = texts.fillna("")
    n = s.str.len().to_numpy(np.float64)
    cjk = s.str.count(_RE_CJK).to_numpy(np.float64)
    ara = s.str.count(_RE_ARABIC).to_numpy(np.float64)
    dech = s.str.count(_RE_DE_CHARS).to_numpy(np.float64)
    frch = s.str.count(_RE_FR_CHARS).to_numpy(np.float64)

    preds = np.full(len(s), "und", dtype=object)
    conf = np.zeros(len(s))
    tok_lists = s.str.lower().str.findall(_RE_WORD)
    for i, toks in enumerate(tok_lists):
        if n[i] == 0:
            continue
        if cjk[i] / n[i] > 0.05:
            preds[i], conf[i] = "zh", min(1.0, cjk[i] / n[i] * 4)
            continue
        if ara[i] / n[i] > 0.05:
            preds[i], conf[i] = "ar", min(1.0, ara[i] / n[i] * 4)
            continue
        nt = max(1, len(toks))
        scores = {
            lang: sum(t in sw for t in toks) / nt
            for lang, sw in _STOPWORDS.items()
        }
        scores["de"] += 2.0 * dech[i] / n[i] * 10
        scores["fr"] += 2.0 * frch[i] / n[i] * 10
        # Deterministic argmax: score desc, then lang name asc.
        best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] > 0:
            preds[i], conf[i] = best[0], min(1.0, best[1])
    return pd.DataFrame({"pred_lang": preds,
                         "lang_confidence": conf}, index=texts.index)


def langid_sql(table: str = "documents") -> str:
    """DuckDB oracle mirroring ``langid_frame`` expression-for-
    expression (same division shapes -> identical doubles; the
    rounding uses the shared half-away formula, texture._sql_r6).
    RE2's ``\\p{L}+`` stands in for Python's ``[^\\W\\d_]+`` — equal on
    the letter repertoire this corpus uses."""
    from .texture import _sql_r6

    def cnt(cls: str) -> str:
        return ("(length(text) - length(regexp_replace(text, '%s', "
                "'', 'g'))) * 1.0" % cls)

    def stop(lang: str) -> str:
        words = ", ".join("'%s'" % w for w in sorted(_STOPWORDS[lang]))
        return ("coalesce(list_sum(list_transform(toks, t -> CASE "
                "WHEN t IN (%s) THEN 1 ELSE 0 END)), 0) / nt" % words)

    conf_expr = """CASE
      WHEN n = 0 THEN 0.0
      WHEN cjk / n > 0.05 THEN least(1.0, cjk / n * 4)
      WHEN ara / n > 0.05 THEN least(1.0, ara / n * 4)
      WHEN greatest(s_de, s_en, s_fr) > 0
        THEN least(1.0, greatest(s_de, s_en, s_fr))
      ELSE 0.0 END"""
    return """WITH base AS (
  SELECT doc_id, text, length(text) * 1.0 AS n,
         {cjk} AS cjk, {ara} AS ara, {dech} AS dech, {frch} AS frch,
         regexp_extract_all(lower(text), '\\p{{L}}+') AS toks
  FROM {t}),
nt_t AS (SELECT *, greatest(1, len(toks)) * 1.0 AS nt FROM base),
sc AS (
  SELECT doc_id, n, cjk, ara,
         {s_en} AS s_en,
         {s_de} + ((2.0 * dech) / n) * 10 AS s_de,
         {s_fr} + ((2.0 * frch) / n) * 10 AS s_fr
  FROM nt_t)
SELECT doc_id,
  CASE
    WHEN n = 0 THEN 'und'
    WHEN cjk / n > 0.05 THEN 'zh'
    WHEN ara / n > 0.05 THEN 'ar'
    WHEN greatest(s_de, s_en, s_fr) <= 0 THEN 'und'
    WHEN s_de >= s_en AND s_de >= s_fr THEN 'de'
    WHEN s_en >= s_fr THEN 'en'
    ELSE 'fr' END AS pred_lang,
  {conf} AS lang_confidence
FROM sc""".format(
        t=table,
        cjk=cnt("[一-鿿]"), ara=cnt("[؀-ۿ]"),
        dech=cnt("[äöüßÄÖÜ]"),
        frch=cnt("[àâçéèêëîïôùûœÀÂÇÉÈÊËÎÏÔÙÛ]"),
        s_en=stop("en"), s_de=stop("de"), s_fr=stop("fr"),
        conf=_sql_r6(conf_expr))
