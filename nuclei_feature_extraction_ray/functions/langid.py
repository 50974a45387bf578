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
