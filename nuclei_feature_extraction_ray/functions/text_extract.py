"""Batched HTML -> text extraction (graft analog of the reference's
per-batch patch loader, ``src/utils.rs:79-139``).

The extraction MUST be byte-identical to the canonical
``corpus.extract_text_one`` for every url (driver ``input_hint``
invariant). Unparseable rows are nulled out and counted, mirroring the
reference's silent drop of failed patch reads (``src/utils.rs:110-126``)
but with the loss made observable.

Used as an actor-pool ``map_batches`` stage: regexes are compiled once
per actor in ``__init__``; ``__call__`` handles one Arrow batch.
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np
import pyarrow as pa

# Same automata as corpus.extract_text_one, kept separate so the test
# suite can verify the batched path against the canonical one.
_RE_SCRIPT = re.compile(rb"<script\b.*?</script>", re.S | re.I)
_RE_STYLE = re.compile(rb"<style\b.*?</style>", re.S | re.I)
_RE_BLOCK = re.compile(rb"</(?:p|h[1-6]|li|title|div)>|<br\s*/?>", re.I)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_NL_SPACE = re.compile(r" ?\n ?")
_RE_MULTI_NL = re.compile(r"\n{2,}")


class ExtractText:
    """Actor-pool stage: html(binary) -> extracted_text(string) + ok flag.

    Per-row Python is unavoidable for HTML parsing, but the work is
    dominated by the C regex engine; all column plumbing stays Arrow.
    """

    def __init__(self, html_col: str = "html",
                 out_col: str = "extracted_text"):
        self.html_col = html_col
        self.out_col = out_col

    def _one(self, b) -> str | None:
        if b is None or len(b) == 0:
            return None
        if b"<html" not in b[:256].lower():
            return None
        raw = _RE_TAG.sub(b"", _RE_BLOCK.sub(
            b"\n", _RE_STYLE.sub(b"", _RE_SCRIPT.sub(b"", b))))
        try:
            s = raw.decode("utf-8")
        except UnicodeDecodeError:
            return None
        s = _htmllib.unescape(s)
        s = _RE_SPACES.sub(" ", s)
        s = _RE_NL_SPACE.sub("\n", s)
        s = _RE_MULTI_NL.sub("\n", s)
        return s.strip()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [self._one(b) for b in
                 batch[self.html_col].to_pylist()]
        arr = pa.array(texts, pa.string())
        ok = pa.array(np.asarray([t is not None for t in texts]))
        out = batch.append_column(self.out_col, arr)
        return out.append_column("extract_ok", ok)
