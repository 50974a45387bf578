"""Golden-frame generator for the ``bpe_merges`` oracle.

BPE tokenizer training is an iterative merge loop — not
SQL-expressible — so the driver oracle for ``bpe_merges`` is a STORED
GOLDEN: this script recomputes the merge table with an implementation
INDEPENDENT of the Ray engine — DuckDB builds the (token, count)
vocabulary in SQL and a plain Counter/sorted merge loop learns the
rules — and writes ``goldens/bpe_merges_sf0_01.parquet``. The
registered oracle SQL just reads that file, pinning the engine's
output frame-exactly at the driver's correctness scale (sf0.01).

Independence: no imports from nuclei_feature_extraction_ray. Spec
shared with the engine (documented, not imported): tokens are
whitespace-split words (DuckDB regex split on ``[ \\t\\n\\r\\f]+``
after trim, empties dropped); 20 merge rounds (_BPE_ROUNDS); per
round the winning pair maximizes (count, then lexicographically
smallest pair); rank is 1-based. The same reference loop is asserted
against the engine at sf0.001 in tests/test_kernels.py
(test_bpe_merges_matches_reference).

Rerun after any intentional semantic change:
    python tools/gen_bpe_golden.py
"""
import os
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

SF = os.environ.get("BPE_GOLDEN_SF", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "goldens",
    "bpe_merges_sf0_01.parquet")
ROUNDS = 20    # _BPE_ROUNDS (documented spec, deliberately not imported)

vocab = duckdb.connect().execute("""
    WITH toks AS (
      SELECT unnest(string_split_regex(
               trim(text, E' \t\n\r\f'), '[ \t\n\r\f]+')) AS t
      FROM read_parquet('%s/documents.parquet')
      WHERE trim(text, E' \t\n\r\f') <> '')
    SELECT t, count(*) AS n FROM toks WHERE t <> ''
    GROUP BY t ORDER BY t""" % SF).df()

words = {tuple(t): int(n) for t, n in zip(vocab["t"], vocab["n"])}
ranks, lefts, rights, ns = [], [], [], []
for r in range(ROUNDS):
    stats: Counter = Counter()
    for w, f in words.items():
        for a, b in zip(w, w[1:]):
            stats[(a, b)] += f
    if not stats:
        break
    best = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    (left, right), n = best
    nxt: Counter = Counter()
    for w, f in words.items():
        nw, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and (w[i], w[i + 1]) == (left, right):
                nw.append(left + right)
                i += 2
            else:
                nw.append(w[i])
                i += 1
        nxt[tuple(nw)] += f
    words = dict(nxt)
    ranks.append(r + 1)
    lefts.append(left)
    rights.append(right)
    ns.append(n)

golden = pd.DataFrame({"rank": np.asarray(ranks, np.int64),
                       "left": np.asarray(lefts, object),
                       "right": np.asarray(rights, object),
                       "n": np.asarray(ns, np.int64)})
golden.to_parquet(OUT, index=False)
print("wrote %s (%d merge rules)" % (OUT, len(golden)))
