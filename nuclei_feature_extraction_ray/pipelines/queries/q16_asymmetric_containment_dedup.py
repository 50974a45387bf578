# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (JACCARD_NGRAM, _combine_partials, _path, dedup_mod, np, pd, rd, register)

_CONTAIN_TAU = 0.8


@register("containment_pairs", sql="""
    WITH docs AS (
      SELECT doc_id,
             string_split_regex(trim(text, E' \\t\\n\\r\\f'),
                                '[ \\t\\n\\r\\f]+') AS w
      FROM documents
      WHERE trim(text, E' \\t\\n\\r\\f') <> ''
    ), sh AS (
      SELECT doc_id, list_distinct(CASE WHEN len(w) < 2
               THEN [array_to_string(w, ' ')]
               ELSE list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1]) END)
               AS s
      FROM docs
    ), p AS (
      SELECT a.doc_id AS a, b.doc_id AS b,
             len(list_intersect(a.s, b.s)) AS inter,
             len(a.s) AS sa, len(b.s) AS sb
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    )
    SELECT a, b, inter * 1.0 / sa AS cont_a_in_b,
           inter * 1.0 / sb AS cont_b_in_a
    FROM p WHERE inter * 1.0 / sa >= 0.8
             OR inter * 1.0 / sb >= 0.8""")
def containment_pairs_q(sf_dir: str):
    """Asymmetric (containment) near-dup pairs: either doc's shingle
    set >= 80% contained in the other's — catches the short-doc-
    embedded-in-long-doc duplicates that symmetric Jaccard misses.
    Same inverted-index plan as jaccard_pairs (posting exchange ->
    pair exchange, int/int scores); see stages/dedup.py:
    containment_pairs. Exact tier with the same max_df caveat;
    minhash remains the scale path for candidate generation."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return dedup_mod.containment_pairs(
        ds, "text", "doc_id", ngram=JACCARD_NGRAM,
        threshold=_CONTAIN_TAU)


@register("benford_digits", sql="""
    WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                           AS BIGINT) AS digit
               FROM orders),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
    SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS observed,
           ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)
               AS expected,
           CAST(tot AS DOUBLE)
             * (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
                - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
             * (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
                - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
             / (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0))
               AS chi2_term
    FROM c, t ORDER BY digit""")
def benford_digits(sf_dir: str):
    """Benford's-law first-digit census over order totals — the
    fraud/synthetic-data smell test: observed leading-digit shares
    vs log10(1 + 1/d) with per-digit chi-square contributions. The
    digit grid is 9 rows, so per-batch count partials collapse to
    one tiny combine and every float composes identically on the
    driver (obs, exp, tot*(obs-exp)²/exp in oracle order). The
    leading digit comes from the exact integer-cents decimal string
    in both engines — no float log10 edge cases."""
    ds = rd.read_parquet(_path(sf_dir, "orders"),
                         columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(b["o_totalprice"].to_numpy()
                         * 100).astype(np.int64)
        digit = pd.Series(cents).astype(str).str[0] \
            .astype(np.int64).to_numpy()
        g = pd.DataFrame({"digit": digit}).groupby(
            "digit", as_index=False).agg(n=("digit", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    c = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["digit"], ["n"])
    c = c.sort_values("digit", kind="mergesort").reset_index(drop=True)
    tot = np.float64(int(c["n"].sum()))
    rows = []
    for digit, n in zip(c["digit"].astype(int), c["n"].astype(int)):
        obs = np.float64(n) / tot
        exp = np.log(1.0 + 1.0 / np.float64(digit)) / np.log(10.0)
        rows.append({"digit": np.int64(digit), "n": np.int64(n),
                     "observed": obs, "expected": exp,
                     "chi2_term": tot * (obs - exp) * (obs - exp)
                     / exp})
    return pd.DataFrame(rows)
