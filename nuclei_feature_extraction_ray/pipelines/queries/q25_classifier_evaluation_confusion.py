# split from queries.py (order-preserving); see queries/__init__.py
from __future__ import annotations

from ._shared import (ORACLE, _combine_partials, _path, langid_frame, np, pd, rd, register)

@register("lang_confusion", sql="""
    WITH pred AS (__LID__)
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM pred p JOIN documents d USING (doc_id)
    GROUP BY true_lang, p.pred_lang
    ORDER BY true_lang, p.pred_lang""")
def lang_confusion(sf_dir: str):
    """Classifier-evaluation confusion matrix: the heuristic lang-ID
    predictions crossed with the labeled language — the eval grid
    every model-assisted curation step reports before trusting a
    filter. Stateless vectorized map (the doc_langid kernel) followed
    by bounded (true, pred) grid partials and one tiny combine; the
    oracle re-runs the full mirrored lang-ID SQL as a subquery, so
    prediction AND aggregation are both checked."""
    ds = rd.read_parquet(_path(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        pred = langid_frame(b["text"])["pred_lang"].to_numpy(object)
        g = pd.DataFrame({"true_lang": b["lang"].to_numpy(object),
                          "pred_lang": pred}) \
            .groupby(["true_lang", "pred_lang"],
                     as_index=False).agg(n=("pred_lang", "size"))
        g["n"] = g["n"].astype(np.int64)
        return g

    out = _combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["true_lang", "pred_lang"], ["n"])
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["true_lang", "pred_lang"],
                           kind="mergesort").reset_index(drop=True)


# doc_langid's SQL contains regex braces ({L}), so splice with
# replace, not str.format.
ORACLE["lang_confusion"] = ORACLE["lang_confusion"].replace(
    "__LID__", ORACLE["doc_langid"])
