"""Feature-family registry + alias expansion + job config — the
user-extension surface (SURVEY.md §2.9), recasting the reference's
``FeatureSet`` trait (``src/features/mod.rs:12-28``) and CLI enum
registry with alias expansion (``src/args.rs:7-73``: ``all`` ->
{geometry,color,glcm,glrlm,gabor}, ``texture`` -> {glcm,glrlm,gabor},
unknown name -> parse error).

A family declares a deterministic column list (schema derived from
config constants, like the reference's constant feature grids) and a
vectorized ``compute`` over one sorted partition frame. The pipeline
column-concatenates the selected families in one pass — the graft
equivalent of the reference's per-batch hstack (``src/main.rs:76-87``),
no join needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Protocol

import numpy as np
import pandas as pd


class FeatureFamily(Protocol):
    name: str
    columns: list[str]

    def compute(self, g: pd.DataFrame) -> pd.DataFrame: ...


@dataclass(frozen=True)
class _Family:
    name: str
    columns: list[str]
    _fn: Callable[[pd.DataFrame], pd.DataFrame]

    def compute(self, g: pd.DataFrame) -> pd.DataFrame:
        out = self._fn(g)
        return out[self.columns]


def _structure(g: pd.DataFrame) -> pd.DataFrame:
    return g


def _temporal(g: pd.DataFrame) -> pd.DataFrame:
    from .pipelines.pages_features import ROLLING_SPAN
    from .stages.window import add_rolling_time, td_seconds
    gb = g.groupby("url", sort=False)
    out = pd.DataFrame(index=g.index)
    out["snap_idx"] = gb.cumcount().astype(np.int64)
    prev_ts = gb["warc_ts"].shift(1)
    out["gap_sec"] = td_seconds(g["warc_ts"] - prev_ts)
    out["delta_n_chars"] = (g["n_chars"]
                            - gb["n_chars"].shift(1)).astype(np.float64)
    first_ts = gb["warc_ts"].transform("min")
    out["days_since_first"] = (
        td_seconds(g["warc_ts"] - first_ts) / 86400.0)
    tmp = g[["url", "warc_ts", "n_chars"]].copy()
    tmp = add_rolling_time(tmp, "url", "warc_ts", "n_chars",
                           ROLLING_SPAN, "r30_")
    for c in ("r30_min", "r30_max", "r30_mean", "r30_count"):
        out[c] = tmp[c]
    return out


def _session(g: pd.DataFrame) -> pd.DataFrame:
    from .pipelines.pages_features import SESSION_GAP
    from .stages.window import add_session_ids
    tmp = g[["url", "warc_ts"]].copy()
    tmp = add_session_ids(tmp, "url", "warc_ts",
                          SESSION_GAP.total_seconds())
    return tmp[["session_id"]]


def _lang(g: pd.DataFrame) -> pd.DataFrame:
    from .pipelines.pages_features import LANG_STAB_K
    from .stages.window import segment_codes, segment_starts
    gb = g.groupby("url", sort=False)
    out = pd.DataFrame(index=g.index)
    prev_lang = gb["lang"].shift(1)
    out["lang_changed"] = (
        prev_lang.notna() & (g["lang"] != prev_lang)).astype(np.int64)
    codes = segment_codes(g["url"].to_numpy())
    seg_start = segment_starts(codes)
    lang_arr = g["lang"].to_numpy()
    idx = np.arange(len(g))
    same = np.zeros(len(g), np.float64)
    avail = np.zeros(len(g), np.float64)
    for j in range(LANG_STAB_K):
        back = idx - j
        ok = back >= seg_start
        same += ok & (lang_arr[np.maximum(back, 0)] == lang_arr)
        avail += ok
    out["lang_stab_5"] = np.divide(
        same, avail, out=np.full(len(g), np.nan), where=avail > 0)
    return out


def _texture_families() -> dict[str, "_Family"]:
    """The GLCM/GLRLM/Gabor-analog families (functions/texture.py).
    Their columns are computed pre-shuffle (stateless per-row kernels,
    like structure/charclass) so compute is an identity selection."""
    from .functions.texture import (COOC_COLUMNS, RUNLEN_COLUMNS,
                                    SPECTRUM_COLUMNS)
    return {
        "cooc": _Family("cooc", COOC_COLUMNS, _structure),
        "runlen": _Family("runlen", RUNLEN_COLUMNS, _structure),
        "spectrum": _Family("spectrum", SPECTRUM_COLUMNS, _structure),
    }


#: name -> family. Deterministic column grids (schema from config).
FAMILIES: dict[str, _Family] = {
    "structure": _Family("structure",
                         ["n_chars", "n_bytes", "n_lines", "n_tokens",
                          "mean_token_len", "ttr",
                          "degenerate_class"], _structure),
    "charclass": _Family("charclass",
                         ["alpha_ratio", "digit_ratio", "upper_ratio",
                          "ws_ratio", "other_ratio"], _structure),
    "temporal": _Family("temporal",
                        ["snap_idx", "gap_sec", "delta_n_chars",
                         "days_since_first", "r30_min", "r30_max",
                         "r30_mean", "r30_count"], _temporal),
    "session": _Family("session", ["session_id"], _session),
    "lang": _Family("lang", ["lang_changed", "lang_stab_5"], _lang),
    **_texture_families(),
}

#: Alias table (src/args.rs:34-49 analog; ``texture`` mirrors the
#: reference's texture -> {glcm, glrlm, gabor} expansion).
ALIASES: dict[str, list[str]] = {
    "all": ["structure", "charclass", "temporal", "session", "lang",
            "cooc", "runlen", "spectrum"],
    "text": ["structure", "charclass"],
    "windowed": ["temporal", "session", "lang"],
    "texture": ["cooc", "runlen", "spectrum"],
}

#: families whose columns come from the pre-shuffle texture kernel
TEXTURE_FAMILY_NAMES = {"cooc", "runlen", "spectrum"}


def expand_families(names: list[str]) -> list[_Family]:
    """Alias-expand, dedup preserving order; unknown -> ValueError
    (the reference's parse error, src/args.rs:27-31)."""
    seen: list[str] = []
    for n in names:
        for m in ALIASES.get(n, [n]):
            if m not in FAMILIES:
                raise ValueError(
                    "unknown feature family %r (known: %s; aliases: %s)"
                    % (m, sorted(FAMILIES), sorted(ALIASES)))
            if m not in seen:
                seen.append(m)
    return [FAMILIES[m] for m in seen]


def feature_schema(names: list[str]) -> list[str]:
    """Deterministic output schema for a family selection."""
    cols = ["url", "warc_ts", "lang"]
    for fam in expand_families(names):
        cols.extend(fam.columns)
    return cols


@dataclass
class JobConfig:
    """Pipeline job config (the reference's lazy_static ARGS singleton,
    src/args.rs:186-188, made an explicit value)."""
    input_path: str
    output_path: str
    features: list[str] = field(default_factory=lambda: ["all"])
    num_partitions: int = 32
    output_format: str = "parquet"      # parquet | csv | json
    overwrite: bool = False
    resume: bool = False
