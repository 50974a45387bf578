"""Driver contract (see module docstring history): ``entry`` runs the
flagship pages pipeline at sf0.001-ish scale; ``queries`` /
``oracle_sql`` expose every implemented operator (SURVEY.md §2 + the
training-data ops) with DuckDB oracles where SQL-expressible.

Ray is initialised by the driver BEFORE import — nothing here (or in
the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: synthetic pages corpus (t1 ~ sf0.001 scale) ->
    extract -> partition -> windowed features. Returns the feature
    Dataset."""
    import os

    import ray.data as rd

    from nuclei_feature_extraction_ray.corpus import corpus_dir
    from nuclei_feature_extraction_ray.pipelines.pages_features import (
        compute_features)

    d = corpus_dir("t1")
    pages = rd.read_parquet(os.path.join(d, "pages"),
                            columns=["url", "warc_ts", "html", "lang"])
    return compute_features(pages, num_partitions=8)


def queries() -> dict[str, Callable[[str], Any]]:
    from nuclei_feature_extraction_ray.pipelines.queries import all_queries
    return all_queries()


def oracle_sql() -> dict[str, str]:
    from nuclei_feature_extraction_ray.pipelines.queries import (
        all_oracle_sql)
    return all_oracle_sql()
