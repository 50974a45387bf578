"""Property coverage for the embedding operators whose results are
not SQL-expressible (embedding_pca) plus cross-op invariants the
oracles can't see (quantize range, covariance symmetry source).

The oracled twins (embedding_covariance, embedding_quantize,
label_centroid_sim) are value-checked by tests/test_conformance.py;
these tests pin the algebraic properties the PCA path relies on."""
from __future__ import annotations

import numpy as np
import pytest

from nuclei_feature_extraction_ray.pipelines.queries import (
    _EMB_DIM, _pca_components, QUERIES)


@pytest.fixture(scope="module")
def pca_frame(sf_small):
    return QUERIES["embedding_pca"](sf_small)


def test_pca_deterministic(sf_small, pca_frame):
    again = QUERIES["embedding_pca"](sf_small)
    assert pca_frame.equals(again)


def test_pca_variance_ordering_and_centering(pca_frame):
    # descending explained variance, and projections of the centered
    # data are themselves (numerically) centered
    assert pca_frame["pc1"].var() >= pca_frame["pc2"].var()
    scale = pca_frame[["pc1", "pc2"]].abs().to_numpy().max()
    assert abs(pca_frame["pc1"].mean()) < 1e-6 * scale
    assert abs(pca_frame["pc2"].mean()) < 1e-6 * scale


def test_pca_components_orthonormal_and_sign_fixed(sf_small):
    comps, mean = _pca_components(sf_small, k=2)
    assert comps.shape == (2, _EMB_DIM)
    gram = comps @ comps.T
    assert np.allclose(gram, np.eye(2), atol=1e-10)
    for r in range(2):
        assert comps[r][np.argmax(np.abs(comps[r]))] > 0
    assert mean.shape == (_EMB_DIM,)


def test_pca_projection_uncorrelated(pca_frame):
    # principal axes diagonalize the covariance: the two projected
    # coordinates are uncorrelated up to float noise
    r = np.corrcoef(pca_frame["pc1"], pca_frame["pc2"])[0, 1]
    assert abs(r) < 1e-6


def test_quantize_codes_in_range(sf_small):
    q = QUERIES["embedding_quantize"](sf_small)
    codes = q["code"].to_numpy(np.int64)
    assert codes.min() >= 0 and codes.max() <= 255
    # every (vec, dim) cell present exactly once
    assert len(q) == q["vec_id"].nunique() * _EMB_DIM
