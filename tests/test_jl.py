"""JL ±1 sign-matrix properties (pipelines/queries.py::_jl_signs):
determinism, balance, and the distance-preservation behavior the
jl_projection_embeddings audit reports."""

import numpy as np

from tilemaker_ray.pipelines.queries import _JL_D, _JL_K, _jl_signs


def test_signs_deterministic_and_pm1():
    R = _jl_signs()
    assert R.shape == (_JL_D, _JL_K)
    assert set(np.unique(R).tolist()) <= {-1, 1}
    assert np.array_equal(R, _jl_signs())


def test_signs_balanced_and_uncorrelated():
    # a usable JL sign matrix is near-balanced overall and per column,
    # and — the property the first (affine) hash violated with two
    # IDENTICAL columns — its columns are near-orthogonal
    R = _jl_signs()
    assert abs(int(R.sum())) < _JL_D * _JL_K * 0.2
    col_bias = np.abs(R.sum(axis=0))
    assert (col_bias < _JL_D * 0.5).all()
    G = R.T @ R
    offdiag = np.abs(G - np.diag(np.diag(G))).max()
    assert offdiag <= 24, offdiag  # random ±1 cols: O(sqrt(64)) ≈ 8


def test_distance_preservation_on_random_vectors():
    # E[(x . r)^2] = ||x||^2 for iid +-1 signs, so the reported
    # distortion (d2_proj / K) / d2_orig concentrates around 1; with
    # K=16 the spread is wide but the MEAN over many pairs must land
    # near 1 — this is the empirical check that the deterministic
    # hash matrix behaves like a random one on generic inputs
    rng = np.random.RandomState(7)
    R = _jl_signs()
    X = rng.randint(-2000, 2000, size=(400, _JL_D)).astype(np.int64)
    Y = rng.randint(-2000, 2000, size=(400, _JL_D)).astype(np.int64)
    diff = X - Y
    d2o = (diff ** 2).sum(axis=1)
    d2p = ((diff @ R) ** 2).sum(axis=1)
    ratio = d2p / (_JL_K * d2o)
    assert 0.85 < float(ratio.mean()) < 1.15
    # and individual pairs stay within the loose JL envelope
    assert float(np.quantile(ratio, 0.05)) > 0.2
    assert float(np.quantile(ratio, 0.95)) < 2.5
