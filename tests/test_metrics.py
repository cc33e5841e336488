"""D1 PSNR metric tests vs brute force."""

import numpy as np

from nvfpcc_tpu.grids.edt import brute_force_sq_dist
from nvfpcc_tpu.metrics import d1_psnr
from nvfpcc_tpu.metrics.d1 import _nn_sq_dists


def test_identical_clouds_infinite_psnr():
    pts = np.array([[1, 2, 3], [10, 10, 10], [30, 5, 7]])
    m = d1_psnr(pts, pts, depth=6)
    assert m["mse"] == 0.0
    assert m["psnr"] == float("inf")


def test_nn_matches_brute_force():
    rng = np.random.default_rng(0)
    a = np.unique(rng.integers(0, 40, (200, 3)), axis=0)
    b = np.unique(rng.integers(0, 40, (150, 3)), axis=0)
    got = _nn_sq_dists(a, b, radius=70, platform="cpu")
    want = brute_force_sq_dist(a, b)
    assert np.array_equal(got, want)


def test_symmetric_and_known_value():
    a = np.array([[0, 0, 0]])
    b = np.array([[3, 0, 0]])
    m = d1_psnr(a, b, depth=4)
    assert m["mse_ab"] == 9.0 and m["mse_ba"] == 9.0
    peak = 15
    import math

    assert abs(m["psnr"] - 10 * math.log10(3 * peak * peak / 9.0)) < 1e-9


def test_shifted_cloud():
    rng = np.random.default_rng(1)
    a = np.unique(rng.integers(5, 60, (500, 3)), axis=0)
    b = a + np.array([1, 0, 0])
    m = d1_psnr(a, b, depth=6)
    # each point's NN is at most 1 away (its shifted twin), possibly 0
    assert 0 < m["mse"] <= 1.0
