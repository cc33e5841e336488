"""Point-to-plane (D2) metric tests: exact NN vectors vs brute force,
PCA normal sanity, and the defining tangential-insensitivity property."""

import numpy as np

from nvfpcc_tpu.metrics import d1_psnr, d2_psnr, estimate_normals, nn_vectors


def _plane(z=5, n=16):
    g = np.arange(n)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    return np.stack([xx.ravel(), yy.ravel(), np.full(n * n, z)], 1).astype(np.int64)


def test_nn_vectors_exact_vs_brute_force(rng):
    a = np.unique(rng.integers(0, 30, (150, 3)), axis=0)
    b = np.unique(rng.integers(0, 30, (120, 3)), axis=0)
    e, j = nn_vectors(a, b, radius=60, platform="cpu")
    # the matched point is a true nearest neighbor
    diff = b[:, None, :] - a[None, :, :]
    want = (diff * diff).sum(-1).min(0)
    got = (e * e).sum(-1)
    assert np.array_equal(got, want)
    assert np.array_equal(a + e, b[j])


def test_plane_normals_are_z():
    pts = _plane()
    normals, valid = estimate_normals(pts, radius=2)
    assert valid.all()
    assert np.allclose(np.abs(normals[:, 2]), 1.0)
    assert np.allclose(normals[:, :2], 0.0)


def test_sphere_normals_are_radial(rng):
    c, r = 20.0, 12.0
    g = np.arange(40)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([zz.ravel(), yy.ravel(), xx.ravel()], 1).astype(np.int64)
    dist = np.sqrt(((p - c) ** 2).sum(1))
    pts = p[np.abs(dist - r) < 0.5]
    normals, valid = estimate_normals(pts, radius=2)
    radial = (pts[valid] - c) / np.linalg.norm(pts[valid] - c, axis=1, keepdims=True)
    align = np.abs(np.einsum("ij,ij->i", normals[valid], radial))
    assert (align > 0.8).mean() > 0.9


def test_normal_shift_d2_equals_d1():
    a = _plane(z=5)
    b = _plane(z=6)
    m1 = d1_psnr(a, b, depth=6)
    m2 = d2_psnr(a, b, depth=6)
    assert np.isclose(m1["mse"], 1.0)
    assert np.isclose(m2["mse"], 1.0)
    assert np.isclose(m1["psnr"], m2["psnr"])


def test_tangential_shift_is_free_for_d2():
    """Sliding a plane along itself costs D1 at the edge but no D2 — the
    property that makes point-to-plane the surface-quality metric."""
    a = _plane(z=5)
    b = a.copy()
    b[:, 0] += 1  # shift along x, within the surface
    m1 = d1_psnr(a, b, depth=6)
    m2 = d2_psnr(a, b, depth=6)
    assert m1["mse"] > 0.0
    assert m2["mse"] < 1e-12
    assert m2["psnr"] == float("inf")


def test_degenerate_normals_fall_back_to_full_error():
    # an isolated pair: no plane is defined at the target, so D2 must keep
    # the full Euclidean error (equal to D1), not report zero
    a = np.array([[5, 5, 5]])
    b = np.array([[5, 5, 7]])
    m1 = d1_psnr(a, b, depth=6)
    m2 = d2_psnr(a, b, depth=6)
    assert m2["mse"] == m1["mse"] == 4.0


def test_identical_clouds_infinite_d2():
    pts = _plane()
    m = d2_psnr(pts, pts, depth=6)
    assert m["mse"] == 0.0 and m["psnr"] == float("inf")
