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


# ---------------------------------------------------------------------------
# full cross-validation against an independent brute-force implementation
# ---------------------------------------------------------------------------


def _brute_normals(pts, radius=2):
    """Independent windowed-PCA normals: python-set membership + per-point
    loops (vs the implementation's sorted-key searchsorted scatter). Same
    mathematical definition (covariance = E[qq^T] - mean mean^T over the
    occupied Chebyshev window, smallest-eigenvector normal, valid iff >= 3
    neighbors); np.linalg.eigh itself is shared — the machinery under test
    is the neighborhood accumulation, not LAPACK."""
    occupied = {tuple(p) for p in pts}
    n = len(pts)
    nrm = np.zeros((n, 3))
    valid = np.zeros(n, bool)
    r = radius
    for i, p in enumerate(pts):
        nb = [
            (p[0] + dz, p[1] + dy, p[2] + dx)
            for dz in range(-r, r + 1)
            for dy in range(-r, r + 1)
            for dx in range(-r, r + 1)
            if (p[0] + dz, p[1] + dy, p[2] + dx) in occupied
        ]
        if len(nb) < 3:
            continue
        q = np.array(nb, np.float64)
        mean = q.mean(0)
        cov = q.T @ q / len(q) - np.outer(mean, mean)
        _, v = np.linalg.eigh(cov)
        nrm[i] = v[:, 0]
        valid[i] = True
    return nrm, valid


def _brute_one_way_bounds(src, dst, nrm, vld):
    """Per-src-point [lo, hi] bounds over ALL tied nearest neighbors (any
    tied neighbor is a valid NN by the metric's documented contract), plus a
    uniqueness mask. Each candidate value is the squared normal projection
    at that neighbor, or the full squared error where its normal is
    undefined."""
    d = src[:, None, :] - dst[None, :, :]
    sq = (d * d).sum(-1)
    best = sq.min(1)
    lo = np.empty(len(src))
    hi = np.empty(len(src))
    unique = np.empty(len(src), bool)
    for i in range(len(src)):
        js = np.where(sq[i] == best[i])[0]
        vals = []
        for j in js:
            e = (dst[j] - src[i]).astype(np.float64)
            if vld[j]:
                vals.append(float(np.dot(e, nrm[j]) ** 2))
            else:
                vals.append(float(np.dot(e, e)))
        lo[i], hi[i] = min(vals), max(vals)
        unique[i] = len(js) == 1
    return lo, hi, unique


def _blob(rng, n_target, c, r, extra=()):
    g = np.arange(int(2 * (c + r)))
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    p = np.stack([zz.ravel(), yy.ravel(), xx.ravel()], 1).astype(np.int64)
    bump = 1.0 + 0.15 * np.sin(p[:, 0] * 0.9) * np.cos(p[:, 1] * 1.1)
    dist = np.sqrt(((p - c) ** 2).sum(1))
    pts = p[np.abs(dist - r * bump) < 0.6]
    pts = pts[rng.permutation(len(pts))[:n_target]]
    if len(extra):
        pts = np.concatenate([pts, np.asarray(extra, np.int64)])
    return np.unique(pts, axis=0)


def test_d2_cross_validated_against_brute_force(rng):
    """Full-pipeline cross-check of d2_psnr on an irregular fixture with
    isolated points (degenerate-normal fallback) in BOTH clouds: every
    per-point squared error must land inside the tied-NN bounds of the
    brute-force implementation, must equal it exactly where the NN is
    unique, and the reported mse must be the mean of the per-point values."""
    from nvfpcc_tpu.metrics.d2 import estimate_normals as impl_normals
    from nvfpcc_tpu.metrics.d2 import nn_vectors as impl_nn

    a = _blob(rng, 260, c=16.0, r=9.0, extra=[[34, 2, 2], [2, 33, 2]])
    b = _blob(rng, 240, c=16.5, r=9.0, extra=[[2, 2, 34]])

    m = d2_psnr(a, b, depth=6)

    for src, dst, key in ((a, b, "mse_ab"), (b, a, "mse_ba")):
        nrm_i, vld_i = impl_normals(dst, 2)
        nrm_b, vld_b = _brute_normals(dst, 2)
        assert np.array_equal(vld_i, vld_b)
        # same covariance -> same eigh output, up to sign
        assert np.allclose(np.abs((nrm_i * nrm_b).sum(1))[vld_b], 1.0, atol=1e-9)
        # at least one degenerate target must be exercised
        assert not vld_b.all()

        e, j = impl_nn(src, dst, radius=63, platform="cpu")
        ef = e.astype(np.float64)
        proj = np.einsum("ij,ij->i", ef, nrm_i[j])
        sq = np.where(vld_i[j], proj * proj, np.einsum("ij,ij->i", ef, ef))

        lo, hi, unique = _brute_one_way_bounds(src, dst, nrm_b, vld_b)
        assert (sq >= lo - 1e-9).all() and (sq <= hi + 1e-9).all()
        assert np.allclose(sq[unique], lo[unique], atol=1e-9)
        assert unique.mean() > 0.5  # the exact check covers most points
        # the reported mse is the mean of exactly these per-point values
        assert np.isclose(m[key], sq.mean(), rtol=1e-12)
