"""PLY I/O, octree partitioner, and EDT grid-builder tests
(SURVEY.md §4 gate 2: golden-value tests on tiny synthetic clouds)."""

import numpy as np
import pytest

from nvfpcc_tpu.grids.builder import build_artifacts, build_block_grids
from nvfpcc_tpu.grids.edt import brute_force_sq_dist, squared_edt_3d
from nvfpcc_tpu.io.ply import read_ply_points, write_ply_points
from nvfpcc_tpu.octree.partition import (
    leaf_origins,
    partition_cloud,
    subtree_occupancy_string,
)


def _synthetic_cloud(rng, n=500, depth=7):
    """A blobby voxelized surface-ish cloud in a 2^depth cube."""
    size = 1 << depth
    center = size / 2
    theta = rng.uniform(0, np.pi, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    r = size * 0.3 * (1 + 0.1 * rng.standard_normal(n))
    pts = np.stack(
        [
            center + r * np.sin(theta) * np.cos(phi),
            center + r * np.sin(theta) * np.sin(phi),
            center + r * np.cos(theta),
        ],
        -1,
    )
    pts = np.clip(np.round(pts), 0, size - 1).astype(np.int64)
    return np.unique(pts, axis=0)


class TestPly:
    def test_ascii_roundtrip(self, tmp_path, rng):
        pts = rng.integers(0, 1024, (100, 3)).astype(np.float64)
        p = tmp_path / "a.ply"
        write_ply_points(str(p), pts, ascii=True)
        back = read_ply_points(str(p))
        np.testing.assert_array_equal(back, pts)

    def test_binary_roundtrip(self, tmp_path, rng):
        pts = rng.integers(0, 1024, (100, 3)).astype(np.float64)
        p = tmp_path / "b.ply"
        write_ply_points(str(p), pts, ascii=False)
        np.testing.assert_array_equal(read_ply_points(str(p)), pts)

    def test_reads_reference_style_ascii_with_color(self, tmp_path):
        # the 8i clouds have uchar rgb after xyz (get_octree.cpp:773-778)
        body = "\n".join(["1 2 3 255 0 0", "4 5 6 0 255 0"])
        header = (
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        p = tmp_path / "c.ply"
        p.write_text(header + body + "\n")
        pts = read_ply_points(str(p))
        np.testing.assert_array_equal(pts, [[1, 2, 3], [4, 5, 6]])


def _reference_dfs_origins(points, depth, level):
    """Direct simulation of the reference's recursive traversal
    (get_octree.cpp:354-411 build_tree + :334-342 traverse + :598-611
    CollectLevelXCallback) as a golden model."""
    size = 1 << depth
    out = []

    def recurse(origin, scale, pts, lv):
        if len(pts) == 0:
            return
        if lv == level:
            out.append(origin)
            return
        half = scale // 2
        for flag in range(8):
            xb, yb, zb = flag & 1, (flag >> 1) & 1, (flag >> 2) & 1
            o = (origin[0] + xb * half, origin[1] + yb * half, origin[2] + zb * half)
            m = (
                ((pts[:, 0] >= origin[0] + half) == bool(xb))
                & ((pts[:, 1] >= origin[1] + half) == bool(yb))
                & ((pts[:, 2] >= origin[2] + half) == bool(zb))
            )
            recurse(o, half, pts[m], lv + 1)

    recurse((0, 0, 0), size, np.asarray(points), 0)
    return np.array(out, dtype=np.int64)


class TestOctree:
    def test_origins_match_reference_traversal_order(self, rng):
        pts = _synthetic_cloud(rng, 800, depth=7)
        ours = leaf_origins(pts, depth=7, level=3)
        golden = _reference_dfs_origins(pts, depth=7, level=3)
        np.testing.assert_array_equal(ours, golden)

    def test_origins_are_block_aligned_and_cover_points(self, rng):
        pts = _synthetic_cloud(rng, 500, depth=7)
        origins = leaf_origins(pts, depth=7, level=3)  # block 16
        assert (origins % 16 == 0).all()
        blocks = {tuple(o) for o in origins}
        for p in pts[:50]:
            assert tuple((p // 16) * 16) in blocks

    def test_subtree_string_simple_case(self):
        # one point at origin of a depth-3 cube, level 1:
        pts = np.array([[0, 0, 0]])
        s = subtree_occupancy_string(pts, depth=3, level=1)
        # root emits children: only child 0 occupied; level-1 node also emits
        # its children (reference emits one level deeper than `level`)
        assert s == "10000000" + "10000000"

    def test_subtree_string_two_octants(self):
        pts = np.array([[0, 0, 0], [7, 7, 7]])
        s = subtree_occupancy_string(pts, depth=3, level=1)
        assert s[:8] == "10000001"
        assert len(s) == 8 + 2 * 8

    def test_partition_cloud(self, rng):
        pts = _synthetic_cloud(rng, 300, depth=6)
        origins, s = partition_cloud(pts, depth=6, level=2)
        assert origins.shape[1] == 3
        assert set(s) <= {"0", "1"}


class TestEDT:
    def test_matches_brute_force_single_point(self):
        occ = np.zeros((16, 16, 16), bool)
        occ[5, 7, 9] = True
        sq = np.asarray(squared_edt_3d(occ, radius=28))
        xs, ys, zs = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
        expected = (xs - 5) ** 2 + (ys - 7) ** 2 + (zs - 9) ** 2
        np.testing.assert_array_equal(sq, expected)

    def test_matches_brute_force_random(self, rng):
        occ = np.zeros((20, 18, 24), bool)
        pts = np.stack(
            [rng.integers(0, 20, 30), rng.integers(0, 18, 30), rng.integers(0, 24, 30)], -1
        )
        occ[pts[:, 0], pts[:, 1], pts[:, 2]] = True
        radius = 40  # > grid diagonal -> fully exact
        sq = np.asarray(squared_edt_3d(occ, radius))
        voxels = np.stack(np.meshgrid(*[np.arange(s) for s in occ.shape], indexing="ij"), -1)
        expected = brute_force_sq_dist(voxels.reshape(-1, 3), pts).reshape(occ.shape)
        np.testing.assert_array_equal(sq, expected)

    def test_clamp_is_exact_within_radius(self, rng):
        occ = np.zeros((32, 32, 32), bool)
        occ[0, 0, 0] = True
        sq = np.asarray(squared_edt_3d(occ, radius=10))
        # within radius: exact; beyond: saturated at radius^2+1
        assert sq[0, 0, 5] == 25
        assert sq[6, 8, 0] == 100
        assert sq[31, 31, 31] == 101


class TestGridBuilder:
    def test_block_grids_match_kdtree_semantics(self, rng):
        """gt = (dist == 0); dist = euclidean distance to nearest cloud point
        (util_get_grids.py:40-45), verified against brute force."""
        pts = _synthetic_cloud(rng, 400, depth=6)  # 64-cube, blocks of 16
        origins, gt, dist = build_artifacts(pts, depth=6, level=2)
        n, b = len(origins), 16
        assert gt.shape == (n, b, b, b) and dist.shape == (n, b, b, b)

        # occupancy parity
        pset = {tuple(p) for p in pts}
        for i in [0, n // 2, n - 1]:
            o = origins[i]
            occ_idx = np.argwhere(gt[i] > 0)
            for v in occ_idx[:20]:
                assert tuple(o + v) in pset
        np.testing.assert_array_equal(gt > 0, dist == 0)

        # exact distances: compare a few blocks against brute force over all pts
        for i in [0, n - 1]:
            o = origins[i]
            vox = np.stack(np.meshgrid(*[np.arange(b)] * 3, indexing="ij"), -1).reshape(-1, 3) + o
            expected = np.sqrt(brute_force_sq_dist(vox, pts)).astype(np.float32)
            np.testing.assert_array_equal(dist[i].reshape(-1), expected)

    def test_total_points_invariant(self, rng):
        pts = _synthetic_cloud(rng, 300, depth=6)
        _, gt, _ = build_artifacts(pts, depth=6, level=2)
        # every point lands in exactly one block voxel (NVFPCC.py:319 invariant)
        assert int(gt.sum()) == len(pts)
