"""Native C++ octree partitioner vs the numpy reference semantics
(SURVEY §4 gate 2: golden equivalence on synthetic clouds)."""

import numpy as np
import pytest

from nvfpcc_tpu.octree import native
from nvfpcc_tpu.octree.partition import (
    leaf_origins,
    morton_key_zyx,
    subtree_occupancy_string,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native octree lib unavailable"
)


def _numpy_origins(pts, depth, level):
    return leaf_origins(pts, depth, level, use_native=False)


@pytest.mark.parametrize("seed,depth,level", [(0, 7, 2), (1, 8, 3), (2, 10, 5)])
def test_origins_match_numpy(seed, depth, level):
    rng = np.random.default_rng(seed)
    size = 1 << depth
    pts = np.unique(rng.integers(0, size, (5000, 3)), axis=0)
    got = native.leaf_origins(pts, depth, level)
    want = _numpy_origins(pts, depth, level)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("seed,depth,level", [(0, 6, 2), (3, 7, 3)])
def test_occupancy_match_numpy(seed, depth, level):
    rng = np.random.default_rng(seed)
    size = 1 << depth
    pts = np.unique(rng.integers(0, size, (800, 3)), axis=0)
    got = native.subtree_occupancy_string(pts, depth, level)
    want = subtree_occupancy_string(pts, depth, level)
    assert got == want


def test_origins_are_morton_sorted():
    rng = np.random.default_rng(7)
    pts = np.unique(rng.integers(0, 1024, (20000, 3)), axis=0)
    origins = native.leaf_origins(pts, 10, 5)
    keys = morton_key_zyx(origins >> 5, 5)
    assert (np.diff(keys.astype(np.int64)) > 0).all()


def test_dispatch_threshold():
    """leaf_origins auto-routes big clouds through the native path and still
    matches numpy."""
    rng = np.random.default_rng(11)
    pts = np.unique(rng.integers(0, 1024, (60000, 3)), axis=0)
    assert np.array_equal(
        leaf_origins(pts, 10, 5), leaf_origins(pts, 10, 5, use_native=False)
    )


def test_single_point():
    pts = np.array([[37, 5, 900]])
    got = native.leaf_origins(pts, 10, 5)
    assert np.array_equal(got, (pts >> 5) << 5)
