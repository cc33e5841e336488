"""Slab-tiled grid building must match the single-grid path exactly."""

import numpy as np
import pytest

from nvfpcc_tpu.grids.builder import build_block_grids
from nvfpcc_tpu.octree.partition import leaf_origins


def _cloud(seed, depth=7, n=3000):
    rng = np.random.default_rng(seed)
    size = 1 << depth
    t = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(0.1, 0.9, n) * size
    pts = np.stack(
        [size / 2 + size * 0.3 * np.cos(t), size / 2 + size * 0.3 * np.sin(t), z], -1
    )
    return np.unique(np.clip(np.rint(pts), 0, size - 1).astype(np.int64), axis=0)


@pytest.mark.parametrize("seed", [0, 1])
def test_tiled_matches_single(seed):
    pts = _cloud(seed)
    origins = leaf_origins(pts, 7, 2)
    gt1, d1 = build_block_grids(pts, origins, 32)
    # force tiling with a tiny budget (~one slab of blocks at a time)
    gt2, d2 = build_block_grids(pts, origins, 32, max_grid_bytes=200 * 1024 * 1024)
    assert np.array_equal(gt1, gt2)
    assert np.array_equal(d1, d2)


def test_tiled_forced_small_budget():
    """Even an absurdly small budget (one block-row slabs) stays exact."""
    pts = _cloud(2, n=800)
    origins = leaf_origins(pts, 7, 2)
    gt1, d1 = build_block_grids(pts, origins, 32)
    gt2, d2 = build_block_grids(pts, origins, 32, max_grid_bytes=60 * 1024 * 1024)
    assert np.array_equal(gt1, gt2)
    assert np.array_equal(d1, d2)
