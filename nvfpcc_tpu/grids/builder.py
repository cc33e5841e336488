"""Ground-truth grid builder: occupancy + distance grids per leaf block.

Capability rebuild of ``util_get_grids.py``: from a voxelized cloud and its
leaf-block origins, produce

- ``gt_grid``  (N, B, B, B) uint8 occupancy, and
- ``dist``     (N, B, B, B) float32 unsigned distance to the nearest cloud
  point (the loss weights / PSNR1 denominators).

The reference runs ~30M KD-tree queries on host (``util_get_grids.py:36-38``);
here the cloud is scattered into its bounding grid on device, an exact integer
squared EDT runs in three separable passes (``nvfpcc_tpu.grids.edt``), and the
per-block crops are gathered back. Distances match the KD-tree values exactly
(integer squared distances under float32 sqrt).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from nvfpcc_tpu.grids.edt import squared_edt_3d

_ALIGN = 8  # pad bbox dims to multiples of this to bound recompilation


def _block_radius(block: int) -> int:
    """Clamp radius: the largest possible in-block distance (block diagonal)."""
    return int(math.ceil(math.sqrt(3.0) * (block - 1))) + 1


def build_block_grids(
    points: np.ndarray,
    origins: np.ndarray,
    block: int = 32,
    radius: int | None = None,
):
    """Build (gt_grid uint8 (N,B,B,B), dist float32 (N,B,B,B)).

    ``points``: (P, 3) integer voxel coordinates. ``origins``: (N, 3) block
    origins (multiples of ``block``).
    """
    pts = np.asarray(points, dtype=np.int64)
    orgs = np.asarray(origins, dtype=np.int64)
    if radius is None:
        radius = _block_radius(block)

    # Bounding grid over all leaf blocks, padded by the clamp radius so the
    # window never reads out of bounds of real data, then aligned.
    lo = orgs.min(axis=0) - radius
    hi = orgs.max(axis=0) + block + radius
    dims = hi - lo
    dims = ((dims + _ALIGN - 1) // _ALIGN) * _ALIGN

    rel = pts - lo
    occ = jnp.zeros(tuple(int(d) for d in dims), jnp.bool_)
    occ = occ.at[tuple(jnp.asarray(rel.T))].set(True)

    sq = squared_edt_3d(occ, radius)

    # Gather per-block crops with a vmapped dynamic_slice.
    rel_origins = jnp.asarray(orgs - lo, jnp.int32)

    def crop(grid, o):
        return jax.lax.dynamic_slice(grid, (o[0], o[1], o[2]), (block, block, block))

    crop_all = jax.jit(jax.vmap(crop, in_axes=(None, 0)))
    sq_blocks = crop_all(sq, rel_origins)
    occ_blocks = crop_all(occ, rel_origins)

    dist = np.sqrt(np.asarray(sq_blocks, dtype=np.float32))
    gt = np.asarray(occ_blocks).astype(np.uint8)
    return gt, dist


def build_artifacts(points, depth: int = 10, level: int = 5):
    """Full preprocessing: origins + gt + dist (the reference's three .npy
    artifacts, ``util_get_grids.py:16-46``)."""
    from nvfpcc_tpu.octree.partition import leaf_origins

    block = 1 << (depth - level)
    origins = leaf_origins(points, depth, level)
    gt, dist = build_block_grids(points, origins, block)
    return origins, gt, dist
