"""Block-data-parallel sharding over a TPU device mesh.

The reference is single-process single-GPU (SURVEY §2.4); the TPU-native
scaling axis is the octree's leaf-block dimension: all N blocks are
independent given the shared decoder, so

- per-block arrays (embeddings, gt/dist grids, their Adam moments) shard
  along axis 0 of a 1-D ``blocks`` mesh,
- the shared decoder params (and their optimizer state) replicate,
- under ``jit`` XLA/GSPMD inserts the psum for the decoder grads and the
  gathers for batched indexing — no hand-written collectives.

NamedSharding needs the block axis divisible by the mesh, so callers pad the
leaf set up to a multiple (:func:`pad_blocks`) and mask the padding rows in
the loss (``nvfpcc_tpu.train.losses`` block masks).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BLOCK_AXIS = "blocks"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis ``blocks``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BLOCK_AXIS,))


def padded_block_count(n_blocks: int, mesh: Mesh) -> int:
    d = mesh.devices.size
    return -(-n_blocks // d) * d


def pad_blocks(arr: np.ndarray, n_padded: int) -> np.ndarray:
    """Zero-pad axis 0 up to ``n_padded`` rows (host)."""
    n = arr.shape[0]
    if n == n_padded:
        return arr
    pad = np.zeros((n_padded - n,) + arr.shape[1:], arr.dtype)
    return np.concatenate([arr, pad])


def block_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BLOCK_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(mesh: Mesh, tree):
    """Replicate every leaf of a pytree across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_block_tree(mesh: Mesh, tree, n_padded: int):
    """Shard leaves whose axis 0 is the (padded) block axis; replicate the
    rest (e.g. Adam's scalar step count)."""
    bs = block_sharding(mesh)
    rs = replicated_sharding(mesh)

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_padded:
            return jax.device_put(x, bs)
        return jax.device_put(x, rs)

    return jax.tree_util.tree_map(place, tree)


def shard_train_arrays(
    mesh: Mesh, params, opt_state, emb, emb_opt_state, gt, dist
) -> Tuple:
    """Lay out the training state for block-DP (see module docstring).

    ``emb``/``gt``/``dist`` (and the matching emb-Adam moments) must already
    be padded to a multiple of the mesh size (:func:`pad_blocks`).
    """
    n_padded = int(emb.shape[0])
    if n_padded % mesh.devices.size != 0:
        raise ValueError(
            f"block axis {n_padded} not divisible by mesh size {mesh.devices.size}; "
            "pad with pad_blocks first"
        )
    bs = block_sharding(mesh)
    return (
        replicate(mesh, params),
        replicate(mesh, opt_state),
        jax.device_put(emb, bs),
        shard_block_tree(mesh, emb_opt_state, n_padded),
        jax.device_put(gt, bs),
        jax.device_put(dist, bs),
    )
