"""Flat-file checkpointing of param pytrees (reference ``NVFPCC.py:284-291``
saves a state_dict + the raw embedding tensor every 10 epochs).

Stored as ``.npz`` with '/'-joined pytree paths — no framework lock-in, and
the quantizer/coder can address individual tensors by key the way the
reference addresses state_dict keys.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np


def tree_to_flat(params) -> dict:
    """Pytree -> {path: np.ndarray} with '/'-joined dict keys."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def flat_to_tree(flat: dict) -> dict:
    """{path: array} -> nested dict pytree."""
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_checkpoint(directory: str, epoch: int, params, emb) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{epoch:04d}.npz")
    np.savez(path, **tree_to_flat(params), __emb__=np.asarray(emb))
    return path


def load_checkpoint(path: str):
    """Returns (params pytree, emb array)."""
    data = dict(np.load(path))
    emb = data.pop("__emb__", None)
    return flat_to_tree(data), emb


def latest_checkpoint(directory: str):
    files = [f for f in os.listdir(directory) if re.fullmatch(r"\d{4}\.npz", f)]
    if not files:
        return None
    return os.path.join(directory, max(files))
