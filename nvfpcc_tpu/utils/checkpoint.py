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


def save_checkpoint(directory: str, epoch: int, params, emb, meta=None) -> str:
    """``meta`` (JSON-able dict, e.g. the model config) rides in the file so
    downstream tools (``encode --entropy_mode auto``) can rebuild the right
    model without the user restating flags."""
    import json

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{epoch:04d}.npz")
    extra = {}
    if meta is not None:
        extra["__meta__"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), np.uint8
        )
    np.savez(path, **tree_to_flat(params), __emb__=np.asarray(emb), **extra)
    return path


def load_checkpoint(path: str):
    """Returns (params pytree, emb array)."""
    params, emb, _ = load_checkpoint_meta(path)
    return params, emb


def load_checkpoint_meta(path: str):
    """Returns (params pytree, emb array, meta dict or None)."""
    import json

    data = dict(np.load(path))
    emb = data.pop("__emb__", None)
    meta = data.pop("__meta__", None)
    if meta is not None:
        meta = json.loads(meta.tobytes().decode("utf-8"))
    return flat_to_tree(data), emb, meta


def latest_checkpoint(directory: str):
    if not os.path.isdir(directory):
        return None
    files = [f for f in os.listdir(directory) if re.fullmatch(r"\d{4}\.npz", f)]
    if not files:
        return None
    return os.path.join(directory, max(files))


# ---------------------------------------------------------------------------
# full train-state checkpointing (params + both optimizer states + epoch).
# The reference saves only state_dict + raw embeddings and cannot resume
# mid-run with optimizer momenta (SURVEY §5 "no optimizer state, no mid-epoch
# resume"); this is the aux-subsystem upgrade. Arbitrary pytrees (optax
# namedtuple states) round-trip via a pickled treedef + an .npz of leaves.
# ---------------------------------------------------------------------------


def save_pytree(path: str, tree) -> None:
    import pickle

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(pickle.dumps(treedef), np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree(path: str):
    import pickle

    data = np.load(path, allow_pickle=False)
    treedef = pickle.loads(data["__treedef__"].tobytes())
    leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_train_state(directory: str, epoch: int, state) -> str:
    """Full resumable snapshot (TrainState-shaped object)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"state_{epoch:04d}.npz")
    save_pytree(
        path,
        {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "emb": np.asarray(state.emb),
            "emb_opt_state": jax.device_get(state.emb_opt_state),
            "epoch": np.int64(state.epoch),
        },
    )
    return path


def load_train_state(path: str) -> dict:
    """Returns the dict saved by save_train_state."""
    tree = load_pytree(path)
    tree["epoch"] = int(tree["epoch"])
    return tree


def latest_train_state(directory: str):
    if not os.path.isdir(directory):
        return None
    files = [
        f for f in os.listdir(directory) if re.fullmatch(r"state_\d{4}\.npz", f)
    ]
    if not files:
        return None
    return os.path.join(directory, max(files))
