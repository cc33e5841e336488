"""Deterministic named seed streams for decoder-regenerable inits.

The reference ships out-of-band seed files (``SEED3.npy``/``SEED4_Gaussian.npy``,
``utils/network.py:20-22``) so that encoder and decoder regenerate identical
Kaiming init tensors without transmitting them. We replace the side files with
a counter-based PRNG derived from a fixed string: any process that builds the
model regenerates bit-identical init values with no out-of-band data.
"""

from __future__ import annotations

import hashlib

import jax
import numpy as np

DEFAULT_TAG = "nvfpcc-tpu/seed-stream/v1"


def base_key(tag: str = DEFAULT_TAG) -> jax.Array:
    """A PRNG key deterministically derived from a string tag."""
    digest = hashlib.blake2b(tag.encode("utf-8"), digest_size=8).digest()
    seed = int.from_bytes(digest[:8], "little") % (2**63)
    return jax.random.PRNGKey(seed)


def layer_key(key: jax.Array, index: int) -> jax.Array:
    """Per-layer subkey, stable under model growth (fold by layer index)."""
    return jax.random.fold_in(key, index)


def kaiming_uniform(key: jax.Array, shape, fan_in: int, gain: float = float(np.sqrt(2.0))):
    """Kaiming-uniform init: U(-b, b) with b = sqrt(3)*gain/sqrt(fan_in).

    Same scheme the reference derives from its seed files
    (``get_kaiming_init_from_seed``, ``utils/network.py:392-400``).
    """
    bound = np.sqrt(3.0) * gain / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, np.float32, -bound, bound)


def uniform_bias(key: jax.Array, shape, fan_in: int):
    """Bias init U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (reference ``utils/network.py:594-599``)."""
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, np.float32, -bound, bound)
