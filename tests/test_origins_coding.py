"""Octree-coded origins payload: lossless round-trip + size advantage."""

import numpy as np
import pytest

from nvfpcc_tpu.codec.codec import decode_origins, encode_origins
from nvfpcc_tpu.octree.partition import (
    leaf_origins,
    occupancy_to_origins,
    subtree_occupancy_string,
)


@pytest.mark.parametrize("seed,depth,level", [(0, 7, 2), (1, 8, 3), (2, 10, 5)])
def test_roundtrip(seed, depth, level):
    rng = np.random.default_rng(seed)
    pts = np.unique(rng.integers(0, 1 << depth, (4000, 3)), axis=0)
    origins = leaf_origins(pts, depth, level)
    payload = encode_origins(origins, depth, level)
    out = decode_origins(payload, depth, level)
    assert np.array_equal(out, origins)


def test_reference_form_roundtrip():
    """The untrimmed (reference get_octree.cpp) string also decodes."""
    rng = np.random.default_rng(5)
    pts = np.unique(rng.integers(0, 128, (500, 3)), axis=0)
    origins = leaf_origins(pts, 7, 2)
    s = subtree_occupancy_string(pts, 7, 2)
    out = occupancy_to_origins(s, 7, 2, with_leaf_children=True)
    assert np.array_equal(out, origins)


def test_size_beats_raw_int16():
    rng = np.random.default_rng(9)
    pts = np.unique(rng.integers(0, 1024, (30000, 3)), axis=0)
    origins = leaf_origins(pts, 10, 5)
    payload = encode_origins(origins, 10, 5)
    raw_bits = origins.size * 16
    assert payload["n_bits"] < raw_bits / 3  # comfortably smaller


def test_v1_raw_payload_accepted():
    origins = np.array([[0, 32, 64]], np.int16)
    out = decode_origins(origins, 10, 5)
    assert np.array_equal(out, origins.astype(np.int64))
