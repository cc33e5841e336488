"""Pallas EDT kernel: interpret-mode equality with the XLA implementation
(compiled-TPU equality is asserted by the grids validation guardrail and
was verified against brute force on hardware; see RESULTS.md)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nvfpcc_tpu.grids.builder import validate_dist_grids  # noqa: E402
from nvfpcc_tpu.grids.edt import squared_edt_3d, use_pallas_edt  # noqa: E402
from nvfpcc_tpu.ops.pallas.edt_pallas import squared_edt_3d_pallas  # noqa: E402


@pytest.mark.parametrize(
    "shape,radius,seed",
    [((16, 16, 16), 5, 0), ((24, 32, 40), 9, 1), ((8, 8, 256), 20, 2), ((64, 64, 64), 55, 3)],
)
def test_pallas_matches_xla_interpret(shape, radius, seed):
    rng = np.random.default_rng(seed)
    occ = rng.uniform(0, 1, shape) < 0.01
    a = np.asarray(squared_edt_3d(jnp.asarray(occ), radius))
    b = np.asarray(squared_edt_3d_pallas(jnp.asarray(occ), radius, interpret=True))
    assert np.array_equal(a, b)


def test_dispatch_is_cpu_safe():
    assert use_pallas_edt("cpu") is False
    assert use_pallas_edt("tpu") is True
    # ambient backend in tests is cpu
    assert use_pallas_edt(None) is False


def test_non_multiple_of_8_rejected():
    occ = jnp.zeros((10, 16, 16), bool)
    with pytest.raises(ValueError):
        squared_edt_3d_pallas(occ, 3, interpret=True)


def test_validation_guardrail_catches_corruption():
    rng = np.random.default_rng(0)
    pts = np.unique(rng.integers(0, 64, (300, 3)), axis=0)
    from nvfpcc_tpu.grids.builder import build_block_grids
    from nvfpcc_tpu.octree.partition import leaf_origins

    origins = leaf_origins(pts, 6, 1)
    gt, dist = build_block_grids(pts, origins, 32)
    validate_dist_grids(pts, origins, dist, 32)  # clean: passes
    bad = dist * 0.5  # phantom-close everywhere (the observed failure mode)
    with pytest.raises(RuntimeError, match="validation failed"):
        validate_dist_grids(pts, origins, bad, 32)
