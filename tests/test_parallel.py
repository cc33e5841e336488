"""Block-DP sharding tests on the 8-device virtual CPU mesh
(SURVEY §4 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvfpcc_tpu.config import ModelConfig, TrainConfig
from nvfpcc_tpu.parallel import mesh as pm


@pytest.fixture(scope="module")
def toy_grids():
    rng = np.random.default_rng(0)
    n = 11  # deliberately not divisible by 8
    gt = (rng.uniform(0, 1, (n, 32, 32, 32)) < 0.02).astype(np.uint8)
    dist = rng.uniform(0, 5, (n, 32, 32, 32)).astype(np.float32) * (1 - gt)
    return gt, dist


def test_mesh_shapes():
    mesh = pm.make_mesh()
    assert mesh.devices.size == 8
    assert pm.padded_block_count(11, mesh) == 16
    assert pm.padded_block_count(16, mesh) == 16


def test_pad_blocks():
    x = np.ones((11, 2, 2, 2, 3), np.float32)
    p = pm.pad_blocks(x, 16)
    assert p.shape[0] == 16
    assert np.array_equal(p[:11], x)
    assert (p[11:] == 0).all()


def test_shard_layout():
    mesh = pm.make_mesh()
    emb = jnp.ones((16, 2, 2, 2, 3))
    out = jax.device_put(emb, pm.block_sharding(mesh))
    assert len(out.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(2, 2, 2, 2, 3)}


def test_train_on_mesh(toy_grids):
    """Two epochs of the full training loop under block-DP; finite metrics,
    and the returned embedding is un-padded."""
    from nvfpcc_tpu.train.loop import train

    gt, dist = toy_grids
    mesh = pm.make_mesh()
    lines = []
    spec, state = train(
        gt,
        dist,
        ModelConfig(ch=2, chanstr="4,8,4,4"),
        TrainConfig(epochs=2, phase_change=1, batch_size=4, eval_every=100),
        log=lines.append,
        mesh=mesh,
    )
    assert state.emb.shape[0] == gt.shape[0]  # padding stripped
    assert sum("TRAIN" in l for l in lines) == 2
    assert "nan" not in lines[-1].lower()
    # params stay replicated
    kernel = state.params["decoder"]["up0"]["kernel"]
    assert bool(jnp.isfinite(kernel).all())


def test_mesh_matches_single_device(toy_grids):
    """Block-DP must compute the same training trajectory as single-device
    (same scan order, padding fully masked)."""
    from nvfpcc_tpu.train.loop import train

    gt, dist = toy_grids
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4")
    # pinned f32: trajectory equality across program layouts is an f32
    # contract (bf16 refuses across GSPMD partitioning at bf16-ulp scale)
    tcfg = TrainConfig(
        epochs=2, phase_change=1, batch_size=4, eval_every=100,
        compute_dtype="f32",
    )
    _, s_single = train(gt, dist, mcfg, tcfg, log=lambda *_: None)
    _, s_mesh = train(gt, dist, mcfg, tcfg, log=lambda *_: None, mesh=pm.make_mesh())
    k1 = np.asarray(s_single.params["decoder"]["up0"]["kernel"])
    k2 = np.asarray(s_mesh.params["decoder"]["up0"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=2e-4, atol=2e-6)
    e1, e2 = np.asarray(s_single.emb), np.asarray(s_mesh.emb)
    np.testing.assert_allclose(e1, e2, rtol=2e-4, atol=2e-6)
