"""Checkpoint/resume tests (SURVEY §5: the reference cannot resume with
optimizer state; this framework must)."""

import json

import numpy as np
import pytest

from nvfpcc_tpu.config import ModelConfig, TrainConfig
from nvfpcc_tpu.train.loop import TrainDivergence, train
from nvfpcc_tpu.utils import checkpoint as C


@pytest.fixture(scope="module")
def toy_grids():
    rng = np.random.default_rng(3)
    n = 6
    gt = (rng.uniform(0, 1, (n, 32, 32, 32)) < 0.02).astype(np.uint8)
    dist = rng.uniform(0, 5, gt.shape).astype(np.float32) * (1 - gt)
    return gt, dist


def test_pytree_roundtrip(tmp_path):
    import optax

    tree = {"a": np.arange(6).reshape(2, 3), "opt": optax.adam(1e-3).init(
        {"w": np.zeros((4,), np.float32)}
    )}
    p = str(tmp_path / "t.npz")
    C.save_pytree(p, tree)
    out = C.load_pytree(p)
    import jax

    leaves1, td1 = jax.tree_util.tree_flatten(tree)
    leaves2, td2 = jax.tree_util.tree_flatten(out)
    assert td1 == td2
    for a, b in zip(leaves1, leaves2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_trajectory(toy_grids, tmp_path):
    """train 4 epochs straight == train 2 + resume 2 (same snapshots,
    same final params)."""
    gt, dist = toy_grids
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4")

    ckpt_a = str(tmp_path / "a")
    # pinned f32: straight-vs-resumed equality is an f32 contract (resume
    # re-chunks the epoch programs; bf16 refusion drifts at bf16-ulp scale)
    cfg4 = TrainConfig(
        epochs=4, phase_change=2, batch_size=4, eval_every=1,
        compute_dtype="f32",
    )
    _, s_straight = train(gt, dist, mcfg, cfg4, checkpoint_dir=ckpt_a, log=lambda *_: None)

    ckpt_b = str(tmp_path / "b")
    cfg2 = TrainConfig(
        epochs=2, phase_change=2, batch_size=4, eval_every=1,
        compute_dtype="f32",
    )
    train(gt, dist, mcfg, cfg2, checkpoint_dir=ckpt_b, log=lambda *_: None)
    _, s_resumed = train(
        gt, dist, mcfg, cfg4, checkpoint_dir=ckpt_b, log=lambda *_: None, resume=True
    )

    k1 = np.asarray(s_straight.params["decoder"]["up0"]["kernel"])
    k2 = np.asarray(s_resumed.params["decoder"]["up0"]["kernel"])
    np.testing.assert_allclose(k1, k2, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_straight.emb), np.asarray(s_resumed.emb), rtol=1e-5, atol=1e-7
    )


def test_metrics_jsonl(toy_grids, tmp_path):
    gt, dist = toy_grids
    path = str(tmp_path / "m.jsonl")
    train(
        gt, dist, ModelConfig(ch=2, chanstr="4,8,4,4"),
        TrainConfig(epochs=2, phase_change=1, batch_size=4, eval_every=100),
        log=lambda *_: None, metrics_path=path,
    )
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert {"epoch", "q", "loss", "bpp", "psnr1"} <= set(lines[0])
    assert lines[0]["epoch"] == 0 and lines[1]["epoch"] == 1
