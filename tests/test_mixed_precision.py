"""Mixed-precision training (TrainConfig.compute_dtype="bf16").

Contract: only the decoder-conv arithmetic runs in bf16; master params, STE
rounding, the latent entropy path, and the loss/rate math stay f32 — so the
parameter pytree keeps f32 dtypes, the forward output stays f32 and close to
the f32 forward, and the eval path (always f32) is untouched by the knob.
The knob is train-time only and never part of the pack format (encode/decode
precision is CodecConfig.recon_dtype).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvfpcc_tpu.config import ModelConfig, TrainConfig
from nvfpcc_tpu.models import decoder as M
from nvfpcc_tpu.ops import conv as qc
from nvfpcc_tpu.train import loop as T

N_BLOCKS = 6


def _toy(seed=0):
    rng = np.random.default_rng(seed)
    gt = (rng.uniform(0, 1, (N_BLOCKS, 32, 32, 32)) < 0.02).astype(np.uint8)
    dist = (rng.uniform(0, 6, gt.shape) * (1 - gt)).astype(np.float32)
    return gt, dist


def test_as_compute_dtype():
    assert qc.as_compute_dtype(None) is None
    assert qc.as_compute_dtype("f32") is None
    assert qc.as_compute_dtype("bf16") is jnp.bfloat16
    with pytest.raises(ValueError):
        qc.as_compute_dtype("fp8")


def test_forward_f32_vs_bf16_close():
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4")
    spec = M.build_model_spec(mcfg.ch, mcfg.channels, mcfg.seed_tag)
    params = M.init_params(spec)
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(0, 1, (N_BLOCKS, 2, 2, 2, mcfg.ch)), jnp.float32)

    out32, cls32, nb32, lb32 = M.net_apply(spec, params, emb, "eval", 2)
    out16, cls16, nb16, lb16 = M.net_apply(
        spec, params, emb, "eval", 2, compute_dtype="bf16"
    )
    # outputs come back f32 (pre-sigmoid logits are cast up)
    assert out16.dtype == jnp.float32
    assert all(c.dtype == jnp.float32 for c in cls16 if c is not None)
    # the occupancy probabilities track the f32 forward closely
    assert float(jnp.abs(out16 - out32).max()) < 0.05
    # rate terms are computed from f32 params, identical bitwise
    np.testing.assert_array_equal(np.asarray(nb16), np.asarray(nb32))
    np.testing.assert_array_equal(np.asarray(lb16), np.asarray(lb32))


def test_bf16_epoch_trains_and_keeps_f32_state():
    gt, dist = _toy()
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4")
    cfg = TrainConfig(batch_size=4, compute_dtype="bf16")
    spec = M.build_model_spec(mcfg.ch, mcfg.channels, mcfg.seed_tag)
    params = M.init_params(spec)
    emb = M.init_embeddings(N_BLOCKS, mcfg.ch)
    steps = -(-N_BLOCKS // cfg.batch_size)
    net_opt, emb_opt = T.make_optimizers(cfg, steps)
    opt_state, emb_opt_state = net_opt.init(params), emb_opt.init(emb)
    gt_d, dist_d = T._prep_dense(gt, dist)
    idx, mask = T.batch_plan(N_BLOCKS, cfg.batch_size, cfg.shuffle, cfg.seed, 0)
    block_valid = jnp.ones((N_BLOCKS,), jnp.float32)

    epoch_fn = T.make_epoch_fn(spec, cfg, net_opt, emb_opt, float(gt.sum()), q=2)
    p1, _, emb1, _, metrics = epoch_fn(
        params, opt_state, jnp.copy(emb), emb_opt_state, gt_d, dist_d,
        jnp.asarray(idx), jnp.asarray(mask), block_valid,
        jax.random.PRNGKey(0), T.rd_weights(cfg),
    )
    loss = float(np.asarray(metrics["loss"]).sum())
    assert np.isfinite(loss)
    # master state stays f32 throughout
    for leaf in jax.tree_util.tree_leaves(p1):
        assert leaf.dtype == jnp.float32
    assert emb1.dtype == jnp.float32
    # and the bf16 gradients actually moved the decoder kernels + embeddings
    k0 = np.asarray(M.init_params(spec)["decoder"]["conv2"]["kernel"])
    assert not np.array_equal(np.asarray(p1["decoder"]["conv2"]["kernel"]), k0)
    assert not np.array_equal(np.asarray(emb1), np.ones_like(np.asarray(emb1)))
