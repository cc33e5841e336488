"""Training-time latent-range guard: the rounded-latent max magnitude is
tracked as a metric so alphabet-edge drift (coder clamps at +-512) surfaces
during training instead of first at encode time (round-2 review item)."""

import numpy as np

from nvfpcc_tpu.config import TrainConfig
from nvfpcc_tpu.models import decoder as M
from nvfpcc_tpu.train import loop as T


def test_lat_amax_metric_matches_latent_gen():
    spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4))
    params = M.init_params(spec)
    rng = np.random.default_rng(0)
    n = 5
    emb = rng.normal(0, 30, (n, 2, 2, 2, 2)).astype(np.float32)
    gt = (rng.uniform(0, 1, (n, 32, 32, 32, 1)) < 0.02).astype(np.float32)
    dist = rng.uniform(0, 5, gt.shape).astype(np.float32) * (1 - gt)
    cfg = TrainConfig()
    _, metrics = T.rd_loss(
        spec, cfg, params, emb, gt, dist, None, float(gt.sum()), "eval", 2, None
    )
    lat = np.asarray(M.latent_gen_apply(spec, params, emb))
    expect = float(np.abs(np.rint(lat)).max())
    assert np.isclose(float(metrics["lat_amax"]), expect)

    s = T.summarize_metrics({k: np.asarray(v) for k, v in metrics.items()})
    assert np.isclose(s["lat_amax"], expect)


def test_block_mask_excludes_padding_rows():
    spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4))
    params = M.init_params(spec)
    rng = np.random.default_rng(1)
    n = 4
    emb = rng.normal(0, 1, (n, 2, 2, 2, 2)).astype(np.float32)
    emb[-1] = 1e4  # huge latent on a PADDING row must not trip the guard
    gt = (rng.uniform(0, 1, (n, 32, 32, 32, 1)) < 0.02).astype(np.float32)
    dist = rng.uniform(0, 5, gt.shape).astype(np.float32) * (1 - gt)
    mask = np.asarray([1, 1, 1, 0], np.float32)
    cfg = TrainConfig()
    _, metrics = T.rd_loss(
        spec, cfg, params, emb, gt, dist, mask, float(gt.sum()), "eval", 2, None
    )
    assert float(metrics["lat_amax"]) < 1e3
