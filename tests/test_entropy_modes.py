"""Per-channel vs per-position latent entropy model (ModelConfig.entropy_mode)."""

import numpy as np
import pytest

from nvfpcc_tpu import codec
from nvfpcc_tpu.coder import range_coder as RC
from nvfpcc_tpu.config import CodecConfig, ModelConfig, TrainConfig
from nvfpcc_tpu.models import decoder as M


def test_spatio_param_shapes():
    spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4), entropy_mode="spatio")
    params = M.init_params(spec)
    assert params["entropy"]["sigma"].shape == (2, 2, 2, 2)
    # forward broadcasts fine
    emb = M.init_embeddings(3, 2)
    out, cls_list, net_bits, lat_bits = M.net_apply(spec, params, emb, "eval", 2)
    assert out.shape == (3, 32, 32, 32, 1)
    assert lat_bits.shape == (3,)


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        M.build_model_spec(entropy_mode="banana")


def test_spatio_latent_coding_roundtrip():
    rng = np.random.default_rng(0)
    ch = 3
    shape = (50, 2, 2, 2, ch)
    sigma = rng.uniform(0.2, 6.0, (2, 2, 2, ch)).astype(np.float32)
    mu = rng.uniform(-2, 2, (2, 2, 2, ch)).astype(np.float32)
    lat = np.rint(rng.normal(0, 4, shape)).astype(np.float32)
    pack = RC.encode_latents(lat, sigma, mu)
    out = RC.decode_latents(pack)
    assert np.array_equal(out, lat)


def test_bad_param_size_rejected():
    lat = np.zeros((2, 2, 2, 2, 3), np.float32)
    with pytest.raises(ValueError):
        RC.encode_latents(lat, np.ones(5, np.float32), np.zeros(5, np.float32))


def test_spatio_codec_end_to_end():
    """Brief train with spatio mode -> encode -> decode -> parity."""
    from nvfpcc_tpu.grids.builder import build_artifacts
    from nvfpcc_tpu.train.loop import train

    rng = np.random.default_rng(2)
    t = rng.uniform(0, 2 * np.pi, 800)
    pts = np.unique(
        np.clip(
            np.rint(
                np.stack([64 + 35 * np.cos(t), 64 + 35 * np.sin(t), np.full_like(t, 64)], -1)
            ), 0, 127,
        ).astype(np.int64), axis=0,
    )
    origins, gt, dist = build_artifacts(pts, depth=7, level=2)
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4", entropy_mode="spatio")
    tcfg = TrainConfig(epochs=4, phase_change=2, batch_size=4, eval_every=100)
    spec, state = train(gt, dist, mcfg, tcfg, log=lambda *_: None)
    assert spec.entropy_mode == "spatio"

    result = codec.encode(
        state.params, np.asarray(state.emb), origins, mcfg,
        CodecConfig(depth=7, level=2), int(gt.sum()),
    )
    assert result.pack["model"]["entropy_mode"] == "spatio"
    assert result.pack["latent_pack"]["sigma"].shape == (2, 2, 2, 2)
    dec_points, _ = codec.decode(result.pack)
    assert np.array_equal(result.points, dec_points)


@pytest.mark.parametrize("mode", ["gmm", "factorized"])
def test_model_entropy_codec_end_to_end(mode):
    """Brief train with the gmm / factorized latent model -> encode ->
    decode -> parity (reference capability: GMMLikelihoodModel /
    CDFModel+LikelihoodModel, utils/network.py:105-285)."""
    from nvfpcc_tpu.grids.builder import build_artifacts
    from nvfpcc_tpu.train.loop import train

    rng = np.random.default_rng(7)
    t = rng.uniform(0, 2 * np.pi, 700)
    pts = np.unique(
        np.clip(
            np.rint(
                np.stack([64 + 30 * np.cos(t), 64 + 30 * np.sin(t), 64 + 10 * np.cos(3 * t)], -1)
            ), 0, 127,
        ).astype(np.int64), axis=0,
    )
    origins, gt, dist = build_artifacts(pts, depth=7, level=2)
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4", entropy_mode=mode)
    tcfg = TrainConfig(epochs=4, phase_change=2, batch_size=4, eval_every=100)
    spec, state = train(gt, dist, mcfg, tcfg, log=lambda *_: None)

    result = codec.encode(
        state.params, np.asarray(state.emb), origins, mcfg,
        CodecConfig(depth=7, level=2), int(gt.sum()),
    )
    assert result.pack["latent_pack"]["mode"] == mode
    dec_points, _ = codec.decode(result.pack)
    assert np.array_equal(result.points, dec_points)


def test_gaussian_weight_mode_roundtrip():
    """entropy='gaussian' weight packing decodes losslessly and its table
    side-info is two floats (VERDICT round-1 item 5)."""
    import jax

    from nvfpcc_tpu.codec import weights as W

    rng = np.random.default_rng(3)
    spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4))
    params = M.init_params(spec)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.03 * np.asarray(rng.normal(0, 1, a.shape), a.dtype), params
    )
    q = W.quantize_residuals(params, 16)
    pk = W.pack_weights(q, 16, entropy="gaussian")
    rb = W.unpack_weights(pk)
    for name in M.TRANSMITTED_KERNELS:
        assert np.array_equal(
            np.asarray(rb["decoder"][name]["kernel"]),
            np.asarray(q["decoder"][name]["kernel"]),
        )


def test_unknown_weight_mode_rejected():
    """A pack with an unknown weight-entropy mode raises cleanly instead of
    KeyError (round-1 ADVICE item 1)."""
    from nvfpcc_tpu.codec import weights as W

    spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4))
    params = M.init_params(spec)
    q = W.quantize_residuals(params, 16)
    pk = W.pack_weights(q, 16)
    pk["mode"] = "zstd-super"
    with pytest.raises(ValueError, match="unsupported weight entropy mode"):
        W.unpack_weights(pk)
