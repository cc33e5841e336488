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


def test_layered_weight_mode_roundtrip_and_auto_picks_min():
    """entropy='range_pl' decodes losslessly through the real decode path,
    and the 'auto' default keeps whichever of {range_pl, range} packs
    smaller (on this tiny model the seven per-kernel tables outweigh the
    stream saving, so auto must fall back to the global histogram)."""
    import jax

    from nvfpcc_tpu.codec import weights as W

    rng = np.random.default_rng(7)
    spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4))
    params = M.init_params(spec)
    # per-layer scale spread so the per-kernel histograms actually differ
    params = jax.tree_util.tree_map(
        lambda a: a + 0.08 * np.asarray(rng.normal(0, 1, a.shape), a.dtype), params
    )
    q = W.quantize_residuals(params, 16)
    pk_pl = W.pack_weights(q, 16, entropy="range_pl")
    assert pk_pl["mode"] == "range_pl"
    assert len(pk_pl["counts_list"]) == len(pk_pl["kernel_keys"])
    rb = W.unpack_weights(pk_pl)
    for name in M.TRANSMITTED_KERNELS:
        assert np.array_equal(
            np.asarray(rb["decoder"][name]["kernel"]),
            np.asarray(q["decoder"][name]["kernel"]),
        )
    pk_auto = W.pack_weights(q, 16)  # default = auto
    coded = {
        m: W.weight_pack_bits(W.pack_weights(q, 16, entropy=m))[0]
        for m in ("range_pl", "range")
    }
    assert W.weight_pack_bits(pk_auto)[0] == min(coded.values())
    assert pk_auto["mode"] == min(coded, key=coded.get)


def test_layered_int_stream_property():
    """pack/unpack_int_stream_layered round-trips tensors with disjoint
    alphabets and preserves per-tensor offsets."""
    from nvfpcc_tpu.codec import weights as W

    rng = np.random.default_rng(11)
    tensors = [
        rng.integers(-3, 4, size=(2, 2, 2, 3, 4)),
        rng.integers(90, 131, size=(5, 7)),  # disjoint, offset alphabet
        np.full((3, 3), -77, np.int64),  # degenerate single-symbol
    ]
    pk = W.pack_int_stream_layered(tensors)
    flat = W.unpack_int_stream_layered(pk, [t.size for t in tensors])
    expect = np.concatenate([np.asarray(t, np.int64).reshape(-1) for t in tensors])
    assert np.array_equal(flat, expect)


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
