"""End-to-end codec tests: weight pack roundtrip, encode/decode parity
(SURVEY §4 item 4: train briefly, then rc_enc == rc_dec bit-exactly)."""

import numpy as np
import pytest

from nvfpcc_tpu import codec
from nvfpcc_tpu.codec import weights as W
from nvfpcc_tpu.config import CodecConfig, ModelConfig, TrainConfig
from nvfpcc_tpu.models import decoder as M


def toy_cloud(n=1500, size=128, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack(
        [
            size / 2 + size * 0.3 * np.cos(t),
            size / 2 + size * 0.3 * np.sin(t),
            size / 2 + size * 0.15 * np.sin(2 * t),
        ],
        axis=-1,
    )
    return np.unique(np.clip(np.rint(pts), 0, size - 1).astype(np.int64), axis=0)


@pytest.fixture(scope="module")
def trained():
    """A briefly trained model on a toy cloud (depth 7, level 2 -> 32^3 blocks)."""
    from nvfpcc_tpu.grids.builder import build_artifacts
    from nvfpcc_tpu.train.loop import train

    pts = toy_cloud()
    origins, gt, dist = build_artifacts(pts, depth=7, level=2)
    mcfg = ModelConfig(ch=2, chanstr="4,8,4,4")
    tcfg = TrainConfig(epochs=6, phase_change=3, batch_size=4, eval_every=100)
    spec, state = train(gt, dist, mcfg, tcfg, log=lambda *_: None)
    return {
        "spec": spec,
        "state": state,
        "origins": origins,
        "gt": gt,
        "mcfg": mcfg,
        "n_points": int(gt.sum()),
    }


class TestWeightPack:
    def test_quantize_and_roundtrip(self, trained):
        params = trained["state"].params
        qparams = W.quantize_residuals(params, qp=16)
        assert W.check_quantized(qparams, 16)
        pack = W.pack_weights(qparams, qp=16)
        rebuilt = W.unpack_weights(pack)
        for name in M.TRANSMITTED_KERNELS:
            got = np.asarray(rebuilt["decoder"][name]["kernel"])
            want = np.asarray(qparams["decoder"][name]["kernel"])
            assert np.array_equal(got, want), name
            got_b = np.asarray(rebuilt["decoder"][name]["b"])
            want_b = np.asarray(qparams["decoder"][name]["b"])
            assert np.array_equal(got_b, want_b), name
        for k in ("beta", "gamma"):
            assert np.array_equal(
                np.asarray(rebuilt["decoder"]["igdn"][k]),
                np.asarray(qparams["decoder"]["igdn"][k]),
            )

    def test_unquantized_rejected(self, trained):
        params = trained["state"].params
        if W.check_quantized(params, 16):
            pytest.skip("residuals happen to be on-grid")
        with pytest.raises(ValueError):
            W.pack_weights(params, qp=16)


class TestCodecRoundtrip:
    def test_enc_dec_parity(self, trained, tmp_path):
        """The product's fidelity gate (reference README.md:63)."""
        ccfg = CodecConfig(depth=7, level=2)
        result = codec.encode(
            trained["state"].params,
            np.asarray(trained["state"].emb),
            trained["origins"],
            trained["mcfg"],
            ccfg,
            trained["n_points"],
        )
        pack_fn = str(tmp_path / "pack.pk")
        codec.save_pack(pack_fn, result.pack)
        pack = codec.load_pack(pack_fn)
        dec_points, info = codec.decode(pack)
        assert result.points.shape == dec_points.shape
        assert np.array_equal(result.points, dec_points)
        assert info["n_blocks"] == len(trained["origins"])

    def test_bpp_accounting(self, trained, tmp_path):
        ccfg = CodecConfig(depth=7, level=2)
        result = codec.encode(
            trained["state"].params,
            np.asarray(trained["state"].emb),
            trained["origins"],
            trained["mcfg"],
            ccfg,
            trained["n_points"],
        )
        s = result.stats
        assert s["bpp"] > 0
        assert abs(
            s["bpp"] - (s["b_net"] + s["b_latent"] + s["b_origins"])
        ) < 1e-9
        # the pickle container should not dwarf the accounted payload
        pack_fn = str(tmp_path / "pack.pk")
        size = codec.save_pack(pack_fn, result.pack)
        assert size * 8 < 3 * s["bpp"] * s["n_points_src"] + 64_000

    def test_decode_minimal_params(self, trained):
        """reconstruct() must run with only the transmitted pytree."""
        qparams = W.quantize_residuals(trained["state"].params, 16)
        pack = W.pack_weights(qparams, 16)
        rebuilt = W.unpack_weights(pack)
        spec = trained["spec"]
        latents = np.zeros((4,) + spec.latent_shape, np.float32)
        occ = codec.reconstruct_all(spec, rebuilt, latents)
        assert occ.shape == (4, 32, 32, 32)
        assert np.isfinite(occ).all()

    def test_extract_points_order_deterministic(self):
        rng = np.random.default_rng(0)
        occ = rng.uniform(0, 1, (3, 8, 8, 8)).astype(np.float32)
        origins = np.array([[0, 0, 0], [32, 0, 0], [0, 32, 0]], np.int64)
        p1 = codec.extract_points(occ, origins, 0.5)
        p2 = codec.extract_points(occ.copy(), origins.copy(), 0.5)
        assert np.array_equal(p1, p2)
        # block-major ordering
        assert (np.diff(np.searchsorted(p1[:, 1], [0])) >= 0).all()


class TestDevicePointExtraction:
    def test_reconstruct_points_matches_host_path(self, trained):
        """Device-side compaction must reproduce the fetch+argwhere path
        exactly (same values, same order)."""
        import jax.numpy as jnp

        spec = trained["spec"]
        state = trained["state"]
        qparams = W.quantize_residuals(state.params, 16)
        pack = W.pack_weights(qparams, 16)
        rebuilt = W.unpack_weights(pack)
        rng = np.random.default_rng(0)
        latents = np.rint(rng.normal(0, 2, (len(trained["origins"]),) + spec.latent_shape)).astype(np.float32)
        for thh in (0.3, 0.5, 0.9):
            occ = codec.reconstruct_all(spec, rebuilt, latents)
            want = codec.extract_points(occ, trained["origins"], thh)
            got = codec.reconstruct_points(spec, rebuilt, latents, trained["origins"], thh)
            assert got.shape == want.shape
            assert np.array_equal(got, want), f"thh={thh}"

    def test_empty_latents(self, trained):
        spec = trained["spec"]
        qparams = W.quantize_residuals(trained["state"].params, 16)
        rebuilt = W.unpack_weights(W.pack_weights(qparams, 16))
        out = codec.reconstruct_points(
            spec, rebuilt, np.zeros((0,) + spec.latent_shape, np.float32),
            np.zeros((0, 3), np.int64), 0.5,
        )
        assert out.shape == (0, 3)


class TestWeightEntropyCodecs:
    def test_range_mode_roundtrip_and_smaller(self, trained):
        qparams = W.quantize_residuals(trained["state"].params, 16)
        p_range = W.pack_weights(qparams, 16, entropy="range")
        p_huff = W.pack_weights(qparams, 16, entropy="huffman")
        r1 = W.unpack_weights(p_range)
        r2 = W.unpack_weights(p_huff)
        for name in M.TRANSMITTED_KERNELS:
            assert np.array_equal(
                np.asarray(r1["decoder"][name]["kernel"]),
                np.asarray(r2["decoder"][name]["kernel"]),
            ), name
        bits_r, _ = W.weight_pack_bits(p_range)
        bits_h, _ = W.weight_pack_bits(p_huff)
        assert bits_r <= bits_h  # range coding beats (or ties) Huffman

    def test_unknown_mode_rejected(self, trained):
        qparams = W.quantize_residuals(trained["state"].params, 16)
        with pytest.raises(ValueError):
            W.pack_weights(qparams, 16, entropy="banana")
