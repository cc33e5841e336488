"""Latent context model (entropy_mode="ctx", pack format v3).

Covers the capability of the reference's dormant masked-conv stack
(``/root/reference/utils/network.py:4312-4465``): causal masking, the
integer-exact host predictor, the 8-step incremental range coding, and the
end-to-end ``rc_enc == rc_dec`` parity gate with a trained ctx model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvfpcc_tpu import codec
from nvfpcc_tpu.coder import ctx_coder as CTX
from nvfpcc_tpu.codec import weights as W
from nvfpcc_tpu.config import CodecConfig, ModelConfig, TrainConfig
from nvfpcc_tpu.models import decoder as M
from nvfpcc_tpu.ops import conv as qc

RASTER = [(p >> 2 & 1, p >> 1 & 1, p & 1) for p in range(8)]


def ctx_spec(ch=3, mode="ctx"):
    return M.build_model_spec(ch=ch, channels=(4, 8, 4, 4), entropy_mode=mode)


def random_ctx_params(spec, seed=0, scale=8):
    """Params with non-trivial quantized ctx kernels + biases."""
    rng = np.random.default_rng(seed)
    params = M.init_params(spec)
    ep = dict(params["entropy"])
    for name in M.CTX_KERNELS:
        s = spec.specs[name]
        layer = dict(ep[name])
        layer["kernel"] = jnp.asarray(
            rng.integers(-scale, scale + 1, s.kernel_shape).astype(np.float32) / 16
        )
        layer["b"] = jnp.asarray(rng.normal(0, 0.2, (s.out_ch,)).astype(np.float32))
        ep[name] = layer
    params = dict(params)
    params["entropy"] = ep
    return params


class TestCausalMask:
    def test_mask_shape_and_count(self):
        m = qc.causal_mask(3)
        assert m.shape == (3, 3, 3, 1, 1)
        assert int(m.sum()) == 13  # strictly-before-center taps of a 3^3 kernel

    def test_pred_is_causal(self):
        """mu/sigma at raster position i must not depend on positions >= i."""
        spec = ctx_spec()
        params = random_ctx_params(spec)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 3, (4, 2, 2, 2, 3)).round(), jnp.float32)
        mu0, s0 = M.ctx_pred_apply(spec, params, x, q=2)
        for i, (z, y, w) in enumerate(RASTER):
            x2 = np.asarray(x).copy()
            for zz, yy, ww in RASTER[i:]:
                x2[:, zz, yy, ww, :] = 999.0
            mu2, s2 = M.ctx_pred_apply(spec, params, jnp.asarray(x2), q=2)
            assert np.allclose(mu0[:, z, y, w], mu2[:, z, y, w]), f"mu leaks at pos {i}"
            assert np.allclose(s0[:, z, y, w], s2[:, z, y, w]), f"sigma leaks at pos {i}"

    def test_position0_prediction_is_data_free(self):
        """The first raster position sees no context at all."""
        spec = ctx_spec()
        params = random_ctx_params(spec)
        a = jnp.zeros((2, 2, 2, 2, 3), jnp.float32)
        b = jnp.asarray(np.full((2, 2, 2, 2, 3), 55.0), jnp.float32)
        mu_a, _ = M.ctx_pred_apply(spec, params, a, q=2)
        mu_b, _ = M.ctx_pred_apply(spec, params, b, q=2)
        assert np.allclose(mu_a[:, 0, 0, 0], mu_b[:, 0, 0, 0])


class TestIntPredictor:
    def test_int_pred_matches_float_pred(self):
        """The fixed-point host predictor tracks the jax float predictor to
        within its quantization budget (init rounded to 1/256, mu to 1/16)."""
        spec = ctx_spec()
        params = random_ctx_params(spec, seed=2)
        qparams = W.quantize_residuals(params, 16)
        payload = CTX.build_ctx_payload(spec, qparams["entropy"])
        ints = CTX.ctx_ints_from_payload(spec, payload)
        rng = np.random.default_rng(3)
        lat = rng.integers(-30, 31, (16, 2, 2, 2, 3)).astype(np.int64)
        mu16, sidx = CTX.predict_int(lat, ints)
        mu_f, sig_f = M.ctx_pred_apply(
            spec, qparams, jnp.asarray(lat, jnp.float32), q=2
        )
        # mu: 1/16 grid + init-rounding drift (1/512 per tap, scaled by |x|
        # through two layers) -> relative tolerance against the float pred
        rel = np.abs(mu16 / 16.0 - np.asarray(mu_f)) / (1.0 + np.abs(np.asarray(mu_f)))
        assert np.max(rel) < 0.05
        # sigma: log-bucketed to 1/16 octave; compare in log2 space
        sig_i = CTX._SIGMA_VALS[sidx]
        mask = np.asarray(sig_f) > 0.05  # below the grid floor both clamp
        ratio = np.log2(sig_i[mask] / np.asarray(sig_f)[mask])
        assert np.max(np.abs(ratio)) < 0.25

    def test_teacher_forced_equals_incremental(self):
        """predict_int on the full latent equals predict_int on the causally
        truncated latent at every position (the decode-side evaluation)."""
        spec = ctx_spec()
        params = random_ctx_params(spec, seed=4)
        qparams = W.quantize_residuals(params, 16)
        ints = CTX.ctx_ints_from_payload(
            spec, CTX.build_ctx_payload(spec, qparams["entropy"])
        )
        rng = np.random.default_rng(5)
        lat = rng.integers(-20, 21, (8, 2, 2, 2, 3)).astype(np.int64)
        mu_full, s_full = CTX.predict_int(lat, ints)
        for i, (z, y, w) in enumerate(RASTER):
            trunc = lat.copy()
            for zz, yy, ww in RASTER[i:]:
                trunc[:, zz, yy, ww, :] = 0
            mu_t, s_t = CTX.predict_int(trunc, ints)
            assert np.array_equal(mu_full[:, z, y, w], mu_t[:, z, y, w]), i
            assert np.array_equal(s_full[:, z, y, w], s_t[:, z, y, w]), i


class TestChannelARMask:
    def test_channel_ar_is_causal_per_channel(self):
        """In ctx_ar mode, (mu, sigma) for channel c at position i must not
        depend on channels >= c at position i nor anything at positions > i."""
        spec = ctx_spec(mode="ctx_ar")
        params = random_ctx_params(spec)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 3, (4, 2, 2, 2, 3)).round(), jnp.float32)
        mu0, s0 = M.ctx_pred_apply(spec, params, x, q=2)
        for i, (z, y, w) in enumerate(RASTER):
            for c in range(3):
                x2 = np.asarray(x).copy()
                x2[:, z, y, w, c:] = 777.0  # garbage at (pos i, channels >= c)
                for zz, yy, ww in RASTER[i + 1 :]:
                    x2[:, zz, yy, ww, :] = 777.0
                mu2, s2 = M.ctx_pred_apply(spec, params, jnp.asarray(x2), q=2)
                assert np.allclose(mu0[:, z, y, w, c], mu2[:, z, y, w, c]), (i, c)
                assert np.allclose(s0[:, z, y, w, c], s2[:, z, y, w, c]), (i, c)

    def test_channel_ar_uses_center_context(self):
        """Unlike plain ctx, ctx_ar predictions for channel 2 DO react to
        channel 0 at the same position."""
        spec = ctx_spec(mode="ctx_ar")
        params = random_ctx_params(spec, seed=9)
        x = np.zeros((1, 2, 2, 2, 3), np.float32)
        x2 = x.copy()
        x2[:, 0, 0, 0, 0] = 10.0
        mu_a, _ = M.ctx_pred_apply(spec, params, jnp.asarray(x), q=2)
        mu_b, _ = M.ctx_pred_apply(spec, params, jnp.asarray(x2), q=2)
        assert not np.allclose(mu_a[:, 0, 0, 0, 2], mu_b[:, 0, 0, 0, 2])


class TestCtxCoder:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("mode", ["ctx", "ctx_ar"])
    def test_roundtrip_random(self, seed, mode):
        spec = ctx_spec(mode=mode)
        params = random_ctx_params(spec, seed=seed)
        qparams = W.quantize_residuals(params, 16)
        payload = CTX.build_ctx_payload(spec, qparams["entropy"])
        ints = CTX.ctx_ints_from_payload(spec, payload)
        rng = np.random.default_rng(seed + 10)
        lat = rng.integers(-50, 51, (40, 2, 2, 2, 3)).astype(np.int64)
        ar = mode == "ctx_ar"
        enc = CTX.encode_latents_ctx(lat, ints, channel_ar=ar)
        dec = CTX.decode_latents_ctx(enc["stream"], enc["shape"], ints, channel_ar=ar)
        assert np.array_equal(dec, enc["coded"])
        if enc["n_clamped"] == 0:
            assert np.array_equal(dec, lat)

    def test_clamp_lockstep(self):
        """Out-of-alphabet residuals clamp identically on both sides: the
        encoder's decoder-visible latents are exactly what decode returns."""
        spec = ctx_spec()
        params = random_ctx_params(spec, seed=6, scale=2)
        qparams = W.quantize_residuals(params, 16)
        ints = CTX.ctx_ints_from_payload(
            spec, CTX.build_ctx_payload(spec, qparams["entropy"])
        )
        lat = np.zeros((4, 2, 2, 2, 3), np.int64)
        lat[0, 0, 0, 0, 0] = 5000  # way outside any shifted alphabet
        enc = CTX.encode_latents_ctx(lat, ints)
        assert enc["n_clamped"] >= 1
        dec = CTX.decode_latents_ctx(enc["stream"], enc["shape"], ints)
        assert np.array_equal(dec, enc["coded"])

    def test_nondefault_qp_roundtrip(self):
        """ctx packs at qp != 16 work end-to-end: the residual grid travels in
        the payload and the fixed-point predictor scales by KSCALE/qp."""
        spec = ctx_spec()
        params = random_ctx_params(spec, seed=3)
        for qp in (8, 32):
            qparams = W.quantize_residuals(params, qp)
            payload = CTX.build_ctx_payload(spec, qparams["entropy"], qp)
            assert payload["qp"] == qp
            ints = CTX.ctx_ints_from_payload(spec, payload)
            lat = np.random.default_rng(qp).integers(
                -40, 41, (16, 2, 2, 2, 3)
            ).astype(np.int64)
            enc = CTX.encode_latents_ctx(lat, ints)
            dec = CTX.decode_latents_ctx(enc["stream"], enc["shape"], ints)
            assert np.array_equal(dec, enc["coded"])

    def test_qp_not_dividing_kscale_rejected(self):
        spec = ctx_spec()
        params = random_ctx_params(spec, seed=4)
        with pytest.raises(ValueError, match="qp dividing"):
            CTX.build_ctx_payload(spec, W.quantize_residuals(params, 5)["entropy"], 5)

    def test_payload_roundtrip_and_bits(self):
        spec = ctx_spec()
        params = random_ctx_params(spec, seed=7)
        qparams = W.quantize_residuals(params, 16)
        payload = CTX.build_ctx_payload(spec, qparams["entropy"])
        ints = CTX.ctx_ints_from_payload(spec, payload)
        for i, name in enumerate(M.CTX_KERNELS, start=1):
            s = spec.specs[name]
            # reconstructed integer kernel must be zero outside the mask
            full = np.broadcast_to(s.mask, s.kernel_shape) != 0
            assert np.all(ints[f"K{i}"][~full] == 0)
        assert CTX.ctx_payload_bits(payload) > 0


class TestDetachPred:
    def test_detach_cuts_latent_warp_gradient(self):
        """With ctx_detach_pred, the rate gradient w.r.t. the latent input
        loses the through-the-predictor path but keeps the direct path; the
        predictor's own params still receive gradients."""
        spec_w = ctx_spec()  # warp (reference semantics)
        spec_d = M.build_model_spec(
            ch=3, channels=(4, 8, 4, 4), entropy_mode="ctx", ctx_detach_pred=True
        )
        params = random_ctx_params(spec_w)
        x = jnp.asarray(
            np.random.default_rng(0).normal(0, 3, (4, 2, 2, 2, 3)), jnp.float32
        )

        def rate(spec):
            def f(xx, p):
                _, bits = M.entropy_apply(spec, p, xx, mode="eval", q=2)
                return bits.sum()

            return f

        gx_w = jax.grad(rate(spec_w), argnums=0)(x, params)
        gx_d = jax.grad(rate(spec_d), argnums=0)(x, params)
        assert not np.allclose(np.asarray(gx_w), np.asarray(gx_d))
        gp_d = jax.grad(rate(spec_d), argnums=1)(x, params)
        gk = np.asarray(gp_d["entropy"]["ctx1"]["kernel"])
        assert np.any(gk != 0)  # predictor still adapts

    def test_detach_does_not_change_coding(self):
        """ctx_detach_pred is training-only: eval-mode rounded latents and
        the predictor outputs are identical with and without it."""
        spec_w = ctx_spec()
        spec_d = M.build_model_spec(
            ch=3, channels=(4, 8, 4, 4), entropy_mode="ctx", ctx_detach_pred=True
        )
        params = random_ctx_params(spec_w, seed=4)
        x = jnp.asarray(
            np.random.default_rng(1).normal(0, 3, (4, 2, 2, 2, 3)), jnp.float32
        )
        rw, bw = M.entropy_apply(spec_w, params, x, mode="eval", q=2)
        rd, bd = M.entropy_apply(spec_d, params, x, mode="eval", q=2)
        assert np.array_equal(np.asarray(rw), np.asarray(rd))
        assert np.allclose(np.asarray(bw), np.asarray(bd))


class TestCtxTraining:
    def test_net_apply_shapes_and_grads(self):
        spec = ctx_spec()
        params = M.init_params(spec)
        emb = M.init_embeddings(6, 3)
        key = jax.random.PRNGKey(0)
        out, cls, net_bits, lat_bits = M.net_apply(spec, params, emb, "train", 1, key)
        assert net_bits.shape == (9,)  # 7 decoder kernels + 2 ctx kernels
        assert lat_bits.shape == (6,)

        def loss(p):
            _, _, nb, lb = M.net_apply(spec, p, emb, "train", 2, key)
            return nb.sum() + lb.sum()

        g = jax.grad(loss)(params)
        for name in M.CTX_KERNELS:
            gk = np.asarray(g["entropy"][name]["kernel"])
            assert np.isfinite(gk).all()
            # masked taps get rate gradient; masked-out taps get none
            s = spec.specs[name]
            full = np.broadcast_to(s.mask, s.kernel_shape) != 0
            assert np.any(gk[full] != 0)
            assert np.all(gk[~full] == 0)


class TestCtxCodecEndToEnd:
    @pytest.mark.parametrize("mode", ["ctx", "ctx_ar"])
    def test_parity_after_training(self, mode):
        from nvfpcc_tpu.grids.builder import build_artifacts
        from nvfpcc_tpu.train.loop import train
        from tests.test_codec import toy_cloud

        pts = toy_cloud(n=900, size=128, seed=3)
        origins, gt, dist = build_artifacts(pts, depth=7, level=2)
        mcfg = ModelConfig(ch=2, chanstr="4,8,4,4", entropy_mode=mode)
        tcfg = TrainConfig(epochs=4, phase_change=2, batch_size=4, eval_every=100)
        spec, state = train(gt, dist, mcfg, tcfg, log=lambda *_: None)
        ccfg = CodecConfig(depth=7, level=2)
        res = codec.encode(
            state.params, np.asarray(state.emb), origins, mcfg, ccfg, int(gt.sum())
        )
        assert res.pack["format_version"] == codec.PACK_FORMAT_VERSION
        assert res.pack["latent_pack"]["mode"] == mode
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "pack.pk")
            codec.save_pack(p, res.pack)
            pts2, info = codec.decode(codec.load_pack(p))
        assert np.array_equal(res.points, pts2)
        assert res.stats["bpp"] > 0

    def test_ctx_tail_pack_roundtrip(self):
        """A ctx_tail split must travel in the pack metadata and decode to
        the identical reconstruction (the tail masks change which ctx2 taps
        are transmitted, so a decoder that lost the split would desync)."""
        from nvfpcc_tpu.grids.builder import build_artifacts
        from nvfpcc_tpu.train.loop import train
        from tests.test_codec import toy_cloud

        pts = toy_cloud(n=900, size=128, seed=3)
        origins, gt, dist = build_artifacts(pts, depth=7, level=2)
        mcfg = ModelConfig(
            ch=2, chanstr="4,8,4,4", entropy_mode="ctx_ar",
            ctx_hidden=8, ctx_tail=4,
        )
        tcfg = TrainConfig(epochs=4, phase_change=2, batch_size=4, eval_every=100)
        spec, state = train(gt, dist, mcfg, tcfg, log=lambda *_: None)
        assert spec.ctx_tail == 4
        ccfg = CodecConfig(depth=7, level=2)
        res = codec.encode(
            state.params, np.asarray(state.emb), origins, mcfg, ccfg, int(gt.sum())
        )
        assert res.pack["model"]["ctx_tail"] == 4
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "pack.pk")
            codec.save_pack(p, res.pack)
            pts2, info = codec.decode(codec.load_pack(p))
        assert np.array_equal(res.points, pts2)
        # fewer transmitted ctx2 taps than the full-width spec
        full = M.build_model_spec(
            ch=2, channels=(4, 8, 4, 4), entropy_mode="ctx_ar", ctx_hidden=8
        )
        assert len(spec.specs["ctx2"].mask_flat_indices) < len(
            full.specs["ctx2"].mask_flat_indices
        )


class TestCtxTrainInit:
    def test_feature_init_swaps_predictor_start(self):
        """ctx_train_init="feature" must start training from the pass-through
        feature init; "zero" (default / reference behavior) from zero
        residuals (config.py ModelConfig.ctx_train_init)."""
        from nvfpcc_tpu.models import decoder as M
        from nvfpcc_tpu.train.loop import initial_params

        mcfg = ModelConfig(ch=2, chanstr="4,8,4,4", entropy_mode="ctx_ar")
        spec = M.build_model_spec(
            mcfg.ch, mcfg.channels, mcfg.seed_tag, mcfg.entropy_mode
        )
        p_zero = initial_params(spec, mcfg)
        assert float(np.abs(np.asarray(p_zero["entropy"]["ctx1"]["kernel"])).max()) == 0.0

        mcfg_fi = ModelConfig(
            ch=2, chanstr="4,8,4,4", entropy_mode="ctx_ar", ctx_train_init="feature"
        )
        p_fi = initial_params(spec, mcfg_fi)
        want = M.ctx_feature_init(spec)
        for n in ("ctx1", "ctx2"):
            assert np.array_equal(
                np.asarray(p_fi["entropy"][n]["kernel"]),
                np.asarray(want[n]["kernel"]),
            )
        # non-ctx subtrees are untouched
        assert np.array_equal(
            np.asarray(p_fi["decoder"]["up0"]["kernel"]),
            np.asarray(p_zero["decoder"]["up0"]["kernel"]),
        )

    def test_channel_mode_ignores_the_knob(self):
        from nvfpcc_tpu.models import decoder as M
        from nvfpcc_tpu.train.loop import initial_params

        mcfg = ModelConfig(ch=2, chanstr="4,8,4,4", ctx_train_init="feature")
        spec = M.build_model_spec(mcfg.ch, mcfg.channels, mcfg.seed_tag)
        p = initial_params(spec, mcfg)
        assert set(p["entropy"]) == {"sigma", "mu"}


class TestCtxTail:
    """ctx_tail: wide predictor whose tail hidden units keep only the
    channel-gated center ctx2 tap (payload-cheap width — see
    ModelSpec.ctx_tail)."""

    def _specs(self):
        full = M.build_model_spec(
            ch=3, channels=(4, 8, 4, 4), entropy_mode="ctx_ar", ctx_hidden=8
        )
        tail = M.build_model_spec(
            ch=3, channels=(4, 8, 4, 4), entropy_mode="ctx_ar",
            ctx_hidden=8, ctx_tail=4,
        )
        return full, tail

    def test_tail_masks_and_payload_shrink(self):
        full, tail = self._specs()
        s2f, s2t = full.specs["ctx2"], tail.specs["ctx2"]
        m2f = np.broadcast_to(s2f.mask, s2f.kernel_shape)
        m2t = np.broadcast_to(s2t.mask, s2t.kernel_shape)
        # tail input units: only the center tap survives, with the same
        # channel gating the full spec has there
        t = m2t[:, :, :, 4:, :].copy()
        assert np.array_equal(t[1, 1, 1], m2f[1, 1, 1, 4:, :])
        t[1, 1, 1] = 0
        assert t.sum() == 0
        # non-tail units and ctx1 are untouched
        assert np.array_equal(m2t[:, :, :, :4, :], m2f[:, :, :, :4, :])
        assert np.array_equal(
            np.asarray(tail.specs["ctx1"].mask), np.asarray(full.specs["ctx1"].mask)
        )
        # the transmitted tap count shrinks accordingly
        assert len(s2t.mask_flat_indices) < len(s2f.mask_flat_indices)

    def test_tail_roundtrip_and_causality(self):
        _, spec = self._specs()
        params = random_ctx_params(spec, seed=3)
        # per-channel causality still holds with tail units in play
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(0, 3, (4, 2, 2, 2, 3)).round(), jnp.float32)
        mu0, s0 = M.ctx_pred_apply(spec, params, x, q=2)
        for i, (z, y, w) in enumerate(RASTER):
            for c in range(3):
                x2 = np.asarray(x).copy()
                x2[:, z, y, w, c:] = 777.0
                for zz, yy, ww in RASTER[i + 1 :]:
                    x2[:, zz, yy, ww, :] = 777.0
                mu2, s2 = M.ctx_pred_apply(spec, params, jnp.asarray(x2), q=2)
                assert np.allclose(mu0[:, z, y, w, c], mu2[:, z, y, w, c]), (i, c)
                assert np.allclose(s0[:, z, y, w, c], s2[:, z, y, w, c]), (i, c)
        # exact host coder round-trip through the tail masks
        qparams = W.quantize_residuals(params, 16)
        payload = CTX.build_ctx_payload(spec, qparams["entropy"])
        ints = CTX.ctx_ints_from_payload(spec, payload)
        lat = rng.integers(-50, 51, (40, 2, 2, 2, 3)).astype(np.int64)
        enc = CTX.encode_latents_ctx(lat, ints, channel_ar=True)
        dec = CTX.decode_latents_ctx(enc["stream"], enc["shape"], ints, channel_ar=True)
        assert np.array_equal(dec, enc["coded"])
        assert np.array_equal(dec, lat) or enc["n_clamped"] > 0

    def test_tail_validation(self):
        with pytest.raises(ValueError):
            M.build_model_spec(entropy_mode="ctx", ctx_hidden=8, ctx_tail=4)
        with pytest.raises(ValueError):
            M.build_model_spec(entropy_mode="ctx_ar", ctx_hidden=8, ctx_tail=8)
