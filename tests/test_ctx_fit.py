"""Post-hoc context-predictor fitting (``train/ctx_fit.py``, the "ctx_post"
encode path).

Capability target: the reference's dormant context stack
(``/root/reference/utils/network.py:4312-4465``) fitted AFTER training on the
frozen rounded latents (RESULTS.md round 3) instead of co-trained. These tests
pin the fit's contract: it must actually capture conditional structure that
exists, it must never touch the reconstruction-relevant subtrees, and the
chunked early-stop must fire.
"""

import numpy as np
import pytest

from nvfpcc_tpu.models import decoder as M
from nvfpcc_tpu.ops import rate
from nvfpcc_tpu.train import ctx_fit

import jax.numpy as jnp


def _spec(mode="ctx_ar", ch=2):
    return M.build_model_spec(ch=ch, channels=(4, 8, 4, 4), entropy_mode=mode)


def _structured_latents(n=48, ch=2, seed=0):
    """Integer latents with real conditional structure: channel 1 copies
    channel 0 (ctx_ar's gated center tap can see it), plus a shared raster
    ramp — a fixed predictor must beat the marginal by a wide margin."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-6, 7, (n, 2, 2, 2, 1))
    ramp = np.arange(8).reshape(1, 2, 2, 2, 1)
    c0 = base + ramp
    lat = np.concatenate([c0] + [c0 + rng.integers(0, 2, c0.shape)] * (ch - 1), -1)
    return lat.astype(np.int64)


def _coded_bits(spec, ep, lat_int):
    x = jnp.asarray(lat_int, jnp.float32)
    mu, sigma = M.ctx_pred_apply(spec, {"entropy": ep}, x, q=2)
    return float(rate.gaussian_bits(x, sigma, mu, step=1.0).sum())


class TestFitCtxPredictor:
    def test_fit_captures_conditional_structure(self):
        spec = _spec()
        lat = _structured_latents()
        logs = []
        ep = ctx_fit.fit_ctx_predictor(
            spec, lat, steps=250, finetune_steps=250, early_stop=0.0,
            log=logs.append,
        )
        start = _coded_bits(spec, ctx_fit.feature_init_ctx(spec), lat)
        fitted = _coded_bits(spec, ep, lat)
        # channel 1 is a near-copy of channel 0: a working fit must cut the
        # q=2 coded-bit estimate well below the feature-init starting point
        assert fitted < 0.8 * start, (fitted, start)
        assert any("phase 2" in m for m in logs)

    def test_rejects_non_ctx_spec(self):
        spec = M.build_model_spec(ch=2, channels=(4, 8, 4, 4))
        with pytest.raises(ValueError, match="ctx-mode"):
            ctx_fit.fit_ctx_predictor(spec, _structured_latents(n=4))

    def test_early_stop_fires(self):
        spec = _spec()
        lat = _structured_latents(n=16)
        logs = []
        # early_stop=1.0: any chunk that fails to reach 0 bits counts as
        # sub-threshold, so with the default patience of 2 each phase must
        # stop at its third chunk despite steps=1500
        ctx_fit.fit_ctx_predictor(
            spec, lat, steps=1500, finetune_steps=1500, early_stop=1.0,
            log=logs.append,
        )
        converged = [m for m in logs if "converged at chunk 3" in m]
        assert len(converged) == 2, logs

    def test_early_stop_patience_one_is_previous_behavior(self):
        spec = _spec()
        lat = _structured_latents(n=16)
        logs = []
        ctx_fit.fit_ctx_predictor(
            spec, lat, steps=1000, finetune_steps=0, early_stop=1.0,
            early_stop_patience=1, log=logs.append,
        )
        assert any("converged at chunk 2" in m for m in logs), logs

    def test_payload_pricing_runs(self):
        """wrate pricing adds the transmitted-kernel cost without breaking
        the fit (the jitted objective must close over it correctly)."""
        spec = _spec()
        lat = _structured_latents(n=8)
        wrate = rate.scalar_gaussian_rate_params()
        ep = ctx_fit.fit_ctx_predictor(
            spec, lat, wrate=wrate, steps=250, finetune_steps=0,
            early_stop=0.0,
        )
        for n in M.CTX_KERNELS:
            assert np.all(np.isfinite(np.asarray(ep[n]["kernel"])))


class TestUpgradeParamsToCtx:
    def test_reconstruction_subtrees_untouched(self):
        spec = _spec(mode="ctx")
        params = M.init_params(spec)
        emb = np.asarray(M.init_embeddings(6, 2))
        out = ctx_fit.upgrade_params_to_ctx(
            spec, params, emb, steps=250, early_stop=1.0, log=lambda m: None,
        )
        # the upgrade swaps ONLY the entropy subtree: distortion (and the
        # decode program) must be byte-identical to the source checkpoint
        assert out["decoder"] is params["decoder"]
        assert out["latent_gen"] is params["latent_gen"]
        assert set(out["entropy"].keys()) >= set(M.CTX_KERNELS)
        for n in M.CTX_KERNELS:
            k = np.asarray(out["entropy"][n]["kernel"])
            assert k.shape == spec.specs[n].kernel_shape
            assert np.all(np.isfinite(k))

    def test_latents_from_checkpoint_are_rounded_ints(self):
        spec = _spec(mode="ctx")
        params = M.init_params(spec)
        emb = np.asarray(M.init_embeddings(5, 2))
        lat = ctx_fit.latents_from_checkpoint(spec, params, emb)
        assert lat.dtype == np.int64
        assert lat.shape == (5, 2, 2, 2, 2)
