"""Conv semantics vs torch + decoder shape-chain tests (SURVEY.md §4 gate 1/2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvfpcc_tpu.models import decoder as M
from nvfpcc_tpu.ops import conv as qc
from nvfpcc_tpu.utils import seeds


def _torch_conv3d(x_np, w_np, b_np, stride, padding):
    """x (B,D,H,W,Ci), w (k,k,k,Ci,Co) -> torch conv3d reference."""
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())
    # torch weight layout (Co, Ci, k, k, k)
    wt = torch.from_numpy(np.transpose(w_np, (4, 3, 0, 1, 2)).copy())
    bt = torch.from_numpy(b_np) if b_np is not None else None
    y = torch.nn.functional.conv3d(xt, wt, bt, stride=stride, padding=padding)
    return np.moveaxis(y.numpy(), 1, -1)


def _torch_conv_transpose3d(x_np, w_np, b_np, stride, padding, output_padding):
    """w (k,k,k,Ci,Co) where Ci is the transpose op's input channels."""
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())
    # torch convT weight layout (Ci, Co, k, k, k)
    wt = torch.from_numpy(np.transpose(w_np, (3, 4, 0, 1, 2)).copy())
    bt = torch.from_numpy(b_np) if b_np is not None else None
    y = torch.nn.functional.conv_transpose3d(
        xt, wt, bt, stride=stride, padding=padding, output_padding=output_padding
    )
    return np.moveaxis(y.numpy(), 1, -1)


class TestConvTorchEquivalence:
    @pytest.mark.parametrize("stride,padding", [(1, 0), (1, 1), (2, 1)])
    def test_conv3d(self, rng, stride, padding):
        x = rng.standard_normal((2, 8, 8, 8, 3)).astype(np.float32)
        w = rng.standard_normal((3, 3, 3, 3, 5)).astype(np.float32)
        b = rng.standard_normal((5,)).astype(np.float32)
        spec = qc.make_qspec(seeds.base_key("t"), "conv", 3, 5, 3, stride, padding)
        # zero out the seeded init so the params carry the full kernel
        spec = qc.QSpec(**{**spec.__dict__, "kernel_init": np.zeros_like(spec.kernel_init),
                           "b_init": np.zeros_like(spec.b_init)})
        params = {"kernel": jnp.asarray(w), "b": jnp.asarray(b)}
        y = np.asarray(qc.qconv3d(spec, params, jnp.asarray(x), q=0))
        yt = _torch_conv3d(x, w, b, stride, padding)
        np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize(
        "k,stride,padding,op,din,dout",
        [
            (5, 2, 2, 1, 2, 4),   # up0: 2 -> 4
            (5, 2, 2, 1, 4, 8),   # conv0: 4 -> 8
            (5, 2, 0, 0, 8, 19),  # up1: 8 -> 19
            (5, 2, 0, 0, 16, 35), # up2: 16 -> 35
        ],
    )
    def test_conv_transpose3d(self, rng, k, stride, padding, op, din, dout):
        ci, co = 3, 4
        x = rng.standard_normal((2, din, din, din, ci)).astype(np.float32)
        w = rng.standard_normal((k, k, k, ci, co)).astype(np.float32)
        b = rng.standard_normal((co,)).astype(np.float32)
        spec = qc.make_qspec(
            seeds.base_key("t"), "conv_transpose", ci, co, k, stride, padding, output_padding=op
        )
        spec = qc.QSpec(**{**spec.__dict__, "kernel_init": np.zeros_like(spec.kernel_init),
                           "b_init": np.zeros_like(spec.b_init)})
        params = {"kernel": jnp.asarray(w), "b": jnp.asarray(b)}
        y = np.asarray(qc.qconv_transpose3d(spec, params, jnp.asarray(x), q=0))
        assert y.shape == (2, dout, dout, dout, co)
        yt = _torch_conv_transpose3d(x, w, b, stride, padding, op)
        np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-4)


class TestQuantPhases:
    def test_q2_rounds_residual_only(self, rng):
        spec = qc.make_qspec(seeds.base_key("t2"), "conv", 2, 2, 3, 1, 1)
        kernel = rng.standard_normal((3, 3, 3, 2, 2)).astype(np.float32) * 0.1
        params = {"kernel": jnp.asarray(kernel), "b": jnp.zeros(2)}
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 2)).astype(np.float32))
        y2 = np.asarray(qc.qconv3d(spec, params, x, q=2))
        # manually: round16(kernel) + init
        k_eff = np.round(kernel * 16) / 16 + spec.kernel_init
        params_eff = {"kernel": jnp.asarray(k_eff), "b": jnp.zeros(2)}
        spec0 = qc.QSpec(**{**spec.__dict__, "kernel_init": np.zeros_like(spec.kernel_init)})
        y_ref = np.asarray(qc.qconv3d(spec0, params_eff, x, q=0))
        np.testing.assert_allclose(y2, y_ref, rtol=1e-5, atol=1e-5)

    def test_q1_noise_bounded(self, rng):
        spec = qc.make_qspec(seeds.base_key("t3"), "conv", 2, 2, 1, 1, 0)
        params = qc.conv_init(spec)
        x = jnp.ones((1, 2, 2, 2, 2))
        key = jax.random.PRNGKey(0)
        y1 = qc.qconv3d(spec, params, x, q=1, key=key)
        y0 = qc.qconv3d(spec, params, x, q=0)
        # noise amplitude <= Q/2 per weight; output perturbation bounded
        assert float(jnp.abs(y1 - y0).max()) <= 2 * (0.5 / 16) * 1.01 + 1e-6


class TestDecoderChain:
    def test_shapes_and_determinism(self):
        spec = M.build_model_spec(ch=3, channels=(8, 16, 8, 8))
        params = M.init_params(spec)
        emb = M.init_embeddings(4, 3)
        out, cls_list, net_bits, latent_bits = M.net_apply(
            spec, params, emb, mode="eval", q=2
        )
        assert out.shape == (4, 32, 32, 32, 1)
        assert cls_list[0].shape == (4, 8, 8, 8, 1)
        assert cls_list[1].shape == (4, 16, 16, 16, 1)
        assert cls_list[2].shape == (4, 32, 32, 32, 1)
        assert net_bits.shape == (7,)
        assert latent_bits.shape == (4,)
        assert float(latent_bits.sum()) > 0
        # eval path is deterministic
        out2, *_ = M.net_apply(spec, params, emb, mode="eval", q=2)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_output_in_unit_interval(self):
        spec = M.build_model_spec(ch=3, channels=(8, 16, 8, 8))
        params = M.init_params(spec)
        out = M.reconstruct(spec, params, M.init_embeddings(2, 3), q=2)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_seeded_init_reproducible_across_builds(self):
        s1 = M.build_model_spec(ch=3)
        s2 = M.build_model_spec(ch=3)
        for name in M.TRANSMITTED_KERNELS:
            np.testing.assert_array_equal(
                s1.specs[name].kernel_init, s2.specs[name].kernel_init
            )

    def test_transmitted_residual_count_reference_config(self):
        spec = M.build_model_spec(ch=3, channels=(8, 16, 8, 8))
        n = M.count_transmitted_residuals(spec)
        # 7 kernels at chanstr 8,16,8,8 / ch 3 => ~51.4k coded residuals
        # (BASELINE.md 'Coded payload sizes')
        assert n == (
            3 * 8 * 125 + 8 * 16 * 125 + 16 * 8 * 125 + 8 * 8 * 64
            + 8 * 8 * 125 + 8 * 8 * 64 + 8 * 1 * 27
        )

    def test_train_mode_grad_flows_to_emb_and_params(self):
        spec = M.build_model_spec(ch=3)
        params = M.init_params(spec)
        emb = M.init_embeddings(2, 3)
        key = jax.random.PRNGKey(1)

        def loss_fn(params, emb):
            out, _, net_bits, latent_bits = M.net_apply(
                spec, params, emb, mode="train", q=1, key=key
            )
            return out.sum() + net_bits.sum() + latent_bits.sum()

        gp, ge = jax.grad(loss_fn, argnums=(0, 1))(params, emb)
        assert float(jnp.abs(ge).sum()) > 0
        assert float(jnp.abs(gp["decoder"]["up0"]["kernel"]).sum()) > 0
        assert float(jnp.abs(gp["entropy"]["sigma"]).sum()) > 0
