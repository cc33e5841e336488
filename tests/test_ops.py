"""Unit tests for STE ops, GDN, and rate models (SURVEY.md §4 gate 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvfpcc_tpu.ops import gdn, rate
from nvfpcc_tpu.ops.ste import bypass_round, bypass_round16, lower_bound, upper_bound


class TestSTE:
    def test_bypass_round_forward(self):
        x = jnp.array([0.2, 0.6, -1.4, 2.5])
        np.testing.assert_allclose(bypass_round(x), np.round(x))

    def test_bypass_round_gradient_identity(self):
        g = jax.grad(lambda x: (bypass_round(x) * 3.0).sum())(jnp.array([0.2, 1.7]))
        np.testing.assert_allclose(g, [3.0, 3.0])

    def test_bypass_round16_grid(self):
        x = jnp.array([0.031, 0.49, -0.27])
        y = bypass_round16(x)
        np.testing.assert_allclose(y * 16, np.round(np.asarray(y) * 16), atol=1e-7)
        np.testing.assert_allclose(y, np.round(np.asarray(x) * 16) / 16, atol=1e-7)

    def test_bypass_round16_gradient_identity(self):
        g = jax.grad(lambda x: bypass_round16(x).sum())(jnp.array([0.3, -0.9]))
        np.testing.assert_allclose(g, [1.0, 1.0])

    def test_lower_bound_forward(self):
        np.testing.assert_allclose(
            lower_bound(jnp.array([-1.0, 0.5, 2.0]), 0.0), [0.0, 0.5, 2.0]
        )

    def test_lower_bound_gradient_gating(self):
        # inside bound: gradient passes
        x = jnp.array([0.5, -1.0, -1.0])

        def f(x, sign):
            return (lower_bound(x, 0.0) * sign).sum()

        # x=0.5 (inside): passes. x=-1 with +g (pushes down, clamped): blocked.
        g = jax.grad(f)(x, jnp.array([1.0, 1.0, -1.0]))
        # third: g = -1 < 0 pushes x up toward bound: passes
        np.testing.assert_allclose(g, [1.0, 0.0, -1.0])

    def test_upper_bound_gradient_gating(self):
        x = jnp.array([0.5, 2.0, 2.0])

        def f(x, sign):
            return (upper_bound(x, 1.0) * sign).sum()

        g = jax.grad(f)(x, jnp.array([1.0, 1.0, -1.0]))
        # x=2 (above bound): +g (pushes x down toward bound under descent? g>0 passes)
        np.testing.assert_allclose(g, [1.0, 1.0, 0.0])


class TestGDN:
    def test_identity_scaling_at_init(self):
        """At init beta~=1, gamma~=0.1*I: y = x / sqrt(1 + 0.1 x^2)."""
        params = gdn.gdn_init(4)
        x = jnp.ones((2, 3, 3, 3, 4)) * 2.0
        y = gdn.gdn_apply(params, x)
        expected = 2.0 / np.sqrt(1.0 + 0.1 * 4.0)
        np.testing.assert_allclose(y, expected, rtol=1e-5)

    def test_igdn_inverts_direction(self):
        params = gdn.gdn_init(4)
        x = jnp.ones((1, 2, 2, 2, 4)) * 2.0
        y = gdn.igdn_apply(params, x)
        expected = 2.0 * np.sqrt(1.0 + 0.1 * 4.0)
        np.testing.assert_allclose(y, expected, rtol=1e-5)

    def test_matches_torch_reference_formula(self, rng):
        torch = pytest.importorskip("torch")
        ch = 5
        params = gdn.gdn_init(ch)
        x_np = rng.standard_normal((2, 4, 4, 4, ch)).astype(np.float32)
        y = np.asarray(gdn.gdn_apply(params, jnp.asarray(x_np)))

        # torch-side computation of the same formula (channels-first)
        xt = torch.from_numpy(np.moveaxis(x_np, -1, 1).copy())
        beta = torch.from_numpy(np.asarray(params["beta"]))
        gamma = torch.from_numpy(np.asarray(params["gamma"]))
        beta_r = torch.clamp(beta, min=gdn.BETA_BOUND) ** 2 - gdn.PEDESTAL
        gamma_r = (torch.clamp(gamma, min=gdn.GAMMA_BOUND) ** 2 - gdn.PEDESTAL).view(
            ch, ch, 1, 1, 1
        )
        norm = torch.sqrt(torch.nn.functional.conv3d(xt**2, gamma_r, beta_r))
        yt = np.moveaxis((xt / norm).numpy(), 1, -1)
        np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-6)


class TestRate:
    def test_gaussian_rate_closed_form(self):
        """bits = -log2(Phi(x+.5) - Phi(x-.5)) for sigma=1, mu=0."""
        from math import erf, log2, sqrt

        x = jnp.array([0.0, 1.0, -2.0])
        bits = np.asarray(rate.gaussian_bits(x, 1.0, 0.0, 1.0))

        def phi(v):
            return 0.5 * (1 + erf(v / sqrt(2)))

        expected = [-log2(phi(v + 0.5) - phi(v - 0.5)) for v in [0.0, 1.0, -2.0]]
        np.testing.assert_allclose(bits, expected, rtol=1e-5)

    def test_likelihood_floor(self):
        # far in the tail the likelihood floors at 1e-8 -> bits cap ~26.57
        bits = float(rate.gaussian_bits(jnp.array([50.0]), 1.0, 0.0, 1.0)[0])
        assert abs(bits - (-np.log2(1e-8))) < 1e-3

    def test_laplace_rate_closed_form(self):
        from math import exp, log2

        bits = float(rate.laplace_bits(jnp.array([0.0]), 1.0, 0.0, 1.0)[0])

        def lap_cdf(v):
            return 0.5 * exp(v) if v < 0 else 1 - 0.5 * exp(-v)

        expected = -log2(lap_cdf(0.5) - lap_cdf(-0.5))
        np.testing.assert_allclose(bits, expected, rtol=1e-5)

    def test_scalar_weight_rate_positive_and_differentiable(self):
        params = rate.scalar_gaussian_rate_params()
        x = jnp.array([0.0, 1 / 16, -3 / 16])
        bits = rate.scalar_gaussian_rate(params, x)
        assert float(bits) > 0
        g = jax.grad(lambda p: rate.scalar_gaussian_rate(p, x))(params)
        assert np.isfinite(float(g["sigma"][0]))
