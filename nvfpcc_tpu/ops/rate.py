"""Differentiable rate (entropy) models.

Rebuild of the reference rate estimators:

- ``gaussian_rate`` / ``laplace_rate`` — bits under a boxed CDF,
  ``-log2(CDF(x - mu + q/2) - CDF(x - mu - q/2))`` with a gradient-gated
  likelihood floor of 1e-8 (reference ``utils/network.py:139-201``).
- ``scalar_gaussian_rate_params`` / ``scalar_gaussian_rate`` — the
  weight-residual rate model: a single learned (sigma, mu) Gaussian over an
  entire tensor at step 1/16 (reference ``GaussianLikelihoodModel``,
  ``utils/network.py:287-305``).

All math is float32; rate sums reduce in float32. These run fused on the VPU
alongside the decoder forward under one jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import jax.scipy.stats as jstats

from nvfpcc_tpu.ops.ste import lower_bound

LIKELIHOOD_FLOOR = 1e-8
_LOG2 = math.log(2.0)


def _boxed_likelihood_gaussian(x, sigma, mu, step):
    half = 0.5 * step
    upper = (x - mu + half) / sigma
    lower = (x - mu - half) / sigma
    return jstats.norm.cdf(upper) - jstats.norm.cdf(lower)


def _laplace_cdf(z):
    # Laplace(0, 1) CDF
    return jnp.where(z < 0, 0.5 * jnp.exp(z), 1.0 - 0.5 * jnp.exp(-z))


def _boxed_likelihood_laplace(x, sigma, mu, step):
    half = 0.5 * step
    return _laplace_cdf((x - mu + half) / sigma) - _laplace_cdf((x - mu - half) / sigma)


def _bits_from_likelihood(likelihood):
    likelihood = lower_bound(likelihood, LIKELIHOOD_FLOOR)
    return -jnp.log(likelihood) / _LOG2


def gaussian_bits(x, sigma, mu, step: float = 1.0):
    """Per-element bits under N(mu, sigma) with quantization bin ``step``."""
    return _bits_from_likelihood(_boxed_likelihood_gaussian(x, sigma, mu, step))


def gaussian_rate(x, sigma, mu, step: float = 1.0):
    """Total bits (sum) — reference ``GaussianModel.forward`` (``utils/network.py:155-162``)."""
    return gaussian_bits(x, sigma, mu, step).sum()


def laplace_bits(x, sigma, mu, step: float = 1.0):
    return _bits_from_likelihood(_boxed_likelihood_laplace(x, sigma, mu, step))


def laplace_rate(x, sigma, mu, step: float = 1.0):
    return laplace_bits(x, sigma, mu, step).sum()


def scalar_gaussian_rate_params() -> dict:
    """Learned scalar (sigma, mu) for the weight-residual rate model
    (reference ``utils/network.py:290-297``)."""
    return {
        "sigma": jnp.ones((1,), jnp.float32),
        "mu": jnp.zeros((1,), jnp.float32),
    }


def scalar_gaussian_rate(params: dict, x, step: float = 1.0 / 16.0):
    """Total bits for tensor ``x`` under the scalar Gaussian at ``step``
    (reference ``GaussianLikelihoodModel.forward``, ``utils/network.py:301-305``)."""
    sigma = jnp.abs(params["sigma"])
    return gaussian_rate(x.reshape(-1), sigma, params["mu"], step)
