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

import jax
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


# ---------------------------------------------------------------------------
# 2-component Gaussian mixture (reference GMM2/GMMLikelihoodModel,
# utils/network.py:238-285; per-channel here — the reference's is the
# broadcast scalar special case)
# ---------------------------------------------------------------------------


def gmm2_init(ch: int) -> dict:
    """Per-channel 2-component mixture params. Component means start split at
    -/+0.5 (the reference randomizes U(-0.5,0.5); a deterministic split keeps
    init reproducible while breaking the component symmetry)."""
    return {
        "sigma": jnp.ones((2, ch), jnp.float32),
        "mu": jnp.stack(
            [jnp.full((ch,), -0.5, jnp.float32), jnp.full((ch,), 0.5, jnp.float32)]
        ),
        "p_logit": jnp.zeros((ch,), jnp.float32),
    }


def gmm2_bits(x, params: dict, step: float = 1.0):
    """Per-element bits under the per-channel 2-component mixture
    (reference ``GMM2.forward``, ``utils/network.py:254-260``).
    ``x`` is channels-last; params broadcast over leading axes."""
    sigma = jnp.abs(params["sigma"])
    mu = params["mu"]
    p = jax.nn.sigmoid(params["p_logit"])
    l0 = _boxed_likelihood_gaussian(x, sigma[0], mu[0], step)
    l1 = _boxed_likelihood_gaussian(x, sigma[1], mu[1], step)
    return _bits_from_likelihood(p * l0 + (1.0 - p) * l1)


# ---------------------------------------------------------------------------
# factorized (Balle-style) univariate CDF model (reference CDFModel +
# LikelihoodModel, utils/network.py:105-236; per-channel here)
# ---------------------------------------------------------------------------

FACTORIZED_FILTERS = (1, 3, 3, 3, 1)  # reference CDFModel.filters
_FACTORIZED_FLOOR = 1e-9  # reference LikelihoodModel likelihood bound


def factorized_init(ch: int, init_scale: float = 10.0) -> dict:
    """Per-channel monotone logit-CDF MLP params (reference ``CDFModel.__init__``:
    matrices at a constant scale, biases centered, tanh-factor gates at zero;
    the bias init is deterministic here — entropy params ship in the pack, so
    no RNG may be involved)."""
    f = FACTORIZED_FILTERS
    scale = init_scale ** (1.0 / (len(f) + 1))
    params = {}
    for i in range(len(f) - 1):
        params[f"matrix_{i}"] = jnp.full((ch, f[i], f[i + 1]), scale, jnp.float32)
        # deterministic stand-in for the reference's U(-0.5, 0.5) bias init:
        # evenly spaced in (-0.5, 0.5), different per unit
        n = f[i + 1]
        b = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
        params[f"bias_{i}"] = jnp.broadcast_to(b, (ch, n)).astype(jnp.float32)
        if i < len(f) - 2:
            params[f"factor_{i}"] = jnp.zeros((ch, f[i + 1]), jnp.float32)
    return params


def factorized_logit_cdf(params: dict, x):
    """logit-CDF of ``x`` (..., ch) under each channel's MLP
    (reference ``CDFModel.forward``, ``utils/network.py:127-137``)."""
    f = FACTORIZED_FILTERS
    y = x[..., None]  # (..., ch, 1)
    for i in range(len(f) - 1):
        m = jax.nn.softplus(params[f"matrix_{i}"])
        y = jnp.einsum("...ci,cio->...co", y, m) + params[f"bias_{i}"]
        if i < len(f) - 2:
            y = y + jnp.tanh(params[f"factor_{i}"]) * jnp.tanh(y)
    return y[..., 0]


def factorized_bits(x, params: dict, step: float = 1.0):
    """Per-element bits under the factorized model, with the reference's
    sign trick for far-tail numerical stability
    (``LikelihoodModel.forward``, ``utils/network.py:210-222``)."""
    half = 0.5 * step
    upper = factorized_logit_cdf(params, x + half)
    lower = factorized_logit_cdf(params, x - half)
    sign = -jax.lax.stop_gradient(jnp.sign(upper + lower))
    likelihood = jnp.abs(
        jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
    )
    likelihood = lower_bound(likelihood, _FACTORIZED_FLOOR)
    return -jnp.log(likelihood) / _LOG2


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
