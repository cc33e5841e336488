"""Straight-through estimators and gradient-gated bounds.

Capability parity with the reference STE ops (``utils/network.py:25-93``):

- ``bypass_round``   — round to the integer grid, identity gradient.
- ``bypass_round16`` — round to the 1/16 grid, identity gradient
  (the weight-residual quantizer, reference ``utils/network.py:46-49``).
- ``lower_bound`` / ``upper_bound`` — clamps whose gradient passes through
  iff the input is inside the bound or the gradient pushes it back inside
  (reference ``utils/network.py:60-93``).

All are ``jax.custom_vjp`` functions, safe under ``jit``/``vmap``/``scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def bypass_round(x):
    """Round to nearest integer; gradient is identity (STE)."""
    return jnp.round(x)


def _bypass_round_fwd(x):
    return jnp.round(x), None


def _bypass_round_bwd(_, g):
    return (g,)


bypass_round.defvjp(_bypass_round_fwd, _bypass_round_bwd)


def make_bypass_round_q(inv_step: int):
    """Build an STE rounder onto the 1/``inv_step`` grid."""

    @jax.custom_vjp
    def _round_q(x):
        return jnp.round(x * inv_step) / inv_step

    def _fwd(x):
        return _round_q(x), None

    def _bwd(_, g):
        return (g,)

    _round_q.defvjp(_fwd, _bwd)
    return _round_q


bypass_round16 = make_bypass_round_q(16)
bypass_round32 = make_bypass_round_q(32)


@jax.custom_vjp
def lower_bound(x, bound):
    """``max(x, bound)`` with gradient gating.

    Gradient w.r.t. ``x`` passes iff ``x >= bound`` or the incoming gradient
    is negative (would push ``x`` upward under gradient *descent*), matching
    reference ``utils/network.py:60-76``. No gradient flows to ``bound``.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = jnp.logical_or(x >= bound, g < 0)
    return g * pass_through, jnp.zeros_like(jnp.asarray(bound, dtype=g.dtype))


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x, bound):
    """``min(x, bound)`` with gradient gating (reference ``utils/network.py:78-93``)."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = jnp.logical_or(x <= bound, g > 0)
    return g * pass_through, jnp.zeros_like(jnp.asarray(bound, dtype=g.dtype))


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)
