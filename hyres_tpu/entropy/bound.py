"""Lower-bound op with identity-ish gradient.

Reproduces the capability of CompressAI's ``LowerBound`` autograd function
(used inside its entropy models; behavior per CompressAI 1.2.6, see
reference import sites at /root/reference/models/checkerboard.py:6): the
forward is ``max(x, bound)``; the backward passes the gradient through
whenever the input is above the bound OR the gradient would push the input
upward (``grad < 0`` under gradient descent), so clamped values can still
escape the bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jax.Array, bound) -> jax.Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


LIKELIHOOD_BOUND = 1e-9
