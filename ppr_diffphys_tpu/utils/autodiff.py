"""Autodiff helpers (reference diffphys/torch_utils.py:24-47).

``compute_gradient`` mirrors the reference's per-output autograd jacobian
(used there to differentiate pose MLPs wrt time for velocity estimates);
in JAX it is a vmapped jacfwd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gradient(fn, x):
    """Jacobian of a batched function.

    fn: maps (N, D_in) -> (N, D_out); x: (N, D_in).
    Returns (N, D_in, D_out), matching the reference's output layout.
    """

    def single(xi):
        return fn(xi[None])[0]

    jac = jax.vmap(jax.jacfwd(single))(x)  # (N, D_out, D_in)
    return jnp.swapaxes(jac, -1, -2)
