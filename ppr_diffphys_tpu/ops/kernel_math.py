"""Transcendentals that lower inside Pallas TPU kernels.

Mosaic (the Pallas TPU compiler) has no ``atan2`` / ``asin`` / ``acos``
primitives, so the joint-angle extraction in the force path uses these
polynomial implementations instead. They are used by BOTH the XLA and the
Pallas paths (single source of truth), so the two rollouts stay bit-close.

``atan`` uses the minimax polynomial of Ukil et al. ("Fast computation of
arctangent functions"), max error ~1e-5 rad on [-1, 1], extended by
``atan(x) = pi/2 - atan(1/x)`` and quadrant fixes — far below any
physically meaningful torque error (1e-5 rad * ke=660 ~ 7e-3 N*m), and
smooth, so gradients are well-behaved.
"""

from __future__ import annotations

import jax.numpy as jnp

_C1 = 0.99997726
_C3 = -0.33262347
_C5 = 0.19354346
_C7 = -0.11643287
_C9 = 0.05265332
_C11 = -0.01172120


def _atan_poly(t):
    """atan on |t| <= 1."""
    s = t * t
    return t * (
        _C1 + s * (_C3 + s * (_C5 + s * (_C7 + s * (_C9 + s * _C11))))
    )


def atan2(y, x):
    """Four-quadrant arctangent, polynomial, pallas-lowerable."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    big = jnp.maximum(ax, ay)
    small = jnp.minimum(ax, ay)
    t = small / jnp.maximum(big, 1e-30)
    a = _atan_poly(t)
    # undo the min/max swap
    a = jnp.where(ay > ax, 0.5 * jnp.pi - a, a)
    # quadrants
    a = jnp.where(x < 0, jnp.pi - a, a)
    a = jnp.where(y < 0, -a, a)
    return a


def asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    return atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-30)))


def acos(x):
    return 0.5 * jnp.pi - asin(x)
