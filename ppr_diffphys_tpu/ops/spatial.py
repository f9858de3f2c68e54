"""SE(3) transforms and spatial vectors (pure JAX).

A *transform* is a 7-vector ``[x, y, z, qx, qy, qz, qw]`` (translation +
quat xyzw) — same layout as the reference's ``wp.transform`` arrays and the
maximal-coordinate body state ``body_q``.

A *spatial vector* is a 6-vector. Two layouts exist in the reference and both
are preserved here:
- **warp layout** ``[angular, linear]`` — used inside the simulator
  (``body_qd``, ``body_f``; reference integrator_euler.py:54-59), and
- **ppr layout** ``[linear, angular]`` — used at the model/data API
  (mocap vel/avel; reference dp_model.py:1014-1019 ``convert_ppr_warp``).
``swap_lin_ang`` converts between them (it is an involution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import (
    quat_inverse,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    matrix_to_quat,
    axis_angle_to_quat,
    quat_to_axis_angle,
)


# ---------------------------------------------------------------------------
# transforms (7-vectors)
# ---------------------------------------------------------------------------

def transform_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    t = jnp.zeros(tuple(shape) + (7,), dtype=dtype)
    return t.at[..., 6].set(1.0)


def make_transform(p, q) -> jax.Array:
    return jnp.concatenate([jnp.asarray(p), jnp.asarray(q)], axis=-1)


def transform_p(t: jax.Array) -> jax.Array:
    return t[..., 0:3]


def transform_q(t: jax.Array) -> jax.Array:
    return t[..., 3:7]


def transform_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose transforms: (a*b) applies b first, then a."""
    p = transform_p(a) + quat_rotate(transform_q(a), transform_p(b))
    q = quat_mul(transform_q(a), transform_q(b))
    return jnp.concatenate([p, q], axis=-1)


def transform_inverse(t: jax.Array) -> jax.Array:
    qi = quat_inverse(transform_q(t))
    return jnp.concatenate([-quat_rotate(qi, transform_p(t)), qi], axis=-1)


def transform_point(t: jax.Array, p: jax.Array) -> jax.Array:
    """Apply full transform (rotation + translation) to point(s)."""
    return transform_p(t) + quat_rotate(transform_q(t), p)


def transform_vector(t: jax.Array, v: jax.Array) -> jax.Array:
    """Apply only the rotation of the transform to vector(s)."""
    return quat_rotate(transform_q(t), v)


# ---------------------------------------------------------------------------
# se3 vec <-> 4x4 matrix (reference geom_utils.py:150-207)
# ---------------------------------------------------------------------------

def se3_vec2mat(vec: jax.Array) -> jax.Array:
    """[x,y,z,qx,qy,qz,qw] (7) or [x,y,z, axis-angle] (6) -> (...,4,4)."""
    if vec.shape[-1] == 6:
        rmat = quat_to_matrix(axis_angle_to_quat(vec[..., 3:6]))
    else:
        rmat = quat_to_matrix(quat_normalize(vec[..., 3:7]))
    shape = vec.shape[:-1]
    mat = jnp.zeros(shape + (4, 4), vec.dtype)
    mat = mat.at[..., :3, :3].set(rmat)
    mat = mat.at[..., :3, 3].set(vec[..., :3])
    mat = mat.at[..., 3, 3].set(1.0)
    return mat


def se3_mat2vec(mat: jax.Array, outdim: int = 7) -> jax.Array:
    """(...,4,4) -> 7-vec (quat xyzw) or 6-vec (axis-angle)."""
    t = mat[..., :3, 3]
    q = matrix_to_quat(mat[..., :3, :3])
    if outdim == 7:
        rot = q
    elif outdim == 6:
        rot = quat_to_axis_angle(q)
    else:
        raise ValueError("outdim must be 6 or 7")
    return jnp.concatenate([t, rot], axis=-1)


def compose_delta(target_q: jax.Array, delta_root: jax.Array) -> jax.Array:
    """delta (6-vec: trans+axis-angle) composed on the left of target (7-vec).

    Mirrors diffphys/dp_utils.py:21-30.
    """
    return se3_mat2vec(se3_vec2mat(delta_root) @ se3_vec2mat(target_q))


def rotate_frame(global_q: jax.Array, target_q: jax.Array) -> jax.Array:
    """Left-compose a global SE(3) onto root pose(s) (dp_utils.py:60-72)."""
    gmat = se3_vec2mat(global_q)
    gmat = gmat.reshape((1,) * (target_q.ndim - global_q.ndim) + gmat.shape)
    return se3_mat2vec(gmat @ se3_vec2mat(target_q), outdim=target_q.shape[-1])


def rotate_frame_vel(global_q: jax.Array, target_qd: jax.Array) -> jax.Array:
    """Rotate root velocity [lin, ang] by the rotation part of global_q
    (dp_utils.py:75-83)."""
    rot_only = global_q.at[..., :3].set(0.0)
    lin = rotate_frame(rot_only, target_qd)[..., :3]
    ang = rotate_frame(
        rot_only, jnp.concatenate([target_qd[..., 3:], target_qd[..., :3]], -1)
    )[..., :3]
    return jnp.concatenate([lin, ang], axis=-1)


# ---------------------------------------------------------------------------
# spatial vectors
# ---------------------------------------------------------------------------

def swap_lin_ang(v: jax.Array) -> jax.Array:
    """[a,b,rest] -> [b,a,rest] on the last axis: ppr<->warp layout swap.

    Mirrors convert_ppr_warp (reference dp_model.py:1014-1019). Works on
    6-vectors and on flattened ``(... , 6+n)`` root-state vectors.
    """
    return jnp.concatenate([v[..., 3:6], v[..., 0:3], v[..., 6:]], axis=-1)


def spatial_top(v: jax.Array) -> jax.Array:
    return v[..., 0:3]


def spatial_bottom(v: jax.Array) -> jax.Array:
    return v[..., 3:6]


def make_spatial(top: jax.Array, bottom: jax.Array) -> jax.Array:
    return jnp.concatenate([top, bottom], axis=-1)
