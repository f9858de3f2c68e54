"""Quaternion / rotation math core (pure JAX, TPU-friendly).

Conventions
-----------
- Quaternions are stored **xyzw** (scalar last) unless a function name says
  otherwise. This matches the maximal-coordinate body state layout
  ``body_q = [x, y, z, qx, qy, qz, qw]`` used throughout the simulator
  (reference: diffphys/integrator_euler.py:22-33, dp_model.py state layout).
- All functions broadcast over arbitrary leading batch dimensions and are
  differentiable (safe-guarded at singularities so ``jax.grad`` never
  produces NaN where the reference had to scrub them post-hoc,
  reference: diffphys/dp_utils.py:43-57).
- fp32 throughout: the stiff attachment springs (ke=16e3 at dt=5e-4) do not
  survive bf16 (see SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import kernel_math

_EPS = 1e-9


# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    """Identity quaternion(s) xyzw, shape ``shape + (4,)``.

    Built by concatenation (not ``.at[].set``) so it lowers inside Pallas
    kernels, which have no scatter primitive."""
    shape = tuple(shape)
    return jnp.concatenate(
        [jnp.zeros(shape + (3,), dtype), jnp.ones(shape + (1,), dtype)], -1
    )


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both xyzw. Rotation by (a*b) applies b first."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions), xyzw."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


quat_inverse = quat_conjugate


def quat_normalize(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """Safe normalize; the zero quaternion maps to identity, grads stay finite."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.maximum(n, eps)
    qn = q / safe
    return jnp.where(n > eps, qn, quat_identity(q.shape[:-1], q.dtype))


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q (xyzw)."""
    u = q[..., :3]
    w = q[..., 3:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of q."""
    return quat_rotate(quat_conjugate(q), v)


# ---------------------------------------------------------------------------
# conversions
# ---------------------------------------------------------------------------

def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quat xyzw. `axis` (...,3), `angle` (...)."""
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def axis_angle_to_quat(rotvec: jax.Array) -> jax.Array:
    """Rotation-vector (axis*angle) -> quat xyzw, Taylor-safe at 0.

    Mirrors dqtorch.axis_angle_to_quaternion used by the reference
    (diffphys/geom_utils.py:97-100) but with xyzw output.
    """
    sq = jnp.sum(rotvec * rotvec, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, _EPS))
    half = 0.5 * angle
    small = sq < 1e-12
    # sin(x/2)/x  ~  1/2 - x^2/48
    sin_half_over = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    xyz = rotvec * sin_half_over
    w = jnp.where(small[..., 0], 1.0 - sq[..., 0] / 8.0, jnp.cos(half[..., 0]))
    return jnp.concatenate([xyz, w[..., None]], axis=-1)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    """Quat xyzw -> rotation vector, Taylor-safe at identity.

    Mirrors pytorch3d's quaternion_to_axis_angle vendored by the reference
    (diffphys/geom_utils.py:102-131).
    """
    xyz = q[..., :3]
    w = q[..., 3:4]
    sq = jnp.sum(xyz * xyz, axis=-1, keepdims=True)
    is_zero = sq < 1e-12
    # where-guard so the sqrt grad path is blocked in the zero branch
    norms = jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))
    half = kernel_math.atan2(norms, w)
    angles = 2.0 * half
    small = jnp.abs(angles) < 1e-6
    sin_half_over = jnp.where(
        small, 0.5 - angles * angles / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angles)
    )
    return xyz / sin_half_over


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quat xyzw -> rotation matrix (...,3,3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (...,3,3) -> quat xyzw.

    Branch-free Shepperd-style extraction: compute all four candidate
    solutions and select the numerically best by max pivot (differentiable
    a.e., never divides by a small pivot).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # squared components *4 (may be <=0 off-pivot; clamp before sqrt)
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate built from each pivot
    w_w = _safe_sqrt(qw2) * 0.5
    cand_w = jnp.stack(
        [(m21 - m12) / (4 * w_w), (m02 - m20) / (4 * w_w), (m10 - m01) / (4 * w_w), w_w],
        axis=-1,
    )
    x_x = _safe_sqrt(qx2) * 0.5
    cand_x = jnp.stack(
        [x_x, (m01 + m10) / (4 * x_x), (m02 + m20) / (4 * x_x), (m21 - m12) / (4 * x_x)],
        axis=-1,
    )
    y_y = _safe_sqrt(qy2) * 0.5
    cand_y = jnp.stack(
        [(m01 + m10) / (4 * y_y), y_y, (m12 + m21) / (4 * y_y), (m02 - m20) / (4 * y_y)],
        axis=-1,
    )
    z_z = _safe_sqrt(qz2) * 0.5
    cand_z = jnp.stack(
        [(m02 + m20) / (4 * z_z), (m12 + m21) / (4 * z_z), z_z, (m10 - m01) / (4 * z_z)],
        axis=-1,
    )

    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (...,4cands,4)
    scores = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)  # (...,4)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    sign = jnp.where(q[..., 3:4] < 0, -1.0, 1.0)
    return quat_normalize(q * sign)


def quat_rpy(roll, pitch, yaw) -> jax.Array:
    """URDF fixed-axis roll-pitch-yaw -> quat xyzw (R = Rz(yaw) Ry(pitch) Rx(roll)).

    Matches wp.quat_rpy used by the reference URDF importer
    (diffphys/import_urdf.py:31).
    """
    roll = jnp.asarray(roll, jnp.float32)
    pitch = jnp.asarray(pitch, jnp.float32)
    yaw = jnp.asarray(yaw, jnp.float32)
    ex = jnp.asarray([1.0, 0.0, 0.0])
    ey = jnp.asarray([0.0, 1.0, 0.0])
    ez = jnp.asarray([0.0, 0.0, 1.0])
    qx = quat_from_axis_angle(ex, roll)
    qy = quat_from_axis_angle(ey, pitch)
    qz = quat_from_axis_angle(ez, yaw)
    return quat_mul(qz, quat_mul(qy, qx))


# ---------------------------------------------------------------------------
# compound (ball) joint angle composition — intrinsic X-Y'-Z''
# ---------------------------------------------------------------------------
# The joint-force kernel in the reference decomposes the parent->child
# rotation into three rotations whose instantaneous axes are
# x, Rx(a)·y, Rx(a)Ry(b)·z (reference: diffphys/integrator_euler.py:244-258
# quat_decompose + :411-439 JOINT_COMPOUND branch). That is the intrinsic
# X-Y'-Z'' convention with matrix M = Rx(a) @ Ry(b) @ Rz(c). We use the same
# convention for both FK composition and force-side decomposition so the two
# are exact inverses (verified by round-trip tests).

def compound_to_quat(angles: jax.Array) -> jax.Array:
    """(...,3) intrinsic XYZ angles -> quat xyzw with M = Rx(a) Ry(b) Rz(c)."""
    a, b, c = angles[..., 0], angles[..., 1], angles[..., 2]
    ex = jnp.asarray([1.0, 0.0, 0.0], angles.dtype)
    ey = jnp.asarray([0.0, 1.0, 0.0], angles.dtype)
    ez = jnp.asarray([0.0, 0.0, 1.0], angles.dtype)
    qx = quat_from_axis_angle(jnp.broadcast_to(ex, angles.shape), a)
    qy = quat_from_axis_angle(jnp.broadcast_to(ey, angles.shape), b)
    qz = quat_from_axis_angle(jnp.broadcast_to(ez, angles.shape), c)
    return quat_mul(qx, quat_mul(qy, qz))


def quat_to_compound(q: jax.Array) -> jax.Array:
    """Inverse of compound_to_quat: quat -> (a, b, c) intrinsic XYZ angles.

    For M = Rx(a) Ry(b) Rz(c):
      M[0,2] = sin(b);  M[1,2] = -sin(a)cos(b);  M[2,2] = cos(a)cos(b)
      M[0,1] = -cos(b)sin(c);  M[0,0] = cos(b)cos(c)
    Safe at the gimbal singularity (|b| = pi/2) via clamping.
    """
    m = quat_to_matrix(q)
    a = kernel_math.atan2(-m[..., 1, 2], m[..., 2, 2])
    b = kernel_math.asin(jnp.clip(m[..., 0, 2], -1.0 + 1e-7, 1.0 - 1e-7))
    c = kernel_math.atan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_twist(axis: jax.Array, q: jax.Array) -> jax.Array:
    """Twist component of q about `axis` (swing-twist decomposition).

    Mirrors the reference kernel helper (diffphys/integrator_euler.py:234-241).
    """
    a = q[..., :3]
    proj = jnp.sum(a * axis, axis=-1, keepdims=True) * axis
    tw = jnp.concatenate([proj, q[..., 3:4]], axis=-1)
    return quat_normalize(tw)


def quat_twist_angle(axis: jax.Array, q: jax.Array) -> jax.Array:
    """Signed rotation angle of q about `axis` via swing-twist.

    Equal to the reference's acos-based formula
    (diffphys/integrator_euler.py:397-400) but written with atan2, which is
    smooth with well-defined gradients at zero twist — the acos form has a
    gradient singularity at |w|=1 that the reference scrubs post-hoc.
    """
    s = jnp.sum(q[..., :3] * axis, axis=-1)
    return 2.0 * kernel_math.atan2(s, q[..., 3])


def rot_angle(m: jax.Array) -> jax.Array:
    """Rotation angle of rotation matrix(es), clamped like the reference
    (diffphys/geom_utils.py:37-46)."""
    eps = 1e-4
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) * 0.5
    cos = jnp.clip(cos, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)
