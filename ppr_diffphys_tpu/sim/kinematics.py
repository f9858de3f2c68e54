"""Forward kinematics: reduced coords -> maximal coords (pure JAX).

TPU-native replacement for ``warp.sim.articulation.eval_fk`` (used by the
reference at dp_model.py:1068 and :1204). Differences by design:

- pure function of traced inputs -> ``jax.grad`` flows through it natively
  (replaces the ``ForwardKinematics`` autograd bridge + wp.Tape adjoint,
  reference dp_model.py:1022-1130);
- arbitrary leading batch dims (env, time) via broadcasting — callers vmap
  or simply pass stacked arrays; no per-frame host loop;
- topology is trace-time constant (unrolled loop over the <=26 links), so
  XLA sees static gathers and fuses the whole chain.

State conventions (identical to the integrator):
- ``body_q``  (..., B, 7): world transform of the body origin, quat xyzw;
- ``body_qd`` (..., B, 6): warp layout [angular(world), linear(world, at the
  body COM)] — the linear part is the COM velocity, consistent with the
  symplectic Euler update (reference integrator_euler.py:61-65).

Generalized coordinates (warp layout, reference dp_model.py:1163-1171):
- ``joint_q``  (..., n_q): root [x,y,z,qx,qy,qz,qw] then per-joint angles;
- ``joint_qd`` (..., n_qd): root [wx,wy,wz,vx,vy,vz] then joint rates.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops import (
    quat_from_axis_angle,
    quat_mul,
    quat_normalize,
    quat_rotate,
    compound_to_quat,
    transform_mul,
    transform_point,
)
from .builder import (
    ArticulationModel,
    JOINT_COMPOUND,
    JOINT_FIXED,
    JOINT_FREE,
    JOINT_PRISMATIC,
    JOINT_REVOLUTE,
)


def eval_fk(
    model: ArticulationModel,
    joint_q: jnp.ndarray,
    joint_qd: Optional[jnp.ndarray] = None,
    joint_X_p: Optional[jnp.ndarray] = None,
    body_com: Optional[jnp.ndarray] = None,
):
    """Compute maximal-coordinate body states from generalized coordinates.

    Args:
      joint_q: (..., n_q)
      joint_qd: (..., n_qd) or None (velocities all zero)
      joint_X_p: optional traced override of per-joint parent anchor
        transforms (B, 7) — live-updated by the lab4d coupling layer
        (reference dp_interface.py:438-466 query_ja)
      body_com: optional traced override of body COM (B, 3)
    Returns:
      body_q (..., B, 7), body_qd (..., B, 6)
    """
    batch = joint_q.shape[:-1]
    if joint_qd is None:
        joint_qd = jnp.zeros(batch + (model.n_qd,), joint_q.dtype)

    X_p_all = (
        jnp.asarray(model.joint_X_p) if joint_X_p is None else joint_X_p
    )
    com_all = jnp.asarray(model.body_com) if body_com is None else body_com

    body_q = [None] * model.n_links
    body_w = [None] * model.n_links
    body_v = [None] * model.n_links
    zeros3 = jnp.zeros(batch + (3,), joint_q.dtype)

    for i in range(model.n_links):
        jtype = int(model.joint_type[i])
        parent = int(model.joint_parent[i])
        qs = int(model.joint_q_start[i])
        qds = int(model.joint_qd_start[i])
        axis = jnp.asarray(model.joint_axis[i])
        # X_p_all: (B, 7) static, or batch-broadcastable (..., B, 7) when
        # the lab4d layer live-overrides joint anchors (dp_interface
        # query_ja, reference dp_interface.py:438-466)
        X_pj = jnp.broadcast_to(X_p_all[..., i, :], batch + (7,))
        X_cj = jnp.asarray(model.joint_X_c[i])

        if parent >= 0:
            X_wj = transform_mul(body_q[parent], X_pj)
            w_p, v_p = body_w[parent], body_v[parent]
            com_p_w = transform_point(body_q[parent], com_all[parent])
        else:
            X_wj = X_pj
            w_p, v_p = zeros3, zeros3
            com_p_w = zeros3

        anchor_w = X_wj[..., 0:3]
        q_wj = X_wj[..., 3:7]

        if jtype == JOINT_FREE:
            xq = joint_q[..., qs : qs + 7]
            xq = jnp.concatenate(
                [xq[..., 0:3], quat_normalize(xq[..., 3:7])], axis=-1
            )
            X_wc = transform_mul(X_wj, xq)
            w = joint_qd[..., qds : qds + 3]
            v_com = joint_qd[..., qds + 3 : qds + 6]
            body_q[i], body_w[i], body_v[i] = X_wc, w, v_com
            continue

        if jtype == JOINT_FIXED:
            X_jc = None  # identity
            w_rel = zeros3
        elif jtype == JOINT_REVOLUTE:
            qi = joint_q[..., qs]
            X_jc = jnp.concatenate(
                [jnp.zeros(batch + (3,)), quat_from_axis_angle(axis, qi)], -1
            )
            w_rel = quat_rotate(q_wj, axis) * joint_qd[..., qds][..., None]
        elif jtype == JOINT_PRISMATIC:
            qi = joint_q[..., qs]
            X_jc = jnp.concatenate(
                [axis * qi[..., None], jnp.broadcast_to(jnp.array([0.0, 0, 0, 1.0]), batch + (4,))], -1
            )
            w_rel = zeros3
        elif jtype == JOINT_COMPOUND:
            angles = joint_q[..., qs : qs + 3]
            q_off = X_cj[3:7]
            q_rel = _compound_rel_quat(q_off, angles)
            X_jc = jnp.concatenate(
                [jnp.zeros(batch + (3,)), jnp.broadcast_to(q_rel, batch + (4,))], -1
            )
            # instantaneous axes of the intrinsic X-Y'-Z'' composition,
            # expressed in the (joint frame ∘ X_cj) frame
            a, b = angles[..., 0], angles[..., 1]
            ex = jnp.broadcast_to(jnp.array([1.0, 0, 0]), batch + (3,))
            q0 = quat_from_axis_angle(ex, a)
            ax1 = quat_rotate(q0, jnp.array([0.0, 1.0, 0.0]))
            q1 = quat_from_axis_angle(ax1, b)
            ax2 = quat_rotate(quat_mul(q1, q0), jnp.array([0.0, 0.0, 1.0]))
            w_local = (
                ex * joint_qd[..., qds][..., None]
                + ax1 * joint_qd[..., qds + 1][..., None]
                + ax2 * joint_qd[..., qds + 2][..., None]
            )
            q_w = quat_mul(q_wj, jnp.broadcast_to(q_off, batch + (4,)))
            w_rel = quat_rotate(q_w, w_local)
        else:
            raise ValueError(f"unknown joint type {jtype}")

        if X_jc is None:
            X_wc = X_wj
        else:
            X_wc = transform_mul(X_wj, X_jc)

        w_c = w_p + w_rel
        com_c_w = transform_point(X_wc, com_all[i])
        v_c = (
            v_p
            + jnp.cross(w_p, com_c_w - com_p_w)
            + jnp.cross(w_rel, com_c_w - anchor_w)
        )
        body_q[i], body_w[i], body_v[i] = X_wc, w_c, v_c

    body_q = jnp.stack(body_q, axis=-2)
    body_qd = jnp.concatenate(
        [jnp.stack(body_w, axis=-2), jnp.stack(body_v, axis=-2)], axis=-1
    )
    return body_q, body_qd


def _compound_rel_quat(q_off: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """q_off ∘ R_xyz(angles) ∘ q_off^-1 — the parent->child rotation that the
    joint-force kernel's decomposition (integrator.py) inverts exactly.
    q_off is identity for the URDF ball-joint convention (import_urdf.py),
    kept general anyway."""
    q_off_inv = q_off * jnp.asarray([-1.0, -1.0, -1.0, 1.0])
    return quat_mul(q_off, quat_mul(compound_to_quat(angles), q_off_inv))
