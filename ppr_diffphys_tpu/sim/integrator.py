"""Semi-implicit (symplectic) Euler integrator — TPU-native (pure JAX).

Re-design of the reference's three Warp CUDA kernels
(diffphys/integrator_euler.py: ``eval_body_contacts`` :93-179,
``eval_body_joints`` :289-451, ``integrate_bodies`` :21-91) as one fused,
fully vectorized step function:

- all quantities are batched over (env E, body B) — environments are a vmap
  axis, not replicated models;
- the reference's ``wp.atomic_add`` force scatters become **one-hot matmuls**
  with trace-time-constant 0/1 matrices: deterministic by construction (no
  atomics, SURVEY.md §5 race-detection note) and they run on the MXU;
- one ``jax.lax.scan`` drives the substep loop — the ~2,280 kernel launches
  + ~3,000 torch<->warp conversions per forward of the reference
  (dp_model.py:1209-1234) collapse into a single compiled program;
- gradients flow through ``jax.grad`` with per-frame ``jax.checkpoint``
  rematerialization, mirroring the reference's frame-boundary adjoint
  seeding (dp_model.py:1241-1246, :1264-1271);
- numerical-safety clamps are faithfully carried over: body velocity ±10
  (integrator_euler.py:77-88), contact force ±500 (:172-175), compound
  torque/attach ±10000 (:436-444), 0.1/s angular damping (:75), and the
  Coulomb-friction direction uses a safe normalize so the |vt|→0 gradient
  instability the reference scrubs post-hoc (:164-165) never produces NaNs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import (
    quat_inverse,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
    quat_from_axis_angle,
    quat_to_compound,
    transform_mul,
    transform_point,
)
from .builder import (
    ArticulationModel,
    JOINT_COMPOUND,
    JOINT_FIXED,
    JOINT_REVOLUTE,
)


class SimState(NamedTuple):
    """Maximal-coordinate state, batched over envs (replaces wp.sim.State)."""

    body_q: jnp.ndarray  # (E, B, 7) world transform of body origin, quat xyzw
    body_qd: jnp.ndarray  # (E, B, 6) [angular(world), linear(world @ COM)]


class SimParams(NamedTuple):
    """Differentiable simulation parameters (traced jax inputs).

    These are the quantities the reference pushes through the warp tape every
    forward (dp_model.py:723-746, :1196-1201): per-body mass/inertia, per-dof
    PD gains, plus the joint anchor transforms that the lab4d coupling layer
    live-updates (dp_interface.py:438-466).
    """

    body_mass: jnp.ndarray  # (B,)
    body_inv_mass: jnp.ndarray  # (B,)
    body_inertia: jnp.ndarray  # (B, 3, 3) body-frame, about COM
    body_inv_inertia: jnp.ndarray  # (B, 3, 3)
    joint_target_ke: jnp.ndarray  # (n_qd,)
    joint_target_kd: jnp.ndarray  # (n_qd,)
    joint_X_p: Optional[jnp.ndarray] = None  # (B, 7) override or None
    body_com: Optional[jnp.ndarray] = None  # (B, 3) override or None


def default_sim_params(model: ArticulationModel) -> SimParams:
    inertia = jnp.asarray(model.body_inertia)
    return SimParams(
        body_mass=jnp.asarray(model.body_mass),
        body_inv_mass=1.0 / jnp.asarray(model.body_mass),
        body_inertia=inertia,
        body_inv_inertia=jnp.linalg.inv(inertia),
        joint_target_ke=jnp.asarray(model.joint_target_ke),
        joint_target_kd=jnp.asarray(model.joint_target_kd),
    )


# ---------------------------------------------------------------------------
# force evaluation
# ---------------------------------------------------------------------------

def _matmul_vjp_gather(idx, onehot):
    """Row gather ``x[:, idx]`` whose backward is a one-hot matmul.

    The autodiff of a plain advanced-index gather is a scatter-add, which
    XLA:TPU serializes over duplicate indices — catastrophic inside the
    substep loop (the contact gather has thousands of rows per body). The
    matmul transpose runs on the MXU and is deterministic.

    idx: (N,) numpy constant; onehot: (N, B) constant with onehot[n, idx[n]]=1.
    """
    oh = jnp.asarray(onehot)

    @jax.custom_vjp
    def gather(x):
        return x[:, idx]

    def fwd(x):
        return x[:, idx], x.shape

    def bwd(shape, ct):
        # ct: (E, N, k) -> (E, B, k)
        return (jnp.einsum("nb,enk->ebk", oh, ct),)

    gather.defvjp(fwd, bwd)
    return gather


def _matmul_vjp_gather_1d(idx_flat, onehot, out_shape):
    """Per-dof gather ``p[idx]``/(E,n)->(E,...) with matmul backward.

    idx_flat: (M,) flat indices into the last axis; onehot: (M, n).
    Works for both (n,) parameter vectors and (E, n) batched vectors.
    """
    oh = jnp.asarray(onehot)

    @jax.custom_vjp
    def gather(x):
        return x[..., idx_flat].reshape(x.shape[:-1] + out_shape)

    def fwd(x):
        return gather(x), None

    def bwd(_, ct):
        ctf = ct.reshape(ct.shape[: ct.ndim - len(out_shape)] + (-1,))
        return (jnp.einsum("mn,...m->...n", oh, ctf),)

    gather.defvjp(fwd, bwd)
    return gather


def _col(x, k):
    """x[..., k] as an explicit slice (integer-index gathers do not lower
    in Mosaic)."""
    return jax.lax.index_in_dim(x, k, axis=x.ndim - 1, keepdims=False)


def _eval_joint_force(q, qd, target, ke, kd, act, lo, hi, limit_ke, limit_kd):
    """Scalar PD + limit law (reference integrator_euler.py:261-286).

    Returns the force *magnitude*; caller multiplies by the world axis.
    """
    below = q < lo
    above = q > hi
    limit_f = jnp.where(below, limit_ke * (lo - q) - limit_kd * jnp.minimum(qd, 0.0), 0.0)
    limit_f = jnp.where(above, limit_ke * (hi - q) - limit_kd * jnp.maximum(qd, 0.0), limit_f)
    return ke * (q - target) + kd * qd + act - limit_f


def eval_body_contacts(
    model: ArticulationModel,
    params: SimParams,
    state: SimState,
    scatter_contact: jnp.ndarray,  # (B, C) one-hot, trace-time constant
    gather_contact=None,  # matmul-VJP row gather C<-B (from the integrator)
):
    """Penalty ground contact, vectorized over (E, C).

    Mirrors eval_body_contacts (reference integrator_euler.py:93-179):
    normal spring fn = c*ke, damping fd = min(vn,0)*kd while penetrating,
    smooth Coulomb friction capped at -mu*(fn+fd), force clamp ±500,
    accumulated onto bodies with the *minus* sign of the reference's
    atomic_sub.
    Returns (E, B, 6) force contribution in [torque, force] layout.
    """
    cbody = model.contact_body  # (C,) numpy constant
    cpoint = jnp.asarray(model.contact_point)  # (C, 3)
    cdist = jnp.asarray(model.contact_dist)  # (C,)
    cmat = jnp.asarray(model.contact_material)  # (C, 4) ke kd kf mu

    com = params.body_com if params.body_com is not None else jnp.asarray(model.body_com)

    if gather_contact is None:
        X = state.body_q[:, cbody]  # (E, C, 7)
        wv = state.body_qd[:, cbody]
    else:
        X = gather_contact(state.body_q)
        wv = gather_contact(state.body_qd)
    w = wv[..., 0:3]
    v = wv[..., 3:6]

    n = jnp.array([0.0, 1.0, 0.0])
    cp = transform_point(X, cpoint) - n * cdist[..., None]
    r = cp - transform_point(X, com[cbody])
    dpdt = v + jnp.cross(w, r)

    c = cp[..., 1]  # dot(n, cp)
    active = (c < 0.0).astype(cp.dtype)[..., None]

    ke, kd, kf, mu = cmat[..., 0], cmat[..., 1], cmat[..., 2], cmat[..., 3]
    vn = dpdt[..., 1]
    vt = dpdt - n * vn[..., None]

    fn = c * ke
    fd = jnp.minimum(vn, 0.0) * kd  # only applied while penetrating (step(c))

    vt_len = jnp.sqrt(jnp.sum(vt * vt, -1) + 1e-12)
    ft_mag = jnp.minimum(kf * vt_len, -mu * (fn + fd))
    ft = vt / vt_len[..., None] * ft_mag[..., None]

    f_total = (n * (fn + fd)[..., None] + ft) * active
    f_total = jnp.clip(f_total, -500.0, 500.0)
    t_total = jnp.cross(r, f_total)

    tf = -jnp.concatenate([t_total, f_total], axis=-1)  # atomic_sub sign
    # scatter C -> B with a constant one-hot matmul (MXU, deterministic)
    return jnp.einsum("bc,ecx->ebx", scatter_contact, tf)


def eval_body_joints(model: ArticulationModel, params: SimParams, state: SimState,
                     joint_target: jnp.ndarray, joint_act: jnp.ndarray,
                     scatter_parent: jnp.ndarray,
                     gather_parent=None, gather_dof=None):
    """Joint PD + limit + attachment-spring forces, vectorized over (E, B).

    Mirrors eval_body_joints (reference integrator_euler.py:289-451). Joint i
    connects parent[i] -> body i; FREE roots contribute nothing. The
    attachment springs are what holds the maximal-coordinate articulation
    together (SURVEY.md §1 load-bearing fact).

    joint_target/joint_act: (E, n_qd).
    Returns (E, B, 6) accumulated [torque, force].
    """
    E, B = state.body_q.shape[0], model.n_links
    jt = model.joint_type  # numpy constants
    parent = model.joint_parent
    com = params.body_com if params.body_com is not None else jnp.asarray(model.body_com)
    X_p_all = params.joint_X_p if params.joint_X_p is not None else jnp.asarray(model.joint_X_p)

    # --- per-body gathered quantities (parent of root := root itself, masked)
    parent_safe = np.where(parent >= 0, parent, 0)
    has_parent = jnp.asarray((parent >= 0).astype(np.float32))[None, :, None]

    if gather_parent is None:
        pq = state.body_q[:, parent_safe]
        pqd = state.body_qd[:, parent_safe]
    else:
        pq = gather_parent(state.body_q)
        pqd = gather_parent(state.body_qd)

    # X_p_all: (B,7) static or (E,B,7) when live-overridden (lab4d query_ja)
    X_p_b = X_p_all if X_p_all.ndim == 3 else X_p_all[None, :, :]
    X_wp = transform_mul(pq, X_p_b)
    # bodies with no parent: X_wp = X_pj alone (reference :317-321)
    X_wp = has_parent * X_wp + (1.0 - has_parent) * jnp.broadcast_to(X_p_b, (E, B, 7))

    # parent COMs: fold the gather into numpy when com is static (keeps the
    # pallas kernel free of gathers)
    if params.body_com is None:
        com_p = jnp.asarray(model.body_com[parent_safe])
    else:
        com_p = com[parent_safe]
    r_p = X_wp[..., 0:3] - transform_point(pq, com_p)
    r_p = r_p * has_parent
    w_p = pqd[..., 0:3] * has_parent
    v_p = pqd[..., 3:6] * has_parent

    X_wc = state.body_q  # (E, B, 7) — X_cj not applied (reference :337)
    r_c = X_wc[..., 0:3] - transform_point(state.body_q, com)
    w_c = state.body_qd[..., 0:3]
    v_c = state.body_qd[..., 3:6]

    x_err = X_wc[..., 0:3] - X_wp[..., 0:3]
    q_p = X_wp[..., 3:7]
    q_c = X_wc[..., 3:7]
    r_err = quat_mul(quat_inverse(q_p), q_c)
    v_err = v_c - v_p
    w_err = w_c - w_p

    attach_ke = model.joint_attach_ke
    attach_kd = model.joint_attach_kd
    ang_damp = 0.01  # angular_damping_scale (reference :379)

    # per-body dof gathers: every joint reads up to 3 dofs starting at
    # qd_start (revolute uses dof 0 only); static index matrix
    dof_idx = np.clip(
        model.joint_qd_start[:, None] + np.arange(3)[None, :], 0, model.n_qd - 1
    )  # (B, 3)
    if gather_dof is None:
        tgt = joint_target[:, dof_idx]  # (E, B, 3)
        act = joint_act[:, dof_idx]
        # gains may be (n_qd,) shared or (E, n_qd) per-env (system-ID sweeps)
        ke3 = params.joint_target_ke[..., dof_idx]  # (B,3) or (E,B,3)
        kd3 = params.joint_target_kd[..., dof_idx]
    else:
        tgt = gather_dof(joint_target)
        act = gather_dof(joint_act)
        ke3 = gather_dof(params.joint_target_ke)
        kd3 = gather_dof(params.joint_target_kd)
    # limit constants gathered in numpy at trace time (keeps them out of
    # the compiled program — required for the pallas kernel path)
    lo3 = jnp.asarray(model.joint_limit_lower[dof_idx])
    hi3 = jnp.asarray(model.joint_limit_upper[dof_idx])
    lke3 = jnp.asarray(model.joint_limit_ke[dof_idx])
    lkd3 = jnp.asarray(model.joint_limit_kd[dof_idx])

    t_total = jnp.zeros((E, B, 3))
    f_total = jnp.zeros((E, B, 3))

    # masks per joint type (trace-time constants)
    m_fixed = jnp.asarray((jt == JOINT_FIXED).astype(np.float32))[None, :, None]
    m_rev = jnp.asarray((jt == JOINT_REVOLUTE).astype(np.float32))[None, :, None]
    m_cmp = jnp.asarray((jt == JOINT_COMPOUND).astype(np.float32))[None, :, None]

    # ---- FIXED (reference :385-390; axis-angle via the Taylor-safe
    # conversion instead of normalize+acos, same value, smooth gradient)
    if (jt == JOINT_FIXED).any():
        from ..ops import quat_to_axis_angle

        ang_err = quat_to_axis_angle(r_err)
        f_fix = x_err * attach_ke + v_err * attach_kd
        t_fix = quat_rotate(q_p, ang_err) * attach_ke + w_err * attach_kd * ang_damp
        f_total = f_total + m_fixed * f_fix
        t_total = t_total + m_fixed * t_fix

    # ---- REVOLUTE (reference :392-409)
    if (jt == JOINT_REVOLUTE).any():
        axis = jnp.asarray(model.joint_axis)  # (B, 3)
        axis_p = quat_rotate(q_p, axis[None])
        axis_c = quat_rotate(q_c, axis[None])
        # swing-twist angle, atan2 form (smooth; equals the reference's
        # acos*sign at :397-400 without its gradient singularity at w=1)
        from ..ops import kernel_math

        s_tw = jnp.sum(r_err[..., :3] * axis[None], -1)
        q_ang = 2.0 * kernel_math.atan2(s_tw, r_err[..., 3])
        qd_ang = jnp.sum(w_err * axis_p, -1)

        _g = lambda x, k: _col(x, k) if x.ndim == 3 else _col(x, k)[None]
        fmag = _eval_joint_force(
            q_ang, qd_ang, _col(tgt, 0), _g(ke3, 0), _g(kd3, 0),
            _col(act, 0), _col(lo3, 0)[None], _col(hi3, 0)[None],
            _col(lke3, 0)[None], _col(lkd3, 0)[None],
        )
        t_rev = fmag[..., None] * axis_p
        swing_err = jnp.cross(axis_p, axis_c)
        f_rev = x_err * attach_ke + v_err * attach_kd
        t_rev = t_rev + swing_err * attach_ke + (
            w_err - qd_ang[..., None] * axis_p
        ) * attach_kd * ang_damp
        f_total = f_total + m_rev * f_rev
        t_total = t_total + m_rev * t_rev

    # ---- COMPOUND (reference :411-445)
    if (jt == JOINT_COMPOUND).any():
        q_off = jnp.asarray(model.joint_X_c)[None, :, 3:7]  # (1, B, 4)
        q_pc = quat_mul(
            quat_mul(quat_inverse(q_off), quat_mul(quat_inverse(q_p), q_c)), q_off
        )
        angles = quat_to_compound(q_pc)  # (E, B, 3) intrinsic XYZ

        ex = jnp.array([1.0, 0.0, 0.0])
        q0 = quat_from_axis_angle(jnp.broadcast_to(ex, angles.shape), angles[..., 0])
        ax1 = quat_rotate(q0, jnp.array([0.0, 1.0, 0.0]))
        q1 = quat_from_axis_angle(ax1, angles[..., 1])
        ax2 = quat_rotate(quat_mul(q1, q0), jnp.array([0.0, 0.0, 1.0]))

        q_w = quat_mul(q_p, q_off)
        t_cmp = jnp.zeros_like(t_total)
        for k, ax in enumerate([jnp.broadcast_to(ex, angles.shape), ax1, ax2]):
            ax_w = quat_rotate(q_w, ax)
            _g = lambda x, kk: _col(x, kk) if x.ndim == 3 else _col(x, kk)[None]
            fmag = _eval_joint_force(
                _col(angles, k), jnp.sum(ax_w * w_err, -1),
                _col(tgt, k), _g(ke3, k), _g(kd3, k), _col(act, k),
                _col(lo3, k)[None], _col(hi3, k)[None],
                _col(lke3, k)[None], _col(lkd3, k)[None],
            )
            t_cmp = t_cmp + fmag[..., None] * ax_w
        t_cmp = jnp.clip(t_cmp, -10000.0, 10000.0)
        f_cmp = jnp.clip(x_err * attach_ke + v_err * attach_kd, -10000.0, 10000.0)
        f_total = f_total + m_cmp * f_cmp
        t_total = t_total + m_cmp * t_cmp

    # ---- scatter to bodies (reference :448-451)
    child_tf = -jnp.concatenate([t_total + jnp.cross(r_c, f_total), f_total], -1)
    parent_tf = jnp.concatenate([t_total + jnp.cross(r_p, f_total), f_total], -1)
    parent_tf = parent_tf * has_parent
    return child_tf + jnp.einsum("pb,ebx->epx", scatter_parent, parent_tf)


def integrate_bodies(
    model: ArticulationModel, params: SimParams, state: SimState,
    body_f: jnp.ndarray, dt: float,
) -> SimState:
    """Symplectic Euler update, vectorized (reference integrator_euler.py:21-91)."""
    com = params.body_com if params.body_com is not None else jnp.asarray(model.body_com)
    x0 = state.body_q[..., 0:3]
    r0 = state.body_q[..., 3:7]
    w0 = state.body_qd[..., 0:3]
    v0 = state.body_qd[..., 3:6]
    t0 = body_f[..., 0:3]
    f0 = body_f[..., 3:6]

    # (B,) shared or (E, B) per-env (system-ID sweeps)
    inv_m = params.body_inv_mass[..., None]
    if inv_m.ndim == 2:
        inv_m = inv_m[None]
    gravity = jnp.asarray(model.gravity)

    x_com = x0 + quat_rotate(r0, com[None])

    # linear part (gravity gated on finite mass — wp.nonzero(inv_mass))
    v1 = v0 + (f0 * inv_m + gravity * jnp.sign(inv_m)) * dt
    x1 = x_com + v1 * dt

    # angular part in body frame with gyroscopic term. The 3x3 inertia
    # matvecs are written as broadcast multiply-sums: they are tiny, and
    # Mosaic's matmul cannot lower the unequal (B,·)x(E,B,·) batch dims.
    def _matvec33(M, x):  # (B,3,3) or (E,B,3,3) @ (E,B,3) -> (E,B,3)
        if M.ndim == 3:
            M = M[None]
        return jnp.sum(M * x[:, :, None, :], axis=-1)

    wb = quat_rotate_inv(r0, w0)
    tb = quat_rotate_inv(r0, t0) - jnp.cross(wb, _matvec33(params.body_inertia, wb))
    w1 = quat_rotate(r0, wb + _matvec33(params.body_inv_inertia, tb) * dt)
    # dr = 0.5*dt * quat(w1, 0) * r0  (pre-damping w1, reference order :72-75)
    w1_quat = jnp.concatenate([w1, jnp.zeros_like(w1[..., :1])], -1)
    r1 = quat_normalize(r0 + 0.5 * dt * quat_mul(w1_quat, r0))

    w1 = w1 * (1.0 - 0.1 * dt)
    w1 = jnp.clip(w1, -10.0, 10.0)
    v1 = jnp.clip(v1, -10.0, 10.0)

    body_q_new = jnp.concatenate([x1 - quat_rotate(r1, com[None]), r1], -1)
    body_qd_new = jnp.concatenate([w1, v1], -1)
    return SimState(body_q_new, body_qd_new)


# ---------------------------------------------------------------------------
# the fused step + rollout
# ---------------------------------------------------------------------------

class SemiImplicitIntegrator:
    """Drop-in named equivalent of the reference integrator class
    (integrator_euler.py:553-620); holds the trace-time scatter constants."""

    def __init__(self, model: ArticulationModel):
        self.model = model
        B = model.n_links
        parent = model.joint_parent
        sp = np.zeros((B, B), np.float32)
        for i in range(B):
            if parent[i] >= 0:
                sp[parent[i], i] = 1.0
        self.scatter_parent = jnp.asarray(sp)

        # gathers with matmul-backed VJPs (see _matmul_vjp_gather)
        parent_safe = np.where(parent >= 0, parent, 0)
        oh_p = np.zeros((B, B), np.float32)
        oh_p[np.arange(B), parent_safe] = 1.0
        self.gather_parent = _matmul_vjp_gather(parent_safe, oh_p)

        dof_idx = np.clip(
            model.joint_qd_start[:, None] + np.arange(3)[None, :], 0, model.n_qd - 1
        )
        flat = dof_idx.reshape(-1)
        oh_d = np.zeros((len(flat), model.n_qd), np.float32)
        oh_d[np.arange(len(flat)), flat] = 1.0
        self.gather_dof = _matmul_vjp_gather_1d(flat, oh_d, (B, 3))

        if model.contact_count > 0:
            sc = np.zeros((B, model.contact_count), np.float32)
            sc[model.contact_body, np.arange(model.contact_count)] = 1.0
            self.scatter_contact = jnp.asarray(sc)
            oh_c = np.ascontiguousarray(sc.T)
            self.gather_contact = _matmul_vjp_gather(model.contact_body, oh_c)
        else:
            self.scatter_contact = None
            self.gather_contact = None

    def compute_forces(self, params, state, joint_target, joint_act, res_f):
        """Returns (body_f, grf, jaf) with the reference's observable
        semantics (integrator_euler.py:491-551): grf is the accumulated
        force after contacts (incl. residual forces), jaf the joint-only
        increment."""
        model = self.model
        body_f = res_f
        if self.scatter_contact is not None and model.ground:
            body_f = body_f + eval_body_contacts(
                model, params, state, self.scatter_contact, self.gather_contact
            )
        grf = body_f
        body_f = body_f + eval_body_joints(
            model, params, state, joint_target, joint_act, self.scatter_parent,
            self.gather_parent, self.gather_dof,
        )
        jaf = body_f - grf
        return body_f, grf, jaf

    def simulate(self, params, state, joint_target, joint_act, res_f, dt):
        """One substep: forces + integration. All inputs traced."""
        body_f, grf, jaf = self.compute_forces(
            params, state, joint_target, joint_act, res_f
        )
        new_state = integrate_bodies(self.model, params, state, body_f, dt)
        return new_state, grf, jaf

    def step_only(self, params, state, joint_target, joint_act, res_f, dt):
        """Substep without observables (cheaper inner loop)."""
        model = self.model
        body_f = res_f
        if self.scatter_contact is not None and model.ground:
            body_f = body_f + eval_body_contacts(
                model, params, state, self.scatter_contact, self.gather_contact
            )
        body_f = body_f + eval_body_joints(
            model, params, state, joint_target, joint_act, self.scatter_parent,
            self.gather_parent, self.gather_dof,
        )
        return integrate_bodies(self.model, params, state, body_f, dt)


def rollout(
    integrator: SemiImplicitIntegrator,
    params: SimParams,
    state0: SimState,
    joint_targets: jnp.ndarray,  # (S, E, n_qd)
    joint_acts: jnp.ndarray,  # (S, E, n_qd)
    res_f: jnp.ndarray,  # (S, E, B, 6) warp layout
    dt: float,
    substeps_per_frame: int,
    use_remat: bool = True,
    unroll: int = 4,
):
    """Simulate S = substeps_per_frame*(F-1)+1 substeps, collecting state and
    force observables at the F frame boundaries.

    Mirrors the reference hot loop (dp_model.py:1204-1248): states are
    recorded at frame boundaries *before* that boundary's substep executes,
    and grf/jaf observables are taken from the boundary substep itself.

    Returns (body_q (F,E,B,7), body_qd (F,E,B,6), grf (F,E,B,6), jaf (F,E,B,6)).
    """
    S = joint_targets.shape[0]
    sub = substeps_per_frame
    n_intervals = (S - 1) // sub
    assert S == n_intervals * sub + 1, (S, sub)

    # substep-level remat: the backward pass stores only the carried state
    # per substep (KBs) and recomputes the force pipeline, instead of
    # saving the (E, n_contacts, ...) force intermediates (MBs/substep)
    # that otherwise dominate HBM traffic
    step_fn = lambda s, t, a, r: integrator.step_only(params, s, t, a, r, dt)
    if use_remat:
        step_fn = jax.checkpoint(step_fn)

    def interval(state, inputs):
        tgt_i, act_i, rf_i = inputs  # each (sub, ...)
        frame_state = state
        # observables of the boundary substep (first of the interval)
        state, grf, jaf = integrator.simulate(
            params, state, tgt_i[0], act_i[0], rf_i[0], dt
        )

        def inner(s, x):
            t, a, r = x
            return step_fn(s, t, a, r), None

        state, _ = jax.lax.scan(
            inner, state, (tgt_i[1:], act_i[1:], rf_i[1:]), unroll=unroll
        )
        return state, (frame_state.body_q, frame_state.body_qd, grf, jaf)

    if use_remat:
        interval = jax.checkpoint(interval)

    shaped = lambda x: x[: n_intervals * sub].reshape(
        (n_intervals, sub) + x.shape[1:]
    )
    last_state, (q_frames, qd_frames, grfs, jafs) = jax.lax.scan(
        interval,
        state0,
        (shaped(joint_targets), shaped(joint_acts), shaped(res_f)),
    )
    # final frame: state before the last substep + its observables
    _, grf_l, jaf_l = integrator.simulate(
        params, last_state, joint_targets[-1], joint_acts[-1], res_f[-1], dt
    )
    body_q = jnp.concatenate([q_frames, last_state.body_q[None]], 0)
    body_qd = jnp.concatenate([qd_frames, last_state.body_qd[None]], 0)
    grfs = jnp.concatenate([grfs, grf_l[None]], 0)
    jafs = jnp.concatenate([jafs, jaf_l[None]], 0)
    return body_q, body_qd, grfs, jafs
