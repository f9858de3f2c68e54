"""Pallas TPU megakernel: a whole rollout interval fused in VMEM.

The XLA scan path (integrator.rollout) materializes the per-substep
(E, n_contacts, ·) force intermediates in HBM; at large env counts that
traffic bounds throughput. This kernel keeps the state and all
intermediates resident in VMEM for S substeps at a time:

- grid over env tiles (E_TILE envs per program);
- the substep body *reuses the exact jnp force/integration functions* from
  integrator.py traced into the kernel (single source of truth — the
  equivalence test in tests/test_pallas.py pins the two paths together);
- gathers are expressed as one-hot matmuls (Mosaic-friendly; no dynamic
  gathers in-kernel);
- control targets for all S substeps are staged in VMEM per tile.

Used by the benchmark / inference rollouts (forward path). Training keeps
the XLA+autodiff path; both share the same math by construction.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import (
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_rotate_inv,
    transform_point,
)
from .builder import ArticulationModel
from .integrator import (
    SimParams,
    SimState,
    SemiImplicitIntegrator,
    eval_body_joints,
)


def _contact_forces_onehot(model, params, state, scatter_contact, gather_oh):
    """Contact forces with matmul gathers only (kernel-safe variant of
    eval_body_contacts; same math, reference integrator_euler.py:93-179)."""
    cpoint = jnp.asarray(model.contact_point)
    cdist = jnp.asarray(model.contact_dist)
    cmat = jnp.asarray(model.contact_material)
    com = jnp.asarray(model.body_com)
    com_c = jnp.asarray(model.body_com[model.contact_body])

    # gathers as one-hot matmuls: (C,B) @ (E,B,k) -> (E,C,k)
    X = jnp.einsum("cb,ebk->eck", gather_oh, state.body_q)
    wv = jnp.einsum("cb,ebk->eck", gather_oh, state.body_qd)
    w, v = wv[..., 0:3], wv[..., 3:6]

    n = jnp.array([0.0, 1.0, 0.0])
    cp = transform_point(X, cpoint) - n * cdist[..., None]
    r = cp - transform_point(X, com_c)
    dpdt = v + jnp.cross(w, r)

    c = cp[..., 1]
    active = (c < 0.0).astype(cp.dtype)[..., None]
    ke, kd, kf, mu = cmat[..., 0], cmat[..., 1], cmat[..., 2], cmat[..., 3]
    vn = dpdt[..., 1]
    vt = dpdt - n * vn[..., None]
    fn = c * ke
    fd = jnp.minimum(vn, 0.0) * kd
    vt_len = jnp.sqrt(jnp.sum(vt * vt, -1) + 1e-12)
    ft = vt / vt_len[..., None] * jnp.minimum(kf * vt_len, -mu * (fn + fd))[..., None]
    f_total = jnp.clip((n * (fn + fd)[..., None] + ft) * active, -500.0, 500.0)
    t_total = jnp.cross(r, f_total)
    tf = -jnp.concatenate([t_total, f_total], axis=-1)
    return jnp.einsum("bc,ecx->ebx", scatter_contact, tf)


def build_interval_kernel(
    integrator: SemiImplicitIntegrator,
    params: SimParams,
    dt: float,
    substeps: int,
    e_tile: int = 8,
):
    """Returns f(state, joint_target (S,E,n_qd), joint_act (S,E,n_qd)) ->
    state after `substeps` steps, running as one pallas kernel per env
    tile. Residual forces are assumed zero (they are zeroed in the model,
    reference dp_model.py:529/:536); use the XLA path otherwise."""
    model = integrator.model
    B = model.n_links
    n_qd = model.n_qd
    gather_oh = np.zeros((model.contact_count, B), np.float32)
    gather_oh[np.arange(model.contact_count), model.contact_body] = 1.0
    gather_oh = jnp.asarray(gather_oh)

    # in-kernel gathers must be matmuls (Mosaic supports only 2D gathers)
    parent_safe = np.where(model.joint_parent >= 0, model.joint_parent, 0)
    oh_p = np.zeros((B, B), np.float32)
    oh_p[np.arange(B), parent_safe] = 1.0
    oh_p = jnp.asarray(oh_p)
    gather_parent_mm = lambda x: jnp.einsum("nb,ebk->enk", oh_p, x)

    dof_idx = np.clip(
        model.joint_qd_start[:, None] + np.arange(3)[None, :], 0, n_qd - 1
    ).reshape(-1)
    oh_d = np.zeros((len(dof_idx), n_qd), np.float32)
    oh_d[np.arange(len(dof_idx)), dof_idx] = 1.0
    oh_d = jnp.asarray(oh_d)

    def gather_dof_mm(x):
        out = jnp.einsum("mn,...n->...m", oh_d, x)
        return out.reshape(x.shape[:-1] + (B, 3))

    def substep(state, tgt, act):
        body_f = _contact_forces_onehot(
            model, params, state, integrator.scatter_contact, gather_oh
        )
        body_f = body_f + eval_body_joints(
            model, params, state, tgt, act, integrator.scatter_parent,
            gather_parent_mm, gather_dof_mm,
        )
        from .integrator import integrate_bodies

        return integrate_bodies(model, params, state, body_f, dt)

    # ---- lift trace-time constants into explicit kernel inputs ----------
    # pallas kernels may not capture array constants; closure_convert turns
    # `substep` into a pure function + the list of constants it closed over
    def substep_flat(q, qd, tgt, act):
        st = substep(SimState(q, qd), tgt, act)
        return st.body_q, st.body_qd

    q_aval = jax.ShapeDtypeStruct((e_tile, B, 7), jnp.float32)
    qd_aval = jax.ShapeDtypeStruct((e_tile, B, 6), jnp.float32)
    u_aval = jax.ShapeDtypeStruct((e_tile, n_qd), jnp.float32)
    closed = jax.make_jaxpr(substep_flat)(q_aval, qd_aval, u_aval, u_aval)
    consts = [jnp.asarray(c) for c in closed.consts]

    def pure_fn(q, qd, tgt, act, *cvals):
        return jax.core.eval_jaxpr(closed.jaxpr, list(cvals), q, qd, tgt, act)

    # Mosaic VMEM wants numeric dtypes; ship bools as int8 and restore
    const_dtypes = [c.dtype for c in consts]
    consts_in = [
        c.astype(jnp.int8) if c.dtype == jnp.bool_ else c for c in consts
    ]

    def kernel(q_ref, qd_ref, tgt_ref, act_ref, *rest):
        const_refs = rest[:-2]
        out_q_ref, out_qd_ref = rest[-2:]
        cvals = [
            r[:].astype(jnp.bool_) if d == jnp.bool_ else r[:]
            for r, d in zip(const_refs, const_dtypes)
        ]

        def body(i, carry):
            q, qd = carry
            return tuple(pure_fn(q, qd, tgt_ref[i], act_ref[i], *cvals))

        q, qd = jax.lax.fori_loop(
            0, substeps, body, (q_ref[:], qd_ref[:])
        )
        out_q_ref[:] = q
        out_qd_ref[:] = qd

    def _full_spec(c):
        return pl.BlockSpec(
            c.shape, lambda i: (0,) * c.ndim, memory_space=pltpu.VMEM
        )

    def run(state: SimState, joint_targets, joint_acts):
        E = state.body_q.shape[0]
        assert E % e_tile == 0, (E, e_tile)
        grid = (E // e_tile,)
        out_shapes = (
            jax.ShapeDtypeStruct((E, B, 7), jnp.float32),
            jax.ShapeDtypeStruct((E, B, 6), jnp.float32),
        )
        q, qd = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((e_tile, B, 7), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_tile, B, 6), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((substeps, e_tile, n_qd), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((substeps, e_tile, n_qd), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ] + [_full_spec(c) for c in consts_in],
            out_specs=(
                pl.BlockSpec((e_tile, B, 7), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((e_tile, B, 6), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=out_shapes,
        )(state.body_q, state.body_qd, joint_targets, joint_acts, *consts_in)
        return SimState(q, qd)

    return run
