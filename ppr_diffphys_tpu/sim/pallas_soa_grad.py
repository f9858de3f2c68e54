"""Differentiable Pallas SoA rollout — custom-VJP frame-interval kernels.

Training counterpart of the forward-only megakernel (pallas_soa.py). One
frame interval (``substeps`` symplectic-Euler substeps) runs as a single
``pallas_call``; its backward is a second Pallas kernel that re-runs the
forward sweep with every substep state resident in VMEM scratch, then
reverse-sweeps ``jax.vjp`` of the plane-layout substep — the adjoint
chain the reference drives through ``wp.Tape.backward`` per CUDA kernel
launch (dp_model.py:1251-1400) collapses into one on-chip program with
zero HBM traffic between substeps.

Gradients flow to: initial state, per-substep joint targets / activations
/ residual body forces, and the four traced parameter planes (PD gains,
inverse mass, inertia, inverse inertia) — i.e. everything the reference's
``ForwardWarp.backward`` scrubs and returns (dp_model.py:1294-1384).
Frame intervals are chained by ``lax.scan`` at the JAX level
(:func:`rollout_soa`), so reverse-AD across intervals stores only the
frame-boundary states — the same memory shape as the XLA path's
per-interval ``jax.checkpoint`` (integrator.py rollout).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .integrator import SemiImplicitIntegrator, SimState
from .pallas_soa import (
    TRACED_NAMES, VMEM_LIMIT, XP_NAMES, build_soa_static, load_consts,
    pick_tile, traced_planes,
)

F32 = jnp.float32

# VMEM_LIMIT rationale: Mosaic's default scoped-VMEM cap is 16 MB — a
# compiler default, not the hardware (v5e: 128 MB/core). The big-robot
# backward kernels' per-substep vjp temporaries alone exceed 16 MB (quad
# B=26: 16.3 MB scoped measured even at 16 substeps, 2026-08-17), so the
# SoA kernels raise the cap.


def _params(interpret: bool, vmem_limit_bytes: int):
    if interpret:  # CompilerParams are Mosaic-only
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_bytes)


def pick_residuals_mode(
    S, B, n_qd, e_tile, *,
    residuals: str = "auto",
    with_res: bool = False,
    with_act: bool = False,
    with_xp: bool = False,
    contacts_flat: int = 0,
    vmem_limit_bytes: int = VMEM_LIMIT,
) -> str:
    """Resolve the backward residuals mode make_diff_interval will use:
    the cheapest of resid > rows > plain whose backward VMEM estimate
    fits the budget at the GIVEN e_tile (tile choice stays with the
    measured pick_e_tile policy and is never shrunk to afford a mode).
    'auto' honors the PPR_SOA_RESIDUALS env override (HW bench switch).
    Exposed so bench/adjudication artifacts can RECORD the picked mode
    alongside their measurements."""
    if residuals == "auto":
        residuals = os.environ.get("PPR_SOA_RESIDUALS", "auto")
    if residuals == "auto":
        budget = vmem_limit_bytes - 12 * 2 ** 20
        kw = dict(
            with_res=with_res, with_act=with_act, with_xp=with_xp,
            contacts_flat=contacts_flat,
        )
        if estimate_interval_vmem(
            S, B, n_qd, e_tile, residuals="resid", **kw
        ) <= budget:
            residuals = "resid"
        elif estimate_interval_vmem(
            S, B, n_qd, e_tile, residuals="rows", **kw
        ) <= budget:
            residuals = "rows"
        else:
            residuals = "plain"
    assert residuals in ("resid", "rows", "plain"), residuals
    return residuals


def make_diff_interval(
    integrator: SemiImplicitIntegrator,
    dt: float,
    substeps: int,
    e_tile: int = 128,
    interpret: bool = False,
    with_res: bool = True,
    with_act: bool = True,
    with_xp: bool = False,
    contact_chunk: int = 192,
    vmem_limit_bytes: int = VMEM_LIMIT,
    residuals: str = "auto",
):
    """A differentiable frame-interval rollout on SoA planes.

    Returns ``f(bq, bqd, tgt, act, res, *traced) -> (bq', bqd')`` where
    bq (7,B,E), bqd (6,B,E), tgt/act (S,n_qd,E), res (S,6,B,E) [warp
    torque,force layout], and ``traced`` are the traced parameter planes
    from :func:`pallas_soa.traced_planes` (lane-1 shared or lane-E
    per-env): the four TRACED_NAMES planes, plus — with ``with_xp`` — the
    three XP_NAMES joint-anchor planes (the lab4d live ``joint_X_p``
    override, reference dp_interface.py:438-466, which the static kernel
    would otherwise bake as trace-time constants). All inputs receive
    gradients.

    ``with_res=False`` omits the residual-force VMEM buffers (the
    dominant env-dependent cost at e_tile=128): the kernel treats res as
    zero and returns zero res cotangents. Valid exactly when the caller's
    residual forces are structurally zero — which they are in every
    reference configuration (outputs multiplied by 0, dp_model.py:529,
    :536). ``with_act=False`` does the same for the joint activations
    (torque_mlp outputs, also multiplied by 0 at dp_model.py:529),
    halving the per-substep sequence VMEM (tgt-only in, dtgt-only out).

    ``residuals`` controls how the backward kernel obtains per-substep
    primals (states entering each substep + that substep's contact row
    forces). The forward work per substep is one contact pass (R) + one
    joints/integrate pass (J); the three modes trade redundant passes
    for VMEM:

    - 'resid': the FORWARD kernel exports an (S,19,B,E) residual array
      (bq 7 + bqd 6 + contact rows 6) through HBM; the backward kernel
      reads it and runs ONLY the reverse sweep — no forward re-sweep, no
      row recompute (~3.5 (R+J)-pass-equivalents per substep vs ~5.5 for
      'plain'). HBM cost is ~23 MB/interval at laikago-train scale,
      trivial against the 819 GB/s peak; VMEM cost is the double-buffered
      residual blocks in both kernels.
    - 'rows': backward re-sweeps forward but stores states + rows in VMEM
      scratch; the reverse sweep skips the row recompute (~4.5 passes).
    - 'plain': round-4 behavior (~5.5 passes), minimal VMEM.
    - 'auto' (default): the cheapest mode whose backward VMEM estimate
      fits the budget at the GIVEN e_tile — tile choice stays with the
      measured pick_e_tile policy and is never shrunk to afford a mode.
    """
    substep, static_consts, meta = build_soa_static(
        integrator, dt, contact_chunk=contact_chunk
    )
    contact_rows_fwd = meta["contact_rows"]
    contact_rows_loop = meta["contact_rows_loop"]
    contact_bwd = meta["contact_bwd"]
    substep_rest = meta["substep_rest"]
    B, n_qd = meta["B"], meta["n_qd"]
    S = substeps
    residuals = pick_residuals_mode(
        S, B, n_qd, e_tile, residuals=residuals,
        with_res=with_res, with_act=with_act, with_xp=with_xp,
        contacts_flat=meta["contacts_flat"],
        vmem_limit_bytes=vmem_limit_bytes,
    )
    tr_names = TRACED_NAMES + (XP_NAMES if with_xp else ())
    n_tr = len(tr_names)
    static_names = [n for n in static_consts if not (with_xp and n in XP_NAMES)]
    svals = [static_consts[n] for n in static_names]
    n_static = len(svals)
    # the backward kernel only touches contacts through the tiny
    # lane-major (B,Cm) blocks — keep the 6 MB sublane-major planes
    # (cpt/cdist/cmat) out of its VMEM entirely
    bwd_static_names = [n for n in static_names if n not in ("cpt", "cdist", "cmat")]
    bwd_svals = [static_consts[n] for n in bwd_static_names]
    n_bwd_static = len(bwd_svals)

    def _spec(shape, idx_fn=None):
        if idx_fn is None:
            nd = len(shape)
            idx_fn = lambda i, nd=nd: (0,) * nd
        return pl.BlockSpec(shape, idx_fn, memory_space=pltpu.VMEM)

    def _tile(E):
        # interpret mode (CPU emulation) has no Mosaic lane-tile rule:
        # honor small e_tile so tests can exercise the multi-grid-step
        # param-grad accumulation (pl.when(program_id==0) zero-init +
        # ref[:] += g) without needing E >= 256
        if interpret and E % e_tile == 0:
            return min(e_tile, E)
        return pick_tile(E, e_tile)

    # input layout: bq, bqd, tgt[, act][, res]
    n_in = 3 + int(with_act) + int(with_res)

    def _parse_seq_refs(refs):
        """(tgt_ref, act_ref|None, res_ref|None) from the input refs."""
        tgt_ref = refs[2]
        k = 3
        act_ref = None
        if with_act:
            act_ref = refs[k]
            k += 1
        res_ref = refs[k] if with_res else None
        return tgt_ref, act_ref, res_ref

    def _step(bq, bqd, tgt_i, act_i, res_i, C_static, traced):
        C = dict(C_static)
        C.update(zip(tr_names, traced))
        return substep(bq, bqd, tgt_i, act_i, C, res=res_i)

    # ---- forward kernel ------------------------------------------------
    # built in two variants: with the (S,19,B,E) residual export (the AD
    # forward in 'resid' mode) and WITHOUT it (the primal-only call —
    # pallas outputs cannot be DCE'd, so a primal-only caller of the
    # sr-exporting kernel would pay the export's HBM writes + VMEM
    # double-buffering for an output it discards; round-5 review finding)
    def _make_fwd_kernel(with_sr):
      def fwd_kernel(*refs):
        bq_ref, bqd_ref = refs[:2]
        tgt_ref, act_ref, res_ref = _parse_seq_refs(refs)
        static_refs = refs[n_in : n_in + n_static]
        traced_refs = refs[n_in + n_static : n_in + n_tr + n_static]
        out_refs = refs[n_in + n_tr + n_static :]
        out_q_ref, out_qd_ref = out_refs[:2]
        sr_ref = out_refs[2] if with_sr else None
        C_static = load_consts(static_names, static_refs)
        traced = tuple(r[:] for r in traced_refs)

        def body(i, carry):
            bq, bqd = carry
            act_i = act_ref[i] if with_act else None
            res_i = res_ref[i] if with_res else None
            if sr_ref is None:
                return _step(bq, bqd, tgt_ref[i], act_i, res_i,
                             C_static, traced)
            # 'resid': export this substep's primals (entering state +
            # contact rows) so the backward kernel skips its forward
            # re-sweep entirely
            C = dict(C_static)
            C.update(zip(tr_names, traced))
            con_t, con_f = contact_rows_fwd(bq, bqd, C)
            sr_ref[i] = jnp.concatenate(
                [bq, bqd, jnp.stack(list(con_t) + list(con_f), 0)], 0
            )
            return substep_rest(
                bq, bqd, tgt_ref[i], act_i, C, con_t, con_f, res=res_i
            )

        bq, bqd = jax.lax.fori_loop(0, S, body, (bq_ref[:], bqd_ref[:]))
        out_q_ref[:] = bq
        out_qd_ref[:] = bqd

      return fwd_kernel

    fwd_kernels = {
        with_sr: _make_fwd_kernel(with_sr)
        for with_sr in ({False, residuals == "resid"})
    }

    # ---- backward kernel -----------------------------------------------
    def bwd_kernel(*refs):
        bq_ref, bqd_ref = refs[:2]
        tgt_ref, act_ref, res_ref = _parse_seq_refs(refs)
        k = n_in
        sr_ref = None
        if residuals == "resid":
            sr_ref = refs[k]  # (S,19,B,et) exported by the fwd kernel
            k += 1
        static_refs = refs[k : k + n_bwd_static]
        n_static_k = n_bwd_static
        traced_refs = refs[k + n_static_k : k + n_tr + n_static_k]
        dq_ref, dqd_ref = refs[k + n_tr + n_static_k : k + n_tr + 2 + n_static_k]
        # outputs: dbq0, dbqd0, dtgt[, dact][, dres], dg per traced plane
        n_out = 3 + n_tr + int(with_act) + int(with_res)
        k_out = k + n_tr + 2 + n_static_k
        outs = list(refs[k_out : k_out + n_out])
        dbq0_ref, dbqd0_ref, dtgt_ref = outs[:3]
        o = 3
        dact_ref = None
        if with_act:
            dact_ref = outs[o]
            o += 1
        dres_ref = None
        if with_res:
            dres_ref = outs[o]
            o += 1
        dg_refs = outs[o : o + n_tr]
        scratch = refs[k_out + n_out :]
        sq_ref = sqd_ref = srows_ref = None
        if residuals == "rows":
            sq_ref, sqd_ref, srows_ref = scratch
        elif residuals == "plain":
            sq_ref, sqd_ref = scratch

        C_static = load_consts(bwd_static_names, static_refs)
        traced = tuple(r[:] for r in traced_refs)
        C_merged = dict(C_static)
        C_merged.update(zip(tr_names, traced))

        # forward sweep ('rows'/'plain' only — 'resid' reads the fwd
        # kernel's exported primals instead): store the state *entering*
        # each substep, and with 'rows' also that substep's contact row
        # forces ((6,B,E): 3 torque + 3 force rows) so the reverse sweep
        # skips one full contact pass per substep (VERDICT round-4 #3)
        def fwd_body(i, carry):
            bq, bqd = carry
            sq_ref[i] = bq
            sqd_ref[i] = bqd
            con_t, con_f = contact_rows_loop(bq, bqd, C_merged)
            if srows_ref is not None:
                srows_ref[i] = jnp.stack(list(con_t) + list(con_f), 0)
            act_i = act_ref[i] if with_act else None
            res_i = res_ref[i] if with_res else None
            return substep_rest(
                bq, bqd, tgt_ref[i], act_i, C_merged, con_t, con_f,
                res=res_i,
            )

        if residuals != "resid":
            jax.lax.fori_loop(0, S, fwd_body, (bq_ref[:], bqd_ref[:]))

        def _primals(j):
            """(bq_j, bqd_j, con_t, con_f) entering substep j; con rows
            are None in 'plain' mode (recomputed by the caller)."""
            if sr_ref is not None:
                sr = sr_ref[j]
                return (
                    sr[0:7], sr[7:13],
                    tuple(sr[13 + c] for c in range(3)),
                    tuple(sr[16 + c] for c in range(3)),
                )
            bq_j, bqd_j = sq_ref[j], sqd_ref[j]
            if srows_ref is None:
                return bq_j, bqd_j, None, None
            rows_j = srows_ref[j]
            return (
                bq_j, bqd_j,
                tuple(rows_j[c] for c in range(3)),
                tuple(rows_j[3 + c] for c in range(3)),
            )

        # reverse sweep, hand-composed per substep: load (or recompute)
        # the contact row forces (primal), vjp through joints+integrate
        # (cheap (B,E) residuals), then transpose the contact reduction
        # body-at-a-time (contact_bwd's fori_loop) — a monolithic
        # jax.vjp of the whole substep keeps every chunk's (cb,E)
        # residuals live across the forward/transpose boundary (42 MB
        # measured for the laikago hull set vs 16 MB VMEM)
        def rest_for_vjp(bq, bqd, tgt_i, *rest):
            # rest = [act_i][, res_i], con_t, con_f, *traced
            idx = 0
            act_i = None
            if with_act:
                act_i = rest[idx]
                idx += 1
            res_i = None
            if with_res:
                res_i = rest[idx]
                idx += 1
            con_t, con_f = rest[idx], rest[idx + 1]
            C = dict(C_static)
            C.update(zip(tr_names, rest[idx + 2 :]))
            return substep_rest(bq, bqd, tgt_i, act_i, C, con_t, con_f,
                                res=res_i)

        dg_init = tuple(jnp.zeros_like(t) for t in traced)

        def bwd_body(i, carry):
            dbq, dbqd, dg = carry
            j = S - 1 - i
            bq_j, bqd_j, con_t, con_f = _primals(j)
            if con_t is None:  # 'plain': recompute the rows
                con_t, con_f = contact_rows_loop(bq_j, bqd_j, C_merged)
            prim = (bq_j, bqd_j, tgt_ref[j])
            if with_act:
                prim = prim + (act_ref[j],)
            if with_res:
                prim = prim + (res_ref[j],)
            prim = prim + (con_t, con_f)
            _, vjp = jax.vjp(rest_for_vjp, *prim, *traced)
            grads = vjp((dbq, dbqd))
            dbq, dbqd = grads[0], grads[1]
            dtgt_ref[j] = grads[2]
            o = 3
            if with_act:
                dact_ref[j] = grads[o]
                o += 1
            if with_res:
                dres_ref[j] = grads[o]
                o += 1
            d_con_t, d_con_f = grads[o], grads[o + 1]
            dg = tuple(a + g for a, g in zip(dg, grads[o + 2 :]))
            dbq_c, dbqd_c = contact_bwd(bq_j, bqd_j, C_merged, d_con_t, d_con_f)
            return dbq + dbq_c, dbqd + dbqd_c, dg

        dbq, dbqd, dg = jax.lax.fori_loop(
            0, S, bwd_body, (dq_ref[:], dqd_ref[:], dg_init)
        )
        dbq0_ref[:] = dbq
        dbqd0_ref[:] = dbqd

        # parameter-plane grads: lane-1 (shared) planes accumulate across
        # the sequential env-tile grid; lane-E (per-env) planes are
        # per-tile blocks and write directly.
        for ref, g in zip(dg_refs, dg):
            if ref.shape[-1] > 1:  # per-env (lane-tiled) plane
                ref[:] = g
            else:
                @pl.when(pl.program_id(0) == 0)
                def _(ref=ref):
                    ref[:] = jnp.zeros_like(ref)

                ref[:] += g

    # ---- pallas_call wrappers -------------------------------------------
    def _tr_specs(traced, E, et):
        """Block specs / out shapes for the 4 traced planes (lane-1 or
        lane-E)."""
        specs, shapes = [], []
        for t in traced:
            if t.shape[-1] == 1:
                specs.append(_spec(t.shape))
                shapes.append(jax.ShapeDtypeStruct(t.shape, F32))
            else:  # per-env: tile the lane axis
                blk = t.shape[:-1] + (et,)
                nd = len(blk)
                specs.append(
                    _spec(blk, lambda i, nd=nd: (0,) * (nd - 1) + (i,))
                )
                shapes.append(jax.ShapeDtypeStruct(t.shape, F32))
        return specs, shapes

    def _state_io_specs(et):
        return [
            _spec((7, B, et), lambda i: (0, 0, i)),
            _spec((6, B, et), lambda i: (0, 0, i)),
        ]

    def _in_specs(et):
        specs = _state_io_specs(et) + [
            _spec((S, n_qd, et), lambda i: (0, 0, i)),
        ]
        if with_act:
            specs.append(_spec((S, n_qd, et), lambda i: (0, 0, i)))
        if with_res:
            specs.append(_spec((S, 6, B, et), lambda i: (0, 0, 0, i)))
        return specs

    def _seq_ins(tgt, act, res):
        return (
            (tgt,)
            + ((act,) if with_act else ())
            + ((res,) if with_res else ())
        )

    def _sr_spec(et):
        return _spec((S, 19, B, et), lambda i: (0, 0, 0, i))

    def fwd_call(bq, bqd, tgt, act, res, *traced, with_sr=False):
        """Returns (bq', bqd')[, sr] — sr = the (S,19,B,E) per-substep
        primal export, emitted only when ``with_sr`` (the AD forward in
        'resid' mode; primal-only calls use the export-free variant)."""
        E = bq.shape[-1]
        et = _tile(E)
        grid = (E // et,)
        tr_specs, _ = _tr_specs(traced, E, et)
        in_specs = _in_specs(et) + [_spec(c.shape) for c in svals] + tr_specs
        out_specs = tuple(_state_io_specs(et))
        out_shape = (
            jax.ShapeDtypeStruct((7, B, E), F32),
            jax.ShapeDtypeStruct((6, B, E), F32),
        )
        if with_sr:
            out_specs = out_specs + (_sr_spec(et),)
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((S, 19, B, E), F32),
            )
        ins = (bq, bqd) + _seq_ins(tgt, act, res)
        return pl.pallas_call(
            fwd_kernels[with_sr],
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_params(interpret, vmem_limit_bytes),
        )(*ins, *svals, *traced)

    def bwd_call(bq, bqd, tgt, act, res, sr, traced, dq, dqd):
        E = bq.shape[-1]
        et = _tile(E)
        grid = (E // et,)
        tr_specs, tr_shapes = _tr_specs(traced, E, et)
        in_specs = (
            _in_specs(et)
            + ([_sr_spec(et)] if residuals == "resid" else [])
            + [_spec(c.shape) for c in bwd_svals]
            + tr_specs
            + _state_io_specs(et)
        )
        seq_spec = _spec((S, n_qd, et), lambda i: (0, 0, i))
        out_specs = tuple(_state_io_specs(et)) + (seq_spec,)
        out_shape = (
            jax.ShapeDtypeStruct((7, B, E), F32),
            jax.ShapeDtypeStruct((6, B, E), F32),
            jax.ShapeDtypeStruct((S, n_qd, E), F32),
        )
        if with_act:
            out_specs = out_specs + (seq_spec,)
            out_shape = out_shape + (jax.ShapeDtypeStruct((S, n_qd, E), F32),)
        if with_res:
            out_specs = out_specs + (_spec((S, 6, B, et), lambda i: (0, 0, 0, i)),)
            out_shape = out_shape + (jax.ShapeDtypeStruct((S, 6, B, E), F32),)
        out_specs = out_specs + tuple(tr_specs)
        out_shape = out_shape + tuple(tr_shapes)
        if residuals == "rows":
            scratch_shapes = [
                pltpu.VMEM((S, 7, B, et), F32),
                pltpu.VMEM((S, 6, B, et), F32),
                pltpu.VMEM((S, 6, B, et), F32),  # contact rows (fwd sweep)
            ]
        elif residuals == "plain":
            scratch_shapes = [
                pltpu.VMEM((S, 7, B, et), F32),
                pltpu.VMEM((S, 6, B, et), F32),
            ]
        else:  # 'resid': primals arrive as the sr input block
            scratch_shapes = []
        ins = (bq, bqd) + _seq_ins(tgt, act, res)
        if residuals == "resid":
            ins = ins + (sr,)
        return pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
            compiler_params=_params(interpret, vmem_limit_bytes),
        )(*ins, *bwd_svals, *traced, dq, dqd)

    @jax.custom_vjp
    def interval_t(bq, bqd, tgt, act, res, traced):
        # primal-only call: never emit the residual export (discarded
        # pallas outputs still cost their HBM writes)
        return fwd_call(bq, bqd, tgt, act, res, *traced, with_sr=False)

    def interval_fwd(bq, bqd, tgt, act, res, traced):
        want_sr = residuals == "resid"
        out = fwd_call(bq, bqd, tgt, act, res, *traced, with_sr=want_sr)
        sr = None
        if want_sr:
            sr = out[2]
            out = out[:2]
        return out, (bq, bqd, tgt, act, res, sr, traced)

    def interval_bwd(saved, ct):
        bq, bqd, tgt, act, res, sr, traced = saved
        dq, dqd = ct
        grads = bwd_call(bq, bqd, tgt, act, res, sr, traced, dq, dqd)
        # re-insert structurally-zero cotangents for disabled inputs so
        # the returned tuple always matches interval_t's signature
        grads = list(grads)
        if not with_act:
            grads.insert(3, jnp.zeros_like(act))
        if not with_res:
            grads.insert(4, jnp.zeros_like(res))
        return tuple(grads[:5]) + (tuple(grads[5:]),)

    interval_t.defvjp(interval_fwd, interval_bwd)

    def interval(bq, bqd, tgt, act, res, *traced):
        assert len(traced) == n_tr, (len(traced), tr_names)
        return interval_t(bq, bqd, tgt, act, res, tuple(traced))

    interval.with_xp = with_xp
    return interval


def _pad(d: int, m: int) -> int:
    return -(-d // m) * m


def estimate_interval_vmem(
    substeps: int, B: int, n_qd: int, e_tile: int,
    with_res: bool = False, with_act: bool = True, contacts_cm: int = 64,
    with_xp: bool = False, contacts_flat: int = 0,
    residuals: str = "plain",
) -> int:
    """Scoped-VMEM estimate (bytes) of the BACKWARD interval kernel — the
    VMEM-heavier of the pair. Every VMEM buffer is (8,128)-tile padded
    (sublane/lane), matching the TPU layouts Mosaic allocates. Terms:

    - substep-state scratch: (S,7,B,et) + (S,6,B,et) + the stored
      contact rows (S,6,B,et)
    - env-grid-tiled sequence blocks, double-buffered: tgt in + dtgt out
      [+ act/dact] [+ res/dres]
    - state IO blocks (bq/bqd/dq/dqd in, dbq0/dbqd0 out), double-buffered
    - traced parameter planes in + dg out (lane-1 planes still occupy a
      full 128-lane tile; with_xp adds the 10 anchor rows)
    - exact-ish padded static consts (selectors, masks, anchors, limits,
      lane-major (B,Cm) contact blocks)
    - an allowance for the per-group (Cm,et) contact-vjp temporaries and
      (B,et) joint-vjp residuals (~24/~30 live planes, laikago trace)

    Calibrated against Mosaic's scoped-vmem OOM reports: quad 60 Hz
    single-kernel actual 16.62 MB vs 18.7 MB here, laikago 60 Hz fits at
    8.8 MB here (runs, 2026-08-17). Used by :func:`plan_chunks` to split
    frame intervals that cannot fit — a safety-margined estimate, not a
    guarantee.
    """
    S, et = substeps, e_tile
    f = 4  # fp32 bytes
    Bp = _pad(B, 8)
    qp = _pad(n_qd, 8)
    lane = _pad(max(contacts_cm, 1), 128)
    # per-substep primal storage, by residuals mode (the planner's tile
    # policy budgets 'plain'; make_diff_interval upgrades the mode only
    # when it fits the leftover budget at the already-chosen tile):
    # 'plain' = state scratch; 'rows' = + stored contact rows; 'resid' =
    # no scratch, but the (S,19,B,et) HBM residual arrives as a
    # double-buffered input block
    if residuals == "resid":
        scratch = 2 * S * 19 * Bp * et * f
    else:
        scratch = S * (19 if residuals == "rows" else 13) * Bp * et * f
    seq = 2 * 2 * S * qp * et * f  # tgt + dtgt, double-buffered
    if with_act:
        seq *= 2
    if with_res:
        seq += 2 * 2 * S * 6 * Bp * et * f
    stateio = 2 * (2 * 13 + 13) * Bp * et * f
    tr_rows = 25 + (10 if with_xp else 0)  # gains 6 + inv_m 1 + inertias 18 [+ xp 10]
    traced = 2 * 2 * tr_rows * Bp * max(et, 128) * f
    statics = (
        36 * Bp * 128 * f  # masks(4) + anchor/axis/com planes(20) + lim(12)
        + 2 * Bp * _pad(B, 128) * f  # P_gather / P_scatter
        + 3 * Bp * _pad(n_qd, 128) * f  # D selectors
    )
    if contacts_flat:
        # flat layout (pallas_soa.flat_layout_plan): Sg/Ss one-hots +
        # (Cf,1) constants, and the flat-contact vjp holds per-PIECE
        # (rows,E) forward intermediates as residuals through the reverse
        # sweep (~24 planes) plus reverse temporaries. Monolithic
        # (C <= FLAT_MAX_C, or forced flat-mono): the piece is all Cf
        # rows. Chunked: the per-chunk fori_loop bounds residuals to
        # FLAT_CHUNK_C rows. flat_chunk_rows resolves which applies
        # (including the PPR_SOA_CONTACT_LAYOUT=flat-mono bench switch
        # the old total-only rule ignored, underestimating ~5-11x).
        from .pallas_soa import flat_chunk_rows

        Cfp = _pad(contacts_flat, 8)
        Cc = flat_chunk_rows(contacts_flat)
        statics += (2 * Cfp * _pad(B, 128) + 8 * Cfp * 128) * f
        temps = 48 * _pad(Cc, 8) * et * f + 30 * Bp * et * f
    else:
        statics += 8 * Bp * lane * f  # cpt_bm / cdist_bm / cmat_bm
        temps = 24 * lane * et * f + 30 * Bp * et * f
    return scratch + seq + stateio + traced + statics + temps


def plan_chunks(
    substeps: int, B: int, n_qd: int, e_tile: int,
    with_res: bool = False, with_act: bool = True,
    contacts_cm: int = 64, budget: int = VMEM_LIMIT - 12 * 2 ** 20,
    with_xp: bool = False, contacts_flat: int = 0,
):
    """Split a frame interval of ``substeps`` into the fewest near-equal
    kernel chunks whose backward-kernel VMEM estimate fits the budget
    (the kernels request VMEM_LIMIT of the 128 MB physical; default
    leaves 12 MB headroom for Mosaic's own temporaries beyond the
    estimate). With the raised cap the common template x rate grid fits
    in ONE kernel — splits only kick in for extreme (substeps x e_tile)
    products. Returns a list of chunk sizes summing to ``substeps``
    (length 1 = no split)."""
    for n in range(1, substeps + 1):
        hi = -(-substeps // n)
        if estimate_interval_vmem(
            hi, B, n_qd, e_tile, with_res, with_act, contacts_cm,
            with_xp=with_xp, contacts_flat=contacts_flat,
        ) <= budget:
            base = substeps // n
            rem = substeps - base * n
            return [base + 1] * rem + [base] * (n - rem)
    return [1] * substeps


def pick_e_tile(
    substeps: int, B: int, n_qd: int,
    with_res: bool = False, with_act: bool = True,
    contacts_cm: int = 64, with_xp: bool = False, contacts_flat: int = 0,
) -> int:
    """Auto env-tile: the largest e_tile in {512, 256, 128} whose
    backward still plans as a SINGLE kernel. Measured on v5e (1024 envs,
    train fwd+bwd): throughput rises monotonically with tile size while
    single-kernel — laikago 60 Hz 1.49/1.79/1.87M env-steps/s at
    128/256/512 — and dips past it (1.81M at 1024); chunked plans lose
    the larger tile's gain to the chunk-boundary HBM round-trips.

    Joint tile x residuals-mode rule: if tile 512 cannot afford the
    'resid' backward (forward-exported per-substep primals — the
    cheapest backward, it drops the entire forward re-sweep) but 256
    can, return 256. Measured on v5e (laikago 24 Hz, 1024 envs,
    docs/results/round5/train_tile_sweep.jsonl): 256+resid 2.72M
    env-steps/s vs 512+rows 2.26M and 256+rows 2.13M — the mode is
    worth ~27% at matched tile, the halved tile costs ~10%. The rule is
    bounded to the measured scope: no halving below 256 (tile 128 was
    measured 20% slower than 512 on laikago 60 Hz, so an unmeasured
    128+resid is not presumed to beat a measured 256)."""
    def single_kernel(et):
        return plan_chunks(
            substeps, B, n_qd, et, with_res, with_act, contacts_cm,
            with_xp=with_xp, contacts_flat=contacts_flat,
        ) == [substeps]

    kw = dict(
        with_res=with_res, with_act=with_act, with_xp=with_xp,
        contacts_flat=contacts_flat,
    )

    def affords_resid(et):
        return pick_residuals_mode(substeps, B, n_qd, et, **kw) == "resid"

    et = next((t for t in (512, 256) if single_kernel(t)), 128)
    if et == 512 and not affords_resid(512) and affords_resid(256):
        return 256
    return et


def make_diff_chain(
    integrator: SemiImplicitIntegrator,
    dt: float,
    substeps: int,
    chunk_sizes=None,
    **kw,
):
    """A frame-interval function with :func:`make_diff_interval`'s
    signature, built as a chain of smaller interval kernels when one
    kernel's backward cannot hold all ``substeps`` states in VMEM (24 Hz
    sequences: 83 substeps/frame, dp_model.py:416; big templates:
    quad B=26 / human B=19). Chunk boundaries round-trip the (13,B,E)
    state through HBM — ~100 KB per tile, negligible against the interval
    compute — while reverse-AD across chunks stores only chunk-boundary
    states (each chunk is its own custom-vjp pair)."""
    if chunk_sizes is None:
        chunk_sizes = [substeps]
    assert sum(chunk_sizes) == substeps, (chunk_sizes, substeps)
    fns = {
        sz: make_diff_interval(integrator, dt, sz, **kw)
        for sz in sorted(set(chunk_sizes))
    }
    if len(chunk_sizes) == 1:
        return fns[chunk_sizes[0]]
    offsets = [0]
    for sz in chunk_sizes:
        offsets.append(offsets[-1] + sz)

    def chain(bq, bqd, tgt, act, res, *traced):
        for sz, o in zip(chunk_sizes, offsets):
            bq, bqd = fns[sz](
                bq, bqd, tgt[o : o + sz], act[o : o + sz],
                res[o : o + sz], *traced,
            )
        return bq, bqd

    chain.with_xp = fns[chunk_sizes[0]].with_xp
    return chain


def rollout_soa(
    integrator: SemiImplicitIntegrator,
    params,
    state0: SimState,
    joint_targets: jnp.ndarray,  # (S, E, n_qd)
    joint_acts: jnp.ndarray,  # (S, E, n_qd)
    res_f: jnp.ndarray,  # (S, E, B, 6) warp layout
    dt: float,
    substeps_per_frame: int,
    e_tile: int = 128,
    interpret: bool = False,
    interval_fn=None,
    with_res: bool = True,
    with_act: bool = True,
):
    """Drop-in replacement for integrator.rollout on the Pallas path.

    Same contract (integrator.py rollout / reference dp_model.py:1204-1248):
    states recorded at frame boundaries before that boundary's substep,
    grf/jaf observables from the boundary substep. Observables are
    evaluated by the (cheap, once-per-frame) XLA force pipeline under
    stop_gradient — they feed visualization only (dp_model.py:1231-1234).

    Returns (body_q (F,E,B,7), body_qd (F,E,B,6), grf (F,E,B,6),
    jaf (F,E,B,6)).
    """
    S = joint_targets.shape[0]
    sub = substeps_per_frame
    n_intervals = (S - 1) // sub
    assert S == n_intervals * sub + 1, (S, sub)

    with_xp = getattr(params, "joint_X_p", None) is not None
    if interval_fn is None:
        model = integrator.model
        chunks = plan_chunks(
            sub, model.n_links, model.n_qd, e_tile,
            with_res=with_res, with_act=with_act, with_xp=with_xp,
        )
        interval_fn = make_diff_chain(
            integrator, dt, sub, chunk_sizes=chunks,
            e_tile=e_tile, interpret=interpret,
            with_res=with_res, with_act=with_act, with_xp=with_xp,
        )
    else:
        assert getattr(interval_fn, "with_xp", False) == with_xp, (
            "interval_fn built with with_xp=%s but params.joint_X_p is %s"
            % (getattr(interval_fn, "with_xp", False),
               "live" if with_xp else "None")
        )
    planes = traced_planes(integrator.model, params)
    tr_names = TRACED_NAMES + (XP_NAMES if with_xp else ())
    tr = tuple(planes[n] for n in tr_names)

    # plane layouts for the scan inputs
    tgt_p = joint_targets.transpose(0, 2, 1)  # (S, n_qd, E)
    act_p = joint_acts.transpose(0, 2, 1)
    res_p = res_f.transpose(0, 3, 2, 1)  # (S, 6, B, E)

    sg = jax.lax.stop_gradient

    def observables(state, tgt_i, act_i, rf_i):
        _, grf, jaf = integrator.compute_forces(
            sg(params), SimState(sg(state.body_q), sg(state.body_qd)),
            sg(tgt_i), sg(act_i), sg(rf_i),
        )
        return grf, jaf

    def interval(state, inputs):
        tgt_i, act_i, res_i, tgt_aos, act_aos, rf_aos = inputs
        frame_state = state
        grf, jaf = observables(state, tgt_aos, act_aos, rf_aos)
        bq = state.body_q.transpose(2, 1, 0)  # (7,B,E)
        bqd = state.body_qd.transpose(2, 1, 0)
        bq, bqd = interval_fn(bq, bqd, tgt_i, act_i, res_i, *tr)
        state = SimState(bq.transpose(2, 1, 0), bqd.transpose(2, 1, 0))
        return state, (frame_state.body_q, frame_state.body_qd, grf, jaf)

    shaped = lambda x: x[: n_intervals * sub].reshape(
        (n_intervals, sub) + x.shape[1:]
    )
    xs = (
        shaped(tgt_p), shaped(act_p), shaped(res_p),
        # AoS slices of the boundary substep, for the observables
        joint_targets[: n_intervals * sub : sub],
        joint_acts[: n_intervals * sub : sub],
        res_f[: n_intervals * sub : sub],
    )
    last_state, (q_frames, qd_frames, grfs, jafs) = jax.lax.scan(
        interval, state0, xs
    )
    grf_l, jaf_l = observables(
        last_state, joint_targets[-1], joint_acts[-1], res_f[-1]
    )
    body_q = jnp.concatenate([q_frames, last_state.body_q[None]], 0)
    body_qd = jnp.concatenate([qd_frames, last_state.body_qd[None]], 0)
    grfs = jnp.concatenate([grfs, grf_l[None]], 0)
    jafs = jnp.concatenate([jafs, jaf_l[None]], 0)
    return body_q, body_qd, grfs, jafs
