"""Pallas TPU rollout megakernel — structure-of-arrays layout.

The TPU-native formulation of the substep: every physical quantity is a
set of **component planes** with environments on the 128-wide lane
dimension — ``body_q`` becomes seven (B, E) planes, contacts become
(C_b, E) planes per body. Consequences:

- every vector op is dense lane-parallel VPU work (the (E, B, 3)
  array-of-structures layout wastes 125/128 lanes per op);
- *no gathers or scatters at all*: parent lookups are (B,B) one-hot
  matmuls on the MXU; contacts are grouped per body at trace time, so a
  body's transform broadcasts (1,E) x (C_b,1) against its static contact
  block, and the force reduction is a sublane sum;
- a whole frame interval (``substeps`` steps) runs inside one kernel with
  state resident in VMEM — zero HBM traffic between substeps.

Math mirrors integrator.py step-for-step (same clamps, same PD law, same
polynomial atan2 from ops.kernel_math); tests/test_pallas.py pins the two
paths together numerically.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.kernel_math import atan2 as katan2
from ..ops.kernel_math import asin as kasin
from .builder import (
    JOINT_COMPOUND,
    JOINT_FIXED,
    JOINT_REVOLUTE,
)
from .integrator import SemiImplicitIntegrator, SimParams, SimState

F32 = jnp.float32

# Raised Mosaic scoped-VMEM cap shared by all SoA kernels: the default
# 16 MB is a compiler default, not the hardware (v5e: 128 MB/core); the
# big-template kernels need ~16-40 MB (see pallas_soa_grad.VMEM_LIMIT
# rationale).
VMEM_LIMIT = 100 * 2 ** 20
_PREC = jax.lax.Precision.HIGHEST


def pick_tile(E: int, e_tile: int) -> int:
    """Largest legal lane tile <= e_tile: Mosaic requires the lane (last)
    block dim to be a multiple of 128 or equal to the full array dim.
    Falls back to the full E (single grid step) when no multiple of 128
    divides it."""
    if E <= e_tile:
        return E
    t = (e_tile // 128) * 128
    while t >= 128:
        if E % t == 0:
            return t
        t -= 128
    return E


def _pad8_128(d: int, m: int) -> int:
    return -(-d // m) * m


def flat_chunk_rows(contacts_flat: int) -> int:
    """Rows of the flat-contact piece the kernel holds LIVE at once:
    the whole array for the monolithic layout (auto at C <= FLAT_MAX_C,
    or the forced 'flat-mono' bench switch at ANY C), FLAT_CHUNK_C per
    chunk for the chunked layout. The VMEM estimators must size contact
    temporaries/vjp-residuals with this — deriving it from the total
    alone assumed chunking whenever C > FLAT_MAX_C and underestimated a
    forced flat-mono kernel ~5-11x (round-5 review finding)."""
    import os

    if contacts_flat <= FLAT_MAX_C:
        return contacts_flat
    if os.environ.get("PPR_SOA_CONTACT_LAYOUT") == "flat-mono":
        return contacts_flat
    return FLAT_CHUNK_C


def estimate_window_vmem(
    substeps: int, B: int, n_qd: int, e_tile: int, contacts_cm: int = 64,
    contacts_flat: int = 0,
) -> int:
    """Scoped-VMEM estimate (bytes) of one ``build_soa_window`` grid step
    (FORWARD-only; no per-substep state scratch — the carry is 13 rows).
    Mirrors pallas_soa_grad.estimate_interval_vmem's accounting style
    ((8,128)-tile padding, same static-constant terms); the dominant term
    is the double-buffered per-frame (sub, n_qd, et) target/act blocks.
    """
    et, f = e_tile, 4
    Bp = _pad8_128(B, 8)
    qp = _pad8_128(n_qd, 8)
    lane = _pad8_128(max(contacts_cm, 1), 128)
    seq = 2 * 2 * substeps * qp * et * f  # tgt + act frame blocks, dbl-buf
    stateio = 2 * 13 * Bp * et * f + 2 * 2 * qp * et * f  # bq/bqd + last tgt/act
    outs = (2 * 25 + 25) * Bp * et * f  # 4 frame outs dbl-buf + 4 last outs
    scratch = 13 * Bp * et * f
    traced = 25 * Bp * max(et, 128) * f
    statics = (
        36 * Bp * 128 + 2 * Bp * _pad8_128(B, 128)
        + 3 * Bp * _pad8_128(n_qd, 128)
    ) * f
    if contacts_flat:
        Cfp = _pad8_128(contacts_flat, 8)
        # chunked flat (C > FLAT_MAX_C, unless flat-mono is forced):
        # temporaries are per-PIECE (Cc,E) planes, not whole-(Cf,E) —
        # the fori_loop boundary bounds them
        Cc = flat_chunk_rows(contacts_flat)
        statics += (2 * Cfp * _pad8_128(B, 128) + 8 * Cfp * 128) * f
        temps = 24 * _pad8_128(Cc, 8) * et * f + 30 * Bp * et * f
    else:
        statics += 8 * Bp * lane * f
        temps = 24 * lane * et * f + 30 * Bp * et * f
    return seq + stateio + outs + scratch + traced + statics + temps


def pick_window_e_tile(
    substeps: int, B: int, n_qd: int, contacts_cm: int = 64,
    budget: int = VMEM_LIMIT - 12 * 2 ** 20, contacts_flat: int = 0,
) -> int:
    """Auto env-tile for the forward window kernel (serving/eval): the
    largest tile in {512, 256, 128} whose per-grid-step VMEM estimate
    fits the budget — the same largest-while-it-fits policy measured
    fastest for the training kernels (pallas_soa_grad.pick_e_tile)."""
    for et in (512, 256):
        if estimate_window_vmem(
            substeps, B, n_qd, et, contacts_cm, contacts_flat
        ) <= budget:
            return et
    return 128


# ---- plane (component-tuple) math -----------------------------------------

def _qmul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    )


def _qinv(q):
    return (-q[0], -q[1], -q[2], q[3])


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _qrot(q, v):
    u = (q[0], q[1], q[2])
    w = q[3]
    uv = _cross(u, v)
    uuv = _cross(u, uv)
    return tuple(v[i] + 2.0 * (w * uv[i] + uuv[i]) for i in range(3))


def _qrot_inv(q, v):
    return _qrot(_qinv(q), v)


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _scale(v, s):
    return tuple(v[i] * s for i in range(3))


def _add3(a, b):
    return tuple(a[i] + b[i] for i in range(3))


def _sub3(a, b):
    return tuple(a[i] - b[i] for i in range(3))


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=F32, precision=_PREC)


def _qnormalize(q):
    n2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-18))
    return tuple(q[i] * inv for i in range(4))


def _contact_force_raw(qb, tb, wb, vb, com_b, pt, dist, mat):
    """Penalty-contact force/torque per contact row, UNreduced:
    (torque (cb,E) x3, force (cb,E) x3) with the reference's sign
    (positive = force on the body; callers negate, matching warp's
    atomic_sub, integrator_euler.py:246-286)."""
    ke, kd, kf, mu = mat
    com_w = _add3(tb, _qrot(qb, com_b))
    cp = _add3(_qrot(qb, pt), tb)  # (cb,E)
    cp = (cp[0], cp[1] - dist, cp[2])  # thickness, n=(0,1,0)
    r = _sub3(cp, com_w)
    dpdt = _add3(vb, _cross(wb, r))

    c = cp[1]
    active = (c < 0.0).astype(F32)
    vn = dpdt[1]
    vt = (dpdt[0], dpdt[1] - vn, dpdt[2])
    fn = c * ke
    fd = jnp.minimum(vn, 0.0) * kd
    vt_len = jnp.sqrt(_dot3(vt, vt) + 1e-12)
    ft_mag = jnp.minimum(kf * vt_len, -mu * (fn + fd))
    ft = _scale(vt, ft_mag / vt_len)
    f_tot = (ft[0], (fn + fd) + ft[1], ft[2])
    f_tot = tuple(
        jnp.clip(f_tot[k] * active, -500.0, 500.0) for k in range(3)
    )
    t_tot = _cross(r, f_tot)
    return t_tot, f_tot


def _chunk_force(qb, tb, wb, vb, com_b, pt, dist, mat):
    """Penalty-contact force/torque of one static contact chunk, reduced
    onto its body: (neg torque (1,E) x3, neg force (1,E) x3).

    qb/tb/wb/vb: (1,E) plane tuples of the body state; com_b (1,E) x3;
    pt (cb,1) x3; dist (cb,1); mat = (ke, kd, kf, mu) each (cb,1).
    Pure function of its inputs — the backward kernel wraps it in
    jax.checkpoint so the (cb,E) intermediates are recomputed during the
    in-kernel reverse sweep instead of being held as vjp residuals
    (they would otherwise dominate VMEM: ~20 live (C,E) planes/substep).
    """
    t_tot, f_tot = _contact_force_raw(qb, tb, wb, vb, com_b, pt, dist, mat)
    # atomic_sub sign + reduce over the chunk's contacts (axis -2 so the
    # same math serves 2D (cb,E) chunks and 3D (G,cb,E) body groups)
    return (
        tuple(-jnp.sum(t_tot[k], -2, keepdims=True) for k in range(3)),
        tuple(-jnp.sum(f_tot[k], -2, keepdims=True) for k in range(3)),
    )


# Contact-candidate ceiling for the MONOLITHIC flat layout (all contacts
# as (Cf,E) planes in one vectorized piece): the flat backward's
# monolithic vjp keeps ~2 dozen (Cf,E) residual planes live, so one
# piece only pays off while Cf x e_tile stays small — quad (208) and
# human (152) qualify. Measured on v5e (docs/results/round4/
# quad_bench.jsonl, 1024 envs, train fwd+bwd): flat beats loop/XLA
# 1.5-2.2x at C=152/208 at both rates.
FLAT_MAX_C = 320

# Chunk row count for the CHUNKED flat layout (dense-contact robots,
# C > FLAT_MAX_C, e.g. laikago's 1454 hull candidates): contacts are
# partitioned into K uniform chunks of FLAT_CHUNK_C rows whose constants
# carry a leading K axis and stay VMEM *refs*, indexed ref[k] inside a
# fori_loop — so forward work is fully vectorized per chunk while the
# backward transpose keeps only ONE chunk's (Cc,E) vjp residuals live
# (the VMEM blowup that capped the monolithic layout at 320 rows).
# Replaces the per-BODY loop whose padded blocks (laikago: 13 x Cm=192 =
# 2496 rows for 1454 useful) serialized the backward (VERDICT round-4 #3).
# 256 = 2 full 128-lane tiles, so the (B,Cc) scatter operand pads zero
# lanes (320 would pad to 384); laikago: K=6 chunks, 5.6% row padding.
FLAT_CHUNK_C = 256


def flat_layout_plan(model, layout: str = "auto"):
    """Flat-contact plan ``(Cf_total, Cc, K)``: total padded rows, rows
    per chunk, chunk count. ``(0, 0, 0)`` = the per-body loop layout.
    K == 1 is the monolithic flat layout (single (Cf,E) piece).

    layout: 'auto' (monolithic flat iff 0 < C <= FLAT_MAX_C — measured
    on v5e, round-4 quad_bench.jsonl; dense-contact robots stay on loop
    per the round-5 adjudication, laikago_flat_bench.jsonl), 'flat'
    (forced; chunked when C > FLAT_MAX_C), 'flat-mono' (forced
    monolithic at ANY C — bench switch; needs e_tile <= 256 at laikago
    scale for the vjp residual planes), 'loop'; the
    PPR_SOA_CONTACT_LAYOUT env var overrides 'auto' (the HW bench
    switch for adjudicating layout cells, VERDICT round-3 #4 /
    round-4 #3)."""
    import os

    C = int(model.contact_count)
    if layout == "auto":
        layout = os.environ.get("PPR_SOA_CONTACT_LAYOUT", "auto")
    if layout == "loop" or C == 0:
        return 0, 0, 0
    if C <= FLAT_MAX_C or layout == "flat-mono":
        Cc = max(8, -(-C // 8) * 8)
        return Cc, Cc, 1
    if layout != "flat":
        return 0, 0, 0
    K = -(-C // FLAT_CHUNK_C)
    return K * FLAT_CHUNK_C, FLAT_CHUNK_C, K


def flat_contact_pad(model, layout: str = "auto") -> int:
    """Total padded flat-contact row count (0 = the loop layout);
    back-compat wrapper of :func:`flat_layout_plan`."""
    return flat_layout_plan(model, layout)[0]


TRACED_NAMES = ("gains", "inv_m", "inertia", "inv_inertia")

# Constants whose names carry this suffix have a leading chunk axis and
# must stay VMEM refs inside kernels (indexed ref[k] per chunk inside a
# fori_loop — Mosaic lowers dynamic leading-dim indexing on refs but not
# on loaded values); everything else is loaded whole at kernel entry.
CHUNKED_CONST_SUFFIX = "_ck"


def load_consts(names, refs):
    """Kernel-entry constant load honoring the chunked-ref contract."""
    return {
        n: (r if n.endswith(CHUNKED_CONST_SUFFIX) else r[:])
        for n, r in zip(names, refs)
    }

# live joint-anchor planes (lab4d query_ja override, reference
# dp_interface.py:438-466) — traced only when the kernel is built with
# ``with_xp`` (pallas_soa_grad.make_diff_interval); static consts otherwise
XP_NAMES = ("xp_t", "xp_q", "rp_local")


def xp_planes(model, joint_X_p):
    """Plane layout of a joint-anchor override ``joint_X_p`` ((B,7) shared
    -> lane-1, (E,B,7) per-env -> lane-E). Differentiable. ``rp_local`` is
    the parent-COM-relative anchor arm the joint sweep rotates into the
    world frame (r_p = R_wp @ (xp_t - com_parent), integrator.py:266)."""
    parent = model.joint_parent
    parent_safe = np.where(parent >= 0, parent, 0)
    com_parent = jnp.asarray(model.body_com[parent_safe].T[:, :, None], F32)
    xp = jnp.asarray(joint_X_p, F32)
    if xp.ndim == 2:  # (B,7) -> lane-1
        xp_t = xp[:, 0:3].T[:, :, None]
        xp_q = xp[:, 3:7].T[:, :, None]
    else:  # (E,B,7) -> lane-E
        xp_t = xp[..., 0:3].transpose(2, 1, 0)
        xp_q = xp[..., 3:7].transpose(2, 1, 0)
    return dict(xp_t=xp_t, xp_q=xp_q, rp_local=xp_t - com_parent)


def traced_planes(model, params: SimParams):
    """The per-call (traced) parameter arrays in plane layout: the four
    identified-parameter planes (TRACED_NAMES), plus the XP_NAMES anchor
    planes when ``params.joint_X_p`` is live (lab4d mode).

    Differentiable jnp transforms — the custom-vjp wrapper in
    pallas_soa_grad.py takes these as explicit arguments so ``jax.grad``
    flows back to SimParams. Handles both shared params
    (``joint_target_ke (n_qd,)`` -> lane-1 planes) and per-env params
    (``(E, n_qd)`` -> lane-E planes; system-ID sweeps)."""
    B = model.n_links
    n_qd = model.n_qd
    dof_idx = np.clip(
        model.joint_qd_start[:, None] + np.arange(3)[None, :], 0, n_qd - 1
    )
    ke, kd = params.joint_target_ke, params.joint_target_kd
    if ke.ndim == 1:
        ke3 = jnp.stack([ke[dof_idx[:, k]] for k in range(3)])  # (3,B)
        kd3 = jnp.stack([kd[dof_idx[:, k]] for k in range(3)])
        gains = jnp.stack([ke3, kd3])[..., None]  # (2,3,B,1)
    else:  # (E, n_qd)
        ke3 = jnp.stack([ke[:, dof_idx[:, k]].T for k in range(3)])  # (3,B,E)
        kd3 = jnp.stack([kd[:, dof_idx[:, k]].T for k in range(3)])
        gains = jnp.stack([ke3, kd3])  # (2,3,B,E)
    im = params.body_inv_mass
    inv_m = im[:, None] if im.ndim == 1 else im.T  # (B,1) | (B,E)
    if params.body_inertia.ndim == 3:
        inertia = params.body_inertia.transpose(1, 2, 0)[..., None]  # (3,3,B,1)
        inv_inertia = params.body_inv_inertia.transpose(1, 2, 0)[..., None]
    else:  # (E,B,3,3)
        inertia = params.body_inertia.transpose(2, 3, 1, 0)  # (3,3,B,E)
        inv_inertia = params.body_inv_inertia.transpose(2, 3, 1, 0)
    planes = dict(
        gains=jnp.asarray(gains, F32),
        inv_m=jnp.asarray(inv_m, F32),
        inertia=jnp.asarray(inertia, F32),
        inv_inertia=jnp.asarray(inv_inertia, F32),
    )
    if getattr(params, "joint_X_p", None) is not None:
        planes.update(xp_planes(model, params.joint_X_p))
    return planes


def build_soa_static(
    integrator: SemiImplicitIntegrator,
    dt: float,
    contact_chunk: int = 384,
    contact_layout: str = "auto",
):
    """The reusable core of the SoA kernels: the plane-layout ``substep``
    plus its *static* (trace-time numpy) constant arrays. The four traced
    parameter planes (TRACED_NAMES, from :func:`traced_planes`) must be
    merged into the const dict ``C`` by the caller per invocation.

    ``meta`` additionally carries the split pieces the grad kernel's
    hand-scheduled backward needs: ``contact_rows`` (chunked contact
    reduction), ``contact_bwd`` (its chunk-at-a-time transpose, emitted
    depth-first so chunk residuals never accumulate in VMEM), and
    ``substep_rest`` (joints + integrate given contact row forces).
    """
    model = integrator.model
    B = model.n_links
    n_qd = model.n_qd
    jt = model.joint_type
    parent = model.joint_parent
    parent_safe = np.where(parent >= 0, parent, 0)

    # ---- static constants (numpy -> kernel inputs) ---------------------
    P_gather = np.zeros((B, B), np.float32)
    P_gather[np.arange(B), parent_safe] = 1.0  # row b selects parent(b)
    P_scatter = np.zeros((B, B), np.float32)
    for i in range(B):
        if parent[i] >= 0:
            P_scatter[parent[i], i] = 1.0

    has_parent = (parent >= 0).astype(np.float32)[:, None]  # (B,1)
    m_fix = (jt == JOINT_FIXED).astype(np.float32)[:, None]
    m_rev = (jt == JOINT_REVOLUTE).astype(np.float32)[:, None]
    m_cmp = (jt == JOINT_COMPOUND).astype(np.float32)[:, None]
    has_fix = bool((jt == JOINT_FIXED).any())
    has_rev = bool((jt == JOINT_REVOLUTE).any())
    has_cmp = bool((jt == JOINT_COMPOUND).any())

    axis_c = model.joint_axis.T[:, :, None]  # (3,B,1)
    xp_t = model.joint_X_p[:, 0:3].T[:, :, None]  # (3,B,1)
    xp_q = model.joint_X_p[:, 3:7].T[:, :, None]  # (4,B,1)
    xc_q = model.joint_X_c[:, 3:7].T[:, :, None]  # (4,B,1)
    com = model.body_com.T[:, :, None]  # (3,B,1)
    com_parent = model.body_com[parent_safe].T[:, :, None]  # (3,B,1)
    rp_local = xp_t - com_parent  # r_p = R_wp @ (xp_t - com_p), see below

    dof_idx = np.clip(
        model.joint_qd_start[:, None] + np.arange(3)[None, :], 0, n_qd - 1
    )  # (B,3)
    D = np.zeros((3, B, n_qd), np.float32)
    for k in range(3):
        D[k, np.arange(B), dof_idx[:, k]] = 1.0  # (B,n_qd) selector per dof k

    lim = np.stack(
        [
            model.joint_limit_lower[dof_idx],
            model.joint_limit_upper[dof_idx],
            model.joint_limit_ke[dof_idx],
            model.joint_limit_kd[dof_idx],
        ],
        0,
    ).transpose(0, 2, 1)[..., None]  # (4,3,B,1)

    # per-body contact blocks (contacts are emitted body-sorted by
    # make_ground_contacts; verify and compute slices)
    cb = model.contact_body
    assert (np.diff(cb) >= 0).all(), "contacts must be body-sorted"
    c_slices = []
    for b in range(B):
        lo = int(np.searchsorted(cb, b, side="left"))
        hi = int(np.searchsorted(cb, b, side="right"))
        c_slices.append((lo, hi))
    # Per-contact constants as eight (C,1) planes. These tile-pad lanes
    # 128x in VMEM (~6 MB for laikago hull) — but lane-packing them into
    # one (C,8) array was MEASURED 19% slower at e_tile=128 (the per-chunk
    # per-substep lane extracts outweigh the saved storage), and the VMEM
    # ceiling at larger e_tile is set by the double-buffered (S,n_qd,E)
    # target/act blocks + (CHUNK,E) contact temporaries, not by these
    # constants (Mosaic OOM trace, 2026-08-16). Plane layout it is.
    cpt = model.contact_point.T[:, :, None]  # (3,C,1)
    cdist = model.contact_dist[:, None]  # (C,1)
    cmat = model.contact_material.T[:, :, None]  # (4,C,1) ke kd kf mu

    # Lane-major uniform per-body blocks for the grad kernel's fori_loop
    # contact transpose: (B, Cm) rows, body b's contacts in row b, padded
    # with points 1e6 above the ground (inactive -> zero force AND zero
    # gradient). Lane-major keeps them tiny in VMEM (~131 KB vs the 6 MB
    # sublane-major planes); the loop transposes one (1,Cm) row per body.
    counts = [hi - lo for lo, hi in c_slices]
    Cm = max(8, int(-(-max(counts + [1]) // 8) * 8))  # max count, 8-aligned
    cpt_bm = np.zeros((3, B, Cm), np.float32)
    cpt_bm[1] = 1e6
    cdist_bm = np.zeros((B, Cm), np.float32)
    cmat_bm = np.zeros((4, B, Cm), np.float32)
    for b in range(B):
        lo, hi = c_slices[b]
        n = hi - lo
        cpt_bm[:, b, :n] = model.contact_point[lo:hi].T
        cdist_bm[b, :n] = model.contact_dist[lo:hi]
        cmat_bm[:, b, :n] = model.contact_material[lo:hi].T

    gx, gy, gz = [float(g) for g in model.gravity]
    attach_ke = float(model.joint_attach_ke)
    attach_kd = float(model.joint_attach_kd)
    ang_damp = 0.01

    # FLAT contact layout (VERDICT round-3 #4): for sparse-contact robots
    # (quad: 8 candidates/body over 26 bodies) the per-body fori_loop's
    # (1,Cm,E) blocks starve the VPU — 26 sequential iterations of tiny
    # work. The flat layout computes ALL contacts as (Cf,E) planes in one
    # vectorized force-law evaluation, with one-hot MXU matmuls gathering
    # body states per contact (Sg) and scattering row forces back (Ss).
    # Dense-contact robots (C > FLAT_MAX_C) use the CHUNKED variant:
    # K uniform chunks of Cc rows, constants ref-indexed per chunk.
    Cf, Cc_flat, K_flat = flat_layout_plan(model, contact_layout)
    C_real = int(model.contact_count)
    if Cf and K_flat == 1:
        Sg_np = np.zeros((Cf, B), np.float32)
        Sg_np[np.arange(C_real), cb] = 1.0
        cpt_fl = np.zeros((3, Cf, 1), np.float32)
        cpt_fl[:, :C_real, 0] = model.contact_point.T
        # pad rows: huge positive clearance -> inactive, zero force AND
        # zero gradient (the `active` factor multiplies both)
        cdist_fl = np.full((Cf, 1), -1e6, np.float32)
        cdist_fl[:C_real, 0] = model.contact_dist
        cmat_fl = np.zeros((4, Cf, 1), np.float32)
        cmat_fl[:, :C_real, 0] = model.contact_material.T
        com_fl = np.zeros((3, Cf, 1), np.float32)  # body COM per contact
        com_fl[:, :C_real, 0] = np.asarray(model.body_com)[cb].T
    elif Cf:
        Cc = Cc_flat
        Sg_ck = np.zeros((K_flat, Cc, B), np.float32)
        cpt_ck = np.zeros((K_flat, 3, Cc, 1), np.float32)
        cdist_ck = np.full((K_flat, Cc, 1), -1e6, np.float32)  # pads inactive
        cmat_ck = np.zeros((K_flat, 4, Cc, 1), np.float32)
        com_ck = np.zeros((K_flat, 3, Cc, 1), np.float32)
        for kk in range(K_flat):
            lo = kk * Cc
            hi = min(lo + Cc, C_real)
            n = hi - lo
            if n <= 0:
                continue
            Sg_ck[kk, np.arange(n), cb[lo:hi]] = 1.0
            cpt_ck[kk, :, :n, 0] = model.contact_point[lo:hi].T
            cdist_ck[kk, :n, 0] = model.contact_dist[lo:hi]
            cmat_ck[kk, :, :n, 0] = model.contact_material[lo:hi].T
            com_ck[kk, :, :n, 0] = np.asarray(model.body_com)[cb[lo:hi]].T
        Ss_ck = Sg_ck.transpose(0, 2, 1).copy()  # (K,B,Cc)

    const_arrays = dict(
        P_gather=jnp.asarray(P_gather),
        P_scatter=jnp.asarray(P_scatter),
        has_parent=jnp.asarray(has_parent),
        m_fix=jnp.asarray(m_fix),
        m_rev=jnp.asarray(m_rev),
        m_cmp=jnp.asarray(m_cmp),
        axis_c=jnp.asarray(axis_c, F32),
        xp_t=jnp.asarray(xp_t),
        xp_q=jnp.asarray(xp_q),
        xc_q=jnp.asarray(xc_q),
        com=jnp.asarray(com),
        rp_local=jnp.asarray(rp_local),
        D=jnp.asarray(D),
        lim=jnp.asarray(lim, F32),
    )
    if Cf and K_flat == 1:
        # flat layout replaces every chunk/loop contact constant
        const_arrays.update(
            Sg=jnp.asarray(Sg_np),
            Ss=jnp.asarray(Sg_np.T.copy()),
            cpt_fl=jnp.asarray(cpt_fl),
            cdist_fl=jnp.asarray(cdist_fl),
            cmat_fl=jnp.asarray(cmat_fl),
            com_fl=jnp.asarray(com_fl),
        )
    elif Cf:
        # chunked flat: leading-K constants, kept as VMEM refs in-kernel
        # (the _ck suffix is the load_consts contract)
        const_arrays.update(
            Sg_ck=jnp.asarray(Sg_ck),
            Ss_ck=jnp.asarray(Ss_ck),
            cpt_ck=jnp.asarray(cpt_ck),
            cdist_ck=jnp.asarray(cdist_ck),
            cmat_ck=jnp.asarray(cmat_ck),
            com_ck=jnp.asarray(com_ck),
        )
    else:
        const_arrays.update(
            cpt=jnp.asarray(cpt),
            cdist=jnp.asarray(cdist),
            cmat=jnp.asarray(cmat),
            cpt_bm=jnp.asarray(cpt_bm),
            cdist_bm=jnp.asarray(cdist_bm),
            cmat_bm=jnp.asarray(cmat_bm),
        )

    # ---- the substep on planes ----------------------------------------
    def _body_chunk_args(bq, bqd, C, b):
        qb = tuple(bq[3 + k][b : b + 1] for k in range(4))  # (1,E)
        tb = tuple(bq[k][b : b + 1] for k in range(3))
        wb = tuple(bqd[k][b : b + 1] for k in range(3))
        vb = tuple(bqd[3 + k][b : b + 1] for k in range(3))
        com_b = tuple(C["com"][k, b : b + 1] for k in range(3))
        return qb, tb, wb, vb, com_b

    def _chunk_consts(C, c0, c1):
        pt = tuple(C["cpt"][k, c0:c1] for k in range(3))  # (cb,1)
        dist = C["cdist"][c0:c1]
        mat = tuple(C["cmat"][k, c0:c1] for k in range(4))
        return pt, dist, mat

    def contact_rows(bq, bqd, C):
        """Chunked per-body contact reduction -> torque/force row planes
        ((B,E) x3, (B,E) x3)."""
        E = bq.shape[-1]
        CHUNK = contact_chunk
        rows_t = {0: [], 1: [], 2: []}
        rows_f = {0: [], 1: [], 2: []}
        for b in range(B):
            lo, hi = c_slices[b]
            acc_t = [jnp.zeros((1, E), F32) for _ in range(3)]
            acc_f = [jnp.zeros((1, E), F32) for _ in range(3)]
            qb, tb, wb, vb, com_b = _body_chunk_args(bq, bqd, C, b)
            for c0 in range(lo, hi, CHUNK):
                c1 = min(c0 + CHUNK, hi)
                pt, dist, mat = _chunk_consts(C, c0, c1)
                dt_, df_ = _chunk_force(qb, tb, wb, vb, com_b, pt, dist, mat)
                for k in range(3):
                    acc_t[k] = acc_t[k] + dt_[k]
                    acc_f[k] = acc_f[k] + df_[k]
            for k in range(3):
                rows_t[k].append(acc_t[k])
                rows_f[k].append(acc_f[k])
        con_t = tuple(jnp.concatenate(rows_t[k], 0) for k in range(3))
        con_f = tuple(jnp.concatenate(rows_f[k], 0) for k in range(3))
        return con_t, con_f

    # body-group size for the looped contact paths: one fori iteration
    # processes G bodies as (G,Cm,E) blocks. MEASURED on v5e (laikago,
    # E=1024, training fwd+bwd): G=1 1.51M, G=2 1.46M, G=4 1.32M
    # env-steps/s, G=6 VMEM-OOM — wider 3D blocks do NOT vectorize
    # better (Mosaic iterates the leading dim anyway) and cost VMEM, so
    # per-body it is. The (G,·,·) formulation is kept because the
    # one-hot group extraction eliminated the per-row in-kernel
    # transposes of the earlier per-body version (1.44M -> 1.51M).
    G_BODIES = 1
    n_groups = B

    def _group_extract(g, bq, bqd, C):
        """One-hot extraction of group g's rows (lax.dynamic_slice on
        values does not lower in Mosaic): states as (G,1,E), contact
        constants as (G,Cm,1); plus the (G,B) onehot for scattering."""
        rows_ids = g * G_BODIES + jax.lax.broadcasted_iota(
            jnp.int32, (G_BODIES, B), 0
        )
        cols = jax.lax.broadcasted_iota(jnp.int32, (G_BODIES, B), 1)
        oh = (rows_ids == cols).astype(F32)  # (G,B); all-zero rows past B
        row = lambda plane: _mm(oh, plane)[:, None, :]  # (G,1,X)
        cst = lambda plane: _mm(oh, plane)[:, :, None]  # (G,Cm,1)
        qb = tuple(row(bq[3 + k]) for k in range(4))
        tb = tuple(row(bq[k]) for k in range(3))
        wb = tuple(row(bqd[k]) for k in range(3))
        vb = tuple(row(bqd[3 + k]) for k in range(3))
        com_b = tuple(row(C["com"][k]) for k in range(3))
        pt = tuple(cst(C["cpt_bm"][k]) for k in range(3))
        dist = cst(C["cdist_bm"])
        mat = tuple(cst(C["cmat_bm"][k]) for k in range(4))
        return oh, (qb, tb, wb, vb, com_b), (pt, dist, mat)

    def contact_rows_loop(bq, bqd, C):
        """contact_rows as a fori_loop over body GROUPS using only the
        tiny lane-major (B,Cm) constant blocks — the grad kernel's
        forward sweep uses this so the 6 MB sublane-major planes never
        enter that kernel's VMEM. Returns ((B,E) x3, (B,E) x3) like
        contact_rows."""
        E = bq.shape[-1]

        def body_fn(g, carry):
            t_acc, f_acc = carry  # (3,B,E) each
            oh, args, consts = _group_extract(g, bq, bqd, C)
            dt_, df_ = _chunk_force(*args, *consts)  # ((G,1,E) x3) x2
            ohT = jnp.transpose(oh, (1, 0))  # (B,G)
            t_acc = t_acc + jnp.stack(
                [_mm(ohT, dt_[k][:, 0, :]) for k in range(3)], 0
            )
            f_acc = f_acc + jnp.stack(
                [_mm(ohT, df_[k][:, 0, :]) for k in range(3)], 0
            )
            return t_acc, f_acc

        zero = jnp.zeros((3, B, E), F32)
        t_acc, f_acc = jax.lax.fori_loop(0, n_groups, body_fn, (zero, zero))
        return tuple(t_acc[k] for k in range(3)), tuple(f_acc[k] for k in range(3))

    def contact_bwd(bq, bqd, C, d_rows_t, d_rows_f):
        """Transpose of contact_rows as a ``fori_loop`` over body groups.

        One loop iteration recomputes a group's (padded, lane-major)
        contact blocks and runs their chunk vjp — the loop boundary
        bounds live VMEM to ONE group's (G,Cm,E) intermediates. (An
        unrolled python-loop transpose was measured at 38-42 MB scoped
        VMEM vs the 16 MB v5e budget: Mosaic keeps every chunk's vjp
        residuals on the stack simultaneously.)
        Returns cotangents (d_bq (7,B,E), d_bqd (6,B,E))."""
        E = bq.shape[-1]

        def body_fn(g, carry):
            dbq_acc, dbqd_acc = carry
            oh, args, consts = _group_extract(g, bq, bqd, C)
            pt, dist, mat = consts

            _, vjp = jax.vjp(
                lambda qb, tb, wb, vb, com_b: _chunk_force(
                    qb, tb, wb, vb, com_b, pt, dist, mat
                ),
                *args,
            )
            row = lambda plane: _mm(oh, plane)[:, None, :]  # (G,1,E)
            ct = (
                tuple(row(d_rows_t[k]) for k in range(3)),
                tuple(row(d_rows_f[k]) for k in range(3)),
            )
            gr = vjp(ct)
            ohT = jnp.transpose(oh, (1, 0))  # (B,G)
            # scatter rows back: dbq rows 0-2 = translation (gr[1]),
            # 3-6 = quat (gr[0]); dbqd rows 0-2 = angular (gr[2]),
            # 3-5 = linear (gr[3])
            back = lambda x: _mm(ohT, x[:, 0, :])  # (G,1,E) -> (B,E)
            dbq_acc = dbq_acc + jnp.stack(
                [back(gr[1][k]) for k in range(3)]
                + [back(gr[0][k]) for k in range(4)], 0
            )
            dbqd_acc = dbqd_acc + jnp.stack(
                [back(gr[2][k]) for k in range(3)]
                + [back(gr[3][k]) for k in range(3)], 0
            )
            return dbq_acc, dbqd_acc

        zero_q = jnp.zeros((7, B, E), F32)
        zero_qd = jnp.zeros((6, B, E), F32)
        return jax.lax.fori_loop(0, n_groups, body_fn, (zero_q, zero_qd))

    def substep_rest(bq, bqd, tgt, act, C, con_t, con_f, res=None, want_obs=False):
        """Joints + symplectic Euler given precomputed contact row forces.
        Same semantics as the reference's post-contact pipeline
        (integrator_euler.py:289-451 + :21-91)."""
        t_c = (bq[0], bq[1], bq[2])
        q_c = (bq[3], bq[4], bq[5], bq[6])
        w_c = (bqd[0], bqd[1], bqd[2])
        v_c = (bqd[3], bqd[4], bqd[5])
        E = bq.shape[-1]

        if res is None:
            body_f_t = [jnp.zeros((B, E), F32)] * 3  # torque accumulator
            body_f_f = [jnp.zeros((B, E), F32)] * 3  # force accumulator
        else:
            body_f_t = [res[k] for k in range(3)]
            body_f_f = [res[3 + k] for k in range(3)]

        for k in range(3):
            body_f_t[k] = body_f_t[k] + con_t[k]
            body_f_f[k] = body_f_f[k] + con_f[k]
        if want_obs:
            grf_planes = list(body_f_t) + list(body_f_f)  # post-contact snapshot

        # ===== joints (vectorized over B) ===============================
        pq_t = tuple(_mm(C["P_gather"], t_c[k]) for k in range(3))
        pq_q = tuple(_mm(C["P_gather"], q_c[k]) for k in range(4))
        w_p = tuple(_mm(C["P_gather"], w_c[k]) * C["has_parent"] for k in range(3))
        v_p = tuple(_mm(C["P_gather"], v_c[k]) * C["has_parent"] for k in range(3))

        xpq = tuple(C["xp_q"][k] for k in range(4))
        xpt = tuple(C["xp_t"][k] for k in range(3))
        X_wp_q = _qmul(pq_q, xpq)
        X_wp_t = _add3(pq_t, _qrot(pq_q, xpt))
        hp = C["has_parent"]
        X_wp_q = tuple(hp * X_wp_q[k] + (1 - hp) * xpq[k] for k in range(4))
        X_wp_t = tuple(hp * X_wp_t[k] + (1 - hp) * xpt[k] for k in range(3))

        rp_l = tuple(C["rp_local"][k] for k in range(3))
        r_p = _scale(_qrot(pq_q, rp_l), hp)
        comc = tuple(C["com"][k] for k in range(3))
        r_c = _scale(_qrot(q_c, comc), -1.0)

        x_err = _sub3(t_c, X_wp_t)
        r_err = _qmul(_qinv(X_wp_q), q_c)
        v_err = _sub3(v_c, v_p)
        w_err = _sub3(w_c, w_p)

        t_tot = [jnp.zeros((B, E), F32)] * 3
        f_tot = [jnp.zeros((B, E), F32)] * 3

        tgt3 = [_mm(C["D"][k], tgt) for k in range(3)]  # (B,E)
        # act=None: joint activations structurally zero (the reference
        # multiplies torque_mlp outputs by 0, dp_model.py:529) — skipping
        # them drops the act VMEM blocks and the D-matmuls entirely
        act3 = (
            [_mm(C["D"][k], act) for k in range(3)]
            if act is not None else [0.0, 0.0, 0.0]
        )

        def joint_force(k, q_ang, qd_ang):
            lo, hi_, lke, lkd = (C["lim"][j, k] for j in range(4))
            ke_, kd_ = C["gains"][0, k], C["gains"][1, k]
            below = q_ang < lo
            above = q_ang > hi_
            limit_f = jnp.where(
                below, lke * (lo - q_ang) - lkd * jnp.minimum(qd_ang, 0.0), 0.0
            )
            limit_f = jnp.where(
                above, lke * (hi_ - q_ang) - lkd * jnp.maximum(qd_ang, 0.0), limit_f
            )
            return ke_ * (q_ang - tgt3[k]) + kd_ * qd_ang + act3[k] - limit_f

        if has_fix:
            # axis-angle of r_err (Taylor-safe quat_to_axis_angle)
            sq = _dot3(r_err[:3], r_err[:3])
            is_zero = sq < 1e-12
            norms = jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))
            half = katan2(norms, r_err[3])
            ang = 2.0 * half
            small = jnp.abs(ang) < 1e-6
            sho = jnp.where(
                small, 0.5 - ang * ang / 48.0,
                jnp.sin(half) / jnp.where(small, 1.0, ang),
            )
            ang_err = tuple(r_err[k] / sho for k in range(3))
            ff = tuple(
                x_err[k] * attach_ke + v_err[k] * attach_kd for k in range(3)
            )
            tf = _qrot(X_wp_q, ang_err)
            tf = tuple(
                tf[k] * attach_ke + w_err[k] * attach_kd * ang_damp
                for k in range(3)
            )
            for k in range(3):
                f_tot[k] = f_tot[k] + C["m_fix"] * ff[k]
                t_tot[k] = t_tot[k] + C["m_fix"] * tf[k]

        if has_rev:
            axis = tuple(C["axis_c"][k] for k in range(3))
            axis_p = _qrot(X_wp_q, axis)
            axis_cw = _qrot(q_c, axis)
            s_tw = _dot3(r_err[:3], axis)
            q_ang = 2.0 * katan2(s_tw, r_err[3])
            qd_ang = _dot3(w_err, axis_p)
            fmag = joint_force(0, q_ang, qd_ang)
            tr = _scale(axis_p, fmag)
            swing = _cross(axis_p, axis_cw)
            fr = tuple(x_err[k] * attach_ke + v_err[k] * attach_kd for k in range(3))
            tr = tuple(
                tr[k]
                + swing[k] * attach_ke
                + (w_err[k] - qd_ang * axis_p[k]) * attach_kd * ang_damp
                for k in range(3)
            )
            for k in range(3):
                f_tot[k] = f_tot[k] + C["m_rev"] * fr[k]
                t_tot[k] = t_tot[k] + C["m_rev"] * tr[k]

        if has_cmp:
            qoff = tuple(C["xc_q"][k] for k in range(4))
            q_pc = _qmul(_qmul(_qinv(qoff), r_err), qoff)
            x, y, z, w = q_pc
            # matrix entries of q_pc needed for intrinsic-XYZ decompose
            m12 = 2 * (y * z - w * x)
            m22 = 1 - 2 * (x * x + y * y)
            m02 = 2 * (x * z + w * y)
            m01 = 2 * (x * y - w * z)
            m00 = 1 - 2 * (y * y + z * z)
            a0 = katan2(-m12, m22)
            a1 = kasin(jnp.clip(m02, -1 + 1e-7, 1 - 1e-7))
            a2 = katan2(-m01, m00)
            angles = (a0, a1, a2)

            ex = (jnp.ones_like(a0), jnp.zeros_like(a0), jnp.zeros_like(a0))
            sa, ca = jnp.sin(0.5 * a0), jnp.cos(0.5 * a0)
            q0 = (sa, jnp.zeros_like(sa), jnp.zeros_like(sa), ca)
            ax1 = _qrot(q0, (jnp.zeros_like(a0), jnp.ones_like(a0), jnp.zeros_like(a0)))
            sb, cbn = jnp.sin(0.5 * a1), jnp.cos(0.5 * a1)
            q1 = tuple(ax1[k] * sb for k in range(3)) + (cbn,)
            q10 = _qmul(q1, q0)
            ax2 = _qrot(q10, (jnp.zeros_like(a0), jnp.zeros_like(a0), jnp.ones_like(a0)))
            q_w = _qmul(X_wp_q, qoff)

            tc = [jnp.zeros((B, E), F32)] * 3
            for k, ax in enumerate([ex, ax1, ax2]):
                ax_w = _qrot(q_w, ax)
                fmag = joint_force(k, angles[k], _dot3(ax_w, w_err))
                for j in range(3):
                    tc[j] = tc[j] + fmag * ax_w[j]
            tc = [jnp.clip(t, -10000.0, 10000.0) for t in tc]
            fc = [
                jnp.clip(x_err[k] * attach_ke + v_err[k] * attach_kd, -10000.0, 10000.0)
                for k in range(3)
            ]
            for k in range(3):
                f_tot[k] = f_tot[k] + C["m_cmp"] * fc[k]
                t_tot[k] = t_tot[k] + C["m_cmp"] * tc[k]

        # scatter: child -= (t + r_c x f, f); parent += (t + r_p x f, f)
        trc = _cross(r_c, f_tot)
        trp = _cross(r_p, f_tot)
        for k in range(3):
            child_t = t_tot[k] + trc[k]
            parent_t = (t_tot[k] + trp[k]) * hp
            body_f_t[k] = body_f_t[k] - child_t + _mm(C["P_scatter"], parent_t)
            body_f_f[k] = body_f_f[k] - f_tot[k] + _mm(
                C["P_scatter"], f_tot[k] * hp
            )

        if want_obs:
            grf = jnp.stack(grf_planes, 0)  # (6,B,E)
            jaf = jnp.stack(list(body_f_t) + list(body_f_f), 0) - grf

        # ===== integrate (symplectic Euler, reference :21-91) ===========
        x_com = _add3(t_c, _qrot(q_c, comc))
        g = (gx, gy, gz)
        v1 = tuple(
            v_c[k] + (body_f_f[k] * C["inv_m"] + g[k]) * dt for k in range(3)
        )
        x1 = tuple(x_com[k] + v1[k] * dt for k in range(3))

        wb_ = _qrot_inv(q_c, w_c)
        tb_ = _qrot_inv(q_c, tuple(body_f_t))
        Iw = tuple(
            C["inertia"][i, 0] * wb_[0]
            + C["inertia"][i, 1] * wb_[1]
            + C["inertia"][i, 2] * wb_[2]
            for i in range(3)
        )
        tb_ = _sub3(tb_, _cross(wb_, Iw))
        It = tuple(
            C["inv_inertia"][i, 0] * tb_[0]
            + C["inv_inertia"][i, 1] * tb_[1]
            + C["inv_inertia"][i, 2] * tb_[2]
            for i in range(3)
        )
        w1 = _qrot(q_c, tuple(wb_[k] + It[k] * dt for k in range(3)))
        # dr = 0.5*dt*quat(w1,0)*r0 with pre-damping w1
        dq = _qmul((w1[0], w1[1], w1[2], jnp.zeros_like(w1[0])), q_c)
        r1 = _qnormalize(tuple(q_c[k] + 0.5 * dt * dq[k] for k in range(4)))
        w1 = tuple(jnp.clip(w1[k] * (1.0 - 0.1 * dt), -10.0, 10.0) for k in range(3))
        v1 = tuple(jnp.clip(v1[k], -10.0, 10.0) for k in range(3))
        new_t = _sub3(x1, _qrot(r1, comc))

        bq_new = jnp.stack(list(new_t) + list(r1), 0)
        bqd_new = jnp.stack(list(w1) + list(v1), 0)
        if want_obs:
            return bq_new, bqd_new, grf, jaf
        return bq_new, bqd_new

    def contact_rows_flat(bq, bqd, C):
        """ALL contacts as (Cf,E) planes in one vectorized force-law
        evaluation: one-hot (Cf,B) MXU gathers of the body states, the
        raw per-contact penalty law, and (B,Cf) MXU scatters of the row
        forces — no per-body loop. The profitable layout for quad-class
        (many-dof, sparse-contact) robots; signature-compatible with
        contact_rows/contact_rows_loop."""
        g = lambda plane: _mm(C["Sg"], plane)  # (Cf, E)
        qb = tuple(g(bq[3 + k]) for k in range(4))
        tb = tuple(g(bq[k]) for k in range(3))
        wb = tuple(g(bqd[k]) for k in range(3))
        vb = tuple(g(bqd[3 + k]) for k in range(3))
        com_c = tuple(C["com_fl"][k] for k in range(3))  # (Cf,1) static
        pt = tuple(C["cpt_fl"][k] for k in range(3))
        mat = tuple(C["cmat_fl"][k] for k in range(4))
        t_tot, f_tot = _contact_force_raw(
            qb, tb, wb, vb, com_c, pt, C["cdist_fl"], mat
        )
        con_t = tuple(-_mm(C["Ss"], t_tot[k]) for k in range(3))
        con_f = tuple(-_mm(C["Ss"], f_tot[k]) for k in range(3))
        return con_t, con_f

    def contact_bwd_flat(bq, bqd, C, d_rows_t, d_rows_f):
        """Transpose of contact_rows_flat: a monolithic in-kernel vjp.
        Safe here precisely because the flat layout is only chosen for
        small Cf — its ~2 dozen (Cf,E) residual planes fit VMEM (the
        dense-contact robots that cannot afford this stay on the
        fori_loop transpose)."""
        _, vjp = jax.vjp(lambda a, b: contact_rows_flat(a, b, C), bq, bqd)
        return vjp((tuple(d_rows_t), tuple(d_rows_f)))

    def _flat_chunk_rows(bq, bqd, Sg_k, Ss_k, com_k, cpt_k, dist_k, mat_k):
        """One flat chunk's contribution to the contact row planes:
        gather the chunk's body states via the (Cc,B) one-hot, evaluate
        the raw force law on (Cc,E) planes, scatter back via (B,Cc).
        Returns ((B,E) x3, (B,E) x3) — summed over chunks by the caller."""
        g = lambda plane: _mm(Sg_k, plane)
        qb = tuple(g(bq[3 + j]) for j in range(4))
        tb = tuple(g(bq[j]) for j in range(3))
        wb = tuple(g(bqd[j]) for j in range(3))
        vb = tuple(g(bqd[3 + j]) for j in range(3))
        t_tot, f_tot = _contact_force_raw(
            qb, tb, wb, vb,
            tuple(com_k[j] for j in range(3)),
            tuple(cpt_k[j] for j in range(3)),
            dist_k,
            tuple(mat_k[j] for j in range(4)),
        )
        return (
            tuple(-_mm(Ss_k, t_tot[j]) for j in range(3)),
            tuple(-_mm(Ss_k, f_tot[j]) for j in range(3)),
        )

    def _flat_chunk_consts(C, k):
        """Chunk k's constants. In-kernel the _ck entries are VMEM refs
        (load_consts) so ref[k] is a dynamic-index load; outside pallas
        they are jnp values and [k] is an ordinary gather."""
        return (
            C["Sg_ck"][k], C["Ss_ck"][k], C["com_ck"][k],
            C["cpt_ck"][k], C["cdist_ck"][k], C["cmat_ck"][k],
        )

    def contact_rows_flat_chunked(bq, bqd, C):
        """Chunked flat layout (dense-contact robots): fori_loop over K
        uniform contact chunks, each a fully vectorized (Cc,E) piece —
        K=6 iterations for laikago vs 13 per-body iterations of padded
        (1,192,E) blocks. Signature-compatible with contact_rows."""
        E = bq.shape[-1]

        def body(k, carry):
            t_acc, f_acc = carry  # (3,B,E) each
            dt_, df_ = _flat_chunk_rows(bq, bqd, *_flat_chunk_consts(C, k))
            t_acc = t_acc + jnp.stack(dt_, 0)
            f_acc = f_acc + jnp.stack(df_, 0)
            return t_acc, f_acc

        zero = jnp.zeros((3, B, E), F32)
        t, f = jax.lax.fori_loop(0, K_flat, body, (zero, zero))
        return tuple(t[j] for j in range(3)), tuple(f[j] for j in range(3))

    def contact_bwd_flat_chunked(bq, bqd, C, d_rows_t, d_rows_f):
        """Transpose of contact_rows_flat_chunked: fori_loop over chunks,
        one jax.vjp per chunk — the loop boundary bounds live VMEM to ONE
        chunk's (Cc,E) residuals (the reason the monolithic flat vjp is
        capped at FLAT_MAX_C rows). Each chunk's contribution enters the
        row planes additively, so every chunk sees the same row cotangent
        and the chunk cotangents sum to the full transpose."""
        E = bq.shape[-1]
        ct = (tuple(d_rows_t), tuple(d_rows_f))

        def body(k, carry):
            dbq, dbqd = carry
            consts = _flat_chunk_consts(C, k)
            _, vjp = jax.vjp(
                lambda a, b: _flat_chunk_rows(a, b, *consts), bq, bqd
            )
            gq, gqd = vjp(ct)
            return dbq + gq, dbqd + gqd

        zero_q = jnp.zeros((7, B, E), F32)
        zero_qd = jnp.zeros((6, B, E), F32)
        return jax.lax.fori_loop(0, K_flat, body, (zero_q, zero_qd))

    if Cf and K_flat == 1:
        fwd_rows = loop_rows = contact_rows_flat
        bwd_rows = contact_bwd_flat
    elif Cf:
        fwd_rows = loop_rows = contact_rows_flat_chunked
        bwd_rows = contact_bwd_flat_chunked
    else:
        fwd_rows, loop_rows, bwd_rows = (
            contact_rows, contact_rows_loop, contact_bwd,
        )

    def substep(bq, bqd, tgt, act, C, res=None, want_obs=False):
        """bq (7,B,E), bqd (6,B,E), tgt/act (n_qd,E), C = dict of consts
        (static + traced planes merged), res = optional (6,B,E) residual
        body forces in warp [torque, force] layout (reference wp_add,
        dp_model.py:1216-1221). With ``want_obs`` also returns the grf and
        jaf observable planes (6,B,E) with the reference's compute_forces
        semantics (integrator_euler.py:491-551)."""
        con_t, con_f = fwd_rows(bq, bqd, C)
        return substep_rest(
            bq, bqd, tgt, act, C, con_t, con_f, res=res, want_obs=want_obs
        )

    meta = dict(
        B=B, n_qd=n_qd, dof_idx=dof_idx, contacts_flat=Cf,
        flat_chunk=Cc_flat, flat_k=K_flat,
        contact_rows=fwd_rows, contact_rows_loop=loop_rows,
        contact_bwd=bwd_rows, substep_rest=substep_rest,
    )
    return substep, const_arrays, meta


def build_soa_parts(
    integrator: SemiImplicitIntegrator,
    params: SimParams,
    dt: float,
):
    """Back-compat combo of :func:`build_soa_static` + :func:`traced_planes`:
    (substep, const_arrays incl. the traced planes, meta)."""
    substep, const_arrays, meta = build_soa_static(integrator, dt)
    const_arrays = dict(const_arrays)
    const_arrays.update(traced_planes(integrator.model, params))
    return substep, const_arrays, meta


def build_soa_window(
    integrator: SemiImplicitIntegrator,
    params: SimParams,
    dt: float,
    substeps: int,
    n_frames: int,
    e_tile: int = 128,
    interpret: bool = False,
):
    """Whole-window forward rollout as ONE pallas program (serving/eval).

    Replaces the per-frame kernel-call unroll (F-1 ``pallas_call``s inside
    one jit) with a single program: grid (E//e_tile, F-1), the frame axis
    iterated innermost with the state carried in VMEM scratch across grid
    steps — between frames the state never touches HBM. Emits the same
    observables the reference snapshots at frame boundaries
    (dp_model.py:1226-1234): the state entering each frame interval plus
    that boundary substep's grf/jaf (compute_forces semantics,
    integrator_euler.py:491-551).

    Returns ``run(state, joint_targets (S,E,n_qd), joint_acts (S,E,n_qd),
    planes=None) -> (body_q (F,E,B,7), body_qd (F,E,B,6), grf (F,E,B,6),
    jaf (F,...))`` with S = substeps*(F-1)+1; the final row uses the last
    substep's inputs on the final state, exactly like integrator.rollout.

    The four identified-parameter planes (:func:`traced_planes`) are
    TRACED run-time inputs, not baked constants: pass ``planes`` per call
    (defaulting to ones derived from the build-time ``params``), so a
    serving process can swap checkpoints without recompiling the kernel
    (reference serving semantics: params are tensors fed to the same CUDA
    kernels, dp_model.py:1145-1248).
    """
    substep, static_consts, meta = build_soa_static(integrator, dt)
    B, n_qd = meta["B"], meta["n_qd"]
    sub = substeps
    F = n_frames
    const_names = list(static_consts.keys())
    cvals = list(static_consts.values())
    n_const = len(cvals)
    default_planes = traced_planes(integrator.model, params)

    def kernel(*refs):
        bq0_ref, bqd0_ref, tgt_ref, act_ref, last_tgt_ref, last_act_ref = refs[:6]
        const_refs = refs[6 : 6 + n_const]
        traced_refs = refs[6 + n_const : 10 + n_const]
        (fq_ref, fqd_ref, fgrf_ref, fjaf_ref,
         lq_ref, lqd_ref, lgrf_ref, ljaf_ref) = refs[10 + n_const : 18 + n_const]
        sq_ref, sqd_ref = refs[18 + n_const :]
        C = load_consts(const_names, const_refs)
        C.update(zip(TRACED_NAMES, (r[:] for r in traced_refs)))
        f = pl.program_id(1)

        @pl.when(f == 0)
        def _():
            sq_ref[:] = bq0_ref[:]
            sqd_ref[:] = bqd0_ref[:]

        bq, bqd = sq_ref[:], sqd_ref[:]
        # frame-boundary snapshot: state entering this interval
        fq_ref[0] = bq
        fqd_ref[0] = bqd
        # boundary substep with observables
        bq, bqd, grf, jaf = substep(
            bq, bqd, tgt_ref[0, 0], act_ref[0, 0], C, want_obs=True
        )
        fgrf_ref[0] = grf
        fjaf_ref[0] = jaf

        def body(i, carry):
            bq, bqd = carry
            return substep(bq, bqd, tgt_ref[0, i], act_ref[0, i], C)

        bq, bqd = jax.lax.fori_loop(1, sub, body, (bq, bqd))
        sq_ref[:] = bq
        sqd_ref[:] = bqd

        @pl.when(f == F - 2)
        def _():
            lq_ref[:] = bq
            lqd_ref[:] = bqd
            # final-row observables: last substep's inputs on the final
            # state (integrator.rollout's trailing simulate call)
            _, _, grf_l, jaf_l = substep(
                bq, bqd, last_tgt_ref[0], last_act_ref[0], C, want_obs=True
            )
            lgrf_ref[:] = grf_l
            ljaf_ref[:] = jaf_l

    def _spec(shape, idx_fn=None):
        if idx_fn is None:
            nd = len(shape)
            idx_fn = lambda i, f, nd=nd: (0,) * nd
        return pl.BlockSpec(shape, idx_fn, memory_space=pltpu.VMEM)

    def run(state: SimState, joint_targets, joint_acts, planes=None):
        E = state.body_q.shape[0]
        et = pick_tile(E, e_tile)  # legal lane tile for any serving E
        S = joint_targets.shape[0]
        assert S == sub * (F - 1) + 1, (S, sub, F)
        grid = (E // et, F - 1)  # frame axis innermost (sequential carry)

        if planes is None:
            planes = default_planes
        tvals = [planes[n] for n in TRACED_NAMES]
        tr_specs = []
        for t in tvals:
            if t.shape[-1] == 1:  # shared params: replicated to each tile
                tr_specs.append(_spec(t.shape))
            else:  # per-env params: tile the lane axis
                blk = t.shape[:-1] + (et,)
                nd = len(blk)
                tr_specs.append(
                    _spec(blk, lambda i, f, nd=nd: (0,) * (nd - 1) + (i,))
                )

        bq = state.body_q.transpose(2, 1, 0)  # (7,B,E)
        bqd = state.body_qd.transpose(2, 1, 0)
        tgt = joint_targets[: S - 1].transpose(0, 2, 1).reshape(F - 1, sub, n_qd, E)
        act = joint_acts[: S - 1].transpose(0, 2, 1).reshape(F - 1, sub, n_qd, E)
        last_tgt = joint_targets[S - 1 :].transpose(0, 2, 1)  # (1, n_qd, E)
        last_act = joint_acts[S - 1 :].transpose(0, 2, 1)

        in_specs = [
            _spec((7, B, et), lambda i, f: (0, 0, i)),
            _spec((6, B, et), lambda i, f: (0, 0, i)),
            _spec((1, sub, n_qd, et), lambda i, f: (f, 0, 0, i)),
            _spec((1, sub, n_qd, et), lambda i, f: (f, 0, 0, i)),
            _spec((1, n_qd, et), lambda i, f: (0, 0, i)),
            _spec((1, n_qd, et), lambda i, f: (0, 0, i)),
        ] + [_spec(c.shape) for c in cvals] + tr_specs
        out_specs = (
            _spec((1, 7, B, et), lambda i, f: (f, 0, 0, i)),
            _spec((1, 6, B, et), lambda i, f: (f, 0, 0, i)),
            _spec((1, 6, B, et), lambda i, f: (f, 0, 0, i)),
            _spec((1, 6, B, et), lambda i, f: (f, 0, 0, i)),
            _spec((7, B, et), lambda i, f: (0, 0, i)),
            _spec((6, B, et), lambda i, f: (0, 0, i)),
            _spec((6, B, et), lambda i, f: (0, 0, i)),
            _spec((6, B, et), lambda i, f: (0, 0, i)),
        )
        out_shape = (
            jax.ShapeDtypeStruct((F - 1, 7, B, E), F32),
            jax.ShapeDtypeStruct((F - 1, 6, B, E), F32),
            jax.ShapeDtypeStruct((F - 1, 6, B, E), F32),
            jax.ShapeDtypeStruct((F - 1, 6, B, E), F32),
            jax.ShapeDtypeStruct((7, B, E), F32),
            jax.ShapeDtypeStruct((6, B, E), F32),
            jax.ShapeDtypeStruct((6, B, E), F32),
            jax.ShapeDtypeStruct((6, B, E), F32),
        )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((7, B, et), F32),
                pltpu.VMEM((6, B, et), F32),
            ],
            interpret=interpret,
            compiler_params=(
                None if interpret
                else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
            ),
        )(bq, bqd, tgt, act, last_tgt, last_act, *cvals, *tvals)
        fq, fqd, fgrf, fjaf, lq, lqd, lgrf, ljaf = outs
        # (F,·,B,E) -> (F,E,B,·)
        aos = lambda x: x.transpose(0, 3, 2, 1)
        body_q = jnp.concatenate([aos(fq), aos(lq[None])], 0)
        body_qd = jnp.concatenate([aos(fqd), aos(lqd[None])], 0)
        grf = jnp.concatenate([aos(fgrf), aos(lgrf[None])], 0)
        jaf = jnp.concatenate([aos(fjaf), aos(ljaf[None])], 0)
        return body_q, body_qd, grf, jaf

    return run


def build_soa_rollout(
    integrator: SemiImplicitIntegrator,
    params: SimParams,
    dt: float,
    substeps: int,
    e_tile: int = 128,
    interpret: bool = False,
):
    """Returns run(state, joint_target (S,E,n_qd), joint_act (S,E,n_qd))
    -> SimState after S substeps. Residual forces assumed zero (they are
    zeroed in the model; reference dp_model.py:529/:536)."""
    substep, const_arrays, meta = build_soa_parts(integrator, params, dt)
    B, n_qd = meta["B"], meta["n_qd"]
    const_names = list(const_arrays.keys())

    # ---- kernel ---------------------------------------------------------
    def kernel(*refs):
        bq_ref, bqd_ref, tgt_ref, act_ref = refs[:4]
        const_refs = refs[4 : 4 + len(const_names)]
        out_q_ref, out_qd_ref = refs[4 + len(const_names) :]
        C = load_consts(const_names, const_refs)

        def body(i, carry):
            bq, bqd = carry
            return substep(bq, bqd, tgt_ref[i], act_ref[i], C)

        bq, bqd = jax.lax.fori_loop(
            0, substeps, body, (bq_ref[:], bqd_ref[:])
        )
        out_q_ref[:] = bq
        out_qd_ref[:] = bqd

    def _spec(shape, idx_fn=None):
        if idx_fn is None:
            nd = len(shape)
            idx_fn = lambda i, nd=nd: (0,) * nd
        return pl.BlockSpec(shape, idx_fn, memory_space=pltpu.VMEM)

    def run(state: SimState, joint_targets, joint_acts):
        """state: (E,B,·) AoS arrays; targets/acts (S,E,n_qd)."""
        E = state.body_q.shape[0]
        et = pick_tile(E, e_tile)
        grid = (E // et,)

        bq = state.body_q.transpose(2, 1, 0)  # (7,B,E)
        bqd = state.body_qd.transpose(2, 1, 0)  # (6,B,E)
        tgt = joint_targets.transpose(0, 2, 1)  # (S,n_qd,E)
        act = joint_acts.transpose(0, 2, 1)

        cvals = list(const_arrays.values())
        in_specs = [
            _spec((7, B, et), lambda i: (0, 0, i)),
            _spec((6, B, et), lambda i: (0, 0, i)),
            _spec((substeps, n_qd, et), lambda i: (0, 0, i)),
            _spec((substeps, n_qd, et), lambda i: (0, 0, i)),
        ] + [_spec(c.shape) for c in cvals]

        out_q, out_qd = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                _spec((7, B, et), lambda i: (0, 0, i)),
                _spec((6, B, et), lambda i: (0, 0, i)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((7, B, E), F32),
                jax.ShapeDtypeStruct((6, B, E), F32),
            ),
            interpret=interpret,
            compiler_params=(
                None if interpret
                else pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)
            ),
        )(bq, bqd, tgt, act, *cvals)
        return SimState(
            out_q.transpose(2, 1, 0), out_qd.transpose(2, 1, 0)
        )

    return run
