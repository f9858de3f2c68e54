"""Differentiable Pallas rollout (pallas_soa_grad) vs the XLA scan path:
values AND gradients, in interpret mode on CPU (the real-TPU compiled
path shares the same kernel body).

Gradient semantics being pinned: the custom-VJP backward must match
``jax.grad`` through the XLA rollout for every input the reference's
``ForwardWarp.backward`` returns adjoints for (dp_model.py:1294-1384):
initial state, joint targets, activations, residual forces, PD gains,
masses (via inv_mass + inertia planes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.sim.builder import ModelBuilder
from ppr_diffphys_tpu.sim.import_urdf import parse_urdf
from ppr_diffphys_tpu.sim.kinematics import eval_fk
from ppr_diffphys_tpu.sim.integrator import (
    SemiImplicitIntegrator,
    SimParams,
    SimState,
    rollout,
)
from ppr_diffphys_tpu.sim.pallas_soa_grad import rollout_soa

LAIKAGO = "/root/reference/data/urdf_templates/laikago/laikago.urdf"


@pytest.fixture(scope="module")
def setup():
    b = ModelBuilder()
    parse_urdf(
        LAIKAGO, b, xform_p=(0, 0.417, 0), floating=True, density=1000,
        armature=0.01, stiffness=220.0, damping=2.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    model = b.finalize().make_ground_contacts("hull:0.1")
    model.joint_attach_ke, model.joint_attach_kd = 16000.0, 200.0
    integ = SemiImplicitIntegrator(model)
    norm_I = jnp.asarray(
        np.asarray(model.body_inertia)
        / np.asarray(model.body_mass)[:, None, None]
    )
    return model, integ, norm_I


def _problem(model, E, sub, F, seed=0):
    S = sub * (F - 1) + 1
    rng = np.random.RandomState(seed)
    q = np.array(model.joint_q_init, np.float32)
    q[7:][[2, 5, 8, 11]] = -0.8
    qs = np.tile(q[None], (E, 1))
    # some envs penetrating the ground -> contact branch active
    qs[:, 1] += rng.uniform(-0.03, 0.01, E).astype(np.float32)
    body_q, body_qd = eval_fk(model, jnp.asarray(qs))
    tgt = jnp.asarray(rng.randn(S, E, model.n_qd) * 0.2, jnp.float32)
    act = jnp.asarray(rng.randn(S, E, model.n_qd) * 0.05, jnp.float32)
    res = jnp.asarray(rng.randn(S, E, model.n_links, 6) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.randn(F, E, model.n_links, 7), jnp.float32)
    wqd = jnp.asarray(rng.randn(F, E, model.n_links, 6), jnp.float32)
    return body_q, body_qd, tgt, act, res, wq, wqd


def _make_params(norm_I, ke, kd, mass):
    I = norm_I * mass[:, None, None]
    return SimParams(
        body_mass=mass, body_inv_mass=1.0 / mass,
        body_inertia=I, body_inv_inertia=jnp.linalg.inv(I),
        joint_target_ke=ke, joint_target_kd=kd,
    )


def test_rollout_soa_matches_xla_values_and_grads(setup):
    model, integ, norm_I = setup
    E, sub, F = 4, 3, 3
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)

    def loss(roll_fn):
        def f(ke, kd, mass, tgt, act, res, bq0, bqd0):
            p = _make_params(norm_I, ke, kd, mass)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, bqd0), tgt, act, res)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = loss(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    # e_tile=2 < E so the lane-1 param-grad accumulation across grid
    # steps is exercised too
    soa = loss(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, e_tile=2, interpret=True
        )
    )

    args = (ke0, kd0, mass0, tgt, act, res, body_q, body_qd)
    v1, v2 = xla(*args), soa(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)

    g1 = jax.grad(xla, argnums=tuple(range(8)))(*args)
    g2 = jax.grad(soa, argnums=tuple(range(8)))(*args)
    names = ["ke", "kd", "mass", "tgt", "act", "res", "bq0", "bqd0"]
    for n, a, b in zip(names, g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


def test_rollout_soa_without_res_buffers(setup):
    """with_res=False (the production default: residual forces are
    structurally zero, reference dp_model.py:529/:536) matches the XLA
    path at res=0 and returns zero res cotangents."""
    model, integ, norm_I = setup
    E, sub, F = 4, 3, 3
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=5)
    res = jnp.zeros_like(res)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)

    def mk(roll_fn):
        def f(ke, kd, mass, tgt, act, res, bq0, bqd0):
            p = _make_params(norm_I, ke, kd, mass)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, bqd0), tgt, act, res)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = mk(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    soa = mk(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, e_tile=2, interpret=True,
            with_res=False,
        )
    )
    args = (ke0, kd0, mass0, tgt, act, res, body_q, body_qd)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=1e-4)
    g1 = jax.grad(xla, argnums=(0, 2, 3, 6))(*args)
    g2 = jax.grad(soa, argnums=(0, 2, 3, 6))(*args)
    for n, a, b in zip(["ke", "mass", "tgt", "bq0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )
    dres = jax.grad(soa, argnums=5)(*args)
    assert float(jnp.abs(dres).max()) == 0.0


def test_window_kernel_matches_rollout(setup):
    """build_soa_window (single-program whole-window rollout, the serving
    path) reproduces integrator.rollout's frame states AND grf/jaf
    observables."""
    from ppr_diffphys_tpu.sim.pallas_soa import build_soa_window

    model, integ, norm_I = setup
    E, sub, F = 4, 3, 4
    body_q, body_qd, tgt, act, res, _, _ = _problem(model, E, sub, F, seed=9)
    res = jnp.zeros_like(res)
    p = _make_params(
        norm_I,
        jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)]),
        jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)]),
        jnp.asarray(model.body_mass),
    )
    st = SimState(body_q, body_qd)
    q1, qd1, grf1, jaf1 = rollout(integ, p, st, tgt, act, res, 5e-4, sub)
    kern = build_soa_window(integ, p, 5e-4, sub, F, e_tile=2, interpret=True)
    q2, qd2, grf2, jaf2 = kern(st, tgt, act)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(grf2), np.asarray(grf1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(jaf2), np.asarray(jaf1), atol=2e-2)


def test_rollout_soa_per_env_params(setup):
    """Per-env PD gains (system-ID sweeps) through the differentiable
    pallas path: lane-E traced planes, per-tile param-grad outputs."""
    model, integ, norm_I = setup
    E, sub, F = 4, 2, 2
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=11)
    res = jnp.zeros_like(res)
    rng = np.random.RandomState(1)
    ke0 = jnp.asarray(
        np.concatenate(
            [np.zeros((E, 6)), 220.0 * (1 + 0.2 * rng.rand(E, 12))], -1
        ),
        jnp.float32,
    )  # (E, n_qd) per-env gains
    kd0 = jnp.concatenate([jnp.zeros((E, 6)), 2.0 * jnp.ones((E, 12))], -1)
    mass0 = jnp.asarray(model.body_mass)

    def mk(roll_fn):
        def f(ke, tgt, bq0):
            p = _make_params(norm_I, ke, kd0, mass0)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, body_qd), tgt, act, res)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = mk(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    soa = mk(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, e_tile=2, interpret=True,
            with_res=False,
        )
    )
    args = (ke0, tgt, body_q)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=1e-4)
    g1 = jax.grad(xla, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(soa, argnums=(0, 1, 2))(*args)
    for n, a, b in zip(["ke_per_env", "tgt", "bq0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


@pytest.mark.slow
def test_phys_model_soa_engine_matches_xla():
    """phys_model with opts['phys_engine']='soa' produces the same losses
    and gradients as the default XLA engine (the wired-in training path).

    On the 8-device conftest mesh this also exercises the shard_map'd
    kernel region: the pallas rollout runs per-dp-shard (asserted below),
    so the comparison covers soa x multi-chip composition."""
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.data.amp_loader import DataLoader
    from ppr_diffphys_tpu.utils.config import build_opts

    outs = {}
    for engine in ("xla", "soa"):
        opts = build_opts(
            seqname="mi-pace", num_rounds=1, iters_per_round=2,
            logroot="/tmp/ppr_soa_engine_test", noise_std=0.0,
        )
        opts["phys_engine"] = engine
        m = phys_model(opts, DataLoader(opts))
        m.reinit_envs(2, frames_per_wdw=3, is_eval=False)
        assert m._mesh_for(2) is not None  # dp mesh active on the test host
        m.rng = jax.random.PRNGKey(11)
        out = m.forward(frame_start=np.zeros(2))
        grads, _, gnorm = m._grad_accum[-1][0], None, m._grad_accum[-1][2]
        outs[engine] = (float(out["total_loss"]), float(gnorm))
    l_x, g_x = outs["xla"]
    l_s, g_s = outs["soa"]
    np.testing.assert_allclose(l_s, l_x, rtol=2e-4)
    np.testing.assert_allclose(g_s, g_x, rtol=2e-3)


def _build_template(urdf, stiffness, damping, xform_y):
    b = ModelBuilder()
    parse_urdf(
        urdf, b, xform_p=(0, xform_y, 0), floating=True, density=1000,
        armature=0.01, stiffness=stiffness, damping=damping, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    model = b.finalize().make_ground_contacts("hull")
    model.joint_attach_ke, model.joint_attach_kd = 8000.0, 200.0
    integ = SemiImplicitIntegrator(model)
    norm_I = jnp.asarray(
        np.asarray(model.body_inertia)
        / np.asarray(model.body_mass)[:, None, None]
    )
    return model, integ, norm_I


@pytest.mark.slow
@pytest.mark.parametrize(
    "urdf,kp,kv,y0",
    [
        ("/root/reference/data/urdf_templates/quad.urdf", 660.0, 5.0, 0.05),
        ("/root/reference/data/urdf_templates/human.urdf", 660.0, 5.0, 0.05),
    ],
    ids=["quad", "human"],
)
def test_rollout_soa_big_templates(urdf, kp, kv, y0):
    """quad (26 bodies, COMPOUND joints) and human (19 bodies) through the
    differentiable pallas path: values + grads vs XLA — the in-kernel
    COMPOUND force branch (reference integrator_euler.py:411-445) is live
    here, not just laikago's REVOLUTE path. Root height chosen so some
    feet penetrate (contact branch active)."""
    model, integ, norm_I = _build_template(urdf, kp, kv, y0)
    E, sub, F = 2, 2, 2
    S = sub * (F - 1) + 1
    rng = np.random.RandomState(0)
    qs = np.tile(np.array(model.joint_q_init, np.float32)[None], (E, 1))
    qs[:, 1] += rng.uniform(-0.02, 0.01, E).astype(np.float32)
    body_q, body_qd = eval_fk(model, jnp.asarray(qs))
    tgt = jnp.asarray(rng.randn(S, E, model.n_qd) * 0.1, jnp.float32)
    act = jnp.zeros((S, E, model.n_qd), jnp.float32)
    res = jnp.zeros((S, E, model.n_links, 6), jnp.float32)
    wq = jnp.asarray(rng.randn(F, E, model.n_links, 7), jnp.float32)
    ke0 = jnp.concatenate([jnp.zeros(6), kp * jnp.ones(model.n_qd - 6)])
    kd0 = jnp.concatenate([jnp.zeros(6), kv * jnp.ones(model.n_qd - 6)])
    mass0 = jnp.asarray(model.body_mass)

    def mk(roll_fn):
        def f(ke, mass, tgt, bq0):
            p = _make_params(norm_I, ke, kd0, mass)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, body_qd), tgt, act, res)
            return jnp.sum(q_ * wq)
        return f

    xla = mk(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    soa = mk(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, e_tile=2, interpret=True,
            with_res=False, with_act=False,
        )
    )
    args = (ke0, mass0, tgt, body_q)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=2e-4)
    g1 = jax.grad(xla, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(soa, argnums=(0, 1, 2, 3))(*args)
    for n, a, b in zip(["ke", "mass", "tgt", "bq0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


def test_rollout_soa_chunked_interval(setup):
    """make_diff_chain splits one frame interval across several kernels
    (the 24 Hz / big-template VMEM plan, plan_chunks) — values and grads
    must match the XLA path exactly like the single-kernel case."""
    from ppr_diffphys_tpu.sim.pallas_soa_grad import make_diff_chain

    model, integ, norm_I = setup
    E, sub, F = 4, 5, 3
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=21)
    act = jnp.zeros_like(act)
    res = jnp.zeros_like(res)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)

    chain = make_diff_chain(
        integ, 5e-4, sub, chunk_sizes=[2, 2, 1], e_tile=2, interpret=True,
        with_res=False, with_act=False,
    )

    def mk(roll_fn):
        def f(ke, mass, tgt, bq0):
            p = _make_params(norm_I, ke, kd0, mass)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, body_qd), tgt, act, res)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = mk(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    soa = mk(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, interval_fn=chain,
        )
    )
    args = (ke0, mass0, tgt, body_q)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=1e-4)
    g1 = jax.grad(xla, argnums=(0, 1, 2, 3))(*args)
    g2 = jax.grad(soa, argnums=(0, 1, 2, 3))(*args)
    for n, a, b in zip(["ke", "mass", "tgt", "bq0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


def test_plan_chunks_budget():
    """The VMEM planner under the raised Mosaic cap (VMEM_LIMIT): the
    whole template x rate grid fits in ONE kernel; splits kick in only
    for extreme substeps x e_tile products; partitions are always exact
    and near-equal."""
    from ppr_diffphys_tpu.sim.pallas_soa import VMEM_LIMIT
    from ppr_diffphys_tpu.sim.pallas_soa_grad import (
        estimate_interval_vmem, plan_chunks,
    )

    budget = VMEM_LIMIT - 12 * 2 ** 20
    for sub, B, n_qd in [(33, 13, 18), (83, 13, 18), (33, 26, 81),
                         (83, 26, 81), (83, 19, 60)]:
        chunks = plan_chunks(sub, B, n_qd, 128, with_act=False)
        assert sum(chunks) == sub, (sub, chunks)
        assert max(chunks) - min(chunks) <= 1  # near-equal
        assert estimate_interval_vmem(
            max(chunks), B, n_qd, 128, with_act=False
        ) <= budget
        # the production grid runs as a single kernel per interval
        assert chunks == [sub], (sub, B, n_qd, chunks)
    # an extreme case must still split exactly
    big = plan_chunks(400, 26, 81, 256, with_act=False)
    assert len(big) > 1 and sum(big) == 400 and max(big) - min(big) <= 1
    assert estimate_interval_vmem(
        max(big), 26, 81, 256, with_act=False
    ) <= budget


def test_rollout_soa_observables_match_xla(setup):
    """grf/jaf frame observables (reference compute_forces semantics,
    integrator_euler.py:491-551) agree between the two paths."""
    model, integ, norm_I = setup
    E, sub, F = 2, 3, 3
    body_q, body_qd, tgt, act, res, _, _ = _problem(model, E, sub, F, seed=3)
    p = _make_params(
        norm_I,
        jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)]),
        jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)]),
        jnp.asarray(model.body_mass),
    )
    st = SimState(body_q, body_qd)
    q1, qd1, grf1, jaf1 = rollout(integ, p, st, tgt, act, res, 5e-4, sub)
    q2, qd2, grf2, jaf2 = rollout_soa(
        integ, p, st, tgt, act, res, 5e-4, sub, e_tile=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qd2), np.asarray(qd1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(grf2), np.asarray(grf1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(jaf2), np.asarray(jaf1), atol=2e-2)


def test_rollout_soa_live_joint_xp(setup):
    """Per-env live joint_X_p (the lab4d query_ja override, reference
    dp_interface.py:438-466) as traced XP_NAMES planes through the
    differentiable pallas path: values and gradients — including
    d(loss)/d(joint_X_p), which flows back into the kinematics-proxy
    MLPs in lab4d mode — match jax.grad through the XLA rollout."""
    model, integ, norm_I = setup
    E, sub, F = 4, 2, 2
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=7)
    res = jnp.zeros_like(res)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)

    # per-env anchor perturbation: translation jitter + renormalized quat
    # jitter on every non-root joint (the shapes query_ja produces)
    rng = np.random.RandomState(2)
    xp = np.tile(np.asarray(model.joint_X_p, np.float32)[None], (E, 1, 1))
    xp[:, 1:, 0:3] += rng.randn(E, model.n_links - 1, 3).astype(np.float32) * 5e-3
    xp[:, 1:, 3:7] += rng.randn(E, model.n_links - 1, 4).astype(np.float32) * 1e-2
    xp[..., 3:7] /= np.linalg.norm(xp[..., 3:7], axis=-1, keepdims=True)
    xp0 = jnp.asarray(xp)

    def mk(roll_fn):
        def f(xp, tgt, bq0):
            p = _make_params(norm_I, ke0, kd0, mass0)._replace(joint_X_p=xp)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, body_qd), tgt, act, res)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = mk(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    soa = mk(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, e_tile=2, interpret=True,
            with_res=False,
        )
    )
    args = (xp0, tgt, body_q)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=1e-4)
    g1 = jax.grad(xla, argnums=(0, 1, 2))(*args)
    g2 = jax.grad(soa, argnums=(0, 1, 2))(*args)
    for n, a, b in zip(["joint_X_p", "tgt", "bq0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


def test_rollout_soa_shared_joint_xp(setup):
    """Shared (B,7) joint_X_p override -> lane-1 XP planes whose
    gradients accumulate across env tiles (same machinery as the shared
    PD-gain planes)."""
    model, integ, norm_I = setup
    E, sub, F = 4, 2, 2
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=9)
    res = jnp.zeros_like(res)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)
    xp0 = jnp.asarray(model.joint_X_p, jnp.float32)  # (B, 7)

    def mk(roll_fn):
        def f(xp, bq0):
            p = _make_params(norm_I, ke0, kd0, mass0)._replace(joint_X_p=xp)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, body_qd), tgt, act, res)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = mk(lambda p, s, t, a, r: rollout(integ, p, s, t, a, r, 5e-4, sub))
    soa = mk(
        lambda p, s, t, a, r: rollout_soa(
            integ, p, s, t, a, r, 5e-4, sub, e_tile=2, interpret=True,
            with_res=False,
        )
    )
    args = (xp0, body_q)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=1e-4)
    g1 = jax.grad(xla, argnums=(0, 1))(*args)
    g2 = jax.grad(soa, argnums=(0, 1))(*args)
    for n, a, b in zip(["joint_X_p_shared", "bq0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


@pytest.mark.slow
def test_quad_serving_window_param_swap():
    """build_soa_window on quad (the serving kernel): the identified
    parameter planes are traced per-call inputs, so two different
    checkpoints' params flow through the SAME kernel instance — no
    rebuild — and produce different, finite trajectories (reference
    serving semantics: params are tensors fed to fixed CUDA kernels,
    dp_model.py:1145-1248)."""
    from ppr_diffphys_tpu.sim.pallas_soa import build_soa_window, traced_planes

    model, integ, norm_I = _build_template(
        "/root/reference/data/urdf_templates/quad.urdf", 660.0, 5.0, 0.05
    )
    E, sub, F = 2, 2, 3
    S = sub * (F - 1) + 1
    rng = np.random.RandomState(4)
    qs = np.tile(np.array(model.joint_q_init, np.float32)[None], (E, 1))
    qs[:, 1] += rng.uniform(-0.02, 0.01, E).astype(np.float32)
    body_q, body_qd = eval_fk(model, jnp.asarray(qs))
    st = SimState(body_q, body_qd)
    tgt = jnp.asarray(rng.randn(S, E, model.n_qd) * 0.1, jnp.float32)
    act = jnp.zeros_like(tgt)
    ke0 = jnp.concatenate([jnp.zeros(6), 660.0 * jnp.ones(model.n_qd - 6)])
    kd0 = jnp.concatenate([jnp.zeros(6), 5.0 * jnp.ones(model.n_qd - 6)])
    mass0 = jnp.asarray(model.body_mass)
    p1 = _make_params(norm_I, ke0, kd0, mass0)
    p2 = _make_params(norm_I, ke0 * 1.5, kd0, mass0 * 2.0)

    kern = build_soa_window(integ, p1, 5e-4, sub, F, e_tile=2, interpret=True)
    q1, _, _, _ = kern(st, tgt, act)  # build-time default planes (ckpt 1)
    q2, _, _, _ = kern(st, tgt, act, planes=traced_planes(model, p2))
    q1, q2 = np.asarray(q1), np.asarray(q2)
    assert np.isfinite(q1).all() and np.isfinite(q2).all()
    assert np.abs(q1[0] - q2[0]).max() < 1e-6  # same initial frame state
    assert np.abs(q1[-1] - q2[-1]).max() > 1e-5  # dynamics actually differ
    # and the swapped-in params reproduce the XLA rollout exactly
    qx, _, _, _ = rollout(
        integ, p2, st, tgt, act,
        jnp.zeros((S, E, model.n_links, 6), jnp.float32), 5e-4, sub,
    )
    np.testing.assert_allclose(q2, np.asarray(qx), atol=2e-5)


def test_contact_layout_flat_matches_chunked(setup, monkeypatch):
    """The flat all-contact layout reproduces the per-body-loop contact
    rows AND their vjp bit-comparably on the laikago fixture (layouts
    forced via build_soa_static's contact_layout). Covers BOTH flat
    variants: monolithic (fixture C=145 <= FLAT_MAX_C) and — with the
    chunk thresholds patched down to 64 — the CHUNKED variant (K=3
    uniform ref-indexed chunks, VERDICT round-4 #3)."""
    from ppr_diffphys_tpu.sim.integrator import default_sim_params as dsp
    from ppr_diffphys_tpu.sim.pallas_soa import build_soa_static, traced_planes

    model, integ, norm_I = setup
    E = 4
    rng = np.random.RandomState(13)
    q = np.array(model.joint_q_init, np.float32)
    q[7:][[2, 5, 8, 11]] = -0.8
    qs = np.tile(q[None], (E, 1))
    qs[:, 1] += rng.uniform(-0.03, 0.01, E).astype(np.float32)
    body_q, body_qd = eval_fk(model, jnp.asarray(qs))
    bq = jnp.asarray(body_q).transpose(2, 1, 0)  # (7,B,E)
    bqd = jnp.asarray(body_qd).transpose(2, 1, 0)

    planes = traced_planes(model, dsp(model))
    outs, bwds = {}, {}
    d_t = tuple(jnp.asarray(rng.randn(model.n_links, E), jnp.float32)
                for _ in range(3))
    d_f = tuple(jnp.asarray(rng.randn(model.n_links, E), jnp.float32)
                for _ in range(3))
    from ppr_diffphys_tpu.sim import pallas_soa

    for layout in ("flat", "chunked", "loop"):
        if layout == "chunked":
            monkeypatch.setattr(pallas_soa, "FLAT_MAX_C", 64)
            monkeypatch.setattr(pallas_soa, "FLAT_CHUNK_C", 64)
        _, consts, meta = build_soa_static(
            integ, 5e-4,
            contact_layout="flat" if layout == "chunked" else layout,
        )
        if layout == "chunked":
            monkeypatch.undo()
            assert meta["flat_k"] == 3 and meta["flat_chunk"] == 64
        elif layout == "flat":
            assert meta["flat_k"] == 1  # fixture C=145 <= FLAT_MAX_C
        C = dict(consts)
        C.update(planes)
        assert (meta["contacts_flat"] > 0) == (layout != "loop")
        outs[layout] = meta["contact_rows"](bq, bqd, C)
        bwds[layout] = meta["contact_bwd"](bq, bqd, C, d_t, d_f)
    for variant in ("flat", "chunked"):
        for k in range(3):
            np.testing.assert_allclose(
                np.asarray(outs[variant][0][k]), np.asarray(outs["loop"][0][k]),
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(outs[variant][1][k]), np.asarray(outs["loop"][1][k]),
                atol=1e-4,
            )
        for a, b in zip(bwds[variant], bwds["loop"]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-3,
            )
    # rows actually nonzero (some envs penetrate)
    assert float(jnp.abs(outs["flat"][1][1]).max()) > 0


def test_rollout_soa_chunked_flat_matches_xla(setup, monkeypatch):
    """End-to-end chunked-flat (chunk thresholds patched to 64 so the
    C=145 fixture splits into K=3 chunks; layout forced via the
    PPR_SOA_CONTACT_LAYOUT env override) THROUGH the pallas kernels in
    interpret mode: values and grads vs the XLA rollout. Exercises the
    load_consts ref contract — chunk constants stay VMEM refs indexed
    ref[k] inside the kernels' fori_loops (VERDICT round-4 #3)."""
    from ppr_diffphys_tpu.sim import pallas_soa

    monkeypatch.setattr(pallas_soa, "FLAT_MAX_C", 64)
    monkeypatch.setattr(pallas_soa, "FLAT_CHUNK_C", 64)
    model, integ, norm_I = setup
    E, sub, F = 4, 3, 3
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=21)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)
    zero_res = res * 0

    def loss(roll_fn):
        def f(ke, kd, mass, tgt, bq0, bqd0):
            p = _make_params(norm_I, ke, kd, mass)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, bqd0), tgt)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = loss(
        lambda p, s, t: rollout(integ, p, s, t, t * 0, zero_res, 5e-4, sub)
    )
    monkeypatch.setenv("PPR_SOA_CONTACT_LAYOUT", "flat")
    soa = loss(
        lambda p, s, t: rollout_soa(
            integ, p, s, t, t * 0, zero_res, 5e-4, sub, e_tile=2,
            interpret=True, with_res=False, with_act=False,
        )
    )
    args = (ke0, kd0, mass0, tgt, body_q, body_qd)
    v1, v2 = xla(*args), soa(*args)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    g1 = jax.grad(xla, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(soa, argnums=tuple(range(6)))(*args)
    for n, a, b in zip(["ke", "kd", "mass", "tgt", "bq0", "bqd0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4, err_msg="grad mismatch: " + n
        )


@pytest.mark.parametrize("mode", ["resid", "rows", "plain"])
def test_rollout_soa_residuals_modes_match_xla(setup, monkeypatch, mode):
    """The three backward primal-residual strategies (round-5: 'resid' =
    fwd kernel exports per-substep states+rows through HBM and the bwd
    kernel skips its forward re-sweep; 'rows' = bwd re-sweeps but stores
    rows in scratch; 'plain' = round-4 recompute) must all match jax.grad
    through the XLA rollout. Forced via PPR_SOA_RESIDUALS."""
    monkeypatch.setenv("PPR_SOA_RESIDUALS", mode)
    model, integ, norm_I = setup
    E, sub, F = 4, 3, 2
    body_q, body_qd, tgt, act, res, wq, wqd = _problem(model, E, sub, F, seed=31)
    ke0 = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)])
    kd0 = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)])
    mass0 = jnp.asarray(model.body_mass)
    zero_res = res * 0

    def loss(roll_fn):
        def f(ke, kd, mass, tgt, bq0, bqd0):
            p = _make_params(norm_I, ke, kd, mass)
            q_, qd_, _, _ = roll_fn(p, SimState(bq0, bqd0), tgt)
            return jnp.sum(q_ * wq) + jnp.sum(qd_ * wqd)
        return f

    xla = loss(
        lambda p, s, t: rollout(integ, p, s, t, t * 0, zero_res, 5e-4, sub)
    )
    soa = loss(
        lambda p, s, t: rollout_soa(
            integ, p, s, t, t * 0, zero_res, 5e-4, sub, e_tile=2,
            interpret=True, with_res=False, with_act=False,
        )
    )
    args = (ke0, kd0, mass0, tgt, body_q, body_qd)
    np.testing.assert_allclose(float(xla(*args)), float(soa(*args)), rtol=1e-4)
    g1 = jax.grad(xla, argnums=tuple(range(6)))(*args)
    g2 = jax.grad(soa, argnums=tuple(range(6)))(*args)
    for n, a, b in zip(["ke", "kd", "mass", "tgt", "bq0", "bqd0"], g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(
            b / scale, a / scale, atol=5e-4,
            err_msg="grad mismatch (%s): %s" % (mode, n),
        )


def test_pick_e_tile_template_grid():
    """Pin the auto (env-tile, residuals-mode) choices for the
    production template x rate grid. Round-5 joint rule (measured,
    docs/results/round5/train_tile_sweep.jsonl): when tile 512 cannot
    afford the 'resid' backward but 256 can, halve to 256 — on laikago
    24 Hz 256+resid measured 2.72M env-steps/s vs 512+rows 2.26M; on
    quad the flipped cell measured 5.08M (round 4: 4.53M). No halving
    below 256 (tile 128 measured 20% slower than 512 on laikago 60 Hz,
    BENCHMARKS.md round 3)."""
    from ppr_diffphys_tpu.sim.pallas_soa_grad import (
        pick_e_tile, pick_residuals_mode, plan_chunks,
    )

    grid = {
        (33, 13, 18): (512, "resid"),  # laikago 60 Hz (measured 2.89M)
        (83, 13, 18): (256, "resid"),  # laikago 24 Hz (2.72M > 512+rows 2.26M)
        (33, 26, 81): (256, "resid"),  # quad 60 Hz (measured 5.08M)
        (83, 26, 81): (256, "plain"),  # quad 24 Hz (resid over VMEM budget)
        (33, 19, 57): (256, "resid"),  # human 60 Hz
        (83, 19, 57): (256, "rows"),   # human 24 Hz (resid over VMEM budget)
    }
    for (sub, B, n_qd), (want_et, want_mode) in grid.items():
        et = pick_e_tile(sub, B, n_qd, with_act=False)
        assert et == want_et, ((sub, B, n_qd), et, want_et)
        mode = pick_residuals_mode(sub, B, n_qd, et, with_act=False)
        assert mode == want_mode, ((sub, B, n_qd), mode, want_mode)
        # the chosen tile really is single-kernel
        assert plan_chunks(sub, B, n_qd, et, with_act=False) == [sub]


def test_vmem_estimators_honor_forced_flat_mono(monkeypatch):
    """The VMEM planners must size flat-contact temporaries by the rows
    the kernel holds LIVE: with PPR_SOA_CONTACT_LAYOUT=flat-mono forced
    at dense-contact scale (laikago Cf=1456), the monolithic vjp keeps
    ALL rows' residuals — the old total-only rule assumed chunking
    (256 rows) and under-budgeted ~5x, making pick_e_tile select tiles
    the kernel then VMEM-OOMs on (round-5 review finding)."""
    from ppr_diffphys_tpu.sim.pallas_soa import (
        estimate_window_vmem, flat_chunk_rows,
    )
    from ppr_diffphys_tpu.sim.pallas_soa_grad import (
        estimate_interval_vmem, pick_e_tile,
    )

    Cf = 1456  # laikago hull candidates, 8-padded
    # default (chunked) rule
    assert flat_chunk_rows(Cf) == 256
    base_iv = estimate_interval_vmem(
        33, 13, 18, 256, with_act=False, contacts_flat=Cf
    )
    base_win = estimate_window_vmem(33, 13, 18, 256, contacts_flat=Cf)
    et_base = pick_e_tile(33, 13, 18, with_act=False, contacts_flat=Cf)

    monkeypatch.setenv("PPR_SOA_CONTACT_LAYOUT", "flat-mono")
    assert flat_chunk_rows(Cf) == Cf
    mono_iv = estimate_interval_vmem(
        33, 13, 18, 256, with_act=False, contacts_flat=Cf
    )
    mono_win = estimate_window_vmem(33, 13, 18, 256, contacts_flat=Cf)
    # monolithic residuals dwarf the chunked ones (~Cf/256 on the
    # contact-temporary term)
    assert mono_iv > 2 * base_iv, (mono_iv, base_iv)
    assert mono_win > base_win
    # and the tile planner reacts: a smaller (or equal) tile than the
    # chunked plan's, never a larger one it cannot afford
    et_mono = pick_e_tile(33, 13, 18, with_act=False, contacts_flat=Cf)
    assert et_mono <= et_base, (et_mono, et_base)
    assert et_mono <= 256
