"""Pallas SoA megakernel equivalence vs the XLA scan path (interpret mode
so it runs on the CPU test mesh; the real-TPU equivalence was additionally
verified at 4096 envs to ~5e-5 over 33 substeps)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.sim.builder import ModelBuilder
from ppr_diffphys_tpu.sim.import_urdf import parse_urdf
from ppr_diffphys_tpu.sim.kinematics import eval_fk
from ppr_diffphys_tpu.sim.integrator import (
    SemiImplicitIntegrator,
    SimState,
    default_sim_params,
)

LAIKAGO = "/root/reference/data/urdf_templates/laikago/laikago.urdf"


def test_soa_kernel_matches_xla_path():
    from ppr_diffphys_tpu.sim.pallas_soa import build_soa_rollout

    b = ModelBuilder()
    parse_urdf(
        LAIKAGO, b, xform_p=(0, 0.417, 0), floating=True, density=1000,
        armature=0.01, stiffness=220.0, damping=2.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    model = b.finalize().make_ground_contacts("hull:0.05")
    model.joint_attach_ke, model.joint_attach_kd = 16000.0, 200.0
    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)._replace(
        joint_target_ke=jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)]),
        joint_target_kd=jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)]),
    )

    q = np.array(model.joint_q_init, np.float32)
    q[7:][[2, 5, 8, 11]] = -0.8
    E, S = 8, 4
    rng = np.random.RandomState(0)
    qs = np.tile(q[None], (E, 1))
    qs[:, 1] += rng.uniform(-0.02, 0.02, E).astype(np.float32)
    body_q, body_qd = eval_fk(model, jnp.asarray(qs))
    st = SimState(body_q, body_qd)

    tgt = jnp.tile(
        jnp.concatenate([jnp.zeros(6), q[7:]])[None, None], (S, E, 1)
    )
    act = jnp.zeros((S, E, model.n_qd))
    res = jnp.zeros((E, model.n_links, 6))

    kern = build_soa_rollout(integ, params, 5e-4, S, e_tile=8, interpret=True)
    out = kern(st, tgt, act)

    def run_xla(s):
        for i in range(S):
            s = integ.step_only(params, s, tgt[i], act[i], res, 5e-4)
        return s

    ref = run_xla(st)
    np.testing.assert_allclose(
        np.asarray(out.body_q), np.asarray(ref.body_q), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.body_qd), np.asarray(ref.body_qd), atol=2e-3
    )


def test_soa_kernel_matches_xla_random_states():
    """Adversarial equivalence: random poses near/under the ground with
    random velocities exercise the contact branches (penetration, sliding
    friction cap, force clamps) and both joint paths."""
    from ppr_diffphys_tpu.sim.pallas_soa import build_soa_rollout
    from ppr_diffphys_tpu.ops import quat_normalize

    b = ModelBuilder()
    parse_urdf(
        LAIKAGO, b, xform_p=(0, 0.417, 0), floating=True, density=1000,
        armature=0.01, stiffness=220.0, damping=2.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    model = b.finalize().make_ground_contacts("hull:0.05")
    model.joint_attach_ke, model.joint_attach_kd = 16000.0, 200.0
    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)._replace(
        joint_target_ke=jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)]),
        joint_target_kd=jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)]),
    )

    rng = np.random.RandomState(7)
    E, S = 8, 2
    # random body states: positions near the ground (some penetrating),
    # random orientations, random velocities
    pos = rng.uniform([-0.3, -0.02, -0.3], [0.3, 0.4, 0.3], (E, 13, 3))
    quat = quat_normalize(jnp.asarray(rng.randn(E, 13, 4), jnp.float32))
    body_q = jnp.concatenate([jnp.asarray(pos, jnp.float32), quat], -1)
    body_qd = jnp.asarray(rng.randn(E, 13, 6) * 1.5, jnp.float32)
    st = SimState(body_q, body_qd)

    tgt = jnp.asarray(rng.randn(S, E, model.n_qd) * 0.3, jnp.float32)
    act = jnp.asarray(rng.randn(S, E, model.n_qd) * 0.1, jnp.float32)
    res = jnp.zeros((E, model.n_links, 6))

    kern = build_soa_rollout(integ, params, 5e-4, S, e_tile=8, interpret=True)
    out = kern(st, tgt, act)

    s = st
    for i in range(S):
        s = integ.step_only(params, s, tgt[i], act[i], res, 5e-4)

    np.testing.assert_allclose(
        np.asarray(out.body_q), np.asarray(s.body_q), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.body_qd), np.asarray(s.body_qd), atol=5e-3
    )
