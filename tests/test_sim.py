"""Physics-core tests (SURVEY.md §4 test plan items a/b).

- URDF import counts for the three templates
- FK vs the URDF parser's own link_fk (laikago, exact)
- compound-joint FK <-> force-kernel decomposition round trip
- drop test: box falls, contacts ground, comes to rest (energy decay)
- PD convergence of actuated joints
- finite-difference gradcheck through a short rollout
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.sim.builder import ModelBuilder, JOINT_COMPOUND
from ppr_diffphys_tpu.sim.import_urdf import parse_urdf
from ppr_diffphys_tpu.sim.urdf import URDF
from ppr_diffphys_tpu.sim.kinematics import eval_fk
from ppr_diffphys_tpu.sim.integrator import (
    SemiImplicitIntegrator,
    SimState,
    default_sim_params,
    rollout,
)
from ppr_diffphys_tpu.ops import quat_mul, quat_inverse, quat_to_compound

LAIKAGO = "/root/reference/data/urdf_templates/laikago/laikago.urdf"
QUAD = "/root/reference/data/urdf_templates/quad.urdf"
HUMAN = "/root/reference/data/urdf_templates/human.urdf"


def build(path, **kw):
    b = ModelBuilder()
    parse_urdf(
        path, b, xform_p=(0, 0.417, 0), floating=True, density=1000,
        armature=0.01, stiffness=220.0, damping=2.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0, **kw
    )
    return b.finalize().make_ground_contacts()


@pytest.fixture(scope="module")
def laikago():
    return build(LAIKAGO)


def test_import_counts(laikago):
    assert laikago.n_links == 13
    assert laikago.n_dof == 12
    assert laikago.n_q == 19
    q = build(QUAD)
    assert (q.n_links, q.n_dof) == (26, 75)
    h = build(HUMAN)
    assert (h.n_links, h.n_dof) == (19, 54)
    assert (q.joint_type == JOINT_COMPOUND).sum() == 25


def test_fk_matches_urdf_link_fk(laikago):
    """Body origins from eval_fk == root_xform @ urdf link FK (laikago)."""
    urdf = URDF.load(LAIKAGO)
    angles = np.linspace(-0.5, 0.5, 12).astype(np.float32)

    joint_q = jnp.asarray(laikago.joint_q_init).at[7:].set(angles)
    body_q, _ = eval_fk(laikago, joint_q)
    body_q = np.array(body_q)

    # our importer adds bodies in joint document order
    movable = [j for j in urdf.joints if j.joint_type != "fixed"]
    cfg = {j.name: angles[i] for i, j in enumerate(movable)}
    poses = urdf.link_fk(cfg)

    root = np.eye(4)
    root[:3, 3] = [0, 0.417, 0]
    for i, name in enumerate(laikago.body_name):
        expect = root @ poses[name]
        np.testing.assert_allclose(body_q[i, :3], expect[:3, 3], atol=1e-5)


def test_fk_compound_force_roundtrip():
    """The force kernel's q_off^-1 q_p^-1 q_c q_off decomposition must
    recover the FK input angles exactly (consistency of conventions)."""
    model = build(HUMAN)
    rng = np.random.RandomState(1)
    angles = rng.uniform(-0.7, 0.7, model.n_dof).astype(np.float32)
    joint_q = jnp.asarray(model.joint_q_init).at[7:].set(angles)
    body_q, _ = eval_fk(model, joint_q)

    for i in range(model.n_links):
        if model.joint_type[i] != JOINT_COMPOUND:
            continue
        p = model.joint_parent[i]
        from ppr_diffphys_tpu.ops import transform_mul

        X_wp = transform_mul(body_q[p], jnp.asarray(model.joint_X_p[i]))
        q_off = jnp.asarray(model.joint_X_c[i, 3:7])
        q_pc = quat_mul(
            quat_mul(quat_inverse(q_off), quat_mul(quat_inverse(X_wp[3:7]), body_q[i, 3:7])),
            q_off,
        )
        got = np.array(quat_to_compound(q_pc))
        qs = model.joint_q_start[i]
        np.testing.assert_allclose(got, angles[qs - 7 : qs - 7 + 3], atol=1e-4)


def test_fk_velocity_consistency(laikago):
    """FK velocities == finite difference of FK positions along a coord path."""
    rng = np.random.RandomState(0)
    q0 = np.array(laikago.joint_q_init)
    qd = rng.randn(laikago.n_qd).astype(np.float32) * 0.3
    eps = 1e-3

    # integrate generalized coords analytically for the root free joint
    def advance(q, qd, h):
        q = q.copy()
        q[0:3] += qd[3:6] * h  # linear (com~origin for this check: root com ~ 0? use small h)
        # quaternion: dq = 0.5 * quat(w,0) * q
        w = qd[0:3]
        dq = 0.5 * np.array(
            quat_mul(jnp.array([w[0], w[1], w[2], 0.0]), jnp.array(q[3:7]))
        )
        q[3:7] = q[3:7] + dq * h
        q[3:7] /= np.linalg.norm(q[3:7])
        q[7:] += qd[6:] * h
        return q

    body_q0, body_qd0 = eval_fk(laikago, jnp.array(q0), jnp.array(qd))
    body_q1, _ = eval_fk(laikago, jnp.array(advance(q0, qd, eps)), jnp.array(qd))

    com = laikago.body_com
    from ppr_diffphys_tpu.ops import transform_point

    p0 = np.array(transform_point(body_q0, jnp.asarray(com)))
    p1 = np.array(transform_point(body_q1, jnp.asarray(com)))
    v_fd = (p1 - p0) / eps
    v_fk = np.array(body_qd0[:, 3:6])
    # root linear velocity is defined at the COM; finite-difference advance
    # moves the origin, so compare child links only and allow the root slack
    np.testing.assert_allclose(v_fk[1:], v_fd[1:], atol=2e-2)


def _standing_pose(model):
    q = np.array(model.joint_q_init, np.float32)
    rest = np.zeros(model.n_dof, np.float32)
    rest[[2, 5, 8, 11]] = -0.8
    q[7:] = rest
    return q, rest


def test_drop_and_settle(laikago):
    """Laikago dropped from its init pose settles onto the ground without
    blowing up; final kinetic energy ~ 0; no NaN anywhere."""
    model = laikago
    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)
    q, rest = _standing_pose(model)
    body_q, body_qd = eval_fk(model, jnp.array(q))
    state = SimState(body_q[None], body_qd[None])

    n_qd = model.n_qd
    target = jnp.concatenate([jnp.zeros(6), jnp.array(rest)])[None]
    # PD gains like the reference: 0 on root, kp/kd on joints
    ke = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(model.n_dof)])
    kd = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(model.n_dof)])
    params = params._replace(joint_target_ke=ke, joint_target_kd=kd)
    model.joint_attach_ke = 16000.0
    model.joint_attach_kd = 200.0

    act = jnp.zeros((1, n_qd))
    res = jnp.zeros((1, model.n_links, 6))

    S = 1000  # 0.5 s at dt=5e-4

    def step(s, _):
        s = integ.step_only(params, s, target, act, res, 5e-4)
        return s, None

    final, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=S))(state)
    bq = np.array(final.body_q[0])
    bqd = np.array(final.body_qd[0])
    assert np.isfinite(bq).all() and np.isfinite(bqd).all()
    # body stays above ground (allowing penalty penetration ~cm)
    assert bq[:, 1].min() > -0.05
    # roughly at standing height, not collapsed/launched
    assert 0.2 < bq[0, 1] < 0.8
    # settled: com speed small
    assert np.abs(bqd[:, 3:]).max() < 0.5


def test_pd_convergence(laikago):
    """With strong gains and no gravity, joint angles converge to target."""
    model = laikago
    model.gravity = np.array([0.0, 0.0, 0.0], np.float32)
    try:
        integ = SemiImplicitIntegrator(model)
        params = default_sim_params(model)
        ke = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(model.n_dof)])
        kd = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(model.n_dof)])
        params = params._replace(joint_target_ke=ke, joint_target_kd=kd)
        model.joint_attach_ke = 16000.0
        model.joint_attach_kd = 200.0

        q = np.array(model.joint_q_init, np.float32)
        q[1] = 5.0  # far from ground: no contact
        body_q, body_qd = eval_fk(model, jnp.array(q))
        state = SimState(body_q[None], body_qd[None])

        tgt_ang = 0.3 * np.ones(model.n_dof, np.float32)
        tgt_ang[[2, 5, 8, 11]] = -0.5
        # PD law drives ke*(q - target): reference targets are *negated*
        # angles? No: force = ke*(q-target) pushes q toward target with
        # torque applied along +axis to parent... the sign works out to
        # drive q -> target (verified here).
        target = jnp.concatenate([jnp.zeros(6), jnp.array(tgt_ang)])[None]
        act = jnp.zeros((1, model.n_qd))
        res = jnp.zeros((1, model.n_links, 6))

        def step(s, _):
            return integ.step_only(params, s, target, act, res, 5e-4), None

        final, _ = jax.jit(lambda s: jax.lax.scan(step, s, None, length=4000))(state)

        # recover joint angles from the final maximal state via the twist
        from ppr_diffphys_tpu.ops import transform_mul, quat_twist_angle

        bq = final.body_q[0]
        for i in range(1, model.n_links):
            p = model.joint_parent[i]
            X_wp = transform_mul(bq[p], jnp.asarray(model.joint_X_p[i]))
            r_err = quat_mul(quat_inverse(X_wp[3:7]), bq[i, 3:7])
            ang = float(quat_twist_angle(jnp.asarray(model.joint_axis[i]), r_err))
            assert abs(ang - tgt_ang[i - 1]) < 0.05, (i, ang, tgt_ang[i - 1])
    finally:
        model.gravity = np.array([0.0, -9.81, 0.0], np.float32)


def test_rollout_gradcheck():
    """Finite-difference check of d(loss)/d(q_init, mass) through a short
    rollout (replaces trust in wp.Tape; SURVEY.md §4(b)).

    Uses its own model instance (other tests mutate attach gains on the
    shared fixture) with moderate stiffness to keep fp32 FD noise low.
    """
    model = build(LAIKAGO)
    model.joint_attach_ke = 1600.0
    model.joint_attach_kd = 20.0
    integ = SemiImplicitIntegrator(model)
    q, rest = _standing_pose(model)
    ke = jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(model.n_dof)])
    kd = jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(model.n_dof)])

    S, E = 34, 1
    target = jnp.tile(
        jnp.concatenate([jnp.zeros(6), jnp.array(rest)])[None, None], (S, E, 1)
    )
    act = jnp.zeros((S, E, model.n_qd))
    res = jnp.zeros((S, E, model.n_links, 6))

    def loss_fn(q_init, mass):
        params = default_sim_params(model)._replace(
            joint_target_ke=ke, joint_target_kd=kd,
            body_mass=mass, body_inv_mass=1.0 / mass,
            body_inertia=jnp.asarray(model.body_inertia),
            body_inv_inertia=jnp.linalg.inv(jnp.asarray(model.body_inertia)),
        )
        body_q, body_qd = eval_fk(model, q_init)
        st = SimState(body_q[None], body_qd[None])
        bq, bqd, _, _ = rollout(integ, params, st, target, act, res, 5e-4, 33)
        return jnp.sum(bq[-1, 0, :, :3] ** 2) + 0.1 * jnp.sum(bqd[-1] ** 2)

    # float64 so central differences resolve the true gradient: in fp32 the
    # FD truncation error of this stiff rollout is ~2-5%, in f64 the match
    # is ~1e-8 relative.
    jax.config.update("jax_enable_x64", True)
    try:
        q0 = jnp.array(q, jnp.float64)
        m0 = jnp.asarray(model.body_mass, jnp.float64)
        loss, (gq, gm) = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))(q0, m0)
        assert np.isfinite(float(loss))
        gq, gm = np.array(gq), np.array(gm)
        assert np.isfinite(gq).all() and np.isfinite(gm).all()

        f = jax.jit(loss_fn)
        eps = 1e-5
        for idx in [1, 4, 9, 12]:
            fd = (float(f(q0.at[idx].add(eps), m0)) - float(f(q0.at[idx].add(-eps), m0))) / (2 * eps)
            an = gq[idx]
            assert abs(fd - an) < 1e-4 * max(abs(fd), abs(an)) + 1e-6, (idx, fd, an)

        for idx in [0, 3, 7]:
            fd = (float(f(q0, m0.at[idx].add(eps))) - float(f(q0, m0.at[idx].add(-eps)))) / (2 * eps)
            an = gm[idx]
            assert abs(fd - an) < 1e-4 * max(abs(fd), abs(an)) + 1e-6, (idx, fd, an)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_quad_compound_drop_stability():
    """Ball-joint (COMPOUND) robot with the reference's mass surgery
    settles on the ground without divergence — exercises the compound
    force path + mass surgery end to end via phys_model's builder."""
    from ppr_diffphys_tpu.data.robot import URDFRobot
    from ppr_diffphys_tpu.sim.builder import ModelBuilder
    from ppr_diffphys_tpu.sim.import_urdf import parse_urdf

    robot = URDFRobot(QUAD)
    b = ModelBuilder()
    parse_urdf(
        QUAD, b, xform_p=(0, 0.6, 0), floating=True, density=1000,
        armature=0.01, stiffness=660.0, damping=5.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    # mass surgery (as phys_model does for kp_links robots)
    name_by_body = {n: i for i, n in enumerate(b.body_name)}
    first_shape = {}
    for s in b.shapes:
        first_shape.setdefault(s.body, s)
    for name, idx in name_by_body.items():
        if idx not in first_shape:
            continue
        if name in robot.urdf.kp_links:
            for s in b.shapes:
                if s.body == idx:
                    s.scale = s.scale * 2.0
            b.body_mass[idx] *= 8
            b.body_inertia[idx] = b.body_inertia[idx] * 32
        b.body_inertia[idx] = b.body_inertia[idx] / b.body_mass[idx]
        w = float(np.clip(1e3 * np.prod(first_shape[idx].scale), 1.0, 5.0))
        b.body_inertia[idx] = b.body_inertia[idx] * w
        b.body_mass[idx] = w
    model = b.finalize().make_ground_contacts("hull")
    model.joint_attach_ke, model.joint_attach_kd = 8000.0, 200.0

    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)._replace(
        joint_target_ke=jnp.concatenate([jnp.zeros(6), 660.0 * jnp.ones(model.n_dof)]),
        joint_target_kd=jnp.concatenate([jnp.zeros(6), 5.0 * jnp.ones(model.n_dof)]),
    )
    q = jnp.asarray(model.joint_q_init)
    body_q, body_qd = eval_fk(model, q)
    state = SimState(body_q[None], body_qd[None])
    tgt = jnp.zeros((1, model.n_qd))
    act = jnp.zeros((1, model.n_qd))
    res = jnp.zeros((1, model.n_links, 6))

    def step(s, _):
        return integ.step_only(params, s, tgt, act, res, 5e-4), None

    final, _ = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=4000)
    )(state)
    bq = np.asarray(final.body_q[0])
    bqd = np.asarray(final.body_qd[0])
    assert np.isfinite(bq).all() and np.isfinite(bqd).all()
    assert bq[:, 1].min() > -0.2  # on/above ground, not fallen through
    # bounded: not railing against the +-10 velocity clamp (divergence
    # signature); the zero-angle pose legitimately topples and rocks
    assert np.abs(bqd[:, 3:]).max() < 9.0


def test_per_env_system_id_sweep(laikago):
    """Per-env mass/PD-gain sweeps (BASELINE.json config 'batched multi-env
    system-ID sweep'): different envs simulate with different parameters in
    one batched rollout, and gradients resolve per env."""
    model = laikago
    model.joint_attach_ke, model.joint_attach_kd = 16000.0, 200.0
    integ = SemiImplicitIntegrator(model)
    q, rest = _standing_pose(model)
    E = 4
    body_q, body_qd = eval_fk(model, jnp.tile(jnp.array(q)[None], (E, 1)))
    st = SimState(body_q, body_qd)
    tgt = jnp.tile(jnp.concatenate([jnp.zeros(6), jnp.array(rest)])[None], (E, 1))
    act = jnp.zeros((E, model.n_qd))
    res = jnp.zeros((E, model.n_links, 6))

    mass_scale = jnp.array([0.5, 1.0, 2.0, 4.0])

    def final_heights(mass_scale):
        mass = jnp.asarray(model.body_mass)[None] * mass_scale[:, None]  # (E,B)
        inertia = jnp.asarray(model.body_inertia)[None] * mass_scale[:, None, None, None]
        ke = jnp.tile(
            jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(model.n_dof)])[None],
            (E, 1),
        )
        kd = jnp.tile(
            jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(model.n_dof)])[None],
            (E, 1),
        )
        params = SimParams(
            body_mass=mass, body_inv_mass=1.0 / mass,
            body_inertia=inertia, body_inv_inertia=jnp.linalg.inv(inertia),
            joint_target_ke=ke, joint_target_kd=kd,
        )

        def step(s, _):
            return integ.step_only(params, s, tgt, act, res, 5e-4), None

        out, _ = jax.lax.scan(step, st, None, length=200)
        return out.body_q[:, 0, 1]  # root heights (E,)

    from ppr_diffphys_tpu.sim.integrator import SimParams

    h = np.asarray(jax.jit(final_heights)(mass_scale))
    assert np.isfinite(h).all()
    # heavier robots compress the contact/attachment springs more
    assert not np.allclose(h, h[0])

    g = jax.jit(jax.jacrev(final_heights))(mass_scale)
    g = np.asarray(g)
    # per-env gradients: each env's height depends (almost) only on its own
    # mass scale — off-diagonal terms vanish
    offdiag = g - np.diag(np.diag(g))
    assert np.abs(np.diag(g)).max() > 0
    assert np.abs(offdiag).max() < 1e-8


def test_rollout_frame_semantics(laikago):
    """rollout() collects states at frame boundaries *before* the boundary
    substep and grf/jaf *from* the boundary substep — exactly the
    reference's collection points (dp_model.py:1231-1246)."""
    model = laikago
    model.joint_attach_ke, model.joint_attach_kd = 16000.0, 200.0
    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)._replace(
        joint_target_ke=jnp.concatenate([jnp.zeros(6), 220.0 * jnp.ones(12)]),
        joint_target_kd=jnp.concatenate([jnp.zeros(6), 2.0 * jnp.ones(12)]),
    )
    q, rest = _standing_pose(model)
    E, sub, F = 2, 5, 4
    S = sub * (F - 1) + 1
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(
        np.tile(np.concatenate([np.zeros(6), rest])[None, None], (S, E, 1))
        + rng.randn(S, E, model.n_qd).astype(np.float32) * 0.01
    )
    act = jnp.zeros((S, E, model.n_qd))
    res = jnp.zeros((S, E, model.n_links, 6))
    body_q, body_qd = eval_fk(model, jnp.tile(jnp.array(q)[None], (E, 1)))
    st0 = SimState(body_q, body_qd)

    bq, bqd, grf, jaf = rollout(integ, params, st0, tgt, act, res, 5e-4, sub)
    assert bq.shape == (F, E, model.n_links, 7)

    # manual step-by-step replication
    s = st0
    exp_q, exp_grf = [], []
    for i in range(S):
        if i % sub == 0:
            exp_q.append(s.body_q)
            _, g, _ = integ.simulate(params, s, tgt[i], act[i], res[i], 5e-4)
            exp_grf.append(g)
        s = integ.step_only(params, s, tgt[i], act[i], res[i], 5e-4)

    np.testing.assert_allclose(np.asarray(bq), np.asarray(jnp.stack(exp_q)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grf), np.asarray(jnp.stack(exp_grf)), atol=5e-3)


def test_quad_compound_gradcheck():
    """float64 finite-difference gradcheck through a short compound-joint
    rollout (the intrinsic-XYZ decompose + 3-axis PD path)."""
    model = build(QUAD)
    model.joint_attach_ke, model.joint_attach_kd = 800.0, 20.0
    integ = SemiImplicitIntegrator(model)
    ke = jnp.concatenate([jnp.zeros(6), 660.0 * jnp.ones(model.n_dof)])
    kd = jnp.concatenate([jnp.zeros(6), 5.0 * jnp.ones(model.n_dof)])
    S, E = 12, 1
    tgt = jnp.zeros((S, E, model.n_qd))
    act = jnp.zeros((S, E, model.n_qd))
    res = jnp.zeros((S, E, model.n_links, 6))

    def loss_fn(q_init):
        params = default_sim_params(model)._replace(
            joint_target_ke=ke, joint_target_kd=kd)
        bq0, bqd0 = eval_fk(model, q_init)
        o = rollout(integ, params, SimState(bq0[None], bqd0[None]),
                    tgt, act, res, 5e-4, 11)
        return jnp.sum(o[0][-1, 0, :, :3] ** 2)

    jax.config.update("jax_enable_x64", True)
    try:
        q0 = jnp.asarray(model.joint_q_init, jnp.float64)
        q0 = q0.at[7:].add(0.05)  # nonzero ball-joint angles
        g = np.asarray(jax.jit(jax.grad(loss_fn))(q0))
        assert np.isfinite(g).all()
        f = jax.jit(loss_fn)
        eps = 1e-5
        for idx in [1, 4, 9, 30]:
            fd = (float(f(q0.at[idx].add(eps))) - float(f(q0.at[idx].add(-eps)))) / (2 * eps)
            assert abs(fd - g[idx]) < 1e-4 * max(abs(fd), abs(g[idx])) + 1e-6, (idx, fd, g[idx])
    finally:
        jax.config.update("jax_enable_x64", False)
