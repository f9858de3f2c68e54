"""Hull-contact equivalence envelope (VERDICT.md Weak #4 / task #7).

'hull' contact candidates drop interior mesh vertices. The equivalence with
the reference-exact 'all' set holds while no interior vertex crosses the
ground plane (an interior vertex is a convex combination of hull vertices,
so it is never the lowest point — but once it does cross, it would have
contributed force in 'all' mode). These tests:

- pin the envelope: hull == all trajectories through a real contact-rich
  drop in the operating regime;
- show the test has teeth: at adversarial penetration depths the interior
  validator fires BEFORE the trajectories can diverge;
- exercise the automatic fallback to 'all' in phys_model eval.
"""

import numpy as np
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


def build(contact_mode):
    b = ModelBuilder()
    parse_urdf(
        LAIKAGO, b, xform_p=(0, 0.45, 0), floating=True, density=1000,
        armature=0.01, stiffness=220.0, damping=2.0, shape_ke=1e4,
        shape_kd=0, shape_kf=1e2, shape_mu=1, limit_ke=0, limit_kd=0,
    )
    m = b.finalize().make_ground_contacts(contact_mode)
    m.joint_attach_ke, m.joint_attach_kd = 16000.0, 200.0
    return m


def drop_rollout(model, steps=400, drop=0.0):
    """Drop the robot from slightly above ground and let it settle."""
    q = np.array(model.joint_q_init, np.float32)
    q[1] -= drop
    body_q, body_qd = eval_fk(model, jnp.asarray(q))
    state = SimState(body_q[None], body_qd[None])
    integ = SemiImplicitIntegrator(model)
    params = default_sim_params(model)
    tgt = jnp.zeros((1, model.n_qd))
    act = jnp.zeros((1, model.n_qd))
    rf = jnp.zeros((1, model.n_links, 6))
    traj = [np.asarray(state.body_q[0])]
    for _ in range(steps):
        state = integ.step_only(params, state, tgt, act, rf, 5e-4)
        traj.append(np.asarray(state.body_q[0]))
    return np.stack(traj)


def test_hull_equals_all_in_operating_regime():
    """A 400-substep drop-and-settle (feet penetrate a few mm under load):
    hull and all trajectories must agree to fp32 noise, and the interior
    validator must confirm the assumption held."""
    m_hull = build("hull")
    m_all = build("all")
    assert m_hull.contact_count < m_all.contact_count

    t_hull = drop_rollout(m_hull)
    t_all = drop_rollout(m_all)
    # same physics: positions to sub-0.1mm over the whole trajectory
    np.testing.assert_allclose(
        t_hull[..., :3], t_all[..., :3], atol=1e-4
    )
    assert m_hull.validate_hull_contacts(t_hull) == 0.0


def test_validator_fires_on_deep_penetration():
    """Adversarially sink the robot so interior vertices cross the plane:
    the validator must report a violation (this is the regime where hull
    and all forces genuinely differ)."""
    m_hull = build("hull")
    q = np.array(m_hull.joint_q_init, np.float32)
    q[1] -= 0.5  # bury the trunk
    body_q, _ = eval_fk(m_hull, jnp.asarray(q))
    viol = m_hull.validate_hull_contacts(np.asarray(body_q)[None])
    assert viol > 0.01, viol


def test_phys_model_auto_fallback():
    """phys_model eval switches to 'all' contacts when an eval rollout
    violates the hull assumption."""
    from ppr_diffphys_tpu.utils.config import build_opts
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.data.amp_loader import DataLoader

    opts = build_opts(
        seqname="mi-pace", num_rounds=1, iters_per_round=1,
        logroot="/tmp/ppr_hull_test", noise_std=0.0, ngpu=1,
    )
    m = phys_model(opts, DataLoader(opts))
    assert m.env.contact_mode == "hull"
    n_before = m.env.contact_count

    # feed a fabricated buried trajectory through the checker
    q = np.array(m.env.joint_q_init, np.float32)
    q[1] -= 0.5
    body_q, _ = eval_fk(m.env, jnp.asarray(q))
    m._check_hull_contacts(np.asarray(body_q)[None])

    assert m.env.contact_mode == "all"
    assert m.env.contact_count > n_before
    # integrator rebuilt against the new contact set
    assert m.integrator.scatter_contact.shape[1] == m.env.contact_count
