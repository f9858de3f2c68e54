"""a1 template end-to-end over the minimal fixture URDF
(tests/fixtures/a1/urdf/a1.urdf) — the reference mount ships no a1
assets, and the reference's own a1 branch crashes (it never sets
joint_attach_ke/kd, dp_model.py:76-84); this build defaults them
(phys_model.py a1 branch) so the template actually works."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.utils.config import build_opts

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def a1_model():
    from ppr_diffphys_tpu.models.phys_model import phys_model
    from ppr_diffphys_tpu.data.amp_loader import DataLoader

    opts = build_opts(
        seqname="mi-pace", urdf_template="a1", urdf_dir=FIXTURE_DIR,
        num_rounds=1, iters_per_round=2, logroot="/tmp/ppr_a1_test",
        noise_std=0.0,
    )
    dl = DataLoader(opts)
    return phys_model(opts, dl)


def test_a1_template_builds(a1_model):
    m = a1_model
    assert m.n_dof == 12
    assert m.n_links == 13
    assert m.in_bullet is True
    # the reference-crash quirk is papered over with laikago's gains
    assert (m.joint_attach_ke, m.joint_attach_kd) == (16000.0, 200.0)
    # a1 convention metadata (reference robot.py:23-32)
    np.testing.assert_allclose(
        m.robot.sim3[3:7], [0.5, -0.5, -0.5, -0.5]
    )
    assert list(np.nonzero(m.robot.rest_angles[0])[0]) == [2, 5, 8, 11]


def test_a1_fk_and_drop(a1_model):
    """FK at the grounded init pose + a short passive drop: the robot
    must neither fall through the floor nor blow up."""
    from ppr_diffphys_tpu.sim.integrator import SimState, rollout, default_sim_params

    m = a1_model
    steps = jnp.zeros((1, 1))
    batch = m.get_batch_input(m.params, steps)
    q = jnp.concatenate([batch["queried_q"][:, 0], batch["queried_ja"][:, 0]], -1)
    from ppr_diffphys_tpu.sim.kinematics import eval_fk

    bq, bqd = eval_fk(m.env, q)
    fh = float(m.get_foot_height(bq[:, None])[0, 0])
    assert abs(fh) < 0.02, fh  # init_global_q grounded the feet

    S = 2 * m.steps_per_fr_interval + 1
    tgt = jnp.tile(
        jnp.concatenate([jnp.zeros(6), jnp.asarray(m.robot.rest_angles[0])])[None, None],
        (S, 1, 1),
    )
    params = m._sim_params(m.params)
    out_q, out_qd, _, _ = rollout(
        m.integrator, params, SimState(bq, bqd * 0.0),
        tgt, jnp.zeros_like(tgt), jnp.zeros((S, 1, m.n_links, 6)),
        m.dt, m.steps_per_fr_interval,
    )
    assert np.isfinite(np.asarray(out_q)).all()
    ys = np.asarray(out_q)[..., 1]
    assert ys.min() > -0.05  # nothing fell through the ground
    assert ys.max() < 1.0  # nothing launched


def test_a1_training_step(a1_model):
    m = a1_model
    m.reinit_envs(2, frames_per_wdw=3, is_eval=False)
    out = m.forward(frame_start=np.zeros(2))
    m.update()
    assert np.isfinite(float(out["total_loss"]))
