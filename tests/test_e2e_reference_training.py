"""End-to-end training-trajectory parity against the reference's own
kernel source (VERDICT round 2, Missing #3 / task 5).

A miniature mi-pace imitation run (2 envs x 3 frames, --ref_quirks) is
trained with the production ``phys_model`` path; at EVERY visited
parameter point the same window is also rolled out through the
reference's `SemiImplicitIntegrator` kernel source — executed from the
read-only mount under the f64 NumPy shim (tests/warp_shim.py) — and both
trajectories are pushed through the same loss pipeline. The per-iteration
loss sequences must agree to fp32 rollout drift.

Combined with the update-for-update optimizer parity
(test_optimizer_parity.py) and the finite-difference check below (JAX
gradients vs central differences OF THE REFERENCE-SOURCE loss), this
closes the end-to-end leg of "losses match the Warp reference": same
losses at the visited points, same derivative of the reference's own
loss, same parameter updates given gradients.

Scope note (same as test_warp_parity.py:18-23): reduced->maximal FK and
contact generation are the two surfaces living in the warp *package*
(not the reference repo); both sides here share our eval_fk / contact
sets, which are pinned independently by test_model_build_fixtures.py and
tests/test_sim.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppr_diffphys_tpu.models.phys_model import phys_model
from ppr_diffphys_tpu.models.losses import reduce_loss, se3_loss
from ppr_diffphys_tpu.data.amp_loader import DataLoader
from ppr_diffphys_tpu.ops import swap_lin_ang
from ppr_diffphys_tpu.sim.kinematics import eval_fk
from ppr_diffphys_tpu.utils.config import build_opts

import test_warp_parity as wparity  # REF kernels + ref_trajectory driver


@pytest.fixture(scope="module")
def model():
    opts = build_opts(
        seqname="mi-pace", logroot="/tmp/ppr_e2e_ref", noise_std=0.0,
        num_rounds=1, iters_per_round=4, ref_quirks=True,
        phys_engine="xla",
        # decimated hull keeps the serial f64 shim rollout tractable;
        # both sides use the same contact set so parity is unaffected
        contact_mode="hull:0.05",
    )
    m = phys_model(opts, DataLoader(opts))
    m.reinit_envs(2, frames_per_wdw=3, is_eval=False)
    return m


def _window_inputs(m, frame_start):
    """Reproduce the forward's window inputs (noise off) on the host:
    initial maximal state, per-substep control reference, and the frame
    target states — via the same public helpers the forward uses."""
    steps_fr = np.asarray(frame_start)[:, None] + np.asarray(m.steps_idx_fr)[None]
    batch = m.get_batch_input(m.params, jnp.asarray(steps_fr, jnp.float32))
    q_init = jnp.concatenate(
        [batch["queried_q"][:, 0], batch["queried_ja"][:, 0]], -1
    )
    qd_init = swap_lin_ang(batch["queried_qd"][:, 0])
    body_q0, body_qd0 = eval_fk(m.env, q_init, qd_init)
    E, S = steps_fr.shape
    ref_ja = np.concatenate(
        [np.zeros((E, S, 6), np.float64), np.asarray(batch["queried_ja"], np.float64)], -1
    )
    f2s = m.frame2step
    target_position, _ = m.fk_pos_vel(
        batch["target_q"][:, f2s], batch["target_ja"][:, f2s],
        batch["target_qd"][:, f2s], batch["target_jad"][:, f2s],
    )
    return (
        np.asarray(body_q0, np.float64), np.asarray(body_qd0, np.float64),
        ref_ja, np.asarray(target_position, np.float64),
    )


def _shim_loss(m, params_override, frame_start):
    """traj loss of the reference-source rollout (f64 shim) through the
    model's own loss pipeline (se3 + clipped reduce, ref quirk on)."""
    sp = m._sim_params(params_override)
    body_q0, body_qd0, ref_ja, target_position = _window_inputs(m, frame_start)
    sub = m.steps_per_fr_interval
    F = m.frames_per_wdw
    steps = sub * (F - 1)
    E = body_q0.shape[0]

    frames = []
    for e in range(E):
        targets = ref_ja[e, :steps]
        acts = np.zeros_like(targets)
        traj = wparity.ref_trajectory(
            m.env, sp, body_q0[e], body_qd0[e], targets, acts, m.dt, steps
        )
        frames.append(traj[::sub])  # (F, B, 7) frame-boundary states
    sim_position = np.stack(frames, 0)  # (E, F, B, 7)

    loss_seq = se3_loss(
        jnp.asarray(sim_position, jnp.float32),
        jnp.asarray(target_position, jnp.float32),
    ).mean(-1)
    return float(reduce_loss(loss_seq, clip=True, env0_th=True))


@pytest.mark.slow
def test_training_loss_sequence_matches_reference_source(model):
    """4 production training iterations; at each visited parameter point
    the reference-source rollout must produce the same traj loss."""
    m = model
    frame_start = np.array([0.0, 3.0])
    jax_losses, shim_losses = [], []
    for it in range(4):
        m.set_progress(it)
        shim_losses.append(_shim_loss(m, m.params, frame_start))
        m.rng = jax.random.PRNGKey(100 + it)  # noise is off; key is inert
        out = m.forward(frame_start=frame_start)
        jax_losses.append(float(out["loss_traj"]))
        m.update()

    jax_losses = np.asarray(jax_losses)
    shim_losses = np.asarray(shim_losses)
    # fp32 rollout drift through 66 stiff substeps: relative envelope
    np.testing.assert_allclose(jax_losses, shim_losses, rtol=2e-3, atol=1e-6)
    # and training actually moved: parameters changed the loss
    assert jax_losses[-1] != jax_losses[0]


@pytest.mark.slow
def test_gradient_matches_reference_source_fd(model):
    """Central finite differences of the REFERENCE-SOURCE loss (f64 shim)
    vs the production JAX gradient, along body_mass and target_ke
    directions — the end-to-end derivative check per-kernel adjoint tests
    cannot give."""
    m = model
    frame_start = np.array([0.0, 3.0])

    # JAX gradient of the traj loss alone (weights pick it out)
    def loss_fn(params):
        w = jnp.zeros((7,), jnp.float32).at[0].set(1.0)  # traj only
        out, _ = m._forward_pure(
            params, jnp.asarray(frame_start, jnp.float32),
            jax.random.PRNGKey(0), jnp.float32(0.0), w, True,
        )
        return out["loss_traj"]

    grads = jax.jit(jax.grad(loss_fn))(m.params)

    rng = np.random.RandomState(3)
    for name in ("body_mass", "target_ke"):
        g = np.asarray(grads[name], np.float64)
        d = rng.randn(*g.shape)
        d /= np.linalg.norm(d)
        eps = 1e-3 * max(1.0, float(np.abs(np.asarray(m.params[name])).max()))
        p_plus = dict(m.params)
        p_plus[name] = m.params[name] + jnp.asarray(eps * d, jnp.float32)
        p_minus = dict(m.params)
        p_minus[name] = m.params[name] - jnp.asarray(eps * d, jnp.float32)
        fd = (
            _shim_loss(m, p_plus, frame_start)
            - _shim_loss(m, p_minus, frame_start)
        ) / (2 * eps)
        an = float(np.dot(g.ravel(), d.ravel()))
        assert abs(fd - an) < 2e-2 * max(abs(fd), abs(an)) + 1e-7, (
            name, fd, an,
        )
