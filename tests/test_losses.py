"""reduce_loss divergence clipping + adjoint scrub variants, validated
against a direct numpy emulation of the reference's loops
(dp_utils.py:93-110, dp_model.py:1103-1127)."""

import numpy as np
import jax
import jax.numpy as jnp

from ppr_diffphys_tpu.models.losses import reduce_loss
from ppr_diffphys_tpu.models.phys_model import scrub_grad, scrub_grad_ref


def _reference_reduce_loss(loss_seq, clip, sticky_th):
    """Numpy port of the reference's reduce_loss (dp_utils.py:93-110).
    sticky_th=True reproduces the accidental env-0 threshold (th is only
    recomputed while it is 0)."""
    loss_seq = loss_seq.copy()
    th = 0.0
    for i in range(len(loss_seq)):
        if clip:
            if th == 0 or not sticky_th:
                sub = loss_seq[i]
                pos = sub[sub > 0]
                th = np.median(pos) * 10 if len(pos) else 0.0
            exceed = loss_seq[i] > th
            if exceed.any():
                loss_seq[i, np.argmax(exceed):] = 0
    if loss_seq.sum() > 0:
        return loss_seq[loss_seq > 0].mean()
    return loss_seq.mean()


def test_reduce_loss_matches_reference_both_modes():
    rng = np.random.RandomState(0)
    for trial in range(5):
        x = np.abs(rng.randn(4, 9).astype(np.float32)) * 0.1
        # env 2 diverges hard; env 0 stays calm -> the sticky env-0
        # threshold clips env 2 earlier than its own median would
        x[2, 5:] = 10.0 + np.arange(4)
        ours_perenv = float(reduce_loss(jnp.asarray(x), clip=True))
        ours_env0 = float(reduce_loss(jnp.asarray(x), clip=True, env0_th=True))
        ref_perenv = _reference_reduce_loss(x, True, sticky_th=False)
        ref_env0 = _reference_reduce_loss(x, True, sticky_th=True)
        np.testing.assert_allclose(ours_perenv, ref_perenv, rtol=1e-5)
        np.testing.assert_allclose(ours_env0, ref_env0, rtol=1e-5)


def test_scrub_grad_variants():
    x = jnp.asarray([1.0, 2.0, 3.0])

    def loss(fn, scale):
        return lambda v: jnp.sum(fn(v) * scale)

    big = jnp.asarray([5.0, -5.0, jnp.nan])
    g_sym = jax.grad(loss(scrub_grad, big))(x)
    g_ref = jax.grad(loss(scrub_grad_ref, big))(x)
    # symmetric clamp: +-1; reference: upper-only (keeps -5), nan->0
    np.testing.assert_allclose(np.asarray(g_sym), [1.0, -1.0, 0.0])
    np.testing.assert_allclose(np.asarray(g_ref), [1.0, -5.0, 0.0])
