"""Loss functions and related utilities (mirrors diffphys/dp_utils.py).

All are jit-safe; the reference's in-place masking / data-dependent python
loops (reduce_loss clipping, dp_utils.py:93-110) are re-expressed as
vectorized masked math with identical semantics.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import quat_to_matrix, quat_normalize, axis_angle_to_quat, rot_angle


def se3_loss(pred: jnp.ndarray, gt: jnp.ndarray, rot_ratio: float = 0.1) -> jnp.ndarray:
    """Translation L2 + rot_ratio * geodesic rotation angle, NaN-masked
    (reference dp_utils.py:113-138). Accepts (...,7) quat-xyzw or (...,6)
    axis-angle rotations.
    """
    nanid = jnp.logical_or(
        jnp.isnan(jnp.sum(pred, -1)), jnp.isnan(jnp.sum(gt, -1))
    )
    pred = jnp.nan_to_num(pred)
    gt = jnp.nan_to_num(gt)

    trn_loss = jnp.sum((pred[..., :3] - gt[..., :3]) ** 2, -1)

    if pred.shape[-1] == 6:
        r_pred = quat_to_matrix(axis_angle_to_quat(pred[..., 3:]))
        r_gt = quat_to_matrix(axis_angle_to_quat(gt[..., 3:]))
    else:
        r_pred = quat_to_matrix(quat_normalize(pred[..., 3:]))
        r_gt = quat_to_matrix(quat_normalize(gt[..., 3:]))
    rot_loss = rot_angle(r_pred @ jnp.swapaxes(r_gt, -1, -2))

    loss = trn_loss + rot_loss * rot_ratio
    return jnp.where(nanid, 0.0, loss)


def reduce_loss(
    loss_seq: jnp.ndarray, clip: bool = False, env0_th: bool = False
) -> jnp.ndarray:
    """Masked mean over positive entries, with optional per-env divergence
    clipping: once a frame's loss exceeds 10x the env's median positive
    loss, that env's loss is zeroed from that frame on
    (reference dp_utils.py:93-110, used with clip=True for the traj loss
    only, dp_model.py:779).

    env0_th reproduces the reference's accidental sticky threshold
    (dp_utils.py:99-101: ``th`` is only recomputed while 0, so the first
    env with a nonzero positive-median gates every subsequent env; envs
    before it are all-zero and unaffected either way) — a documented
    training-dynamics quirk, enabled by opts['ref_quirks'].

    loss_seq: (E, T)
    """
    if clip:
        pos = loss_seq > 0
        med = jnp.nanmedian(jnp.where(pos, loss_seq, jnp.nan), axis=1)
        med = jnp.nan_to_num(med)
        th = med * 10.0
        if env0_th:
            # argmax of the boolean picks the first nonzero-median env
            # (0 if none exists, where th[0] is itself 0)
            th = jnp.broadcast_to(th[jnp.argmax(th > 0)], th.shape)
        exceed = loss_seq > th[:, None]
        any_exceed = jnp.any(exceed, axis=1, keepdims=True)
        first = jnp.argmax(exceed, axis=1)[:, None]
        idx = jnp.arange(loss_seq.shape[1])[None, :]
        keep = jnp.logical_or(~any_exceed, idx < first)
        loss_seq = jnp.where(keep, loss_seq, 0.0)

    pos = (loss_seq > 0).astype(loss_seq.dtype)
    n_pos = jnp.sum(pos)
    mean_pos = jnp.sum(loss_seq * pos) / jnp.maximum(n_pos, 1.0)
    return jnp.where(n_pos > 0, mean_pos, jnp.mean(loss_seq))


def compute_com(body_q: jnp.ndarray, part_com: jnp.ndarray, part_mass: jnp.ndarray):
    """Whole-robot center of mass from maximal body states
    (reference dp_utils.py:86-90).
    body_q (..., B, 7), part_com (B, 3), part_mass (B,) -> (..., 3)
    """
    from ..ops import transform_point

    coms = transform_point(body_q, part_com)
    w = part_mass / jnp.sum(part_mass)
    return jnp.sum(coms * w[..., None], axis=-2)
