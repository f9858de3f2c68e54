"""Time-conditioned MLPs (flax) — re-design of the reference's torch MLP
stack (diffphys/torch_utils.py + diffphys/lab4d_utils.py):

- ``posenc``: Fourier embedding with the optional cosine annealing window
  (PosEmbedding, lab4d_utils.py:11-134);
- ``TimeMLPFlax``: TimeEmbedding (fourier -> linear, concat per-video
  instance code -> linear) + BaseMLP trunk with skip connections + scaled
  output head (TimeMLP/TimeMLPWrapper, lab4d_utils.py:330-521,
  torch_utils.py:116-180);
- ``CameraMLPFlax``: SE(3)-valued head with per-video base quaternions
  (CameraMLPWrapper, torch_utils.py:183-304);
- ``FrameSampler``: maps raw (possibly fractional) frame ids to normalized
  time + video id on device — replaces the host-side frame bookkeeping of
  TimeEmbedding (lab4d_utils.py:146-229).

MLPs run in fp32 by default; they are tiny relative to the rollout. The
trunk matmuls are MXU-shaped (batch x 256 x 256).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def posenc(x: jnp.ndarray, n_freqs: int, alpha: Optional[float] = None) -> jnp.ndarray:
    """(..., C) -> (..., C*(1+2*n_freqs)): [x, sin(2^k x), cos(2^k x), ...].

    Matches PosEmbedding with logscale bands and the annealing window
    w_j = 0.5(1+cos(pi + pi clip(alpha*N - j))) (lab4d_utils.py:43-47,
    :112-125). alpha=None (or <0) disables annealing.
    """
    if n_freqs == -1:
        return x[..., :0]
    if n_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)
    sig = x[..., None, :] * freqs[:, None]  # (..., n_freqs, C)
    sin, cos = jnp.sin(sig), jnp.cos(sig)
    bands = jnp.stack([sin, cos], axis=-2)  # (..., n_freqs, 2, C)
    if alpha is not None:
        aw = alpha * n_freqs - jnp.arange(n_freqs, dtype=x.dtype)
        window = 0.5 * (1 + jnp.cos(jnp.pi * jnp.clip(aw, 0.0, 1.0) + jnp.pi))
        bands = bands * window[:, None, None]
    out_bands = bands.reshape(bands.shape[:-3] + (-1,))
    return jnp.concatenate([x, out_bands], axis=-1)


@dataclass(frozen=True)
class FrameSampler:
    """Static frame bookkeeping; all methods are jit-safe device math.

    frame_offset_raw: (V+1,) cumulative raw frame counts per video.
    """

    frame_offset_raw: tuple  # hashable
    time_scale: float = 1.0

    @property
    def offsets(self):
        return np.asarray(self.frame_offset_raw)

    @property
    def num_vids(self):
        return len(self.frame_offset_raw) - 1

    @property
    def num_frames(self):
        return int(self.frame_offset_raw[-1])

    @property
    def max_ts(self):
        off = self.offsets
        return int((off[1:] - off[:-1]).max())

    def frame_to_vid(self, frame_id: jnp.ndarray) -> jnp.ndarray:
        """Video id of (possibly fractional) raw frame ids
        (reference geom_utils.py:48-67 fid_reindex / frameid_to_vid)."""
        off = jnp.asarray(self.offsets, jnp.float32)
        vid = jnp.searchsorted(off, frame_id.astype(jnp.float32), side="right") - 1
        return jnp.clip(vid, 0, self.num_vids - 1)

    def frame_to_tid(self, frame_id: jnp.ndarray) -> jnp.ndarray:
        """Normalized in-video time in [-1, 1] * time_scale
        (TimeEmbedding.frame_to_tid, lab4d_utils.py:183-196)."""
        off = jnp.asarray(self.offsets, jnp.float32)
        vid = self.frame_to_vid(frame_id)
        vstart = off[vid]
        vlen = off[vid + 1] - off[vid]
        tid = (frame_id.astype(jnp.float32) - vstart - vlen / 2) / self.max_ts * 2
        return tid * self.time_scale


def resolve_num_freq_t(num_freq_t: int, max_ts: int) -> int:
    """Frequency count scaled to sequence length (TimeMLP,
    lab4d_utils.py:425-432): num_frames=64 -> freq 6."""
    if num_freq_t <= 0:
        return num_freq_t
    return int(np.rint(np.log2(max_ts / 64.0) + num_freq_t))


class BaseMLPFlax(nn.Module):
    """D linear+ReLU layers with skip concats + final linear
    (BaseMLP, lab4d_utils.py:330-391)."""

    D: int = 5
    W: int = 256
    out_channels: int = 3
    skips: Sequence[int] = ()
    final_act: bool = False

    @nn.compact
    def __call__(self, x):
        out = x
        for i in range(self.D):
            if i in self.skips:
                out = jnp.concatenate([x, out], axis=-1)
            out = nn.relu(nn.Dense(self.W, name=f"linear_{i + 1}")(out))
        out = nn.Dense(self.out_channels, name="linear_final")(out)
        if self.final_act:
            out = nn.relu(out)
        return out


class TimeEmbeddingFlax(nn.Module):
    """fourier(t) -> mapping1; concat instance code -> mapping2
    (TimeEmbedding, lab4d_utils.py:137-229)."""

    num_freq_t: int
    num_inst: int
    out_channels: int = 256

    @nn.compact
    def __call__(self, t_sample: jnp.ndarray, inst_id: jnp.ndarray):
        # t_sample (N,), inst_id (N,) int
        coeff = posenc(t_sample[..., None], self.num_freq_t)
        coeff = nn.Dense(self.out_channels, name="mapping1")(coeff)
        inst_code = nn.Embed(
            max(self.num_inst, 1), self.out_channels, name="inst_embedding"
        )(jnp.zeros_like(inst_id) if self.num_inst == 1 else inst_id)
        t_embed = jnp.concatenate([coeff, inst_code], axis=-1)
        return nn.Dense(self.out_channels, name="mapping2")(t_embed)


class TimeMLPFlax(nn.Module):
    """Full time-MLP: embedding -> trunk (final_act) -> scaled head.

    Mirrors TimeMLPWrapper (torch_utils.py:116-180): trunk D=5, W=256,
    skips=[1,2,3,4] by default; head Linear(W, out) * output_scale.
    """

    num_freq_t: int  # already resolved vs max_ts
    num_inst: int
    out_channels: int
    D: int = 5
    W: int = 256
    skips: Sequence[int] = (1, 2, 3, 4)
    output_scale: float = 1.0

    @nn.compact
    def __call__(self, t_sample, inst_id):
        t_embed = TimeEmbeddingFlax(
            self.num_freq_t, self.num_inst, self.W, name="time_embedding"
        )(t_sample, inst_id)
        feat = BaseMLPFlax(
            D=self.D, W=self.W, out_channels=self.W, skips=tuple(self.skips),
            final_act=True, name="trunk",
        )(t_embed)
        out = nn.Dense(self.out_channels, name="head")(feat)
        return out * self.output_scale


class CameraMLPFlax(nn.Module):
    """SE(3)-valued time MLP with per-video base rotations
    (CameraMLPWrapper, torch_utils.py:183-304). Returns (quat wxyz, trans).
    """

    num_freq_t: int
    num_inst: int
    D: int = 5
    W: int = 256
    skips: Sequence[int] = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, t_sample, inst_id):
        t_embed = TimeEmbeddingFlax(
            self.num_freq_t, self.num_inst, self.W, name="time_embedding"
        )(t_sample, inst_id)
        feat = BaseMLPFlax(
            D=self.D, W=self.W, out_channels=self.W, skips=tuple(self.skips),
            final_act=True, name="trunk",
        )(t_embed)
        trans = nn.Dense(3, name="trans")(feat)
        quat = nn.Dense(4, name="quat")(feat)
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-8)

        base_quat = self.param(
            "base_quat",
            lambda key: jnp.tile(jnp.array([1.0, 0, 0, 0]), (self.num_inst, 1)),
        )
        bq = base_quat[inst_id]
        bq = bq / jnp.linalg.norm(bq, axis=-1, keepdims=True).clip(1e-8)
        # wxyz hamilton product quat * base_quat
        quat = _quat_mul_wxyz(quat, bq)
        return quat, trans


def fit_camera_mlp(
    module: CameraMLPFlax,
    params,
    sampler: "FrameSampler",
    rtmat,
    lr: float = 1e-3,
    termination_loss: float = 1e-4,
    max_iters: int = 5000,
):
    """Fit a CameraMLP to per-frame SE(3) priors (reference
    TimeMLP.mlp_init, lab4d_utils.py:469-489 + CameraMLPWrapper.base_init,
    torch_utils.py:250-256): initialize base_quat from the first frame of
    each video, then Adam until the MSE to the priors falls below the
    termination loss.

    rtmat: (N, 4, 4) SE(3) priors over all raw frames.
    Returns the fitted parameter pytree.
    """
    import optax

    rtmat = jnp.asarray(rtmat, jnp.float32)
    n = rtmat.shape[0]
    frame_ids = jnp.arange(n, dtype=jnp.float32)
    t = sampler.frame_to_tid(frame_ids)
    vid = sampler.frame_to_vid(frame_ids)

    # base_init: per-video base rotations from the first frame
    from ..ops import matrix_to_quat

    starts = np.asarray(sampler.offsets[:-1])
    base_q_xyzw = matrix_to_quat(rtmat[starts, :3, :3])
    base_quat = jnp.concatenate(
        [base_q_xyzw[..., 3:4], base_q_xyzw[..., 0:3]], -1
    )  # wxyz
    params = dict(params)
    params["base_quat"] = base_quat

    from ..ops import quat_to_matrix, quat_normalize

    def loss_fn(p):
        quat, trans = module.apply({"params": p}, t, vid)
        q_xyzw = jnp.concatenate([quat[..., 1:], quat[..., :1]], -1)
        rot = quat_to_matrix(quat_normalize(q_xyzw))
        pred = jnp.zeros((n, 4, 4)).at[:, :3, :3].set(rot)
        pred = pred.at[:, :3, 3].set(trans).at[:, 3, 3].set(1.0)
        return jnp.mean((pred - rtmat) ** 2)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    # 100 optimizer steps per device program (lax.scan), termination
    # checked at chunk boundaries — one host<->device sync per chunk
    # instead of one per step (the reference checks every 100 iters too,
    # torch_utils.py:279-289)
    CHUNK = 100

    @jax.jit
    def run_chunk(p, s):
        def body(carry, _):
            p, s = carry
            l, g = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(g, s)
            return (optax.apply_updates(p, updates), s), l

        (p, s), ls = jax.lax.scan(body, (p, s), None, length=CHUNK)
        return p, s, ls[-1]

    # ceil division: the budget is honored by rounding UP to CHUNK
    # multiples (max_iters=250 runs 300, never fewer than requested)
    for _ in range(max(1, -(-max_iters // CHUNK))):
        params, opt_state, loss = run_chunk(params, opt_state)
        if float(loss) < termination_loss:
            break
    return params


def _quat_mul_wxyz(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
