"""Batched inference / serving rollouts (production path).

Rolls out a trained imitation policy (checkpointed phys_model parameters:
control-reference MLPs + identified gains/masses/global SE(3)) over many
environments at once, driving the VMEM-resident pallas megakernel
(sim/pallas_soa.py). This is the deployment-side counterpart of training:
no gradients, maximal throughput. Measured end-to-end (rollout() wall,
grid prologue + FK + megakernel + output staging): **17.6M env-steps/sec**
on one v5e chip for the laikago mi-pace workload at E=4096 (soa engine,
e_tile=256; the bare megakernel alone does ~23M — bench_grid.jsonl), vs
0.77M for the XLA-scan control (docs/results/round5/serve_bench.jsonl).

Usage:
    server = RolloutServer(opts, num_envs=4096)
    server.load_checkpoint(path)          # optional
    states = server.rollout(frame_start)  # (F, E, B, 7) frame states
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..data.amp_loader import DataLoader
from ..ops import swap_lin_ang
from ..sim.integrator import SimState
from ..sim.kinematics import eval_fk
from .phys_model import phys_model

# Largest env count the serving prologue (control-MLP evaluation over
# every substep) runs as one piece; beyond this it is lax.map'd in
# chunks to bound the hidden-layer intermediates (see _build). 1024 is
# the largest measured-passing size on v5e 16 GB HBM
# (docs/results/round4/serve_diag.jsonl). Override: PPR_SERVE_PROLOGUE_CHUNK.
_PROLOGUE_CHUNK = int(os.environ.get("PPR_SERVE_PROLOGUE_CHUNK", "1024"))


class RolloutServer:
    def __init__(self, opts, num_envs=1024, frames=None, engine="auto",
                 e_tile=0):
        self.opts = opts
        dataloader = DataLoader(opts)
        self.model = phys_model(opts, dataloader)
        self.num_envs = num_envs
        self.frames = frames or self.model.total_frames
        # 'auto' serving engine: the forward megakernel on TPU, the XLA
        # scan elsewhere. Unlike training-eval (resolve_engine keeps one
        # lone eval on XLA to dodge a ~9 min whole-window Mosaic compile),
        # a server builds its kernel ONCE and amortizes it over every
        # rollout — so TPU serving always takes the fast engine.
        if engine == "auto":
            engine = "soa" if jax.default_backend() == "tpu" else "xla"
        self.engine = engine
        # e_tile 0 = auto: the largest single-grid-step tile whose
        # forward-window VMEM estimate fits (training showed throughput
        # rises monotonically with tile size while it fits; the old fixed
        # 128 left measured gains on the table — VERDICT round-3 #3)
        if not e_tile:
            from ..sim.pallas_soa import flat_contact_pad, pick_window_e_tile

            m = self.model
            e_tile = pick_window_e_tile(
                m.steps_per_fr_interval, m.env.n_links, m.env.n_qd,
                contacts_flat=flat_contact_pad(m.env),
            )
        self.e_tile = e_tile
        if self.frames > self.model.total_frames:
            raise ValueError(
                f"frames={self.frames} exceeds the sequence's "
                f"total_frames={self.model.total_frames}; the serving "
                "window cannot be longer than the mocap sequence"
            )
        self.model.reinit_envs(num_envs, frames_per_wdw=self.frames, is_eval=True)
        self._fns = {}

    def load_checkpoint(self, path):
        # params are traced inputs of the jitted rollout (incl. the
        # identified gains/masses via traced_planes) — a checkpoint swap
        # is just new values for the same compiled program, no rebuild
        self.model.load_checkpoint(path)

    def _build(self, grid_prologue):
        m = self.model
        sub = m.steps_per_fr_interval
        F = self.frames
        E = self.num_envs

        if self.engine == "soa":
            # whole-window single-kernel rollout: one pallas program per
            # window, state in VMEM across all frames (no per-frame
            # kernel-call unroll)
            from ..sim.pallas_soa import build_soa_window, traced_planes

            kern = build_soa_window(
                m.integrator, m._sim_params(m.params), m.dt, sub, F,
                e_tile=min(self.e_tile, E),
                interpret=jax.default_backend() == "cpu",
            )
        else:
            kern = None

        def prologue(params, frame_start):
            # frame_start (Ec,) -> init maximal state + per-substep joint
            # targets for Ec envs (Ec = one prologue chunk, see below)
            steps_fr = frame_start[:, None] + jnp.asarray(
                m.steps_idx_fr, jnp.float32
            )[None]
            batch = m.get_batch_input(params, steps_fr)
            q_init = jnp.concatenate(
                [batch["queried_q"][:, 0], batch["queried_ja"][:, 0]], -1
            )
            qd_init = swap_lin_ang(batch["queried_qd"][:, 0])
            body_q, body_qd = eval_fk(m.env, q_init, qd_init)
            return body_q, body_qd, batch["queried_ja"]

        # The control MLPs (get_batch_input) are functions of TIME only —
        # the per-env prologue evaluates them at every (env, substep)
        # pair, E x S ~ 5M redundant rows at E=4096 (this, not the
        # megakernel, dominated the round-4 serve wall: 2.0 s vs the
        # kernel's ~0.2 s, and its hidden-layer intermediates exceeded
        # v5e HBM — serve_diag.jsonl). Serving default: evaluate the MLPs
        # ONCE on the global absolute-substep grid (K ~ 1.2k rows,
        # env-count independent) and gather each env's window by index.
        # Exact when every frame_start lands on the substep grid
        # (rollout() checks the concrete values); fractional starts fall
        # back to the per-env prologue, lax.map'd in <=1024-env chunks to
        # bound HBM.
        K = (m.total_frames - 1) * sub + 1
        S = sub * (F - 1) + 1

        def grid_fn(params, frame_start):
            g = jnp.arange(K, dtype=jnp.float32) / sub  # fractional frames
            batch = m.get_batch_input(params, g[None])
            grid_q = batch["queried_q"][0]  # (K, 7)
            grid_ja = batch["queried_ja"][0]  # (K, n_dof)
            grid_qd = batch["queried_qd"][0]  # (K, 6)
            # rollout() already validated every start lies in
            # [0, total_frames - frames], so this round is exact (no clip:
            # clipping would silently shift out-of-range windows, diverging
            # from the per-env prologue's linear extrapolation)
            k0 = jnp.round(frame_start * sub).astype(jnp.int32)
            q_init = jnp.concatenate([grid_q[k0], grid_ja[k0]], -1)
            qd_init = swap_lin_ang(grid_qd[k0])
            body_q, body_qd = eval_fk(m.env, q_init, qd_init)
            idx = k0[:, None] + jnp.arange(S)[None]  # (E, S)
            return body_q, body_qd, grid_ja[idx]

        chunk = E
        if E > _PROLOGUE_CHUNK:
            chunk = max(
                (c for c in range(1, _PROLOGUE_CHUNK + 1) if E % c == 0)
            )

        def fn(params, frame_start):
            if grid_prologue:
                body_q, body_qd, queried_ja = grid_fn(params, frame_start)
            elif chunk < E:
                bq, bqd, ja = jax.lax.map(
                    lambda f: prologue(params, f),
                    frame_start.reshape(E // chunk, chunk),
                )
                body_q = bq.reshape((E,) + bq.shape[2:])
                body_qd = bqd.reshape((E,) + bqd.shape[2:])
                queried_ja = ja.reshape((E,) + ja.shape[2:])
            else:
                body_q, body_qd, queried_ja = prologue(params, frame_start)
            state = SimState(body_q, body_qd)

            S = queried_ja.shape[1]
            ref = jnp.concatenate(
                [jnp.zeros((E, S, 6)), queried_ja], -1
            ).transpose(1, 0, 2)  # (S, E, n_qd)
            act = jnp.zeros_like(ref)

            if kern is not None:
                planes = traced_planes(m.env, m._sim_params(params))
                body_q, _, _, _ = kern(state, ref, act, planes)
                return body_q  # (F, E, B, 7)

            # XLA fallback: scan per frame interval
            res = jnp.zeros((E, m.n_links, 6))

            def step(s, x):
                t = x
                return m.integrator.step_only(
                    m._sim_params(params), s, t, t * 0, res, m.dt
                ), None

            frames_q = [state.body_q]
            for f in range(F - 1):
                s0 = f * sub
                state, _ = jax.lax.scan(step, state, ref[s0 : s0 + sub])
                frames_q.append(state.body_q)
            return jnp.stack(frames_q, 0)  # (F, E, B, 7)

        return jax.jit(fn)

    def rollout(self, frame_start=None):
        """frame_start: (E,) starting frames (defaults to 0s).
        Returns (F, E, B, 7) maximal-coordinate frame states."""
        if frame_start is None:
            frame_start = np.zeros((self.num_envs,), np.float32)
        # grid-ness + range checks run on the CALLER'S host array, before
        # any device transfer (jnp.asarray after would force a device->host
        # sync per call, and would break if a caller jit-wrapped rollout)
        k_host = np.asarray(frame_start, np.float64)
        if k_host.shape != (self.num_envs,):
            raise ValueError(
                f"frame_start shape {k_host.shape} != ({self.num_envs},)"
            )
        sub = self.model.steps_per_fr_interval
        k = k_host * sub
        # grid prologue needs every start on the substep grid AND inside
        # [0, total_frames - frames] (it indexes a precomputed global
        # table; out-of-range starts take the per-env prologue, which
        # linearly extrapolates via _interp_amp — reference interp1d
        # semantics, dp_model.py:421-427)
        in_range = bool(
            np.all(k_host >= 0)
            and np.all(k_host <= self.model.total_frames - self.frames)
        )
        grid = bool(np.all(k == np.round(k))) and in_range
        if grid not in self._fns:
            print(
                f"RolloutServer: building {'grid' if grid else 'per-env'} "
                f"prologue (engine={self.engine}, e_tile={self.e_tile})",
                file=sys.stderr,
            )
            self._fns[grid] = self._build(grid_prologue=grid)
        fs = jnp.asarray(k_host, jnp.float32)
        return self._fns[grid](self.model.params, fs)
