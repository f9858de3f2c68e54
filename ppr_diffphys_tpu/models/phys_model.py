"""phys_model — the differentiable-physics optimization model (TPU-native).

Re-design of the reference's ``phys_model(nn.Module)``
(diffphys/dp_model.py:56-1011) with the same capabilities and method
surface, but with the *entire* forward — mocap interpolation, time-MLP
queries, FK, the multi-hundred-substep rollout, and all losses — as one
jitted pure function. The reference's per-step host loop with ~2,280 kernel
launches and ~3,000 torch<->warp tensor conversions (dp_model.py:1145-1400)
becomes a single XLA program; environments are a vmapped/sharded batch
axis.

Optimizable parameters (reference §"what makes it differentiable-physics",
dp_model.py:210-315):
- ``global_q``     root SE(3) aligning mocap to the ground (init from foot
                   height, :243-267)
- ``target_ke/kd`` per-DoF PD gains (:210-215)
- ``body_mass``    per-link mass; inertia = normalized inertia x mass,
                   re-inverted each forward (:216-222, :723-730)
- five time-MLPs (:269-315): root_pose (6-DoF delta), joint_angle (delta
  -> control reference), vel (initial/queried velocities), torque and
  residual_f (outputs multiplied by 0, :529 :536 — kept for parity)

Numerical fault tolerance carried over (SURVEY.md §5): grad-norm guard with
2-round rollback, per-parameter median-queue outlier clipping, NaN adjoint
scrubbing at the rollout boundary, per-env divergence clipping, init-state
noise injection.
"""

from __future__ import annotations

import os
import pickle
from copy import deepcopy
import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.amp_loader import parse_amp, preprocess_sequence
from ..data.robot import URDFRobot
from ..ops import (
    compose_delta,
    rotate_frame,
    rotate_frame_vel,
    swap_lin_ang,
    quat_to_matrix,
)
from ..sim.builder import ModelBuilder
from ..sim.import_urdf import parse_urdf
from ..sim.integrator import (
    SemiImplicitIntegrator,
    SimParams,
    SimState,
    rollout,
)
from ..sim.kinematics import eval_fk
from ..utils.config import interp_wt, match_param_name
from .losses import reduce_loss, se3_loss, compute_com
from .mlp import FrameSampler, TimeMLPFlax, resolve_num_freq_t

LOSS_KEYS = (
    "traj", "pos_state", "vel_state", "pos_distill",
    "reg_torque", "reg_res_f", "reg_foot",
)


def _scrub_grad_fwd(x):
    return x, None


def _scrub_grad_bwd(_, g):
    # NaN adjoint scrubbing + clamp-to-1, mirroring the reference's
    # post-tape cleanup (dp_model.py:1103-1127 remove_nan + clamp)
    g = jnp.nan_to_num(g, nan=0.0, posinf=1.0, neginf=-1.0)
    return (jnp.clip(g, -1.0, 1.0),)


@jax.custom_vjp
def scrub_grad(x):
    return x


scrub_grad.defvjp(_scrub_grad_fwd, _scrub_grad_bwd)


def _scrub_grad_ref_bwd(_, g):
    # reference-exact variant: NaN -> 0 and UPPER-only clamp
    # (dp_model.py:1109-1110 / :1121-1123 do g[g.isnan()]=0; g[g>1]=1
    # with no lower bound) — opts['ref_quirks']
    g = jnp.nan_to_num(g, nan=0.0)
    return (jnp.minimum(g, 1.0),)


@jax.custom_vjp
def scrub_grad_ref(x):
    return x


scrub_grad_ref.defvjp(_scrub_grad_fwd, _scrub_grad_ref_bwd)


class phys_model:
    """Reference-compatible API (dp_model.py): __init__(opts, dataloader),
    reinit_envs, forward, backward, update, query, save/load_checkpoint,
    check_grad, clear_grad."""

    # True on subclasses whose batches carry a live joint_X_p override
    # (phys_interface / lab4d query_ja): the soa kernels are then built
    # with traced anchor planes (with_xp)
    has_live_xp = False

    def __init__(self, opts, dataloader, dt=5e-4, device=None):
        self.opts = opts
        logname = "%s-%s" % (opts["seqname"], opts["logname"])
        self.save_dir = os.path.join(opts["logroot"], logname)
        os.makedirs(self.save_dir, exist_ok=True)

        self.total_iters = (
            int(opts["num_rounds"] * opts["iters_per_round"] * opts["ratio_phys_cycle"])
            + opts["warmup_iters"]
            + 1
        )
        self.progress = 0.0
        self.dt = dt
        self.noise_std = opts["noise_std"]
        self.preset_data(dataloader)

        # ---- robot template table (reference dp_model.py:76-121) ----------
        urdf_dir = opts.get("urdf_dir", "/root/reference/data/urdf_templates")
        template = opts["urdf_template"]
        if template == "a1":
            urdf_path = os.path.join(urdf_dir, "a1/urdf/a1.urdf")
            in_bullet = True
            # quirk preserved: the reference a1 branch never sets
            # joint_attach_ke/kd and crashes later; we default them instead
            self.joint_attach_ke, self.joint_attach_kd = 16000.0, 200.0
            kp, kd, shape_ke, shape_kd = 220.0, 2.0, 1.0e4, 0.0
        elif template == "laikago":
            urdf_path = os.path.join(urdf_dir, "laikago/laikago.urdf")
            in_bullet = False
            self.joint_attach_ke, self.joint_attach_kd = 16000.0, 200.0
            kp, kd, shape_ke, shape_kd = 220.0, 2.0, 1.0e4, 0.0
        elif template == "quad":
            urdf_path = os.path.join(urdf_dir, "quad.urdf")
            in_bullet = False
            self.joint_attach_ke, self.joint_attach_kd = 8000.0, 200.0
            kp, kd, shape_ke, shape_kd = 660.0, 5.0, 1.0e4, 0.0
        elif template == "human":
            urdf_path = os.path.join(urdf_dir, "human.urdf")
            in_bullet = False
            self.joint_attach_ke, self.joint_attach_kd = 8000.0, 200.0
            kp, kd, shape_ke, shape_kd = 660.0, 5.0, 1.0e4, 0.0
        else:
            raise NotImplementedError(template)
        self.in_bullet = in_bullet
        self.robot = URDFRobot(urdf_path)

        # ---- build articulation (reference dp_model.py:126-146) ------------
        builder = ModelBuilder()
        parse_urdf(
            urdf_path, builder,
            xform_p=(0.0, 0.417, 0.0), floating=True,
            density=1000, armature=0.01, stiffness=220.0, damping=2.0,
            shape_ke=shape_ke, shape_kd=shape_kd, shape_kf=1.0e2, shape_mu=1,
            limit_ke=0, limit_kd=0,
        )

        # ---- mass surgery (reference dp_model.py:150-196) ------------------
        if hasattr(self.robot.urdf, "kp_links"):
            # ball-joint robots: feet get 2x geometry / 8x mass / 32x inertia;
            # inertia normalized by mass; link mass init = clamp(1e3*prod(scale),1,5)
            name_by_body = {n: i for i, n in enumerate(builder.body_name)}
            body_first_shape = {}
            for s in builder.shapes:
                body_first_shape.setdefault(s.body, s)
            for name, idx in name_by_body.items():
                if idx not in body_first_shape:
                    continue
                shp = body_first_shape[idx]
                if name in self.robot.urdf.kp_links:
                    for s in builder.shapes:
                        if s.body == idx:
                            s.scale = s.scale * 2.0
                    builder.body_mass[idx] *= 2 ** 3
                    builder.body_inertia[idx] = builder.body_inertia[idx] * 2 ** 5
                builder.body_inertia[idx] = (
                    builder.body_inertia[idx] / builder.body_mass[idx]
                )
                link_weight = 1e3 * np.prod(body_first_shape[idx].scale)
                link_weight = float(np.clip(link_weight, 1.0, 5.0))
                builder.body_mass[idx] = link_weight
        else:
            for idx in range(len(builder.body_mass)):
                builder.body_inertia[idx] = (
                    builder.body_inertia[idx] / builder.body_mass[idx]
                )

        self.n_dof = len(builder.joint_q) - 7
        self.n_links = builder.body_count

        # 'hull' contact reduction is exact for ground-plane contacts and
        # ~2.6x cheaper; 'all' restores the reference's every-vertex set
        self.env = builder.finalize().make_ground_contacts(
            opts.get("contact_mode", "hull")
        )
        self.env.joint_attach_ke = self.joint_attach_ke
        self.env.joint_attach_kd = self.joint_attach_kd
        self.integrator = SemiImplicitIntegrator(self.env)

        # normalized inertia buffer (inertia = norm_inertia * mass at sim
        # time, reference dp_model.py:219-222, :723-730)
        self.norm_body_inertia = jnp.asarray(self.env.body_inertia)

        # precomputed collision mesh for foot height / vis
        self._mesh_verts, self._mesh_faces, self._mesh_vbody = self.env.collision_mesh()

        # ---- parameters ----------------------------------------------------
        self.rng = jax.random.PRNGKey(opts.get("seed", 0))
        target_ke = np.concatenate([np.zeros(6), kp * np.ones(self.n_dof)])
        target_kd = np.concatenate([np.zeros(6), kd * np.ones(self.n_dof)])
        self.params = {
            "global_q": jnp.array([0.0, 0, 0, 0, 0, 0, 1.0]),
            "target_ke": jnp.asarray(target_ke, jnp.float32),
            "target_kd": jnp.asarray(target_kd, jnp.float32),
            "body_mass": jnp.asarray(self.env.body_mass),
        }
        self.add_nn_modules()

        # ---- device mesh (multi-chip by default) ----------------------------
        # The reference's --ngpu flag is vestigial (SURVEY.md §2 parallelism
        # table); here it budgets real devices: -1/0 = all visible chips.
        # Envs are dp-sharded over ICI; opts["mesh_shape"]={"dp":..,"tp":..}
        # additionally tensor-shards the MLP trunks.
        ngpu = int(opts.get("ngpu", -1))
        devs = jax.devices()
        if ngpu > 0:
            devs = devs[: min(ngpu, len(devs))]
        self._devices = devs
        ms = opts.get("mesh_shape") or {}
        if isinstance(ms, str):  # CLI form: "dp=4,tp=2"
            ms = {
                k.strip(): int(v)
                for k, v in (kv.split("=") for kv in ms.split(",") if kv)
            }
        self._tp = max(1, int(ms.get("tp", 1)))
        self._dp_cap = int(ms["dp"]) if "dp" in ms else None
        self._mesh_cache = {}

        self.init_global_q()
        self.add_optimizer(opts)

        # 2-deep rollback caches (reference dp_model.py:232-235)
        self.model_cache = [None, None]
        self.optimizer_cache = [None, None]
        self.grad_queue = {}
        self._grad_accum = []
        self._loss_accum = []
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------
    def preset_data(self, dataloader):
        self.frame_offset_raw = dataloader.data_info["offset"]
        self.frame_interval = dataloader.frame_interval
        self.frame_info = None
        self.total_frames = len(dataloader.amp_info)
        self.steps_per_fr_interval = int(self.frame_interval / self.dt)
        self._dataloader = dataloader

    def _finish_data(self):
        """Device-resident mocap table (after in_bullet is known)."""
        self.amp_table = jnp.asarray(
            preprocess_sequence(self._dataloader, self.in_bullet)
        )

    # ------------------------------------------------------------------
    # networks
    # ------------------------------------------------------------------
    def add_nn_modules(self):
        """Five time-MLPs (reference dp_model.py:269-315)."""
        offsets = tuple(int(x) for x in self.frame_offset_raw)
        max_ts = int(np.max(np.diff(np.asarray(offsets))))
        nf = resolve_num_freq_t(6, max_ts)
        n_vids = len(offsets) - 1

        self.samplers = {
            "root_pose_mlp": FrameSampler(offsets, time_scale=0.1),
            "joint_angle_mlp": FrameSampler(offsets),
            "vel_mlp": FrameSampler(offsets),
            "torque_mlp": FrameSampler(offsets),
            "residual_f_mlp": FrameSampler(offsets),
        }
        self.modules = {
            "root_pose_mlp": TimeMLPFlax(
                num_freq_t=nf, num_inst=n_vids, out_channels=6,
                D=8, skips=(4,), output_scale=0.5,
            ),
            "joint_angle_mlp": TimeMLPFlax(
                num_freq_t=nf, num_inst=n_vids, out_channels=self.n_dof
            ),
            "vel_mlp": TimeMLPFlax(
                num_freq_t=nf, num_inst=n_vids, out_channels=6 + self.n_dof,
                output_scale=5.0,
            ),
            "torque_mlp": TimeMLPFlax(
                num_freq_t=nf, num_inst=n_vids, out_channels=self.n_dof
            ),
            "residual_f_mlp": TimeMLPFlax(
                num_freq_t=nf, num_inst=n_vids, out_channels=6 * self.n_links
            ),
        }
        for name, mod in self.modules.items():
            self.rng, key = jax.random.split(self.rng)
            variables = mod.init(key, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))
            self.params[name] = variables["params"]

    def _mlp(self, params, name, steps_fr):
        """Evaluate a time-MLP at raw (fractional) frame ids (N,)."""
        sampler = self.samplers[name]
        t = sampler.frame_to_tid(steps_fr)
        vid = sampler.frame_to_vid(steps_fr)
        return self.modules[name].apply({"params": params[name]}, t, vid)

    # ------------------------------------------------------------------
    # envs / windows (reference dp_model.py:354-405 reinit_envs)
    # ------------------------------------------------------------------
    def reinit_envs(self, num_envs, frames_per_wdw, is_eval=False, overwrite=False):
        # single-env eval on the soa engine is padded to the training env
        # width so it chains the ALREADY-COMPILED training-interval
        # kernels (VERDICT round-3 #6); duplicated deterministic envs
        # leave every reduced loss bitwise-unchanged vs num_envs=1
        self.eval_env_requested = None
        if is_eval and num_envs == 1:
            pad = self._eval_env_pad()
            if pad > 1 and self.resolve_engine(is_train=False) == "soa":
                self.eval_env_requested = num_envs
                num_envs = pad
        self.num_envs = num_envs
        self.frames_per_wdw = frames_per_wdw
        self.is_eval = is_eval
        n_steps = self.steps_per_fr_interval * (frames_per_wdw - 1) + 1
        self.steps_idx = np.arange(n_steps)
        self.steps_idx_fr = self.steps_idx / self.steps_per_fr_interval
        self.frame2step = self.steps_idx[:: self.steps_per_fr_interval]

    # ------------------------------------------------------------------
    # forward (pure, jitted per (num_envs, frames_per_wdw))
    # ------------------------------------------------------------------
    def _interp_amp(self, steps_fr):
        """Linear interpolation of the mocap table at fractional frames,
        with linear extrapolation (replaces host scipy interp1d,
        reference dp_model.py:421-427)."""
        T = self.amp_table.shape[0]
        i0 = jnp.clip(jnp.floor(steps_fr), 0, max(T - 2, 0)).astype(jnp.int32)
        frac = steps_fr - i0
        a = self.amp_table[i0]
        b = self.amp_table[jnp.minimum(i0 + 1, T - 1)]
        return a + (b - a) * frac[..., None]

    def _sim_params(self, params, joint_X_p=None):
        body_mass = params["body_mass"]
        inertia = self.norm_body_inertia * body_mass[:, None, None]
        return SimParams(
            body_mass=body_mass,
            body_inv_mass=1.0 / body_mass,
            body_inertia=inertia,
            body_inv_inertia=jnp.linalg.inv(inertia),
            joint_target_ke=params["target_ke"],
            joint_target_kd=params["target_kd"],
            joint_X_p=joint_X_p,
        )

    # -- reference-surface compatibility helpers -----------------------
    def get_mocap_data(self, steps_fr):
        """Interpolated + GL-converted mocap slices at (possibly
        fractional) frames (reference get_mocap_data, dp_model.py:605-609).
        The bullet->GL conversion is already baked into the device table.
        """
        amp = self._interp_amp(jnp.asarray(steps_fr, jnp.float32))
        return parse_amp(amp)

    def get_net_pred(self, steps_fr, params=None):
        """The five time-MLP predictions for a (bs, T) frame grid
        (reference get_net_pred, dp_model.py:518-552). Returns
        (torques, delta_root, delta_ja_ref, state_qd, res_f)."""
        params = self.params if params is None else params
        steps_fr = jnp.asarray(steps_fr, jnp.float32)
        bs, nstep = steps_fr.shape
        flat = steps_fr.reshape(-1)
        torques = self._mlp(params, "torque_mlp", flat).reshape(bs, nstep, -1) * 0.0
        res_f = self._mlp(params, "residual_f_mlp", flat).reshape(bs, nstep, -1, 6)
        res_f = (res_f.at[..., :3].multiply(10.0)).reshape(bs, nstep, -1) * 0.0
        delta_root = self._mlp(params, "root_pose_mlp", flat).reshape(bs, nstep, -1)
        delta_ja = self._mlp(params, "joint_angle_mlp", flat).reshape(bs, nstep, -1)
        state_qd = self._mlp(params, "vel_mlp", flat).reshape(bs, nstep, -1)
        return torques, delta_root, delta_ja, state_qd, res_f

    @staticmethod
    def rearrange_pred(queried_q, queried_ja, queried_qd, torques, res_f):
        """(bs, T, .) -> (T, bs*.) layouts (reference rearrange_pred,
        dp_model.py:554-572)."""
        bs, nstep, _ = queried_q.shape
        qq = jnp.concatenate([queried_q, queried_ja], -1)
        qq = qq.transpose(1, 0, 2).reshape(nstep, -1)
        qd = queried_qd.transpose(1, 0, 2).reshape(nstep, -1)
        ref_ja = jnp.concatenate(
            [jnp.zeros_like(queried_ja[..., :1].repeat(6, -1)), queried_ja], -1
        ).transpose(1, 0, 2).reshape(nstep, -1)
        torques = torques.reshape(nstep, -1)
        res_f = res_f.reshape(nstep, -1, 6)
        return ref_ja, qq, qd, torques, res_f

    def get_optimizable_param_list(self):
        """(params_ref_list, params_list, lr_list) over trainable top-level
        groups (reference dp_model.py:478-509)."""
        params_ref_list, params_list, lr_list = [], [], []
        for name, lr in sorted(self.param_peak_lr.items()):
            if lr > 0:
                params_ref_list.append({name: self.params[name]})
                params_list.append(self.params[name])
                lr_list.append(lr)
        return params_ref_list, params_list, lr_list

    def get_batch_input(self, params, steps_fr):
        """Targets + network predictions for a window (reference
        dp_model.py:611-662). steps_fr (E, S) fractional frames.
        Returns dict of traced arrays.
        """
        E, S = steps_fr.shape
        amp = self._interp_amp(steps_fr)
        msm = parse_amp(amp)
        target_ja = msm["jang"][..., : self.n_dof]
        target_jad = msm["jvel"][..., : self.n_dof]
        target_q = jnp.concatenate([msm["pos"], msm["orn"]], -1)
        target_qd = jnp.concatenate([msm["vel"], msm["avel"]], -1)

        # ground alignment by the optimizable global SE(3)
        target_q = rotate_frame(params["global_q"], target_q)
        target_qd = rotate_frame_vel(params["global_q"], target_qd)

        # network predictions at every substep
        flat = steps_fr.reshape(-1)
        torques = self._mlp(params, "torque_mlp", flat).reshape(E, S, -1) * 0.0
        res_f = self._mlp(params, "residual_f_mlp", flat).reshape(E, S, -1, 6)
        res_f = res_f.at[..., :3].multiply(10.0)
        res_f = res_f * 0.0  # disabled, parity with reference :529/:536
        delta_root = self._mlp(params, "root_pose_mlp", flat).reshape(E, S, -1)
        delta_ja = self._mlp(params, "joint_angle_mlp", flat).reshape(E, S, -1)
        state_qd = self._mlp(params, "vel_mlp", flat).reshape(E, S, -1)

        queried_q = compose_delta(target_q, delta_root)
        queried_ja = target_ja + delta_ja

        return dict(
            target_q=target_q, target_qd=target_qd,
            target_ja=target_ja, target_jad=target_jad,
            queried_q=queried_q, queried_ja=queried_ja,
            queried_qd=state_qd, torques=torques, res_f=res_f,
        )

    def fk_pos_vel(self, q7, ja, qd6, jad, joint_X_p=None):
        """FK of [root 7 + joint angles] with velocities given in ppr
        layout (reference dp_model.py:588-603). Inputs (E, F, .)."""
        joint_q = jnp.concatenate([q7, ja], -1)
        joint_qd = swap_lin_ang(jnp.concatenate([qd6, jad], -1))
        body_q, body_qd = eval_fk(self.env, joint_q, joint_qd, joint_X_p=joint_X_p)
        return body_q, swap_lin_ang(body_qd)

    def get_foot_height(self, body_q):
        """Min collision-mesh height (reference get_foot_height,
        dp_model.py:574-579: min over all mesh vertices)."""
        verts = jnp.asarray(self._mesh_verts)
        vbody = self._mesh_vbody
        rot = quat_to_matrix(body_q[..., 3:7])  # (..., B, 3, 3)
        row1 = rot[..., vbody, 1, :]  # (..., V, 3)
        y = jnp.sum(row1 * verts, -1) + body_q[..., vbody, 1]
        return jnp.min(y, axis=-1)

    def _forward_pure(self, params, frame_start, key, progress, weights, is_train):
        """The whole training forward as a pure function."""
        E = self.num_envs
        F = self.frames_per_wdw
        S = len(self.steps_idx)
        sub = self.steps_per_fr_interval
        f2s = self.frame2step

        steps_fr = frame_start[:, None] + jnp.asarray(self.steps_idx_fr, jnp.float32)[None]

        # out-of-sequence mask over frames (reference dp_model.py:677-682)
        sampler = self.samplers["joint_angle_mlp"]
        vidid = sampler.frame_to_vid(steps_fr[:, f2s])
        outseq = (vidid[:, :1] - vidid) != 0

        batch = self.get_batch_input(params, steps_fr)
        # optional per-env joint-anchor override from the lab4d layer
        xp = batch.get("joint_X_p")  # (E, B, 7) or None
        xp_f = xp[:, None] if xp is not None else None  # broadcast over frames

        # target + control-reference FK in ONE stacked instantiation (the
        # FK program is the compile-time heavyweight; reference issues two
        # separate ForwardKinematics calls, dp_model.py:636 and :758)
        stk = lambda a, b: jnp.stack([a[:, f2s], b[:, f2s]], 0)
        both_position, both_velocity = self.fk_pos_vel(
            stk(batch["target_q"], batch["queried_q"]),
            stk(batch["target_ja"], batch["queried_ja"]),
            stk(batch["target_qd"], batch["queried_qd"][..., :6]),
            stk(batch["target_jad"], batch["queried_qd"][..., 6:]),
            joint_X_p=xp_f[None] if xp_f is not None else None,
        )
        target_position, queried_position = both_position[0], both_position[1]
        queried_velocity = both_velocity[1]

        # initial state (+ annealed noise, reference dp_model.py:700-712)
        q_init = jnp.concatenate(
            [batch["queried_q"][:, 0], batch["queried_ja"][:, 0]], -1
        )
        if is_train and self.noise_std > 0:
            noise_ratio = jnp.clip(1.0 - 1.5 * progress, 0.0, 1.0)
            noise = jax.random.normal(key, q_init.shape) * self.noise_std * noise_ratio
            noise = noise.at[:, :3].set(0.0)
            noise = noise.at[:, 3:7].multiply(5.0)
            q_init = q_init + noise
        qd_init = swap_lin_ang(batch["queried_qd"][:, 0])

        body_q0, body_qd0 = eval_fk(self.env, q_init, qd_init, joint_X_p=xp)
        state0 = SimState(body_q0, body_qd0)

        # control reference at every substep: zeros(6) + queried joint
        # angles (reference rearrange_pred, dp_model.py:554-572)
        ref_ja = jnp.concatenate(
            [jnp.zeros((E, S, 6)), batch["queried_ja"]], -1
        ).transpose(1, 0, 2)  # (S, E, n_qd)
        torques = jnp.concatenate(
            [jnp.zeros((E, S, 6)), batch["torques"]], -1
        ).transpose(1, 0, 2)
        res_f = swap_lin_ang(batch["res_f"]).transpose(1, 0, 2, 3)  # (S,E,B,6)

        # gradient scrubbing at the rollout boundary (reference
        # remove_nan/clamp, dp_model.py:1294-1384); ref_quirks swaps in
        # the reference-exact upper-only adjoint clamp
        quirks = bool(self.opts.get("ref_quirks", False))
        scrub = scrub_grad_ref if quirks else scrub_grad
        engine = self.resolve_engine(is_train=is_train)
        if engine == "soa":
            # differentiable pallas megakernel path (pallas_soa_grad):
            # one VMEM-resident kernel per frame interval, forward and
            # backward. The lab4d live joint_X_p override rides along as
            # traced XP_NAMES planes (with_xp kernels). The interval fn
            # must be built OUTSIDE the trace (_soa_interval) — its
            # kernel closes over constant arrays that must not be
            # tracers.
            from ..sim.pallas_soa_grad import rollout_soa

            ivf = self._soa_interval(with_xp=xp is not None)
            sp = self._sim_params(params, joint_X_p=xp)

            def _roll(bq0, bqd0, t, a, r, sp):
                return rollout_soa(
                    self.integrator, sp, SimState(bq0, bqd0), t, a, r,
                    self.dt, sub, interval_fn=ivf,
                )

            mesh = self._mesh_for(self.num_envs)
            if mesh is not None:
                # explicit dp sharding of the kernel region: each chip
                # rolls out its env shard (a bare pallas_call under
                # auto-SPMD would be all-gathered + replicated instead)
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                # params are replicated except the per-env joint anchors
                sp_spec = jax.tree.map(lambda _: P(), sp)
                if xp is not None:
                    sp_spec = sp_spec._replace(joint_X_p=P("dp"))
                _roll = shard_map(
                    _roll, mesh=mesh,
                    in_specs=(P("dp"), P("dp"), P(None, "dp"),
                              P(None, "dp"), P(None, "dp"), sp_spec),
                    out_specs=(P(None, "dp"), P(None, "dp"),
                               P(None, "dp"), P(None, "dp")),
                    check_vma=False,
                )
            sim_q, sim_qd, grfs, jafs = _roll(
                state0.body_q, state0.body_qd,
                scrub(ref_ja), scrub(torques), scrub(res_f), sp,
            )
        else:
            sim_q, sim_qd, grfs, jafs = rollout(
                self.integrator, self._sim_params(params, joint_X_p=xp), state0,
                scrub(ref_ja), scrub(torques), scrub(res_f),
                self.dt, sub,
                # unroll=4 is the fast default (XLA fuses across substeps)
                # but scales compile time with robot size; big-robot
                # templates (quad/human) may prefer 1
                unroll=int(self.opts.get("rollout_unroll", 4)),
            )
        # (F, E, B, x) -> (E, F, B, x)
        sim_position = sim_q.transpose(1, 0, 2, 3)
        sim_velocity = swap_lin_ang(sim_qd.transpose(1, 0, 2, 3))

        foot_height = self.get_foot_height(queried_position)

        # ---- losses (reference dp_model.py:775-838) -----------------------
        loss_dict = {}
        loss_traj = se3_loss(sim_position, target_position).mean(-1)
        loss_traj = jnp.where(outseq, 0.0, loss_traj)
        loss_dict["traj"] = reduce_loss(loss_traj, clip=True, env0_th=quirks)

        loss_pos = se3_loss(
            queried_position, jax.lax.stop_gradient(sim_position)
        ).mean(-1)
        loss_pos = jnp.where(outseq, 0.0, loss_pos)
        loss_dict["pos_state"] = reduce_loss(loss_pos)

        loss_vel = se3_loss(
            queried_velocity, jax.lax.stop_gradient(sim_velocity)
        ).mean(-1)
        loss_vel = jnp.where(outseq, 0.0, loss_vel)
        loss_dict["vel_state"] = reduce_loss(loss_vel)

        loss_dict["pos_distill"] = self._distill_loss(
            params, steps_fr, sim_position, outseq
        )

        loss_dict["reg_torque"] = jnp.mean(batch["torques"] ** 2)
        loss_dict["reg_res_f"] = jnp.mean(batch["res_f"] ** 2)
        loss_dict["reg_foot"] = jnp.mean(foot_height ** 2)

        total = 0.0
        for i, k in enumerate(LOSS_KEYS):
            total = total + loss_dict[k] * weights[i]

        out = {"loss_" + k: v for k, v in loss_dict.items()}
        out["total_loss"] = total

        aux = dict(
            sim_traj=sim_q[:, 0],  # (F, B, 7) env 0, for vis
            target_traj=target_position[0],  # (F, B, 7)
            pid_ref=queried_position[0],
            # warp layout [torque, force]: vis reads force at [..., 3:6]
            # like the reference (urdf_utils.py:240)
            grf=grfs[:, 0],
            jaf=jafs[:, 0],
        )
        aux = self._extend_aux(aux, params, batch, steps_fr, sim_position)
        return out, aux

    def _extend_aux(self, aux, params, batch, steps_fr, sim_position):
        """Hook for subclasses to add eval observables (cameras,
        distilled trajectories, ...)."""
        return aux

    def _distill_loss(self, params, steps_fr, sim_position, outseq):
        """pos_distill hook — overridden by the lab4d interface
        (reference dp_model.py:800-804). Zero in mocap mode."""
        return jnp.zeros(())

    # ------------------------------------------------------------------
    # host-side train loop API (reference method surface)
    # ------------------------------------------------------------------
    def set_progress(self, num_iters):
        self.progress = num_iters / self.total_iters
        self.set_loss_weight("reg_cam_prior_wt", (0, 0.5), (1, 0), self.progress)

    def set_loss_weight(self, loss_name, anchor_x, anchor_y, current_steps, type="linear"):
        if loss_name not in self.opts:
            return
        if "%s_init" % loss_name not in self.opts:
            self.opts["%s_init" % loss_name] = self.opts[loss_name]
        factor = interp_wt(anchor_x, anchor_y, current_steps, type=type)
        self.opts[loss_name] = self.opts["%s_init" % loss_name] * factor

    def _weights_vec(self):
        return jnp.asarray(
            [float(self.opts.get(k + "_wt", 0.0)) for k in LOSS_KEYS], jnp.float32
        )

    def compute_frame_start(self, key):
        u = jax.random.uniform(key, (self.num_envs,))
        return jnp.round(u * (self.total_frames - self.frames_per_wdw)).astype(
            jnp.float32
        )

    def _mesh_for(self, num_envs):
        """Device mesh for a given env count, or None for single-device.

        dp = largest divisor of num_envs within the device budget (envs are
        whole units of work — the rollout cannot split one env), tp from
        opts["mesh_shape"]. Cached per (dp, tp).
        """
        from ..parallel.sharding import make_mesh

        D = len(self._devices)
        tp = self._tp if (self._tp > 1 and D % self._tp == 0) else 1
        cap = D // tp
        if self._dp_cap is not None:
            cap = min(cap, self._dp_cap)
        dp = max(
            (d for d in range(1, cap + 1) if num_envs % d == 0), default=1
        )
        if dp * tp <= 1:
            return None
        key = (dp, tp)
        if key not in self._mesh_cache:
            shape = {"dp": dp, "tp": tp} if tp > 1 else {"dp": dp}
            self._mesh_cache[key] = make_mesh(shape, self._devices)
        return self._mesh_cache[key]

    def _shardings_for(self, mesh):
        """(param, env, replicated) NamedShardings for a mesh."""
        from ..parallel.sharding import env_sharding, param_shardings, replicated

        return param_shardings(mesh, self.params), env_sharding(mesh), replicated(mesh)

    def _place_train_args(self, frame_start, key, progress, weights):
        """Shard the train-step inputs over the mesh: env axis (frame_start)
        over dp, params replicated over dp with MLP trunk kernels over tp.
        SPMD propagates the input shardings through the jitted step; XLA
        inserts the loss/grad psums over ICI. device_put is a no-op when
        the arrays are already placed (steady state), an explicit reshard
        otherwise (first call, after rollback/checkpoint-load)."""
        mesh = self._mesh_for(self.num_envs)
        if mesh is None:
            return self.params, frame_start, key, progress, weights
        ps, es, r = self._shardings_for(mesh)
        self.params = jax.device_put(self.params, ps)
        return (
            self.params,
            jax.device_put(frame_start, es),
            jax.device_put(key, r),
            jax.device_put(progress, r),
            jax.device_put(weights, r),
        )

    def resolve_engine(self, is_train=True):
        """Resolve opts['phys_engine'] ('auto' default: the differentiable
        pallas megakernel on TPU, the XLA scan elsewhere).

        EVAL on 'auto' routes to the XLA scan — measured on v5e on BOTH
        eval-bench sequences (docs/results/round{4,5}/eval_bench.jsonl):
        XLA eval beats the padded-soa routing on first (compile) AND
        steady walls (mi-pace 39-frame: 26.6 s / 0.163 s vs 39.4 s /
        0.202 s; mi-sidesteps 146-frame 24 Hz: 38 s / 10.5 s vs 203 s /
        21.7 s). The round-4 rationale for padded-soa (skip a second
        engine's compile when training runs soa) did not survive the
        second measurement: the whole-sequence orchestration around the
        reused interval kernels costs more than the XLA eval program
        itself. ``opts['eval_engine']='soa'`` keeps the padded-soa
        routing selectable: ``reinit_envs`` pads the single eval env up
        to the training env width (``_eval_env_pad``) so the eval jit
        reuses the training kernels' Mosaic artifacts instead of
        compiling a pathological lane-1 whole-sequence kernel (~9 min
        measured on v5e round 3). The lab4d live joint-anchor override
        (joint_X_p traced per-env, reference dp_interface.py:438-466)
        runs on either engine: the soa kernels thread the anchors as
        traced XP_NAMES planes (``with_xp``)."""
        eng = self.opts.get("phys_engine", "auto") or "auto"
        if eng == "auto":
            on_tpu = jax.default_backend() == "tpu"
            if not is_train:
                ev = self.opts.get("eval_engine", "auto") or "auto"
                # explicit --eval_engine soa wins (like phys_engine)
                return "soa" if ev == "soa" else "xla"
            eng = "soa" if on_tpu else "xla"
            # Round-3's quad-class exception (many dofs, sparse contacts
            # routed to the XLA scan) is retired: the flat contact layout
            # (pallas_soa.flat_contact_pad, auto for C<=FLAT_MAX_C) wins
            # that cell outright on hardware — quad 4.53M flat-soa vs
            # 2.21M XLA env-steps/s at 60 Hz, 4.40M vs 2.24M at 24 Hz,
            # human 5.20M flat-soa (1024 envs, v5e,
            # docs/results/round4/quad_bench.jsonl)
        return eng

    def _eval_env_pad(self):
        """Env width full-sequence eval is padded to on the soa engine:
        the training window's env count, so the eval rollout instantiates
        the exact per-interval kernel shapes training already compiled
        (lane tile = pick_tile(E_train, e_tile)). Deterministic eval of
        identical duplicated envs leaves every reduced loss unchanged."""
        return max(1, int(self.opts.get("num_envs", 1)))

    def _contacts_flat(self):
        """Padded flat-contact row count when the kernels will use the
        flat layout (pallas_soa.flat_contact_pad), 0 otherwise — feeds
        the VMEM planner so flat residual planes are budgeted."""
        from ..sim.pallas_soa import flat_contact_pad

        return flat_contact_pad(self.env)

    def _soa_e_tile(self, with_xp=False):
        """opts['soa_e_tile'], or (0 = auto, the default) the largest
        single-kernel tile per pick_e_tile's measured policy."""
        et = int(self.opts.get("soa_e_tile", 0) or 0)
        if et > 0:
            return et
        from ..sim.pallas_soa_grad import pick_e_tile

        return pick_e_tile(
            self.steps_per_fr_interval, self.env.n_links, self.env.n_qd,
            with_res=bool(self.opts.get("soa_with_res", False)),
            with_act=bool(self.opts.get("soa_with_act", False)),
            with_xp=with_xp, contacts_flat=self._contacts_flat(),
        )

    def _soa_chunks(self, with_xp=False):
        """Kernel chunk sizes for one frame interval: manual via
        opts['soa_ksub'], else the VMEM plan (splits only extreme
        substeps x e_tile products under the raised Mosaic cap)."""
        from ..sim.pallas_soa_grad import plan_chunks

        sub = self.steps_per_fr_interval
        ksub = int(self.opts.get("soa_ksub", 0) or 0)
        if ksub > 0:
            n = -(-sub // ksub)
            base, rem = sub // n, sub % n
            return [base + 1] * rem + [base] * (n - rem)
        return plan_chunks(
            sub, self.env.n_links, self.env.n_qd,
            self._soa_e_tile(with_xp),
            with_res=bool(self.opts.get("soa_with_res", False)),
            with_act=bool(self.opts.get("soa_with_act", False)),
            with_xp=with_xp, contacts_flat=self._contacts_flat(),
        )

    def _soa_interval(self, with_xp=False):
        """Build (and cache) the differentiable pallas frame-interval
        kernel (chain) for the current integrator. Must run on the host,
        outside any jit trace — the kernel body closes over constant
        arrays that would otherwise be captured as tracers."""
        from ..sim.pallas_soa_grad import make_diff_chain

        key = (id(self.integrator), self.steps_per_fr_interval, with_xp)
        cache = getattr(self, "_soa_cache", None)
        if cache is None:
            cache = self._soa_cache = {}
        if key not in cache:
            cache[key] = make_diff_chain(
                self.integrator, self.dt, self.steps_per_fr_interval,
                chunk_sizes=self._soa_chunks(with_xp=with_xp),
                e_tile=self._soa_e_tile(with_xp),
                interpret=jax.default_backend() == "cpu",
                with_xp=with_xp,
                # residual forces and joint activations are structurally
                # zero in every reference configuration (dp_model.py:529/
                # :536) — omitting their VMEM buffers is what lets
                # e_tile=128 fit; soa_with_res / soa_with_act restore them
                # for configs that actually drive res_f / torques
                with_res=bool(self.opts.get("soa_with_res", False)),
                with_act=bool(self.opts.get("soa_with_act", False)),
            )
        return cache[key]

    def _get_jit(self, kind):
        sig = (kind, self.num_envs, self.frames_per_wdw)
        if sig not in self._jit_cache:
            _jit = jax.jit
            if self.resolve_engine(is_train=kind == "grad") == "soa":
                # pre-build on host, outside the trace
                self._soa_interval(with_xp=self.has_live_xp)

            if kind == "grad":
                def fn(params, frame_start, key, progress, weights):
                    def loss_fn(p):
                        out, aux = self._forward_pure(
                            p, frame_start, key, progress, weights, True
                        )
                        return out["total_loss"], (out, aux)

                    (loss, (out, aux)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(params)
                    # per-TENSOR norms over trainable (lr>0) leaves: the
                    # reference's grad queue / tensorboard keys are per
                    # named parameter, not per top-level group
                    # (dp_model.py:969-975 params_ref_list entries)
                    lr_tree = self.param_lr_tree
                    norms = {}

                    def _norm(path, g, lr):
                        if lr > 0:
                            norms[self._leaf_name(path)] = jnp.sqrt(
                                jnp.sum(jnp.square(g))
                            )
                        return g

                    jax.tree_util.tree_map_with_path(_norm, grads, lr_tree)
                    masked = jax.tree.map(
                        lambda g, lr: g * (lr > 0), grads, lr_tree
                    )
                    gnorm = optax.global_norm(masked)
                    return out, grads, norms, gnorm

                self._jit_cache[sig] = _jit(fn)
            else:  # eval forward
                def fn(params, frame_start, key, progress, weights):
                    return self._forward_pure(
                        params, frame_start, key, progress, weights, False
                    )

                self._jit_cache[sig] = _jit(fn)
        return self._jit_cache[sig]

    def forward(self, frame_start=None):
        """One forward; in train mode also computes and accumulates grads
        (the reference's forward/backward split maps onto jax's
        value_and_grad — ``backward`` just closes the accumulation)."""
        self.rng, k1, k2 = jax.random.split(self.rng, 3)
        if frame_start is None:
            frame_start = self.compute_frame_start(k1)
            if self.eval_env_requested:
                # padded eval (see reinit_envs): all duplicates start
                # where the single requested env would
                frame_start = jnp.broadcast_to(
                    frame_start[:1], (self.num_envs,)
                )
        else:
            frame_start = jnp.asarray(frame_start, jnp.float32)
            if self.eval_env_requested and frame_start.shape[0] < self.num_envs:
                frame_start = jnp.broadcast_to(
                    frame_start[:1], (self.num_envs,)
                )
            frame_start = frame_start[: self.num_envs]

        w = self._weights_vec()
        prog = jnp.float32(self.progress)
        params, frame_start, k2, prog, w = self._place_train_args(
            frame_start, k2, prog, w
        )
        if self.is_eval:
            out, aux = self._get_jit("eval")(params, frame_start, k2, prog, w)
            self._store_eval_aux(aux)
        else:
            out, grads, norms, gnorm = self._get_jit("grad")(
                params, frame_start, k2, prog, w
            )
            self._grad_accum.append((grads, norms, gnorm))
        return out

    def _store_eval_aux(self, aux):
        self.sim_trajs = np.asarray(aux["sim_traj"])
        self.target_trajs = np.asarray(aux["target_traj"])
        self.pid_ref = np.asarray(aux["pid_ref"])
        self.grfs = np.asarray(aux["grf"])
        self.jafs = np.asarray(aux["jaf"])
        self._check_hull_contacts(self.sim_trajs)

    def _check_hull_contacts(self, body_q):
        """'hull' contact candidates are exact only while no interior mesh
        vertex crosses the ground plane (builder.validate_hull_contacts).
        Every eval rollout is checked; on violation we fall back to the
        reference-exact every-vertex contact set for all subsequent
        rollouts (contact_fallback=False keeps hull mode and just warns)."""
        if self.env.contact_mode != "hull":
            return
        viol = self.env.validate_hull_contacts(body_q)
        # Margin calibrated by measurement (2026-08-16, mi-pace eval
        # rollouts, 1255 substeps): at a 1.63 mm interior-vertex violation
        # the hull-vs-all trajectory difference was 0.63 mm max
        # (traj-loss diff 0.004% rel); at zero violation it is fp32 noise
        # (3.9e-7 m). Interior vertices sit in foot concavities whose hull
        # neighbors already carry the contact force. Default falls back at
        # ~2x the measured-negligible depth.
        margin = float(self.opts.get("hull_fallback_margin", 3e-3))
        if viol <= margin:
            return
        print(
            "hull-contact assumption violated (interior vertex %.4f m below "
            "ground)" % viol
        )
        if self.opts.get("contact_fallback", True):
            print("falling back to contact_mode='all' (reference-exact)")
            self.env.make_ground_contacts("all")
            self.integrator = SemiImplicitIntegrator(self.env)
            self._jit_cache.clear()

    def backward(self, loss):
        """No-op bridge: gradients were produced in forward()."""
        return

    # ------------------------------------------------------------------
    # optimizer (reference add_optimizer/get_lr_dict, dp_model.py:429-509)
    # ------------------------------------------------------------------
    def get_lr_dict(self):
        opts = self.opts
        lr_base = opts["phys_learning_rate"]
        lr_explicit = lr_base * 10
        param_lr_startwith = {
            "global_q": lr_explicit,
            "target_ke": lr_explicit,
            "target_kd": lr_explicit,
            "attach_ke": lr_explicit,
            "attach_kd": lr_explicit,
            "body_mass": lr_explicit,
            "root_pose_mlp": lr_base,
            "joint_angle_mlp": lr_base,
            "vel_mlp": lr_base,
            "torque_mlp": lr_base,
            "residual_f_mlp": lr_base,
        }
        param_lr_with = {"root_pose_mlp.base_quat": lr_explicit}
        return param_lr_startwith, param_lr_with

    @staticmethod
    def _leaf_name(path) -> str:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        return ".".join(parts)

    def _param_lr_tree(self):
        """Per-leaf peak lr pytree via dotted-name routing, exactly the
        reference's match_param_name semantics (dp_model.py:478-509):
        'with' matches take priority over 'startwith'."""
        startwith, withmap = self.get_lr_dict()

        def assign(path, leaf):
            name = self._leaf_name(path)
            matched_loose, lr_loose = match_param_name(name, withmap, "with")
            matched, lr = match_param_name(name, startwith, "startwith")
            if matched_loose:
                return lr_loose
            if matched:
                return lr
            return 0.0

        return jax.tree_util.tree_map_with_path(assign, self.params)

    def _param_lrs(self):
        """Top-level param name -> peak lr (0 = frozen), for logging and
        group-level grad statistics."""
        tree = self._param_lr_tree()
        return {
            k: float(max(jax.tree_util.tree_leaves(v) or [0.0]))
            for k, v in tree.items()
        }

    def add_optimizer(self, opts):
        total = max(2, self.total_iters)
        pct_start = 2.0 / total
        div, final_div = 25.0, 100.0

        def onecycle(step):
            # torch OneCycleLR, linear anneal (reference dp_model.py:466-476),
            # with torch's exact phase boundaries: warmup ends at step
            # pct_start*total - 1, the anneal at total - 1 (torch
            # lr_scheduler.OneCycleLR._schedule_phases); pinned against
            # torch update-for-update in tests/test_optimizer_parity.py
            end1 = max(pct_start * total - 1.0, 1e-6)
            end2 = max(total - 1.0, 1.0)
            t = jnp.minimum(jnp.asarray(step, jnp.float32), end2)
            init, fin = 1.0 / div, 1.0 / (div * final_div)
            # lerp form: endpoint-exact in fp32 (the additive form loses
            # ~2e-5 rel at the tiny final lr to cancellation)
            f1 = t / end1
            up = (1.0 - f1) * init + f1 * 1.0
            f2 = (t - end1) / (end2 - end1)
            down = (1.0 - f2) * 1.0 + f2 * fin
            return jnp.where(t <= end1, up, down)

        self._lr_schedule = onecycle
        self.param_lr_tree = self._param_lr_tree()
        self.param_peak_lr = self._param_lrs()
        lr_tree = self.param_lr_tree

        # LR table (reference prints per-param name/shape/lr,
        # dp_model.py:507-508)
        for name, lr in sorted(self.param_peak_lr.items()):
            if lr > 0:
                n_leaves = len(jax.tree_util.tree_leaves(self.params[name]))
                print("%-24s lr=%g (%d tensors)" % (name, lr, n_leaves))

        def scale_by_group():
            def init_fn(params):
                return optax.EmptyState()

            def update_fn(updates, state, params=None):
                scaled = jax.tree.map(lambda g, lr: g * lr, updates, lr_tree)
                return scaled, state

            return optax.GradientTransformation(init_fn, update_fn)

        self.tx = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(1e-4),
            scale_by_group(),
            optax.scale_by_schedule(lambda step: -onecycle(step)),
        )
        self.opt_state = self.tx.init(self.params)

        def apply(params, opt_state, grads, scales):
            # scales: per-leaf pytree (median-queue clip factors)
            grads = jax.tree.map(lambda g, s: g * s, grads, scales)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        self._apply_jit = jax.jit(apply)

    def check_grad(self, thresh=10.0):
        """Reference-named grad-safety entry (dp_model.py:936-999):
        aggregate the accumulated gradients, run the grad-norm rollback and
        per-parameter median-queue clipping, and stage the surviving
        (grads, scales) for update(). Returns the grad-statistics dict
        ({} when the step was rolled back)."""
        assert self._grad_accum, "forward() must run before update()"
        n = len(self._grad_accum)
        if n == 1:
            # common case (accu_steps=1): no eager device ops at all.
            # (Python sum() starts at 0, so even a 1-term sum dispatches
            # an eager int+Array add per leaf on the sharded grads —
            # observed to trip an XLA:CPU runtime abort late in long
            # processes, and it is pure overhead anyway.)
            grads, norms_dev, gnorm_dev = self._grad_accum[0]
        else:
            # accu_steps > 1: average inside ONE jitted program (per-leaf
            # eager adds on sharded arrays are both slow and the op class
            # that tripped the XLA:CPU abort above)
            cache = getattr(self, "_accum_jit", None)
            if cache is None:
                cache = self._accum_jit = {}
            if n not in cache:
                def _avg(accum, n=n):
                    grads = jax.tree.map(
                        lambda *g: sum(g) / n, *[a[0] for a in accum]
                    )
                    gnorm = sum(a[2] for a in accum) / n
                    norms = {k: sum(a[1][k] for a in accum) / n
                             for k in accum[0][1]}
                    return grads, norms, gnorm

                cache[n] = jax.jit(_avg)
            grads, norms_dev, gnorm_dev = cache[n](self._grad_accum)
        # ONE host transfer for all grad statistics (each float() would be a
        # separate device->host round trip — expensive over the TPU tunnel)
        gnorm, norms = jax.device_get((gnorm_dev, norms_dev))
        gnorm = float(gnorm)
        norms = {k: float(v) for k, v in norms.items()}
        self._grad_accum = []

        res = self.check_grad_dict(grads, norms, gnorm, thresh)
        if res is None:
            self._pending_update = None
            return {}
        scales, grad_dict = res
        self._pending_update = (grads, scales)
        return grad_dict

    def update(self):
        """Grad safety then optimizer apply (reference update,
        dp_model.py:511-516)."""
        grad_dict = self.check_grad()
        if not getattr(self, "_pending_update", None):
            return grad_dict
        grads, scales = self._pending_update
        self._pending_update = None
        scales = self._scales_tree(scales)
        mesh = self._mesh_for(self.num_envs)
        if mesh is not None:
            # canonical placement: grads come out of the sharded train step
            # with XLA-chosen layouts; params may be host arrays right
            # after a rollback. Recommitting everything to the parameter
            # shardings keeps the apply jit single-specialization.
            ps, _, r = self._shardings_for(mesh)
            grads = jax.device_put(grads, ps)
            self.params = jax.device_put(self.params, ps)
            self.opt_state = jax.device_put(
                self.opt_state, jax.tree.map(lambda _: r, self.opt_state)
            )
        self.params, self.opt_state = self._apply_jit(
            self.params, self.opt_state, grads, scales
        )
        return grad_dict

    def check_grad_dict(self, grads, norms, gnorm, thresh=10.0):
        """Grad-norm rollback + per-param median-queue clipping
        (reference check_grad, dp_model.py:936-999)."""
        if not np.isfinite(gnorm) or gnorm > thresh:
            print("large grad: %.2f, clear gradients" % gnorm)
            if self.model_cache[0] is not None:
                print("fallback to cached model")
                self.params = jax.tree.map(jnp.asarray, self.model_cache[0])
                self.opt_state = self.optimizer_cache[0]
            # the reference's update() still steps its LR scheduler on a
            # rolled-back iter (zero_grad(set_to_none) makes AdamW skip
            # params, but scheduler.step() runs unconditionally,
            # dp_model.py:511-516 + :952-961) — advance the schedule
            # count the same way so post-rollback LRs stay in lockstep
            self.opt_state = self._bump_schedule_count(self.opt_state)
            return None

        # per-tensor median-queue clipping, keyed by dotted tensor name
        # (reference iterates params_ref_list — one named tensor each,
        # dp_model.py:966-999)
        grad_dict = {}
        scales = {}
        queue_length = 10
        for name, g in norms.items():
            grad_dict["grad/" + name] = g
            scales[name] = 1.0
            scale_threshold = 5.0
            q = self.grad_queue.setdefault(name, [])
            if len(q) > queue_length:
                # torch.median semantics (the reference clips against
                # torch.stack(q[:-1]).median(), dp_model.py:989): the
                # LOWER middle element of the even-length slice —
                # np.median would average the middle pair instead
                arr = np.sort(np.asarray(q[:-1]))
                med = float(arr[(len(arr) - 1) // 2])
                grad_dict["grad_med/" + name] = med
                if g > scale_threshold * med and g > 0:
                    scales[name] = med / g
                    print("large grad: %.2f, clear %s" % (g, name))
                else:
                    q.append(g)
                    q.pop(0)
            else:
                q.append(g)
        return scales, grad_dict

    @staticmethod
    def _bump_schedule_count(opt_state):
        """+1 on the scale_by_schedule count only (NOT scale_by_adam's —
        torch AdamW per-param step counts do not advance when grads are
        None on a rolled-back iter)."""
        return tuple(
            s._replace(count=s.count + 1)
            if isinstance(s, optax.ScaleByScheduleState) else s
            for s in opt_state
        )

    def _scales_tree(self, scales):
        """Per-leaf scale pytree from a {name: scale} dict: exact dotted
        leaf name first, else the longest dotted-prefix match (so group-
        level keys scale whole modules), else 0 (frozen leaves take no
        update either way)."""

        def pick(path, _):
            name = self._leaf_name(path)
            if name in scales:
                return scales[name]
            best, blen = 0.0, -1
            for k, v in scales.items():
                if name.startswith(k + ".") and len(k) > blen:
                    best, blen = v, len(k)
            return best

        return jax.tree_util.tree_map_with_path(pick, self.params)

    def get_camera(self):
        """world-to-view matrices with the intrinsics packed into row 3
        (reference dp_model.py:904-910). The vis matrices are produced by
        the lab4d-mode eval forward (interface._store_eval_aux)."""
        w2v = self.world2view_vis.copy()
        w2v[..., 3, :] = self.ks_vis
        return w2v

    @staticmethod
    def rm_module_prefix(states, prefix="module"):
        """Strip a DataParallel-style name prefix from a checkpoint dict
        (reference dp_model.py:345-352)."""
        out = {}
        for name, value in states.items():
            if name.startswith(prefix + "."):
                name = name[len(prefix) + 1:]
            out[name] = value
        return out

    def clear_grad(self):
        self._grad_accum = []
        if self.model_cache[0] is not None:
            print("fallback to cached model")
            self.params = jax.tree.map(jnp.asarray, self.model_cache[0])
            self.opt_state = self.optimizer_cache[0]

    # ------------------------------------------------------------------
    # global_q init (reference init_global_q, dp_model.py:243-267)
    # ------------------------------------------------------------------
    def init_global_q(self):
        self._finish_data()
        self.reinit_envs(1, 1, is_eval=True)

        # one jitted program instead of eager op-by-op dispatch: over the
        # TPU tunnel the eager version is ~100s of round trips (measured
        # ~3 min of init; the compiled form is one cached ~20 s compile)
        @jax.jit
        def _foot_h(params):
            steps_fr = jnp.zeros((1, 1))
            batch = self.get_batch_input(params, steps_fr)
            q = jnp.concatenate(
                [batch["queried_q"][:, 0], batch["queried_ja"][:, 0]], -1
            )
            body_q, _ = eval_fk(self.env, q)
            return self.get_foot_height(body_q[:, None])[0, 0]

        foot_height = float(_foot_h(self.params))
        self.params["global_q"] = jnp.array(
            [0.0, -foot_height, 0.0, 0.0, 0.0, 0.0, 1.0], jnp.float32
        )

    # ------------------------------------------------------------------
    # checkpoints (reference dp_model.py:912-934)
    # ------------------------------------------------------------------
    def _state_np(self):
        return jax.tree.map(np.asarray, self.params)

    def save_checkpoint(self, steps_count):
        self.model_cache[0] = self.model_cache[1]
        self.optimizer_cache[0] = self.optimizer_cache[1]
        self.model_cache[1] = self._state_np()
        self.optimizer_cache[1] = deepcopy(
            jax.tree.map(np.asarray, self.opt_state)
        )

        save_dict = self.model_cache[1]
        if self.opts.get("ckpt_backend", "pickle") == "orbax":
            import orbax.checkpoint as ocp

            ckptr = ocp.PyTreeCheckpointer()
            for name in ("ckpt_phys_%04d.orbax" % steps_count, "ckpt_phys_latest.orbax"):
                path = os.path.abspath(os.path.join(self.save_dir, name))
                ckptr.save(path, save_dict, force=True)
            return
        param_path = "%s/ckpt_phys_%04d.pth" % (self.save_dir, steps_count)
        with open(param_path, "wb") as f:
            pickle.dump(save_dict, f)
        latest_path = "%s/ckpt_phys_latest.pth" % self.save_dir
        with open(latest_path, "wb") as f:
            pickle.dump(save_dict, f)

    def load_checkpoint(self, model_path):
        if str(model_path).endswith(".orbax"):
            import orbax.checkpoint as ocp

            states = ocp.PyTreeCheckpointer().restore(os.path.abspath(model_path))
        else:
            with open(model_path, "rb") as f:
                states = pickle.load(f)
        # non-strict load (reference :932-934)
        for k, v in states.items():
            if k in self.params:
                self.params[k] = jax.tree.map(jnp.asarray, v)

    # ------------------------------------------------------------------
    # query for visualization (reference dp_model.py:843-902)
    # ------------------------------------------------------------------
    def query(self, img_size=None):
        data = {}
        part_com = self.env.body_com
        part_mass = self.env.body_mass
        body_mass = np.asarray(self.params["body_mass"])

        data["sim_traj"] = self.sim_trajs  # (F, B, 7)
        data["target_traj"] = self.target_trajs
        data["control_ref"] = self.pid_ref
        data["grf"] = self.grfs
        data["com"] = np.stack(
            [
                np.asarray(compute_com(jnp.asarray(t), jnp.asarray(part_com), jnp.asarray(part_mass)))
                for t in self.sim_trajs
            ],
            0,
        )
        data["com_k"] = [
            np.asarray(compute_com(jnp.asarray(t), jnp.asarray(part_com), jnp.asarray(part_mass)))
            for t in self.target_trajs
        ]
        data["body_mass"] = body_mass
        verts = self._mesh_verts
        data["max_w"] = 3 * np.abs(verts[:, [0, 2]]).max()
        return data
