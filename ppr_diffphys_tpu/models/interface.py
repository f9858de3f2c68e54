"""phys_interface — the lab4d DiffRen+DiffSim coupling layer.

Re-design of reference diffphys/dp_interface.py with the same API surface
(BASELINE.md requires it preserved): ``phys_interface(phys_model)``,
``KinematicsProxy``, ``query_q``, ``query_ja``, the ``override_*`` state
syncs, per-video window sampling, foot-height-driven scene-scale
calibration and kinematics distillation.

The lab4d neural fields are accessed through the pure-JAX field protocol in
``models/fields.py`` (spec objects + parameter pytrees). Where the
reference live-mutates warp arrays (``env.joint_X_p = wp.from_torch(...)``,
dp_interface.py:465), we thread ``joint_X_p`` through as a traced input to
FK and the rollout, so gradients flow to the rest-joint parameters without
hidden state.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import (
    compose_delta,
    se3_mat2vec,
    quat_to_matrix,
    matrix_to_quat,
)
from .phys_model import phys_model


def query_q(steps_fr, object_spec, object_params, scene_spec, scene_params,
            articulation_spec, articulation_params):
    """urdf->world transform chain with learnable scales
    (reference dp_interface.py:381-435).

    urdf_to_world = (scene_to_world @ scene_to_view^-1)
                    @ (object_to_view @ urdf_to_object), with translations
    rescaled into urdf units by view_to_obj_scale / urdf_to_obj_scale.
    Returns (urdf_to_world_vec (N,7) xyzw, world_to_view (N,4,4)).
    """
    vidid = scene_spec.sampler.frame_to_vid(steps_fr)

    view_to_obj_scale = jnp.exp(object_params["logscale"])
    urdf_to_obj_scale = jnp.exp(articulation_params["logscale"])

    obj_to_view = object_spec.get_camera(object_params, steps_fr)
    scene_to_view = scene_spec.get_camera(scene_params, steps_fr)
    scene_to_world = scene_spec.get_field2world(scene_params, vidid)
    world_to_view = scene_to_view @ jnp.linalg.inv(scene_to_world)

    # urdf to object (urdf scale)
    orient = articulation_params["orient"]
    orient = orient / jnp.linalg.norm(orient).clip(1e-8)
    orient_xyzw = jnp.concatenate([orient[1:], orient[:1]])
    rmat = quat_to_matrix(orient_xyzw)
    shift = articulation_params["shift"] / urdf_to_obj_scale
    urdf_to_object = jnp.eye(4)
    urdf_to_object = urdf_to_object.at[:3, :3].set(rmat)
    urdf_to_object = urdf_to_object.at[:3, 3].set(shift)

    view_to_urdf_scale = view_to_obj_scale / urdf_to_obj_scale
    obj_to_view_surdf = obj_to_view.at[..., :3, 3].multiply(view_to_urdf_scale)
    urdf_to_view = obj_to_view_surdf @ urdf_to_object[None]

    world_to_view_surdf = world_to_view.at[..., :3, 3].multiply(view_to_urdf_scale)
    urdf_to_world = jnp.linalg.inv(world_to_view_surdf) @ urdf_to_view

    # cv -> gl coords (reference :425-429)
    cv2gl = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0]))
    urdf_to_world = cv2gl[None] @ urdf_to_world
    world_to_view_surdf = world_to_view_surdf @ cv2gl.T[None]

    return se3_mat2vec(urdf_to_world), world_to_view_surdf


def query_ja(steps_fr, articulation_spec, articulation_params, n_links):
    """Predicted joint angles + live joint rest coordinates
    (reference dp_interface.py:438-466). Returns
    (pred_joints (N, n_dof), joint_X_p (N, B, 7))."""
    inst_id = articulation_spec.sampler.frame_to_vid(steps_fr)

    pred_joints = articulation_spec.get_vals(
        articulation_params, steps_fr, return_so3=True
    )

    rel_rest_joints = articulation_spec.compute_rel_rest_joints(
        articulation_params, inst_id
    )  # (N, J, 3)
    rel_rest_joints = rel_rest_joints / jnp.exp(articulation_params["logscale"])
    rest_rmat = articulation_spec.local_rest_coord[None, :, :3, :3]
    rest_quat = matrix_to_quat(rest_rmat)  # xyzw
    rest_quat = jnp.broadcast_to(rest_quat, rel_rest_joints.shape[:-1] + (4,))
    rel_rest_coords = jnp.concatenate([rel_rest_joints, rest_quat], -1)

    # first joint (free root) gets the identity anchor (reference :459-461)
    ident = jnp.zeros(rel_rest_coords.shape[:-2] + (1, 7)).at[..., 0, 6].set(1.0)
    joint_X_p = jnp.concatenate([ident, rel_rest_coords], axis=-2)
    assert joint_X_p.shape[-2] == n_links, (joint_X_p.shape, n_links)
    return pred_joints, joint_X_p


class phys_interface(phys_model):
    """Reference dp_interface.py:17-325."""

    has_live_xp = True  # query_ja threads joint_X_p into every forward

    def __init__(self, opts, model_dict, dt=5e-4, copy_weights=False, device=None):
        self.copy_weights = copy_weights
        super().__init__(opts, model_dict, dt, device)

    # -- data ----------------------------------------------------------
    def preset_data(self, model_dict):
        self.scene_field = model_dict["scene_field"]  # (spec, params)
        self.object_field = model_dict["object_field"]
        self.intrinsics = model_dict["intrinsics"]

        scene_spec, _ = self.scene_field
        self.frame_offset_raw = np.asarray(scene_spec.frame_offset_raw)
        self.frame_interval = model_dict["frame_interval"]
        self.frame_info = model_dict.get("frame_info")

        self.total_frames = int(self.frame_offset_raw[-1])
        self.steps_per_fr_interval = int(self.frame_interval / self.dt)

    def _finish_data(self):
        pass  # no mocap table in lab4d mode

    def init_global_q(self):
        # reference dp_interface.py:103-104: nothing to do — alignment is
        # carried by the field transforms
        self.reinit_envs(1, 1, is_eval=True)

    # -- networks ------------------------------------------------------
    def add_nn_modules(self):
        super().add_nn_modules()
        obj_spec, obj_params = self.object_field
        scn_spec, scn_params = self.scene_field
        art_spec = obj_spec.articulation_spec
        intr_spec, intr_params = self.intrinsics

        self.object_spec = obj_spec
        self.scene_spec = scn_spec
        self.articulation_spec = art_spec
        self.intrinsics_spec = intr_spec

        # external field params (frozen except the logscales, see
        # get_lr_dict); articulation params live inside object_field
        self.params["object_field"] = deepcopy(obj_params)
        self.params["scene_field"] = deepcopy(scn_params)
        self.params["intrinsics"] = deepcopy(intr_params)

        # updated to minimize the physics loss (reference :40-47)
        self.params["kinematics_proxy"] = {
            "object_field": deepcopy(obj_params),
            "scene_field": deepcopy(scn_params),
            "delta_root_mlp": deepcopy(self.params["root_pose_mlp"]),
            "delta_joint_angle_mlp": deepcopy(self.params["joint_angle_mlp"]),
        }
        # distilled from physics to regularize diff rendering (:48-60)
        distilled = {
            "object_field": deepcopy(obj_params),
            "scene_field": deepcopy(scn_params),
        }
        if not self.copy_weights:
            distilled["delta_root_mlp"] = deepcopy(self.params["root_pose_mlp"])
            distilled["delta_joint_angle_mlp"] = deepcopy(
                self.params["joint_angle_mlp"]
            )
        self.params["kinematics_distilled"] = distilled

        del self.params["root_pose_mlp"]
        del self.params["joint_angle_mlp"]

    def get_lr_dict(self):
        """Reference dp_interface.py:106-163."""
        opts = self.opts
        lr_base = opts["phys_learning_rate"]
        lr_explicit = lr_base * 10
        startwith, withmap = super().get_lr_dict()
        for k in ("root_pose_mlp", "joint_angle_mlp"):
            startwith.pop(k, None)
        startwith.update(
            {
                "object_field": 0.0,
                "scene_field": 0.0,
                "intrinsics": 0.0,
                "kinematics_distilled": lr_base,
                "kinematics_proxy": lr_base,
            }
        )
        withmap.update(
            {
                "object_field.logscale": lr_explicit,
                "scene_field.logscale": lr_explicit,
            }
        )
        return startwith, withmap

    # -- proxy queries -------------------------------------------------
    def _proxy_root(self, params, subtree, steps_fr):
        """KinematicsProxy.forward (reference :340-345)."""
        sub = params[subtree]
        out, _ = query_q(
            steps_fr,
            self.object_spec, sub["object_field"],
            self.scene_spec, sub["scene_field"],
            self.articulation_spec, sub["object_field"]["articulation"],
        )
        if "delta_root_mlp" in sub:
            delta = self.modules["root_pose_mlp"].apply(
                {"params": sub["delta_root_mlp"]},
                self.samplers["root_pose_mlp"].frame_to_tid(steps_fr),
                self.samplers["root_pose_mlp"].frame_to_vid(steps_fr),
            )
            out = compose_delta(out, delta)
        return out

    def _proxy_ja(self, params, subtree, steps_fr):
        """KinematicsProxy.get_joint_angles (reference :374-378)."""
        sub = params[subtree]
        art_params = sub["object_field"]["articulation"]
        out = self.articulation_spec.get_vals(art_params, steps_fr, return_so3=True)
        if "delta_joint_angle_mlp" in sub:
            out = out + self.modules["joint_angle_mlp"].apply(
                {"params": sub["delta_joint_angle_mlp"]},
                self.samplers["joint_angle_mlp"].frame_to_tid(steps_fr),
                self.samplers["joint_angle_mlp"].frame_to_vid(steps_fr),
            )
        return out

    # -- state sync (reference :188-197) -------------------------------
    def override_control_ref_states(self):
        self.params["kinematics_proxy"]["object_field"] = deepcopy(
            self.params["object_field"]
        )
        self.params["kinematics_proxy"]["scene_field"] = deepcopy(
            self.params["scene_field"]
        )

    def override_distilled_states(self):
        self.params["kinematics_distilled"]["object_field"] = deepcopy(
            self.params["object_field"]
        )
        self.params["kinematics_distilled"]["scene_field"] = deepcopy(
            self.params["scene_field"]
        )

    def override_states_inv(self):
        self.params["object_field"] = deepcopy(
            self.params["kinematics_distilled"]["object_field"]
        )
        self.params["scene_field"] = deepcopy(
            self.params["kinematics_distilled"]["scene_field"]
        )

    # -- window sampling over selected videos (reference :199-218) -----
    def compute_frame_start(self, key):
        phys_vid = self.opts.get("phys_vid", list(range(len(self.frame_offset_raw) - 1)))
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (self.num_envs,))
        starts = []
        for vidid in phys_vid:
            span = (
                self.frame_offset_raw[vidid + 1]
                - self.frame_offset_raw[vidid]
                - self.frames_per_wdw
            )
            s = jnp.clip(jnp.round(u * span), 0, jnp.inf)
            starts.append(s + self.frame_offset_raw[vidid])
        starts = jnp.concatenate(starts)
        perm = jax.random.permutation(k2, starts.shape[0])
        return starts[perm[: self.num_envs]].astype(jnp.float32)

    # -- batch input (reference :220-249) ------------------------------
    def query_kinematics_groundtruth(self, params, steps_fr):
        E, S = steps_fr.shape
        flat = steps_fr.reshape(-1)
        target_q, world2view = query_q(
            flat,
            self.object_spec, params["object_field"],
            self.scene_spec, params["scene_field"],
            self.articulation_spec, params["object_field"]["articulation"],
        )
        target_ja, joint_X_p = query_ja(
            flat, self.articulation_spec,
            params["object_field"]["articulation"], self.n_links,
        )
        ks = self.intrinsics_spec.get_vals(params["intrinsics"], flat)
        batch = dict(
            target_q=target_q.reshape(E, S, -1),
            target_ja=target_ja.reshape(E, S, -1),
            target_qd=jnp.zeros((E, S, 6)),
            target_jad=jnp.zeros((E, S, target_ja.shape[-1])),
            world2view=world2view.reshape(E, S, 4, 4),
            ks=ks.reshape(E, S, -1),
            # anchors are per-env (constant over the window): take step 0
            joint_X_p=joint_X_p.reshape(E, S, -1, 7)[:, 0],
        )
        return batch

    def get_batch_input(self, params, steps_fr):
        E, S = steps_fr.shape
        batch = self.query_kinematics_groundtruth(params, steps_fr)
        flat = steps_fr.reshape(-1)

        torques = self._mlp(params, "torque_mlp", flat).reshape(E, S, -1) * 0.0
        res_f = self._mlp(params, "residual_f_mlp", flat).reshape(E, S, -1, 6)
        res_f = res_f.at[..., :3].multiply(10.0) * 0.0
        state_qd = self._mlp(params, "vel_mlp", flat).reshape(E, S, -1)

        queried_q = self._proxy_root(params, "kinematics_proxy", flat).reshape(E, S, -1)
        queried_ja = self._proxy_ja(params, "kinematics_proxy", flat).reshape(E, S, -1)

        batch.update(
            queried_q=queried_q, queried_ja=queried_ja, queried_qd=state_qd,
            torques=torques, res_f=res_f,
        )
        return batch

    # -- distillation (reference :305-325 + dp_model.py:800-804) -------
    def _distill_loss(self, params, steps_fr, sim_position, outseq):
        if float(self.opts.get("pos_distill_wt", 0.0)) <= 0.0:
            return jnp.zeros(())
        from .losses import se3_loss, reduce_loss
        from ..sim.kinematics import eval_fk

        f2s = self.frame2step
        sub_fr = steps_fr[:, f2s]
        E, F = sub_fr.shape
        flat = sub_fr.reshape(-1)
        droot = self._proxy_root(params, "kinematics_distilled", flat).reshape(E, F, -1)
        dja = self._proxy_ja(params, "kinematics_distilled", flat).reshape(E, F, -1)
        joint_q = jnp.concatenate([droot, dja], -1)
        body_q, _ = eval_fk(self.env, joint_q)
        loss = se3_loss(body_q, jax.lax.stop_gradient(sim_position)).mean(-1)
        loss = jnp.where(outseq, 0.0, loss)
        return reduce_loss(loss)

    def get_distilled_kinematics(self, steps_fr):
        """FK-posed body trajectory of the distilled kinematics
        (reference dp_interface.py:305-325). steps_fr: (E, S) raw frame ids
        over the window; evaluates at the frame boundaries and returns
        body poses (F, E*B view flattened to match the reference's
        (nstep, bs, ...) layout as (F, E, B, 7))."""
        from ..sim.kinematics import eval_fk

        steps_fr = jnp.asarray(steps_fr)[:, self.frame2step]
        E, F = steps_fr.shape
        flat = steps_fr.reshape(-1)
        droot = self._proxy_root(self.params, "kinematics_distilled", flat)
        dja = self._proxy_ja(self.params, "kinematics_distilled", flat)
        joint_q = jnp.concatenate([droot, dja], -1).reshape(E, F, -1)
        body_q, _ = eval_fk(self.env, joint_q)
        self.distilled_trajs = np.asarray(body_q[0])
        return jnp.swapaxes(body_q, 0, 1)  # (F, E, B, 7)

    # -- foot height via kp links (reference :251-277) ------------------
    def get_foot_height(self, state_body_q):
        kp_idxs = [
            self.env.body_name.index(n) for n in self.robot.urdf.kp_links
        ]
        return state_body_q[..., kp_idxs, 1]

    def get_foot_height_frame(self, frame_ids):
        frame_ids = jnp.asarray(frame_ids, jnp.float32)[None]
        if not hasattr(self, "_jit_foot_height"):
            def fn(params, fr):
                batch = self.query_kinematics_groundtruth(params, fr)
                target_position, _ = self.fk_pos_vel(
                    batch["target_q"], batch["target_ja"],
                    batch["target_qd"], batch["target_jad"],
                    joint_X_p=batch["joint_X_p"][:, None],
                )
                return self.get_foot_height(target_position)[0]

            self._jit_foot_height = jax.jit(fn)
        return np.asarray(self._jit_foot_height(self.params, frame_ids))

    def correct_scale(self, frame_ids, increment=0.01, max_steps=2000):
        """Scale walk until feet cross the ground (reference :279-303).

        max_steps caps the walk (the reference loops unboundedly; a field
        whose foot height were insensitive to the scene scale would hang).
        """
        self.reinit_envs(1, frames_per_wdw=int(self.frame_offset_raw[-1]), is_eval=True)
        foot_height = self.get_foot_height_frame(frame_ids)
        direction = 1 if foot_height.min() > 0 else -1
        for _ in range(max_steps):
            for tree in (
                self.params["scene_field"],
                self.params["kinematics_proxy"]["scene_field"],
                self.params["kinematics_distilled"]["scene_field"],
            ):
                tree["logscale"] = tree["logscale"] + increment * direction
            foot_height = self.get_foot_height_frame(frame_ids)
            print("foot height:", foot_height.min())
            if foot_height.min() * direction < 0:
                break
        else:
            print(
                "correct_scale: foot height did not cross zero within %d steps"
                % max_steps
            )

    def _extend_aux(self, aux, params, batch, steps_fr, sim_position):
        """Eval observables: vis cameras (reference dp_interface.py:233-235)
        and the distilled trajectory for the 'distilled' video stream."""
        f2s = self.frame2step
        aux["target_q_vis"] = batch["target_q"][0, f2s]
        aux["world2view_vis"] = batch["world2view"][0, f2s]
        aux["ks_vis"] = batch["ks"][0, f2s]
        if float(self.opts.get("pos_distill_wt", 0.0)) > 0.0:
            from ..sim.kinematics import eval_fk

            sub_fr = steps_fr[:1, f2s]
            flat = sub_fr.reshape(-1)
            droot = self._proxy_root(params, "kinematics_distilled", flat)
            dja = self._proxy_ja(params, "kinematics_distilled", flat)
            joint_q = jnp.concatenate([droot, dja], -1)
            body_q, _ = eval_fk(self.env, joint_q)
            aux["distilled_traj"] = body_q
        return aux

    def _store_eval_aux(self, aux):
        super()._store_eval_aux(aux)
        self.target_q_vis = np.asarray(aux["target_q_vis"])
        self.world2view_vis = np.asarray(aux["world2view_vis"])
        self.ks_vis = np.asarray(aux["ks_vis"])
        if "distilled_traj" in aux:
            self.distilled_trajs = np.asarray(aux["distilled_traj"])

    def query(self, img_size=None):
        data = super().query()
        if hasattr(self, "distilled_trajs"):
            data["distilled_traj"] = self.distilled_trajs
        if img_size is not None:
            data["camera"] = self.get_camera()
            data["img_size"] = img_size
        return data


class KinematicsProxy:
    """Name-compatible view of a proxy parameter subtree (reference
    dp_interface.py:328-378).

    The reference's KinematicsProxy is an nn.Module holding deep copies of
    the object/scene fields plus delta MLPs; here the copies live inside
    ``interface.params[subtree]`` (a pytree leaf group the optimizer
    updates), and this class exposes the reference's method surface over
    that subtree: ``forward``/``__call__`` (root poses), ``get_joint_angles``,
    ``override_states`` and ``override_states_inv``.
    """

    def __init__(self, interface: "phys_interface", subtree: str = "kinematics_proxy"):
        self.interface = interface
        self.subtree = subtree

    def forward(self, x):
        """x: (N,) raw frame ids -> (N, 7) root poses (reference :340-345)."""
        return self.interface._proxy_root(
            self.interface.params, self.subtree, jnp.asarray(x)
        )

    __call__ = forward

    def get_joint_angles(self, x):
        """x: (N,) raw frame ids -> (N, n_dof) (reference :374-378)."""
        return self.interface._proxy_ja(
            self.interface.params, self.subtree, jnp.asarray(x)
        )

    def override_states(self, object_field=None, scene_field=None):
        """Pull fresh DR weights into the proxy (reference :347-350).
        With no arguments, syncs from the interface's live field params."""
        sub = self.interface.params[self.subtree]
        sub["object_field"] = deepcopy(
            object_field if object_field is not None
            else self.interface.params["object_field"]
        )
        sub["scene_field"] = deepcopy(
            scene_field if scene_field is not None
            else self.interface.params["scene_field"]
        )

    def override_states_inv(self, object_field=None, scene_field=None):
        """Push proxy weights back into the DR fields (reference :352-372).
        Returns the (object_field, scene_field) param trees; with no
        arguments also writes them into the interface's live field params."""
        sub = self.interface.params[self.subtree]
        if object_field is None and scene_field is None:
            self.interface.params["object_field"] = deepcopy(sub["object_field"])
            self.interface.params["scene_field"] = deepcopy(sub["scene_field"])
        return deepcopy(sub["object_field"]), deepcopy(sub["scene_field"])
