"""JAX-side stand-ins for the lab4d neural-field objects the physics
interface couples to (reference dp_interface.py uses lab4d's
``scene_field`` / ``object_field`` / ``intrinsics`` torch modules).

The physics cycle only touches a narrow query surface of those fields
(reference dp_interface.py:381-466):
- ``get_camera(frame_id)``        field -> view SE(3) per frame
- ``get_field2world(inst_id)``    field -> world SE(3) per video
- ``logscale``                    learnable view-to-field log-scale
- articulation: ``get_vals(frame_id, return_so3=True)`` joint angles,
  ``compute_rel_rest_joints(inst_id)``, ``local_rest_coord``,
  ``logscale`` / ``orient`` / ``shift`` urdf-to-object alignment
- intrinsics: ``get_vals(frame_id)``

This module gives that surface a concrete, pure-JAX implementation
(parameters in plain pytrees, queries as methods taking the param tree),
used both standalone and as the template a real lab4d port would wrap its
networks into.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import quat_to_matrix, quat_normalize
from .mlp import CameraMLPFlax, TimeMLPFlax, FrameSampler, resolve_num_freq_t


class CameraField:
    """SE(3)-over-time field with a learnable log-scale and per-video
    field-to-world transforms (the slice of lab4d's field API the physics
    interface needs)."""

    def __init__(self, frame_offset_raw, rng, name="field"):
        self.name = name
        self.offsets = tuple(int(x) for x in frame_offset_raw)
        self.sampler = FrameSampler(self.offsets)
        n_vids = len(self.offsets) - 1
        nf = resolve_num_freq_t(6, self.sampler.max_ts)
        self.camera_mlp = CameraMLPFlax(num_freq_t=nf, num_inst=n_vids)
        k1, _ = jax.random.split(rng)
        variables = self.camera_mlp.init(
            k1, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32)
        )
        self.init_params: Dict[str, Any] = {
            "camera_mlp": variables["params"],
            "logscale": jnp.zeros(()),
            # per-video field->world SE(3) as (V, 7) [t, quat xyzw]
            "field2world": jnp.tile(
                jnp.array([0.0, 0, 0, 0, 0, 0, 1.0]), (n_vids, 1)
            ),
        }

    @property
    def frame_offset_raw(self):
        return np.asarray(self.offsets)

    def get_camera(self, params, frame_id):
        """(N,) raw frame ids -> (N,4,4) field-to-view transforms.

        Camera translations scale with exp(logscale), mirroring lab4d's
        view-to-field scale semantics — this is what makes the physics
        interface's correct_scale walk (scene logscale until feet cross
        the ground) actually move the feet.
        """
        t = self.sampler.frame_to_tid(frame_id)
        vid = self.sampler.frame_to_vid(frame_id)
        quat, trans = self.camera_mlp.apply(
            {"params": params["camera_mlp"]}, t, vid
        )
        # wxyz -> xyzw
        q = jnp.concatenate([quat[..., 1:], quat[..., :1]], -1)
        mat = jnp.zeros(frame_id.shape + (4, 4))
        mat = mat.at[..., :3, :3].set(quat_to_matrix(quat_normalize(q)))
        mat = mat.at[..., :3, 3].set(trans * jnp.exp(params["logscale"]))
        mat = mat.at[..., 3, 3].set(1.0)
        return mat

    def get_field2world(self, params, inst_id):
        vec = params["field2world"][inst_id]
        mat = jnp.zeros(inst_id.shape + (4, 4))
        mat = mat.at[..., :3, :3].set(quat_to_matrix(quat_normalize(vec[..., 3:7])))
        mat = mat.at[..., :3, 3].set(vec[..., :3])
        mat = mat.at[..., 3, 3].set(1.0)
        return mat

    def fit_to_priors(self, params, rtmat, **kw):
        """Fit the camera MLP to (N,4,4) per-frame SE(3) priors (reference
        CameraMLPWrapper.mlp_init, torch_utils.py:258-268)."""
        from .mlp import fit_camera_mlp

        params = dict(params)
        params["camera_mlp"] = fit_camera_mlp(
            self.camera_mlp, params["camera_mlp"], self.sampler, rtmat, **kw
        )
        return params


class ArticulationField:
    """Joint-angle-over-time field + urdf-to-object alignment (the slice
    of lab4d's ``object_field.warp.articulation`` the interface needs)."""

    def __init__(self, frame_offset_raw, robot, rng):
        self.offsets = tuple(int(x) for x in frame_offset_raw)
        self.sampler = FrameSampler(self.offsets)
        n_vids = len(self.offsets) - 1
        nf = resolve_num_freq_t(6, self.sampler.max_ts)
        self.n_dof = robot.num_dofs
        self.num_bones = robot.num_bones
        self.mlp = TimeMLPFlax(
            num_freq_t=nf, num_inst=n_vids, out_channels=self.n_dof
        )
        variables = self.mlp.init(rng, jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))

        # rest joint coordinates relative to parent link (B-1, 3) from the
        # robot template; local_rest_coord mirrors lab4d's per-joint rest
        # SE(3)s (identity rotations by default)
        rest_joints = np.asarray(robot.joints, np.float64)  # (J, 3)
        local_rest = np.tile(np.eye(4)[None], (len(rest_joints), 1, 1))
        local_rest[:, :3, 3] = rest_joints
        self.local_rest_coord = jnp.asarray(local_rest, jnp.float32)

        self.init_params: Dict[str, Any] = {
            "mlp": variables["params"],
            "logscale": jnp.zeros(()),
            "orient": jnp.array([1.0, 0.0, 0.0, 0.0]),  # wxyz
            "shift": jnp.zeros(3),
            "rest_offsets": jnp.zeros((len(rest_joints), 3)),
        }

    def get_vals(self, params, frame_id, return_so3=True):
        t = self.sampler.frame_to_tid(frame_id)
        vid = self.sampler.frame_to_vid(frame_id)
        return self.mlp.apply({"params": params["mlp"]}, t, vid)

    def compute_rel_rest_joints(self, params, inst_id):
        """Per-instance rest joint positions (reference
        dp_interface.py:452): base template + learnable offsets."""
        base = self.local_rest_coord[:, :3, 3]
        out = base + params["rest_offsets"]
        return jnp.broadcast_to(out, inst_id.shape + out.shape)


class ObjectField(CameraField):
    """Camera field + articulation sub-field — the object-field slice of
    lab4d the physics interface queries (``object_field.get_camera``,
    ``object_field.logscale``, ``object_field.warp.articulation``)."""

    def __init__(self, frame_offset_raw, robot, rng, name="object_field"):
        k1, k2 = jax.random.split(rng)
        super().__init__(frame_offset_raw, k1, name=name)
        self.articulation_spec = ArticulationField(frame_offset_raw, robot, k2)
        self.init_params["articulation"] = self.articulation_spec.init_params


class IntrinsicsField:
    """Per-frame pinhole intrinsics (lab4d's intrinsics.get_vals)."""

    def __init__(self, frame_offset_raw, fx=1000.0):
        n = int(frame_offset_raw[-1])
        self.init_params = {
            "ks": jnp.tile(jnp.array([fx, fx, 0.0, 0.0]), (n, 1))
        }

    def get_vals(self, params, frame_id):
        return params["ks"][frame_id.astype(jnp.int32)]
