"""Torch-side lab4d field stand-ins for adapter tests, built from the
REFERENCE's vendored modules (loaded from the read-only mount, never
copied): CameraMLPWrapper / TimeMLPWrapper (torch_utils.py:116-304) over
the vendored TimeMLP/TimeEmbedding blocks (lab4d_utils.py:137-521).

Structure mirrors the field surface phys_interface consumes
(dp_interface.py:17-36, :381-466): ``field.camera_mlp``,
``field.logscale``, ``field.field2world``, ``field.warp.articulation``
with ``mlp`` / ``logscale`` / ``orient`` / ``shift`` / ``rest_offsets``.
"""

import importlib.util
import sys
import types

import numpy as np


def load_ref_torch_utils():
    """Import the reference's diffphys.torch_utils from the mount with
    the lab4d-runtime helpers stubbed (same pattern as
    tests/test_torch_adapter.py)."""
    import torch

    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")
    if "diffphys" not in sys.modules:
        pkg = types.ModuleType("diffphys")
        pkg.__path__ = ["/root/reference/diffphys"]
        sys.modules["diffphys"] = pkg

    import diffphys.torch_utils as tu

    from scipy.spatial.transform import Rotation as R

    def matrix_to_quaternion(m):
        q = R.from_matrix(m.detach().cpu().numpy().reshape(-1, 3, 3)).as_quat()
        q = np.concatenate([q[:, 3:4], q[:, 0:3]], -1)
        return torch.tensor(q, dtype=torch.float32).reshape(m.shape[:-2] + (4,))

    def quaternion_mul(a, b):
        aw, ax, ay, az = a.unbind(-1)
        bw, bx, by, bz = b.unbind(-1)
        return torch.stack(
            [
                aw * bw - ax * bx - ay * by - az * bz,
                aw * bx + ax * bw + ay * bz - az * by,
                aw * by - ax * bz + ay * bw + az * bx,
                aw * bz + ax * by - ay * bx + az * bw,
            ],
            -1,
        )

    def quaternion_translation_to_se3(quat, trans):
        q = quat.detach().cpu().numpy()
        q = np.concatenate([q[:, 1:], q[:, :1]], -1)
        mats = np.tile(np.eye(4), (len(q), 1, 1)).astype(np.float32)
        mats[:, :3, :3] = R.from_quat(q).as_matrix()
        mats[:, :3, 3] = trans.detach().cpu().numpy()
        return torch.tensor(mats)

    tu.matrix_to_quaternion = matrix_to_quaternion
    tu.quaternion_mul = quaternion_mul
    tu.quaternion_translation_to_se3 = quaternion_translation_to_se3
    return tu


def make_frame_info(offsets):
    offsets = np.asarray(offsets)
    return {
        "frame_offset": offsets,
        "frame_offset_raw": offsets,
        "frame_mapping": list(range(int(offsets[-1]))),
    }


def build_torch_fields(offsets, n_dof, n_joints, seed=0):
    """(scene_field, object_field) torch modules with random-ish weights,
    the DR-side state the adapter converts."""
    import torch
    import torch.nn as nn

    tu = load_ref_torch_utils()
    torch.manual_seed(seed)
    frame_info = make_frame_info(offsets)
    n = int(frame_info["frame_offset"][-1])
    n_vids = len(offsets) - 1

    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(seed)
    def rand_rtmat():
        m = np.tile(np.eye(4), (n, 1, 1)).astype(np.float32)
        m[:, :3, :3] = R.random(n, random_state=seed).as_matrix()
        m[:, :3, 3] = rng.uniform(-0.5, 0.5, (n, 3))
        return m

    class Articulation(nn.Module):
        def __init__(self):
            super().__init__()
            self.mlp = tu.TimeMLPWrapper(
                n, frame_info=frame_info, out_channels=n_dof
            )
            self.logscale = nn.Parameter(torch.zeros(1))
            self.orient = nn.Parameter(
                torch.tensor([1.0, 0.02, -0.01, 0.03]))
            self.shift = nn.Parameter(torch.tensor([0.01, -0.02, 0.005]))
            self.rest_offsets = nn.Parameter(
                torch.randn(n_joints, 3) * 1e-3)

        def get_vals(self, x, return_so3=True):
            return self.mlp(x)

    class Warp(nn.Module):
        def __init__(self, articulation):
            super().__init__()
            self.articulation = articulation

    class Field(nn.Module):
        def __init__(self, articulation=None):
            super().__init__()
            self.camera_mlp = tu.CameraMLPWrapper(
                rand_rtmat(), frame_info=frame_info)
            self.logscale = nn.Parameter(torch.zeros(1))
            f2w = np.tile(
                np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (n_vids, 1))
            self.field2world = nn.Parameter(torch.tensor(f2w))
            if articulation is not None:
                self.warp = Warp(articulation)
            self.frame_offset_raw = frame_info["frame_offset_raw"]

    scene = Field()
    obj = Field(articulation=Articulation())
    scene.eval()
    obj.eval()
    return scene, obj
