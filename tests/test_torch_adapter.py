"""Torch-lab4d adapter parity (VERDICT.md Missing #2 / task #6).

Loads the reference's *actual* vendored torch MLP classes (TimeMLPWrapper /
CameraMLPWrapper, /root/reference/diffphys/torch_utils.py — imported from
the read-only mount, never copied), converts their state_dicts through
``models/torch_adapter.py``, and asserts the flax forward equals the torch
forward. This is the proof that a live lab4d torch field of the reference
architecture "drops in" as a (spec, params) pair.

torch runs CPU-only here; the reference module needs two harmless stand-ins
to import outside its repo: a `trimesh` placeholder (only used by mesh
export helpers we don't call) and the three lab4d quaternion helpers its
camera wrapper resolves at call time (implemented below in torch).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from ppr_diffphys_tpu.models.mlp import FrameSampler
from ppr_diffphys_tpu.models.torch_adapter import (
    cameramlp_from_torch,
    camera_field_from_torch,
    sampler_from_torch,
    timemlp_from_torch,
)


# ---------------------------------------------------------------------------
# load the reference torch modules
# ---------------------------------------------------------------------------

def _torch_matrix_to_quaternion(m):
    """Rotation matrix -> wxyz quat (the lab4d helper the reference resolves
    at runtime; standard Shepperd construction)."""
    from scipy.spatial.transform import Rotation as R

    q = R.from_matrix(m.detach().cpu().numpy().reshape(-1, 3, 3)).as_quat()
    q = np.concatenate([q[:, 3:4], q[:, 0:3]], -1)  # xyzw -> wxyz
    return torch.tensor(q, dtype=torch.float32).reshape(m.shape[:-2] + (4,))


def _torch_quaternion_mul(a, b):
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


def _torch_qt_to_se3(quat, trans):
    from scipy.spatial.transform import Rotation as R

    q = quat.detach().cpu().numpy()
    q = np.concatenate([q[:, 1:], q[:, :1]], -1)
    mats = np.tile(np.eye(4), (len(q), 1, 1)).astype(np.float32)
    mats[:, :3, :3] = R.from_quat(q).as_matrix()
    mats[:, :3, 3] = trans.detach().cpu().numpy()
    return torch.tensor(mats)


@pytest.fixture(scope="module")
def ref_torch_utils():
    if "trimesh" not in sys.modules:
        sys.modules["trimesh"] = types.ModuleType("trimesh")

    spec = importlib.util.spec_from_file_location(
        "diffphys",
        "/root/reference/diffphys/__init__.py"
        if __import__("os").path.exists("/root/reference/diffphys/__init__.py")
        else None,
        submodule_search_locations=["/root/reference/diffphys"],
    )
    if spec is None:  # no __init__.py: namespace package
        pkg = types.ModuleType("diffphys")
        pkg.__path__ = ["/root/reference/diffphys"]
        sys.modules["diffphys"] = pkg
    else:
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["diffphys"] = pkg
        spec.loader.exec_module(pkg)

    import diffphys.torch_utils as tu  # noqa: E402

    # the reference resolves these from lab4d at runtime (torch_utils.py:8-21
    # try-import falls back without them defined)
    tu.matrix_to_quaternion = _torch_matrix_to_quaternion
    tu.quaternion_mul = _torch_quaternion_mul
    tu.quaternion_translation_to_se3 = _torch_qt_to_se3
    return tu


def _multi_video_frame_info(offsets):
    offsets = np.asarray(offsets)
    return {
        "frame_offset": offsets,
        "frame_offset_raw": offsets,
        "frame_mapping": list(range(int(offsets[-1]))),
    }


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("offsets", [[0, 40], [0, 25, 40]])
def test_timemlp_adapter_matches_torch(ref_torch_utils, offsets):
    tu = ref_torch_utils
    frame_info = _multi_video_frame_info(offsets)
    with torch.no_grad():
        tmod = tu.TimeMLPWrapper(
            int(frame_info["frame_offset"][-1]),
            frame_info=frame_info,
            out_channels=12,
        )
        tmod.eval()
        frame_ids = torch.arange(0, int(frame_info["frame_offset"][-1]))
        ref_out = tmod(frame_ids).numpy()

    module, params = timemlp_from_torch(tmod.state_dict())
    sampler = sampler_from_torch(tmod)
    fid = jnp.asarray(frame_ids.numpy(), jnp.float32)
    ours = module.apply(
        {"params": params}, sampler.frame_to_tid(fid), sampler.frame_to_vid(fid)
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5)


@pytest.mark.parametrize("offsets", [[0, 40], [0, 25, 40]])
def test_cameramlp_adapter_matches_torch(ref_torch_utils, offsets):
    tu = ref_torch_utils
    frame_info = _multi_video_frame_info(offsets)
    n = int(frame_info["frame_offset"][-1])

    # random SE(3) priors (base_init reads rotations at video starts)
    from scipy.spatial.transform import Rotation as R

    rng = np.random.default_rng(0)
    rtmat = np.tile(np.eye(4), (n, 1, 1)).astype(np.float32)
    rtmat[:, :3, :3] = R.random(n, random_state=0).as_matrix()
    rtmat[:, :3, 3] = rng.uniform(-1, 1, (n, 3))

    with torch.no_grad():
        cmod = tu.CameraMLPWrapper(rtmat, frame_info=frame_info)
        cmod.eval()
        frame_ids = torch.arange(0, n)
        q_ref, t_ref = cmod.get_vals(frame_ids)
        q_ref, t_ref = q_ref.numpy(), t_ref.numpy()

    module, params = cameramlp_from_torch(cmod.state_dict())
    sampler = sampler_from_torch(cmod)
    fid = jnp.asarray(frame_ids.numpy(), jnp.float32)
    q, t = module.apply(
        {"params": params}, sampler.frame_to_tid(fid), sampler.frame_to_vid(fid)
    )
    np.testing.assert_allclose(np.asarray(t), t_ref, atol=2e-5)
    # quats up to sign
    dots = np.abs(np.sum(np.asarray(q) * q_ref, -1))
    assert dots.min() > 1 - 1e-5, dots.min()


def test_camera_field_from_torch(ref_torch_utils):
    """End-to-end: torch camera MLP -> fields.CameraField (spec, params);
    get_camera() must reproduce the torch SE(3)s (with logscale=0)."""
    tu = ref_torch_utils
    import jax

    frame_info = _multi_video_frame_info([0, 30])
    n = 30
    rtmat = np.tile(np.eye(4), (n, 1, 1)).astype(np.float32)
    with torch.no_grad():
        cmod = tu.CameraMLPWrapper(rtmat, frame_info=frame_info)
        cmod.eval()
        q_ref, t_ref = cmod.get_vals(torch.arange(0, n))

    field, params = camera_field_from_torch(cmod, jax.random.PRNGKey(0))
    mats = field.get_camera(params, jnp.arange(n, dtype=jnp.float32))
    np.testing.assert_allclose(
        np.asarray(mats[:, :3, 3]), t_ref.numpy(), atol=2e-5
    )
    ref_se3 = _torch_qt_to_se3(q_ref, t_ref).numpy()
    np.testing.assert_allclose(np.asarray(mats), ref_se3, atol=2e-5)
