"""Offscreen rendering via the native C++ rasterizer (csrc/rasterizer.cpp).

Replaces the reference's pyrender/EGL wrapper (diffphys/pyrender_wrapper.py)
with a dependency-free software pipeline: Python handles cameras and
geometry, the C++ shared library does z-buffered smooth-shaded scan
conversion (per-vertex normals + directional/ambient/specular lighting
approximating the reference's DirectionalLight on a metallic-roughness
material, pyrender_wrapper.py:34-37). Compiled on first use with g++ -O3.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _find_csrc():
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.normpath(os.path.join(here, "..", "..", "csrc"))


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    csrc = _find_csrc()
    so = os.path.join(csrc, "librasterizer.so")
    src = os.path.join(csrc, "rasterizer.cpp")
    if (not os.path.exists(so)) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so]
        )
    lib = ctypes.CDLL(so)
    lib.rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _LIB = lib
    return lib


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class SoftwareRenderer:
    """Camera + raster state (stand-in for PyRenderWrapper,
    reference pyrender_wrapper.py:22-160)."""

    def __init__(self, height=256, width=256):
        self.H, self.W = int(height), int(width)
        fl = max(self.H, self.W)
        self.K = np.array([fl, fl, self.W / 2, self.H / 2], np.float32)
        self.scene_to_cam = np.eye(4, dtype=np.float32)
        # light travel direction in WORLD coordinates (the reference's
        # DirectionalLight pose lives in the scene, pyrender_wrapper.py:30,
        # so the light stays fixed while the camera moves); rotated into
        # camera space per render() call. Default: tilted overhead light
        # for the y-up sim world.
        self.light_dir = np.array([0.3, -0.8, 0.5], np.float32)
        self.light_dir /= np.linalg.norm(self.light_dir)
        self.set_camera_default()

    # -- camera presets -------------------------------------------------
    def set_camera(self, scene_to_cam):
        self.scene_to_cam = np.asarray(scene_to_cam, np.float32)

    def set_intrinsics(self, k4):
        self.K = np.asarray(k4, np.float32)

    def set_camera_default(self):
        """45-degree-ish view used by the reference when no camera is given
        (vis.py:98-108): rotate -5pi/6 about x then -pi/2 about y, t=(0,0,3).
        The matrix is CV-convention scene->cam (+z forward, y down), same as
        what the reference passes pre-flip (pyrender_wrapper.py:69-71).
        """
        from scipy.spatial.transform import Rotation as R

        rot = (
            R.from_rotvec([-5 * np.pi / 6, 0, 0]).as_matrix()
            @ R.from_rotvec([0, -np.pi / 2, 0]).as_matrix()
        )
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rot
        m[:3, 3] = [0, 0, 3.0]
        self.scene_to_cam = m

    def set_camera_bev(self, depth, gl=False):
        """Reference pyrender_wrapper.py:47-56 (pre-flip matrix)."""
        from scipy.spatial.transform import Rotation as R

        rv = [-np.pi / 2, 0, 0] if gl else [np.pi / 2, 0, 0]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R.from_rotvec(rv).as_matrix()
        m[2, 3] = depth
        self.scene_to_cam = m

    def set_camera_frontal(self, depth, gl=False, delta=0.0):
        """Reference pyrender_wrapper.py:58-67 (pre-flip matrix)."""
        from scipy.spatial.transform import Rotation as R

        rv = [np.pi + np.pi / 180, delta, 0] if gl else [np.pi / 180, delta, 0]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = R.from_rotvec(rv).as_matrix()
        m[2, 3] = depth
        self.scene_to_cam = m

    def get_cam_to_scene(self):
        """Inverse of scene_to_cam (reference pyrender_wrapper.py:93-97)."""
        out = np.eye(4, dtype=np.float32)
        R = self.scene_to_cam[:3, :3]
        out[:3, :3] = R.T
        out[:3, 3] = -R.T @ self.scene_to_cam[:3, 3]
        return out

    def set_light_topdown(self, gl=False):
        """Top-down directional light, fixed in WORLD space (reference
        pyrender_wrapper.py:73-79: light travel = Rodrigues(±pi/2 about x)
        applied to the light's -z axis -> (0,-1,0) for gl=True y-up
        worlds, (0,1,0) for gl=False y-down worlds)."""
        self.light_dir = np.array(
            [0.0, -1.0, 0.0] if gl else [0.0, 1.0, 0.0], np.float32
        )

    def align_light_to_camera(self):
        """Point the light along the camera viewing axis (reference
        pyrender_wrapper.py:81-82: light_pose = inv(scene_to_cam), whose
        -z column is the camera's viewing direction in the scene). The
        CV camera looks along +z, so the world-space travel direction is
        R^T @ (0,0,1)."""
        self.light_dir = np.ascontiguousarray(
            self.scene_to_cam[:3, :3].T @ np.array([0, 0, 1.0], np.float32)
        )

    # -- render ---------------------------------------------------------
    def render(self, verts, faces, colors, background=255):
        """verts (V,3) world, faces (F,3), colors (V,3) uint8 -> (H,W,3)."""
        lib = _load_lib()
        v = np.ascontiguousarray(verts, np.float32)
        # scene_to_cam is CV-convention (+z forward, y down) — exactly what
        # the rasterizer consumes; no GL flip needed
        vc = v @ self.scene_to_cam[:3, :3].T + self.scene_to_cam[:3, 3][None]
        vc = np.ascontiguousarray(vc, np.float32)
        # rotate the world-space light into camera space (the rasterizer
        # shades with camera-space normals)
        l_cam = self.scene_to_cam[:3, :3] @ self.light_dir
        l_cam = np.ascontiguousarray(
            l_cam / max(np.linalg.norm(l_cam), 1e-12), np.float32
        )
        f = np.ascontiguousarray(faces, np.int32)
        c = np.ascontiguousarray(colors, np.uint8)
        img = np.full((self.H, self.W, 3), background, np.uint8)
        lib.rasterize(
            _cptr(vc, ctypes.c_float), len(vc),
            _cptr(f, ctypes.c_int32), len(f),
            _cptr(c, ctypes.c_uint8),
            _cptr(self.K, ctypes.c_float),
            _cptr(l_cam, ctypes.c_float),
            self.H, self.W,
            _cptr(img, ctypes.c_uint8),
        )
        return img

    def render_default_view(self, verts, faces, colors):
        self.set_camera_default()
        return self.render(verts, faces, colors)

    def delete(self):
        pass
