"""Coverage for the utility layers: vis/rendering, projection, IO,
data-prep scripts, autodiff helpers, bullet coordinate conversion."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAIKAGO = "/root/reference/data/urdf_templates/laikago/laikago.urdf"


def test_render_robot_produces_image(tmp_path):
    from ppr_diffphys_tpu.sim.urdf import URDF
    from ppr_diffphys_tpu.utils.vis import render_robot

    u = URDF.load(LAIKAGO)
    cfg = np.zeros(12)
    cfg[[2, 5, 8, 11]] = -0.8
    img, mesh = render_robot(
        u, str(tmp_path / "r.png"), cfg=cfg, use_collision=True
    )
    assert img.shape == (256, 256, 3)
    # something was drawn (not all background)
    assert (img < 250).any()
    assert (tmp_path / "r.png").exists()


def test_rasterizer_smooth_shading_and_specular():
    """The C++ rasterizer shades with interpolated per-vertex normals +
    a directional/ambient/specular model (the reference lights a
    metallic-roughness material with one DirectionalLight,
    pyrender_wrapper.py:34-37) — NOT flat per-face shading. Pinned on a
    uv-sphere lit along the view axis: (a) intensity varies smoothly
    across the surface (flat shading would quantize to per-face
    constants), (b) a specular highlight exceeds the fully-lit diffuse
    ceiling, (c) the limb stays above the ambient floor x albedo."""
    from ppr_diffphys_tpu.utils.render import SoftwareRenderer

    r = SoftwareRenderer(128, 128)
    th = np.linspace(0, np.pi, 24)
    ph = np.linspace(0, 2 * np.pi, 48)
    T, P = np.meshgrid(th, ph, indexing="ij")
    V = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3) + [0, 0, 3.0]
    F = []
    for i in range(23):
        for j in range(47):
            a = i * 48 + j
            F += [[a, a + 1, a + 48], [a + 1, a + 49, a + 48]]
    r.set_camera(np.eye(4))
    r.light_dir = np.array([0, 0, 1.0], np.float32)  # along +z (view axis)
    albedo = 180
    img = r.render(V, np.array(F, np.int32),
                   np.full((len(V), 3), albedo, np.uint8))
    on = img[..., 0][img[..., 0] != 255]
    assert on.size > 3000  # sphere actually drawn
    # (a) smooth: a scanline through the center carries many distinct
    # intensities (each ~5px-wide face would contribute ONE under flat)
    row = img[64, :, 0]
    assert len(set(row[row != 255].tolist())) > 20
    # (b) specular highlight brighter than the diffuse-only ceiling
    assert int(on.max()) > albedo
    # (c) ambient floor keeps the limb visible
    assert int(on.min()) >= int(0.35 * albedo)


def _uv_sphere(center, n_th=24, n_ph=48):
    th = np.linspace(0, np.pi, n_th)
    ph = np.linspace(0, 2 * np.pi, n_ph)
    T, P = np.meshgrid(th, ph, indexing="ij")
    V = np.stack(
        [np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1
    ).reshape(-1, 3) + np.asarray(center, np.float64)
    F = []
    for i in range(n_th - 1):
        for j in range(n_ph - 1):
            a = i * n_ph + j
            F += [[a, a + 1, a + n_ph], [a + 1, a + n_ph + 1, a + n_ph]]
    return V, np.array(F, np.int32)


def test_light_is_world_fixed_and_camera_aligned_lights_the_scene():
    """The light lives in WORLD space (reference pyrender_wrapper.py:30:
    the DirectionalLight pose is a scene node, so it must not rotate with
    the camera), and align_light_to_camera points its travel along the
    camera view axis (pyrender_wrapper.py:81-82) — a regression test for
    the round-5 review finding where the camera-aligned light pointed
    BACKWARD and every pixel collapsed to the ambient floor."""
    from ppr_diffphys_tpu.utils.render import SoftwareRenderer

    albedo = 180
    r = SoftwareRenderer(128, 128)
    V, F = _uv_sphere([0, 0, 3.0])
    C = np.full((len(V), 3), albedo, np.uint8)

    # camera-aligned light with the identity camera: head-on illumination
    # -> the center of the sphere must be lit well above the ambient
    # floor (the broken version rendered ambient-only everywhere)
    r.set_camera(np.eye(4))
    r.align_light_to_camera()
    np.testing.assert_allclose(r.light_dir, [0, 0, 1.0], atol=1e-6)
    img = r.render(V, F, C)
    assert int(img[64, 64, 0]) > int(0.75 * albedo)

    # world-fixedness: a top-down world light (travel (0,-1,0), y-up
    # world) must light the world-up hemisphere. Under the identity CV
    # camera (image y DOWN = world y), the world-up hemisphere renders
    # into the LOWER image half — that half must be brighter than the
    # world-down hemisphere in the upper half (a camera-space light
    # (0,-1,0) would light the upper half instead).
    r2 = SoftwareRenderer(128, 128)
    r2.set_light_topdown(gl=True)  # travel (0,-1,0): downward, y-up world
    r2.set_camera(np.eye(4))
    frontal = r2.render(V, F, C)
    up_hemi = frontal[75:108, 44:84, 0]  # world +y half (image lower)
    down_hemi = frontal[20:55, 44:84, 0]  # world -y half (image upper)
    lit = up_hemi[up_hemi != 255]
    unlit = down_hemi[down_hemi != 255]
    assert lit.mean() > unlit.mean() + 15


def test_project_bodies_pinhole():
    from ppr_diffphys_tpu.utils.projection import project_bodies

    # identity camera, fx=fy=100, px=py=50; a point at (0.1, 0.2, 1)
    rtk = jnp.zeros((1, 4, 4))
    rtk = rtk.at[0, :3, :3].set(jnp.eye(3))
    rtk = rtk.at[0, 3].set(jnp.array([100.0, 100.0, 50.0, 50.0]))
    bodies = jnp.array([[[0.1, 0.2, 1.0, 0, 0, 0, 1.0]]])
    px = np.asarray(project_bodies(bodies, rtk))
    np.testing.assert_allclose(px[0, 0], [60.0, 70.0], atol=1e-4)


def test_compute_gradient_linear():
    from ppr_diffphys_tpu.utils.autodiff import compute_gradient

    W = jnp.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])  # (Din=3, Dout=2)

    def fn(x):
        return x @ W

    x = jnp.ones((4, 3))
    jac = np.asarray(compute_gradient(fn, x))
    assert jac.shape == (4, 3, 2)
    np.testing.assert_allclose(jac[0], np.asarray(W), atol=1e-5)


def test_bullet2gl_in_bullet_branch():
    """The a1/bullet path rotates orientations by the permutation matrix
    (reference dp_utils.py:141-156)."""
    from scipy.spatial.transform import Rotation as R
    from ppr_diffphys_tpu.data.amp_loader import bullet2gl, ISSAC_TO_GL

    rng = np.random.RandomState(0)
    orn = R.random(5, rng).as_quat()
    msm = dict(
        pos=rng.randn(5, 3), orn=orn.copy(),
        vel=rng.randn(5, 3), avel=rng.randn(5, 3),
    )
    pos0 = msm["pos"].copy()
    bullet2gl(msm, in_bullet=True)
    np.testing.assert_allclose(msm["pos"], (ISSAC_TO_GL @ pos0.T).T, atol=1e-6)
    # orientation: R' = P-permuted (R @ P); both steps applied
    expect = R.from_matrix(R.from_quat(orn).as_matrix() @ ISSAC_TO_GL).as_quat()
    expect[:, :3] = (ISSAC_TO_GL @ expect[:, :3].T).T
    dot = np.abs(np.sum(msm["orn"] * expect, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_scripts_roundtrip(tmp_path):
    # scale_urdf doubles joint origins; process_urdf adds collisions
    src = open(LAIKAGO).read()
    p = tmp_path / "robot.urdf.bk"
    p.write_text(src)
    subprocess.check_call(
        [sys.executable, os.path.join(REPO, "scripts", "scale_urdf.py"), str(p), "2.0"]
    )
    from ppr_diffphys_tpu.sim.urdf import URDF

    orig = URDF.load(LAIKAGO)
    scaled = URDF.load(str(tmp_path / "robot.urdf"))
    j0 = orig.joints[0].origin[:3, 3]
    j1 = scaled.joints[0].origin[:3, 3]
    np.testing.assert_allclose(j1, 2.0 * j0, atol=1e-5)


def test_read_amp_script(tmp_path):
    subprocess.check_call(
        [
            sys.executable, os.path.join(REPO, "scripts", "read_amp.py"),
            "/root/reference/data/motion_sequences/mi-pace/amp-mi-pace.txt",
            str(tmp_path),
        ]
    )
    root = np.loadtxt(tmp_path / "out-root_traj.txt")
    assert root.shape == (39, 7)


def test_label_colormap():
    from ppr_diffphys_tpu.utils.colors import label_colormap

    cm = label_colormap(65)
    assert cm.shape == (65, 3)
    assert len(np.unique(cm, axis=0)) == 65
