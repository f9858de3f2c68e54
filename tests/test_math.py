"""Math-core tests: round trips and cross-checks against scipy.

The reference has no tests; SURVEY.md §4 prescribes quat/SE3 round-trips vs
scipy as the foundation layer of the new test strategy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from ppr_diffphys_tpu.ops import (
    quat_mul,
    quat_rotate,
    quat_normalize,
    quat_from_axis_angle,
    axis_angle_to_quat,
    quat_to_axis_angle,
    quat_to_matrix,
    matrix_to_quat,
    quat_rpy,
    compound_to_quat,
    quat_to_compound,
    quat_twist_angle,
    transform_mul,
    transform_inverse,
    transform_point,
    transform_identity,
    se3_vec2mat,
    se3_mat2vec,
    swap_lin_ang,
    compose_delta,
    rotate_frame,
)

RNG = np.random.RandomState(0)


def rand_quats(n):
    q = RNG.randn(n, 4).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_matches_scipy():
    a, b = rand_quats(64), rand_quats(64)
    ours = np.array(quat_mul(jnp.array(a), jnp.array(b)))
    ref = (R.from_quat(a) * R.from_quat(b)).as_quat()  # scipy is xyzw too
    # sign-invariant compare
    dot = np.abs(np.sum(ours * ref, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_rotate_matches_scipy():
    q = rand_quats(64)
    v = RNG.randn(64, 3).astype(np.float32)
    ours = np.array(quat_rotate(jnp.array(q), jnp.array(v)))
    ref = R.from_quat(q).apply(v)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quat_matrix_roundtrip():
    q = rand_quats(128)
    m = quat_to_matrix(jnp.array(q))
    np.testing.assert_allclose(np.array(m), R.from_quat(q).as_matrix(), atol=1e-5)
    q2 = np.array(matrix_to_quat(m))
    dot = np.abs(np.sum(q2 * q, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_matrix_to_quat_near_edge_cases():
    # 180-degree rotations hit the small-trace pivots
    for axis in np.eye(3):
        m = R.from_rotvec(np.pi * axis).as_matrix().astype(np.float32)
        q = np.array(matrix_to_quat(jnp.array(m)))
        m2 = np.array(quat_to_matrix(jnp.array(q)))
        np.testing.assert_allclose(m2, m, atol=1e-5)


def test_axis_angle_roundtrip():
    v = RNG.randn(100, 3).astype(np.float32)
    v[0] = 0.0  # exact zero case
    v[1] = 1e-8
    q = axis_angle_to_quat(jnp.array(v))
    ref = R.from_rotvec(v).as_quat()
    dot = np.abs(np.sum(np.array(q) * ref, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)
    v2 = np.array(quat_to_axis_angle(q))
    np.testing.assert_allclose(v2, v, atol=1e-4)


def test_axis_angle_grad_finite_at_zero():
    g = jax.grad(lambda v: axis_angle_to_quat(v).sum())(jnp.zeros(3))
    assert np.all(np.isfinite(np.array(g)))
    g2 = jax.grad(lambda q: quat_to_axis_angle(q).sum())(jnp.array([0.0, 0, 0, 1.0]))
    assert np.all(np.isfinite(np.array(g2)))


def test_quat_rpy_matches_scipy():
    rpy = RNG.uniform(-np.pi, np.pi, (32, 3)).astype(np.float32)
    for r_, p_, y_ in rpy:
        ours = np.array(quat_rpy(r_, p_, y_))
        ref = R.from_euler("xyz", [r_, p_, y_]).as_quat()  # extrinsic xyz
        dot = abs(np.dot(ours, ref))
        assert dot > 1 - 1e-5


def test_compound_roundtrip():
    angles = RNG.uniform(-1.2, 1.2, (200, 3)).astype(np.float32)
    q = compound_to_quat(jnp.array(angles))
    # matrix must equal intrinsic XYZ composition
    ref = R.from_euler("XYZ", angles).as_matrix()
    np.testing.assert_allclose(np.array(quat_to_matrix(q)), ref, atol=1e-5)
    back = np.array(quat_to_compound(q))
    np.testing.assert_allclose(back, angles, atol=1e-4)


def test_quat_twist_angle():
    axis = np.array([0.0, 1.0, 0.0], np.float32)
    for ang in [-1.5, -0.3, 0.0, 0.7, 2.0]:
        q = quat_from_axis_angle(jnp.array(axis), jnp.float32(ang))
        got = float(quat_twist_angle(jnp.array(axis), q))
        assert abs(got - ang) < 1e-3


def test_transform_mul_inverse():
    p = RNG.randn(32, 3).astype(np.float32)
    q = rand_quats(32)
    t = jnp.concatenate([jnp.array(p), jnp.array(q)], -1)
    ident = transform_mul(t, transform_inverse(t))
    np.testing.assert_allclose(
        np.array(ident), np.array(transform_identity((32,))), atol=1e-5
    )


def test_transform_point_vs_mat():
    p = RNG.randn(16, 3).astype(np.float32)
    q = rand_quats(16)
    t = jnp.concatenate([jnp.array(p), jnp.array(q)], -1)
    x = RNG.randn(16, 3).astype(np.float32)
    ours = np.array(transform_point(t, jnp.array(x)))
    m = np.array(se3_vec2mat(t))
    ref = (m[:, :3, :3] @ x[..., None])[..., 0] + m[:, :3, 3]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_se3_vec_mat_roundtrip():
    p = RNG.randn(32, 3).astype(np.float32)
    q = rand_quats(32)
    vec = jnp.concatenate([jnp.array(p), jnp.array(q)], -1)
    back = np.array(se3_mat2vec(se3_vec2mat(vec)))
    np.testing.assert_allclose(back[..., :3], p, atol=1e-5)
    dot = np.abs(np.sum(back[..., 3:] * q, -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_swap_lin_ang_involution():
    v = RNG.randn(8, 6).astype(np.float32)
    out = np.array(swap_lin_ang(swap_lin_ang(jnp.array(v))))
    np.testing.assert_allclose(out, v)
    v2 = RNG.randn(8, 18).astype(np.float32)  # root + extra dofs
    out2 = np.array(swap_lin_ang(swap_lin_ang(jnp.array(v2))))
    np.testing.assert_allclose(out2, v2)


def test_compose_delta_identity():
    tq = jnp.concatenate([jnp.array(RNG.randn(4, 3), jnp.float32), jnp.array(rand_quats(4))], -1)
    out = np.array(compose_delta(tq, jnp.zeros((4, 6))))
    np.testing.assert_allclose(out[..., :3], np.array(tq)[..., :3], atol=1e-5)


def test_rotate_frame_matches_matrix_compose():
    g = jnp.array(np.concatenate([RNG.randn(3), rand_quats(1)[0]]).astype(np.float32))
    tq = jnp.concatenate(
        [jnp.array(RNG.randn(4, 6, 3), jnp.float32), jnp.array(rand_quats(24).reshape(4, 6, 4))], -1
    )
    out = rotate_frame(g, tq)
    ref = np.array(se3_vec2mat(g))[None, None] @ np.array(se3_vec2mat(tq))
    np.testing.assert_allclose(np.array(se3_vec2mat(out)), ref, atol=1e-4)
