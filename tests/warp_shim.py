"""NumPy-backed emulation of the `warp` 0.7.2 API surface used by the
reference's kernels — the missing piece of the "losses match the Warp
reference" proof (VERDICT.md Missing #1).

warp-lang cannot be installed in this environment (zero egress), but the
reference's physics kernels (`/root/reference/diffphys/integrator_euler.py`)
are written in Warp's *Python* DSL: plain functions of typed scalars/vectors
that Warp JIT-compiles per CUDA thread. Executing those same functions
element-by-element in Python with a faithful implementation of the ~40
`wp.*` builtins they call reproduces the reference's exact arithmetic —
without copying a single line of reference code (the module is imported
from the read-only mount at test time).

Semantics replicated from warp 0.7.2 builtins (warp/native/builtin.h):

- ``wp.step(x)``    = 1.0 if x <  0 else 0.0   (reversed vs the usual step!)
- ``wp.nonzero(x)`` = 1.0 if x != 0 else 0.0
- ``wp.sign(x)``    = -1.0 if x < 0 else 1.0
- ``wp.normalize(v)`` guards the zero vector (returns 0)
- ``wp.acos``/``wp.asin`` clamp their argument to [-1, 1]
- ``quat`` is xyzw; ``quat*quat`` is the Hamilton product
- ``transform`` is (p, q); ``t1*t2`` composes; ``mat33(a,b,c)`` takes columns
  (verified analytically: with columns, the reference's ``quat_decompose``
  recovers intrinsic-XYZ angles with the correct sign, which is required for
  its COMPOUND PD law to track positive joint targets at all)
- ``wp.atomic_add/sub(arr, i, v)`` mutate arr[i] (serial here, so exact)

Everything computes in float64: the shim serves as a high-precision oracle
for the fp32 JAX integrator.
"""

import sys
import types
import importlib.util

import numpy as np


# ---------------------------------------------------------------------------
# typed values
# ---------------------------------------------------------------------------

def vec3(*args):
    if len(args) == 0:
        return np.zeros(3, np.float64)
    if len(args) == 1:
        return np.asarray(args[0], np.float64).reshape(3).copy()
    return np.array(args, np.float64)


def vec4(*args):
    if len(args) == 0:
        return np.zeros(4, np.float64)
    if len(args) == 1:
        return np.asarray(args[0], np.float64).reshape(4).copy()
    return np.array(args, np.float64)


class quat(np.ndarray):
    """xyzw quaternion; * dispatches to Hamilton product on quats."""

    def __new__(cls, *args):
        if len(args) == 0:
            buf = np.array([0.0, 0.0, 0.0, 1.0])
        elif len(args) == 2:  # (vec3 imaginary, w)
            v, w = args
            buf = np.array([v[0], v[1], v[2], w], np.float64)
        elif len(args) == 4:
            buf = np.array(args, np.float64)
        else:
            buf = np.asarray(args[0], np.float64).reshape(4).copy()
        return buf.view(cls)

    def __mul__(self, other):
        if isinstance(other, quat):
            x1, y1, z1, w1 = self[0], self[1], self[2], self[3]
            x2, y2, z2, w2 = other[0], other[1], other[2], other[3]
            return quat(
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            )
        return quat(np.asarray(self) * other)

    def __rmul__(self, other):  # scalar * quat
        return quat(np.asarray(self) * other)


class transform:
    """Rigid transform: translation p + rotation q (xyzw)."""

    __slots__ = ("p", "q")

    def __init__(self, p=None, q=None):
        self.p = vec3() if p is None else vec3(p)
        self.q = quat() if q is None else quat(np.asarray(q, np.float64))

    def __mul__(self, other):
        if isinstance(other, transform):
            return transform(self.p + quat_rotate(self.q, other.p), self.q * other.q)
        raise TypeError(type(other))

    def to7(self):
        return np.concatenate([self.p, np.asarray(self.q)])


class mat33:
    """3x3 matrix. Vector constructor takes COLUMNS (see module docstring)."""

    __slots__ = ("m",)

    def __init__(self, *args):
        if len(args) == 3:
            self.m = np.stack([vec3(a) for a in args], axis=1)  # columns
        elif len(args) == 1:
            self.m = np.asarray(args[0], np.float64).reshape(3, 3).copy()
        else:
            self.m = np.zeros((3, 3))

    def __mul__(self, other):
        if isinstance(other, mat33):
            return mat33(self.m @ other.m)
        o = np.asarray(other, np.float64)
        if o.shape == (3,):
            return self.m @ o
        return mat33(self.m * o)  # scalar

    def __getitem__(self, idx):
        return self.m[idx]


def spatial_vector(*args):
    if len(args) == 0:
        return np.zeros(6, np.float64)
    if len(args) == 2:  # (top/angular, bottom/linear)
        return np.concatenate([vec3(args[0]), vec3(args[1])])
    return np.asarray(args[0], np.float64).reshape(6).copy()


def spatial_matrix(*a):  # only used as a type annotation in the reference
    return np.zeros((6, 6))


def spatial_top(v):
    return np.asarray(v, np.float64)[:3].copy()


def spatial_bottom(v):
    return np.asarray(v, np.float64)[3:].copy()


def array(*a, **k):  # annotation-only in kernel signatures
    return None


float32 = np.float32


# ---------------------------------------------------------------------------
# math builtins
# ---------------------------------------------------------------------------

def dot(a, b):
    return float(np.dot(np.asarray(a), np.asarray(b)))


def cross(a, b):
    return np.cross(np.asarray(a, np.float64), np.asarray(b, np.float64))


def length(v):
    return float(np.linalg.norm(np.asarray(v)))


def normalize(v):
    l = np.linalg.norm(np.asarray(v))
    if l < 1e-12:
        return quat(0.0, 0.0, 0.0, 0.0) if isinstance(v, quat) else v * 0.0
    out = np.asarray(v, np.float64) / l
    return quat(out) if isinstance(v, quat) else out


def clamp(x, lo, hi):
    return float(min(max(x, lo), hi))


def min_(a, b):
    return a if a < b else b


def max_(a, b):
    return a if a > b else b


def step(x):
    return 1.0 if x < 0.0 else 0.0


def nonzero(x):
    return 1.0 if x != 0.0 else 0.0


def sign(x):
    return -1.0 if x < 0.0 else 1.0


def acos(x):
    return float(np.arccos(np.clip(x, -1.0, 1.0)))


def asin(x):
    return float(np.arcsin(np.clip(x, -1.0, 1.0)))


def atan2(y, x):
    return float(np.arctan2(y, x))


def quat_rotate(q, v):
    u = np.asarray(q, np.float64)[:3]
    w = float(q[3])
    v = np.asarray(v, np.float64)
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def quat_rotate_inv(q, v):
    u = -np.asarray(q, np.float64)[:3]
    w = float(q[3])
    v = np.asarray(v, np.float64)
    return v + 2.0 * np.cross(u, np.cross(u, v) + w * v)


def quat_inverse(q):
    return quat(-q[0], -q[1], -q[2], q[3])


def quat_from_axis_angle(axis, angle):
    a = np.asarray(axis, np.float64)
    s, c = np.sin(angle * 0.5), np.cos(angle * 0.5)
    return quat(a[0] * s, a[1] * s, a[2] * s, c)


def transform_point(t, p):
    return t.p + quat_rotate(t.q, p)


def transform_vector(t, v):
    return quat_rotate(t.q, v)


def transform_get_translation(t):
    return t.p.copy()


def transform_get_rotation(t):
    return quat(np.asarray(t.q))


def transform_inverse(t):
    qi = quat_inverse(t.q)
    return transform(-quat_rotate(qi, t.p), qi)


def skew(v):
    x, y, z = v
    return mat33(np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], np.float64))


def mul(a, b):
    return a * b


def transpose(m):
    return mat33(m.m.T)


# ---------------------------------------------------------------------------
# kernel machinery
# ---------------------------------------------------------------------------

_tid = [0]


def tid():
    return _tid[0]


def kernel(fn):
    return fn


def func(fn):
    return fn


def launch(kernel, dim, inputs, outputs=None, device=None, **kw):
    args = list(inputs) + list(outputs or [])
    for t in range(dim):
        _tid[0] = t
        kernel(*args)


def atomic_add(arr, i, v):
    arr[i] = arr[i] + v


def atomic_sub(arr, i, v):
    arr[i] = arr[i] - v


class _NPTensor(np.ndarray):
    def clone(self):
        return self.copy().view(_NPTensor)


def to_torch(arr):
    if isinstance(arr, list):
        return np.stack([np.asarray(a, np.float64) for a in arr]).view(_NPTensor)
    return np.asarray(arr, np.float64).view(_NPTensor)


class ScopedTimer:
    def __init__(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


# ---------------------------------------------------------------------------
# module assembly + reference loader
# ---------------------------------------------------------------------------

def _build_module():
    wp = types.ModuleType("warp")
    g = globals()
    for name in (
        "vec3 vec4 quat transform mat33 spatial_vector spatial_matrix array "
        "spatial_top spatial_bottom "
        "float32 dot cross length normalize clamp step nonzero sign acos asin "
        "atan2 quat_rotate quat_rotate_inv quat_inverse quat_from_axis_angle "
        "transform_point transform_vector transform_get_translation "
        "transform_get_rotation transform_inverse skew mul transpose tid "
        "kernel func launch atomic_add atomic_sub to_torch ScopedTimer"
    ).split():
        setattr(wp, name, g[name])
    wp.min = min_
    wp.max = max_

    # joint-type codes must match the arrays we feed the kernels, which come
    # from our own builder (the kernels only ever compare for equality)
    from ppr_diffphys_tpu.sim import builder as _b

    sim = types.ModuleType("warp.sim")
    sim.JOINT_FREE = _b.JOINT_FREE
    sim.JOINT_REVOLUTE = _b.JOINT_REVOLUTE
    sim.JOINT_PRISMATIC = _b.JOINT_PRISMATIC
    sim.JOINT_FIXED = _b.JOINT_FIXED
    sim.JOINT_COMPOUND = _b.JOINT_COMPOUND
    sim.JOINT_BALL = 98  # unused by the kernels
    sim.JOINT_UNIVERSAL = 99
    wp.sim = sim
    return wp, sim


def load_reference_integrator():
    """Import the reference's integrator_euler.py (read-only mount) with this
    shim installed as `warp`. Returns the live module; its kernels are plain
    Python functions operating on shim types."""
    wp, sim = _build_module()
    saved = {k: sys.modules.get(k) for k in ("warp", "warp.sim")}
    sys.modules["warp"] = wp
    sys.modules["warp.sim"] = sim
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_integrator_euler", "/root/reference/diffphys/integrator_euler.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    # the kernel bodies reference a handful of bare (non wp.-prefixed) names
    # that Warp's codegen resolves in its builtin namespace
    for name in (
        "vec3 quat_rotate cross spatial_top spatial_bottom "
        "transform_get_rotation transform_get_translation transform_inverse "
        "mat33 mul skew transpose"
    ).split():
        if not hasattr(mod, name):
            setattr(mod, name, getattr(wp, name, None))
    return mod
