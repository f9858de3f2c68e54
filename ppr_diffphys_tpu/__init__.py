"""ppr_diffphys_tpu — a TPU-native differentiable rigid-body physics framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gengshan-y/ppr-diffphys (the differentiable-physics module of "PPR:
Physically Plausible Reconstruction from Monocular Videos", ICCV 2023):
motion imitation of articulated robots by optimizing control references,
PD gains, body masses, global SE(3) and initial velocities through a
differentiable maximal-coordinate rigid-body simulator.

Design (vs the CUDA/Warp reference):
- the whole rollout (FK + joint/contact forces + symplectic Euler over
  hundreds of substeps) is a single jitted ``lax.scan`` — no per-step host
  loop, no kernel-launch or tensor-conversion overhead;
- environments are a batch axis (``vmap``) instead of model replication,
  and shard over a ``jax.sharding.Mesh`` for multi-chip scaling;
- gradients come from ``jax.grad`` through the scan with per-frame
  rematerialization instead of a hand-managed adjoint tape.
"""

__version__ = "0.1.0"

import jax as _jax

# Differentiable stiff-spring physics does not survive bf16 matmul inputs
# (joint_attach_ke=16e3 at dt=5e-4; see SURVEY.md §7 "Hard parts"). TPUs
# default to bf16-input matmuls, which visibly quantizes even 4x4 SE(3)
# composition — so the framework pins fp32 matmul precision globally.
# Model code that wants bf16 MXU throughput opts back in locally with
# `jax.default_matmul_precision('bfloat16')`.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: the unrolled-FK + scanned-rollout programs
# are large and XLA compiles them slowly (minutes for the quad/human
# templates); cache compiled executables across processes. Override the
# location with PPR_COMPILE_CACHE, disable with PPR_COMPILE_CACHE=0.
import os as _os

_cache_dir = _os.environ.get("PPR_COMPILE_CACHE", "/tmp/ppr_jax_cache")
if _cache_dir != "0":
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
