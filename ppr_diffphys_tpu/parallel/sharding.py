"""Multi-chip scaling via jax.sharding (SPMD over a device mesh).

The reference has no real distributed support — its --ngpu/--local_rank
flags are vestigial (SURVEY.md §2 parallelism table). Here, scaling is
first-class and TPU-native:

- **dp** (environment parallelism): the env batch axis of every simulator
  quantity is sharded across chips. The rollout is embarrassingly parallel
  over envs; XLA inserts psums over ICI only for the scalar loss/grad
  reductions.
- **tp** (tensor parallelism): the 256-wide hidden layers of the time-MLPs
  shard their feature dimension; XLA inserts all-gathers/reduce-scatters
  where the skip concats and heads need full features.

Everything flows through ``jax.jit`` with NamedSharding constraints; there
is no hand-written collective code to keep in sync with the model.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[dict] = None, devices=None) -> Mesh:
    """mesh_shape e.g. {"dp": 4, "tp": 2}; None -> all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = {"dp": len(devices)}
    names = tuple(mesh_shape.keys())
    sizes = tuple(mesh_shape.values())
    assert int(np.prod(sizes)) <= len(devices), (mesh_shape, len(devices))
    devs = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(devs, names)


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading env axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _is_tp_kernel(path_tuple) -> bool:
    """Dense kernels inside the MLP trunks get their output-feature axis
    sharded over tp."""
    path = "/".join(str(p) for p in path_tuple)
    return ("trunk" in path or "time_embedding" in path) and path.endswith("kernel")


def param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for the phys_model parameter dict.

    MLP trunk kernels: P(None, 'tp') (output features sharded) when the
    mesh has a tp axis; everything else replicated.
    """
    has_tp = "tp" in mesh.axis_names and mesh.shape["tp"] > 1

    def assign(path, leaf):
        if has_tp and hasattr(leaf, "ndim") and leaf.ndim == 2:
            if _is_tp_kernel([getattr(p, "key", getattr(p, "idx", p)) for p in path]):
                if leaf.shape[-1] % mesh.shape["tp"] == 0:
                    return NamedSharding(mesh, P(None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_train_step(fn, mesh: Mesh, params_template):
    """jit a (params, frame_start, key, progress, weights) train step with
    dp-sharded env inputs and (optionally) tp-sharded MLP params."""
    ps = param_shardings(mesh, params_template)
    return jax.jit(
        fn,
        in_shardings=(
            ps,
            env_sharding(mesh),  # frame_start (E,)
            replicated(mesh),  # rng key
            replicated(mesh),  # progress
            replicated(mesh),  # weights
        ),
    )
