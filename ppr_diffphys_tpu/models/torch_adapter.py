"""Torch-lab4d field adapter: convert live torch MLP fields into the
pure-JAX ``(spec, params)`` protocol of ``models/fields.py``.

The reference's phys_interface consumes torch ``nn.Module`` fields from
lab4d (reference dp_interface.py:17-36) and its proxy/delta MLPs are the
vendored TimeMLPWrapper / CameraMLPWrapper architectures
(torch_utils.py:116-304, lab4d_utils.py:137-521). Our flax TimeMLPFlax /
CameraMLPFlax (models/mlp.py) implement the same computation graph, so a
state-dict weight mapping makes the JAX forward numerically equal to the
torch forward — this is what lets a real PPR checkpoint "drop in".

torch is imported lazily and only if tensors are passed; plain numpy
state dicts work without torch installed.

Mapping (torch state_dict key -> flax param path):
  time_embedding.mapping1.{weight,bias}        -> time_embedding/mapping1 (W^T)
  time_embedding.mapping2.{weight,bias}        -> time_embedding/mapping2
  time_embedding.inst_embedding.mapping.weight -> time_embedding/inst_embedding/embedding
  linear_<i>.0.{weight,bias}                   -> trunk/linear_<i>
  linear_final.0.{weight,bias}                 -> trunk/linear_final
  head.0.{weight,bias}                         -> head            (TimeMLPWrapper)
  trans.0 / quat.0 / base_quat                 -> trans/quat/base_quat (CameraMLPWrapper)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .mlp import CameraMLPFlax, FrameSampler, TimeMLPFlax


def _np(v):
    """torch tensor / numpy -> numpy (torch imported lazily)."""
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, np.float32)


def _dense(sd: Dict[str, Any], key: str) -> Dict[str, jnp.ndarray]:
    """torch nn.Linear -> flax Dense (torch weight is (out,in))."""
    return {
        "kernel": jnp.asarray(_np(sd[key + ".weight"]).T),
        "bias": jnp.asarray(_np(sd[key + ".bias"])),
    }


def _infer_arch(sd: Dict[str, Any]) -> Tuple[int, int, int, int, tuple]:
    """(num_freq_t, num_inst, W, D, skips) from weight shapes.

    mapping1 in_features = 1 + 2*num_freq_t (PosEmbedding of a scalar);
    skip layers are the trunk linears whose in_features = 2W.
    """
    m1 = _np(sd["time_embedding.mapping1.weight"])
    W = m1.shape[0]
    num_freq_t = (m1.shape[1] - 1) // 2
    num_inst = _np(sd["time_embedding.inst_embedding.mapping.weight"]).shape[0]
    D = 0
    while ("linear_%d.0.weight" % (D + 1)) in sd:
        D += 1
    skips = tuple(
        i
        for i in range(D)
        if _np(sd["linear_%d.0.weight" % (i + 1)]).shape[1] > W
    )
    return num_freq_t, num_inst, W, D, skips


def _trunk_params(sd: Dict[str, Any], D: int) -> Dict[str, Any]:
    p = {
        "linear_%d" % (i + 1): _dense(sd, "linear_%d.0" % (i + 1))
        for i in range(D)
    }
    p["linear_final"] = _dense(sd, "linear_final.0")
    return p


def _embedding_params(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "mapping1": _dense(sd, "time_embedding.mapping1"),
        "mapping2": _dense(sd, "time_embedding.mapping2"),
        "inst_embedding": {
            "embedding": jnp.asarray(
                _np(sd["time_embedding.inst_embedding.mapping.weight"])
            )
        },
    }


def timemlp_from_torch(
    state_dict: Dict[str, Any], output_scale: float = 1.0
) -> Tuple[TimeMLPFlax, Dict[str, Any]]:
    """TimeMLPWrapper state_dict -> (TimeMLPFlax module, flax params)."""
    sd = dict(state_dict)
    num_freq_t, num_inst, W, D, skips = _infer_arch(sd)
    head = _dense(sd, "head.0")
    module = TimeMLPFlax(
        num_freq_t=num_freq_t,
        num_inst=num_inst,
        out_channels=int(head["bias"].shape[0]),
        D=D,
        W=W,
        skips=skips,
        output_scale=output_scale,
    )
    params = {
        "time_embedding": _embedding_params(sd),
        "trunk": _trunk_params(sd, D),
        "head": head,
    }
    return module, params


def cameramlp_from_torch(
    state_dict: Dict[str, Any]
) -> Tuple[CameraMLPFlax, Dict[str, Any]]:
    """CameraMLPWrapper state_dict -> (CameraMLPFlax module, flax params)."""
    sd = dict(state_dict)
    num_freq_t, num_inst, W, D, skips = _infer_arch(sd)
    module = CameraMLPFlax(
        num_freq_t=num_freq_t, num_inst=num_inst, D=D, W=W, skips=skips
    )
    params = {
        "time_embedding": _embedding_params(sd),
        "trunk": _trunk_params(sd, D),
        "trans": _dense(sd, "trans.0"),
        "quat": _dense(sd, "quat.0"),
        "base_quat": jnp.asarray(_np(sd["base_quat"])),
    }
    return module, params


def sampler_from_torch(torch_time_mlp) -> FrameSampler:
    """FrameSampler matching a torch TimeMLP's time_embedding bookkeeping."""
    te = torch_time_mlp.time_embedding
    return FrameSampler(tuple(int(x) for x in np.asarray(te.frame_offset_raw)))


def camera_field_from_torch(
    torch_camera_mlp,
    rng,
    name: str = "field",
    logscale=None,
    field2world=None,
):
    """Wrap a live torch CameraMLPWrapper as a fields.CameraField
    (spec, params) pair whose JAX queries equal the torch get_vals().

    logscale / field2world: optional values from the enclosing lab4d field
    (reference dp_interface.py reads field.logscale and field2world; the
    vendored camera MLP itself carries neither).
    """
    from .fields import CameraField

    sd = {k: _np(v) for k, v in torch_camera_mlp.state_dict().items()}
    sampler = sampler_from_torch(torch_camera_mlp)
    field = CameraField(sampler.offsets, rng, name=name)
    module, cam_params = cameramlp_from_torch(sd)
    # architecture must agree with what CameraField builds for this
    # frame layout (both derive num_freq_t the same way)
    assert module.num_freq_t == field.camera_mlp.num_freq_t, (
        module.num_freq_t,
        field.camera_mlp.num_freq_t,
    )
    params = dict(field.init_params)
    params["camera_mlp"] = cam_params
    if logscale is not None:
        params["logscale"] = jnp.asarray(_np(logscale)).reshape(())
    if field2world is not None:
        params["field2world"] = jnp.asarray(_np(field2world))
    return field, params
