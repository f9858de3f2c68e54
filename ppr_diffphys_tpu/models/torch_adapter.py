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


def articulation_params_from_torch(torch_art, art_spec):
    """Torch articulation module -> params for a fields.ArticulationField.

    ``torch_art`` is the ``object_field.warp.articulation`` surface the
    reference interface queries (dp_interface.py:400-466): a joint-angle
    TimeMLP (the vendored TimeMLPWrapper architecture, lab4d_utils.py:394-
    521 + torch_utils.py:116-182) exposed as ``.mlp``, plus the learnable
    urdf-to-object alignment ``logscale`` / ``orient`` (wxyz) / ``shift``
    and optional per-joint ``rest_offsets``.
    """
    module, mlp_params = timemlp_from_torch(torch_art.mlp.state_dict())
    assert module.num_freq_t == art_spec.mlp.num_freq_t, (
        module.num_freq_t, art_spec.mlp.num_freq_t)
    assert module.out_channels == art_spec.n_dof, (
        module.out_channels, art_spec.n_dof)
    params = dict(art_spec.init_params)
    params["mlp"] = mlp_params
    params["logscale"] = jnp.asarray(_np(torch_art.logscale)).reshape(())
    params["orient"] = jnp.asarray(_np(torch_art.orient)).reshape(4)
    params["shift"] = jnp.asarray(_np(torch_art.shift)).reshape(3)
    if getattr(torch_art, "rest_offsets", None) is not None:
        params["rest_offsets"] = jnp.asarray(_np(torch_art.rest_offsets))
    return params


def object_field_from_torch(torch_field, robot, rng, name="object_field"):
    """Live torch lab4d object field -> (fields.ObjectField, params).

    ``torch_field`` carries the query surface phys_interface consumes
    (reference dp_interface.py:381-466): ``.camera_mlp`` (the vendored
    CameraMLPWrapper, torch_utils.py:183-304), ``.logscale``, optional
    ``.field2world`` (V,7), and ``.warp.articulation`` (see
    :func:`articulation_params_from_torch`).
    """
    from .fields import ObjectField

    sampler = sampler_from_torch(torch_field.camera_mlp)
    field = ObjectField(sampler.offsets, robot, rng, name=name)
    module, cam_params = cameramlp_from_torch(
        torch_field.camera_mlp.state_dict())
    assert module.num_freq_t == field.camera_mlp.num_freq_t
    params = dict(field.init_params)
    params["camera_mlp"] = cam_params
    params["logscale"] = jnp.asarray(_np(torch_field.logscale)).reshape(())
    if getattr(torch_field, "field2world", None) is not None:
        params["field2world"] = jnp.asarray(_np(torch_field.field2world))
    params["articulation"] = articulation_params_from_torch(
        torch_field.warp.articulation, field.articulation_spec)
    return field, params


def scene_field_from_torch(torch_field, rng, name="scene_field"):
    """Live torch lab4d scene field -> (fields.CameraField, params)."""
    return camera_field_from_torch(
        torch_field.camera_mlp, rng, name=name,
        logscale=torch_field.logscale,
        field2world=getattr(torch_field, "field2world", None),
    )


# ---------------------------------------------------------------------------
# inverse direction: flax params -> torch state_dicts (pushing the
# physics-refined proxy weights back into lab4d's DR cycle — the
# override_states_inv leg of the reference's alternation,
# dp_interface.py:352-372)
# ---------------------------------------------------------------------------

def _dense_to_torch(p, key: str) -> Dict[str, np.ndarray]:
    return {
        key + ".weight": np.asarray(p["kernel"]).T.copy(),
        key + ".bias": np.asarray(p["bias"]).copy(),
    }


def _embedding_to_torch(p) -> Dict[str, np.ndarray]:
    out = {}
    out.update(_dense_to_torch(p["mapping1"], "time_embedding.mapping1"))
    out.update(_dense_to_torch(p["mapping2"], "time_embedding.mapping2"))
    out["time_embedding.inst_embedding.mapping.weight"] = np.asarray(
        p["inst_embedding"]["embedding"]).copy()
    return out


def _trunk_to_torch(p) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in p.items():
        out.update(_dense_to_torch(v, k + ".0"))
    return out


def timemlp_state_to_torch(params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`timemlp_from_torch`: flax params -> a numpy
    state_dict loadable into the vendored TimeMLPWrapper."""
    out = _embedding_to_torch(params["time_embedding"])
    out.update(_trunk_to_torch(params["trunk"]))
    out.update(_dense_to_torch(params["head"], "head.0"))
    return out


def cameramlp_state_to_torch(params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`cameramlp_from_torch`."""
    out = _embedding_to_torch(params["time_embedding"])
    out.update(_trunk_to_torch(params["trunk"]))
    out.update(_dense_to_torch(params["trans"], "trans.0"))
    out.update(_dense_to_torch(params["quat"], "quat.0"))
    out["base_quat"] = np.asarray(params["base_quat"]).copy()
    return out


def _load_into(torch_module, np_state: Dict[str, np.ndarray]):
    import torch

    sd = torch_module.state_dict()
    for k, v in np_state.items():
        sd[k] = torch.as_tensor(v)
    torch_module.load_state_dict(sd)


def export_camera_field_to_torch(params, torch_field):
    """Write CameraField params back into a live torch scene field
    (camera weights + logscale + field2world)."""
    import torch

    _load_into(torch_field.camera_mlp, cameramlp_state_to_torch(params["camera_mlp"]))
    with torch.no_grad():
        torch_field.logscale.copy_(
            torch.as_tensor(np.array(params["logscale"])).reshape(
                torch_field.logscale.shape))
        if getattr(torch_field, "field2world", None) is not None:
            torch_field.field2world.copy_(
                torch.as_tensor(np.array(params["field2world"])))


def export_object_field_to_torch(params, torch_field):
    """Write ObjectField params (incl. articulation) back into a live
    torch object field — the DP->DR hand-off."""
    import torch

    export_camera_field_to_torch(params, torch_field)
    art = torch_field.warp.articulation
    _load_into(art.mlp, timemlp_state_to_torch(params["articulation"]["mlp"]))
    with torch.no_grad():
        art.logscale.copy_(torch.as_tensor(
            np.array(params["articulation"]["logscale"])).reshape(
                art.logscale.shape))
        art.orient.copy_(torch.as_tensor(
            np.array(params["articulation"]["orient"])).reshape(
                art.orient.shape))
        art.shift.copy_(torch.as_tensor(
            np.array(params["articulation"]["shift"])).reshape(
                art.shift.shape))
        if getattr(art, "rest_offsets", None) is not None:
            art.rest_offsets.copy_(torch.as_tensor(
                np.array(params["articulation"]["rest_offsets"])))


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
