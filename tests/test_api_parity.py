"""Drop-in API checklist (VERDICT.md task #6): every public name in the
reference's dp_model.py / dp_interface.py must exist with a compatible
signature in the rebuild — enumerated from the reference source via ast so
the list cannot silently rot.

"Compatible" = the method exists and its required positional arity does not
exceed the reference's (callers passing reference-style arguments must not
hit a missing-argument error). A small documented exception table covers
the torch/warp boundary machinery that jax.grad replaces and the functional
re-parameterizations (explicit params / RNG keys).
"""

import ast
import inspect

import pytest

from ppr_diffphys_tpu.models.phys_model import phys_model
from ppr_diffphys_tpu.models import interface as interface_mod
from ppr_diffphys_tpu.models.interface import phys_interface, KinematicsProxy

REF_MODEL = "/root/reference/diffphys/dp_model.py"
REF_INTERFACE = "/root/reference/diffphys/dp_interface.py"

# name -> why the signature (or existence) legitimately differs
EXCEPTIONS = {
    # warp/torch autodiff boundary replaced by native jax.grad through the
    # lax.scan rollout (SURVEY.md §7 architecture mapping)
    "ForwardKinematics": "torch.autograd bridge; native jax.grad instead",
    "ForwardWarp": "torch.autograd bridge; native jax.grad instead",
    "wp_add": "warp kernel; res_f is a traced rollout input",
    "convert_ppr_warp": "torch<->warp layout swap; single layout internally",
    "get_local_rank": "vestigial DDP helper (SURVEY.md §2); jax.process_index",
    # functional-style re-parameterizations: explicit params / RNG keys
    "compute_frame_start": "takes an explicit jax PRNG key",
    "get_batch_input": "takes explicit params (pure function under jit)",
    "query_kinematics_groundtruth": "takes explicit params",
    "get_net_pred": "optional explicit params",
    "query_q": "module-level fn takes (spec, params) pairs",
    "query_ja": "module-level fn takes (spec, params) pairs",
}


def _public_names(path):
    """(class -> [(method, n_required_args)], [(function, n_required)])"""
    tree = ast.parse(open(path).read())
    classes, functions = {}, []

    def _required(fn):
        args = fn.args
        n = len(args.args) - len(args.defaults)
        names = [a.arg for a in args.args]
        if names and names[0] in ("self", "ctx", "cls"):
            n -= 1
        return max(n, 0)

    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            methods = [
                (f.name, _required(f))
                for f in node.body
                if isinstance(f, ast.FunctionDef) and not f.name.startswith("_")
            ]
            classes[node.name] = methods
        elif isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
            functions.append((node.name, _required(node)))
    return classes, functions


def _check_method(cls, name, ref_required):
    assert hasattr(cls, name), "%s.%s missing" % (cls.__name__, name)
    fn = getattr(cls, name)
    assert callable(fn), name
    if name in EXCEPTIONS:
        return
    sig = inspect.signature(fn)
    required = sum(
        1
        for p in sig.parameters.values()
        if p.name != "self"
        and p.default is inspect.Parameter.empty
        and p.kind
        in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    )
    assert required <= ref_required, (
        "%s.%s requires %d args, reference callers pass %d"
        % (cls.__name__, name, required, ref_required)
    )


def test_dp_model_surface():
    classes, functions = _public_names(REF_MODEL)
    for name, nreq in classes["phys_model"]:
        _check_method(phys_model, name, nreq)
    for name, _ in functions:
        if name in EXCEPTIONS:
            continue
        assert hasattr(phys_model, name) or name in dir(interface_mod), name


def test_dp_interface_surface():
    classes, _ = _public_names(REF_INTERFACE)
    for name, nreq in classes["phys_interface"]:
        _check_method(phys_interface, name, nreq)
    for name, nreq in classes["KinematicsProxy"]:
        _check_method(KinematicsProxy, name, nreq)
    # module-level functions exist by name
    for fn in ("query_q", "query_ja"):
        assert callable(getattr(interface_mod, fn))


def test_no_unexplained_exceptions():
    """Every exception entry refers to a real reference name (keeps the
    table honest as the reference inventory is re-checked each round)."""
    classes_m, functions_m = _public_names(REF_MODEL)
    classes_i, functions_i = _public_names(REF_INTERFACE)
    known = set()
    for methods in list(classes_m.values()) + list(classes_i.values()):
        known |= {n for n, _ in methods}
    known |= {n for n, _ in functions_m} | {n for n, _ in functions_i}
    known |= set(classes_m) | set(classes_i)
    for name in EXCEPTIONS:
        assert name in known, name
