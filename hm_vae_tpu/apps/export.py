"""AOT model export for serving: versioned StableHLO artifacts.

The reference has no deployment story at all — serving its model means
carrying the whole PyTorch codebase (`seq_two_hier_sa_vae.py` + `skeleton.py`
+ asset paths) into the serving process.  Here the flagship inference
surfaces are exported once via ``jax.export`` into self-contained StableHLO
artifacts with the trained parameters baked in as constants:

- ``reconstruct``: rot6d (b, T, 24, 6) -> (rot6d, rotmat, fk positions) —
  the posterior-mean reconstruction pipeline (encode -> mean z -> decode ->
  6D->rotmat -> FK), i.e. the reference's ``test``/``get_mean_rec_res`` path
  (``seq_two_hier_sa_vae.py:560-642``) as one compiled program;
- ``encode_mean``: rot6d -> tuple of per-level posterior means;
- ``decode``: tuple of per-level z -> (rot6d, rotmat, fk positions) — prior
  sampling in serving is client-side N(0, I) noise fed to this (deep +
  shallow levels; zeros for the unconsumed middles, ``:798-817``);
- ``trajectory``: FK positions (b, t, 24, 3) -> unnormalised root velocity
  (b, t, 3) — ``sampled_seq_test``'s core (``trajectory_pred_model.py:399-440``)
  with the dataset mean/std baked in.

Every function is exported with a **symbolic batch dimension** (and a
symbolic time dimension for the fully-convolutional trajectory model), and
lowered for BOTH cpu and tpu, so one artifact serves batch-1 latency and
batch-N throughput on either platform.  The serving process needs jax only —
no flax, no model code, no config, no asset files:

    from hm_vae_tpu.apps.export import load_exported
    fns = load_exported("exported/")
    out6d, rotmat, pose = fns["reconstruct"].call(batch_rot6d)

Artifacts are one ``<name>.stablehlo`` file per function plus a
``manifest.json`` recording shapes, dtypes, platforms, calling-convention
version and a config snapshot — enough for a serving frontend to validate
requests without deserializing anything.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from .inference import make_inference_fns
from ..models.hm_vae import HMVAE
from ..models.structure import get_structure
from ..models.trajectory import TrajectoryModel, make_root_v_fn
from ..utils.config import Config

MANIFEST_NAME = "manifest.json"
_EXT = ".stablehlo"

# Both lowerings live in one artifact: cpu for tests/local serving, tpu for
# production.  jax.export cross-lowers without the target hardware present.
DEFAULT_PLATFORMS = ("cpu", "tpu")


def _spec(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


def _export_one(fn: Callable, specs, platforms) -> jexport.Exported:
    return jexport.export(jax.jit(fn), platforms=list(platforms))(*specs)


def _describe(exp: jexport.Exported) -> Dict:
    return {
        "in_avals": [str(a) for a in exp.in_avals],
        "out_avals": [str(a) for a in exp.out_avals],
        "platforms": list(exp.platforms),
        "calling_convention_version": exp.calling_convention_version,
    }


def hmvae_export_functions(model: HMVAE, params, cfg: Config,
                           batch_symbol: str = "b") -> Dict[str, tuple]:
    """Build the (fn, arg_specs) table for the HMVAE serving surface.

    The functions are the SAME params-closed callables
    :class:`~hm_vae_tpu.apps.inference.VAEInference` jits for in-process use
    (``make_inference_fns``) — one source of truth, so a change to the
    inference pipeline automatically flows into newly-exported artifacts.
    Closed-over parameters become constants in the StableHLO module.
    """
    T = cfg.model.train_seq_len
    J = cfg.model.n_joints
    st = get_structure(cfg.model)
    (b,) = jexport.symbolic_shape(batch_symbol)
    fns = make_inference_fns(model, params, cfg)

    x_spec = _spec((b, T, J, 6))
    z_specs = tuple(_spec((b, st.z_edges[i], st.z_dims[i]))
                    for i in range(cfg.model.num_layers))
    return {
        "reconstruct": (fns["reconstruct"], (x_spec,)),
        "encode_mean": (fns["encode_mean"], (x_spec,)),
        "decode": (fns["decode_full"], (z_specs,)),
    }


def trajectory_export_function(model: TrajectoryModel, params,
                               mean_std: np.ndarray,
                               time_symbol: str = "t",
                               min_time: int = 16) -> tuple:
    """(fn, arg_specs) for the trajectory model with a symbolic time axis.

    The encoder is fully convolutional (stride 1 everywhere), so one export
    serves any sequence length >= ``min_time`` (the floor keeps the reflect
    padding of the kernel-31 convs valid).  The function is the SAME
    params-closed callable ``TrajectoryRunner`` jits in-process
    (``make_root_v_fn``) — dataset stats baked in.
    """
    b, t = jexport.symbolic_shape(
        f"b, {time_symbol}",
        constraints=[f"{time_symbol} >= {min_time}"])
    return make_root_v_fn(model, params, mean_std), (_spec((b, t, 24, 3)),)


def _cast_floating(tree, dtype):
    """Cast every floating leaf of a pytree (non-float leaves untouched)."""
    def c(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(c, tree)


def export_bundle(out_dir: str, model: HMVAE, params, cfg: Config,
                  trajectory: Optional[tuple] = None,
                  platforms=DEFAULT_PLATFORMS,
                  serve_dtype: str = "float32") -> Dict:
    """Export the serving surface to ``out_dir``; returns the manifest dict.

    ``trajectory``: optional ``(traj_model, traj_params, mean_std)`` to add
    the root-trajectory predictor to the bundle.

    ``serve_dtype="bfloat16"``: a serving-optimised bundle — parameters are
    baked in as bf16 constants (half the artifact size and half the weight
    HBM traffic on chip, which bounds small-batch serving latency) and the
    conv stack computes in bf16 (``ModelConfig.compute_dtype`` semantics);
    inputs/outputs and the FK/rotation chain stay f32.  Expect ~1e-2
    relative output deviation vs the f32 bundle (bf16 has 8 mantissa bits).
    """
    os.makedirs(out_dir, exist_ok=True)
    if serve_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unsupported serve_dtype: {serve_dtype}")
    if serve_dtype == "bfloat16":
        params = _cast_floating(params, jnp.bfloat16)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype="bfloat16"))
        model = HMVAE(cfg.model)  # rebind: compute_dtype lives on the module
    table = hmvae_export_functions(model, params, cfg)
    if trajectory is not None:
        t_model, t_params, mean_std = trajectory
        if serve_dtype == "bfloat16":
            t_params = _cast_floating(t_params, jnp.bfloat16)
            t_model = TrajectoryModel(dataclasses.replace(
                t_model.cfg, compute_dtype="bfloat16"))
        table["trajectory"] = trajectory_export_function(
            t_model, t_params, mean_std)

    manifest: Dict = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "serve_dtype": serve_dtype,
        "functions": {},
        "config": dataclasses.asdict(cfg.model),
        "train_seq_len": cfg.model.train_seq_len,
    }
    for name, (fn, specs) in table.items():
        exp = _export_one(fn, specs, platforms)
        blob = exp.serialize()
        with open(os.path.join(out_dir, name + _EXT), "wb") as f:
            f.write(blob)
        manifest["functions"][name] = dict(_describe(exp),
                                           bytes=len(blob))
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_exported(out_dir: str) -> Dict[str, jexport.Exported]:
    """Deserialize every function in a bundle; keys match the manifest.

    The returned ``Exported`` objects are called as ``fns[name].call(*args)``
    and are jit-compatible (they can be composed inside larger jitted
    programs).
    """
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    fns = {}
    for name in manifest["functions"]:
        with open(os.path.join(out_dir, name + _EXT), "rb") as f:
            fns[name] = jexport.deserialize(f.read())
    return fns
