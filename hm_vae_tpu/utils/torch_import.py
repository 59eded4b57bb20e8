"""Import PyTorch reference checkpoints into hm_vae_tpu parameter trees.

The reference saves ``{'state_dict': model.state_dict()}`` to ``gen_*.pt``
(``trainer_motion_vae.py:119-127``).  This module maps those names/layouts to
this framework's flax params so a user can bring reference-trained weights:

- ``enc.layers.{i}.0.weight/bias``      -> ``encoder/conv_{i}`` (same layout)
- ``enc.latent_enc_layers.{i}.weight``  -> ``encoder/latent_head_{i}/kernel``
  (transposed: torch Linear stores (out, in), flax Dense (in, out))
- ``dec.layers.{i}.{conv_idx}.weight``  -> ``decoder/conv_{i}`` where
  ``conv_idx = 1 + upsample`` (the conv sits after the optional Upsample and
  the Unpool inside the reference's Sequential)
- ``dec.latent_dec_layers.{i}.weight``  -> ``decoder/latent_dec_{i}/kernel``
- trajectory: ``enc.layers.{i}.0.*`` -> ``encoder/conv_{i}``,
  ``fc_mapping.*`` -> ``fc_mapping``

Constant buffers in the reference state dict (conv ``mask``, pool/unpool
``weight``) are validated against this framework's derived constants when
present — a config mismatch fails loudly instead of silently mis-loading.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..models.structure import get_structure, get_trajectory_structure
from ..utils.config import ModelConfig


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``gen_*.pt`` into a flat name->numpy dict."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


def _check_constant(sd: Mapping[str, np.ndarray], name: str, ours: np.ndarray):
    if name in sd:
        theirs = np.asarray(sd[name])
        if theirs.shape != ours.shape or not np.allclose(theirs, ours, atol=1e-5):
            raise ValueError(
                f"checkpoint constant {name} does not match this config "
                f"(shape {theirs.shape} vs {ours.shape}) — wrong architecture?")


def import_hmvae_params(sd: Mapping[str, np.ndarray],
                        cfg: ModelConfig) -> Dict:
    """Reference TwoHierSAVAEModel state dict -> flax variables dict."""
    st = get_structure(cfg)
    nl = cfg.num_layers
    enc: Dict[str, Dict[str, np.ndarray]] = {}
    dec: Dict[str, Dict[str, np.ndarray]] = {}

    E = cfg.extra_conv
    for i in range(nl):
        lvl = st.encoder_levels[i]
        # Sequential layout: [extra_conv x E, conv, pool, leaky]
        # (seq_two_hier_sa_vae.py:94-133)
        for e in range(E):
            enc[f"conv_{i}_extra_{e}"] = {
                "weight": np.asarray(sd[f"enc.layers.{i}.{e}.weight"],
                                     np.float32),
                "bias": np.asarray(sd[f"enc.layers.{i}.{e}.bias"], np.float32),
            }
        conv = {"weight": np.asarray(sd[f"enc.layers.{i}.{E}.weight"],
                                     np.float32)}
        if lvl.conv.bias:
            conv["bias"] = np.asarray(sd[f"enc.layers.{i}.{E}.bias"],
                                      np.float32)
        _check_constant(sd, f"enc.layers.{i}.{E}.mask",
                        np.broadcast_to(lvl.conv.mask[:, :, None],
                                        conv["weight"].shape))
        _check_constant(sd, f"enc.layers.{i}.{E + 1}.weight", lvl.pool_matrix)
        enc[f"conv_{i}"] = conv
        enc[f"latent_head_{i}"] = {
            "kernel": np.asarray(sd[f"enc.latent_enc_layers.{i}.weight"],
                                 np.float32).T,
            "bias": np.asarray(sd[f"enc.latent_enc_layers.{i}.bias"],
                               np.float32),
        }

    for i in range(nl):
        lvl = st.decoder_levels[i]
        # Sequential layout: [upsample?, unpool, extra_conv x E, conv, leaky?]
        # (seq_two_hier_sa_vae.py:233-260)
        unpool_idx = 1 if lvl.upsample else 0
        conv_idx = unpool_idx + 1 + E
        for e in range(E):
            ex = {"weight": np.asarray(
                sd[f"dec.layers.{i}.{unpool_idx + 1 + e}.weight"], np.float32)}
            if lvl.conv.bias:
                ex["bias"] = np.asarray(
                    sd[f"dec.layers.{i}.{unpool_idx + 1 + e}.bias"], np.float32)
            dec[f"conv_{i}_extra_{e}"] = ex
        conv = {"weight": np.asarray(
            sd[f"dec.layers.{i}.{conv_idx}.weight"], np.float32)}
        if lvl.conv.bias:
            conv["bias"] = np.asarray(
                sd[f"dec.layers.{i}.{conv_idx}.bias"], np.float32)
        _check_constant(sd, f"dec.unpools.{i}.weight", lvl.unpool_matrix)
        dec[f"conv_{i}"] = conv
        dec[f"latent_dec_{i}"] = {
            "kernel": np.asarray(sd[f"dec.latent_dec_layers.{i}.weight"],
                                 np.float32).T,
            "bias": np.asarray(sd[f"dec.latent_dec_layers.{i}.bias"],
                               np.float32),
        }

    params = {"encoder": enc, "decoder": dec}
    if cfg.param_layout != "dense":
        from ..models.param_layout import convert_conv_params
        params = convert_conv_params(params, cfg, cfg.param_layout)
    return {"params": params}


def export_hmvae_params(variables: Mapping, cfg: ModelConfig
                        ) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> reference-style state dict.

    Includes the constant mask/pool/unpool buffers so the emitted dict loads
    into a reference-architecture torch model directly.  Compact-layout
    trees (``models/param_layout.py``) are densified first — mask-dead
    entries export as exact zeros, which the reference's mask multiply makes
    indistinguishable from any other value.
    """
    st = get_structure(cfg)
    nl = cfg.num_layers
    E = cfg.extra_conv
    from ..models.param_layout import convert_conv_params
    params = convert_conv_params(dict(variables["params"]), cfg, "dense")
    sd: Dict[str, np.ndarray] = {}
    for i in range(nl):
        lvl = st.encoder_levels[i]
        for e, espec in enumerate(lvl.extra_convs):
            ex = params["encoder"][f"conv_{i}_extra_{e}"]
            ew = np.asarray(ex["weight"], np.float32)
            sd[f"enc.layers.{i}.{e}.weight"] = ew
            sd[f"enc.layers.{i}.{e}.bias"] = np.asarray(ex["bias"], np.float32)
            sd[f"enc.layers.{i}.{e}.mask"] = np.broadcast_to(
                espec.mask[:, :, None], ew.shape).astype(np.float32)
        conv = params["encoder"][f"conv_{i}"]
        w = np.asarray(conv["weight"], np.float32)
        sd[f"enc.layers.{i}.{E}.weight"] = w
        if "bias" in conv:
            sd[f"enc.layers.{i}.{E}.bias"] = np.asarray(conv["bias"], np.float32)
        sd[f"enc.layers.{i}.{E}.mask"] = np.broadcast_to(
            lvl.conv.mask[:, :, None], w.shape).astype(np.float32)
        sd[f"enc.layers.{i}.{E + 1}.weight"] = lvl.pool_matrix
        head = params["encoder"][f"latent_head_{i}"]
        sd[f"enc.latent_enc_layers.{i}.weight"] = np.asarray(
            head["kernel"], np.float32).T
        sd[f"enc.latent_enc_layers.{i}.bias"] = np.asarray(
            head["bias"], np.float32)
    for i in range(nl):
        lvl = st.decoder_levels[i]
        unpool_idx = 1 if lvl.upsample else 0
        conv_idx = unpool_idx + 1 + E
        for e, espec in enumerate(lvl.extra_convs):
            ex = params["decoder"][f"conv_{i}_extra_{e}"]
            ew = np.asarray(ex["weight"], np.float32)
            sd[f"dec.layers.{i}.{unpool_idx + 1 + e}.weight"] = ew
            if "bias" in ex:
                sd[f"dec.layers.{i}.{unpool_idx + 1 + e}.bias"] = np.asarray(
                    ex["bias"], np.float32)
            sd[f"dec.layers.{i}.{unpool_idx + 1 + e}.mask"] = np.broadcast_to(
                espec.mask[:, :, None], ew.shape).astype(np.float32)
        conv = params["decoder"][f"conv_{i}"]
        sd[f"dec.layers.{i}.{conv_idx}.weight"] = np.asarray(
            conv["weight"], np.float32)
        if "bias" in conv:
            sd[f"dec.layers.{i}.{conv_idx}.bias"] = np.asarray(
                conv["bias"], np.float32)
        sd[f"dec.layers.{i}.{conv_idx}.mask"] = np.broadcast_to(
            lvl.conv.mask[:, :, None],
            np.asarray(conv["weight"]).shape).astype(np.float32)
        sd[f"dec.unpools.{i}.weight"] = lvl.unpool_matrix
        sd[f"dec.layers.{i}.{unpool_idx}.weight"] = lvl.unpool_matrix
        head = params["decoder"][f"latent_dec_{i}"]
        sd[f"dec.latent_dec_layers.{i}.weight"] = np.asarray(
            head["kernel"], np.float32).T
        sd[f"dec.latent_dec_layers.{i}.bias"] = np.asarray(
            head["bias"], np.float32)
    return sd


def import_trajectory_params(sd: Mapping[str, np.ndarray],
                             cfg: ModelConfig) -> Dict:
    """Reference TrajectoryModel state dict -> flax variables dict."""
    st = get_trajectory_structure(cfg)
    enc: Dict[str, Dict[str, np.ndarray]] = {}
    for i, lvl in enumerate(st.levels):
        conv = {"weight": np.asarray(sd[f"enc.layers.{i}.0.weight"], np.float32),
                "bias": np.asarray(sd[f"enc.layers.{i}.0.bias"], np.float32)}
        _check_constant(sd, f"enc.layers.{i}.1.weight", lvl.pool_matrix)
        enc[f"conv_{i}"] = conv
    params = {
        "encoder": enc,
        "fc_mapping": {
            "kernel": np.asarray(sd["fc_mapping.weight"], np.float32).T,
            "bias": np.asarray(sd["fc_mapping.bias"], np.float32),
        },
    }
    if cfg.param_layout != "dense":
        from ..models.param_layout import convert_conv_params
        params = convert_conv_params(params, cfg, cfg.param_layout)
    return {"params": params}
