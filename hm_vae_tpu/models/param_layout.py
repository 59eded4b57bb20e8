"""Compact (mask-live-only) storage for SkeletonConv weights.

The bs-8 train step is parameter-HBM-traffic bound (BASELINE.md round-2
decomposition: ~590 MB/step ≈ the measured 704 µs at v5e's 819 GB/s), and
21% of the dense conv parameters are structurally dead: the neighbourhood
mask (``/root/reference/skeleton.py:58-61``) zeroes them on every call, their
gradients are identically zero, and they never influence any output.  The
reference still pays Adam + weight-decay traffic on them (torch updates every
tensor entry); so did our dense layout.

``param_layout="compact"`` stores only the mask-live entries of each masked
conv weight as a ``(L, K)`` tensor (``weight_c``; L = number of live
(out_channel, in_channel) pairs, row-major) and expands to the dense
``(C_out, C_in, K)`` weight at apply time by a constant-index gather whose
dead entries are exact zeros — so no mask multiply is needed at all.  This is
*function-exact* vs the dense layout: outputs, gradients of live entries, and
the Adam trajectory of every live entry are identical (Adam is elementwise);
only the dead entries — which cannot affect anything — cease to exist.  What
it buys on the len-64 flagship: the Adam chain shrinks from 52.5 MB to
41.4 MB of f32 parameters (7 HBM accesses/step each) and the mask-multiply
read/write traffic disappears, together ~100 MB of the ~590 MB/step.

Fully-dense levels (the deepest two convs — at 7 edges a skeleton_dist-2
neighbourhood spans the whole graph, so ``mask.all()``) keep the plain dense
``weight`` even under ``compact``: a gather would move the same bytes for
nothing.  The dense path now skips the mask multiply for them too.

The expand/contract pair uses a ``custom_vjp`` so BOTH directions are
gathers (the autodiff transpose of a gather is a scatter-add, which TPUs
serialize badly — see the FK redesign notes in BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import ModelConfig
from .structure import ConvSpec, get_structure, get_trajectory_structure

PARAM_LAYOUTS = ("dense", "compact")


def validate_layout(layout: str) -> None:
    if layout not in PARAM_LAYOUTS:
        raise ValueError(
            f"unsupported param_layout: {layout!r} (expected one of "
            f"{PARAM_LAYOUTS})")


def is_compact_spec(spec: ConvSpec, layout: str) -> bool:
    """Whether this conv stores ``weight_c`` under the given layout."""
    validate_layout(layout)
    return layout == "compact" and not spec.mask.all()


@dataclasses.dataclass(eq=False)
class CompactMeta:
    n_live: int                 # L
    gather_idx: np.ndarray      # (C_out*C_in,) int32 in [0..L]; L = zero row
    live_flat: np.ndarray       # (L,) int32 positions into C_out*C_in
    row_bounds: np.ndarray      # (L,) per-live-row kaiming-uniform bound
    # run (block) granularity for the lane-friendly gather: the mask is
    # per-edge-pair (skeleton.py:58-61 expands `neighbor` by channels-per-
    # edge), so live entries form contiguous runs of `run_w` columns per
    # (out_channel, in_edge).  Gathering (run_w, K) blocks instead of
    # single (K,) rows moves ~run_w*K contiguous elements per gather row
    # (lane-friendly) and cuts the row count by run_w.  `run_w=1` is the
    # exact row-granularity fallback for an irregular mask.
    run_w: int                  # columns per run (in-channels per in-edge)
    n_runs: int                 # R — live runs; L == R * run_w
    run_gather_idx: np.ndarray  # (C_out * C_in // run_w,) int32 in [0..R]
    live_runs: np.ndarray       # (R,) int32 positions into C_out*C_in//run_w


def _column_block_width(mask: np.ndarray) -> int:
    """Largest p dividing C_in such that mask columns are constant within
    each width-p block — the in-channels-per-edge granularity of a
    SkeletonConv neighbourhood mask (1 for an irregular mask)."""
    c_in = mask.shape[1]
    for p in range(c_in, 0, -1):
        if c_in % p:
            continue
        blocks = mask.reshape(mask.shape[0], c_in // p, p)
        if (blocks == blocks[:, :, :1]).all():
            return p
    return 1


@functools.lru_cache(maxsize=None)
def compact_meta(spec: ConvSpec) -> CompactMeta:
    """Constant index maps for one conv spec (identity-cached: specs live in
    the lru-cached structure objects)."""
    mask = spec.mask.astype(bool)                      # (C_out, C_in)
    live_flat = np.flatnonzero(mask.ravel()).astype(np.int32)
    n_live = live_flat.size
    gather_idx = np.full(mask.size, n_live, dtype=np.int32)
    gather_idx[live_flat] = np.arange(n_live, dtype=np.int32)
    out_cpe = spec.out_channels // spec.n_edges
    per_out = np.repeat(spec.block_bounds, out_cpe)    # (C_out,)
    rows_o = live_flat // spec.in_channels
    run_w = _column_block_width(mask)
    nb = mask.reshape(mask.shape[0], -1, run_w)[:, :, 0]   # (C_out, n_in_e)
    live_runs = np.flatnonzero(nb.ravel()).astype(np.int32)
    n_runs = live_runs.size
    run_gather_idx = np.full(nb.size, n_runs, dtype=np.int32)
    run_gather_idx[live_runs] = np.arange(n_runs, dtype=np.int32)
    # weight_c row-major order == run-major order: within an out-channel,
    # live columns ascend, and each in-edge contributes run_w consecutive
    # columns, so rows r*run_w .. (r+1)*run_w of weight_c ARE run r.
    assert n_live == n_runs * run_w
    return CompactMeta(
        n_live=n_live, gather_idx=gather_idx, live_flat=live_flat,
        row_bounds=per_out[rows_o].astype(np.float32),
        run_w=run_w, n_runs=n_runs, run_gather_idx=run_gather_idx,
        live_runs=live_runs,
    )


@functools.lru_cache(maxsize=None)
def expander(spec: ConvSpec):
    """(L, K) -> (C_out, C_in, K) dense weight with exact-zero dead entries.

    custom_vjp: the backward pass is the contracting gather (dense grad at the
    live positions), not autodiff's scatter-add transpose.  Both directions
    gather at RUN granularity — (run_w, K) contiguous blocks per row — after
    the round-4 chip measurement showed (K,)-row gathers (60 B/row, ~1.4 M
    rows on the big levels) serializing far below the 128-lane VPU width
    (BASELINE.md, compact-layout chip section).  Storage order is unchanged:
    the run reshape is a view of the same row-major live entries.
    """
    meta = compact_meta(spec)
    shape = (spec.out_channels, spec.in_channels)

    @jax.custom_vjp
    def expand(w_c: jnp.ndarray) -> jnp.ndarray:
        k = w_c.shape[-1]
        wc3 = w_c.reshape(meta.n_runs, meta.run_w, k)
        wpad = jnp.concatenate(
            [wc3, jnp.zeros((1, meta.run_w, k), w_c.dtype)], axis=0)
        idx = jnp.asarray(meta.run_gather_idx)
        return jnp.take(wpad, idx, axis=0).reshape(*shape, k)

    def fwd(w_c):
        return expand(w_c), None

    def bwd(_, g):
        k = g.shape[-1]
        g3 = g.reshape(-1, meta.run_w, k)
        live = jnp.asarray(meta.live_runs)
        return (jnp.take(g3, live, axis=0).reshape(meta.n_live, k),)

    expand.defvjp(fwd, bwd)
    return expand


def compact_from_dense(weight: np.ndarray, spec: ConvSpec) -> np.ndarray:
    """Dense (C_out, C_in, K) -> compact (L, K): live rows, row-major order.

    Dead entries are dropped — in torch checkpoints they hold decayed init
    junk that the mask zeroes at every call (``skeleton.py:96-100``)."""
    w = np.asarray(weight)
    return w[spec.mask.astype(bool)]


def dense_from_compact(w_c: np.ndarray, spec: ConvSpec) -> np.ndarray:
    """Compact (L, K) -> dense (C_out, C_in, K) with exact-zero dead rows."""
    w_c = np.asarray(w_c)
    k = w_c.shape[-1]
    dense = np.zeros((spec.out_channels * spec.in_channels, k), w_c.dtype)
    meta = compact_meta(spec)
    dense[meta.live_flat] = w_c
    return dense.reshape(spec.out_channels, spec.in_channels, k)


def conv_specs_for(cfg: ModelConfig) -> Dict[str, Dict[str, ConvSpec]]:
    """Map top-level module -> conv param-collection name -> spec."""
    if cfg.model_name == "TrajectoryModel":
        st = get_trajectory_structure(cfg)
        return {"encoder": {f"conv_{i}": lvl.conv
                            for i, lvl in enumerate(st.levels)}}
    st = get_structure(cfg)
    enc: Dict[str, ConvSpec] = {}
    dec: Dict[str, ConvSpec] = {}
    for i, lvl in enumerate(st.encoder_levels):
        enc[f"conv_{i}"] = lvl.conv
        for e, espec in enumerate(lvl.extra_convs):
            enc[f"conv_{i}_extra_{e}"] = espec
    for i, lvl in enumerate(st.decoder_levels):
        dec[f"conv_{i}"] = lvl.conv
        for e, espec in enumerate(lvl.extra_convs):
            dec[f"conv_{i}_extra_{e}"] = espec
    return {"encoder": enc, "decoder": dec}


def params_layout(params) -> str:
    """Detect the conv weight layout of a parameter tree."""
    if isinstance(params, dict) and set(params) == {"params"}:
        return params_layout(params["params"])
    found = {"compact" if "weight_c" in sub else "dense"
             for top in params.values() if isinstance(top, dict)
             for name, sub in top.items()
             if isinstance(sub, dict) and ("weight" in sub or "weight_c" in sub)
             and name.startswith("conv_")}
    # all-dense levels keep "weight" under compact, so compact wins if present
    return "compact" if "compact" in found else "dense"


def _looks_like_params(obj) -> bool:
    """A dict that is (or wraps) a model param-structured tree: a top-level
    module whose ``conv_*`` children carry ``weight``/``weight_c`` leaves.
    Matches the params tree itself AND any tree mirroring its structure
    (Adam ``mu``/``nu`` moments, per-leaf count trees)."""
    if not isinstance(obj, dict):
        return False
    if set(obj) == {"params"}:
        return _looks_like_params(obj["params"])
    for sub in obj.values():
        if isinstance(sub, dict):
            for name, leaf in sub.items():
                if (name.startswith("conv_") and isinstance(leaf, dict)
                        and ("weight" in leaf or "weight_c" in leaf)):
                    return True
    return False


def convert_state(obj, cfg: ModelConfig, to_layout: str):
    """Recursively convert every param-structured subtree of an arbitrary
    pytree (TrainState, optax chain states, ...) between conv layouts.

    Adam moments convert exactly like weights (their live entries are the
    function-relevant state; mask-dead moment entries exist only because
    weight decay moves dead DENSE weights — they influence nothing and
    rebuild as zeros).  Per-leaf scalar trees are renamed, values kept.
    """
    validate_layout(to_layout)
    if _looks_like_params(obj):
        return convert_conv_params(obj, cfg, to_layout)
    if isinstance(obj, dict):
        return {k: convert_state(v, cfg, to_layout) for k, v in obj.items()}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):     # NamedTuple
        return type(obj)(*(convert_state(v, cfg, to_layout) for v in obj))
    if isinstance(obj, (list, tuple)):
        return type(obj)(convert_state(v, cfg, to_layout) for v in obj)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(obj, **{
            f.name: convert_state(getattr(obj, f.name), cfg, to_layout)
            for f in dataclasses.fields(obj)})
    return obj


def tree_has_key(tree, key: str) -> bool:
    """Duck-typed nested-mapping search (works on orbax metadata trees)."""
    keys = getattr(tree, "keys", None)
    if keys is None:
        return False
    for k in tree.keys():
        if k == key:
            return True
        try:
            sub = tree[k]
        except Exception:
            continue
        if tree_has_key(sub, key):
            return True
    return False


def convert_conv_params(params, cfg: ModelConfig, to_layout: str):
    """Convert a model param tree's conv weights between layouts.

    Exact both ways for anything the function can observe: dense->compact
    drops only mask-dead entries; compact->dense rebuilds them as zeros.
    Non-conv leaves (biases, Dense heads) pass through untouched.  Accepts
    either the inner params dict (``{"encoder": ..., ...}``) or the flax
    variables wrapper (``{"params": {...}}``, the Trainer's ``state.params``).
    """
    validate_layout(to_layout)
    if isinstance(params, dict) and set(params) == {"params"}:
        return {"params": convert_conv_params(params["params"], cfg,
                                              to_layout)}
    specs = conv_specs_for(cfg)
    out = {}
    for top, sub in params.items():
        spec_map = specs.get(top)
        if spec_map is None or not isinstance(sub, dict):
            out[top] = sub
            continue
        new_sub = {}
        for name, leaf in sub.items():
            spec = spec_map.get(name)
            if spec is None or not isinstance(leaf, dict):
                new_sub[name] = leaf
                continue
            leaf = dict(leaf)
            # shape-aware: weights and Adam moment trees carry full arrays
            # (dense ndim 3 / compact ndim 2) and convert; per-leaf scalar
            # trees (torch_adam_l2's ``counts``) mirror the params STRUCTURE
            # only, so their leaf is renamed but the scalar passes through
            if is_compact_spec(spec, to_layout):
                if "weight" in leaf:
                    w = leaf.pop("weight")
                    leaf["weight_c"] = (compact_from_dense(w, spec)
                                        if np.ndim(w) == 3 else w)
            else:
                if "weight_c" in leaf:
                    w = leaf.pop("weight_c")
                    leaf["weight"] = (dense_from_compact(w, spec)
                                      if np.ndim(w) == 2 else w)
            new_sub[name] = leaf
        out[top] = new_sub
    return out
