"""Typed configuration schema with YAML compatibility.

The reference passes a raw ``yaml.load`` dict around and crashes at use-sites on
missing keys (``utils_common.py:123-125``; many YAML keys are never read — see
SURVEY.md §5.6).  Here every key that is actually consumed becomes a typed field
with a default; unknown YAML keys are accepted and ignored (with a warning) so
the reference's config files load unchanged.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict

import yaml

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters (consumed by models/structure.py).

    Field meanings mirror the YAML keys of the reference configs
    (``configs/len64_no_aug_hm_vae.yaml`` etc.).
    """

    model_name: str = "TwoHierSAVAEModel"
    n_joints: int = 24
    input_dim: int = 6
    output_dim: int = 6
    latent_d: int = 24
    shallow_latent_d: int = 12
    num_layers: int = 4
    skeleton_dist: int = 2
    skeleton_pool: str = "mean"
    extra_conv: int = 0
    padding_mode: str = "reflection"
    kernel_size: int = 15
    upsampling: str = "linear"
    train_seq_len: int = 64
    max_input_timesteps: int = 300
    # conv weight storage: "dense" (reference layout — (C_out, C_in, K) with
    # the neighbourhood mask applied at call time) or "compact" (only the
    # mask-live rows are stored; function-exact, ~21% less parameter HBM
    # traffic on the len-64 model — models/param_layout.py).  Checkpoints
    # written under either layout load into either (trainer.load_params
    # converts); torch import/export always speaks dense.
    param_layout: str = "dense"
    # low-rank test-time adapter on the DECODER convs (latent_opt.finetune_
    # scope="lora"): rank of the per-conv (A, B) factor pair whose delta is
    # added IN FOLDED WEIGHT SPACE via a split conv — out = conv(x, w_folded)
    # + A @ conv(x, B).  0 (default, incl. all training) declares no extra
    # params; the latent-opt engine sets it internally when the solve asks
    # for the lora scope.  See apps/latent_opt.py.
    lora_rank: int = 0
    # trajectory model only
    # "float32" | "bfloat16" conv compute (f32 master params either way)
    compute_dtype: str = "float32"
    trajectory_input_joint_pos: bool = True
    use_accumulation_root_v: bool = True


@dataclasses.dataclass(frozen=True)
class LossConfig:
    rec_6d_w: float = 1.0
    rec_rot_w: float = 1.0
    rec_pose_w: float = 10.0
    rec_joint_pos_w: float = 0.0
    rec_root_v_w: float = 0.0
    rec_root_trans_w: float = 0.0
    rec_linear_v_w: float = 0.0
    rec_angular_v_w: float = 0.0
    kl_w: float = 0.003
    shallow_kl_w: float = 0.003
    # step at which the shallow KL/latent joins training (two-stage curriculum,
    # seq_two_hier_sa_vae.py:327-333, 380-385)
    iteration_interval: int = 50000


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    weight_decay: float = 1e-4
    # weights_init scheme for the latent Dense heads:
    # gaussian | xavier | kaiming | orthogonal | default
    # (trainer_motion_vae.py:264-283; dispatched in models.hm_vae.dense_kernel_init)
    init: str = "kaiming"
    lr_policy: str = "step"          # constant | step | mstep
    step_size: Any = 100000          # int, or list for mstep
    gamma: float = 0.3
    max_iter: int = 250000
    batch_size: int = 8
    # Adam moment storage dtype.  The bs-8 train step is parameter-HBM-traffic
    # bound (see BASELINE.md round-2 decomposition); "bfloat16" halves the
    # moment traffic (~100 MB/step on the len-64 model) at a small, tested
    # cost in update precision.  "float32" (default) is bit-exact with the
    # torch Adam chain.
    moment_dtype: str = "float32"
    # Parameter STORAGE dtype.  "bfloat16" stores the whole param tree in
    # bf16 — forward/backward read half the weight bytes and gradients are
    # written/read in bf16 — while the Adam update math stays f32 and the
    # new parameters are written back with STOCHASTIC ROUNDING (unbiased:
    # E[round(x)] = x), so sub-ulp updates (lr 1e-4 steps against O(0.1)
    # weights are ~10x below the bf16 ulp) accumulate in expectation instead
    # of being lost to round-to-nearest.  No f32 master copy is kept — that
    # is the point: the param-HBM-bound bs-8 step sheds the master's 2P
    # read+write too (BASELINE.md round-5 byte audit).  Composes with
    # moment_dtype=bfloat16 (the max-perf mode).  Convergence-tested against
    # the f32 trajectory in tests/test_train_step.py; requires
    # none_grad_skip=True (the default — the SR write lives in the fused
    # torch-semantics optimizer).
    param_dtype: str = "float32"
    # torch skips a parameter whose .grad is None — no moment update, no
    # weight decay, and a PER-PARAMETER Adam step count that only starts
    # once a real gradient arrives.  In the reference this matters: below
    # the KL-curriculum boundary the shallow + middle latent heads are fully
    # detached (seq_two_hier_sa_vae.py:381-388), so torch leaves them FROZEN
    # AT INIT until iteration 50k, while a plain optax chain weight-decays
    # their zero-grad tensors to exact zero (measured: shallow-KL collapses
    # to 0 and memorization depth is capped — PARITY.md 10k-step compare).
    # True (default) replicates torch per-tensor: a leaf whose gradient is
    # identically zero is skipped for that step.
    none_grad_skip: bool = True


@dataclasses.dataclass(frozen=True)
class LatentOptConfig:
    """Test-time latent optimization (completion / interpolation / generation)."""

    opt_lr: float = 0.1
    opt_it: int = 150
    reg_w: float = 0.0
    reg_w_decoder: float = 1000.0
    reg_w_trajectory: float = 0.0
    opt_lr_policy: str = "step"
    opt_step_size: int = 50
    opt_gamma: float = 0.1
    interpolation_window: int = 5
    optimize_decoder: bool = True
    # clone the decoder PER WINDOW for the fine-tune phase (vmapped over the
    # batch axis), exactly the reference's per-window deepcopy semantics
    # (seq_two_hier_sa_vae.py:1343-1345 interpolation, :1685-1687 completion
    # — both inside the window loop).  False shares ONE clone across the
    # whole batched solve: cheaper (the ~190 MB/iteration weight+moment
    # traffic is shared, BASELINE.md) but couples the batched windows.
    # Per-window costs ~3x the decoder f32 bytes per window in HBM
    # (weights + 2 Adam moments, ~82 MB/window on the len-64 model).
    per_window_decoder: bool = True
    optimize_trajectory: bool = False
    # Adam moment storage dtype for the SOLVER (see OptimConfig.moment_dtype).
    # Named opt_* like the other solver knobs so a flat-yaml `moment_dtype:`
    # only touches training — without the distinct name, setting the training
    # perf mode silently degraded eval-time solves too
    opt_moment_dtype: str = "float32"
    # Storage dtype of the per-window decoder CLONE inside the solve (see
    # OptimConfig.param_dtype — same stochastic-rounding write-back).  The
    # per-window fine-tune phase is bound by clone weight+moment HBM traffic
    # (~82 MB x windows per iteration at f32, BASELINE.md); "bfloat16"
    # halves the weight share.  The frozen decoder remainder and the z
    # variables stay f32.  Quality A/B: BASELINE.md "solver bf16 clone".
    opt_param_dtype: str = "float32"
    # which decoder subtree the fine-tune phase clones/optimizes:
    #   "full"      — every decoder tensor (the reference's deepcopy; default)
    #   "lora"      — rank-`lora_rank` (A, B) adapters on every decoder conv
    #                 (delta applied in folded weight space via a split conv)
    #                 plus direct per-window clones of the conv biases and the
    #                 latent re-inflation heads.  Per-window state drops from
    #                 ~27 MB to ~1-3 MB, and — decisively — the DENSE decoder
    #                 weights stay a closure constant shared by every window,
    #                 so the dominant weight read amortizes over the whole
    #                 batch instead of replicating per window.
    #   "last_conv" — only the final skeleton-conv block (~5 of 27.6 MB on the
    #                 len-64 model): the per-window weight+moment HBM traffic
    #                 that bounds the per-window-clone solve drops ~5x
    #   "heads"     — only the latent re-inflation linears (~0.14 MB, ~200x)
    # The frozen remainder stays the trained decoder and is SHARED across
    # windows (no per-window replication, no Adam state, no weight grads).
    # Quality/cost A/B on the eval split: BASELINE.md "fine-tune scope".
    finetune_scope: str = "full"
    # rank of the lora adapters when finetune_scope="lora"
    lora_rank: int = 16
    # LR multiplier on the factor leaves (lora_a/lora_b) only — direct
    # leaves (biases, heads) keep the reference's fine-tune LR.  Adam moves
    # each element ~lr per step, so a rank-r PRODUCT delta moves ~|A||B|
    # (~25x less than a direct clone over the reference's 100 fine-tune
    # steps at opt_lr*1e-3); the multiplier restores the fine-tune phase's
    # effective step size in weight space.  Quality sweep: BASELINE.md.
    lora_lr_mult: float = 10.0
    replace_frame_with_gt: bool = True
    replace_part_with_gt: bool = True
    missing_upper_completion: bool = False
    missing_lower_completion: bool = True
    # decoder fine-tuning kicks in after this many z-only steps; the reference
    # hard-codes 50 for generation/interpolation but 100 for completion
    # (prev_epochs in seq_two_hier_sa_vae.py:1206/1403 vs :1731)
    prev_epochs: int = 50
    prev_epochs_completion: int = 100
    # also materialize the min-loss iteration's outputs (the reference tracks
    # them, seq_two_hier_sa_vae.py:1753-1757, but RETURNS the last iteration's
    # — so this defaults off; enabling costs one output-tree select/iteration)
    track_best: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_root: str = "data/processed"
    train_json: str = "train_all_amass_motion_data.json"
    val_json: str = "val_all_amass_motion_data.json"
    test_json: str = "test_all_amass_motion_data.json"
    mean_std_path: str = ""          # empty -> vendored asset
    fps_aug_flag: bool = False
    random_root_rot_flag: bool = False
    # where random_root_rot runs: True (default) = jitted per-batch device op
    # inside the Trainer's ingest (data/device_aug.py — keeps the C++ wire
    # path for aug-enabled configs, SURVEY §7 item 4); False = the
    # reference-style host numpy aug in the sampler (disables the native
    # fast path, utils_motion_vae.py:161-185 semantics either way)
    device_augment: bool = True
    use_30fps_data: bool = True
    num_prefetch: int = 2
    synthetic: bool = False          # use the synthetic generator (no AMASS on disk)
    synthetic_num_seqs: int = 64
    # native C++ window sampler for the train split (falls back to numpy when
    # g++ is unavailable or random_root_rot_flag needs the numpy aug path)
    use_native_loader: bool = True
    native_threads: int = 8
    # transfer only rot_mat (+ root_v for the trajectory model) to the device
    # and derive 6D/FK fields on-device: 2.7x less host->device bandwidth
    compact_transfer: bool = True
    # wire dtype for the host->device batch transfer: "float32" (exact) or
    # "float16" (half the bytes; rotation entries are in [-1, 1] so f16 adds
    # ~1e-4 absolute target noise — upcast to f32 on device in ingest)
    transfer_dtype: str = "float32"
    # compact-wire payload: "rot6d" (default) sends rot_6d (24x6/frame) and
    # the device reconstructs the rotation matrix by Gram-Schmidt — exact for
    # true rotations (the 6D rep IS the first two matrix columns), 33% fewer
    # wire bytes and host copy work than "rotmat" (rot_mat, 24x3x3/frame);
    # "aa" sends axis-angle (24x3/frame, half of rot6d again) from a C++
    # load-time sidecar, reconstructed on device by Rodrigues — exact to the
    # SO(3) log-map round trip (~1e-6 f32; with transfer_dtype=float16 the
    # quantisation is ~1e-3 rad of target noise, same order as f16 rot6d)
    wire_format: str = "rot6d"
    missing_joint_prob: float = 0.0


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Logging / checkpoint cadence (trainer loop)."""

    log_iter: int = 20
    validation_iter: int = 500
    image_save_iter: int = 20000
    snapshot_save_iter: int = 20000
    seed: int = 0
    # gradient steps fused into one device dispatch (lax.scan); 1 = classic
    # step-per-dispatch.  >1 amortises host latency (see train_step.make_multi_step)
    steps_per_call: int = 1
    # model-parallel degree of the Trainer's (data, model) mesh: latent Dense
    # kernels shard their features over the `model` axis
    # (parallel/sharding.py:_param_spec), remaining devices data-parallel.
    # The reference has no TP at all (DataParallel only,
    # train_motion_vae.py:49-53); 1 = data-only mesh.
    model_parallel: int = 1
    # keep only the newest N checkpoints (0 = keep all, the reference behavior)
    keep_checkpoints: int = 0
    # halt-and-restore on non-finite loss (the reference has no failure
    # detection at all, SURVEY §5.3); checked at every log point
    nan_guard: bool = True
    # jax default_matmul_precision for the whole run ("default" | "high" |
    # "highest").  On TPU "default" feeds the MXU bf16 input passes —
    # full-rate, and held-out quality matches the f32 reference (PARITY.md
    # 10k-step compare) — but in memorization regimes the bf16 gradient
    # noise floor caps how far TRAIN loss can descend; "highest" (6-pass
    # f32 emulation) recovers reference-f32 convergence depth at a compute
    # cost.  The torch reference is implicitly f32 everywhere.
    matmul_precision: str = "default"
    # overlap checkpoint writes with training: save() takes a device-side
    # snapshot (non-donated copy) and a background thread does the
    # device->host readback + orbax write while the train loop keeps
    # dispatching.  The reference's torch.save blocks the loop.
    async_checkpoint: bool = False
    # preemption safety: on SIGTERM (the TPU-VM / GCE preemption signal,
    # ~30 s grace), fit() checkpoints synchronously at the current step and
    # returns cleanly so --resume continues from it.  The reference loses
    # everything since the last periodic snapshot.  Handler is installed
    # only for the duration of fit() and only in the main thread.
    preemption_checkpoint: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    loss: LossConfig = LossConfig()
    optim: OptimConfig = OptimConfig()
    latent_opt: LatentOptConfig = LatentOptConfig()
    data: DataConfig = DataConfig()
    run: RunConfig = RunConfig()


def _fill(cls, flat: Dict[str, Any], exclude=()):
    names = {f.name for f in dataclasses.fields(cls)} - set(exclude)
    kwargs = {}
    for k, v in flat.items():
        if k in names:
            if isinstance(v, list):
                v = tuple(v)
            kwargs[k] = v
    return cls(**kwargs)


# renamed keys accepted (with a log line) from older nested configs
_SECTION_ALIASES = {"latent_opt": {"moment_dtype": "opt_moment_dtype"}}
# field names a FLAT yaml key must NOT populate in a given section (the key
# belongs to another section that shares the name): a flat `lora_rank:` is a
# solver knob (latent_opt) — routing it into ModelConfig would silently add
# adapter params to the TRAINING model (ModelConfig.lora_rank is set only by
# the latent-opt engine; nested yaml can still set it explicitly)
_FLAT_EXCLUDES = {"model": ("lora_rank",)}


def from_flat_dict(flat: Dict[str, Any]) -> Config:
    """Build a :class:`Config` from a flat reference-style YAML dict."""
    known = set()
    sections = {}
    for name, cls in (
        ("model", ModelConfig),
        ("loss", LossConfig),
        ("optim", OptimConfig),
        ("latent_opt", LatentOptConfig),
        ("data", DataConfig),
        ("run", RunConfig),
    ):
        sections[name] = _fill(cls, flat, _FLAT_EXCLUDES.get(name, ()))
        known |= {f.name for f in dataclasses.fields(cls)}
    unknown = sorted(set(flat) - known)
    if unknown:
        log.info("ignoring unused config keys: %s", unknown)
    return Config(**sections)


def load_config(path: str) -> Config:
    """Load a YAML config.

    Accepts both the reference's flat layout and a nested
    ``{model: {...}, loss: {...}, ...}`` layout.
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    section_names = {"model", "loss", "optim", "latent_opt", "data", "run"}
    if section_names & set(raw.keys()):
        nested = {}
        flat_extra = {k: v for k, v in raw.items() if k not in section_names}
        for name, cls in (
            ("model", ModelConfig), ("loss", LossConfig), ("optim", OptimConfig),
            ("latent_opt", LatentOptConfig), ("data", DataConfig), ("run", RunConfig),
        ):
            sect = dict(raw.get(name, {}) or {})
            for old, new in _SECTION_ALIASES.get(name, {}).items():
                if old in sect:
                    log.info("config: %s.%s is now %s.%s", name, old, name, new)
                    sect[new] = sect.pop(old)
            fields = {f.name for f in dataclasses.fields(cls)}
            unknown = sorted(set(sect) - fields)
            if unknown:
                log.info("ignoring unknown %s config keys: %s", name, unknown)
            merged = dict(flat_extra)
            merged.update(sect)
            # flat-key exclusions apply only to the flat extras — an explicit
            # nested `model: {lora_rank: ...}` still works
            excl = tuple(k for k in _FLAT_EXCLUDES.get(name, ())
                         if k not in sect)
            nested[name] = _fill(cls, merged, excl)
        return Config(**nested)
    return from_flat_dict(raw)
