"""Benchmark harness: len-64 hm-vae training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seqs/sec", "vs_baseline": N, ...}

Measured at the reference's own training configuration — batch 8, seq len 64,
kernel 15, full loss (two FK passes, KL curriculum), Adam + StepLR — with the
framework's production dispatch path: K=32 gradient steps per device dispatch
via ``lax.scan`` (hm_vae_tpu.train.train_step.make_multi_step).  Every scanned
step is a complete, sequential optimizer update; only the host round-trips are
amortised.  The per-step (single-dispatch) figure is reported alongside.

Baseline: the reference publishes no numbers (BASELINE.md).  Measured anchor:
the reference's own code on this host's CPU does 23.4 seqs/s
(scripts/bench_reference_torch.py, torch 2.13, 1 core).  The denominator stays
the derived A100 bound of 2000 seqs/s — at batch 8 the reference is
GPU-launch-bound: ~600-900 eager kernel launches per fwd+bwd+Adam step
(2 FK passes of 23 sequential joint matmuls each, 8 masked convs, pools,
losses, backward, optimizer) x ~5us ≈ 3-5 ms/step ⇒ 1600-2700 seqs/s; 2000 is
the midpoint and errs high (favours the baseline).  North star is
vs_baseline >= 2.0.
"""

import json
import sys
import time

BASELINE_SEQS_PER_SEC = 2000.0   # derived A100 bound, see module docstring
REFERENCE_CPU_SEQS_PER_SEC = 23.4  # measured: scripts/bench_reference_torch.py


def _bench(mstep, state, batches, rng, calls, warmup, jax, windows=1):
    # NOTE: jax.block_until_ready can return early through the axon TPU
    # relay (see BASELINE.md "Measurement trap"); a host readback of the
    # final step's loss is the only reliable fence — the state-dependency
    # chain forces every queued step to have completed.
    #
    # ``windows`` > 1 measures that many independent fenced dispatch windows
    # of ``calls`` dispatches each and returns their per-window times — the
    # caller reports the MEDIAN with the min/max band (VERDICT r4: a
    # headline delta must be classifiable as regression-vs-noise from the
    # artifact alone).
    for i in range(warmup):
        state, metrics = mstep(state, batches, jax.random.fold_in(rng, i))
    float(metrics["loss_total"])
    times = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(calls):
            state, metrics = mstep(state, batches,
                                   jax.random.fold_in(rng, 1000 + i))
        float(metrics["loss_total"])
        times.append(time.perf_counter() - t0)
    return (times if windows > 1 else times[0]), state


def bench_end_to_end(batch: int = 64, K: int = 32, windows: int = 12,
                     window_dispatches: int = 16, warmup_windows: int = 2,
                     random_root_rot: bool = False):
    """Full production path (configs/len64_production.yaml semantics): C++
    window sampler -> compact f16 axis-angle wire (on-device Rodrigues
    reconstruction) -> double-buffered device ingest -> K fused gradient
    steps per dispatch.

    Measures ``windows`` steady-state timing windows inside ONE ``fit`` call
    (one iterator, one warm pipeline — round 2's short, restart-per-window
    protocol swung 2x run to run on this 1-core relay host): the fit loop's
    log-point host readback is the per-window fence, the first
    ``warmup_windows`` are dropped (compile + pipeline fill), and the MEDIAN
    over the remaining windows is the figure of record with the min/max band
    alongside.  Includes ALL host-side work (the compute-only figures above
    exclude the loader and transfer).  Soak-tested 30k steps (BASELINE.md
    "Production-path soak")."""
    import os
    import statistics
    import tempfile

    from hm_vae_tpu.train.trainer import build_trainer
    from hm_vae_tpu.utils.config import (Config, DataConfig, ModelConfig,
                                         OptimConfig, RunConfig)

    tmp = tempfile.mkdtemp(prefix="hmvae_bench_")
    win_steps = K * window_dispatches
    cfg = Config(
        model=ModelConfig(latent_d=24, shallow_latent_d=12, kernel_size=15,
                          train_seq_len=64),
        optim=OptimConfig(batch_size=batch, max_iter=10**9),
        data=DataConfig(synthetic=True, synthetic_num_seqs=48,
                        data_root=os.path.join(tmp, "data"),
                        transfer_dtype="float16", compact_transfer=True,
                        wire_format="aa",
                        # random_root_rot=True measures the aug-enabled
                        # configs' path: C++ wire preserved, the rotation
                        # applied as a jitted per-batch device op
                        # (data/device_aug.py)
                        random_root_rot_flag=random_root_rot,
                        device_augment=True),
        run=RunConfig(steps_per_call=K, log_iter=win_steps,
                      validation_iter=10**9, snapshot_save_iter=10**9,
                      image_save_iter=10**9, nan_guard=False),
    )
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))
    marks = []

    def cb(step, _metrics):
        # fit has just host-converted the window's final metrics — a full
        # readback fence on everything queued before it
        marks.append((step, time.perf_counter()))

    trainer.fit(train_ds,
                max_iter=(warmup_windows + windows) * win_steps, log_cb=cb)
    rates = [
        batch * (s2 - s1) / (t2 - t1)
        for (s1, t1), (s2, t2) in zip(marks, marks[1:])
    ][max(warmup_windows - 1, 0):]
    return {
        "median": statistics.median(rates),
        "min": min(rates),
        "max": max(rates),
        "windows": len(rates),
    }


def bench_latent_opt(windows: int = 10, opt_it: int = 150,
                     per_window_decoder: bool = True,
                     finetune_scope: str = "full",
                     param_layout: str = "dense",
                     opt_param_dtype: str = "float32",
                     opt_moment_dtype: str = "float32") -> float:
    """The flagship application: temporal interpolation by test-time latent
    optimization (150 Adam steps incl. decoder fine-tune after 50), all
    windows in one batched jitted solve.  Returns ms per solve (isolated
    call, i.e. including one dispatch round-trip — the user-facing figure).

    ``per_window_decoder=True`` (the default config) fine-tunes a PRIVATE
    decoder clone per window — the reference's per-window deepcopy semantics
    — paying ~windows x the decoder-phase HBM traffic; False shares one
    clone (the round-2 formulation, reported alongside)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hm_vae_tpu.apps.latent_opt import init_z, make_latent_optimizer
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat, interpolation_mask
    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.utils.config import Config, LatentOptConfig, ModelConfig

    cfg = Config(
        model=ModelConfig(latent_d=24, shallow_latent_d=12, kernel_size=15,
                          train_seq_len=64, param_layout=param_layout),
        latent_opt=LatentOptConfig(opt_it=opt_it, opt_lr=0.1, opt_step_size=50,
                                   prev_epochs=50, optimize_decoder=True,
                                   per_window_decoder=per_window_decoder,
                                   finetune_scope=finetune_scope,
                                   opt_param_dtype=opt_param_dtype,
                                   opt_moment_dtype=opt_moment_dtype,
                                   interpolation_window=5))
    model = HMVAE(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 24, 6)))
    aa = jax.random.normal(jax.random.PRNGKey(1), (windows, 64, 24, 3)) * 0.3
    targets = _targets_from_rotmat(rot.aa_to_rotmat(aa))
    tmask = np.asarray(interpolation_mask(64, 5))
    mask = jnp.asarray(np.tile(tmask[None, :, None], (windows, 1, 24)))
    z = init_z(jax.random.PRNGKey(2), cfg, windows)
    zr = jax.tree.map(jnp.zeros_like, z)
    solve = make_latent_optimizer(model, cfg)
    float(solve(params, targets, mask, z, zr).final_loss.sum())  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(solve(params, targets, mask, z, zr).final_loss.sum())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _probe_backend(budget_s: float = None) -> str:
    """Bounded TPU-availability probe in a subprocess, with retry/backoff.

    The axon relay, when down, makes ``jax.devices()`` block ~25 minutes
    before raising — inside THIS process that would eat the whole bench run
    and emit no JSON line at all.  Probe in a child with a hard timeout.
    Relay outages are often *flaps* (seconds to a couple of minutes), so
    a failed probe is retried with backoff until ``budget_s`` is spent
    (default 240 s, ``HMVAE_BENCH_PROBE_BUDGET_S`` overrides) before
    falling back to CPU (honestly labelled in the output) so the driver
    always gets a result line.

    Returns the backend jax actually RESOLVED in the child
    (``jax.default_backend()``) — not the requested platform — so a
    TPU-less host that auto-selects CPU is labelled (and compile-cached)
    as CPU rather than "default".
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return "cpu"  # the user asked for CPU; not a fallback
    if budget_s is None:
        budget_s = float(os.environ.get("HMVAE_BENCH_PROBE_BUDGET_S", 240.0))
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        remaining = deadline - time.monotonic()
        if attempt > 0 and remaining < 30.0:
            return "fallback"
        # probe whatever jax would auto-select (the child inherits the env),
        # so an auto-discovered-but-dead relay plugin is caught too
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print(jax.default_backend())"],
                timeout=min(90.0, max(remaining, 30.0)), capture_output=True)
            if r.returncode == 0:
                out = r.stdout.decode().strip().splitlines()
                return out[-1] if out else "unknown"
        except subprocess.TimeoutExpired:
            pass
        attempt += 1
        backoff = min(15.0 * attempt, max(0.0, deadline - time.monotonic()))
        print(f"bench probe attempt {attempt} failed; "
              f"{deadline - time.monotonic():.0f}s of probe budget left",
              file=sys.stderr)
        if backoff > 0:
            time.sleep(backoff)


# per-chip peaks for the roofline fields: HBM GB/s, bf16 TFLOP/s.
# Sources: the public TPU system docs (v5e 819 GB/s / 197 TF; v4 1228/275;
# v5p 2765/459; v6e "Trillium" 1640/918).  Matched by substring on
# device_kind; HMVAE_HBM_PEAK_GBPS / HMVAE_PEAK_TFLOPS override for an
# unlisted chip.
_CHIP_PEAKS = (
    ("v5 lite", 819.0, 197.0), ("v5e", 819.0, 197.0),
    ("v5p", 2765.0, 459.0),
    ("v6 lite", 1640.0, 918.0), ("v6e", 1640.0, 918.0),
    ("trillium", 1640.0, 918.0),
    ("v4", 1228.0, 275.0),
)


def _chip_peaks(device_kind: str):
    import os

    env_bw = os.environ.get("HMVAE_HBM_PEAK_GBPS")
    env_fl = os.environ.get("HMVAE_PEAK_TFLOPS")
    if env_bw or env_fl:
        return (float(env_bw) if env_bw else None,
                float(env_fl) if env_fl else None)
    kind = device_kind.lower()
    for sub, bw, fl in _CHIP_PEAKS:
        if sub in kind:
            return bw, fl
    return None, None


def _cost_per_step(jitted, args, steps_per_dispatch: int, jax):
    """(bytes, flops) per train step from XLA's own cost analysis.

    Lower BEFORE the timed run (donated input buffers are dead after it);
    the persistent compile cache makes the extra ``compile()`` a hit.
    """
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("bytes accessed", 0.0)) / steps_per_dispatch,
                float(ca.get("flops", 0.0)) / steps_per_dispatch)
    except Exception as e:  # never let the roofline extras kill the line
        print(f"cost analysis unavailable: {e!r}", file=sys.stderr)
        return None, None


def _floor_bytes_per_step(state):
    """Per-step HBM traffic floors from the LIVE state tree: (hard, w_grads).

    HARD floor (2P + 2O): any implementation of "one Adam step on these
    parameters" must at minimum read and write the parameters (2P, at their
    STORED dtype — ``param_dtype=bfloat16`` halves this) and read and write
    both Adam moments (2*O at their stored dtype).  Nothing else is
    mandatory in principle: a backward fused into the optimizer update need
    never materialize gradients in HBM (advisor r4 finding — the earlier
    4P+2O "floor" baked that materialization in as if it were physics).

    W_GRADS floor (4P + 2O) adds one gradient write + read at param dtype —
    what XLA actually does today for this step (the backward and the
    optimizer are separate fusions), reported alongside as the
    *implementation* floor, labelled as an assumption, not a bound.

    Forward/backward weight and activation traffic comes ON TOP of either
    figure, so ``hbm_roofline_frac_floor`` (computed from the HARD floor)
    is a conservative lower bound on roofline proximity.
    """
    import jax

    pb = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(state.params))
    ob = sum(l.size * l.dtype.itemsize
             for l in jax.tree.leaves(state.opt_state)
             if getattr(l, "ndim", 0) > 0)
    return 2 * pb + 2 * ob, 4 * pb + 2 * ob


def _roofline_fields(bytes_per_step, flops_per_step,
                     step_time_s: float, device_kind: str,
                     floor_bytes=None) -> dict:
    """Self-certifying roofline fields (VERDICT r3 "What's weak" #2).

    Two traffic models, both computed in code (nothing hand-derived from a
    prose ledger): ``bytes_per_step`` from XLA's own HLO cost analysis
    (which under-counts ``lax.scan`` bodies — kept for continuity and
    labelled), and ``floor_bytes_per_step`` from the live parameter /
    optimizer-state tree (see ``_floor_bytes_per_step`` — a hard lower
    bound any implementation must move).  ``hbm_roofline_frac_floor`` is
    the certified figure: floor bytes over measured time over the chip's
    public peak bandwidth.
    """
    out = {"bytes_per_step": None, "achieved_gbps": None,
           "hbm_roofline_frac": None, "flops_per_step": None,
           "mfu_nominal": None, "device_kind": device_kind,
           "hbm_peak_gbps": None, "peak_tflops": None,
           "traffic_model": None, "floor_bytes_per_step": None,
           "floor_bytes_per_step_w_grads": None,
           "floor_gbps": None, "hbm_roofline_frac_floor": None}
    bw, tf = _chip_peaks(device_kind)
    if floor_bytes is not None:
        hard, w_grads = floor_bytes
        out["floor_bytes_per_step"] = int(hard)
        out["floor_bytes_per_step_w_grads"] = int(w_grads)
        out["floor_gbps"] = round(hard / step_time_s / 1e9, 1)
        if bw:
            out["hbm_peak_gbps"] = bw
            out["hbm_roofline_frac_floor"] = round(
                hard / step_time_s / (bw * 1e9), 3)
        # label upgraded to include the XLA view only if it populated below
        out["traffic_model"] = "analytic_floor"
    if bytes_per_step is None:
        return out
    if out["traffic_model"] == "analytic_floor":
        out["traffic_model"] = "analytic_floor+xla_cost_analysis"
    out["bytes_per_step"] = round(bytes_per_step)
    out["flops_per_step"] = round(flops_per_step)
    out["achieved_gbps"] = round(bytes_per_step / step_time_s / 1e9, 1)
    if out["traffic_model"] is None:
        out["traffic_model"] = "xla_cost_analysis"
    if bw:
        out["hbm_peak_gbps"] = bw
        out["hbm_roofline_frac"] = round(
            bytes_per_step / step_time_s / (bw * 1e9), 3)
    if tf:
        out["peak_tflops"] = tf
        out["mfu_nominal"] = round(
            flops_per_step / step_time_s / (tf * 1e12), 4)
    return out


def main(batch_size: int = 8, steps_per_call: int = 32, calls: int = 30,
         warmup: int = 3) -> None:
    import jax

    platform = _probe_backend()
    cpu_fallback = platform == "fallback"
    if cpu_fallback:
        print("WARNING: TPU backend unavailable (bounded probe with "
              "retry/backoff failed); benching on CPU — numbers are NOT "
              "the chip's", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        # keep the fallback bounded on a 1-core host: tiny measurement
        # window, and skip the e2e/latent-opt extras entirely
        steps_per_call, calls, warmup = 8, 2, 1

    if platform == "cpu" or cpu_fallback:
        # CPU executables must NOT share a persistent cache dir across
        # hosts: stale /tmp caches from a previous machine corrupt CPU
        # numerics (the tests/conftest.py issue).  cpu_cache_key hashes
        # model name + stepping + flags — stable across boots of the same
        # host (hashing all of cpuinfo keyed on volatile cpu-MHz lines and
        # never hit), distinct across machine types (flags alone collide on
        # XLA's model-derived +prefer-no-* pseudo-features)
        from hm_vae_tpu.utils.hostkey import cpu_cache_key

        cache_dir = f"/tmp/jax_cache_bench_cpu_{cpu_cache_key()}"
    else:
        # persistent compile cache: the big executables (K-step scan, e2e
        # trainer, both solver variants) cost minutes each through the relay
        # on a cold host; the TPU backend's dir is not exposed to the CPU
        # cache-poisoning issue because only TPU HLO lands in it
        cache_dir = "/tmp/jax_cache_tpu_bench"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.train.train_step import (create_state, make_multi_step,
                                             make_train_step)
    from hm_vae_tpu.utils.config import Config, ModelConfig

    import dataclasses

    from hm_vae_tpu.utils.config import OptimConfig

    cfg = Config(model=ModelConfig(latent_d=24, shallow_latent_d=12,
                                   kernel_size=15, train_seq_len=64))
    # headline mode == the len64_production.yaml default: bf16 parameter +
    # moment STORAGE with stochastic-rounding write-back (train/optim.py).
    # Production-flipped in round 5 after a 30k-step quality soak (val loss
    # tracked f32 at every eval point — BASELINE.md "bf16 parameter
    # storage").  The plain-f32 figure is still emitted below as
    # perf_mode_f32_seqs_per_sec for apples-to-apples cross-round reads.
    cfg_prod = dataclasses.replace(
        cfg, optim=OptimConfig(param_dtype="bfloat16",
                               moment_dtype="bfloat16"))
    model = HMVAE(cfg.model)
    rng = jax.random.PRNGKey(2)

    aa = jax.random.normal(
        jax.random.PRNGKey(1), (steps_per_call, batch_size, 64, 24, 3)) * 0.3
    mats = rot.aa_to_rotmat(aa)
    batches = {"rot_6d": rot.rotmat_to_rot6d(mats), "rot_mat": mats}
    batches = jax.tree.map(jax.device_put, batches)

    # production path: K steps per dispatch.  The headline is the MEDIAN of
    # `headline_windows` independently fenced dispatch windows with the
    # min/max band emitted alongside (value_band_min/max) — BASELINE.md
    # records 8.4-10.0k seqs/s swings across relay flaps, so a single-window
    # figure can't be classified as regression vs noise from the JSON alone.
    headline_windows = 1 if cpu_fallback else 5
    win_calls = max(calls // headline_windows, 1)
    state = create_state(model, cfg_prod, jax.random.PRNGKey(0))
    mstep = jax.jit(make_multi_step(model, cfg_prod), donate_argnums=(0,))
    # cost analysis must be captured before the timed run donates `state`
    step_bytes, step_flops = _cost_per_step(
        mstep, (state, batches, rng), steps_per_call, jax)
    device_kind = getattr(jax.devices()[0], "device_kind",
                          str(jax.devices()[0]))
    floor = _floor_bytes_per_step(state)  # before _bench donates `state`
    dts, _ = _bench(mstep, state, batches, rng, win_calls, warmup, jax,
                    windows=headline_windows)
    if not isinstance(dts, list):
        dts = [dts]
    rates = sorted(batch_size * steps_per_call * win_calls / d for d in dts)
    fused = rates[len(rates) // 2]          # median window
    fused_min, fused_max = rates[0], rates[-1]
    dt_med = batch_size * steps_per_call * win_calls / fused
    roofline = _roofline_fields(step_bytes, step_flops,
                                dt_med / (steps_per_call * win_calls),
                                device_kind, floor_bytes=floor)

    # perf modes.  Skipped on CPU fallback: each len-64 variant is a
    # multi-minute 1-core compile, and the fallback's only job is to emit a
    # labelled line fast.
    single = compact = f32_rate = bf16t = None
    compact_roofline = {}
    f32_roofline = {}
    if not cpu_fallback:
        # plain-f32 storage (the pre-round-5 headline mode): the
        # apples-to-apples anchor against BENCH_r02-r04 headlines and the
        # reference's own f32 Adam semantics.
        state_f = create_state(model, cfg, jax.random.PRNGKey(0))
        mstep_f = jax.jit(make_multi_step(model, cfg), donate_argnums=(0,))
        f_floor = _floor_bytes_per_step(state_f)
        dtf, _ = _bench(mstep_f, state_f, batches, rng, calls, warmup, jax)
        f32_rate = batch_size * steps_per_call * calls / dtf
        fr = _roofline_fields(None, None, dtf / (steps_per_call * calls),
                              device_kind, floor_bytes=f_floor)
        f32_roofline = {
            "f32_floor_bytes_per_step": fr["floor_bytes_per_step"],
            "f32_hbm_roofline_frac_floor": fr["hbm_roofline_frac_floor"],
        }

        # the MAX-PERF TRIPLE: bf16 params + moments + bf16 conv COMPUTE.
        # With f32 compute the bf16-stored weight is up-cast before the
        # mask-mul, so the conv still reads an f32 materialized weight
        # (chip r5: fwd_bwd 393 vs 401 µs — no gain there); bf16 compute
        # keeps the whole weight stream at half width end to end.
        # Convergence-tested (tests/test_train_step.py, the compute_dtype
        # parametrization).
        cfg_bt = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           compute_dtype="bfloat16"),
            optim=OptimConfig(param_dtype="bfloat16",
                              moment_dtype="bfloat16"))
        model_bt = HMVAE(cfg_bt.model)
        state_bt = create_state(model_bt, cfg_bt, jax.random.PRNGKey(0))
        mstep_bt = jax.jit(make_multi_step(model_bt, cfg_bt),
                           donate_argnums=(0,))
        dtbt, _ = _bench(mstep_bt, state_bt, batches, rng, calls, warmup,
                         jax)
        bf16t = batch_size * steps_per_call * calls / dtbt

        # compact conv-weight layout (models/param_layout.py): RETIRED as a
        # training mode (BASELINE.md round-5 verdict: the run-gather
        # expansion costs 549 µs/step vs the 129 µs mask-mul it replaces —
        # even a perfect expander loses; kept as a checkpoint/interchange
        # format).  One leg stays as the regression record of that verdict.
        cfg_c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, param_layout="compact"))
        model_c = HMVAE(cfg_c.model)
        state_c = create_state(model_c, cfg_c, jax.random.PRNGKey(0))
        mstep_c = jax.jit(make_multi_step(model_c, cfg_c),
                          donate_argnums=(0,))
        c_floor = _floor_bytes_per_step(state_c)
        dtc, _ = _bench(mstep_c, state_c, batches, rng, calls, warmup, jax)
        compact = batch_size * steps_per_call * calls / dtc
        cr = _roofline_fields(None, None, dtc / (steps_per_call * calls),
                              device_kind, floor_bytes=c_floor)
        compact_roofline = {
            "compact_floor_bytes_per_step": cr["floor_bytes_per_step"],
            "compact_hbm_roofline_frac_floor": cr["hbm_roofline_frac_floor"],
        }

        # classic one-step-per-dispatch path (host-latency bound)
        state1 = create_state(model, cfg, jax.random.PRNGKey(0))
        sstep = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
        single_batch = jax.tree.map(lambda x: x[0], batches)
        dt1, _ = _bench(sstep, state1, single_batch, rng, calls * 4, warmup,
                        jax)
        single = batch_size * calls * 4 / dt1

    e2e = e2e_aug = lo_ms = lo_shared_ms = None
    try:
        if not cpu_fallback:
            e2e = bench_end_to_end()
    except Exception:
        e2e = None
    try:
        # aug-enabled configs' production path (len8_data_aug semantics at
        # len 64): same C++ compact wire, random root rotation applied as a
        # jitted per-batch device op.  Shorter window count — the point is
        # the delta vs the plain row, not an independent band.
        if not cpu_fallback:
            e2e_aug = bench_end_to_end(windows=6, random_root_rot=True)
    except Exception:
        e2e_aug = None
    try:
        if not cpu_fallback:
            lo_ms = round(bench_latent_opt(per_window_decoder=True), 1)
    except Exception:
        lo_ms = None
    try:
        if not cpu_fallback:
            lo_shared_ms = round(
                bench_latent_opt(per_window_decoder=False), 1)
    except Exception:
        lo_shared_ms = None
    lo_bf16_ms = None
    try:
        # bf16 decoder CLONE + bf16 solver moments (opt_param_dtype /
        # opt_moment_dtype): halves the per-window weight+moment HBM
        # traffic that bounds the fine-tune phase (quality A/B:
        # BASELINE.md "solver bf16 clone")
        if not cpu_fallback:
            lo_bf16_ms = round(
                bench_latent_opt(per_window_decoder=True,
                                 opt_param_dtype="bfloat16",
                                 opt_moment_dtype="bfloat16"), 1)
    except Exception:
        lo_bf16_ms = None
    lo_lora_ms = None
    try:
        # rank-16 split-conv adapters (finetune_scope=lora): KBs of
        # per-window state, dense weights shared across windows — ms/window
        # FALLS with window count (BASELINE.md "rank-r split-conv adapters";
        # quality A/B in the same table)
        if not cpu_fallback:
            lo_lora_ms = round(
                bench_latent_opt(per_window_decoder=True,
                                 finetune_scope="lora"), 1)
    except Exception:
        lo_lora_ms = None

    print(json.dumps({
        "metric": "len64_hmvae_train_throughput_bs8",
        "value": round(fused, 2),
        "unit": "seqs/sec",
        "value_band_min": round(fused_min, 2),
        "value_band_max": round(fused_max, 2),
        "value_band_windows": len(rates),
        "vs_baseline": round(fused / BASELINE_SEQS_PER_SEC, 3),
        "headline_mode": "bf16_params+moments (len64_production.yaml "
                         "default since r5; 30k-step quality soak in "
                         "BASELINE.md; f32 anchor below)",
        "single_dispatch_seqs_per_sec":
            round(single, 2) if single else None,
        "perf_mode_f32_seqs_per_sec":
            round(f32_rate, 2) if f32_rate else None,
        **f32_roofline,
        "perf_mode_bf16_triple_seqs_per_sec":
            round(bf16t, 2) if bf16t else None,
        "compact_layout_seqs_per_sec":
            round(compact, 2) if compact else None,
        **compact_roofline,
        "steps_per_dispatch": steps_per_call,
        "measured_reference_cpu_seqs_per_sec": REFERENCE_CPU_SEQS_PER_SEC,
        "vs_reference_cpu": round(fused / REFERENCE_CPU_SEQS_PER_SEC, 1),
        "end_to_end_seqs_per_sec_bs64":
            round(e2e["median"], 2) if e2e else None,
        "end_to_end_band_min": round(e2e["min"], 2) if e2e else None,
        "end_to_end_band_max": round(e2e["max"], 2) if e2e else None,
        "end_to_end_aug_seqs_per_sec_bs64":
            round(e2e_aug["median"], 2) if e2e_aug else None,
        "latent_opt_interp_10win_solve_ms": lo_ms,
        "latent_opt_interp_10win_shared_clone_ms": lo_shared_ms,
        "latent_opt_interp_10win_bf16_clone_ms": lo_bf16_ms,
        "latent_opt_interp_10win_lora_ms": lo_lora_ms,
        **roofline,
        **({"platform": "cpu_fallback_tpu_unavailable",
            "note": "axon relay outage at bench time (probe retried with "
                    "backoff) - value is a 1-core host CPU run, NOT the "
                    "chip; the chip's figure of record is in "
                    "BENCH_r02.json / BASELINE.md (~9.8-10k seqs/s)"}
           if cpu_fallback else {"platform": platform}),
    }))


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    main(batch_size=bs)
