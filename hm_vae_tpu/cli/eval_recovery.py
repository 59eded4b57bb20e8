"""Evaluation CLI: motion completion / interpolation / generation.

Flag-compatible with ``eval_partial_motion_recovery.py:22-67``:
``--final_motion_completion_long_seq``, ``--final_try_long_seq_interpolation``,
``--try_final_long_seq_generation``, plus the reference's *intended*
single-window surface — ``--final_motion_completion`` (random per-frame joint
masks via ``missing_joint_prob``) and
``--try_interpolation_w_trajectory_single_window`` (keyframe trajectory loss)
— whose target methods are missing from the released reference model
(``trainer_motion_vae.py:214-229``) — and ``--test_model_rec`` (posterior-mean
reconstruction quality over the test split, the intended surface at
``trainer_motion_vae.py:160-161``).  ``--trajectory_config`` /
``--trajectory_test_model`` hook in the root-trajectory model.

Evaluation defaults to the FULL test split (``--max_seqs -1``); single-window
tasks batch ``--chunk`` sequences per jitted solve.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="Latent-optimization evaluations")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--output_path", type=str, default="./")
    p.add_argument("--test_model", type=str, default="")
    p.add_argument("--trajectory_config", type=str, default="")
    p.add_argument("--trajectory_test_model", type=str, default="")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--max_seqs", type=int, default=-1,
                   help="number of test sequences to evaluate (-1 = all)")
    p.add_argument("--chunk", type=int, default=32,
                   help="sequences per batched single-window solve")
    p.add_argument("--missing_joint_prob", type=float, default=None,
                   help="per-frame random joint-drop probability for "
                        "--final_motion_completion (default: cfg.data value, "
                        "or 0.3 if unset)")
    p.add_argument("--mask_dir", type=str, default=None,
                   help="precomputed per-frame mask npys (overrides random)")
    p.add_argument("--gen_vis", action="store_true")
    p.add_argument("--input_gt", action="store_true")
    # literal reference flags (eval_partial_motion_recovery.py:31-44);
    # applied below as --max_seqs/--chunk/output-dir equivalents
    p.add_argument("--vis_iters", type=int, default=None)
    p.add_argument("--vis_bs", type=int, default=None)
    p.add_argument("--out_tag", type=str, default="")
    p.add_argument("--batch_across_seqs", action="store_true",
                   help="long-seq interpolation only: flatten all sequences' "
                        "windows into one batched solve per chunk — several "
                        "times fewer dispatches.  With the default "
                        "per-window decoder clones this is quality-neutral "
                        "(every window keeps its own clone regardless of "
                        "batching); combined with --shared_decoder_clone the "
                        "fine-tune is shared across the chunk's sequences "
                        "(measured ~2x MPJPE — BASELINE.md)")
    p.add_argument("--shared_decoder_clone", action="store_true",
                   help="latent_opt.per_window_decoder=False: ONE decoder "
                        "fine-tune shared by each batched solve (the round-2 "
                        "formulation; ~B x less decoder-phase HBM traffic, "
                        "couples the batched windows).  Default: a private "
                        "clone + Adam state per window, the reference's "
                        "per-window deepcopy semantics "
                        "(seq_two_hier_sa_vae.py:1343-1345)")

    p.add_argument("--finetune_scope", default=None,
                   choices=["full", "lora", "last_conv", "heads"],
                   help="decoder subtree the fine-tune phase optimizes "
                        "(latent_opt.finetune_scope).  'full' = the "
                        "reference's whole-decoder deepcopy (default); "
                        "'lora' = rank-r split-conv adapters — KBs of "
                        "per-window state, dense weights shared across "
                        "windows (apps/latent_opt.py); "
                        "'last_conv'/'heads' freeze the rest — 5x/200x less "
                        "per-window clone HBM traffic (BASELINE.md "
                        "'fine-tune scope')")
    p.add_argument("--lora_rank", type=int, default=None,
                   help="adapter rank for --finetune_scope lora "
                        "(latent_opt.lora_rank, default 16)")
    p.add_argument("--lora_lr_mult", type=float, default=None,
                   help="LR multiplier on the lora factor leaves "
                        "(latent_opt.lora_lr_mult, default 10)")
    p.add_argument("--opt_param_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="storage dtype of the per-window decoder clone in "
                        "the solve (latent_opt.opt_param_dtype); bfloat16 "
                        "halves the clone-weight HBM stream via stochastic-"
                        "rounding write-back (quality A/B: BASELINE.md "
                        "'solver bf16 clone')")
    p.add_argument("--opt_moment_dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="solver Adam moment storage dtype "
                        "(latent_opt.opt_moment_dtype)")

    p.add_argument("--final_motion_completion_long_seq", action="store_true")
    p.add_argument("--final_try_long_seq_interpolation", action="store_true")
    p.add_argument("--try_final_long_seq_generation", action="store_true")
    p.add_argument("--final_motion_completion", action="store_true")
    p.add_argument("--try_interpolation_w_trajectory_single_window",
                   action="store_true")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard each batched latent-opt solve's window batch "
                        "over N devices (GSPMD data parallelism; windows are "
                        "independent solves).  Chunks are padded to a "
                        "multiple of N by cycling real windows, so summary "
                        "metrics are identical to a single-device run")
    p.add_argument("--test_model_rec", action="store_true",
                   help="posterior-mean reconstruction quality over the test "
                        "split (MPJPE / PA-MPJPE / accel error) — the "
                        "reference's *intended* test_model_rec API "
                        "(trainer_motion_vae.py:160-161; the released model "
                        "lacks the method).  No latent optimization: one "
                        "batched encode/decode over all windows")
    args = p.parse_args(argv)

    import jax

    from ..apps.baselines import slerp_rotations
    from ..apps.metrics import accel_error, mpjpe
    from ..apps.tasks import LatentOptApps, interpolation_mask
    from ..data.dataset import EvalMotionDataset
    from ..models.trajectory import TrajectoryRunner
    from ..ops import fk as fk_mod
    from ..train.trainer import Trainer, build_trainer
    from ..utils.config import load_config

    cfg = load_config(args.config)
    if args.data_root:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.data_root))
    if args.shared_decoder_clone:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, latent_opt=dataclasses.replace(
                cfg.latent_opt, per_window_decoder=False))
    if (args.finetune_scope or args.lora_rank is not None
            or args.lora_lr_mult is not None):
        import dataclasses

        lat_kw = {}
        if args.finetune_scope:
            lat_kw["finetune_scope"] = args.finetune_scope
        if args.lora_rank is not None:
            lat_kw["lora_rank"] = args.lora_rank
        if args.lora_lr_mult is not None:
            lat_kw["lora_lr_mult"] = args.lora_lr_mult
        cfg = dataclasses.replace(
            cfg, latent_opt=dataclasses.replace(cfg.latent_opt, **lat_kw))
    if args.opt_param_dtype or args.opt_moment_dtype:
        import dataclasses

        lat_kw = {}
        if args.opt_param_dtype:
            lat_kw["opt_param_dtype"] = args.opt_param_dtype
        if args.opt_moment_dtype:
            lat_kw["opt_moment_dtype"] = args.opt_moment_dtype
        cfg = dataclasses.replace(
            cfg, latent_opt=dataclasses.replace(cfg.latent_opt, **lat_kw))

    # literal reference aliases (eval_partial_motion_recovery.py:31-44):
    # --vis_iters x --vis_bs bounds how many sequences are processed (our
    # --max_seqs, which wins if given), --vis_bs also sets the solve chunk,
    # --out_tag suffixes the output directory name
    if args.max_seqs < 0 and args.vis_iters is not None:
        args.max_seqs = args.vis_iters * (args.vis_bs or 32)
    if args.vis_bs:
        args.chunk = args.vis_bs

    model_name = os.path.splitext(os.path.basename(args.config))[0]
    if args.out_tag:
        model_name = f"{model_name}_{args.out_tag}"
    if args.final_try_long_seq_interpolation:
        task, out_name = "interpolation", "eval_long_seq_interpolation"
    elif args.final_motion_completion_long_seq:
        task, out_name = "completion", "eval_long_seq_completion"
    elif args.try_final_long_seq_generation:
        task, out_name = "generation", "eval_long_seq_generation"
    elif args.final_motion_completion:
        # single-window completion with random missing joints
        # (eval_partial_motion_recovery.py:60-61, 117-127)
        task, out_name = "completion_sw", "eval_completion_single_window"
    elif args.try_interpolation_w_trajectory_single_window:
        task, out_name = ("interpolation_sw",
                          "eval_interpolation_w_trajectory_single_window")
    elif args.test_model_rec:
        task, out_name = "reconstruction", "eval_reconstruction"
    else:
        p.error("choose one of the task flags")
    output_dir = os.path.join(args.output_path, out_name, model_name)
    os.makedirs(output_dir, exist_ok=True)

    trainer, _, _, test_ds = build_trainer(cfg, output_dir)
    if args.test_model:
        trainer.load_params(args.test_model)

    mean_std = (trainer.mean_std if trainer.mean_std is not None
                else np.stack([np.zeros(579), np.ones(579)]).astype(np.float32))
    traj_runner = None
    traj_tuple = None
    if args.trajectory_config:
        tcfg = load_config(args.trajectory_config)
        t_trainer = Trainer(tcfg, os.path.join(output_dir, "traj"),
                            mean_std=trainer.mean_std)
        if args.trajectory_test_model:
            t_trainer.load_params(args.trajectory_test_model)
        # traj_runner only ever runs inside primary-only artifact writes
        # (_save_seq_outputs), so its jit must be a PROCESS-LOCAL launch:
        # host_local_copy re-binds it on host numpy params (identity
        # single-process).  traj_tuple feeds the SOLVER's in-loop trajectory
        # loss, which all processes dispatch together — that keeps the
        # pod-spanning params.
        from ..parallel.multihost import host_local_copy

        traj_runner = TrajectoryRunner(
            t_trainer.model, host_local_copy(t_trainer.state.params),
            mean_std)
        traj_tuple = (t_trainer.model, t_trainer.state.params, mean_std)

    if task == "interpolation_sw" and traj_tuple is None:
        # without a trajectory model the run would silently degrade to plain
        # interpolation while writing into the *_w_trajectory output dir
        p.error("--try_interpolation_w_trajectory_single_window requires "
                "--trajectory_config/--trajectory_test_model (the reference "
                "loads a TrajectoryModel for this task, "
                "eval_partial_motion_recovery.py:96-133)")
    # evaluation data: full test sequences (random per-frame joint masks for
    # the single-window completion task, utils_motion_vae.py:247, 276-277)
    mprob = args.missing_joint_prob
    if mprob is None:
        mprob = cfg.data.missing_joint_prob or 0.3
    eval_kwargs = {}
    if task == "completion_sw":
        if args.mask_dir:
            eval_kwargs = dict(mask_dir=args.mask_dir)
        else:
            eval_kwargs = dict(missing="random", missing_joint_prob=mprob,
                               seed=cfg.run.seed)
    from ..data.dataset import resolve_split_json

    eval_ds = EvalMotionDataset(
        os.path.join(cfg.data.data_root, "seqs"),
        resolve_split_json(cfg, "test"), **eval_kwargs)

    rng = jax.random.PRNGKey(cfg.run.seed)
    W = cfg.model.train_seq_len
    n_eval = len(eval_ds) if args.max_seqs < 0 else min(args.max_seqs,
                                                        len(eval_ds))

    mesh = None
    if args.data_parallel > 1:
        from ..parallel import sharding as sh

        mesh = sh.make_mesh(args.data_parallel, model_parallel=1)

    if task == "reconstruction":
        # no latent optimization involved — don't build the solver at all
        from ..apps.inference import VAEInference

        infer = VAEInference(trainer.model, trainer.state.params, cfg)
        _run_reconstruction(args, infer, eval_ds, n_eval, W, traj_runner,
                            output_dir, mesh=mesh)
        return

    if task == "interpolation_sw":
        # the single-window interpolation runs the keyframe trajectory loss
        # inside the solver (eval_partial_motion_recovery.py:96-103)
        import dataclasses

        cfg_sw = dataclasses.replace(
            cfg, latent_opt=dataclasses.replace(
                cfg.latent_opt, optimize_trajectory=True,
                reg_w_trajectory=cfg.latent_opt.reg_w_trajectory or 1.0))
        apps = LatentOptApps(trainer.model, trainer.state.params, cfg_sw,
                             trajectory=traj_tuple, mesh=mesh)
    else:
        apps = LatentOptApps(trainer.model, trainer.state.params, cfg,
                             mesh=mesh)

    if task in ("completion_sw", "interpolation_sw"):
        _run_single_window(args, task, apps, eval_ds, n_eval, W, rng,
                           traj_runner, output_dir)
        return
    if task == "completion":
        _run_completion_batched(args, apps, eval_ds, n_eval, W, rng,
                                traj_runner, output_dir, cfg)
        return
    if task == "generation":
        _run_generation_batched(args, apps, eval_ds, n_eval, W, rng,
                                traj_runner, output_dir)
        return

    # interpolation: by default one batched solve per SEQUENCE (each gets its
    # own decoder fine-tune, matching the reference's per-window clone most
    # closely); --batch_across_seqs flattens a whole chunk's windows into one
    # solve — faster, but the shared clone costs reconstruction quality
    results = []
    for ci, chunk in enumerate(_chunked(_iter_eligible(eval_ds, n_eval, W),
                                        args.chunk)):
        if args.batch_across_seqs:
            outs = apps.interpolate_many([it["rot_mat"] for it in chunk],
                                         jax.random.fold_in(rng, 7000 + ci))
        else:
            outs = [apps.interpolate(
                        it["rot_mat"],
                        jax.random.fold_in(rng, 7000 + ci * args.chunk + j))
                    for j, it in enumerate(chunk)]
        for it, out in zip(chunk, outs):
            rotmat = it["rot_mat"]
            T_out = out["pose"].shape[0]
            gt_pose = fk_mod.fk_numpy(rotmat[:T_out])
            m = {
                "mpjpe": float(mpjpe(out["pose"], gt_pose)),
                "accel_err": float(accel_error(out["pose"], gt_pose)),
            }
            if T_out == W:
                # SLERP baseline on the same keyframes — the reference's
                # comparison point (seq_two_hier_sa_vae.py:972-1011)
                tmask = interpolation_mask(
                    W, cfg.latent_opt.interpolation_window)
                slerp = slerp_rotations(rotmat[:W], tmask)
                m["slerp_mpjpe"] = float(
                    mpjpe(fk_mod.fk_numpy(np.asarray(slerp)), gt_pose))

            name = it["name"].replace(".npy", "")
            _save_seq_outputs(name, np.asarray(out["rot_mat"]),
                              np.asarray(out["rot_6d"]),
                              np.asarray(out["pose"]), args, traj_runner,
                              output_dir)
            results.append((name, m))
            print(name, m, flush=True)

    _write_summary(results, output_dir)


def _iter_eligible(eval_ds, n_eval, W):
    """Lazily yield test items with at least one window — items load one at a
    time so memory stays bounded by the chunk size, not the split size."""
    for i in range(n_eval):
        it = eval_ds[i]
        if it["rot_mat"].shape[0] >= W:
            yield it


def _chunked(iterable, size):
    import itertools
    it = iter(iterable)
    while True:
        chunk = list(itertools.islice(it, size))
        if not chunk:
            return
        yield chunk


def _pad_chunk(chunk, size, ci):
    """(padded_chunk, n_real): repeat the last item to the full chunk size so
    the batched solver compiles for ONE batch shape — a smaller tail chunk
    otherwise costs its own multi-minute relay compile.  Padded rows are
    discarded by iterating only the first n_real results.  The FIRST chunk is
    never padded: a small single-chunk run (--max_seqs 4) should compile and
    solve at its exact size, not pay a full --chunk-wide batch."""
    n_real = len(chunk)
    if ci == 0:
        return chunk, n_real
    return chunk + [chunk[-1]] * (size - n_real), n_real


def _save_seq_outputs(name, rotmat, rot6d, pose, args, traj_runner,
                      output_dir):
    """Per-sequence artifacts: optimized rotations, predicted world-space
    root trajectory (when a trajectory model is loaded), optional animation.
    Multi-host: process 0 only (shared fs; the compute above already ran
    pod-wide — traj_runner is bound to a host-local param copy at build
    time, so its jit launches process-locally and is safe to call from
    process 0 alone)."""
    from ..parallel.multihost import is_primary
    from ..utils.viz import save_animation

    if not is_primary():
        return
    np.save(os.path.join(output_dir, f"{name}_rot_opt_res.npy"), rotmat)
    if traj_runner is not None:
        world, _ = traj_runner(rot6d[None])
        np.save(os.path.join(output_dir, f"{name}_root_trans_opt_res.npy"),
                np.asarray(world[0]))
        if args.gen_vis:
            save_animation(np.asarray(world[0])[None],
                           os.path.join(output_dir, f"{name}.mp4"))
    elif args.gen_vis:
        save_animation(pose[None], os.path.join(output_dir, f"{name}.mp4"))


def _write_summary(results, output_dir):
    import json

    from ..parallel.multihost import is_primary

    if not results:
        print("no test sequences long enough for one window")
        return
    keys = sorted({k for _, m in results for k in m})
    summary = {k: float(np.mean([m[k] for _, m in results if k in m]))
               for k in keys}
    summary["num_seqs"] = len(results)
    print("summary:", summary)
    if not is_primary():   # multi-host: metrics are identical; one writer
        return
    with open(os.path.join(output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


def _run_reconstruction(args, infer, eval_ds, n_eval, W, traj_runner,
                        output_dir, mesh=None):
    """Posterior-mean reconstruction over the test split — the reference's
    intended ``test_model_rec`` surface (``trainer_motion_vae.py:160-161``),
    implemented as ONE batched encode/decode per chunk: every sequence is cut
    into non-overlapping ``train_seq_len`` windows, all windows of a chunk
    flatten and run through fixed-size batches of 128 (the tail batch padded
    by cycling) so encode/decode jit-compile ONCE for the whole split —
    variable per-chunk batch shapes would recompile per chunk, minutes each
    through the TPU relay.  Metrics are MPJPE / PA-MPJPE / accel error vs
    GT FK.
    No latent optimization is involved, so this is the cheapest quality row:
    it isolates pure VAE reconstruction from solver effects."""
    import jax
    import jax.numpy as jnp

    from ..apps.metrics import accel_error, mpjpe, pa_mpjpe
    from ..ops import fk as fk_mod
    from ..ops import rotations as rot

    # --data_parallel: the fixed-size window batches shard over the mesh's
    # data axis (pure batched encode/decode — embarrassingly parallel).
    # Multi-host follows LatentOptApps._dispatch's protocol: every process
    # computes the identical batch and contributes its contiguous row share
    # (a plain device_put of host data onto a pod-spanning sharding is not
    # addressable), and outputs replicate back so np.asarray reads locally.
    bsh = None
    replicate = None
    pc = jax.process_count()
    if mesh is not None and mesh.shape["data"] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P("data"))
        if pc > 1:
            replicate = jax.jit(lambda t: t,
                                out_shardings=NamedSharding(mesh, P()))
    if pc > 1 and bsh is None:
        raise ValueError(
            "multi-process --test_model_rec needs --data_parallel: the "
            "params span the pod, so window batches must be assembled as "
            "global arrays over the same mesh")

    def put(six):
        if bsh is None:
            return six
        if pc == 1:
            return jax.device_put(six, bsh)
        if six.shape[0] % pc:
            raise ValueError(f"batch {six.shape[0]} not divisible by "
                             f"{pc} processes")
        rpp = six.shape[0] // pc
        i0 = jax.process_index() * rpp
        return jax.make_array_from_process_local_data(
            bsh, np.asarray(six[i0:i0 + rpp]))

    results = []
    for chunk in _chunked(_iter_eligible(eval_ds, n_eval, W), args.chunk):
        wins, counts = [], []
        for it in chunk:
            n = it["rot_mat"].shape[0] // W
            wins.append(it["rot_mat"][: n * W].reshape(n, W, 24, 3, 3))
            counts.append(n)
        flat = np.concatenate(wins, axis=0)
        B = flat.shape[0]
        REC_BS = 128  # one static jit shape for the whole split
        parts6, parts_rm, parts_pose = [], [], []
        for s in range(0, B, REC_BS):
            part = flat[s:s + REC_BS]
            nb = part.shape[0]
            if nb < REC_BS:  # cycle real windows; padded rows discarded below
                part = np.concatenate(
                    [part, part[np.arange(REC_BS - nb) % nb]])
            six = put(rot.rotmat_to_rot6d(jnp.asarray(part)))
            r6, rm, rp = infer.mean_reconstruction(six)
            if replicate is not None:
                r6, rm, rp = replicate((r6, rm, rp))
            parts6.append(np.asarray(r6)[:nb])
            parts_rm.append(np.asarray(rm)[:nb])
            parts_pose.append(np.asarray(rp)[:nb])
        rec6d = np.concatenate(parts6, axis=0)
        rec_rm = np.concatenate(parts_rm, axis=0)
        rec_pose = np.concatenate(parts_pose, axis=0)

        o = 0
        for it, n in zip(chunk, counts):
            T_out = n * W
            seq6 = rec6d[o:o + n].reshape(T_out, 24, 6)
            seq_rm = rec_rm[o:o + n].reshape(T_out, 24, 3, 3)
            seq_pose = rec_pose[o:o + n].reshape(T_out, 24, 3)
            o += n
            gt_pose = np.asarray(fk_mod.fk_numpy(it["rot_mat"][:T_out]))
            m = {
                "mpjpe": float(mpjpe(seq_pose, gt_pose)),
                "pa_mpjpe": float(pa_mpjpe(seq_pose, gt_pose)),
                "accel_err": float(accel_error(seq_pose, gt_pose)),
            }
            name = it["name"].replace(".npy", "")
            _save_seq_outputs(name, seq_rm, seq6, seq_pose, args, traj_runner,
                              output_dir)
            results.append((name, m))
            print(name, m, flush=True)

    _write_summary(results, output_dir)


def _run_completion_batched(args, apps, eval_ds, n_eval, W, rng,
                            traj_runner, output_dir, cfg):
    """Long-sequence completion over the test split, batched ACROSS sequences
    per window index (apps.complete_many) — max_windows solves per chunk
    instead of one 150-step solve per (sequence, window)."""
    import jax

    from ..apps.metrics import accel_error, mpjpe
    from ..ops import fk as fk_mod

    missing = ("upper" if cfg.latent_opt.missing_upper_completion else "lower")
    results = []
    for ci, chunk in enumerate(_chunked(_iter_eligible(eval_ds, n_eval, W),
                                        args.chunk)):
        chunk, n_real = _pad_chunk(chunk, args.chunk, ci)
        outs = apps.complete_many(
            [it["rot_mat"] for it in chunk],
            jax.random.fold_in(rng, 5000 + ci), missing=missing)
        for it, out in zip(chunk[:n_real], outs[:n_real]):
            pose = np.asarray(out["pose"])
            T_out = pose.shape[0]
            gt_pose = fk_mod.fk_numpy(it["rot_mat"][:T_out])
            m = {
                "mpjpe": float(mpjpe(pose, gt_pose)),
                "accel_err": float(accel_error(pose, gt_pose)),
            }
            name = it["name"].replace(".npy", "")
            _save_seq_outputs(name, np.asarray(out["rot_mat"]),
                              np.asarray(out["rot_6d"]), pose, args,
                              traj_runner, output_dir)
            results.append((name, m))
            print(name, m, flush=True)

    _write_summary(results, output_dir)


def _run_generation_batched(args, apps, eval_ds, n_eval, W, rng,
                            traj_runner, output_dir):
    """Autoregressive generation over the test split, batched ACROSS
    sequences per window round (apps.generate_many): num_windows batched
    solves per chunk instead of one per (sequence, window)."""
    import jax

    results = []
    for ci, chunk in enumerate(_chunked(_iter_eligible(eval_ds, n_eval, W),
                                        args.chunk)):
        chunk, n_real = _pad_chunk(chunk, args.chunk, ci)
        outs = apps.generate_many(
            [it["rot_mat"][:W] for it in chunk],
            jax.random.fold_in(rng, 3000 + ci), num_windows=5, overlap=10)
        for it, out in zip(chunk[:n_real], outs[:n_real]):
            m = {"length": out["pose"].shape[0]}
            name = it["name"].replace(".npy", "")
            _save_seq_outputs(name, np.asarray(out["rot_mat"]),
                              np.asarray(out["rot_6d"]),
                              np.asarray(out["pose"]), args, traj_runner,
                              output_dir)
            results.append((name, m))
            print(name, m, flush=True)

    _write_summary(results, output_dir)


def _run_single_window(args, task, apps, eval_ds, n_eval, W, rng,
                       traj_runner, output_dir):
    """Batched one-window-per-sequence evaluation over the test split.

    Chunks of ``args.chunk`` sequences solve in one jitted call each —
    the reference would run one 150-step Python loop per sequence."""
    import jax

    from ..apps.metrics import accel_error, mpjpe
    from ..ops import fk as fk_mod

    results = []
    for ci, chunk in enumerate(_chunked(_iter_eligible(eval_ds, n_eval, W),
                                        args.chunk)):
        chunk, n_real = _pad_chunk(chunk, args.chunk, ci)
        wins = np.stack([it["rot_mat"][:W] for it in chunk])
        key = jax.random.fold_in(rng, 1000 + ci)
        if task == "completion_sw":
            masks = np.stack([it["mask"][:W] for it in chunk])
            out = apps.complete_single_window(wins, masks, key)
        else:
            # GT root translation for the keyframe trajectory loss: frame-0
            # velocity zeroed, then accumulated (trajectory_pred_model.py:289-303)
            rv = np.stack([it["root_v"][:W] for it in chunk]).astype(np.float32)
            rv[:, 0] = 0.0
            rt = np.cumsum(rv, axis=1)
            out = apps.interpolate_single_window(wins, key, root_trans=rt)

        pose = np.asarray(out["pose"])
        mask = np.asarray(out["mask"])
        rot = np.asarray(out["rot_mat"])
        six = np.asarray(out["rot_6d"])
        for j, it in enumerate(chunk[:n_real]):
            gt_pose = fk_mod.fk_numpy(it["rot_mat"][:W])
            m = {
                "mpjpe": float(mpjpe(pose[j], gt_pose)),
                "accel_err": float(accel_error(pose[j], gt_pose)),
            }
            missing = 1.0 - mask[j]  # (W, 24)
            if missing.sum() > 0:
                err = np.linalg.norm(pose[j] - np.asarray(gt_pose), axis=-1)
                m["mpjpe_missing"] = float(
                    (err * missing).sum() / missing.sum())
            name = it["name"].replace(".npy", "")
            _save_seq_outputs(name, rot[j], six[j], pose[j], args,
                              traj_runner, output_dir)
            results.append((name, m))
            print(name, m, flush=True)

    _write_summary(results, output_dir)


if __name__ == "__main__":
    main()
