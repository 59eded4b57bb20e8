"""Train the REAL reference TrajectoryModel and ours side by side.

Companion to ref_convergence_compare.py for the second model family:
weights transplanted reference->flax from the same torch init, identical
cycling batches, torch Adam+StepLR vs the optax chain.  Emits one JSON line
with curve checkpoints, deviation stats and held-out losses.

Usage: python scripts/ref_trajectory_convergence_compare.py [--steps 400]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq_len", type=int, default=32)
    ap.add_argument("--pool", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from ref_harness import build_trajectory, make_hp
    from hm_vae_tpu.models.trajectory import TrajectoryModel, trajectory_losses
    from hm_vae_tpu.train.optim import make_optimizer
    from hm_vae_tpu.utils import config as cfg_mod
    from hm_vae_tpu.utils.torch_import import import_trajectory_params

    B, T = args.batch, args.seq_len
    hp = make_hp("trajectory_model.yaml", train_seq_len=T)
    ref = build_trajectory(hp)

    cfg = cfg_mod.load_config("/root/reference/configs/trajectory_model.yaml")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, train_seq_len=T))
    model = TrajectoryModel(cfg.model)
    # .copy() is load-bearing: detach().numpy() aliases the LIVE torch
    # parameters, and the reference trains first — without the copy our side
    # would silently start from the reference's post-training weights
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params = import_trajectory_params(sd, cfg.model)

    ms = np.load("/root/reference/utils/data/for_all_data_motion_model/"
                 "all_amass_data_mean_std.npy").astype(np.float32)
    ms[1, ms[1] == 0] = 1.0

    def make_batches(n, seed0):
        out = []
        for i in range(n):
            r = np.random.default_rng(seed0 + i)
            out.append({
                "rot_6d": r.normal(size=(B, T, 24, 6)).astype(np.float32),
                "rot_pos": r.normal(size=(B, T, 24, 3)).astype(np.float32),
                "joint_pos": r.normal(size=(B, T, 24, 3)).astype(np.float32),
                "root_v": (r.normal(size=(B, T, 3)) * 0.1).astype(np.float32),
            })
        return out

    batches = make_batches(args.pool, 50)
    zeros216 = np.zeros((B, T, 24 * 9), np.float32)
    zeros72 = np.zeros((B, T, 72), np.float32)

    def torch_tuple(b):
        return tuple(torch.from_numpy(x) for x in (
            b["rot_6d"].reshape(B, T, -1), zeros216,
            b["rot_pos"].reshape(B, T, -1), b["joint_pos"].reshape(B, T, -1),
            zeros72, zeros72, b["root_v"]))

    # --- reference side ---
    opt = torch.optim.Adam([p for p in ref.parameters() if p.requires_grad],
                           lr=hp["lr"], weight_decay=hp["weight_decay"])
    from torch.optim import lr_scheduler
    sched = lr_scheduler.StepLR(opt, step_size=hp["step_size"],
                                gamma=hp["gamma"])
    t0 = time.perf_counter()
    ref_curve = []
    for it in range(args.steps):
        data = torch_tuple(batches[it % args.pool])
        opt.zero_grad()
        out = ref(data, hp, it, multigpus=False, validation_flag=False)
        opt.step()
        sched.step()
        ref_curve.append(float(out[0].detach()))
    t_ref = time.perf_counter() - t0

    # --- framework side ---
    tx = make_optimizer(cfg.optim)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, batch):
        def loss(pp):
            total, _ = trajectory_losses(model, pp, batch, cfg, ms)
            return total
        total, g = jax.value_and_grad(loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, total

    jb = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    t0 = time.perf_counter()
    our_curve = []
    for it in range(args.steps):
        params, opt_state, total = step(params, opt_state, jb[it % args.pool])
        our_curve.append(float(total))
    t_ours = time.perf_counter() - t0

    # held-out losses at the end
    hold = make_batches(4, 900)
    ref_h, our_h = [], []
    with torch.no_grad():
        for b in hold:
            out = ref(torch_tuple(b), hp, args.steps, multigpus=False,
                      validation_flag=True)
            ref_h.append(float(out[0].detach()))
    for b in hold:
        total, _ = trajectory_losses(
            model, params, {k: jnp.asarray(v) for k, v in b.items()}, cfg, ms)
        our_h.append(float(total))

    ref_c = np.asarray(ref_curve)
    our_c = np.asarray(our_curve)
    rel = np.abs(our_c - ref_c) / np.abs(ref_c)
    marks = sorted({0, 1, args.steps // 4, args.steps // 2, args.steps - 1})
    print(json.dumps({
        "model": "trajectory", "steps": args.steps, "batch": B, "seq_len": T,
        "checkpoints": {str(m): {"ref": round(float(ref_c[m]), 5),
                                 "ours": round(float(our_c[m]), 5)}
                        for m in marks},
        "max_rel_dev": round(float(rel.max()), 5),
        "mean_rel_dev": round(float(rel.mean()), 5),
        "final_ratio": round(float(our_c[-1] / ref_c[-1]), 5),
        "heldout_total": {"ref": round(float(np.mean(ref_h)), 5),
                          "ours": round(float(np.mean(our_h)), 5)},
        "ref_s_per_step": round(t_ref / args.steps, 4),
        "ours_s_per_step_cpu": round(t_ours / args.steps, 4),
    }))


if __name__ == "__main__":
    main()
