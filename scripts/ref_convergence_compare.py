"""Train the REAL reference and this framework side by side; compare curves.

Extends tests/test_reference_parity.py's 40-step check to a few hundred
Adam+StepLR steps on identical data: the reference's own
``TwoHierSAVAEModel`` (CPU-shimmed, weights transplanted from the same flax
init) against ``hmvae_forward`` + the optax chain.  Emits one JSON line with
both loss curves' checkpoints and deviation stats; paste into PARITY.md.

Usage: python scripts/ref_convergence_compare.py [--steps 400] [--batch 4]
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
    ap.add_argument("--pool", type=int, default=8, help="distinct batches cycled")
    ap.add_argument("--ours_platform", default="cpu",
                    choices=["cpu", "device"],
                    help="'cpu' pins our side to jitted CPU (bit-for-bit vs "
                         "the round-1 protocol); 'device' runs our side on "
                         "the default accelerator (the production TPU path) "
                         "while the reference stays on its torch CPU build")
    ap.add_argument("--ours_chunk", type=int, default=1,
                    help="gradient steps per device dispatch for our side "
                         "(lax.scan; per-step math unchanged — the "
                         "production multi-step path).  1 = one dispatch + "
                         "loss readback per step; long runs through the "
                         "relay should use ~100-500: 10k per-step round "
                         "trips are slow and one relay hiccup kills the run")
    ap.add_argument("--matmul_precision", default="default",
                    choices=["default", "high", "highest"],
                    help="jax default_matmul_precision for our side.  On "
                         "TPU 'default' runs the MXU with bf16 input "
                         "passes; 'highest' uses 6-pass f32 emulation.  "
                         "Relevant for long memorization-regime compares "
                         "where the bf16 gradient noise floor caps how far "
                         "train loss can descend (see PARITY.md)")
    ap.add_argument("--iteration_interval", type=int, default=None,
                    help="override the KL-curriculum boundary (reference "
                         "yaml: 50000) so a short run crosses the shallow-"
                         "head wake-up transition")
    ap.add_argument("--self_perturb", action="store_true",
                    help="chaos control: instead of our side, train a "
                         "second copy of the REFERENCE with one parameter "
                         "perturbed by 1e-7 and report the pair's spread — "
                         "the resolution floor for any cross-stack "
                         "comparison at this horizon")
    args = ap.parse_args()

    import jax

    if args.ours_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch
    from scipy.spatial.transform import Rotation as R

    from ref_harness import build_vae, deterministic_z, make_batch_tuple, make_hp
    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.train.losses import hmvae_forward
    from hm_vae_tpu.train.optim import make_optimizer
    from hm_vae_tpu.utils import config as cfg_mod
    from hm_vae_tpu.utils.torch_import import export_hmvae_params

    cfg = cfg_mod.load_config("/root/reference/configs/len8_data_aug_hm_vae.yaml")
    hp = make_hp("len8_data_aug_hm_vae.yaml")
    if args.iteration_interval is not None:
        # shrink the KL-curriculum boundary so a short run CROSSES it: the
        # shallow latent head sleeps (torch grad=None, frozen at init —
        # PARITY.md) below the boundary and wakes with fresh Adam state at
        # it == interval; both stacks must agree through the transition
        import dataclasses
        hp["iteration_interval"] = args.iteration_interval
        cfg = dataclasses.replace(cfg, loss=dataclasses.replace(
            cfg.loss, iteration_interval=args.iteration_interval))
    T = cfg.model.train_seq_len

    model = HMVAE(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, T, 24, 6)))
    ref = build_vae(hp)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_hmvae_params(params, cfg.model).items()}
    ref.load_state_dict(sd, strict=False)
    deterministic_z(ref)

    batches = []
    for i in range(args.pool):
        rm = R.random(args.batch * T * 24, random_state=50 + i).as_matrix()
        rm = rm.astype(np.float32).reshape(args.batch, T, 24, 3, 3)
        r6 = np.asarray(rot.rotmat_to_rot6d(jnp.asarray(rm)), np.float32)
        batches.append((r6, rm))

    # --- reference side (torch Adam + StepLR, trainer_motion_vae.py:29-35) ---
    opt = torch.optim.Adam([p for p in ref.parameters() if p.requires_grad],
                           lr=hp["lr"], weight_decay=hp["weight_decay"])
    from torch.optim import lr_scheduler
    sched = lr_scheduler.StepLR(opt, step_size=hp["step_size"],
                                gamma=hp["gamma"])
    t0 = time.perf_counter()
    ref_curve = []
    for it in range(args.steps):
        r6, rm = batches[it % args.pool]
        data = make_batch_tuple(torch, r6, rm)
        opt.zero_grad()
        out = ref(data, hp, it, multigpus=False, validation_flag=False)
        opt.step()
        sched.step()
        ref_curve.append(float(out[0].detach()))
        if (it + 1) % 500 == 0:
            print(f"ref step {it + 1}/{args.steps}", file=sys.stderr,
                  flush=True)
    t_ref = time.perf_counter() - t0

    if args.self_perturb:
        # --- chaos control: the reference vs a 1-ulp-perturbed copy of
        # ITSELF (same data, same torch build).  The spread of this pair
        # bounds what any cross-stack comparison can resolve at this
        # horizon; run it before reading anything into late-horizon
        # train-curve ratios. ---
        ref2 = build_vae(hp)
        ref2.load_state_dict(sd, strict=False)
        deterministic_z(ref2)
        with torch.no_grad():
            p0 = next(p for p in ref2.parameters() if p.requires_grad)
            p0.mul_(1.0 + 1e-7)
        opt2 = torch.optim.Adam(
            [p for p in ref2.parameters() if p.requires_grad],
            lr=hp["lr"], weight_decay=hp["weight_decay"])
        sched2 = lr_scheduler.StepLR(opt2, step_size=hp["step_size"],
                                     gamma=hp["gamma"])
        pert_curve = []
        for it in range(args.steps):
            r6, rm = batches[it % args.pool]
            data = make_batch_tuple(torch, r6, rm)
            opt2.zero_grad()
            out = ref2(data, hp, it, multigpus=False, validation_flag=False)
            opt2.step()
            sched2.step()
            pert_curve.append(float(out[0].detach()))
            if (it + 1) % 500 == 0:
                print(f"perturbed-ref step {it + 1}/{args.steps}",
                      file=sys.stderr, flush=True)
        ref_c = np.asarray(ref_curve)
        pert_c = np.asarray(pert_curve)
        rel = np.abs(pert_c - ref_c) / np.abs(ref_c)
        marks = sorted({0, 1, args.steps // 4, args.steps // 2,
                        args.steps - 1})
        hold_eval = {"ref": [], "perturbed": []}
        for i in range(4):
            rmh = R.random(args.batch * T * 24,
                           random_state=900 + i).as_matrix()
            rmh = rmh.astype(np.float32).reshape(args.batch, T, 24, 3, 3)
            r6h = np.asarray(rot.rotmat_to_rot6d(jnp.asarray(rmh)),
                             np.float32)
            data = make_batch_tuple(torch, r6h, rmh)
            with torch.no_grad():
                for key, mdl in (("ref", ref), ("perturbed", ref2)):
                    out = mdl(data, hp, args.steps, multigpus=False,
                              validation_flag=True)
                    hold_eval[key].append(float(out[4].detach()))
        print(json.dumps({
            "mode": "self_perturb", "steps": args.steps,
            "checkpoints": {str(m): {"ref": round(float(ref_c[m]), 5),
                                     "perturbed": round(float(pert_c[m]), 5)}
                            for m in marks},
            "max_rel_dev": round(float(rel.max()), 5),
            "mean_rel_dev": round(float(rel.mean()), 5),
            "final_ratio": round(float(pert_c[-1] / ref_c[-1]), 5),
            "heldout_rec_pose": {
                k: round(float(np.mean(v)), 5)
                for k, v in hold_eval.items()},
        }))
        return

    # --- framework side ---
    tx = make_optimizer(cfg.optim)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, o, batch, it):
        def loss(pp):
            total, _ = hmvae_forward(model, pp, batch, jax.random.PRNGKey(1),
                                     jnp.asarray(it, jnp.int32), cfg,
                                     sample=False)
            return total
        total, g = jax.value_and_grad(loss)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, total

    jb = [{"rot_6d": jnp.asarray(r6), "rot_mat": jnp.asarray(rm)}
          for r6, rm in batches]
    t0 = time.perf_counter()
    our_curve = []
    if args.ours_chunk > 1:
        # K steps per dispatch: identical per-step math under lax.scan (the
        # production multi-step path), batch pool indexed on device
        pool = jax.tree.map(lambda *xs: jnp.stack(xs), *jb)
        K = args.ours_chunk

        @jax.jit
        def chunk(p, o, it0):
            def body(carry, i):
                pp, oo = carry
                it = it0 + i
                b = jax.tree.map(lambda x: x[it % args.pool], pool)

                def loss(q):
                    total, _ = hmvae_forward(
                        model, q, b, jax.random.PRNGKey(1), it, cfg,
                        sample=False)
                    return total

                total, g = jax.value_and_grad(loss)(pp)
                u, oo = tx.update(g, oo, pp)
                return (optax.apply_updates(pp, u), oo), total

            (p, o), totals = jax.lax.scan(
                body, (p, o), jnp.arange(K, dtype=jnp.int32))
            return p, o, totals

        it = 0
        while it < args.steps:
            n = min(K, args.steps - it)
            if n == K:
                params, opt_state, totals = chunk(
                    params, opt_state, jnp.asarray(it, jnp.int32))
                our_curve.extend(np.asarray(totals).tolist())
                it += K
            else:
                params, opt_state, total = step(params, opt_state,
                                                jb[it % args.pool], it)
                our_curve.append(float(total))
                it += 1
            print(f"ours step {it}/{args.steps}", file=sys.stderr, flush=True)
    else:
        for it in range(args.steps):
            params, opt_state, total = step(
                params, opt_state, jb[it % args.pool], it)
            our_curve.append(float(total))
    t_ours = time.perf_counter() - t0

    # --- component-level diagnostic on TRAIN batch 0 at the end: localises
    # late-horizon train-curve gaps (rec vs KL; reference returns
    # (l_total, l_kl, l_rec_6d, l_rec_rot_mat, l_rec_pose, ..., l_kl_list),
    # seq_two_hier_sa_vae.py:415-416) ---
    r6, rm = batches[0]
    with torch.no_grad():
        out = ref(make_batch_tuple(torch, r6, rm), hp, args.steps,
                  multigpus=False, validation_flag=True)
    ref_train0 = {
        "total": float(out[0]), "kl_weighted": float(out[1]),
        "rec_6d": float(out[2]), "rec_rot": float(out[3]),
        "rec_pose": float(out[4]),
        "kl_shallow": float(out[9][0].detach()),
        "kl_deep": float(out[9][3].detach()),
    }
    _, m0 = hmvae_forward(model, params,
                          {"rot_6d": jnp.asarray(r6), "rot_mat": jnp.asarray(rm)},
                          jax.random.PRNGKey(1),
                          jnp.asarray(args.steps, jnp.int32), cfg, sample=False)
    our_train0 = {
        "total": float(m0["loss_total"]), "kl_weighted": float(m0["loss_kl"]),
        "rec_6d": float(m0["loss_rec_6d"]), "rec_rot": float(m0["loss_rec_rot"]),
        "rec_pose": float(m0["loss_rec_pose"]),
        "kl_shallow": float(m0["loss_hier_kl_1"]),
        "kl_deep": float(m0["loss_hier_kl_4"]),
    }

    # --- held-out quality eval at convergence: reconstruction losses on
    # fresh (never-trained) batches, each stack through its own forward ---
    hold = []
    for i in range(4):
        rm = R.random(args.batch * T * 24, random_state=900 + i).as_matrix()
        rm = rm.astype(np.float32).reshape(args.batch, T, 24, 3, 3)
        r6 = np.asarray(rot.rotmat_to_rot6d(jnp.asarray(rm)), np.float32)
        hold.append((r6, rm))

    ref_eval = {"rec_pose": [], "rec_6d": [], "rec_rot": []}
    our_eval = {"rec_pose": [], "rec_6d": [], "rec_rot": []}
    with torch.no_grad():
        for r6, rm in hold:
            data = make_batch_tuple(torch, r6, rm)
            out = ref(data, hp, args.steps, multigpus=False,
                      validation_flag=True)
            ref_eval["rec_6d"].append(float(out[2].detach()))
            ref_eval["rec_rot"].append(float(out[3].detach()))
            ref_eval["rec_pose"].append(float(out[4].detach()))
    for r6, rm in hold:
        _, m = hmvae_forward(
            model, params, {"rot_6d": jnp.asarray(r6),
                            "rot_mat": jnp.asarray(rm)},
            jax.random.PRNGKey(1), jnp.asarray(args.steps, jnp.int32), cfg,
            sample=False)
        our_eval["rec_6d"].append(float(m["loss_rec_6d"]))
        our_eval["rec_rot"].append(float(m["loss_rec_rot"]))
        our_eval["rec_pose"].append(float(m["loss_rec_pose"]))

    ref_c = np.asarray(ref_curve)
    our_c = np.asarray(our_curve)
    rel = np.abs(our_c - ref_c) / np.abs(ref_c)
    marks = sorted({0, 1, args.steps // 4, args.steps // 2, args.steps - 1})
    print(json.dumps({
        "steps": args.steps, "batch": args.batch,
        "checkpoints": {str(m): {"ref": round(float(ref_c[m]), 5),
                                 "ours": round(float(our_c[m]), 5)}
                        for m in marks},
        "max_rel_dev": round(float(rel.max()), 5),
        "mean_rel_dev": round(float(rel.mean()), 5),
        "final_ratio": round(float(our_c[-1] / ref_c[-1]), 5),
        "loss_drop_ref": round(float(ref_c[0] / ref_c[-1]), 3),
        "train_batch0_components": {"ref": ref_train0, "ours": our_train0},
        "heldout_recon": {
            k: {"ref": round(float(np.mean(ref_eval[k])), 5),
                "ours": round(float(np.mean(our_eval[k])), 5)}
            for k in ref_eval
        },
        "ref_s_per_step": round(t_ref / args.steps, 4),
        "ours_s_per_step_cpu": round(t_ours / args.steps, 4),
    }))


if __name__ == "__main__":
    main()
