"""Decompose the bs-8 len-64 train step: where does the time go?

Methodology (both traps bit earlier versions of this script):
- The axon relay adds ~30 ms of round-trip latency to an isolated dispatch.
  Timing queues C jitted calls back-to-back (each call = K scanned
  iterations, each call's input is the previous call's output) and fences
  ONCE at the end with a host readback, so the floor is paid once over
  C*K iterations.  An empty-scan control measures the residual bias.
- XLA dead-code-eliminates any work not contributing to the fenced value —
  including per-leaf Adam updates when only one leaf is read.  Every variant
  carries its full tree through the chain and the fence reduces over ALL
  leaves.

Usage: python scripts/profile_train_step.py [--batch 8] [--k 64] [--calls 6]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--calls", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--moment_dtype", default="float32")
    ap.add_argument("--param_dtype", default="float32",
                    help="float32 | bfloat16 (SR write-back, train/optim.py)")
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--param_layout", default="dense",
                    help="dense | compact (models/param_layout.py)")
    ap.add_argument("--quick", action="store_true",
                    help="only empty/full/adam variants")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from hm_vae_tpu.models.hm_vae import HMVAE, prior_z_list
    from hm_vae_tpu.ops import fk as fk_mod
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.train.losses import hmvae_forward
    from hm_vae_tpu.train.optim import make_optimizer
    from hm_vae_tpu.train.train_step import create_state, make_train_step
    from hm_vae_tpu.utils.config import Config, ModelConfig

    from hm_vae_tpu.utils.config import OptimConfig
    cfg = Config(
        model=ModelConfig(latent_d=24, shallow_latent_d=12, kernel_size=15,
                          train_seq_len=64, compute_dtype=args.compute_dtype,
                          param_layout=args.param_layout),
        optim=OptimConfig(moment_dtype=args.moment_dtype,
                          param_dtype=args.param_dtype))
    model = HMVAE(cfg.model)
    B, K, C = args.batch, args.k, args.calls

    aa = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 24, 3)) * 0.3
    mats = rot.aa_to_rotmat(aa)
    batch = {"rot_6d": rot.rotmat_to_rot6d(mats), "rot_mat": mats}
    state = create_state(model, cfg, jax.random.PRNGKey(0))
    params = state.params
    tx = make_optimizer(cfg.optim)
    rng = jax.random.PRNGKey(7)
    offsets = fk_mod.default_offsets()

    n_params = sum(x.size for x in jax.tree.leaves(params))

    reduce_all = jax.jit(
        lambda tree: sum(jnp.sum(x) for x in jax.tree.leaves(tree)))

    def timeit(fn, carry0):
        fn_j = jax.jit(fn)
        c = fn_j(carry0)
        float(reduce_all(c))  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            c = carry0
            t0 = time.perf_counter()
            for _ in range(C):
                c = fn_j(c)
            float(reduce_all(c))
            best = min(best, time.perf_counter() - t0)
        return best * 1e6 / (C * K)  # us per scanned iteration

    results = {}

    # ---- control: empty K-iteration scan ----
    def empty(s0):
        def body(s, _):
            return s * 1.0000001 + 1e-20, None
        s, _ = jax.lax.scan(body, s0, None, length=K)
        return s

    results["empty_scan_us"] = timeit(empty, jnp.ones(()))

    # ---- full production step: fwd + bwd + Adam ----
    step = make_train_step(model, cfg)

    def full(st):
        def body(s, i):
            s2, _ = step(s, batch, jax.random.fold_in(rng, i))
            return s2, None
        st2, _ = jax.lax.scan(body, st, jnp.arange(K))
        return st2

    results["full_step_us"] = timeit(full, state)

    # ---- forward only ----
    def fwd_only(s0):
        def body(s, i):
            bb = jax.tree.map(lambda x: x + s * 1e-20, batch)
            loss, _ = hmvae_forward(model, params, bb,
                                    jax.random.fold_in(rng, i),
                                    jnp.zeros((), jnp.int32), cfg)
            return loss, None
        s, _ = jax.lax.scan(body, s0, jnp.arange(K))
        return s

    results["fwd_only_us"] = timeit(fwd_only, jnp.zeros(()))

    # ---- forward + backward, no optimizer ----
    def loss_fn(p, i):
        loss, _ = hmvae_forward(model, p, batch, jax.random.fold_in(rng, i),
                                jnp.zeros((), jnp.int32), cfg)
        return loss

    def fwd_bwd(p0):
        def body(p, i):
            g = jax.grad(loss_fn)(p, i)
            return jax.tree.map(
                lambda a, c: a + (1e-20 * c).astype(a.dtype), p, g), None
        p, _ = jax.lax.scan(body, p0, jnp.arange(K))
        return p

    results["fwd_bwd_us"] = timeit(fwd_bwd, params)

    # ---- optimizer only: Adam chain over the full param tree ----
    opt0 = tx.init(params)

    def adam_only(carry0):
        def body(carry, _):
            p, opt = carry
            grads = jax.tree.map(lambda x: x * 1e-7, p)
            upd, opt = tx.update(grads, opt, p)
            return (optax.apply_updates(p, upd), opt), None
        c, _ = jax.lax.scan(body, carry0, None, length=K)
        return c

    results["adam_only_us"] = timeit(adam_only, (params, opt0))

    # ---- weight prep only: the per-call weight transform for all 8 convs —
    # dense: mask-mul + pool/unpool fold; compact: expander gather + fold
    # (mirrors SkeletonConv.__call__, models/hm_vae.py).  In --quick too:
    # this is the number that gates the compact-layout / fused-Pallas
    # decision (NEXT.md) ----
    from hm_vae_tpu.models import param_layout as pl
    from hm_vae_tpu.models.structure import get_structure
    st_meta = get_structure(cfg.model)

    def wprep(p0):
        def body(p, _):
            acc = 0.0
            pt = p["params"]
            for scope, levels, fold in (
                ("encoder", st_meta.encoder_levels, "pool"),
                ("decoder", st_meta.decoder_levels, "unpool"),
            ):
                for i, lvl in enumerate(levels):
                    leaf = pt[scope][f"conv_{i}"]
                    if pl.is_compact_spec(lvl.conv, args.param_layout):
                        wm = pl.expander(lvl.conv)(leaf["weight_c"])
                    elif lvl.conv.mask.all():
                        wm = leaf["weight"]
                    else:
                        wm = leaf["weight"] * jnp.asarray(
                            lvl.conv.mask)[:, :, None]
                    if fold == "pool" and lvl.pool_matrix is not None:
                        P = jnp.asarray(lvl.pool_matrix, wm.dtype)
                        wm = jnp.einsum("qo,ock->qck", P, wm)
                    if fold == "unpool" and getattr(lvl, "unpool_matrix",
                                                    None) is not None:
                        U = jnp.asarray(lvl.unpool_matrix, wm.dtype)
                        wm = jnp.einsum("ock,cp->opk", wm, U)
                    acc = acc + jnp.sum(wm ** 2)
            return jax.tree.map(
                lambda x: x + (1e-20 * acc).astype(x.dtype), p), None
        p, _ = jax.lax.scan(body, p0, None, length=K)
        return p

    results["weight_prep_us"] = timeit(wprep, params)

    if args.quick:
        floor = results["empty_scan_us"]
        results = {k: round(v, 1) for k, v in results.items()}
        results["net"] = {k: round(v - floor, 1) for k, v in results.items()
                          if k.endswith("_us") and k != "empty_scan_us"}
        results.update(batch=B, steps_per_dispatch=K, calls=C,
                       moment_dtype=args.moment_dtype,
                       param_dtype=args.param_dtype,
                       compute_dtype=args.compute_dtype,
                       param_layout=args.param_layout)
        print(json.dumps(results))
        return

    # ---- FK fwd only (the pose-target pass) ----
    def fk_fwd(m0):
        def body(m, _):
            pose = fk_mod.fk_from_rotmat(m, offsets)
            return m + 1e-20 * jnp.mean(pose), None
        m, _ = jax.lax.scan(body, m0, None, length=K)
        return m

    results["fk_fwd_us"] = timeit(fk_fwd, mats)

    # ---- output chain fwd+bwd wrt out6d: 6d->rotmat->FK + 3 losses ----
    pose_gt = fk_mod.fk_from_rotmat(mats, offsets)

    def chain(o0):
        def closs(o):
            rm = rot.rot6d_to_rotmat(o)
            pose = fk_mod.fk_from_rotmat(rm, offsets)
            return (jnp.mean((o - batch["rot_6d"]) ** 2)
                    + jnp.mean((rm - mats) ** 2)
                    + jnp.mean((pose - pose_gt) ** 2))

        def body(o, _):
            g = jax.grad(closs)(o)
            return o + 1e-20 * g, None
        o, _ = jax.lax.scan(body, o0, None, length=K)
        return o

    results["rot_fk_chain_fwd_bwd_us"] = timeit(chain, batch["rot_6d"])

    # ---- encoder fwd+bwd wrt params ----
    def enc_only(p0):
        def eloss(p):
            _, zs = model.apply(p, batch["rot_6d"], method=HMVAE.encode)
            return sum(jnp.mean(z ** 2) for z in zs)

        def body(p, _):
            g = jax.grad(eloss)(p)
            return jax.tree.map(
                lambda a, c: a + (1e-20 * c).astype(a.dtype), p, g), None
        p, _ = jax.lax.scan(body, p0, None, length=K)
        return p

    results["encoder_fwd_bwd_us"] = timeit(enc_only, params)

    # ---- decoder fwd+bwd wrt params ----
    zs0 = prior_z_list(jax.random.PRNGKey(3), cfg.model, B)

    def dec_only(p0):
        def dloss(p):
            o = model.apply(p, zs0, method=HMVAE.decode)
            return jnp.mean((o - batch["rot_6d"]) ** 2)

        def body(p, _):
            g = jax.grad(dloss)(p)
            return jax.tree.map(
                lambda a, c: a + (1e-20 * c).astype(a.dtype), p, g), None
        p, _ = jax.lax.scan(body, p0, None, length=K)
        return p

    results["decoder_fwd_bwd_us"] = timeit(dec_only, params)

    floor = results["empty_scan_us"]
    results = {k: round(v, 1) for k, v in results.items()}
    results["net"] = {k: round(v - floor, 1) for k, v in results.items()
                      if k.endswith("_us") and k != "empty_scan_us"}
    results.update(batch=B, steps_per_dispatch=K, calls=C, n_params=n_params,
                   param_layout=args.param_layout)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
