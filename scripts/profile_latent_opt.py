"""Profile the latent-opt solve: where do the 150 iterations spend time?

All variants carry the optimized state through the scan (z updated by SGD),
so XLA cannot hoist the body out of the loop (loop-invariant code motion made
a first version of this script report nonsense).  Every timing blocks per
call.

Usage: python scripts/profile_latent_opt.py [--windows 10] [--opt_it 150]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--opt_it", type=int, default=150)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hm_vae_tpu.apps.latent_opt import init_z, make_latent_optimizer
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat, interpolation_mask
    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.ops import fk as fk_mod
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.utils.config import Config, LatentOptConfig, ModelConfig

    cfg = Config(
        model=ModelConfig(latent_d=24, shallow_latent_d=12, kernel_size=15,
                          train_seq_len=64),
        latent_opt=LatentOptConfig(opt_it=args.opt_it, opt_lr=0.1,
                                   opt_step_size=50, prev_epochs=50,
                                   optimize_decoder=True,
                                   interpolation_window=5),
    )
    model = HMVAE(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 24, 6)))
    dec_sub = {"params": {"decoder": params["params"]["decoder"]}}

    B = args.windows
    aa = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 24, 3)) * 0.3
    mats = rot.aa_to_rotmat(aa)
    targets = _targets_from_rotmat(mats)
    tmask = interpolation_mask(64, 5)
    mask = jnp.asarray(np.tile(tmask[None, :, None], (B, 1, 24)))
    z = init_z(jax.random.PRNGKey(2), cfg, B)
    zr = jax.tree.map(jnp.zeros_like, z)
    offsets = fk_mod.default_offsets()

    def timeit(fn, *a, iters=5):
        jax.block_until_ready(fn(*a))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000  # ms

    results = {}

    solve = make_latent_optimizer(model, cfg)
    results["full_solve_ms"] = timeit(
        lambda: solve(params, targets, mask, z, zr).final_loss)

    lat_nodec = dataclasses.replace(cfg.latent_opt, optimize_decoder=False)
    solve_nodec = make_latent_optimizer(model, cfg, lat=lat_nodec)
    results["z_only_solve_ms"] = timeit(
        lambda: solve_nodec(params, targets, mask, z, zr).final_loss)

    m6 = mask[..., None]
    mm = mask[..., None, None]

    def make_sgd_scan(loss_fn):
        def run(zz):
            def body(zc, _):
                g = jax.grad(loss_fn)(zc)
                return jax.tree.map(lambda a, b: a - 0.01 * b, zc, g), None
            zf, _ = jax.lax.scan(body, zz, None, length=args.opt_it)
            return zf[0]
        return jax.jit(run)

    # full chain: decode -> rotmat -> FK, all three losses
    def loss_full(zz):
        out6d = model.apply(dec_sub, zz, method=HMVAE.decode)
        rm = rot.rot6d_to_rotmat(out6d)
        pose = fk_mod.fk_from_rotmat(rm, offsets)
        return (jnp.mean((out6d - targets["rot_6d"]) ** 2 * m6)
                + jnp.mean((rm - targets["rot_mat"]) ** 2 * mm)
                + 10 * jnp.mean((pose - targets["pose"]) ** 2 * m6))

    # no FK: decode -> rotmat losses only
    def loss_nofk(zz):
        out6d = model.apply(dec_sub, zz, method=HMVAE.decode)
        rm = rot.rot6d_to_rotmat(out6d)
        return (jnp.mean((out6d - targets["rot_6d"]) ** 2 * m6)
                + jnp.mean((rm - targets["rot_mat"]) ** 2 * mm))

    # decoder only: 6D loss
    def loss_deconly(zz):
        out6d = model.apply(dec_sub, zz, method=HMVAE.decode)
        return jnp.mean((out6d - targets["rot_6d"]) ** 2 * m6)

    results["sgd_full_chain_ms"] = timeit(make_sgd_scan(loss_full), z)
    results["sgd_no_fk_ms"] = timeit(make_sgd_scan(loss_nofk), z)
    results["sgd_decode_6d_only_ms"] = timeit(make_sgd_scan(loss_deconly), z)

    results = {k: round(v, 1) for k, v in results.items()}
    results["windows"] = B
    results["opt_it"] = args.opt_it
    results["per_iter_full_us"] = round(
        results["full_solve_ms"] / args.opt_it * 1000, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
