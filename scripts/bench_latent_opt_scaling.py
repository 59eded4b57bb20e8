"""Latent-opt solve throughput vs window-batch size (one TPU chip).

The solver's decoder fine-tune phase moves ~190 MB of weight+moment HBM
traffic per iteration REGARDLESS of how many windows are batched (weights are
shared), so batching windows amortizes the dominant cost: windows/sec should
rise steeply until activation traffic catches up.  This is the number that
matters for full-test-set evaluation (140 AMASS sequences x ~5 windows each).

Usage: python scripts/bench_latent_opt_scaling.py [--sizes 10 20 40 80 160]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[10, 20, 40, 80, 160])
    ap.add_argument("--opt_it", type=int, default=150)
    args = ap.parse_args()

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
                          train_seq_len=64),
        latent_opt=LatentOptConfig(opt_it=args.opt_it, opt_lr=0.1,
                                   opt_step_size=50, prev_epochs=50,
                                   optimize_decoder=True,
                                   interpolation_window=5))
    model = HMVAE(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 24, 6)))
    solve = make_latent_optimizer(model, cfg)
    tmask = np.asarray(interpolation_mask(64, 5))

    rows = []
    for B in args.sizes:
        aa = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 24, 3)) * 0.3
        targets = _targets_from_rotmat(rot.aa_to_rotmat(aa))
        mask = jnp.asarray(np.tile(tmask[None, :, None], (B, 1, 24)))
        z = init_z(jax.random.PRNGKey(2), cfg, B)
        zr = jax.tree.map(jnp.zeros_like, z)
        # readback fence (axon relay: block_until_ready can return early)
        float(solve(params, targets, mask, z, zr).final_loss.sum())  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(solve(params, targets, mask, z, zr).final_loss.sum())
            best = min(best, time.perf_counter() - t0)
        rows.append({"windows": B, "solve_ms": round(best * 1e3, 1),
                     "windows_per_sec": round(B / best, 1),
                     "ms_per_window": round(best * 1e3 / B, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
