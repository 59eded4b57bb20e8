"""Benchmark harness: len-64 hm-vae training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seqs/sec", "vs_baseline": N}

Measured at the reference's own training configuration — batch 8, seq len 64,
kernel 15, full loss (two FK passes, KL curriculum), Adam + StepLR — with the
framework's production dispatch path: K=32 gradient steps per device dispatch
via ``lax.scan`` (hm_vae_tpu.train.train_step.make_multi_step).  Every scanned
step is a complete, sequential optimizer update; only the host round-trips are
amortised.

Baseline: the reference publishes no numbers (BASELINE.md); the provisional
denominator is 2000 seqs/sec — an estimate of the PyTorch reference on A100 at
this schedule.  North star is vs_baseline >= 2.0.
"""

import json
import sys
import time

BASELINE_SEQS_PER_SEC = 2000.0  # provisional A100/PyTorch estimate (BASELINE.md)


def main(batch_size: int = 8, steps_per_call: int = 32, calls: int = 30,
         warmup: int = 3) -> None:
    import jax

    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.train.train_step import create_state, make_multi_step
    from hm_vae_tpu.utils.config import Config, ModelConfig
    from hm_vae_tpu.ops import rotations as rot

    cfg = Config(model=ModelConfig(latent_d=24, shallow_latent_d=12,
                                   kernel_size=15, train_seq_len=64))
    model = HMVAE(cfg.model)
    state = create_state(model, cfg, jax.random.PRNGKey(0))
    mstep = jax.jit(make_multi_step(model, cfg), donate_argnums=(0,))

    aa = jax.random.normal(
        jax.random.PRNGKey(1), (steps_per_call, batch_size, 64, 24, 3)) * 0.3
    mats = rot.aa_to_rotmat(aa)
    batches = {"rot_6d": rot.rotmat_to_rot6d(mats), "rot_mat": mats}
    batches = jax.tree.map(jax.device_put, batches)
    rng = jax.random.PRNGKey(2)

    for i in range(warmup):
        state, metrics = mstep(state, batches, jax.random.fold_in(rng, i))
    jax.block_until_ready(metrics["loss_total"])

    t0 = time.perf_counter()
    for i in range(calls):
        state, metrics = mstep(state, batches,
                               jax.random.fold_in(rng, 1000 + i))
    jax.block_until_ready(metrics["loss_total"])
    dt = time.perf_counter() - t0

    seqs_per_sec = batch_size * steps_per_call * calls / dt
    print(json.dumps({
        "metric": "len64_hmvae_train_throughput_bs8",
        "value": round(seqs_per_sec, 2),
        "unit": "seqs/sec",
        "vs_baseline": round(seqs_per_sec / BASELINE_SEQS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    main(batch_size=bs)
