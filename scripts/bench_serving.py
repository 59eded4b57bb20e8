"""Serving-latency microbench for exported StableHLO bundles.

Measures the deserialized ``reconstruct`` artifact (apps/export.py) the way a
serving frontend would run it: batch-1 latency and large-batch throughput,
f32 vs bf16 bundles side by side.  Readback-fenced (``np.asarray`` of the
output) — see BASELINE.md "Measurement trap" for why block_until_ready is
not trusted through the axon relay.

Usage: python scripts/bench_serving.py [--batch 64] [--iters 50] [--seq_len 64]
Emits one JSON line; paste into BASELINE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--seq_len", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sanity runs)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from hm_vae_tpu.apps.export import export_bundle, load_exported
    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.utils.config import Config, ModelConfig

    # the production len-64 shape (configs/len64_no_aug_hm_vae.yaml)
    cfg = Config(model=ModelConfig(latent_d=24, shallow_latent_d=12,
                                   kernel_size=15,
                                   train_seq_len=args.seq_len))
    model = HMVAE(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, args.seq_len, 24, 6)))

    rng = np.random.default_rng(0)
    aa = rng.normal(size=(args.batch, args.seq_len, 24, 3)) * 0.3
    x = np.asarray(rot.rotmat_to_rot6d(rot.aa_to_rotmat(
        jnp.asarray(aa, jnp.float32))))

    def run(fn, xb, iters, warmup):
        for _ in range(warmup):
            np.asarray(fn.call(jnp.asarray(xb))[0])  # readback fence
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn.call(jnp.asarray(xb))
            np.asarray(out[0])
        return (time.perf_counter() - t0) / iters

    results = {}
    with tempfile.TemporaryDirectory() as d:
        for dt in ("float32", "bfloat16"):
            out_dir = os.path.join(d, dt)
            m = export_bundle(out_dir, model, params, cfg,
                              platforms=(jax.default_backend(),),
                              serve_dtype=dt)
            fns = load_exported(out_dir)
            lat1 = run(fns["reconstruct"], x[:1], args.iters, args.warmup)
            latb = run(fns["reconstruct"], x, args.iters, args.warmup)
            results[dt] = {
                "artifact_mb": round(
                    m["functions"]["reconstruct"]["bytes"] / 1e6, 1),
                "batch1_latency_ms": round(lat1 * 1e3, 3),
                f"batch{args.batch}_latency_ms": round(latb * 1e3, 3),
                f"batch{args.batch}_seqs_per_sec": round(args.batch / latb, 1),
            }

    print(json.dumps({
        "bench": "serving_reconstruct_exported_bundle",
        "platform": jax.default_backend(),
        "seq_len": args.seq_len,
        "iters": args.iters,
        **results,
    }))


if __name__ == "__main__":
    main()
