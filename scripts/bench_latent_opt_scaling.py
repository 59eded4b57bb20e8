"""Latent-opt solve throughput vs window-batch size (one TPU chip).

The solver's decoder fine-tune phase moves ~190 MB of weight+moment HBM
traffic per iteration REGARDLESS of how many windows are batched (weights are
shared), so batching windows amortizes the dominant cost: windows/sec rises
steeply until activation traffic catches up.  This is the number that matters
for full-test-set evaluation (140 AMASS sequences x ~5 windows each).

Reuses bench.py's bench_latent_opt (same config, targets, readback-fenced
best-of-3 timing) — one measurement implementation, swept over batch sizes.

Usage: python scripts/bench_latent_opt_scaling.py [--sizes 10 20 40 80 160]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[10, 20, 40, 80, 160])
    ap.add_argument("--opt_it", type=int, default=150)
    ap.add_argument("--param_layout", default="dense",
                    help="dense | compact (models/param_layout.py)")
    ap.add_argument("--opt_param_dtype", default="float32",
                    help="float32 | bfloat16 decoder-clone storage "
                         "(LatentOptConfig.opt_param_dtype)")
    ap.add_argument("--opt_moment_dtype", default="float32",
                    help="float32 | bfloat16 solver Adam moments")
    ap.add_argument("--finetune_scope", default="full",
                    help="full | last_conv | heads (LatentOptConfig)")
    args = ap.parse_args()

    from bench import bench_latent_opt

    rows = []
    for B in args.sizes:
        ms = bench_latent_opt(windows=B, opt_it=args.opt_it,
                              param_layout=args.param_layout,
                              opt_param_dtype=args.opt_param_dtype,
                              opt_moment_dtype=args.opt_moment_dtype,
                              finetune_scope=args.finetune_scope)
        rows.append({"windows": B, "solve_ms": round(ms, 1),
                     "windows_per_sec": round(B / (ms / 1e3), 1),
                     "ms_per_window": round(ms / B, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"table": rows, "param_layout": args.param_layout,
                      "opt_param_dtype": args.opt_param_dtype,
                      "opt_moment_dtype": args.opt_moment_dtype,
                      "finetune_scope": args.finetune_scope}))


if __name__ == "__main__":
    main()
