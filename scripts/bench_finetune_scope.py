"""Solve time vs latent_opt.finetune_scope (per-window decoder clones).

The per-window-clone interpolation solve is bounded by per-window decoder
weight+moment HBM traffic (~190 MB/window/iteration for the full decoder —
BASELINE.md).  finetune_scope shrinks the cloned/optimized subtree:
  full       27.6 MB/window   (reference deepcopy semantics)
  last_conv   5.0 MB/window
  heads       0.14 MB/window
This sweep measures the realized solve time per scope; quality A/B lives in
BASELINE.md ("fine-tune scope").

Reuses bench.py's bench_latent_opt (readback-fenced best-of-3).

Usage: python scripts/bench_finetune_scope.py [--windows 10] [--opt_it 150]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--opt_it", type=int, default=150)
    ap.add_argument("--scopes", nargs="+",
                    default=["full", "last_conv", "heads"])
    args = ap.parse_args()

    from bench import bench_latent_opt

    rows = []
    for scope in args.scopes:
        ms = bench_latent_opt(windows=args.windows, opt_it=args.opt_it,
                              finetune_scope=scope)
        rows.append({"finetune_scope": scope, "windows": args.windows,
                     "solve_ms": round(ms, 1),
                     "ms_per_window": round(ms / args.windows, 2)})
        print(json.dumps(rows[-1]), flush=True)

    print(json.dumps({"table": rows}))


if __name__ == "__main__":
    main()
