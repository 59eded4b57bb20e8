"""Measure the ACTUAL reference's training-step throughput on this host (CPU).

Replaces BASELINE.md's guessed A100 denominator with a measured anchor: the
reference's own ``TwoHierSAVAEModel`` forward+backward+Adam step (the
``gen_update`` path, ``trainer_motion_vae.py:37-98``) at the flagship len-64
schedule (batch 8, kernel 15), executed by the real reference code imported
from /root/reference (CPU-shimmed via tests/ref_harness.py).

Usage: python scripts/bench_reference_torch.py [--steps 30] [--config len64_no_aug_hm_vae.yaml]
Prints one JSON line with steps/s and seqs/s.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ref_harness import build_vae, load_reference, make_batch_tuple, make_hp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="len64_no_aug_hm_vae.yaml")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = library default)")
    args = ap.parse_args()

    ns = load_reference()
    torch = ns.torch
    if args.threads:
        torch.set_num_threads(args.threads)

    hp = make_hp(args.config)
    model = build_vae(hp)
    model.train()

    # optimizer exactly as the reference trainer builds it
    # (trainer_motion_vae.py:29-35)
    opt = torch.optim.Adam(
        [p for p in model.parameters() if p.requires_grad],
        lr=hp["lr"], weight_decay=hp["weight_decay"])
    from torch.optim import lr_scheduler
    sched = lr_scheduler.StepLR(opt, step_size=hp["step_size"],
                                gamma=hp["gamma"])

    B, T = args.batch, hp["train_seq_len"]
    rng = np.random.default_rng(0)
    # random valid rotations via QR sign-fixed orthogonalization
    raw = rng.standard_normal((B * T * 24, 3, 3)).astype(np.float32)
    q, r = np.linalg.qr(raw)
    q *= np.sign(np.diagonal(r, axis1=1, axis2=2))[:, None, :]
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    rmats = q.reshape(B, T, 24, 3, 3).astype(np.float32)
    r6d = rmats[..., :, :2].transpose(0, 1, 2, 4, 3).reshape(B, T, 24, 6)
    data = make_batch_tuple(torch, r6d, rmats)

    def step(it):
        opt.zero_grad()
        model(data, hp, it, multigpus=False, validation_flag=False)
        opt.step()
        sched.step()

    for i in range(3):  # warmup
        step(i)
    t0 = time.perf_counter()
    for i in range(args.steps):
        step(3 + i)
    dt = time.perf_counter() - t0

    steps_per_s = args.steps / dt
    print(json.dumps({
        "metric": "reference_torch_cpu_train_throughput",
        "config": args.config,
        "batch": B, "seq_len": T,
        "steps_per_s": round(steps_per_s, 3),
        "seqs_per_s": round(steps_per_s * B, 2),
        "ms_per_step": round(1000 * dt / args.steps, 2),
        "torch_threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
