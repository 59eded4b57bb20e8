#!/bin/bash
# Round-5 chip session — the evidence VERDICT r4 asked for, in value order:
#   bash scripts/chip_session_r5.sh [outdir]
#   1. BENCH_r05 candidate: headline as MEDIAN-of-5 fenced windows with
#      min/max band (classifiable regression-vs-noise), bf16-param-storage
#      mode (stochastic rounding), reconciled HBM floors (2P+2O hard /
#      4P+2O w-grads), compact figures, latent-opt variants incl. bf16 clone
#   2. compact-layout DECISION data: full step decomposition dense vs
#      compact incl. weight_prep_us (the number NEXT.md gates the fused
#      Pallas expander on; --quick now measures it too)
#   3. bf16-param step decomposition (where the halved weight stream lands)
#   4. latent-opt window scaling f32 vs bf16 clone (does ms/window fall
#      again with window count?)
set -u
OUT=${1:-outputs/chip_r5}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 90 python -c "import jax; assert jax.default_backend() != 'cpu', jax.default_backend(); print(jax.devices())"; then
  echo "relay down — aborting (nothing written)"; exit 1
fi

echo "== 1. bench.py (full) =="
timeout 3600 python bench.py | tee "$OUT/bench_line.json"

echo "== 2. step decomposition: dense (full, incl. weight_prep) =="
timeout 1800 python scripts/profile_train_step.py \
  | tee "$OUT/profile_dense.json"
echo "== 2b. compact (full, incl. weight_prep — the decision number) =="
timeout 1800 python scripts/profile_train_step.py --param_layout compact \
  | tee "$OUT/profile_compact.json"

echo "== 3. bf16 param storage decomposition =="
timeout 1800 python scripts/profile_train_step.py --quick \
  --param_dtype bfloat16 --moment_dtype bfloat16 \
  | tee "$OUT/profile_bf16_params.json"

echo "== 4. latent-opt scaling: f32 vs bf16 clone =="
timeout 2400 python scripts/bench_latent_opt_scaling.py --sizes 10 20 40 80 \
  | tee "$OUT/latent_opt_scaling_f32.json" || true
timeout 2400 python scripts/bench_latent_opt_scaling.py --sizes 10 20 40 80 \
  --opt_param_dtype bfloat16 --opt_moment_dtype bfloat16 \
  | tee "$OUT/latent_opt_scaling_bf16.json" || true

echo "== done: evidence in $OUT =="
echo "next: BASELINE.md rows (bf16-params headline, compact verdict,"
echo "bf16-clone scaling); quality A/B via cli.eval_recovery"
echo "--opt_param_dtype bfloat16 on the eval141 split needs a trained ckpt"
