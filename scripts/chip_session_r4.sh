#!/bin/bash
# Round-4 chip session: run when the axon relay is back.
#   bash scripts/chip_session_r4.sh [outdir]
# Captures, in order of value:
#   1. BENCH_r04 candidate (bench.py full line: headline + roofline +
#      compact-layout figures)
#   2. step decomposition dense vs compact (profile_train_step.py)
#   3. latent-opt solve scaling sanity (existing script, unchanged protocol)
# Leaves everything under $OUT; copy the bench line into BENCH_r04.json is
# the DRIVER's job — this script only gathers evidence for BASELINE.md.
set -u
OUT=${1:-outputs/chip_r4}
mkdir -p "$OUT"

echo "== probe =="
if ! timeout 90 python -c "import jax; assert jax.default_backend() != 'cpu', jax.default_backend(); print(jax.devices())"; then
  echo "relay still down — aborting (nothing written)"; exit 1
fi

echo "== 1. bench.py (full) =="
timeout 2700 python bench.py | tee "$OUT/bench_line.json"

echo "== 2. step decomposition: dense =="
timeout 1200 python scripts/profile_train_step.py --quick \
  | tee "$OUT/profile_dense.json"
echo "== 2b. step decomposition: compact =="
timeout 1200 python scripts/profile_train_step.py --quick \
  --param_layout compact | tee "$OUT/profile_compact.json"
echo "== 2c. compact + bf16 moments =="
timeout 1200 python scripts/profile_train_step.py --quick \
  --param_layout compact --moment_dtype bfloat16 \
  | tee "$OUT/profile_compact_bf16m.json"

echo "== 3. latent-opt window scaling (10/40/160) =="
timeout 1800 python scripts/bench_latent_opt_scaling.py \
  | tee "$OUT/latent_opt_scaling.json" || true
echo "== 3b. same, compact layout =="
timeout 1800 python scripts/bench_latent_opt_scaling.py \
  --param_layout compact --sizes 10 40 160 \
  | tee "$OUT/latent_opt_scaling_compact.json" || true

echo "== done: evidence in $OUT =="
echo "next: update BASELINE.md rows; if compact >= dense, flip"
echo "configs/len64_production.yaml to param_layout: compact"
