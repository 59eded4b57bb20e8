#!/bin/bash
# Round-5 quality A/Bs on the eval141 split (VERDICT r4 item 3):
#   bash scripts/quality_ab_r5.sh <ckpt_dir> [outdir]
# Replicates the round-3 interpolation protocol (141-sequence synthetic test
# split data/eval141, 30k-step production-config checkpoint, reference
# schedule 150 iters / decoder fine-tune after 50, --chunk 32,
# --batch_across_seqs) and A/Bs the round-5 solver byte levers:
#   1. f32 per-window clones           (round-3 figure of record: 0.0424)
#   2. bf16 clone + bf16 moments       (-29% solve time — quality cost?)
#   3. last_conv scope + bf16          (~5x less clone traffic — quality cost?)
#   4. completion + generation legs    (record rows for the new checkpoint)
set -u
CKPT=${1:?checkpoint dir}
OUT=${2:-outputs/eval_r5}
mkdir -p "$OUT"
COMMON="--config configs/len64_production.yaml --test_model $CKPT \
  --data_root data/eval141 --chunk 32"

echo "== 1. interpolation, f32 per-window (record protocol) =="
# NOTE: len64_production.yaml now defaults opt_param/moment_dtype to
# bfloat16 (the round-5 production flip) — pin f32 explicitly so this leg
# stays the f32 control rather than silently duplicating leg 2.
timeout 3000 python -m hm_vae_tpu.cli.eval_recovery $COMMON \
  --final_try_long_seq_interpolation --batch_across_seqs \
  --opt_param_dtype float32 --opt_moment_dtype float32 \
  --output_path "$OUT/interp_f32" 2>&1 | tail -3
echo "== 2. interpolation, bf16 clone + moments =="
timeout 3000 python -m hm_vae_tpu.cli.eval_recovery $COMMON \
  --final_try_long_seq_interpolation --batch_across_seqs \
  --opt_param_dtype bfloat16 --opt_moment_dtype bfloat16 \
  --output_path "$OUT/interp_bf16" 2>&1 | tail -3
echo "== 3. interpolation, last_conv scope + bf16 =="
timeout 3000 python -m hm_vae_tpu.cli.eval_recovery $COMMON \
  --final_try_long_seq_interpolation --batch_across_seqs \
  --finetune_scope last_conv \
  --opt_param_dtype bfloat16 --opt_moment_dtype bfloat16 \
  --output_path "$OUT/interp_lastconv_bf16" 2>&1 | tail -3
echo "== 4. completion (record) =="
timeout 3000 python -m hm_vae_tpu.cli.eval_recovery $COMMON \
  --final_motion_completion_long_seq \
  --output_path "$OUT/completion_f32" 2>&1 | tail -3
echo "== 5. interpolation, lora scope (rank 16, split-conv adapters) =="
timeout 3000 python -m hm_vae_tpu.cli.eval_recovery $COMMON \
  --final_try_long_seq_interpolation --batch_across_seqs \
  --finetune_scope lora \
  --output_path "$OUT/interp_lora" 2>&1 | tail -3

echo "== summaries =="
for d in interp_f32 interp_bf16 interp_lastconv_bf16 completion_f32 \
         interp_lora; do
  echo "-- $d"; find "$OUT/$d" -name summary.json -exec cat {} \;
done
