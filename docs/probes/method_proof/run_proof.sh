#!/bin/bash
# Method-level proof (VERDICT r3 "What's missing" #1): demonstrate that the
# rebuilt evolutionary search descends a REAL generative-quality landscape.
#
# Pipeline (workspace /tmp/method_proof, on the real chip):
#   1. make_dataset.py       synthesize a structured 32x32 image family
#   2. adt train             train a small uncond ADM UNet to convergence
#   3. adt ref-stats         FID reference stats from 10k held-out images
#   4. adt search            timestep-only EA, K=4, DDIM-seeded population
#   5. eval_schedules.py     fresh-seed re-eval: searched-4 vs uniform DDIM-4
#                            (margin vs eval noise), plus the deployment-path
#                            reproduction: adt sample --use_timestep + adt
#                            evaluate must agree with the search-time fitness
#
# Matches search_imagenet64_classifier_guidance.py:521-584 (EA over a real
# FID landscape) and README.md:5 (searched-K beats uniform DDIM-K).
set -euo pipefail
WS=/tmp/method_proof
HERE="$(cd "$(dirname "$0")" && pwd)"
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
adt() { python -c "
import sys
from autodiffusion_tpu.cli.main import main
sys.exit(main())
" "$@"; }

MODEL_FLAGS=(--image_size 32 --num_channels 64 --num_res_blocks 2
  --attention_resolutions "16,8" --class_cond False --learn_sigma True
  --noise_schedule cosine)

stage="${1:-all}"

if [[ "$stage" == all || "$stage" == data ]]; then
  python "$HERE/make_dataset.py" --out "$WS" --n_train 20000 --n_ref 10000
fi

if [[ "$stage" == all || "$stage" == train ]]; then
  adt train --data_dir "$WS/train_images.npy" --save_dir "$WS/train" \
    "${MODEL_FLAGS[@]}" --dropout 0.1 --batch_size 128 --lr 1e-4 \
    --ema_rate 0.999 --max_steps 20000 --save_interval 5000 \
    --log_interval 200 --seed 7
fi

if [[ "$stage" == all || "$stage" == refstats ]]; then
  adt ref-stats --images "$WS/ref_images.npz" --out "$WS/ref_stats.npz" \
    --inception_path "$WS/pt_inception.pth" --batch_size 100
fi

EMA_CKPT="$WS/train/ema_0.999_020000.msgpack"

if [[ "$stage" == all || "$stage" == search ]]; then
  adt search --model_path "$EMA_CKPT" --ref_stats "$WS/ref_stats.npz" \
    --inception_path "$WS/pt_inception.pth" --save_dir "$WS/search" \
    "${MODEL_FLAGS[@]}" --use_bf16 True \
    --time_step 4 --num_samples 512 --batch_size 128 --candidate_chunk 2 \
    --population_num 16 --select_num 6 --mutation_num 8 --crossover_num 5 \
    --max_epochs 6 --use_ddim_init_x True --seed 0 \
    | tee "$WS/search_result.json"
fi

if [[ "$stage" == all || "$stage" == eval ]]; then
  python "$HERE/eval_schedules.py" --workspace "$WS" --ema "$EMA_CKPT" \
    --repeats 5 --num_samples 512 --batch_size 128
fi
