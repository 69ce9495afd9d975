#!/bin/bash
# Full-candidate-scale search-hours validation (VERDICT r3 #5): one EA
# epoch of `adt search` at the PUBLISHED per-candidate size — batch 100,
# 5000 samples/candidate, DDIM-4 — pop 20 to bound wall time (published:
# pop 50 x 10 epochs, search_imagenet64_classifier_guidance.sh:2-22).
# Confirms the 62 s/candidate steady state and flat RSS through the full
# CLI instead of the isolated bench, validating the 9.6 h extrapolation
# in BENCH_EXTRAS.json `search_hours`.
#
# Workspace: /tmp/search_hours (fabricated full-scale checkpoints from
# make_ckpts.py, same as the half-scale runs).
set -euo pipefail
cd /tmp/search_hours || exit 1
exec env PYTHONPATH="/root/repo:${PYTHONPATH:-}" python -c "
import sys
from autodiffusion_tpu.cli.main import main
sys.exit(main())
" search \
  --model_path model.msgpack \
  --classifier_path classifier.msgpack \
  --inception_path pt_inception.pth \
  --ref_stats ref_stats.npz \
  --num_samples 5000 --batch_size 100 --candidate_chunk 4 \
  --population_num 20 --select_num 5 --mutation_num 10 --crossover_num 6 \
  --max_epochs 1 --time_step 4 --classifier_scale 1.0 \
  --save_dir /tmp/search_hours/logs_full_candidate
