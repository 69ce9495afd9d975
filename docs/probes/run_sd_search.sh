#!/bin/bash
# Half-scale SD search-hours run on the real chip: pop 12 x 2 epochs x
# 120 samples/candidate at 512px, PLMS-4 CFG 7.5, batch 6
# (published: pop 50 x 10 x 1000-2000, batch 6 — sd/search_plms.sh).
# Workspace: copy this + make_sd_ckpts.py to /tmp/sd_search_hours and run
# make_sd_ckpts.py there first (it writes next to itself).
set -euo pipefail
cd /tmp/sd_search_hours || exit 1
# invoke the `adt` console script through the package path (the package
# is not pip-installed in this environment)
# NB: append, don't clobber — PYTHONPATH carries the axon TPU plugin
# site dir in this environment
exec env PYTHONPATH="/root/repo:${PYTHONPATH:-}" python -c "
import sys
from autodiffusion_tpu.cli.main import main
sys.exit(main())
" search-sd \
  --ckpt sd_ckpt \
  --clip_vocab vocab.json --clip_merges merges.txt \
  --captions captions.json --num_prompts 128 \
  --inception_path pt_inception.pth \
  --ref_stats ref_stats.npz \
  --sampler plms --scale 7.5 --H 512 --W 512 --time_step 4 \
  --num_samples 120 --batch_size 6 --candidate_chunk 2 \
  --population_num 12 --select_num 4 --mutation_num 6 --crossover_num 4 \
  --max_epochs 2 \
  --save_dir /tmp/sd_search_hours/logs
