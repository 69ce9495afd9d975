#!/bin/bash
# Steady-state probe of the dpm_solver SD search mode on the real chip:
# pop 6 x 1 epoch x 60 samples/candidate at 512px, DPM-Solver time_step 10
# CFG 7.5, batch 6 (published: search_dpm_solver.sh — pop 50 x 10 x 1000,
# time_step 10, batch 6). The on-chip CLI validation already covered this
# mode at tiny EA scale (BENCH_EXTRAS sd_search_cli_onchip); this run is
# sized to get past compile into a few steady chunks for a s/candidate
# rate, completing the search-hours matrix (plms measured separately).
# Workspace: /tmp/sd_search_hours (make_sd_ckpts.py must have run there).
cd /tmp/sd_search_hours
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
  --sampler dpm_solver --scale 7.5 --H 512 --W 512 --time_step 10 \
  --num_samples 60 --batch_size 6 --candidate_chunk 2 \
  --population_num 6 --select_num 2 --mutation_num 2 --crossover_num 2 \
  --max_epochs 1 \
  --save_dir /tmp/sd_search_hours/logs_dpm
