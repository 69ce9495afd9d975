#!/bin/bash
# Half-scale JOINT (timestep+arch) search-hours run on the real chip:
# pop 20 x 2 epochs x 500 samples/candidate, time_step 10, progressive
# pruning 0 -> 0.1 (published: pop 50 x 15 x 1000,
# search_dynamic_unet_imagenet64_classifier_guidance_progressive.sh).
cd /tmp/search_hours
exec adt search \
  --model_path model.msgpack \
  --classifier_path classifier.msgpack \
  --inception_path pt_inception.pth \
  --ref_stats ref_stats.npz \
  --use_dynamic_unet True --index_step 580 --max_prun 0.1 --min_prun 0.0 \
  --num_samples 500 --batch_size 100 --candidate_chunk 2 \
  --population_num 20 --select_num 5 --mutation_num 10 --crossover_num 6 \
  --max_epochs 2 --time_step 10 --classifier_scale 1.0 \
  --save_dir /tmp/search_hours/logs_joint
