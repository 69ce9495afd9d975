#!/bin/bash
# Runbook for the pending on-chip work (round-3 outage backlog).
# Run when the axon tunnel is back (probe with:
#   timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'").
# Each phase logs to /tmp/chip_session/; safe to re-run phase by phase.
#
# Context: BENCH_NOTES.md "Round-3 follow-up: the implicit-im2col kernel"
# (measurement pending) and PROGRESS.md round-3 pending-chip list.
set -u
cd /root/repo
mkdir -p /tmp/chip_session

phase() { echo "=== $1 ($(date)) ==="; }

phase "1. im2col conv probe — per-shape, all variants vs XLA conv"
timeout 5400 python docs/probes/probe_im2col.py res64 res32 res16 res8 \
    2>&1 | tee /tmp/chip_session/probe_adm.log
timeout 5400 python docs/probes/probe_im2col.py sd64 sd32 sd16 \
    2>&1 | tee /tmp/chip_session/probe_sd.log
# Decision: if the best im2col variant's net %peak beats xla_conv at a
# shape, A/B the full model (phase 2); otherwise record the negative in
# BENCH_NOTES' ledger and skip to phase 3. Keep the gate default OFF
# unless phase 2 wins end to end.

phase "2. headline A/B with the gate on (only if phase 1 is positive)"
timeout 3600 python bench.py 2>&1 | tee /tmp/chip_session/bench_off.log
ADT_IM2COL_CONV=1 timeout 3600 python bench.py \
    2>&1 | tee /tmp/chip_session/bench_on.log
# If ON > OFF: record both lines in BENCH_NOTES, consider flipping the
# "auto" default for TPU, re-run bench_extras sd/lsun with the gate on.

phase "3. half-scale JOINT search-hours run (pop 20 x 2 x 500, ts 10)"
# Checkpoints under /tmp/search_hours were fabricated by make_ckpts.py
# (it writes next to itself — keep it OUT of the repo tree when running;
# re-create the workspace from the repo copies if /tmp was wiped).
mkdir -p /tmp/search_hours
for f in make_ckpts.py run_joint.sh; do
    [ -f /tmp/search_hours/$f ] || cp docs/probes/$f /tmp/search_hours/
done
[ -f /tmp/search_hours/model.msgpack ] || \
    (cd /tmp/search_hours && timeout 1800 python make_ckpts.py)
timeout 14400 bash /tmp/search_hours/run_joint.sh \
    2>&1 | tee /tmp/chip_session/joint_search.log
# Record wall hours + steady s/candidate next to the timestep-only run
# in BENCH_NOTES "Round-3 search hours"; add a joint_search_hours entry
# to BENCH_EXTRAS.json.

phase "4. final bench confirmation (gate per phase-2 outcome)"
timeout 3600 python bench.py 2>&1 | tee /tmp/chip_session/bench_final.log

echo "=== done ($(date)) — write up BENCH_NOTES/PROGRESS and commit ==="
