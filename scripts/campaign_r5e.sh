#!/bin/bash
# Round-5 TPU campaign, part E: measure the bf16 LK window path (the one
# profile-era perf candidate already implemented + parity-tested,
# ops/flow/lk.py lk_dtype) against a fresh same-session default bench,
# then run its rated-probe promotion gate on the TPU backend.
# Queued behind part D's final output (one TPU client at a time).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5e.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5e $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part F stage F2 (bw v7b125) to finish ..."
for i in $(seq 1 2400); do
  [ -f candidates/prednet_bw_v7b125.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v7b125.npz ]; then
  stamp "part F final output never appeared; aborting"
  exit 1
fi
stamp "part F complete; cooldown before stage E1"
sleep 180

stamp "=== stage E0: compiled-HLO dump of the s2d rollout (copy.* attribution) ==="
python scripts/tpu_run.py --log gallery/logs/rollout_hlo_r5.log --stall 900 --retries 3 -- \
  python scripts/dump_rollout_hlo.py --out gallery/logs/rollout_hlo_r5.txt.gz
stamp "stage E0 done rc=$?"
sleep 120

stamp "=== stage E1: fresh default bench (3 reps) ==="
python scripts/tpu_run.py --log gallery/logs/bench_r5_default.log --stall 1200 --retries 3 -- \
  python bench.py
stamp "stage E1 done rc=$?"
sleep 120

stamp "=== stage E2: bench with BENCH_LK_BF16=1 (3 reps) ==="
python scripts/tpu_run.py --log gallery/logs/bench_r5_lkbf16.log --stall 1200 --retries 3 -- \
  env BENCH_LK_BF16=1 python bench.py
stamp "stage E2 done rc=$?"
sleep 120

stamp "=== stage E3: lk_bf16 rated-probe promotion gate (TPU backend) ==="
python scripts/tpu_run.py --log gallery/logs/probe_lk_bf16_gate.log --stall 1200 --retries 3 -- \
  python scripts/probe_rated.py --lk_bf16 --json gallery/probe_lk_bf16_gate.json
stamp "stage E3 done rc=$?"
stamp "=== campaign part E complete ==="
