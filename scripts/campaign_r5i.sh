#!/bin/bash
# Round-5 TPU campaign, part I: fresh bench of the rank-4 s2d step (the
# in-scan layout-copy elimination, _gate_major/_posneg_major_in) — the
# profile-indicated perf step after the lk_bf16 no-go.  Queued behind
# part H (one TPU client at a time).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5i.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5i $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part H stage H3 (bw v9m) to finish ..."
for i in $(seq 1 1200); do
  [ -f candidates/prednet_bw_v9m.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v9m.npz ]; then
  stamp "part H final output never appeared; aborting"
  exit 1
fi
stamp "part H complete; cooldown before bench"
sleep 180

stamp "=== stage I1: fresh default bench, rank-4 s2d (3 reps) ==="
python scripts/tpu_run.py --log gallery/logs/bench_r5_rank4.log --stall 1200 --retries 3 -- \
  python bench.py
stamp "stage I1 done rc=$?"
stamp "=== campaign part I complete ==="
