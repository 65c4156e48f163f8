#!/bin/bash
# Round-4 TPU campaign, part C: stage 7 — v6f = v6ab recipe + --tang_uniform
# (uniform px/frame tangential drift; the rotate-family lever measured as
# the sub-noise inner-band tail, BENCH_NOTES "v6e").  Waits for part B's
# stage 6 output so only one TPU client ever runs.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r4c.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-c $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for stage 6 (v6ab @ 20k) to finish ..."
for i in $(seq 1 900); do
  [ -f candidates/prednet_bw_v6ab20k.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v6ab20k.npz ]; then
  stamp "stage 6 output never appeared; aborting"
  exit 1
fi
stamp "stage 6 output present; cooldown before stage 7"
sleep 180

stamp "=== stage 7: v6f = v6ab + tang_uniform (10k steps) ==="
python scripts/tpu_run.py --log gallery/logs/train_v6f.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 10000 \
  --regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40 --tang_uniform \
  --out candidates/prednet_bw_v6f.npz
stamp "stage 7 done rc=$?"
stamp "=== campaign part C complete ==="
