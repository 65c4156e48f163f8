#!/bin/bash
# Round-5 TPU campaign, part C: dose-response of the pixelwise cue
# amplitude hinge.  v7b (weight 1.0) overshot the plausibility cliff the
# same way v7a did (circles m|d| 2.8-4.0 px, control 12 px — the hinge
# globally inflated the closed-loop amplitude); the lever's direction is
# right (it targets exactly the measured |d| 0.03-0.10 px weak tail), the
# dose is ~4x too hot.  Stage C1 doses it at 0.25 against the same v6ab
# base.  Queued behind part B's final output (one TPU client at a time).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5c.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5c $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part B stage B2 (bw v7band) to finish ..."
for i in $(seq 1 1440); do
  [ -f candidates/prednet_bw_v7band.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v7band.npz ]; then
  stamp "part B final output never appeared; aborting"
  exit 1
fi
stamp "part B complete; cooldown before stage C1"
sleep 180

V6AB_TAIL="--regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

stamp "=== stage C1: bw v7b25 = bw-v6ab + cue_motion_weight 0.25 (10k) ==="
python scripts/tpu_run.py --log gallery/logs/train_bw_v7b25.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 10000 $V6AB_TAIL --cue_motion_weight 0.25 \
  --out candidates/prednet_bw_v7b25.npz
stamp "stage C1 done rc=$?"
stamp "=== campaign part C complete ==="
