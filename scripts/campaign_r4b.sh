#!/bin/bash
# Round-4 TPU campaign, part B (after scripts/campaign_r4.sh + v6e):
#
#   stage 5  color-stack v6ab retrain      (launched separately; this script
#            WAITS for candidates/prednet_color_v6ab.npz)
#   stage 6  v6ab-recipe BW training at 20k steps — the training-budget
#            axis, never isolated (candidates/prednet_bw_v6ab20k.npz)
#
# Single TPU client at a time with cooldowns (see campaign_r4.sh header).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r4b.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-b $(date -u +%H:%M:%S)] $*"; }

V6AB_ARGS="--channels 1,16,32,64 \
  --regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

stamp "waiting for stage 5 (color v6ab retrain) to finish ..."
for i in $(seq 1 720); do
  [ -f candidates/prednet_color_v6ab.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_color_v6ab.npz ]; then
  stamp "stage 5 output never appeared; aborting"
  exit 1
fi
stamp "stage 5 output present; cooldown before stage 6"
sleep 180

stamp "=== stage 6: v6ab recipe at 20k steps (training-budget axis) ==="
python scripts/tpu_run.py --log gallery/logs/train_v6ab20k.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V6AB_ARGS --steps 20000 \
  --out candidates/prednet_bw_v6ab20k.npz
stamp "stage 6 done rc=$?"
stamp "=== campaign part B complete ==="
