#!/bin/bash
# Round-5 TPU campaign, part F: compose the two live levers.
#
# v7b25 (hinge 0.25) delivered the first real weak-tail lift — circles
# sym 0.74-0.82, rotate_01 0.543 / rotate_02 0.612 — but control's fast
# contraction collapsed (m|d| 6.9 -> 0.059 px, inside the gate, score
# 0.247).  The ring anchor dial (ring_closed_scale) exists precisely to
# hold the ring regime's closed-loop fast drift; part D's v8ctl probes
# 0.75 alone at 20k.  Part F composes them at 10k:
#
#   stage F1  bw v7b25c = v6ab + cue_motion_weight 0.25
#                              + ring_closed_scale 0.75   (10k)
#   stage F2  bw v7b125 = v6ab + cue_motion_weight 0.125  (10k)
#             fallback half-dose if the anchor cannot rescue control.
#
# Queued behind part D's final output (one TPU client at a time).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5f.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5f $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part D stage D2 (bw v8ctl 20k) to finish ..."
for i in $(seq 1 2400); do
  [ -f candidates/prednet_bw_v8ctl.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v8ctl.npz ]; then
  stamp "part D final output never appeared; aborting"
  exit 1
fi
stamp "part D complete; cooldown before stage F1"
sleep 180

V6AB_TAIL="--regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

stamp "=== stage F1: bw v7b25c = hinge 0.25 + ring_closed_scale 0.75 (10k) ==="
python scripts/tpu_run.py --log gallery/logs/train_bw_v7b25c.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 10000 $V6AB_TAIL \
  --cue_motion_weight 0.25 --ring_closed_scale 0.75 \
  --out candidates/prednet_bw_v7b25c.npz
stamp "stage F1 done rc=$?"
sleep 180

stamp "=== stage F2: bw v7b125 = hinge 0.125, anchor 0.5 (10k) ==="
python scripts/tpu_run.py --log gallery/logs/train_bw_v7b125.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 10000 $V6AB_TAIL \
  --cue_motion_weight 0.125 --ring_closed_scale 0.5 \
  --out candidates/prednet_bw_v7b125.npz
stamp "stage F2 done rc=$?"
stamp "=== campaign part F complete ==="
