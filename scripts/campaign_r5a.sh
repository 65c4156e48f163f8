#!/bin/bash
# Round-5 TPU campaign, part A: the weak-tail magnitude levers + the
# control anchor (VERDICT r4 "next round" items 1 + 3), each dosed against
# the shipped v6ab base and probed before the next decision:
#
#   stage 1  v7a = v6ab + --cue_speed_fine 0.14,0.18  (period-conditioned
#            speed: fine scales train at a faster drift band — the dosed
#            lift of the measured |d| 0.03-0.10 px weak tail)
#   stage 2  v7c = v6ab + --ring_speed_cue            (appearance-
#            determined ring speed: control-zero as a trained property)
#   stage 3  v7b = v6ab + --cue_motion_weight 1.0     (pixelwise closed
#            amplitude hinge on cue regimes)
#   stage 4  v7c @ 20k steps                          (the budget-
#            robustness test the v6ab20k failure defines)
#
# One TPU client at a time (CLAUDE.md device-claim rule); cooldowns
# between stages let the remote claim drop.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5a.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5a $(date -u +%H:%M:%S)] $*"; }

V6AB_ARGS="--channels 1,16,32,64 \
  --regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

stamp "=== stage 1: v7a = v6ab + cue_speed_fine 0.14,0.18 ==="
python scripts/tpu_run.py --log gallery/logs/train_v7a.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V6AB_ARGS --steps 10000 --cue_speed_fine 0.14,0.18 \
  --out candidates/prednet_bw_v7a.npz
stamp "stage 1 done rc=$?"
sleep 180

stamp "=== stage 2: v7c = v6ab + ring_speed_cue (10k) ==="
python scripts/tpu_run.py --log gallery/logs/train_v7c.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V6AB_ARGS --steps 10000 --ring_speed_cue \
  --out candidates/prednet_bw_v7c.npz
stamp "stage 2 done rc=$?"
sleep 180

stamp "=== stage 3: v7b = v6ab + cue_motion_weight 1.0 ==="
python scripts/tpu_run.py --log gallery/logs/train_v7b.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V6AB_ARGS --steps 10000 --cue_motion_weight 1.0 \
  --out candidates/prednet_bw_v7b.npz
stamp "stage 3 done rc=$?"
sleep 180

stamp "=== stage 4: v7c @ 20k steps (budget robustness) ==="
python scripts/tpu_run.py --log gallery/logs/train_v7c20k.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V6AB_ARGS --steps 20000 --ring_speed_cue \
  --out candidates/prednet_bw_v7c20k.npz
stamp "stage 4 done rc=$?"
stamp "=== campaign part A complete ==="
