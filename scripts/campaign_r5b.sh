#!/bin/bash
# Round-5 TPU campaign, part B: the banding gap (BENCH_NOTES "color_02
# anatomy" — every shipped recipe trains with --band_prob 0, so the
# predictor's class discriminator degenerates to "radially-banded
# high-contrast structure = fast ring class", which is exactly how the
# rated wedge-ring stimuli look; color_02 is the most ring-like and
# pattern-matches the fast class).  Dose --band_prob 0.5 on BOTH stacks
# against the v6ab base:
#
#   stage B1  color v7band = color-v6ab + --band_prob 0.5
#   stage B2  bw    v7band = bw-v6ab    + --band_prob 0.5
#
# Waits for part A's final output so only one TPU client ever runs
# (CLAUDE.md device-claim rule).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5b.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5b $(date -u +%H:%M:%S)] $*"; }

# Part A was cut short after stage 3: v7a measured as a class-flip no-go
# and v7c broke control at 10k (control 0.243 — the deterministic
# duty->speed mapping interpolates symmetric rings into the plausible
# band), so the 20k budget-robustness stage 4 was cancelled (BENCH_NOTES
# "v7a"/"v7c").  Queue behind stage 3 (v7b) instead.
stamp "waiting for part A stage 3 (v7b) to finish ..."
for i in $(seq 1 1080); do
  [ -f candidates/prednet_bw_v7b.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v7b.npz ]; then
  stamp "part A stage 3 output never appeared; aborting"
  exit 1
fi
stamp "part A complete; cooldown before stage B1"
sleep 180

V6AB_TAIL="--regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

stamp "=== stage B1: color v7band = color-v6ab + band_prob 0.5 (10k) ==="
python scripts/tpu_run.py --log gallery/logs/train_color_v7band.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 3,48,96,192 --steps 10000 $V6AB_TAIL --band_prob 0.5 \
  --out candidates/prednet_color_v7band.npz
stamp "stage B1 done rc=$?"
sleep 180

stamp "=== stage B2: bw v7band = bw-v6ab + band_prob 0.5 (10k) ==="
python scripts/tpu_run.py --log gallery/logs/train_bw_v7band.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 10000 $V6AB_TAIL --band_prob 0.5 \
  --out candidates/prednet_bw_v7band.npz
stamp "stage B2 done rc=$?"
stamp "=== campaign part B complete ==="
