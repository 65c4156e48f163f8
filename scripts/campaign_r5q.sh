#!/bin/bash
# Round-5 TPU campaign, part Q: promotion-gate evidence for the N2 recipe.
#
# v9n2_swa (anchored start v8ctl10k_w + hinge 0.125 + cue_speed_fine
# 0.11,0.14, SWA of s200/s300/s400) is the ship candidate at circles
# 0.594 / manyfish 0.601 / control 0.0.  Before promoting:
#   Q1  seed-1 replicate of the N2 recipe (M4 showed control safety at
#       the knee dose is seed-dependent for the plain hinge; measure it
#       for the +fine recipe)
#   Q2  seed-2 replicate (second noise sample for the SWA-window mean)
#   Q3  N2 recipe from the 20k anchor v8ctl (VERDICT-r5 item 3: does
#       the winning recipe hold control 0.0 at DOUBLE the anchor
#       budget, and where do scores land vs the 10k-anchor equivalent)
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5q.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5q $(date -u +%H:%M:%S)] $*"; }

V6AB_TAIL_NOSCALE="--regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --cue_speed 0.10,0.14 --cue_period 6,40"

watch_snaps() { # out_npz prefix
  local out="$1" prefix="$2" last=""
  while [ ! -f "$out" ]; do
    for f in "$out".part-*.npz; do
      [ -f "$f" ] || continue
      local sum
      sum=$(md5sum "$f" | cut -d' ' -f1)
      if [ "$sum" != "$last" ]; then
        last=$sum
        local step
        step=$(python -c "import numpy as np; print(int(np.load('$f')['step']))" 2>/dev/null) || continue
        cp "$f" "${prefix}_s${step}.ckpt.npz"
        stamp "snapshot ${prefix}_s${step}.ckpt.npz"
      fi
    done
    sleep 5
  done
}

run_stage() { # name init extra out
  local name="$1" init="$2" extra="$3" out="$4"
  stamp "=== stage $name: N2 recipe ($extra), init $(basename $init) ==="
  watch_snaps "$out" "${out%.npz}" &
  local W=$!
  python scripts/tpu_run.py --log "gallery/logs/train_bw_$(basename ${out%.npz} | sed s/prednet_bw_//).log" --stall 900 --retries 6 -- \
    python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
    --channels 1,16,32,64 --steps 400 $V6AB_TAIL_NOSCALE \
    --ring_closed_scale 0.75 --cue_motion_weight 0.125 --save_every 100 \
    --cue_speed_fine 0.11,0.14 \
    --init_weights "$init" \
    $extra \
    --out "$out"
  stamp "stage $name done rc=$?"
  kill "$W" 2>/dev/null
  sleep 120
}

run_stage Q1 candidates/prednet_bw_v8ctl10k_w.npz "--seed 1" candidates/prednet_bw_v9q1.npz
run_stage Q2 candidates/prednet_bw_v8ctl10k_w.npz "--seed 2" candidates/prednet_bw_v9q2.npz
run_stage Q3 candidates/prednet_bw_v8ctl.npz "" candidates/prednet_bw_v9q3.npz
stamp "=== campaign part Q complete ==="
