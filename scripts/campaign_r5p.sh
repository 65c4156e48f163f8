#!/bin/bash
# Round-5 TPU campaign, part P: continue the N2 fine-band trajectory.
#
# v9n2_swa (hinge 0.125 + cue_speed_fine 0.11,0.14 from the anchored
# start, SWA of s200/s300/s400) measures circles 0.594 / manyfish
# 0.601 / control 0.0 — rotate_01 0.469, the first stable state above
# 0.44 there (the fine-band half-dose IS the rotate_01 lever; anatomy
# shows inner-band sign-consistency 0.74 -> 0.90+).  M3 showed the
# hinge trajectory keeps climbing 400 more steps; P does the same for
# the N2 recipe:
#   P1  N2 recipe, 400 MORE steps from the v9n2 final (s400-800)
#   P2  N2 recipe from the v9k2 FINAL (fine band stacked on the
#       longer-hinged state instead of the anchor state)
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5p.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5p $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part O to finish ..."
for i in $(seq 1 1800); do
  grep -q "campaign part O complete" gallery/logs/campaign_r5o.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part O complete" gallery/logs/campaign_r5o.log 2>/dev/null; then
  stamp "part O never finished; aborting"
  exit 1
fi
stamp "part O complete; cooldown"
sleep 120

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
    sleep 2
  done
}

run_stage() { # name init out
  local name="$1" init="$2" out="$3"
  stamp "=== stage $name: hinge 0.125 + fine 0.11,0.14, 400 steps, init $(basename $init) ==="
  watch_snaps "$out" "${out%.npz}" &
  local W=$!
  python scripts/tpu_run.py --log "gallery/logs/train_bw_$(basename ${out%.npz} | sed s/prednet_bw_//).log" --stall 900 --retries 6 -- \
    python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
    --channels 1,16,32,64 --steps 400 $V6AB_TAIL_NOSCALE \
    --ring_closed_scale 0.75 --cue_motion_weight 0.125 --save_every 100 \
    --cue_speed_fine 0.11,0.14 \
    --init_weights "$init" \
    --out "$out"
  stamp "stage $name done rc=$?"
  kill "$W" 2>/dev/null
  sleep 120
}

run_stage P1 candidates/prednet_bw_v9n2.npz candidates/prednet_bw_v9p1.npz
run_stage P2 candidates/prednet_bw_v9k2.npz candidates/prednet_bw_v9p2.npz
stamp "=== campaign part P complete ==="
