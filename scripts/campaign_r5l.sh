#!/bin/bash
# Round-5 TPU campaign, part L: color-stack micro-dose.
#
# The anchored micro-dose produced the first both-axes win on BW (H3
# s250: circles 0.558 / manyfish 0.603 / control 0.0).  The color stack
# (3,48,96,192) still ships plain v6ab (color_01 0.522 / color_02
# 0.363) and has never had the hinge.  No color anchor state exists
# (the 20k anchor retrain costs ~1h), so L doses the hinge + a raised
# ring scale directly on the converged color v6ab state, 100-step
# snapshots — the BW knee landed at ~250 steps of this exact recipe
# shape.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5l.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5l $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part K to finish ..."
for i in $(seq 1 1800); do
  grep -q "campaign part K complete" gallery/logs/campaign_r5k.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part K complete" gallery/logs/campaign_r5k.log 2>/dev/null; then
  stamp "part K never finished; aborting"
  exit 1
fi
stamp "part K complete; cooldown"
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
    sleep 10
  done
}

stamp "=== stage L1: color micro-dose — hinge 0.0625, scale 0.75, 500 ==="
watch_snaps candidates/prednet_color_v9L.npz candidates/prednet_color_v9L &
W1=$!
python scripts/tpu_run.py --log gallery/logs/train_color_v9L.log --stall 1800 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 3,48,96,192 --steps 500 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.0625 --save_every 100 \
  --init_weights candidates/prednet_color_v6ab.npz \
  --out candidates/prednet_color_v9L.npz
stamp "stage L1 done rc=$?"
kill "$W1" 2>/dev/null
stamp "=== campaign part L complete ==="
