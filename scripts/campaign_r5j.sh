#!/bin/bash
# Round-5 TPU campaign, part J: EXTENDED hinge burst.
#
# Part G's burst arm (init v6ab, hinge 0.25) first degrades the
# converged cue response (s500 circles 0.310) then climbs with control
# intact the whole way: s1750 0.390 -> s2000 0.477, control 0.000 at
# every snapshot.  From-scratch hinge training reached circles 0.587
# (v7b25) but with control collapsed; the burst trajectory approaches
# the same cue optimum from inside the control-safe basin.  Part J
# continues the burst 4000 more steps (fresh data stream, seed 2) with
# 500-step snapshots to find where it tops out — or where control
# finally breaks.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5j.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5j $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part I (rank-4 bench) to finish ..."
for i in $(seq 1 1200); do
  grep -q "campaign part I complete" gallery/logs/campaign_r5i.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part I complete" gallery/logs/campaign_r5i.log 2>/dev/null; then
  stamp "part I never finished; aborting"
  exit 1
fi
stamp "part I complete; cooldown"
sleep 180

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

stamp "=== stage J1: burst continuation — init v9h, hinge 0.25, 4k ==="
watch_snaps candidates/prednet_bw_v9hx.npz candidates/prednet_bw_v9hx &
W1=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9hx.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 4000 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.5 --cue_motion_weight 0.25 --save_every 500 \
  --seed 2 \
  --init_weights candidates/prednet_bw_v9h.npz \
  --out candidates/prednet_bw_v9hx.npz
stamp "stage J1 done rc=$?"
kill "$W1" 2>/dev/null
stamp "=== campaign part J complete ==="
