#!/bin/bash
# Round-5 TPU campaign, part O: transfer the measured 0.125 knee dose.
#
#   O1  color stack, hinge 0.125, 300 steps, save_every 50 — part L
#       used 0.0625 (knee s100-200, color_02 0.561 peak); the BW
#       dose-response says 0.125 is the knee dose, and the doubled dose
#       may peak earlier (denser snapshots).
#   O2  BW from the 20k anchor state (v8ctl), hinge 0.125, 400 steps —
#       K3 showed 0.0625 plateaus from this start too; if 0.125 from
#       the 20k state matches K2, the micro-dosed recipe is
#       budget-robust end-to-end (VERDICT r4 item 3's missing half).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5o.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5o $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part N to finish ..."
for i in $(seq 1 1800); do
  grep -q "campaign part N complete" gallery/logs/campaign_r5n.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part N complete" gallery/logs/campaign_r5n.log 2>/dev/null; then
  stamp "part N never finished; aborting"
  exit 1
fi
stamp "part N complete; cooldown"
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

stamp "=== stage O1: color hinge 0.125, scale 0.75, 300 steps ==="
watch_snaps candidates/prednet_color_v9o1.npz candidates/prednet_color_v9o1 &
W1=$!
python scripts/tpu_run.py --log gallery/logs/train_color_v9o1.log --stall 1800 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 3,48,96,192 --steps 300 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.125 --save_every 50 \
  --init_weights candidates/prednet_color_v6ab.npz \
  --out candidates/prednet_color_v9o1.npz
stamp "stage O1 done rc=$?"
kill "$W1" 2>/dev/null
sleep 120

stamp "=== stage O2: BW from 20k anchor, hinge 0.125, 400 steps ==="
watch_snaps candidates/prednet_bw_v9o2.npz candidates/prednet_bw_v9o2 &
W2=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9o2.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 400 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.125 --save_every 100 \
  --init_weights candidates/prednet_bw_v8ctl.npz \
  --out candidates/prednet_bw_v9o2.npz
stamp "stage O2 done rc=$?"
kill "$W2" 2>/dev/null
stamp "=== campaign part O complete ==="
