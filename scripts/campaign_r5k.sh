#!/bin/bash
# Round-5 TPU campaign, part K: refine the measured micro-dose knee.
#
# H3 (init v8ctl10k_w = anchor 0.75 @10k, hinge 0.0625 + anchor 0.75)
# measured a knee at s250: circles 0.558 / manyfish 0.603 / control
# 0.000 — above v6ab on BOTH axes — then degradation (s500 0.395) and
# a control break at s1000 (0.423).  Part K resolves the knee at
# 100-step granularity and doses around it:
#
#   stage K1  same recipe, 500 steps, save_every 100 (s100..s400 + final)
#   stage K2  hinge 0.125 (half-dose), 400 steps, save_every 100 —
#             does a faster climb reach a higher knee before the decay?
#   stage K3  init v8ctl (anchor @20k, the most converged control
#             defense), hinge 0.0625, 500 steps, save_every 100
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5k.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5k $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part J (burst continuation) to finish ..."
for i in $(seq 1 1800); do
  grep -q "campaign part J complete" gallery/logs/campaign_r5j.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part J complete" gallery/logs/campaign_r5j.log 2>/dev/null; then
  stamp "part J never finished; aborting"
  exit 1
fi
stamp "part J complete; cooldown"
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
    sleep 5
  done
}

stamp "=== stage K1: micro-dose knee scan — hinge 0.0625, 500 steps ==="
watch_snaps candidates/prednet_bw_v9k1.npz candidates/prednet_bw_v9k1 &
W1=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9k1.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 500 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.0625 --save_every 100 \
  --init_weights candidates/prednet_bw_v8ctl10k_w.npz \
  --out candidates/prednet_bw_v9k1.npz
stamp "stage K1 done rc=$?"
kill "$W1" 2>/dev/null
sleep 120

stamp "=== stage K2: half-dose — hinge 0.125, 400 steps ==="
watch_snaps candidates/prednet_bw_v9k2.npz candidates/prednet_bw_v9k2 &
W2=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9k2.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 400 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.125 --save_every 100 \
  --init_weights candidates/prednet_bw_v8ctl10k_w.npz \
  --out candidates/prednet_bw_v9k2.npz
stamp "stage K2 done rc=$?"
kill "$W2" 2>/dev/null
sleep 120

stamp "=== stage K3: 20k-anchored start — hinge 0.0625, 500 steps ==="
watch_snaps candidates/prednet_bw_v9k3.npz candidates/prednet_bw_v9k3 &
W3=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9k3.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 500 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.0625 --save_every 100 \
  --init_weights candidates/prednet_bw_v8ctl.npz \
  --out candidates/prednet_bw_v9k3.npz
stamp "stage K3 done rc=$?"
kill "$W3" 2>/dev/null
stamp "=== campaign part K complete ==="
