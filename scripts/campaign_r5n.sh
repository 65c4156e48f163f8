#!/bin/bash
# Round-5 TPU campaign, part N: rotate_01's fine-scale incoherence.
#
# Anatomy under v9k2_swa (BENCH_NOTES "Part K"): rotate_01's score is
# capped by its r<30 bands — 43 of 112 symset vectors at |d|~0.02 px
# with sign-consistency 0.74 (angle noise), while every r>30 band is
# cleanly tangential.  rotate_02's 15-30 band is coherent, so the
# failure tracks the LOCAL WEDGE PERIOD (rotate_01 is finer there),
# not radius.  Three 400-step micro-doses from the anchored start, all
# stacked on the proven hinge-0.125 recipe (K2):
#   N1  + tang_uniform      (uniform px/frame tangential speed — the
#                            inner rings stop moving at omega*r)
#   N2  + cue_speed_fine 0.11,0.14  (the v7a fallback half-dose that
#                            was never run; from-converged, not scratch)
#   N3  + cue_period 4,40   (put the finest wedge scales in distribution)
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5n.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5n $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part M to finish ..."
for i in $(seq 1 1800); do
  grep -q "campaign part M complete" gallery/logs/campaign_r5m.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part M complete" gallery/logs/campaign_r5m.log 2>/dev/null; then
  stamp "part M never finished; aborting"
  exit 1
fi
stamp "part M complete; cooldown"
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

run_stage() { # name extra_args out
  local name="$1" extra="$2" out="$3"
  stamp "=== stage $name: hinge 0.125 + $extra ==="
  watch_snaps "$out" "${out%.npz}" &
  local W=$!
  python scripts/tpu_run.py --log "gallery/logs/train_bw_$(basename ${out%.npz} | sed s/prednet_bw_//).log" --stall 900 --retries 6 -- \
    python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
    --channels 1,16,32,64 --steps 400 $V6AB_TAIL_NOSCALE \
    --ring_closed_scale 0.75 --cue_motion_weight 0.125 --save_every 100 \
    --init_weights candidates/prednet_bw_v8ctl10k_w.npz \
    $extra \
    --out "$out"
  stamp "stage $name done rc=$?"
  kill "$W" 2>/dev/null
  sleep 120
}

run_stage N1 "--tang_uniform" candidates/prednet_bw_v9n1.npz
run_stage N2 "--cue_speed_fine 0.11,0.14" candidates/prednet_bw_v9n2.npz
# N3 overrides the tail's --cue_period by passing it again LAST
run_stage N3 "--cue_period 4,40" candidates/prednet_bw_v9n3.npz
stamp "=== campaign part N complete ==="
