#!/bin/bash
# Round-5 TPU campaign, part R: continuation arms toward the JOINT bar
# (circles avg >=0.60 AND manyfish >=0.62 — VERDICT-r5 item 1's full
# "done" condition; the shipped knee v9n2_swa is 0.594/0.601 CPU).
#
# Measured facts this part leans on:
#   - N2 past s400 breaks control (P1: the 0.125 hinge's margin erodes
#     with budget); P2 (fine band on the hinge-FREE K2 final) stayed
#     control-safe for 400 more steps and lifted manyfish to 0.622.
#   - Longer budget lifts manyfish (M3, P2); the fine band lifts the
#     rotate family; the hinge is the control hazard.
# So: continue from the N2 state with the hinge REDUCED or REMOVED —
# keep the circles gains already in the weights, let budget lift
# manyfish, keep control anchored.
#   R1  init = N2 s400 final, hinge halved to 0.0625 + fine band
#   R2  init = v9n2_swa (the shipped basin-center average), same recipe
#   R3  init = N2 s400 final, hinge 0 (anchor + fine band only) —
#       maximally control-safe continuation
#
# GATED on the gallery regeneration: waits for /tmp/gallery_r5.pid to
# exit before touching the TPU (single-chip rule, CLAUDE.md).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5r.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5r $(date -u +%H:%M:%S)] $*"; }

if [ -f /tmp/gallery_r5.pid ]; then
  GPID=$(cat /tmp/gallery_r5.pid)
  stamp "waiting for gallery regen (pid $GPID) to release the TPU ..."
  while kill -0 "$GPID" 2>/dev/null; do sleep 30; done
  stamp "gallery regen finished; cooling down 120s"
  sleep 120
fi

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

run_stage() { # name init hinge out
  local name="$1" init="$2" hinge="$3" out="$4"
  stamp "=== stage $name: hinge $hinge + fine band, init $(basename $init) ==="
  watch_snaps "$out" "${out%.npz}" &
  local W=$!
  local HINGE=""
  if [ "$hinge" != "0" ]; then HINGE="--cue_motion_weight $hinge"; fi
  python scripts/tpu_run.py --log "gallery/logs/train_bw_$(basename ${out%.npz} | sed s/prednet_bw_//).log" --stall 900 --retries 6 -- \
    python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
    --channels 1,16,32,64 --steps 400 $V6AB_TAIL_NOSCALE \
    --ring_closed_scale 0.75 $HINGE --save_every 100 \
    --cue_speed_fine 0.11,0.14 \
    --init_weights "$init" \
    --out "$out"
  stamp "stage $name done rc=$?"
  kill "$W" 2>/dev/null
  sleep 120
}

run_stage R1 candidates/prednet_bw_v9n2.npz     0.0625 candidates/prednet_bw_v9r1.npz
run_stage R2 candidates/prednet_bw_v9n2_swa.npz 0.0625 candidates/prednet_bw_v9r2.npz
run_stage R3 candidates/prednet_bw_v9n2.npz     0      candidates/prednet_bw_v9r3.npz
stamp "=== campaign part R complete ==="
