#!/bin/bash
# Round-5 TPU campaign, part M: upward dose-response from the anchored start.
#
# Part K measured: hinge 0.125 from v8ctl10k_w (anchor 0.75 @10k) is the
# best both-axes point so far — snapshot avg (s200-400) circles 0.555 /
# manyfish 0.611 / control 0.0 vs v6ab 0.527/0.569.  The 0.0625 dose
# (K1) plateaus lower (~0.48).  Open questions M answers:
#   M1  hinge 0.1875, 400 steps — does more dose keep lifting circles
#       before the v7b25-style control break?
#   M2  hinge 0.25, 400 steps — the v7b25 dose, but from the anchored
#       converged state instead of scratch.
#   M3  continuation: hinge 0.125 for 400 MORE steps from the K2 final
#       (effective s500-800) — does the 0.125 trajectory keep climbing?
#   M4  replicate: K2 recipe exactly, data seed 1 — recipe-vs-noise
#       check for the promotion decision.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5m.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5m $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part L (color micro-dose) to finish ..."
for i in $(seq 1 1800); do
  grep -q "campaign part L complete" gallery/logs/campaign_r5l.log 2>/dev/null && break
  sleep 10
done
if ! grep -q "campaign part L complete" gallery/logs/campaign_r5l.log 2>/dev/null; then
  stamp "part L never finished; aborting"
  exit 1
fi
stamp "part L complete; cooldown"
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

run_stage() { # name hinge steps init seed out
  local name="$1" hinge="$2" steps="$3" init="$4" seed="$5" out="$6"
  stamp "=== stage $name: hinge $hinge, $steps steps, init $(basename $init), seed $seed ==="
  watch_snaps "$out" "${out%.npz}" &
  local W=$!
  python scripts/tpu_run.py --log "gallery/logs/train_bw_$(basename ${out%.npz} | sed s/prednet_bw_//).log" --stall 900 --retries 6 -- \
    python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
    --channels 1,16,32,64 --steps "$steps" $V6AB_TAIL_NOSCALE \
    --ring_closed_scale 0.75 --cue_motion_weight "$hinge" --save_every 100 \
    --seed "$seed" \
    --init_weights "$init" \
    --out "$out"
  stamp "stage $name done rc=$?"
  kill "$W" 2>/dev/null
  sleep 120
}

run_stage M1 0.1875 400 candidates/prednet_bw_v8ctl10k_w.npz 0 candidates/prednet_bw_v9m1.npz
run_stage M2 0.25   400 candidates/prednet_bw_v8ctl10k_w.npz 0 candidates/prednet_bw_v9m2.npz
run_stage M3 0.125  400 candidates/prednet_bw_v9k2.npz       0 candidates/prednet_bw_v9m3.npz
run_stage M4 0.125  400 candidates/prednet_bw_v8ctl10k_w.npz 1 candidates/prednet_bw_v9m4.npz
stamp "=== campaign part M complete ==="
