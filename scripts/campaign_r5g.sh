#!/bin/bash
# Round-5 TPU campaign, part G: SEQUENTIAL composition of the two live
# levers — dose them in TIME instead of jointly in weight.
#
# Measured state: hinge 0.25 (v7b25) lifts circles 0.527->0.587 but
# collapses control's fast contraction (m|d| 6.9 -> 0.059 px, score
# 0.247); every JOINT hinge+anchor dose collapses circles instead
# (v7b25c 0.242, v7b125 0.253).  The grid is bifurcating, not convex —
# so stop interpolating weights and move along the training trajectory:
#
#   stage G1  "rescue" arm: init from v7b25 (the good circles state),
#             fine-tune 2000 steps under the PURE v6ab objective
#             (hinge off, ring_closed_scale 0.5) — the objective whose
#             optimum has control OUT of the gate.  Snapshots every 250
#             steps give a dose-time curve: somewhere between step 0
#             (circles 0.587 / control broken) and convergence
#             (~v6ab: circles 0.527 / control 0.0) the contraction
#             recovers; the question is how much of the tail lift the
#             trajectory keeps at that point.
#   stage G2  "burst" arm, reverse order: init from v6ab, dose hinge
#             0.25 for 2000 steps with snapshots — if the tail lifts
#             faster than control collapses, an early-stopped burst is
#             a shippable knee.
#
# A background watcher harvests every rolling .part checkpoint (written
# atomically) to step-tagged files; probe_watch_r5d CPU-probes each.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5g.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5g $(date -u +%H:%M:%S)] $*"; }

V6AB_TAIL="--regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 250 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

# Harvest rolling .part checkpoints to step-tagged copies until the
# final output exists.  _ckpt_save is atomic (tmp+replace), so cp never
# sees a torn file; the step is read from the npz itself.
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

stamp "=== stage G1: rescue arm — init v7b25, pure v6ab objective, 2k ==="
watch_snaps candidates/prednet_bw_v9r.npz candidates/prednet_bw_v9r &
W1=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9r.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 2000 $V6AB_TAIL \
  --init_weights candidates/prednet_bw_v7b25.npz \
  --out candidates/prednet_bw_v9r.npz
stamp "stage G1 done rc=$?"
kill "$W1" 2>/dev/null
sleep 120

stamp "=== stage G2: burst arm — init v6ab, hinge 0.25, 2k ==="
watch_snaps candidates/prednet_bw_v9h.npz candidates/prednet_bw_v9h &
W2=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9h.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 2000 $V6AB_TAIL \
  --cue_motion_weight 0.25 \
  --init_weights candidates/prednet_bw_v6ab.npz \
  --out candidates/prednet_bw_v9h.npz
stamp "stage G2 done rc=$?"
kill "$W2" 2>/dev/null
stamp "=== campaign part G complete ==="
