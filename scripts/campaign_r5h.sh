#!/bin/bash
# Round-5 TPU campaign, part H: three arms informed by part G's measured
# results.
#
# G's findings: (1) the collapsed control is an ATTRACTOR — 2k steps of
# the pure v6ab objective never re-inflates it (v9r control 0.21-0.25
# at every snapshot); (2) snapshot-to-snapshot circles noise is +-0.08
# at 250-step spacing (v9r 0.42->0.66->0.49) — single-run point
# estimates carry real variance.  Hence:
#
#   stage H1  strong-ring rescue: init v7b25, v6ab objective with
#             ring_closed_scale 1.5 (3x the shipped 0.5) — push the
#             symmetric-ring drift back over the gate from the converged
#             cue-good state, where joint-from-scratch training bled the
#             ring term into the cues.  2k steps, 500-step snapshots.
#   stage H2  v6ab continuation harvest: init v6ab, same objective,
#             fresh data stream (seed 1), 2k steps, 500-step snapshots —
#             draws from the v6ab mode both to measure run-to-run
#             variance and to harvest any control-safe snapshot that
#             sits above the v6ab point estimate.
#   stage H3  hinge micro-dose on the anchored state: init v8ctl10k_w
#             (anchor 0.75, control-0 budget-robust, manyfish 0.643),
#             objective anchor 0.75 + hinge 0.0625 — a quarter of the
#             working dose, applied where control has the strongest
#             trained defense.  1k steps, 250-step snapshots.
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5h.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5h $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part G stage G2 (bw v9h) to finish ..."
for i in $(seq 1 720); do
  [ -f candidates/prednet_bw_v9h.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v9h.npz ]; then
  stamp "part G final output never appeared; aborting"
  exit 1
fi
stamp "part G complete; cooldown"
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

stamp "=== stage H1: strong-ring rescue — init v7b25, scale 1.5, 2k ==="
watch_snaps candidates/prednet_bw_v9rs.npz candidates/prednet_bw_v9rs &
W1=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9rs.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 2000 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 1.5 --save_every 500 \
  --init_weights candidates/prednet_bw_v7b25.npz \
  --out candidates/prednet_bw_v9rs.npz
stamp "stage H1 done rc=$?"
kill "$W1" 2>/dev/null
sleep 120

stamp "=== stage H2: v6ab continuation harvest — seed 1, 2k ==="
watch_snaps candidates/prednet_bw_v9c.npz candidates/prednet_bw_v9c &
W2=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9c.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 2000 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.5 --save_every 500 --seed 1 \
  --init_weights candidates/prednet_bw_v6ab.npz \
  --out candidates/prednet_bw_v9c.npz
stamp "stage H2 done rc=$?"
kill "$W2" 2>/dev/null
sleep 120

stamp "=== stage H3: hinge micro-dose on the anchored state — 1k ==="
watch_snaps candidates/prednet_bw_v9m.npz candidates/prednet_bw_v9m &
W3=$!
python scripts/tpu_run.py --log gallery/logs/train_bw_v9m.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 1000 $V6AB_TAIL_NOSCALE \
  --ring_closed_scale 0.75 --cue_motion_weight 0.0625 --save_every 250 \
  --init_weights candidates/prednet_bw_v8ctl10k_w.npz \
  --out candidates/prednet_bw_v9m.npz
stamp "stage H3 done rc=$?"
kill "$W3" 2>/dev/null
stamp "=== campaign part H complete ==="
