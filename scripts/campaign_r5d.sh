#!/bin/bash
# Round-5 TPU campaign, part D: the per-op s2d profile (VERDICT r4 #4 —
# the next perf step must be profile-indicated) and the budget-robust
# control anchor (VERDICT r4 #3).
#
#   stage D1  rollout_profile of the promoted s2d program at north-star
#             chunk shapes (trace -> gallery/logs/rollout_profile_r5.log)
#   stage D2  bw v8ctl = bw-v6ab + ring_closed_scale 0.75, 20k steps.
#             History brackets the ring-anchor dial at 10k (0.25 breaks
#             control inward, 0.5 exact, 1.0 over-anchors the old
#             recipe); at 20k the 0.5 anchor loses to the converged
#             contraction (v6ab20k control 0.268).  0.75 probes whether
#             a stronger anchor makes control-zero budget-robust.  A
#             file-copy watcher snapshots the step-10000 checkpoint so
#             ONE run yields both budgets of the same recipe.
#
# Queued behind part C's final output (one TPU client at a time).
set -u
cd /root/repo
LOG=gallery/logs/campaign_r5d.log
exec >>"$LOG" 2>&1

stamp() { echo "[campaign-r5d $(date -u +%H:%M:%S)] $*"; }

stamp "waiting for part C stage C1 (bw v7b25) to finish ..."
for i in $(seq 1 720); do
  [ -f candidates/prednet_bw_v7b25.npz ] && break
  sleep 10
done
if [ ! -f candidates/prednet_bw_v7b25.npz ]; then
  stamp "part C final output never appeared; aborting"
  exit 1
fi
stamp "part C complete; cooldown before stage D1"
sleep 180

stamp "=== stage D1: per-op profile of the s2d rollout (north-star chunk) ==="
python scripts/tpu_run.py --log gallery/logs/rollout_profile_r5.log --stall 900 --retries 3 -- \
  python scripts/rollout_profile.py --trace /tmp/rollout_trace_r5
stamp "stage D1 done rc=$?"
sleep 180

V6AB_TAIL="--regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --save_every 1000 \
  --cue_speed 0.10,0.14 --cue_period 6,40"

# watcher: snapshot the rolling .part checkpoint once it reaches step
# 10000 (pure file copy, no device claim).  _ckpt_save is atomic
# (tmp+os.replace) so the copy only ever sees a complete file.
(
  for i in $(seq 1 2000); do
    log=gallery/logs/train_bw_v8ctl.log
    # trigger at step >=10100 so the step-10000 _ckpt_save has landed
    if [ -f "$log" ] && grep -q "step 10[1-9][0-9][0-9] " "$log"; then
      part=$(ls candidates/prednet_bw_v8ctl.npz.part-*.npz 2>/dev/null | head -1)
      if [ -n "$part" ]; then
        cp "$part" candidates/prednet_bw_v8ctl10k.npz.tmp &&
          mv candidates/prednet_bw_v8ctl10k.npz.tmp candidates/prednet_bw_v8ctl10k.npz
        stamp "snapshotted 10k checkpoint from $part"
        break
      fi
    fi
    sleep 15
  done
) &

stamp "=== stage D2: bw v8ctl = bw-v6ab + ring_closed_scale 0.75 (20k) ==="
python scripts/tpu_run.py --log gallery/logs/train_bw_v8ctl.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  --channels 1,16,32,64 --steps 20000 $V6AB_TAIL --ring_closed_scale 0.75 \
  --out candidates/prednet_bw_v8ctl.npz
stamp "stage D2 done rc=$?"
wait
stamp "=== campaign part D complete ==="
