#!/bin/bash
# Round-4 TPU campaign (VERDICT r3 items 1, 3): serialized single-client
# stages with cooldowns between them (the axon tunnel wedges a client that
# re-grabs the device claim too soon after the previous one exits — see
# BENCH_NOTES.md "TPU outage" + scripts/tpu_run.py).
#
#   stage 1  fresh north-star bench      -> refreshes BENCH_LAST_GOOD.json
#   stage 2  int8 north-star bench       -> the queued go/no-go speed number
#   stage 3  v6a BW training (10k steps) -> candidates/prednet_bw_v6a.npz
#   stage 4  v6b BW training (10k steps) -> candidates/prednet_bw_v6b.npz
#
# Probes/promotion run on CPU from the main session between stages.
set -u
cd /root/repo
mkdir -p candidates gallery/logs
LOG=gallery/logs/campaign_r4.log
exec >>"$LOG" 2>&1

V5I_ARGS="--channels 1,16,32,64 --steps 10000 \
  --regime_probs 0,0.25,0.2,0.15,0.2,0.2,0 \
  --ring_speed 1.2,2.0 \
  --onset_range 9,11 --closed_frames 4 --closed_weight 5 \
  --ring_dir_cue --ring_onset_range 10,10 --ring_mask_prefix \
  --ring_closed_scale 0.5 --save_every 1000"

stamp() { echo "[campaign $(date -u +%H:%M:%S)] $*"; }

stamp "=== stage 1: fresh north-star bench ==="
timeout 7200 python bench.py && cp BENCH_LAST_GOOD.json gallery/logs/last_good_r4_fresh.json
stamp "stage 1 done rc=$?"
sleep 180

stamp "=== stage 2: int8 north-star bench ==="
# Preserve the fp32 LAST_GOOD: the int8 record must not become the stale
# fallback unless int8 is promoted to default.
cp BENCH_LAST_GOOD.json /tmp/last_good_fp32.json 2>/dev/null
BENCH_INT8=1 timeout 7200 python bench.py | tee gallery/logs/bench_int8_r4.txt
stamp "stage 2 done rc=$?"
cp /tmp/last_good_fp32.json BENCH_LAST_GOOD.json 2>/dev/null
sleep 180

stamp "=== stage 3: v6a training (v5i + cue_period 6,40) ==="
python scripts/tpu_run.py --log gallery/logs/train_v6a.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V5I_ARGS --cue_speed 0.06,0.15 --cue_period 6,40 \
  --out candidates/prednet_bw_v6a.npz
stamp "stage 3 done rc=$?"
sleep 180

stamp "=== stage 4: v6b training (v5i + cue_speed 0.10,0.14) ==="
python scripts/tpu_run.py --log gallery/logs/train_v6b.log --stall 900 --retries 6 -- \
  python -m evolutionary_illusion_generator_tpu.models.prednet.pretrain \
  $V5I_ARGS --cue_speed 0.10,0.14 \
  --out candidates/prednet_bw_v6b.npz
stamp "stage 4 done rc=$?"
stamp "=== campaign stages 1-4 complete ==="
