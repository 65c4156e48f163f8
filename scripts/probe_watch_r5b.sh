#!/bin/bash
# Round-5 candidate prober, wave 2: CPU-probe the part-C/part-D outputs
# as they land (v7b25 = dosed hinge; v8ctl10k/v8ctl = budget-robust
# control anchor at 10k and 20k of the SAME run).  CPU probes never
# contend for the TPU device claim (CLAUDE.md).
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5b.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-b $(date -u +%H:%M:%S)] $*"; }

probe_bw() { # tag path
  stamp "probing BW $1 ..."
  python scripts/probe_rated.py --cpu --only bw --model_bw "$2" \
    --json "gallery/probe_$1.json"
  stamp "BW $1 done rc=$?"
}

wait_for() { # path max_iter
  for i in $(seq 1 "$2"); do
    [ -f "$1" ] && return 0
    sleep 15
  done
  return 1
}

for tag in v7b25 v8ctl10k v8ctl; do
  f="candidates/prednet_bw_${tag}.npz"
  out="gallery/probe_$tag.json"
  [ -f "$out" ] && { stamp "$tag already probed"; continue; }
  stamp "waiting for $f ..."
  if wait_for "$f" 2400; then probe_bw "$tag" "$f"; else stamp "$f never appeared"; fi
done
stamp "probe watch wave 2 complete"
