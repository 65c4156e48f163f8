#!/bin/bash
# Round-5 candidate prober, wave 3: part-F outputs (hinge+anchor
# composition and the half-dose hinge).  CPU probes only.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5c.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-c $(date -u +%H:%M:%S)] $*"; }

wait_for() { # path max_iter
  for i in $(seq 1 "$2"); do
    [ -f "$1" ] && return 0
    sleep 15
  done
  return 1
}

for tag in v7b25c v7b125; do
  f="candidates/prednet_bw_${tag}.npz"
  out="gallery/probe_$tag.json"
  [ -f "$out" ] && { stamp "$tag already probed"; continue; }
  stamp "waiting for $f ..."
  if wait_for "$f" 2400; then
    stamp "probing BW $tag ..."
    python scripts/probe_rated.py --cpu --only bw --model_bw "$f" \
      --json "gallery/probe_$tag.json"
    stamp "BW $tag done rc=$?"
  else
    stamp "$f never appeared"
  fi
done
stamp "probe watch wave 3 complete"
