#!/bin/bash
# Round-5 candidate prober, wave 12: part-P continuation snapshots.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5l.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-l $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 21600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_bw_v9p1_s*.ckpt.npz \
           candidates/prednet_bw_v9p2_s*.ckpt.npz \
           candidates/prednet_bw_v9p1.npz candidates/prednet_bw_v9p2.npz; do
    [ -f "$f" ] || continue
    base=$(basename "$f" .npz); base=${base%.ckpt}
    tag=${base#prednet_bw_}
    out="gallery/probe_${tag}.json"
    [ -f "$out" ] && continue
    todo=1
    w="$f"
    case "$f" in *.ckpt.npz)
      w="candidates/${base}_w.npz"
      [ -f "$w" ] || python scripts/ckpt_to_weights.py "$f" "$w" || continue
    ;; esac
    stamp "probing $tag ..."
    python scripts/probe_rated.py --cpu --only bw --model_bw "$w" \
      --json "$out"
    stamp "$tag done rc=$?"
  done
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_v9p1.json ] \
     && [ -f gallery/probe_v9p2.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave 12 complete"
