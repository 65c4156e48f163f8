#!/bin/bash
# Round-5 candidate prober, wave 8: part-L color snapshots (CPU probes,
# color images only).
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5h.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-h $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 18000 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_color_v9L_s*.ckpt.npz \
           candidates/prednet_color_v9L.npz; do
    [ -f "$f" ] || continue
    base=$(basename "$f" .npz); base=${base%.ckpt}
    tag=${base#prednet_color_}
    out="gallery/probe_color_${tag}.json"
    [ -f "$out" ] && continue
    todo=1
    w="$f"
    case "$f" in *.ckpt.npz)
      w="candidates/${base}_w.npz"
      [ -f "$w" ] || python scripts/ckpt_to_weights.py "$f" "$w" || continue
    ;; esac
    stamp "probing color $tag ..."
    python scripts/probe_rated.py --cpu --only color --model_color "$w" \
      --json "$out"
    stamp "color $tag done rc=$?"
  done
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_color_v9L.json ]; then
    break
  fi
  sleep 30
done
stamp "probe watch wave 8 complete"
