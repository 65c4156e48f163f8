#!/bin/bash
# Round-5 candidate prober, wave 11: part-O knee-dose transfer snapshots.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5k.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-k $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 21600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_color_v9o1_s*.ckpt.npz \
           candidates/prednet_color_v9o1.npz; do
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
  for f in candidates/prednet_bw_v9o2_s*.ckpt.npz \
           candidates/prednet_bw_v9o2.npz; do
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
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_color_v9o1.json ] \
     && [ -f gallery/probe_v9o2.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave 11 complete"
