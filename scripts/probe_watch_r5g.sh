#!/bin/bash
# Round-5 candidate prober, wave 7: part-K knee-scan snapshots.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5g.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-g $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 14400 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_bw_v9k1_s*.ckpt.npz \
           candidates/prednet_bw_v9k2_s*.ckpt.npz \
           candidates/prednet_bw_v9k3_s*.ckpt.npz \
           candidates/prednet_bw_v9k1.npz candidates/prednet_bw_v9k2.npz \
           candidates/prednet_bw_v9k3.npz; do
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
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_v9k1.json ] \
     && [ -f gallery/probe_v9k2.json ] && [ -f gallery/probe_v9k3.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave 7 complete"
