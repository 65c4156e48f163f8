#!/bin/bash
# CPU probe watcher for campaign part Q snapshots + finals.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5q.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-q $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 14400 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_bw_v9q1_s*.ckpt.npz \
           candidates/prednet_bw_v9q2_s*.ckpt.npz \
           candidates/prednet_bw_v9q3_s*.ckpt.npz \
           candidates/prednet_bw_v9q1.npz \
           candidates/prednet_bw_v9q2.npz \
           candidates/prednet_bw_v9q3.npz; do
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
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_v9q1.json ] \
     && [ -f gallery/probe_v9q2.json ] && [ -f gallery/probe_v9q3.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave 13 complete"
