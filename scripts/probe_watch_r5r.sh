#!/bin/bash
# CPU probe watcher for campaign part R snapshots + finals.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5r.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-r $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 21600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_bw_v9r1_s*.ckpt.npz \
           candidates/prednet_bw_v9r2_s*.ckpt.npz \
           candidates/prednet_bw_v9r3_s*.ckpt.npz \
           candidates/prednet_bw_v9r1.npz \
           candidates/prednet_bw_v9r2.npz \
           candidates/prednet_bw_v9r3.npz; do
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
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_v9r1.json ] \
     && [ -f gallery/probe_v9r2.json ] && [ -f gallery/probe_v9r3.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave R complete"
