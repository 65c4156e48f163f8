#!/bin/bash
# Round-5 candidate prober, wave 9: part-M dose-response snapshots.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5i.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-i $(date -u +%H:%M:%S)] $*"; }

deadline=$(( $(date +%s) + 21600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_bw_v9m1_s*.ckpt.npz \
           candidates/prednet_bw_v9m2_s*.ckpt.npz \
           candidates/prednet_bw_v9m3_s*.ckpt.npz \
           candidates/prednet_bw_v9m4_s*.ckpt.npz \
           candidates/prednet_bw_v9m1.npz candidates/prednet_bw_v9m2.npz \
           candidates/prednet_bw_v9m3.npz candidates/prednet_bw_v9m4.npz; do
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
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_v9m1.json ] \
     && [ -f gallery/probe_v9m2.json ] && [ -f gallery/probe_v9m3.json ] \
     && [ -f gallery/probe_v9m4.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave 9 complete"
