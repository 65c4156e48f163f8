#!/bin/bash
# Round-5 candidate prober, wave 4: part-G dose-time snapshots.
# Converts each harvested .ckpt.npz to plain weights and CPU-probes it.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5d.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch-d $(date -u +%H:%M:%S)] $*"; }

# keep scanning until both final outputs exist and every snapshot +
# final has been probed (or 2h cap)
deadline=$(( $(date +%s) + 7200 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  todo=0
  for f in candidates/prednet_bw_v9*_s*.ckpt.npz \
           candidates/prednet_bw_v9r.npz candidates/prednet_bw_v9h.npz; do
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
  # stop once both finals are probed and nothing is pending
  if [ "$todo" -eq 0 ] && [ -f gallery/probe_v9r.json ] \
     && [ -f gallery/probe_v9h.json ]; then
    break
  fi
  sleep 20
done
stamp "probe watch wave 4 complete"
