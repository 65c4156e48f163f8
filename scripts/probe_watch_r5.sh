#!/bin/bash
# Round-5 candidate prober: as each campaign output lands, run the CPU
# rated probe (CLAUDE.md: CPU probes are fine for candidate COMPARISONS;
# only floor-setting caches must be TPU-regenerated) and write
# gallery/probe_<tag>.json.  Runs concurrently with TPU training — the
# probe forces the CPU backend so it never contends for the device claim.
set -u
cd /root/repo
LOG=gallery/logs/probe_watch_r5.log
exec >>"$LOG" 2>&1

stamp() { echo "[probe-watch $(date -u +%H:%M:%S)] $*"; }

probe_bw() { # tag path
  stamp "probing BW $1 ..."
  python scripts/probe_rated.py --cpu --only bw --model_bw "$2" \
    --json "gallery/probe_$1.json"
  stamp "BW $1 done rc=$?"
}

probe_color() { # tag path
  stamp "probing COLOR $1 ..."
  python scripts/probe_rated.py --cpu --only color --model_color "$2" \
    --json "gallery/probe_$1.json"
  stamp "COLOR $1 done rc=$?"
}

wait_for() { # path max_iter
  for i in $(seq 1 "$2"); do
    [ -f "$1" ] && return 0
    sleep 15
  done
  return 1
}

for tag in v7a v7c v7b bw_v7band; do
  f="candidates/prednet_bw_${tag#bw_}.npz"
  [ "$tag" = bw_v7band ] && f="candidates/prednet_bw_v7band.npz"
  out="gallery/probe_$tag.json"
  [ -f "$out" ] && { stamp "$tag already probed"; continue; }
  stamp "waiting for $f ..."
  if wait_for "$f" 2400; then probe_bw "$tag" "$f"; else stamp "$f never appeared"; fi
done

out=gallery/probe_color_v7band.json
if [ ! -f "$out" ]; then
  if wait_for candidates/prednet_color_v7band.npz 2400; then
    probe_color color_v7band candidates/prednet_color_v7band.npz
  else
    stamp "color v7band never appeared"
  fi
fi
stamp "probe watch complete"
