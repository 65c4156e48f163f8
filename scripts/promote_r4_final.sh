#!/bin/bash
# Round-4 final promotion: copy the chosen BW + color candidates over the
# bundled defaults, regenerate the ordering cache + rated table ON TPU
# (cross-backend drift ~0.008 > the 0.005 ratchet margin — BENCH_NOTES
# "Color stack retrained"), then regenerate the fast gallery runs.
#
#   bash scripts/promote_r4_final.sh candidates/prednet_bw_<tag>.npz <tag>
set -eu
cd /root/repo
BW_CAND="$1"
TAG="$2"
W=evolutionary_illusion_generator_tpu/models/prednet/weights

cp "$BW_CAND" $W/prednet_1_16_32_64.npz
cp candidates/prednet_color_v6ab.npz $W/prednet_3_48_96_192.npz
echo "[final] bundled BW <- $BW_CAND ; color <- prednet_color_v6ab.npz"

# one TPU client at a time; each step has its own watchdog via tpu_run
python scripts/tpu_run.py --log gallery/logs/cache_regen_${TAG}.log --stall 1800 --retries 3 -- \
  python scripts/cache_probe_vectors.py --allow_regression
sleep 120
python scripts/tpu_run.py --log gallery/logs/probe_${TAG}_final.log --stall 1800 --retries 3 -- \
  python scripts/probe_rated.py --json gallery/rated_probe_${TAG}.json
echo "[final] cache + table done; review, then run the gallery:"
echo "  python scripts/make_gallery.py circles_bw circles_color free_color bands circles_free"
