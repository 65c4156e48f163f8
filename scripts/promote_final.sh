#!/bin/bash
# Final promotion: re-save the chosen BW + color candidates over the
# bundled defaults (f16, via promote-style save_params), regenerate the
# ordering cache + rated table ON TPU (cross-backend drift ~0.008 > the
# 0.005 ratchet margin — BENCH_NOTES "Color stack retrained"), then
# remind about the gallery.
#
#   bash scripts/promote_final.sh <bw_cand.npz> <color_cand.npz> <tag> \
#       [extra cache_probe_vectors flags...]
#
# Regression acceptance is NOT implied: pass --allow_regression (and, for
# aggregate floors, --aggregate_rationale '<text already in BENCH_NOTES>')
# explicitly as extra flags — each promotion consciously accepts any
# trade (ADVICE r4).
set -eu
cd /root/repo
BW_CAND="$1"
COLOR_CAND="$2"
TAG="$3"
shift 3
W=evolutionary_illusion_generator_tpu/models/prednet/weights

python - "$BW_CAND" "$COLOR_CAND" <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from evolutionary_illusion_generator_tpu.models.prednet.loader import (
    load_params, save_params)
W = ("evolutionary_illusion_generator_tpu/models/prednet/weights/"
     "prednet_{}.npz")
for cand, stack in ((sys.argv[1], "1_16_32_64"),
                    (sys.argv[2], "3_48_96_192")):
    save_params(load_params(cand, dtype=np.float32), W.format(stack),
                dtype=np.float16)
    print(f"[final] {cand} -> {W.format(stack)} [f16]")
EOF

# one TPU client at a time; each step has its own watchdog via tpu_run
python scripts/tpu_run.py --log gallery/logs/cache_regen_${TAG}.log --stall 1800 --retries 3 -- \
  python scripts/cache_probe_vectors.py "$@"
sleep 120
python scripts/tpu_run.py --log gallery/logs/probe_${TAG}_final.log --stall 1800 --retries 3 -- \
  python scripts/probe_rated.py --json gallery/rated_probe_${TAG}.json
echo "[final] cache + table done; review, then run the gallery:"
echo "  python scripts/make_gallery.py circles_bw circles_color free_color bands circles_free"
