#!/usr/bin/env bash
# Drive every user-facing CLI surface end-to-end on tiny synthetic inputs.
# No dataset, no TPU required (CPU by default; unset JAX_PLATFORMS to use the
# chip). Each step exercises a real entrypoint the way a user would.
#
#   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu bash scripts/smoke_all.sh [workdir]
#
# Covers: train+validate epoch, checkpoint --resume --test_only, stereo
# trainer (synthetic disparity), semantic inference with checkpoint restore,
# stereo disparity inference (16-bit PNGs), the EDT visualizer, and the
# multi-chip dry run. bench.py and scripts/measure_epoch.py are the TPU-side
# counterparts (run those on the chip).
set -euo pipefail
cd "$(dirname "$0")/.."
WORK="${1:-/tmp/dcss_smoke}"
rm -rf "$WORK" && mkdir -p "$WORK"

COMMON=(--dataset synthetic --compute_dtype float32 --no_use_balanced_weights
        --batch_size 2 --val_batch_size 2 --debug --run_root "$WORK/run"
        --num_workers 2)

echo "=== [1/7] train + validate (flagship criterion) ==="
python main.py "${COMMON[@]}" --train_semantic \
    --criterion supcon_pixelcontrast_focal --epochs 1 --checkname smoke

CKPT=$(ls -d "$WORK"/run/synthetic/smoke/*/checkpoints/latest_checkpoint | head -1)
echo "checkpoint: $CKPT"

echo "=== [2/7] --test_only --resume (standalone validator) ==="
python main.py "${COMMON[@]}" --train_semantic --criterion none \
    --test_only --resume "$CKPT" --checkname smoke_eval

echo "=== [3/7] stereo trainer (synthetic disparity, EPE/D1 validation) ==="
python main.py "${COMMON[@]}" --epochs 1 --checkname smoke_stereo \
    --transfer_disparity --criterion none --refinement_type stereonet

echo "=== [3b/7] stereo --test_only --resume (restore + eval, no ckpt writes) ==="
SCKPT=$(ls -d "$WORK"/run/synthetic/smoke_stereo/*/checkpoints/latest_checkpoint | head -1)
python main.py "${COMMON[@]}" --checkname smoke_stereo_eval \
    --transfer_disparity --criterion none --refinement_type stereonet \
    --test_only --resume "$SCKPT"

echo "=== [4/7] semantic inference CLI (checkpoint restore + color dumps) ==="
python - <<'EOF'
from PIL import Image
import numpy as np, os
os.makedirs("/tmp/dcss_smoke/imgs", exist_ok=True)
rng = np.random.default_rng(0)
for i in range(2):
    Image.fromarray(rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)).save(
        f"/tmp/dcss_smoke/imgs/{i:03d}.png")
EOF
python inference.py --input "$WORK/imgs" --output_dir "$WORK/sem_out" \
    --resume "$CKPT" --compute_dtype float32
test -f "$WORK"/sem_out/000_pred.png && test -f "$WORK"/sem_out/000_color.png

echo "=== [5/7] stereo disparity inference (16-bit disp*256 PNGs) ==="
mkdir -p "$WORK/right" && cp "$WORK"/imgs/*.png "$WORK/right/"
python inference.py --stereo --input "$WORK/imgs" --right_input "$WORK/right" \
    --output_dir "$WORK/disp_out" --max_disp 16 --compute_dtype float32
python - <<'EOF'
from PIL import Image
import numpy as np
a = np.asarray(Image.open("/tmp/dcss_smoke/disp_out/000.png"))
assert a.dtype == np.uint16, a.dtype
print("disparity PNG:", a.dtype, a.shape)
EOF

echo "=== [6/7] EDT boundary-weight visualizer ==="
python visualize_balancing_weight.py --dataset synthetic \
    --no_use_balanced_weights --run_root "$WORK/run" --num_workers 2
ls "$WORK"/run/viz_EDT | head -2

echo "=== [7/7] multi-chip dry run (8 virtual devices) ==="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "ALL SURFACES OK"
