#!/usr/bin/env bash
# End-to-end real-LIVECell runbook: the day this machine has network
# access, AP parity vs the reference is ONE command:
#
#     bash scripts/run_real_livecell.sh [WORKDIR]
#
# Mirrors the reference pipeline (reference README.md:110-217):
# download -> schema-validate -> tile -> train (quirk + fixed) ->
# COCO AP -> stitch-visualize, with DVC pointers generated for both
# data trees. Every stage is idempotent: finished stages are skipped on
# re-run, so a flaky download resumes where it stopped.
#
# Environment knobs:
#   NUM_IMAGES   source frames to tile (default 100, reference default)
#   EPOCHS       training epochs       (default 10)
#   BATCH_SIZE   training batch size   (default 16)
#   SKIP_DOWNLOAD=1  use an existing $WORK/data tree
set -euo pipefail

WORK="${1:-$(pwd)/livecell_run}"
NUM_IMAGES="${NUM_IMAGES:-100}"
EPOCHS="${EPOCHS:-10}"
BATCH_SIZE="${BATCH_SIZE:-16}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$WORK"
cd "$WORK"
echo "== LIVECell real-data run in $WORK =="

# 1. Download (reference scripts/download_data.py; ~8 GB).
if [[ "${SKIP_DOWNLOAD:-0}" != "1" && ! -f data/.download_done ]]; then
  python -m livecell_tpu.data.download --dest data
  touch data/.download_done
fi

# 2. Schema validation — fail fast on a malformed tree.
python -m livecell_tpu.data.validate --data_dir data

# 3. Tile 704x520 frames into the 5x5 grid of ~300x222 patches
#    (reference src/preprocess_dataset.py).
if [[ ! -f data_split/.tiling_done ]]; then
  python -m livecell_tpu.data.tiling \
    --source_dir data --output_dir data_split \
    --num_images_per_split "$NUM_IMAGES"
  touch data_split/.tiling_done
fi

# 4. DVC-compatible pointers for both trees (reference data.dvc /
#    data_split.dvc).
python -m livecell_tpu.data.dvc --path data --out data.dvc
python -m livecell_tpu.data.dvc --path data_split --out data_split.dvc

# train_custom saves to models/custom_maskrcnn_${EPOCHS}epochs.ckpt
# (same layout as reference train_custom.py:365-372); each config's
# checkpoint is moved to a distinct name afterwards.
CKPT="models/custom_maskrcnn_${EPOCHS}epochs.ckpt"

# 5a. Train with the reference's own semantics (quirk mode) — the
#     apples-to-apples comparison row.
if [[ ! -e models/custom_quirk.ckpt ]]; then
  python -m livecell_tpu.train.train_custom \
    --data_dir data_split --batch_size "$BATCH_SIZE" --lr 0.001 \
    --num_epochs "$EPOCHS" --coco_ap --device_data on
  mv "$CKPT" models/custom_quirk.ckpt
fi

# 5b. Train the flagship quality mode (quirk fixes + decoded proposals;
#     reproduces mask AP 0.82+ on the synthetic proxy).
if [[ ! -e models/custom_fixed.ckpt ]]; then
  python -m livecell_tpu.train.train_custom \
    --data_dir data_split --batch_size "$BATCH_SIZE" --lr 0.001 \
    --num_epochs "$EPOCHS" --lr_step_size 6 \
    --fixed_heads --decode_proposals --mask_samples 64 \
    --dets 256 --infer_nms 0.7 --det_nms 0.6 \
    --coco_ap --device_data on
  mv "$CKPT" models/custom_fixed.ckpt
fi

# 5c. Transfer path with GENUINE torchvision COCO weights (reference
#     src/train_transfer.py:22 pretrained=True). Checksum-pinned
#     download; the import is cross-checked against torch-CPU's own
#     forward on the same fixture before any training starts, so a
#     torchvision version drift fails loudly here, not as silent AP.
TV_URL="https://download.pytorch.org/models/maskrcnn_resnet50_fpn_coco-bf2d0c1e.pth"
if [[ ! -e models/transfer_real.ckpt ]]; then
  if [[ ! -f models/maskrcnn_resnet50_fpn_coco.pth ]]; then
    mkdir -p models
    # Non-fatal: on a zero-egress host the rest of the pipeline (and
    # the stitch-visualization below) is already complete; the transfer
    # stage picks up on the next run once the weights are reachable.
    if ! curl -fL "$TV_URL" -o models/maskrcnn_resnet50_fpn_coco.pth; then
      rm -f models/maskrcnn_resnet50_fpn_coco.pth
      echo "WARNING: torchvision weights unreachable — skipping the" \
           "pretrained transfer stage (re-run with network, or drop a" \
           "local .pth at models/maskrcnn_resnet50_fpn_coco.pth)"
    fi
  fi
  if [[ -f models/maskrcnn_resnet50_fpn_coco.pth ]]; then
    # The pin is the official torchvision hash prefix (bf2d0c1e — by
    # torchvision convention the filename suffix IS the first 8 hex of
    # the file's sha256). A mismatched file is rejected, not warned:
    # both consumers also torch.load(weights_only=True) so a tampered
    # pickle is never executed, but there is no reason to proceed with
    # wrong bytes. Update the pin if upstream ever re-serializes.
    GOT_FULL=$(sha256sum models/maskrcnn_resnet50_fpn_coco.pth | cut -d' ' -f1)
    GOT=${GOT_FULL:0:8}
    if [[ "$GOT" != "bf2d0c1e" ]]; then
      echo "ERROR: weight sha256 prefix $GOT != pinned bf2d0c1e -" \
           "refusing to load; delete the file and re-download" >&2
      exit 1
    fi
    # Prefer the full 256-bit pin once any networked host has recorded
    # it in the manifest (docs/manifests/torchvision_weights.json
    # sha256_full); the 8-char prefix is a 32-bit filename convention,
    # not an integrity pin.
    PINNED_FULL=$(python -c "import json;print(json.load(open('$REPO/docs/manifests/torchvision_weights.json')).get('sha256_full') or '')")
    if [[ -n "$PINNED_FULL" && "$GOT_FULL" != "$PINNED_FULL" ]]; then
      echo "ERROR: weight sha256 $GOT_FULL != manifest sha256_full" \
           "$PINNED_FULL - refusing to load" >&2
      exit 1
    fi
    if [[ -z "$PINNED_FULL" ]]; then
      echo "NOTE: record this host's digest in the manifest:" \
           "sha256_full=$GOT_FULL"
    fi
    python "$REPO/scripts/check_torch_import.py" \
      --weights models/maskrcnn_resnet50_fpn_coco.pth
    python -m livecell_tpu.train.train_transfer \
      --data_dir data_split --batch_size 4 \
      --pretrained models/maskrcnn_resnet50_fpn_coco.pth \
      --coco_ap --device_data on
    mv models/maskrcnn_resnet50_two_stage.ckpt models/transfer_real.ckpt
  fi
fi

# 6. Stitch-visualize predictions on test frames
#    (reference src/visualize.py).
python -m livecell_tpu.serve.visualize \
  --model1_path models/custom_fixed.ckpt --model1_type custom \
  --model1_name "Custom (fixed)" \
  --test_dir data_split/test/images --data_dir data \
  --output_dir visualizations \
  --dets 256 --infer_nms 0.7 --det_nms 0.6

echo "== Done. AP numbers: see the train logs above; overlays in \
$WORK/visualizations =="
