#!/bin/bash
# Round-5 queue, take 5 (fresh session — queue3b/4 artifacts were lost
# with /tmp and outputs/). Re-runs the two big-data arms:
#   1. lc 7.3x-data arm (VERDICT #1, the 0.45 push): 2550 seed-200
#      train tiles, 30-epoch a12 recipe, eval on the seed-0 lc test tiles.
#   2. dense 3x-data arm (VERDICT #2 follow-through): dense budgets,
#      reference anchors, 30 epochs on 1050 seed-300 tiles, eval on
#      seed-0 dense test tiles.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p outputs/r5queue

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

REF_CAPS="--fixed_heads --decode_proposals"
LIFTED="--dets 256 --infer_nms 0.7 --det_nms 0.6"
A12="--anchor_sizes 12,24,48 --train_topk 1024 --train_samples 256 \
  --rpn_batch 512 --rpn_pos 256"
BUDGET="--train_topk 1024 --train_samples 256 --rpn_batch 512 --rpn_pos 256"

while [ ! -f outputs/r5queue/GEN_LC10X_DONE ]; do sleep 10; done

# 1. lc 7.3x data, 30 epochs
WD=outputs/sweep/lc/a12x10_s0
mkdir -p "$WD"
( cd "$WD" && \
  python -m livecell_tpu.train.train_custom --batch_size 16 --lr 0.001 \
    --data_dir /tmp/lc10x/split \
    --fixed_heads --decode_proposals --mask_samples 64 --device_data on \
    $A12 --num_epochs 30 --lr_step_size 18 --seed 0 \
    > train.log 2>&1 )
CK=$WD/models/custom_maskrcnn_30epochs.ckpt
if [ -d "$CK" ]; then
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/lc/split \
    $REF_CAPS > outputs/r5queue/a12x10_ref.log 2>&1
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/lc/split \
    $REF_CAPS $LIFTED > outputs/r5queue/a12x10_lifted.log 2>&1
fi
touch outputs/r5queue/Q5_STEP1_DONE

while [ ! -f outputs/r5queue/GEN_DENSE3X_DONE ]; do sleep 10; done

# 2. dense 3x data, 30 epochs, budget recipe
WD=outputs/sweep/dense/budget3x_s0
mkdir -p "$WD"
( cd "$WD" && \
  python -m livecell_tpu.train.train_custom --batch_size 16 --lr 0.001 \
    --data_dir /tmp/dense3x/split \
    --fixed_heads --decode_proposals --mask_samples 64 --device_data on \
    $BUDGET --num_epochs 30 --lr_step_size 18 --seed 0 \
    > train.log 2>&1 )
CK=$WD/models/custom_maskrcnn_30epochs.ckpt
if [ -d "$CK" ]; then
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/dense/split \
    $REF_CAPS > outputs/r5queue/dense3x_ref.log 2>&1
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/dense/split \
    $REF_CAPS $LIFTED > outputs/r5queue/dense3x_lifted.log 2>&1
fi
touch outputs/r5queue/Q5_STEP2_DONE
touch outputs/r5queue/Q5_DONE
