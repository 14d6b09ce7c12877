#!/bin/bash
# Round-5 queue 5b: relaunch of the lc 5.4x arm after a transient
# tunnel remote_compile failure killed the first attempt's epoch-1
# eval; adds --save_every so transient failures preserve progress.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p outputs/r5queue

REF_CAPS="--fixed_heads --decode_proposals"
LIFTED="--dets 256 --infer_nms 0.7 --det_nms 0.6"
A12="--anchor_sizes 12,24,48 --train_topk 1024 --train_samples 256 \
  --rpn_batch 512 --rpn_pos 256"
BUDGET="--train_topk 1024 --train_samples 256 --rpn_batch 512 --rpn_pos 256"

WD=outputs/sweep/lc/a12x10_s0
mkdir -p "$WD"
( cd "$WD" && \
  python -m livecell_tpu.train.train_custom --batch_size 16 --lr 0.001 \
    --data_dir /tmp/lc10x/split \
    --fixed_heads --decode_proposals --mask_samples 64 --device_data on \
    $A12 --num_epochs 30 --lr_step_size 18 --seed 0 --save_every 6 \
    > train2.log 2>&1 )
CK=$WD/models/custom_maskrcnn_30epochs.ckpt
if [ ! -d "$CK" ]; then
  # fall back to the newest periodic checkpoint if the tail died
  CK=$(ls -d $WD/models/*.ckpt 2>/dev/null | sort -V | tail -1)
fi
if [ -n "$CK" ] && [ -d "$CK" ]; then
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/lc/split \
    $REF_CAPS > outputs/r5queue/a12x10_ref.log 2>&1
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/lc/split \
    $REF_CAPS $LIFTED > outputs/r5queue/a12x10_lifted.log 2>&1
fi
touch outputs/r5queue/Q5B_STEP1_DONE

WD=outputs/sweep/dense/budget3x_s0
mkdir -p "$WD"
( cd "$WD" && \
  python -m livecell_tpu.train.train_custom --batch_size 16 --lr 0.001 \
    --data_dir /tmp/dense3x/split \
    --fixed_heads --decode_proposals --mask_samples 64 --device_data on \
    $BUDGET --num_epochs 30 --lr_step_size 18 --seed 0 --save_every 6 \
    > train2.log 2>&1 )
CK=$WD/models/custom_maskrcnn_30epochs.ckpt
if [ ! -d "$CK" ]; then
  CK=$(ls -d $WD/models/*.ckpt 2>/dev/null | sort -V | tail -1)
fi
if [ -n "$CK" ] && [ -d "$CK" ]; then
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/dense/split \
    $REF_CAPS > outputs/r5queue/dense3x_ref.log 2>&1
  python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/dense/split \
    $REF_CAPS $LIFTED > outputs/r5queue/dense3x_lifted.log 2>&1
fi
touch outputs/r5queue/Q5B_DONE
