#!/bin/bash
# Round-5 TPU queue, take 3 — chains after r5_queue2.sh (pass its bash
# PID). Do NOT edit while running. Children redirect to files.
#   1. oracle decomposition of the lc residual gap (lifted caps) on TPU
#      (the host has ONE CPU core; arm B/C inference is TPU work)
#   2. a12 seed 1 + seed 2 re-runs for the 3-seed spread (VERDICT #7);
#      the original seed-1 run died on SIGPIPE before saving
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p outputs/r5queue

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

REF_CAPS="--fixed_heads --decode_proposals"
LIFTED="--dets 256 --infer_nms 0.7 --det_nms 0.6"
A12="--anchor_sizes 12,24,48 --train_topk 1024 --train_samples 256 \
  --rpn_batch 512 --rpn_pos 256"

python scripts/oracle_probe.py \
  --ckpt outputs/sweep/lc/a12_s0/models/custom_maskrcnn_10epochs.ckpt \
  --data_dir /tmp/lc/split $LIFTED \
  --out outputs/oracle_lc_a12_lifted.json \
  > outputs/r5queue/oracle_lc.log 2>&1
touch outputs/r5queue/Q3_STEP1_DONE

for SEED in 1 2; do
  WD=outputs/sweep/lc/a12_s$SEED
  mkdir -p "$WD"
  ( cd "$WD" && \
    python -m livecell_tpu.train.train_custom --batch_size 16 --lr 0.001 \
      --data_dir /tmp/lc/split \
      --fixed_heads --decode_proposals --mask_samples 64 --device_data on \
      $A12 --num_epochs 10 --lr_step_size 6 --seed $SEED \
      > train.log 2>&1 )
  CK=$WD/models/custom_maskrcnn_10epochs.ckpt
  if [ -d "$CK" ]; then
    python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/lc/split \
      $REF_CAPS > outputs/r5queue/a12_s${SEED}_ref.log 2>&1
    python scripts/eval_ckpt.py --ckpt "$CK" --data_dir /tmp/lc/split \
      $REF_CAPS $LIFTED > outputs/r5queue/a12_s${SEED}_lifted.log 2>&1
  fi
  touch outputs/r5queue/Q3_SEED${SEED}_DONE
done
touch outputs/r5queue/Q3_DONE
