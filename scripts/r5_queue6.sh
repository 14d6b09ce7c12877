#!/bin/bash
# Round-5 queue, take 6 — chains after r5_queue5.sh (pass its PID).
#   1. serve bench with the pipelined host path (VERDICT #5 re-measure)
#   2. transfer two-stage quality re-validation with the bf16 RoI feed
#      (VERDICT #3: "transfer quality re-validated")
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p outputs/r5queue

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
fi

python scripts/bench_serve.py \
  > outputs/r5queue/serve_bench.json 2> outputs/r5queue/serve_bench.err
touch outputs/r5queue/Q6_STEP1_DONE

WD=outputs/sweep/transfer_reval
mkdir -p "$WD"
( cd "$WD" && \
  python -m livecell_tpu.train.train_transfer --data_dir /tmp/synth/split \
    --batch_size 4 --stage1_epochs 2 --stage2_epochs 8 \
    --clip_grad_norm 10 --coco_ap --mfu --device_data on --seed 0 \
    > train.log 2>&1 )
touch outputs/r5queue/Q6_DONE
