#!/bin/bash
# Round-5 TPU queue, take 3b — short diagnostics slot between queue3
# (seed re-runs) and queue4 (big-data arms). Chained on queue3's PID.
#   1. transfer-step roofline (is 26.7% MFU an HBM bound or slack?)
#   2. transfer xprof trace at bs=4 (VERDICT #3: "publish the breakdown")
#   3. transfer bs=8 scan-program probe (VERDICT #3: "try bs=8")
#   4. serve bench with the r5 pipelined host path (VERDICT #5 re-measure)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p outputs/r5queue

WAIT_PID="${1:-0}"
if [ "$WAIT_PID" != "0" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

python scripts/roofline.py --transfer --batch_size 4 --measure \
  > outputs/r5queue/roofline_transfer_bs4.json 2> outputs/r5queue/roofline_transfer_bs4.err
touch outputs/r5queue/Q3B_STEP1_DONE

python scripts/profile_transfer.py --bs 4 --scan --steps 10 \
  --trace outputs/xprof_transfer_bs4 \
  > outputs/r5queue/transfer_bs4.json 2> outputs/r5queue/transfer_bs4.err
touch outputs/r5queue/Q3B_STEP2_DONE

python scripts/profile_transfer.py --bs 8 --scan --steps 10 --trace "" \
  > outputs/r5queue/transfer_bs8.json 2> outputs/r5queue/transfer_bs8.err
touch outputs/r5queue/Q3B_STEP3_DONE

python scripts/bench_serve.py \
  > outputs/r5queue/serve_bench.json 2> outputs/r5queue/serve_bench.err
touch outputs/r5queue/Q3B_DONE
