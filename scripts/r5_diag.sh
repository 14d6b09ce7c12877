#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
mkdir -p outputs/r5queue
python scripts/roofline.py --transfer --batch_size 4 --measure \
  > outputs/r5queue/roofline_transfer_bs4.json 2> outputs/r5queue/roofline_transfer_bs4.err
touch outputs/r5queue/DIAG1_DONE
python scripts/profile_transfer.py --bs 8 --scan --steps 10 --trace "" \
  > outputs/r5queue/transfer_bs8.json 2> outputs/r5queue/transfer_bs8.err
touch outputs/r5queue/DIAG2_DONE
