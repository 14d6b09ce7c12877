#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=cpu
python scripts/make_synth_splits.py --roots lc:/tmp/lc --frames 14 3 3 --seed 0 \
  > outputs/r5queue/gen_lc.log 2>&1 && touch outputs/r5queue/GEN_LC_DONE
python scripts/make_synth_splits.py --roots lc:/tmp/lc10x --frames 102 3 3 --seed 200 \
  > outputs/r5queue/gen_lc10x.log 2>&1 && touch outputs/r5queue/GEN_LC10X_DONE
python scripts/make_synth_splits.py --roots dense:/tmp/dense --frames 14 3 3 --seed 0 \
  > outputs/r5queue/gen_dense.log 2>&1 && touch outputs/r5queue/GEN_DENSE_DONE
python scripts/make_synth_splits.py --roots dense:/tmp/dense3x --frames 42 3 3 --seed 300 \
  > outputs/r5queue/gen_dense3x.log 2>&1 && touch outputs/r5queue/GEN_DENSE3X_DONE
touch outputs/r5queue/GEN_ALL_DONE
