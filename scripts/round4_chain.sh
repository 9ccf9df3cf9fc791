#!/bin/bash
# Round-4 chain-slice attribution of the in-situ 2-view render residual
# (VERDICT r3 #2), on the post-inv3x3 graphs. Serial — ONE TPU process at a
# time (CLAUDE.md). Each stage runs in its own process to bound HBM.
set -x
cd /root/repo

python scripts/profile_stages.py --stages "full forward" --iters 30 \
    --pair-cap 4 --output /tmp/c2_full.json
for st in project binsort pack composite images; do
  python scripts/profile_stages.py --stages "chain:$st" --iters 30 \
      --pair-cap 4 --output /tmp/c2_chain.json
done
python scripts/profile_stages.py --stages "predict (enc+sty+heads+adapter)" \
    --iters 30 --output /tmp/c2_predict.json

echo CHAIN-DONE
