#!/bin/bash
# Round-5 phase 3 (serial — ONE TPU process at a time, CLAUDE.md):
# batch-scaling legs for BENCH_SCALING_r05.json (VERDICT r4 #5), then
# re-warm the driver-entry graphs so the round-end driver runs are fast.
#   * b=4 / b=8 bench at the new defaults (pair_cap=2, the r3-bar protocol);
#     b=8 exercises the reduce-and-retry HBM ladder if it OOMs.
#   * b=4 profiler slices (full forward + predict) to attribute where batch
#     scaling stops: if predict scales but full doesn't, it's the render.
set -x
cd /root/repo

python bench.py --batch 4 --iters 20 --extra /tmp/b4_i20.json
python bench.py --batch 8 --iters 10 --extra /tmp/b8_i10.json
python scripts/profile_stages.py --batch 4 --iters 20 --pair-cap 2 \
    --stages "full forward" --output /tmp/p_b4_full.json
python scripts/profile_stages.py --batch 4 --iters 20 --pair-cap 2 \
    --stages "predict (enc+sty+heads+adapter)" --output /tmp/p_b4_predict.json
python scripts/assemble_r5_artifacts.py

# Re-warm the exact graphs the round-end driver runs (defaults).
python bench.py --extra /tmp/b1_rewarm.json
python __graft_entry__.py

echo PHASE3-DONE
