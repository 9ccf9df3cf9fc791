#!/bin/bash
# Round-5 phase 2 (serial — ONE TPU process at a time, CLAUDE.md):
#   * bench-vs-profile reconciliation at matched protocol (VERDICT #2):
#     the r3 41-scenes/s bar was an n=30, pair_cap=2 profile measurement,
#     while the r4 driver bench ran n=10, pair_cap=4. Measure both caps via
#     the profiler, then the bench with its new matching defaults (cap=2,
#     n=30 — runtime-checked lossless), which also warms the driver graph.
#   * OVERFIT_r05: stage-1 overfit on the bundled COLMAP scene + fixed-seed
#     VGG stage-2 style phase (VERDICT #4 + #9).
set -x
cd /root/repo

python scripts/profile_stages.py --stages "full forward" --iters 30 \
    --pair-cap 4 --output /tmp/p2_full_cap4.json
python scripts/profile_stages.py --stages "full forward" --iters 30 \
    --pair-cap 2 --output /tmp/p2_full_cap2.json
python bench.py --extra /tmp/b_cap2_i30.json || exit 1

python scripts/overfit_colmap.py --size 256 --model small --steps 2500 \
    --batch 2 --stage2-steps 60 --output OVERFIT_r05.json

echo PHASE2-DONE
