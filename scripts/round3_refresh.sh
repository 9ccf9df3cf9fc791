#!/bin/bash
# Round-3 artifact refresh: run serially on the real TPU (ONE process at a
# time — see CLAUDE.md). Each step re-warms the compile cache the round-end
# driver needs (bench.py graph == entry() graph).
set -x
cd /root/repo

# 1. Headline bench (2-view 256^2 b=1) + b=4 batched extra.
python bench.py --extra /tmp/BENCH_refresh_b1.json || exit 1
python bench.py --batch 4 --extra BENCH_EXTRA_b4.json || exit 1

# 2. 2-view per-stage profile refresh (per-process stages to bound HBM).
python scripts/profile_stages.py --stages "full forward" --iters 30 \
    --pair-cap 4 --output /tmp/p2_full.json
python scripts/profile_stages.py --stages "predict (enc+sty+heads+adapter)" \
    --iters 30 --output /tmp/p2_predict.json
python scripts/profile_stages.py --stages "backbone" --iters 30 \
    --output /tmp/p2_backbone.json
python scripts/profile_stages.py --stages "render (proj+sort+composite)" \
    --iters 30 --pair-cap 4 --output /tmp/p2_render.json

# 3. 4-view profile refresh.
python scripts/profile_stages.py --views 4 --stages "full forward" \
    --iters 20 --pair-cap 4 --output /tmp/p4_full.json
python scripts/profile_stages.py --views 4 \
    --stages "render (proj+sort+composite)" --iters 20 --pair-cap 4 \
    --output /tmp/p4_render.json

echo REFRESH-DONE
