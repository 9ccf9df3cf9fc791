#!/bin/bash
# Round-5 TPU artifact refresh (serial — ONE TPU process at a time, CLAUDE.md).
# Probe first: timeout 60 python -c "import jax; print(jax.devices())"
#
# Targets (VERDICT r4 "next round"):
#   #1 TRAINBENCH_r05: full 256^2 b=1 train step <= 100 ms post scatter fix,
#      bf16 head trunks, + post-fix backward attribution.
#   #2 BENCH_r05 >= 41 scenes/s, or committed attribution of the delta
#      (iters=10 jitter vs the n=30 profile is the prime suspect).
#   #3 PROFILE_r05_4view >= 20 scenes/s.
#   #5 b=4 scaling attribution.
set -x
cd /root/repo

# --- #2: bench accounting matrix (same graph cache as the driver run) ---
python bench.py --iters 30 --extra /tmp/b_i30.json || exit 1
python bench.py --extra /tmp/b_i10a.json
python bench.py --extra /tmp/b_i10b.json
python bench.py --iters 30 --keep-f32-params --extra /tmp/b_f32_i30.json

# --- #1: train-step bench, bf16 trunks, gather-formulation backward ---
python scripts/bench_train_step.py --output TRAINBENCH_r05.json

# --- #1: post-fix backward attribution ---
python scripts/profile_stages.py --stages bwd --iters 10 --pair-cap 4 \
    --output PROFILE_r05_bwd.json

# --- #3: 4-view ---
python scripts/profile_stages.py --views 4 --stages "full forward" --iters 20 \
    --pair-cap 4 --output /tmp/p4_full.json
python scripts/profile_stages.py --views 4 \
    --stages "render (proj+sort+composite)" --iters 20 --pair-cap 4 \
    --output /tmp/p4_render.json

# --- #5: batch scaling ---
python bench.py --batch 4 --iters 20 --extra /tmp/b4_i20.json
python bench.py --batch 8 --iters 10 --extra /tmp/b8_i10.json
python scripts/profile_stages.py --batch 4 --stages "full forward" --iters 20 \
    --pair-cap 4 --output /tmp/p_b4_full.json
python scripts/profile_stages.py --batch 4 \
    --stages "predict (enc+sty+heads+adapter)" --iters 20 \
    --output /tmp/p_b4_predict.json

echo REFRESH-DONE
