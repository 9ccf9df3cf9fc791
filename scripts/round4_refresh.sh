#!/bin/bash
# Round-4 TPU artifact refresh: run serially on the real TPU (ONE process at
# a time — see CLAUDE.md). Re-warms the compile cache the round-end driver
# needs (bench.py graph == entry() graph), then refreshes every committed
# perf artifact on current code. ~30-60 min first run (remote compiles),
# minutes when cached.
#
# Probe first: timeout 60 python -c "import jax; print(jax.devices())"
set -x
cd /root/repo

# 1. Headline bench (2-view 256^2 b=1, now with MFU + pair-cap telemetry)
#    + b=4 batched extra (VERDICT r3 #5: must beat b=1 per-scene).
python bench.py --extra /tmp/BENCH_refresh_b1.json || exit 1
python bench.py --batch 4 --extra BENCH_EXTRA_b4.json || exit 1

# 2. 2-view per-stage profile (per-process stages to bound HBM).
python scripts/profile_stages.py --stages "full forward" --iters 30 \
    --pair-cap 4 --output /tmp/p2_full.json
python scripts/profile_stages.py --stages "predict (enc+sty+heads+adapter)" \
    --iters 30 --output /tmp/p2_predict.json
python scripts/profile_stages.py --stages "backbone" --iters 30 \
    --output /tmp/p2_backbone.json
python scripts/profile_stages.py --stages "render (proj+sort+composite)" \
    --iters 30 --pair-cap 4 --output /tmp/p2_render.json

# 3. 4-view profile (VERDICT r3 #3: render scaling at 262k gaussians).
python scripts/profile_stages.py --views 4 --stages "full forward" \
    --iters 20 --pair-cap 4 --output /tmp/p4_full.json
python scripts/profile_stages.py --views 4 \
    --stages "render (proj+sort+composite)" --iters 20 --pair-cap 4 \
    --output /tmp/p4_render.json

# 4. Training-step fwd+bwd refresh on current code (pair_cap now on;
#    backward kernel now runs the folded single-suffix-scan form).
python scripts/bench_train_step.py --output TRAINBENCH_r04.json

# 5. Graph attribution for the unexplained 2-view render residual
#    (VERDICT r3 #2): per-stage XLA cost/memory analysis.
python scripts/analyze_graph.py --output /tmp/ANALYZE_r04.json || true

# 6. Backward attribution slices (per-process, VERDICT r3 #4).
python scripts/profile_stages.py --stages bwd --iters 10 --pair-cap 4 \
    --output /tmp/p2_bwd.json || true

echo REFRESH-DONE
