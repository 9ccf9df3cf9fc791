#!/bin/bash
# Poll the axon TPU tunnel until it answers, then exit 0.
# One attempt every 5 min, 60 s timeout each (CLAUDE.md probe recipe).
# Exits 1 after ~11 h of failures.
for i in $(seq 1 132); do
  if timeout 60 python -c "import jax; print(jax.devices())" 2>/dev/null | grep -q axon; then
    echo "TPU BACK at attempt $i ($(date -u +%H:%M:%S))"
    exit 0
  fi
  echo "attempt $i: tunnel down ($(date -u +%H:%M:%S))"
  sleep 240
done
exit 1
