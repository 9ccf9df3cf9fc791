"""Wall-clock benchmarker (reference `src/misc/benchmarker.py:12-45`):
context-manager timers accumulated per tag, dumped to JSON, plus device
memory stats where the backend exposes them.

Device-time correctness: `jax.block_until_ready` does NOT wait on the axon
remote-TPU backend (verified against a known-FLOPs matmul chain; see
CLAUDE.md), so timed blocks must call `Benchmarker.sync(result)` before
exiting — it forces a one-element host fetch, and the timer subtracts a
calibrated null-dispatch roundtrip so the ~25 ms tunnel latency doesn't
pollute the numbers. On standard backends the same pattern is correct and
the roundtrip correction is microseconds.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, List


class Benchmarker:
    def __init__(self):
        self.execution_times: Dict[str, List[float]] = defaultdict(list)
        self._group_sizes: Dict[str, List[int]] = defaultdict(list)
        self._roundtrip = None

    def calibrate(self) -> float:
        """Measure the dispatch+fetch roundtrip of a null jit (min of 3)."""
        import jax
        import jax.numpy as jnp

        null = jax.jit(lambda x: x + 1.0)
        float(null(jnp.float32(0)))  # compile + warm
        samples = []
        for i in range(3):
            t0 = time.perf_counter()
            float(null(jnp.float32(i)))
            samples.append(time.perf_counter() - t0)
        self._roundtrip = min(samples)
        return self._roundtrip

    @staticmethod
    def sync(tree):
        """Force device completion of `tree`: block_until_ready plus a
        one-element host fetch (the fetch is what actually waits on the axon
        backend). Returns `tree` unchanged."""
        import jax
        import numpy as np

        jax.block_until_ready(tree)
        leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "ndim")]
        if leaves:
            leaf = leaves[-1]
            scalar = leaf if leaf.ndim == 0 else leaf[(0,) * leaf.ndim]
            np.asarray(scalar)
        return tree

    @contextmanager
    def time(self, tag: str, num_calls: int = 1, subtract_roundtrip: bool = True):
        """Time a block. The block must end with `Benchmarker.sync(result)`
        (or otherwise force a host fetch); one calibrated dispatch roundtrip
        is subtracted from the elapsed time."""
        if self._roundtrip is None and subtract_roundtrip:
            self.calibrate()
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            if subtract_roundtrip and self._roundtrip is not None:
                elapsed = max(elapsed - self._roundtrip, 0.0)
            self.last_elapsed = elapsed
            self.record(tag, elapsed, num_calls)

    def record(self, tag: str, elapsed: float, num_calls: int = 1) -> None:
        """Append a pre-measured block under `tag`, split over `num_calls`.
        Lets one timed block feed several per-frame divisors (e.g. decoder
        vs decoder_unpadded in the eval harness)."""
        for _ in range(num_calls):
            self.execution_times[tag].append(elapsed / num_calls)
        self._group_sizes[tag].append(num_calls)

    def summarize(self) -> Dict[str, float]:
        """Per-tag mean (reference benchmarker contract) plus `<tag>_steady`:
        the mean excluding each tag's first sample, which pays the jit
        compile (minutes on the remote-compile backend — the plain mean is
        meaningless at small scene counts)."""
        out = {}
        for tag, times in self.execution_times.items():
            out[tag] = sum(times) / len(times)
            first_group = (self._group_sizes[tag] or [1])[0]
            steady = times[first_group:]
            if steady:
                out[f"{tag}_steady"] = sum(steady) / len(steady)
        return out

    def dump(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        payload = dict(self.summarize())
        if self._roundtrip is not None:
            payload["_dispatch_roundtrip_subtracted"] = self._roundtrip
        with path.open("w") as f:
            json.dump(payload, f, indent=2)

    def dump_memory(self, path: Path) -> None:
        import jax

        stats = {}
        for d in jax.devices():
            try:
                stats[str(d)] = d.memory_stats()
            except Exception:
                stats[str(d)] = None
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(stats, f, indent=2, default=str)

    def clear_history(self) -> None:
        self.execution_times.clear()
        self._group_sizes.clear()
