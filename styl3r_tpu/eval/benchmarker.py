"""Wall-clock benchmarker (reference `src/misc/benchmarker.py:12-45`):
context-manager timers accumulated per tag, dumped to JSON, plus device
memory stats where the backend exposes them."""

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

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            for _ in range(num_calls):
                self.execution_times[tag].append(elapsed / num_calls)

    def summarize(self) -> Dict[str, float]:
        return {
            tag: sum(times) / len(times)
            for tag, times in self.execution_times.items()
        }

    def dump(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(self.summarize(), f, indent=2)

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
