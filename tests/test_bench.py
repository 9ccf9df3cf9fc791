"""The tracked bench artifact's code path: bench.py must emit one valid JSON
line with the driver contract keys plus the r4 telemetry (MFU, pair-cap
lossless check) on a CPU smoke run."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_bench_cpu_tiny_record_contract(tmp_path):
    extra = tmp_path / "extra.json"
    proc = subprocess.run(
        [sys.executable, "bench.py", "--cpu", "--tiny", "--iters", "2",
         "--extra", str(extra)],
        cwd=ROOT, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    record = json.loads(line)
    # Driver contract.
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in record, record
    assert record["unit"] == "scenes/s"
    assert record["value"] > 0
    # r4 telemetry: MFU + pair-cap lossless check.
    for key in ("mfu", "tflops", "model_gflops", "live_pairs_max", "pair_slots"):
        assert key in record, record
    assert record["live_pairs_max"] <= record["pair_slots"]  # lossless here
    assert "pair_cap_overflow" not in record
    # --extra writes the same record.
    assert json.loads(extra.read_text()) == record
