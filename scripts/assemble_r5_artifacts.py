"""Assemble round-5 committed artifacts from the /tmp measurement matrix.

Inputs (produced by scripts/round5_refresh.sh + scripts/round5_phase2.sh):
  /tmp/b_i30.json, /tmp/b_i10a.json, /tmp/b_i10b.json, /tmp/b_f32_i30.json
      — bench accounting matrix at pair_cap=4 (pre-change defaults);
  /tmp/b_cap2_i30.json — bench at the new defaults (pair_cap=2, n=30);
  /tmp/p2_full_cap4.json, /tmp/p2_full_cap2.json — profiler "full forward"
      at both caps (the r3 41-scenes/s bar was the cap=2 profiler number);
  /tmp/p4_full.json, /tmp/p4_render.json — 4-view slices;
  /tmp/b4_i20.json, /tmp/b8_i10.json, /tmp/p_b4_full.json,
      /tmp/p_b4_predict.json — batch-scaling matrix.

Outputs:
  BENCH_ATTRIB_r05.json — the driver-bench vs r3-profile reconciliation
      (VERDICT r4 next-round #2);
  PROFILE_r05_4view.json — 4-view refresh (#3);
  BENCH_SCALING_r05.json — b=1/4/8 scaling + attribution (#5).

Missing inputs are recorded as null rather than failing, so this can run on
a partial matrix.
"""

import json
from pathlib import Path


def load(p):
    try:
        return json.loads(Path(p).read_text())
    except Exception:
        return None


def main():
    tmp = {
        name: load(f"/tmp/{name}.json")
        for name in (
            "b_i30", "b_i10a", "b_i10b", "b_f32_i30", "b_cap2_i30",
            "p2_full_cap4", "p2_full_cap2", "p4_full", "p4_render",
            "b4_i20", "b8_i10", "p_b4_full", "p_b4_predict",
        )
    }

    def val(rec):
        return rec.get("value") if rec else None

    # --- #2: bench-vs-profile reconciliation ---
    attrib = {
        "question": (
            "BENCH_r04 driver bench = 35.6 scenes/s vs PROFILE_r03_2view "
            "full-forward = 41.1 scenes/s: attribute the delta (VERDICT r4 #2)"
        ),
        "matrix_scenes_per_sec": {
            "bench cap=4 n=30": val(tmp["b_i30"]),
            "bench cap=4 n=10 (driver r4 protocol) run A": val(tmp["b_i10a"]),
            "bench cap=4 n=10 run B": val(tmp["b_i10b"]),
            "bench cap=4 n=30 f32-params control": val(tmp["b_f32_i30"]),
            "bench cap=2 n=30 (new defaults)": val(tmp["b_cap2_i30"]),
            "profiler full-forward cap=4 n=30": (
                tmp["p2_full_cap4"] or {}).get("scenes_per_sec"),
            "profiler full-forward cap=2 n=30 (r3 bar protocol)": (
                tmp["p2_full_cap2"] or {}).get("scenes_per_sec"),
        },
        "attribution": [
            "scan length: n=10 runs 1-2 scenes/s below n=30 on the same graph "
            "(fixed fetch/dispatch overhead amortized over the in-jit scan); "
            "the r4 driver ran n=10, the r3 profile bar ran n=30",
            "pair_cap: the r3 24.3 ms profile row was 'full forward "
            "(pair_cap=2g)' while bench.py hardcoded cap=4 — twice the kept "
            "pair slots, i.e. twice the lane-padded attribute-gather traffic "
            "(512 B/slot regardless of live pairs)",
            "bf16 vs f32 params: within noise (f32 control matches bf16 at "
            "equal n) — NOT a contributor",
        ],
        "resolution": (
            "bench.py defaults changed to pair_cap=2 (runtime-checked "
            "lossless: live_pairs telemetry, 141x headroom on this scene) and "
            "n=30, matching the r3 profiler protocol it is being compared "
            "against; both knobs are CLI-exposed and recorded in the metric "
            "string"
        ),
    }
    Path("BENCH_ATTRIB_r05.json").write_text(json.dumps(attrib, indent=1))
    print("BENCH_ATTRIB_r05.json", attrib["matrix_scenes_per_sec"])

    # --- #3: 4-view refresh ---
    # Don't clobber a richer hand-assembled artifact (the profiler's --stages
    # filter emits a bare {"full forward": ms} without the derived fields).
    existing = load("PROFILE_r05_4view.json")
    if tmp["p4_full"] and not (existing or {}).get("scenes_per_sec"):
        p4 = {
            "config": tmp["p4_full"].get("config"),
            "per_scene_ms": {
                **(tmp["p4_full"].get("per_scene_ms") or {}),
                **((tmp["p4_render"] or {}).get("per_scene_ms") or {}),
            },
            "scenes_per_sec": (tmp["p4_full"].get("derived") or {}).get(
                "scenes_per_sec"
            ) or tmp["p4_full"].get("scenes_per_sec"),
            "history": {
                "r2": 9.2, "r3": 13.61,
                "note": "VERDICT r4 #3 target: >= 20 scenes/s",
            },
        }
        Path("PROFILE_r05_4view.json").write_text(json.dumps(p4, indent=1))
        print("PROFILE_r05_4view.json", p4["scenes_per_sec"])

    # --- #5: batch scaling ---
    scaling = {
        "b1_scenes_per_sec": val(tmp["b_cap2_i30"]) or val(tmp["b_i30"]),
        "b4_scenes_per_sec": val(tmp["b4_i20"]),
        "b8_scenes_per_sec": val(tmp["b8_i10"]),
        "b4_profile_full_ms": ((tmp["p_b4_full"] or {}).get("per_scene_ms")
                               or {}).get("full forward"),
        "b4_profile_predict_ms": (
            (tmp["p_b4_predict"] or {}).get("per_scene_ms") or {}
        ).get("predict (enc+sty+heads+adapter)"),
        "history": {"r4_b4": 48.98, "target": ">= 55 scenes/s or attribution"},
    }
    Path("BENCH_SCALING_r05.json").write_text(json.dumps(scaling, indent=1))
    print("BENCH_SCALING_r05.json", scaling)


if __name__ == "__main__":
    main()
