"""XLA graph attribution for the in-situ render overhead (VERDICT r3 #2).

Round 3 left ~6.5 ms of the 2-view forward unattributed: the isolated
composite kernel measures ~0.1 ms, in-situ it appears to cost ~6.5 ms, and
cap sweeps/micro-benches ruled out pack traffic, kernel FLOPs and dispatch
overhead. This tool interrogates the COMPILED graphs instead of wall clocks:

  * per-slice `compiled.cost_analysis()` (flops, bytes accessed) and
    `memory_analysis()` (peak/temp allocation) for: full forward, predict
    only, render given gaussians, project+bin+sort, pack, composite;
  * optimized-HLO dumps (--dump-hlo DIR) with a summary of the largest
    fusions/copies/transposes adjacent to the pallas custom-call — layout
    changes XLA inserts between predict's bf16 outputs and the f32 kernel
    inputs are the prime suspect.

Run on the real TPU (compile cache shared with bench.py). CPU smoke:
python scripts/analyze_graph.py --cpu --tiny
"""

import argparse
import json
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def summarize_hlo(text: str, top: int = 12):
    """Largest-output instructions by declared shape bytes, plus every op
    within 3 lines of the pallas custom-call (layout/copy suspects)."""
    dtype_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2, "s8": 1,
                   "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

    def shape_bytes(shape: str) -> int:
        m = re.match(r"(\w+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    sizes = []
    custom_call_context = []
    lines = text.splitlines()
    for i, line in enumerate(lines):
        m = re.match(r"\s*(%?[\w.\-]+)\s*=\s*((?:\w+\[[\d,]*\](?:\{[\d,]*\})?)+)\s*(\w[\w\-]*)\(", line)
        if m:
            name, shape, op = m.groups()
            if op in ("fusion", "copy", "transpose", "custom-call", "convert",
                      "bitcast-convert", "sort", "reshape", "dynamic-slice",
                      "gather", "scatter", "pad"):
                sizes.append((shape_bytes(shape), op, name, shape[:60]))
        if "custom-call" in line and ("tpu_custom_call" in line or "Sharding" not in line):
            for j in range(max(0, i - 3), min(len(lines), i + 4)):
                custom_call_context.append(lines[j].strip()[:160])
            custom_call_context.append("---")
    sizes.sort(reverse=True)
    return {
        "largest_ops": [
            {"mb": round(b / 1e6, 2), "op": op, "name": n, "shape": s}
            for b, op, n, s in sizes[:top]
        ],
        "custom_call_context": custom_call_context[:80],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--views", type=int, default=2)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--pair-cap", type=int, default=4)
    parser.add_argument("--output", default="")
    parser.add_argument("--dump-hlo", default="", help="directory for HLO text dumps")
    parser.add_argument(
        "--slices", default="full,predict,render,binsort,pack,composite",
    )
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from styl3r_tpu.models.styl3r import Styl3rModel

    impl = "jnp" if jax.default_backend() == "cpu" else "pallas"
    h = w = args.size if not args.tiny else 64
    v = args.views
    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16,
                enc_heads=2, dec_heads=2)
    model = Styl3rModel(
        sh_degree=0, backbone_dtype=jnp.bfloat16, head_trunk_dtype=jnp.bfloat16,
        **(tiny if args.tiny else {}),
    )
    rng = np.random.default_rng(0)
    batch = _example_batch(rng, b=1, v=v, h=h, w=w, t=1, style_hw=h)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    rk = dict(impl=impl, max_tiles_per_gaussian=8,
              max_per_tile=512 if args.tiny else 2048,
              pair_cap_per_gaussian=args.pair_cap)

    def full(params, batch):
        _, out = model.forward(params, batch, (h, w), **rk)
        return out.color

    def predict(params, batch):
        return model.predict_gaussians(params, batch)

    gaussians = jax.jit(predict)(params, batch)

    def render(gaussians, batch):
        from styl3r_tpu.models.decoder import render_gaussians

        return render_gaussians(
            gaussians, batch.target_extrinsics, batch.target_intrinsics,
            batch.target_near, batch.target_far, (h, w), **rk,
        ).color

    slices = {
        "full": (full, (params, batch)),
        "predict": (predict, (params, batch)),
        "render": (render, (gaussians, batch)),
    }

    report = {"config": {"views": v, "size": h, "impl": impl,
                         "backend": jax.default_backend(),
                         "pair_cap": args.pair_cap}}
    want = [s.strip() for s in args.slices.split(",") if s.strip()]
    for name, (fn, fargs) in slices.items():
        if name not in want:
            continue
        t0 = time.time()
        lowered = jax.jit(fn).lower(*fargs)
        compiled = lowered.compile()
        entry = {"compile_s": round(time.time() - t0, 1)}
        try:
            ca = compiled.cost_analysis()
            if ca:
                entry["flops_g"] = round(ca.get("flops", 0) / 1e9, 2)
                entry["bytes_accessed_mb"] = round(
                    ca.get("bytes accessed", 0) / 1e6, 1
                )
                entry["transcendentals_m"] = round(
                    ca.get("transcendentals", 0) / 1e6, 1
                )
        except Exception as exc:  # noqa: BLE001 — backend may not support it
            entry["cost_analysis_error"] = str(exc)[:200]
        try:
            ma = compiled.memory_analysis()
            for field in ("temp_size_in_bytes", "argument_size_in_bytes",
                          "output_size_in_bytes", "generated_code_size_in_bytes"):
                val = getattr(ma, field, None)
                if val is not None:
                    entry[field.replace("_in_bytes", "_mb")] = round(val / 1e6, 1)
        except Exception as exc:  # noqa: BLE001
            entry["memory_analysis_error"] = str(exc)[:200]
        hlo_text = None
        try:
            hlo_text = compiled.as_text()
        except Exception as exc:  # noqa: BLE001
            entry["hlo_error"] = str(exc)[:200]
        if hlo_text:
            entry["hlo_summary"] = summarize_hlo(hlo_text)
            if args.dump_hlo:
                d = Path(args.dump_hlo)
                d.mkdir(parents=True, exist_ok=True)
                (d / f"{name}.hlo.txt").write_text(hlo_text)
        report[name] = entry
        print(f"{name}: {json.dumps({k: v for k, v in entry.items() if k != 'hlo_summary'})}",
              flush=True)
        if args.output:
            Path(args.output).write_text(json.dumps(report, indent=2))

    if args.output:
        Path(args.output).write_text(json.dumps(report, indent=2))
    else:
        print(json.dumps(report, indent=2)[:4000])


if __name__ == "__main__":
    main()
