"""Benchmark: scenes/sec/chip for 2-view 256^2 stylized-3DGS predict + render.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims "< 1 second" per scene on one GPU
(README.md:20), i.e. 1 scene/s -> vs_baseline = scenes_per_sec / 1.0.

Measures *device* throughput by scanning N forwards inside one jit — the
dev-environment TPU sits behind a tunnel with ~25 ms per-dispatch RPC latency
that would otherwise dominate; production serving pipelines dispatches.

Run on the real TPU by default; --cpu --tiny for a quick smoke run.
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--tiny", action="store_true", help="tiny trunk dims (smoke)")
    parser.add_argument("--iters", type=int, default=10, help="scan length per timing")
    parser.add_argument("--views", type=int, default=2)
    parser.add_argument("--batch", type=int, default=1, help="scenes per step")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--impl", default="auto", choices=["auto", "jnp", "pallas"])
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from styl3r_tpu.models.styl3r import Styl3rModel
    from __graft_entry__ import _example_batch

    impl = args.impl
    if impl == "auto":
        impl = "jnp" if jax.default_backend() == "cpu" else "pallas"

    tiny = dict(enc_depth=2, dec_depth=4, enc_dim=32, dec_dim=16, enc_heads=2, dec_heads=2)
    model = Styl3rModel(
        sh_degree=0,
        backbone_dtype=jnp.bfloat16,
        **(tiny if args.tiny else {}),
    )
    h = w = args.size if not args.tiny else 64
    rng = np.random.default_rng(0)
    batch = _example_batch(rng, b=args.batch, v=args.views, h=h, w=w, t=1, style_hw=h)
    params = jax.jit(model.init)(jax.random.key(0), batch)

    render_kwargs = dict(impl=impl)
    if args.tiny:
        render_kwargs.update(max_per_tile=512, max_tiles_per_gaussian=8)
    else:
        render_kwargs.update(max_per_tile=2048, max_tiles_per_gaussian=8)

    n = args.iters

    @jax.jit
    def predict_and_render_n(params, batch):
        def body(carry, _):
            # Perturb the input so XLA cannot CSE the iterations away.
            b2 = batch._replace(context_images=batch.context_images + carry)
            _, output = model.forward(params, b2, (h, w), **render_kwargs)
            return output.color.mean() * 1e-12, output.color[0, 0, 0, 0, 0]
        carry, outs = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return carry, outs

    # Timing note (axon remote backend): block_until_ready does not wait, so
    # force host fetches and subtract the dispatch roundtrip.
    out = predict_and_render_n(params, batch)
    assert bool(jnp.isfinite(np.asarray(out[1])).all()), "non-finite render"

    null = jax.jit(lambda x: x + 1.0)
    float(null(jnp.float32(0)))
    t0 = time.perf_counter()
    float(null(jnp.float32(1)))
    roundtrip = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(predict_and_render_n(params, batch)[0])
    per_step = max(time.perf_counter() - t0 - roundtrip, 1e-9) / n
    scenes_per_sec = args.batch / per_step

    print(
        json.dumps(
            {
                "metric": f"scenes/sec/chip ({args.views}-view {h}x{w} b={args.batch} predict+render, {impl})",
                "value": round(scenes_per_sec, 4),
                "unit": "scenes/s",
                "vs_baseline": round(scenes_per_sec / 1.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
