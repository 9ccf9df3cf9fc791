import time, jax, jax.numpy as jnp, numpy as np
from styl3r_tpu.ops.rasterizer import make_raster_camera, render
from styl3r_tpu.geometry import build_covariance

G=131072
rng = np.random.default_rng(0)
means = jnp.asarray(np.stack([rng.uniform(-2,2,G), rng.uniform(-2,2,G), rng.uniform(2,8,G)],-1), jnp.float32)
scales = jnp.asarray(rng.uniform(0.005,0.02,(G,3)),jnp.float32)
quats = jnp.asarray(rng.normal(size=(G,4)),jnp.float32)
sh = jnp.asarray((rng.uniform(0,1,(G,3,1))-0.5)/0.2821, jnp.float32)
op = jnp.asarray(rng.uniform(0.3,1,G), jnp.float32)
K = jnp.asarray([[1.1,0,0.5],[0,1.1,0.5],[0,0,1]], jnp.float32)
cam = make_raster_camera(jnp.eye(4), K, jnp.asarray(0.1), jnp.asarray(100.), (256,256))
tgt = jnp.asarray(rng.uniform(0,1,(256,256,3)), jnp.float32)

def loss(impl, means, scales, quats, sh, op):
    cov = build_covariance(scales, quats)
    out = render(cam, means, cov, sh, op, (256,256), max_per_tile=2048, max_tiles_per_gaussian=8, impl=impl)
    return jnp.mean((out.color - tgt)**2)

N=10
def bench(impl):
    g = jax.grad(lambda *a: loss(impl, *a), argnums=(0,1,2,3,4))
    def scan_fn():
        def body(c, _):
            gr = g(means + c*0, scales, quats, sh, op)
            return c + gr[0].mean()*1e-20, None
        return jax.lax.scan(body, jnp.float32(0), None, length=N)[0]
    f = jax.jit(scan_fn)
    t0=time.time(); jax.block_until_ready(f()); comp=time.time()-t0
    t0=time.time(); jax.block_until_ready(f()); wall=(time.time()-t0)/N
    return comp, wall

# correctness on device
g_jnp = jax.jit(jax.grad(lambda *a: loss('jnp', *a), argnums=(0,4)))(means, scales, quats, sh, op)
g_pal = jax.jit(jax.grad(lambda *a: loss('pallas', *a), argnums=(0,4)))(means, scales, quats, sh, op)
for n, a, b in zip(['means','op'], g_jnp, g_pal):
    print(f'{n}: absmax {float(jnp.abs(a).max()):.3g} maxdiff {float(jnp.abs(a-b).max()):.3g}')
for impl in ['pallas', 'jnp']:
    comp, wall = bench(impl)
    print(f'{impl} fwd+bwd: {wall*1000:.1f} ms/iter (compile {comp:.0f}s)')
