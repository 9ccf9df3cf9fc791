import jax, jax.numpy as jnp, numpy as np
from styl3r_tpu.ops.rasterizer.pallas_backward import backward_tiles_pallas
n_tiles, n_pairs = 4, 512
attrs = jnp.zeros((16, n_pairs), jnp.float32)
starts = jnp.asarray([0, 100, 260, 400], jnp.int32)
counts = jnp.asarray([100, 128, 130, 100], jnp.int32)
n_done = jnp.asarray([1, 2, 2, 1], jnp.int32)
P = 256
dcol = jnp.ones((n_tiles, P, 3), jnp.float32)
ddep = jnp.zeros((n_tiles, P), jnp.float32)
dalp = jnp.zeros((n_tiles, P), jnp.float32)
tfin = jnp.ones((n_tiles, P), jnp.float32)
out = backward_tiles_pallas(attrs, starts, counts, n_done, dcol, ddep, dalp, tfin, (2,2), max_per_tile=256)
print('ok', out.shape, float(jnp.abs(out).sum()))
