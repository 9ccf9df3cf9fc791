"""Sane head initialization for training WITHOUT a MASt3R warm-start.

The reference never trains from scratch — `main_style.py` always loads
MASt3R/NoPoSplat weights first (/root/reference/src/main_style.py, README
training recipe), so its heads inherit a working depth distribution. A
freshly-initialized model is degenerate instead:

  * pts3d = direction * expm1(|raw|) (`models/dpt.py reg_dense_pts3d`,
    reference heads/postprocess.py:46-61). At init |raw| ~ 0, so every
    gaussian mean sits at the camera origin — outside every target frustum.
    Renders come out empty, d(color)/d(params) is exactly zero, and MSE
    training can never start (observed: held-out PSNR frozen at 5.3 dB for
    750 steps on the bundled COLMAP scene).
  * scales = 0.001 * softplus(raw) ~ 7e-4 world units — sub-pixel even if a
    mean lands inside the frustum.

`scratch_init_heads` rewrites only the FINAL bias of each head so the raw
predictions start in a learnable regime; every weight stays at its flax
default, and checkpoint conversion is unaffected (restored weights simply
overwrite these biases).

  * pts3d heads (`head1`/`head2` -> head_conv3.bias): (0, 0, log1p(depth0))
    puts the initial point cloud at z ~= depth0 in the context-0 camera
    frame (the overfit protocol rescales the context baseline to 1, so
    depth0=1.0 is mid-scene).
  * gaussian structure heads (`gaussian_param_head{,2}` ->
    head.head_conv2.bias, channels [opacity, 3 scale, 4 quat]):
    scale bias = softplus^-1(scale0/0.001) makes the initial footprint
    ~scale0 world units (~2 px at depth 1, 256^2); quat bias = identity
    (x, y, z, w = 0, 0, 0, 1).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax.numpy as jnp

__all__ = ["scratch_init_heads"]


def _softplus_inv(y: float) -> float:
    # softplus(x) = log1p(exp(x)); inverse = log(expm1(y)).
    return math.log(math.expm1(y))


def scratch_init_heads(
    params: Dict[str, Any],
    depth0: float = 1.0,
    scale0: float = 0.01,
    kernel_damp: float = 0.1,
) -> Dict[str, Any]:
    """Return params with head output layers set for scratch training.

    Args:
      params: the full variable dict from `model.init` (has a 'params' key).
      depth0: initial gaussian depth along +z, in (rescaled) world units.
      scale0: initial gaussian scale in world units (adapter applies
        0.001 * softplus(raw), so the bias is softplus^-1(scale0 / 0.001)).
      kernel_damp: multiplier on the final conv KERNELS of the pts3d /
        structure heads. The bias only sets the raw MEAN; the random kernel
        contribution sets the spread, and expm1 amplifies it violently (a
        raw norm of 7 is already depth ~1000 — measured: undamped view-0
        depths spanned [-26, 867] where damped ones hug depth0). 0.1 keeps
        symmetry breaking while letting the bias define the regime.
    """
    tree = dict(params)
    inner = dict(tree["params"])
    tree["params"] = inner

    def edit_leaf(path, fn):
        node = inner
        parents = []
        for key in path[:-1]:
            if key not in node:
                return  # variant without this head (e.g. style-free linear)
            parents.append((node, key))
            node = node[key]
        leaf = path[-1]
        if leaf not in node:
            return
        new_leaf = fn(node[leaf])
        assert new_leaf.shape == node[leaf].shape, (path, new_leaf.shape)
        # Rebuild the dict spine so the original params tree is not mutated.
        node = {**node, leaf: new_leaf}
        for parent, key in reversed(parents):
            node = {**parent, key: node}
        inner.update(node)

    def set_bias(path, value):
        edit_leaf(path, lambda old: jnp.asarray(value, old.dtype).reshape(old.shape))

    def damp_kernel(path):
        edit_leaf(path, lambda old: old * kernel_damp)

    pts_bias = [0.0, 0.0, math.log1p(depth0)]
    for head in ("head1", "head2"):
        set_bias((head, "head_conv3", "bias"), pts_bias)
        damp_kernel((head, "head_conv3", "kernel"))

    gs_bias = [0.0] + [_softplus_inv(scale0 / 0.001)] * 3 + [0.0, 0.0, 0.0, 1.0]
    for head in ("gaussian_param_head", "gaussian_param_head2"):
        set_bias((head, "head", "head_conv2", "bias"), gs_bias)
        damp_kernel((head, "head", "head_conv2", "kernel"))

    return tree
